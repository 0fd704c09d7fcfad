package graft

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._

import graft.functions.{VectorFunctions, VectorOps}

/** Ports of the round-2 `Scratch` probes as real assertions, plus the
  * registration-fallback behavior fixed per ADVICE r2 #1.
  */
class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, Array(1f, 0f, 0f)),
    (2L, Array(0f, 1f, 0f)),
    (3L, Array(1f, 1f, 0f)),
    (4L, Array(0f, 0f, 0f)) // zero vector — the reference's 0.0 guard case
  ).toDF("id", "emb")

  test("cosine_sim works WITHOUT explicit register() (lazy registration)") {
    // Regression for ADVICE r2 #1: the Column API must not require callers
    // to have called register() first.
    val out = docs
      .withColumn("s", VectorFunctions.cosine_sim(col("emb"), typedlit(Seq(1f, 0f, 0f))))
      .orderBy("id").select("s").as[Double].collect()
    assert(math.abs(out(0) - 1.0) < 1e-12)
    assert(math.abs(out(1)) < 1e-12)
    assert(math.abs(out(2) - math.sqrt(0.5)) < 1e-12)
    assert(out(3) == 0.0) // zero-norm guard, vectolite.py:159-162
  }

  test("expression and UDF paths agree on the fixture (parity probe)") {
    val e = spark.read.parquet(s"$Sf0001/embeddings.parquet").limit(100)
    val q = e.filter(col("vec_id") === 0).select("embedding").head.getSeq[Float](0)
    val both = e.select(
      VectorFunctions.cosine_sim(col("embedding"), typedlit(q)).as("expr"),
      VectorFunctions.cosine_udf(col("embedding"), typedlit(q)).as("udf"))
      .select(max(abs(col("expr") - col("udf")))).head.getDouble(0)
    assert(both < 1e-12)
  }

  test("null array input → null result on both paths") {
    val df = Seq((Some(Array(1f, 2f)), None: Option[Array[Float]])).toDF("a", "b")
    assert(df.select(VectorFunctions.cosine_sim(col("a"), col("b"))).head.isNullAt(0))
    assert(df.select(VectorFunctions.cosine_udf(col("a"), col("b"))).head.isNullAt(0))
  }

  test("null ELEMENT reads as 0.0 on both paths (parity, ADVICE r2 #3)") {
    val df = Seq((Seq[java.lang.Float](1f, null, 2f), Seq[java.lang.Float](1f, 1f, 2f)))
      .toDF("a", "b")
    val expr = df.select(VectorFunctions.cosine_sim(col("a"), col("b"))).head.getDouble(0)
    val udf = df.select(VectorFunctions.cosine_udf(col("a"), col("b"))).head.getDouble(0)
    val expect = VectorOps.cosine(Array(1f, 0f, 2f), Array(1f, 1f, 2f))
    assert(math.abs(expr - expect) < 1e-12)
    assert(math.abs(udf - expect) < 1e-12)
  }

  test("dimension mismatch fails the job") {
    val df = Seq((Array(1f, 2f), Array(1f, 2f, 3f))).toDF("a", "b")
    val ex = intercept[Exception] {
      df.select(VectorFunctions.cosine_sim(col("a"), col("b"))).collect()
    }
    assert(ex.getMessage.contains("dimension mismatch")
      || ex.getCause != null && ex.getCause.getMessage.contains("dimension mismatch"))
  }

  test("wrong input type is a type-check (analysis) error") {
    VectorFunctions.register(spark)
    val df = Seq((1, "x")).toDF("i", "s")
    intercept[AnalysisException] {
      df.select(expr("cosine_sim(i, s)")).collect()
    }
  }

  test("dot_product and l2_norm match the plain-Scala loops") {
    val a = Array(1f, 2f, 3f); val b = Array(4f, 5f, 6f)
    val df = Seq((a, b)).toDF("a", "b")
    val row = df.select(
      VectorFunctions.dot_product(col("a"), col("b")),
      VectorFunctions.l2_norm(col("a"))).head
    assert(math.abs(row.getDouble(0) - 32.0) < 1e-12)
    assert(math.abs(row.getDouble(1) - math.sqrt(14.0)) < 1e-12)
  }
}
