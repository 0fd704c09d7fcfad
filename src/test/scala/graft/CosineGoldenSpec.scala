package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Golden parity with the REFERENCE scoring math: the fixture
  * `cosine_golden.json` holds scores computed by the reference's exact
  * numpy formula (`/root/reference/vectolite.py:155-166` — np.dot /
  * norm-product over float32 arrays, zero-norm → 0.0) for fixture vectors
  * vs the vec_id=0 query. The engine computes in float64 over the same
  * float32 inputs (deterministic reductions, SURVEY §7.4), so agreement
  * is within float32 rounding (≤3e-6), exact for the zero-norm guard.
  */
class CosineGoldenSpec extends SparkSpec {
  import spark.implicits._

  test("codegen cosine matches the reference numpy-float32 scores within float32 rounding") {
    val path = getClass.getResource("/cosine_golden.json").toString
    val golden = spark.read.json(path)
      .select("vec_id", "score").as[(Long, Double)].collect().toMap
    assert(golden.size == 101)

    val embs = spark.read.parquet(s"$Sf0001/embeddings.parquet")
    val q = embs.filter(col("vec_id") === 0).select("embedding").head.getSeq[Float](0)
    val ours = embs.filter(col("vec_id") < 100)
      .select(col("vec_id"),
        VectorFunctions.cosine_sim(col("embedding"), typedlit(q)).as("s"))
      .as[(Long, Double)].collect().toMap

    ours.foreach { case (vid, s) =>
      val ref = golden(vid)
      assert(math.abs(s - ref) <= 3e-6, s"vec_id=$vid ours=$s ref=$ref")
    }
    // zero-norm guard parity is EXACT (0.0, not NaN) on both sides
    val zeroScore = Seq((Array.fill(64)(0f), q.toArray)).toDF("a", "b")
      .select(VectorFunctions.cosine_sim(col("a"), col("b"))).head.getDouble(0)
    assert(zeroScore == golden(-1L) && zeroScore == 0.0)
  }
}
