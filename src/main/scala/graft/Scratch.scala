package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Throwaway runtime probes for the registered codegen expressions. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    VectorFunctions.register(spark)

    // Probe 1: zero-norm guard — cosine(zero, anything) must be 0.0
    val z = Seq(
      (1L, Array(0f, 0f, 0f), Array(1f, 2f, 3f)),
      (2L, Array(1f, 0f, 0f), Array(1f, 0f, 0f)),
      (3L, Array(0f, 0f, 0f), Array(0f, 0f, 0f))
    ).toDF("id", "a", "b")
    println("== zero-norm guard (expect 0.0, 1.0, 0.0) ==")
    z.select($"id", VectorFunctions.cosine_sim($"a", $"b").as("cos"),
        VectorFunctions.cosine_udf($"a", $"b").as("cos_udf")).show()

    // Probe 2: null input — expression is null-safe (BinaryExpression default)
    println("== null input (expect null rows) ==")
    val n = Seq((1L, null.asInstanceOf[Array[Float]], Array(1f, 2f))).toDF("id", "a", "b")
    n.select(VectorFunctions.cosine_sim($"a", $"b").as("cos"),
        VectorFunctions.cosine_udf($"a", $"b").as("cos_udf")).show()

    // Probe 3: dimension mismatch — expect a clear error
    println("== dim mismatch ==")
    try {
      Seq((Array(1f, 2f), Array(1f, 2f, 3f))).toDF("a", "b")
        .select(VectorFunctions.cosine_sim($"a", $"b")).collect()
      println("NO ERROR (unexpected)")
    } catch { case e: Throwable =>
      println("error (expected): " + Option(e.getCause).getOrElse(e).getMessage.take(200))
    }

    // Probe 4: wrong type — expect analysis-time type-check failure
    println("== wrong type (expect analysis error) ==")
    try {
      Seq(("x", Array(1f))).toDF("a", "b")
        .select(VectorFunctions.cosine_sim($"a", $"b")).collect()
      println("NO ERROR (unexpected)")
    } catch { case e: Throwable => println("error (expected): " + e.getMessage.take(300)) }

    // Probe 5: expression vs UDF parity over the real fixture
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = df.filter($"vec_id" === 0).select("embedding").head.getSeq[Float](0)
    val parity = df.select(
      VectorFunctions.cosine_sim($"embedding", typedlit(q)).as("e"),
      VectorFunctions.cosine_udf($"embedding", typedlit(q)).as("u"))
      .filter($"e" =!= $"u").count()
    println(s"== parity: rows where expr != udf (expect 0): $parity ==")
    spark.stop()
  }
}
