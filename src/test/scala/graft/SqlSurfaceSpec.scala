package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.operators.HashingEmbedder
import graft.streaming.Streams

/** The pure-SQL face of the engine: registered vector functions drive the
  * flagship query from `spark.sql` with the same plan shape as the Column
  * API — what a SQL-only user of the cluster-wide [[graft.functions.GraftExtensions]]
  * deployment sees.
  */
class SqlSurfaceSpec extends SparkSpec {
  import spark.implicits._

  test("flagship top-k runs as plain SQL with the TakeOrderedAndProject plan") {
    VectorFunctions.register(spark)
    spark.read.parquet(s"$Sf0001/embeddings.parquet").createOrReplaceTempView("emb")
    val df = spark.sql(
      """SELECT vec_id,
        |  cosine_sim(embedding, (SELECT first(embedding) FROM emb WHERE vec_id = 0)) AS score
        |FROM emb ORDER BY score DESC, vec_id LIMIT 5""".stripMargin)
    val rows = df.collect()
    assert(rows.length == 5)
    assert(rows.head.getLong(0) == 0L) // self-match first
    assert(math.abs(rows.head.getDouble(1) - 1.0) < 1e-9)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(400))
  }

  test("dot_product / l2_norm resolve in SQL too") {
    VectorFunctions.register(spark)
    val row = spark.sql(
      "SELECT dot_product(array(1.0f, 2.0f), array(3.0f, 4.0f)) AS d, l2_norm(array(3.0f, 4.0f)) AS n")
      .head
    assert(row.getDouble(0) == 11.0 && row.getDouble(1) == 5.0)
  }

  test("streaming similarity filter passes only above-threshold docs") {
    val embedder = HashingEmbedder(16)
    val target = "spark joins and shuffles"
    val qvec = embedder.embedOne(target)
    val batch = Seq((1L, target), (2L, "completely unrelated ducks")).toDF("id", "text")

    // batch twin first (same code path, deterministic)
    val kept = Streams.similarityFilter(batch, "text", embedder, qvec, 0.9)
      .select("id").as[Long].collect().toSeq
    assert(kept == Seq(1L))

    // now through an actual stream into a memory sink
    val dir = java.nio.file.Files.createTempDirectory("graft-simstream").toString
    batch.write.mode("overwrite").parquet(dir)
    val stream = Streams.similarityFilter(
      spark.readStream.schema(batch.schema).parquet(dir), "text", embedder, qvec, 0.9)
    val q = stream.writeStream.format("memory").queryName("sim_filter_test")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000))
    val streamed = spark.table("sim_filter_test").select("id").as[Long].collect().toSeq
    assert(streamed == Seq(1L))
  }
}
