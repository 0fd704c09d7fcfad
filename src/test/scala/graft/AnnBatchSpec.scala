package graft

import org.apache.spark.sql.functions._

import graft.operators.{AnnIndex, SimJoin}

/** Batch ANN probe contracts (round-9): the batch path must equal N
  * single-vector probes row-for-row, hold a recall floor against the
  * exact sim-join on the same queries, and prune a persisted index's
  * scan to the touched (table, bucket) dirs.
  */
class AnnBatchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val embs = spark.read.parquet(s"$Sf0001/embeddings.parquet")
  private lazy val cfg = AnnIndex.Config(dim = 64, nBits = 4, nTables = 8)

  test("queryTopKBatch equals per-query single-vector probes") {
    val queries = embs.filter(col("vec_id") < 10)
    val index = AnnIndex.buildIndex(embs, "vec_id", "embedding", cfg)
    val batch = AnnIndex.queryTopKBatch(index, queries, "vec_id", "embedding", 5, cfg)
      .select("q_id", "c_id", "score", "rank")
      .as[(Long, Long, Double, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._4).map(r => (r._2, r._3)).toSeq).toMap
    val singles = queries.select("vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toMap
      .map { case (qid, vec) =>
        qid -> AnnIndex.queryTopK(index, vec, 5, cfg)
          .select("id", "score").as[(Long, Double)].collect().toSeq
      }
    assert(batch.keySet == singles.keySet)
    batch.foreach { case (qid, hits) => assert(hits == singles(qid), s"query $qid differs") }
  }

  test("queryTopKBatch on a persisted index: partition pruning + recall floor vs exact") {
    val path = java.nio.file.Files.createTempDirectory("graft-ann-batch").toString
    AnnIndex.writeIndex(AnnIndex.buildIndex(embs, "vec_id", "embedding", cfg), path)
    val index = spark.read.parquet(path)
    val queries = embs.filter(col("vec_id") < 20)

    val probe = AnnIndex.queryTopKBatch(index, queries, "vec_id", "embedding", 10, cfg)
    // the touched-bucket predicate must reach PartitionFilters (pruned scan)
    val plan = probe.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(scanLine.contains("table") && scanLine.contains("bucket"),
      s"no partition filter on the index scan:\n$scanLine")

    val approx = probe.select("q_id", "c_id").as[(Long, Long)].collect().toSet
    val exact = SimJoin.topKPerQuery(
        queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb")),
        embs.select(col("vec_id").as("c_id"), col("embedding").as("c_emb")), 10)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    val recall = approx.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"batch recall $recall under floor 0.5")
  }

  test("queryTopKBatch with empty query set returns no rows") {
    val index = AnnIndex.buildIndex(embs, "vec_id", "embedding", cfg)
    val none = embs.filter(col("vec_id") < 0)
    assert(AnnIndex.queryTopKBatch(index, none, "vec_id", "embedding", 5, cfg).count() == 0L)
  }

  test("IVF queryTopKBatch equals per-query single-vector probes") {
    import graft.operators.IvfIndex
    val model = IvfIndex.fit(embs, "embedding", k = 8)
    val index = IvfIndex.buildIndex(embs, "vec_id", "embedding", model)
    val nProbe = IvfIndex.defaultNProbe(8)
    val queries = embs.filter(col("vec_id") < 10)
    val batch = IvfIndex.queryTopKBatch(index, model, queries, "vec_id", "embedding", 5, nProbe)
      .select("q_id", "c_id", "score", "rank")
      .as[(Long, Long, Double, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._4).map(r => (r._2, r._3)).toSeq).toMap
    val singles = queries.select("vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toMap
      .map { case (qid, vec) =>
        qid -> IvfIndex.queryTopK(index, model, vec, 5, nProbe)
          .select(col("id").cast("long"), col("score")).as[(Long, Double)].collect().toSeq
      }
    assert(batch.keySet == singles.keySet)
    batch.foreach { case (qid, hits) => assert(hits == singles(qid), s"query $qid differs") }
  }
}
