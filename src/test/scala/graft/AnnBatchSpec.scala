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
    AnnIndex.writeIndex(AnnIndex.buildIndex(embs, "vec_id", "embedding", cfg), path, cfg)
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

  test("dedupIncrementalLSH: drops verified, exact copy always dropped, survivors appendable") {
    import graft.functions.VectorOps
    val thr = 0.3
    val corpus = embs.filter(col("vec_id") < 350)
    // an exact copy of an indexed vector under a fresh id collides in
    // EVERY table (cosine 1) — it must be dropped unconditionally
    val copy = embs.filter(col("vec_id") === 7)
      .select((col("vec_id") + 10000).cast("long").as("vec_id"), col("embedding"))
    val batch = embs.filter(col("vec_id") >= 350)
      .select(col("vec_id"), col("embedding")).union(copy)
    val path = java.nio.file.Files.createTempDirectory("graft-inc-dedup").toString
    AnnIndex.writeIndex(AnnIndex.buildIndex(corpus, "vec_id", "embedding", cfg), path, cfg)
    val index = spark.read.parquet(path)

    def run() = AnnIndex.dedupIncrementalLSH(batch, "vec_id", "embedding", index, thr, cfg)
      .select("vec_id").as[Long].collect().toSet
    val kept = run()
    val batchIds = batch.select("vec_id").as[Long].collect().toSet
    assert(kept.subsetOf(batchIds))
    assert(!kept.contains(10007L), "exact copy of an indexed vector survived")
    assert(run() == kept, "nondeterministic result")

    // precision is exact: every dropped row must have a REAL partner
    // above the threshold somewhere in corpus ∪ batch (within-batch drops
    // are cosine-verified pair losers; vs-corpus drops are cosine-verified
    // index hits) — brute-force check driver-side at this scale
    val all = (corpus.select("vec_id", "embedding").union(batch))
      .as[(Long, Seq[Float])].collect().map { case (i, v) => (i, v.toArray) }
    val dropped = batchIds -- kept
    dropped.foreach { id =>
      val v = all.find(_._1 == id).get._2
      val hasPartner = all.exists { case (j, w) => j != id && VectorOps.cosine(v, w) > thr }
      assert(hasPartner, s"dropped row $id has no exact near-dup anywhere")
    }

    // at a near-1 threshold no random pair qualifies: exactly the planted
    // copy drops (identical vector → same bucket in EVERY table, found
    // unconditionally) and the within-batch pair set is empty — the
    // empty-pairs path through nearDupGroups/dedupNear
    val strict = AnnIndex.dedupIncrementalLSH(batch, "vec_id", "embedding", index, 0.999999, cfg)
      .select("vec_id").as[Long].collect().toSet
    assert(strict == batchIds - 10007L, "near-1 threshold should drop only the planted copy")

    // the daily loop closes: survivors append into the same index files
    // and a surviving vector then finds itself at rank 1
    val survivors = batch.filter(col("vec_id").isin(kept.toSeq.map(Long.box): _*))
    AnnIndex.appendToIndex(survivors, path, "vec_id", "embedding", cfg)
    val sid = kept.head
    val sVec = all.find(_._1 == sid).get._2
    val hit = AnnIndex.queryTopK(spark.read.parquet(path), sVec, 1, cfg)
      .select("id").as[Long].head()
    assert(hit == sid, s"appended survivor $sid not served from the index (got $hit)")
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

  test("QUANTIZED batch probe equals per-query packed reranks; empty query set is empty (r17)") {
    import graft.operators.IvfIndex
    val model = IvfIndex.fit(embs, "embedding", k = 8)
    val index = IvfIndex.buildIndex(embs, "vec_id", "embedding", model)
    val packed = IvfIndex.quantizeIndexPacked(index)
    val nProbe = IvfIndex.defaultNProbe(8)
    val queries = embs.filter(col("vec_id") < 10)
    val batch = IvfIndex.queryTopKBatchPackedRerank(
        packed, index, model, queries, "vec_id", "embedding", 5, nProbe)
      .select(col("q_id"), col("c_id"), round(col("score"), 9).as("score"), col("rank"))
      .as[(Long, Long, Double, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._4).map(r => (r._2, r._3)).toSeq).toMap
    val singles = queries.select("vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toMap
      .map { case (qid, vec) =>
        qid -> IvfIndex.queryTopKPackedRerank(packed, index, model, vec, 5, nProbe)
          .select(col("id").cast("long"), round(col("score"), 9).as("score"))
          .as[(Long, Double)].collect().toSeq
      }
    assert(batch.keySet == singles.keySet)
    batch.foreach { case (qid, hits) => assert(hits == singles(qid), s"query $qid differs") }
    // exact float scores: every served score is the direct float cosine
    val direct = embs.select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
      .collect().toMap
    val q0 = queries.filter(col("vec_id") === 0L).head.getSeq[Float](1).toArray
    singles(0L).foreach { case (id, sc) =>
      val exact = graft.functions.VectorOps.cosine(direct(id).toArray, q0)
      assert(math.abs(sc - exact) < 1e-6, s"id $id served $sc vs float $exact")
    }
    // empty standing set → empty result, correct schema, no failure
    assert(IvfIndex.queryTopKBatchPackedRerank(packed, index, model,
      queries.filter(col("vec_id") < 0), "vec_id", "embedding", 5, nProbe).count() == 0L)
  }

  test("batch quantized probe: the huge-pool broadcast fallback ranks like the In path (r17)") {
    import graft.operators.IvfIndex
    // 1500 corpus vectors, ALL of them standing queries: each query's own
    // id tops its pool (self-cosine 1), so the union pool holds >= 1500
    // distinct ids — past MaxInPushdownIds (1024), forcing the broadcast
    // left-semi re-rank branch a literal In list would bloat the plan for
    assert(IvfIndex.MaxInPushdownIds < 1500)
    val emb2 = Seq.tabulate(1500) { i =>
      (i.toLong, (0 until 8).map(j => math.sin(i * 0.37 + j).toFloat))
    }.toDF("vec_id", "embedding")
    val model = IvfIndex.fit(emb2, "embedding", k = 8)
    val index = IvfIndex.buildIndex(emb2, "vec_id", "embedding", model)
    val packed = IvfIndex.quantizeIndexPacked(index)
    val batch = IvfIndex.queryTopKBatchPackedRerank(
        packed, index, model, emb2, "vec_id", "embedding", 5, 2)
      .select(col("q_id"), col("c_id"), round(col("score"), 9).as("score"), col("rank"))
      .as[(Long, Long, Double, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._4).map(r => (r._2, r._3)).toSeq).toMap
    assert(batch.size == 1500, s"queries served: ${batch.size}")
    // every query finds itself at rank 1 with exact float score 1.0
    assert(batch.forall { case (q, hits) => hits.head == (q, 1.0) },
      "a query lost its own vector through the fallback re-rank")
    // spot-parity vs the small-pool single probes (which take the In path)
    emb2.filter(col("vec_id") % 250 === 0).collect().foreach { r =>
      val (qid, v) = (r.getLong(0), r.getSeq[Float](1).toArray)
      val single = IvfIndex.queryTopKPackedRerank(packed, index, model, v, 5, 2)
        .select(col("id").cast("long"), round(col("score"), 9).as("score"))
        .as[(Long, Double)].collect().toSeq
      assert(batch(qid) == single, s"q$qid: ${batch(qid)} vs $single")
    }
  }
}
