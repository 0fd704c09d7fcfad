package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.EmbedError
import graft.functions.VectorFunctions.cosine_sim
import graft.operators._

/** Top-level so task deserialization gets a stable class (and the builds
  * counter lives in a JVM singleton, visible from executor threads).
  */
object CountingEmbedder {
  val builds = new java.util.concurrent.atomic.AtomicInteger(0)
  class Counting extends CachedModelEmbedder[HashingEmbedder] {
    val dim = 8
    protected def buildModel(): HashingEmbedder = { builds.incrementAndGet(); HashingEmbedder(8) }
    protected def embedWithModel(m: HashingEmbedder, t: String): Array[Float] = m.embedOne(t)
  }
  val instance = new Counting
}

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val embs = spark.read.parquet(s"$Sf0001/embeddings.parquet")
  private lazy val docs = spark.read.parquet(s"$Sf0001/documents.parquet")

  // ------------------------------------------------------------- SimJoin
  test("topKPerQuery matches the brute-force rank window") {
    val queries = embs.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val corpus = embs.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))

    val fast = SimJoin.topKPerQuery(queries, corpus, 4)
      .select("q_id", "c_id", "rank").as[(Long, Long, Long)].collect().toSet

    val w = Window.partitionBy("q_id").orderBy(desc("score"), col("c_id"))
    val slow = corpus.crossJoin(broadcast(queries))
      .withColumn("score", cosine_sim(col("c_emb"), col("q_emb")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 4)
      .select("q_id", "c_id", "rank").as[(Long, Long, Long)].collect().toSet

    assert(fast == slow)
  }

  test("topKPerQuery plans a partial aggregation before the exchange") {
    val queries = embs.limit(3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val corpus = embs.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
    val plan = SimJoin.topKPerQuery(queries, corpus, 3)
      .queryExecution.executedPlan.toString
    // two-phase object hash aggregate: partial top-k runs map-side, so the
    // exchange carries ≤k rows per (query, partition), not the cross product
    assert(plan.contains("ObjectHashAggregate"))
    assert(plan.toLowerCase.contains("partial_topkagg"))
  }

  // --------------------------------------------------------------- Dedup
  test("exactDupGroups finds injected duplicates; dedupExact keeps min id") {
    val base = Seq((1L, "aa"), (2L, "bb"), (3L, "aa"), (4L, "cc"), (5L, "bb"))
      .toDF("id", "text")
    val groups = Dedup.exactDupGroups(base, "id", "text")
      .select("n_dups", "keep_id").as[(Long, Long)].collect().toSet
    assert(groups == Set((2L, 1L), (2L, 2L)))
    val kept = Dedup.dedupExact(base, "id", "text")
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 4L))
  }

  test("jaccardPairs (inverted index) matches brute-force jaccard") {
    val df = Seq(
      (1L, "a b c d"), (2L, "a b c e"), (3L, "x y z w"), (4L, "a b c d")
    ).toDF("id", "text")
    val got = Dedup.jaccardPairs(df, "id", "text", n = 1, threshold = 0.5)
      .select("a_id", "b_id", "jaccard").as[(Long, Long, Double)].collect().toSet
    // sets: {abcd},{abce},{xyzw},{abcd}: (1,2): 3/5=0.6, (1,4): 1.0, (2,4): 0.6
    assert(got == Set((1L, 2L, 0.6), (1L, 4L, 1.0), (2L, 4L, 0.6)))
  }

  test("shingles: texts shorter than n yield the empty set, not a crash") {
    val df = Seq((1L, "solo"), (2L, ""), (3L, "two words here")).toDF("id", "text")
    val sizes = df.select(col("id"), size(Dedup.shingles(col("text"), 2)).as("n"))
      .as[(Long, Int)].collect().toMap
    assert(sizes == Map(1L -> 0, 2L -> 0, 3L -> 2))
    // and the pair pipeline survives a short doc in the corpus
    val pairs = Dedup.jaccardPairs(
      Seq((1L, "a b c"), (2L, "a b c"), (3L, "x")).toDF("id", "text"),
      "id", "text", n = 2, threshold = 0.5)
    assert(pairs.select("a_id", "b_id").as[(Long, Long)].collect().toSet == Set((1L, 2L)))
  }

  test("jaccardPairs maxDocFreq: denominator uses the filtered shingle universe") {
    // 'a b' is hot (appears in all three docs); after dropping it, docs 1+2
    // share {b c} of sets {b c, c d}/{b c, c e} → jaccard 1/3; the pre-fix
    // behavior divided by unfiltered sizes (3) → 1/5 and missed threshold.
    val df = Seq((1L, "a b c d"), (2L, "a b c e"), (3L, "a b x y")).toDF("id", "text")
    val got = Dedup.jaccardPairs(df, "id", "text", n = 2, threshold = 0.3, maxDocFreq = 2)
      .select("a_id", "b_id", "jaccard").as[(Long, Long, Double)].collect().toSet
    assert(got.contains((1L, 2L, 0.333333)))
  }

  test("dedupNearBest: argmax-quality survivor, ties to min id, unpaired rows untouched") {
    val df = Seq(
      (1L, 0.2), (2L, 0.9), (3L, 0.9),  // group {1,2,3}: 2 and 3 tie on
                                        // quality — min id 2 must win
      (10L, 0.5), (11L, 0.1),           // group {10,11}: 10 wins on quality
      (20L, 0.0)                        // in no pair: survives untouched
    ).toDF("id", "q")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a_id", "b_id")
    val kept = Dedup.dedupNearBest(df, "id", col("q"), pairs)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(2L, 10L, 20L), kept.toString)
    // contrast: the min-id pick keeps 1, not the better-quality 2
    assert(Dedup.dedupNear(df, "id", pairs)
      .select("id").as[Long].collect().toSet == Set(1L, 10L, 20L))
  }

  test("assertCapUnbound: injected hot shingle throws loudly; cool corpus passes") {
    // 'hot spot' appears in 4 docs — a cap of 3 must bind and name it
    val df = Seq(
      (1L, "hot spot a"), (2L, "hot spot b"), (3L, "hot spot c"),
      (4L, "hot spot d"), (5L, "cool doc e")).toDF("id", "text")
    val e = intercept[graft.core.EngineError] {
      Dedup.assertCapUnbound(df, "text", n = 2, maxDocFreq = 3L, "spec")
    }
    assert(e.getMessage.contains("hot spot") && e.getMessage.contains("4"),
      s"guard must name the hottest shingle: ${e.getMessage}")
    // at cap 4 nothing binds — no throw
    Dedup.assertCapUnbound(df, "text", n = 2, maxDocFreq = 4L, "spec")
    // and an empty frame is a no-op, not a crash
    Dedup.assertCapUnbound(df.filter(col("id") < 0), "text", 2, 1L, "spec")
  }

  test("simhashPairs: banding stays COMPLETE for maxHamming > 3") {
    // Construct ids whose simhash distance is moderate; verify banding
    // output equals the brute-force popcount filter at the same radius.
    val df = docs.filter(col("doc_id") < 80)
    val got = Dedup.simhashPairs(df, "doc_id", "text", maxHamming = 12)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val sigs = df.select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => id -> Dedup.simhash64(t) }
    val brute = (for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b
      if java.lang.Long.bitCount(sa ^ sb) <= 12
    } yield (a, b)).toSet
    assert(got == brute)
  }

  test("simhash: identical texts collide, disjoint texts differ") {
    assert(Dedup.simhash64("spark query engine") == Dedup.simhash64("spark query engine"))
    val df = Seq((1L, "spark query engine fast"), (2L, "spark query engine fast"),
      (3L, "totally different words entirely")).toDF("id", "text")
    val pairs = Dedup.simhashPairs(df, "id", "text", maxHamming = 0)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("nearDupGroups labels components by min id; dedupNear keeps survivors") {
    // Components: {1,2,3} (path), {5,6}, {8} isolated (no pairs). A chain
    // long enough (10..17) to need several propagation rounds exercises the
    // pointer-jumping path.
    val chain = (10L until 17L).map(i => (i, i + 1))
    val pairs = (Seq((1L, 2L), (2L, 3L), (5L, 6L)) ++ chain).toDF("a_id", "b_id")
    // run BOTH resolution paths: the default (driver union-find at this
    // size) and the forced distributed loop — identical labels required
    for (threshold <- Seq(Dedup.DriverResolvePairs, 0L)) {
      val groups = Dedup.nearDupGroups(pairs, "a_id", "b_id", 25, threshold)
        .as[(Long, Long)].collect().toMap
      assert(groups(1L) == 1L && groups(2L) == 1L && groups(3L) == 1L)
      assert(groups(5L) == 5L && groups(6L) == 5L)
      (10L to 17L).foreach(i => assert(groups(i) == 10L))
      assert(!groups.contains(8L)) // nodes in no pair are not in the output
    }

    val table = ((1L to 8L) ++ (10L to 17L)).map(i => (i, s"doc $i")).toDF("id", "text")
    val kept = Dedup.dedupNear(table, "id", pairs).select("id").as[Long].collect().toSet
    // survivors: component minima {1, 5, 10} + everything unpaired
    assert(kept == Set(1L, 4L, 5L, 7L, 8L, 10L))
  }

  test("nearDupGroups matches a brute-force union-find on a real pair set") {
    val pairs = Dedup.jaccardPairs(docs.filter(col("doc_id") < 60),
      "doc_id", "text", n = 2, threshold = 0.05)
    val edges = pairs.select("a_id", "b_id").as[(Long, Long)].collect()
    // driver-side union-find reference
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.map(k => k -> find(k)).toMap
    // both paths against the reference: the fast path IS a union-find
    // (structural twin), the distributed loop must converge to the same map
    val fast = Dedup.nearDupGroups(pairs).as[(Long, Long)].collect().toMap
    val dist = Dedup.nearDupGroups(pairs, "a_id", "b_id", 25, 0L)
      .as[(Long, Long)].collect().toMap
    assert(fast == expected)
    assert(dist == expected)
  }

  test("nearDupGroups/dedupNear: repeated calls leave no persisted RDDs behind (round-9 leak fix)") {
    // Round 8 "released" each superseded round via queryExecution.toRdd —
    // a derived MapPartitionsRDD, so unpersist was a no-op and every round
    // of every call pinned checkpoint blocks until ContextCleaner GC. The
    // release now goes through the REAL persisted handle (the LogicalRDD's
    // rdd). A 60-node chain forces several propagation rounds per call.
    val chain = (100L until 160L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val table = (100L to 161L).map(i => (i, s"doc $i")).toDF("id", "text")
    val before = spark.sparkContext.getPersistentRDDs.size
    (1 to 3).foreach { _ =>
      // force the DISTRIBUTED loop — the leak class under test lives in
      // its per-round checkpoints (the driver fast path has no rounds)
      val groups = Dedup.nearDupGroups(chain, "a_id", "b_id", 25, 0L)
      assert(groups.count() == 61L)
      Dedup.releaseCheckpointBlocks(groups) // caller done with the frame
      val kept = Dedup.dedupNear(table, "id", chain)
      // one component 100..160 → survivor 100; 161 is unpaired and survives
      assert(kept.select("id").as[Long].collect().toSet == Set(100L, 161L))
      Dedup.releaseCheckpointBlocks(kept)
    }
    assert(spark.sparkContext.getPersistentRDDs.size <= before,
      s"nearDupGroups leaked persisted RDDs: ${spark.sparkContext.getPersistentRDDs}")
  }

  test("jaccardIncremental matches brute force; re-delivered docs always drop") {
    val batch = docs.filter(col("doc_id") >= 250 && col("doc_id") < 325)
    val corpus = docs.filter(col("doc_id") < 300)
    val thr = 0.2
    val got = Dedup.jaccardIncremental(batch, "doc_id", "text", 2, thr,
        Dedup.shinglePostings(corpus, "doc_id", "text", 2))
      .select("doc_id").as[Long].collect().toSet

    def shs(t: String) = Dedup.shinglesOf(t, 2).toSet
    val bs = batch.select("doc_id", "text").as[(Long, String)].collect()
      .map { case (i, t) => (i, shs(t)) }.sortBy(_._1)
    val cs = corpus.select("doc_id", "text").as[(Long, String)].collect()
      .map { case (i, t) => (i, shs(t)) }
    def jac(a: Set[String], b: Set[String]): Double = {
      val c = (a & b).size
      if (c == 0) 0.0 else c.toDouble / (a.size + b.size - c)
    }
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for { (i, si) <- bs; (j, sj) <- bs if i < j && jac(si, sj) >= thr } {
      val (ri, rj) = (find(i), find(j))
      if (ri != rj) parent(math.max(ri, rj)) = math.min(ri, rj)
    }
    val expected = bs.filter { case (i, _) => find(i) == i }
      .collect { case (i, si) if !cs.exists { case (_, sc) => jac(si, sc) >= thr } => i }
      .toSet
    assert(got == expected)
    // re-delivered docs (250-299 exist in the corpus verbatim) never survive
    assert((250L until 300L).forall(i => !got.contains(i)), "re-delivered doc survived")
    assert(got.nonEmpty, "fresh batch docs should survive")
  }

  test("nearDupPairsExact refuses tables beyond maxRows (scale guard)") {
    intercept[IllegalArgumentException] {
      Dedup.nearDupPairsExact(embs, "vec_id", "embedding", 0.5, maxRows = 10).collect()
    }
  }

  test("MinHash near-dup pairs are deterministic and find real overlaps") {
    val subset = docs.filter(col("doc_id") < 40)
    val p1 = MinHashDedup.nearDupPairs(subset, "doc_id", "text", 1, 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val p2 = MinHashDedup.nearDupPairs(subset, "doc_id", "text", 1, 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(p1 == p2)
    assert(p1.nonEmpty)
    assert(p1.forall { case (a, b) => a < b })
  }

  test("portable MinHash: precision 1.0 vs exact Jaccard, recall sane, hash matches hex7") {
    val subset = docs.filter(col("doc_id") < 40)
    val got = MinHashDedup.nearDupPairsPortable(subset, "doc_id", "text",
        n = 1, threshold = 0.5)
      .select("a_id", "b_id", "jaccard").as[(Long, Long, Double)].collect().toSet
    // exact (uncapped) unigram Jaccard over the same slice = the truth set
    val exact = Dedup.jaccardPairs(subset, "doc_id", "text", n = 1,
        threshold = 0.5, maxDocFreq = Long.MaxValue)
      .select("a_id", "b_id", "jaccard").as[(Long, Long, Double)].collect().toSet
    assert(got.subsetOf(exact), "portable minhash emitted a pair below threshold")
    assert(got.nonEmpty)
    // candidate recall at s>=0.5 is >= 1-(1-0.5)^8 = 99.6% per pair — on
    // this fixture the hash family deterministically misses exactly one of
    // ~550 true pairs. A systematic permutation/hash bug would crater
    // recall, not shave one pair; pin ≥ 0.99.
    val recall = got.size.toDouble / exact.size
    assert(recall >= 0.99, s"recall $recall; missed ${(exact -- got).take(5)}")
    // the Scala-side permutation constants equal the SQL derivation
    assert(MinHashDedup.hex7("perm-a:0") ==
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest("perm-a:0".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.substring(0, 7), 16))
  }

  // ------------------------------------------------------------ AnnIndex
  test("ANN recall ≥ 0.5 at k=10 on the fixture, and probes are deterministic") {
    val q = embs.filter(col("vec_id") === 7).select("embedding").head.getSeq[Float](0).toArray
    val cfg = AnnIndex.Config(dim = 64, nBits = 6, nTables = 16)
    val recall = AnnIndex.recallAtK(embs, "vec_id", "embedding", q, 10, cfg)
    assert(recall >= 0.5, s"recall $recall")
    val a = AnnIndex.approxTopK(embs, "vec_id", "embedding", q, 10, cfg)
      .select("id").as[Long].collect().toSeq
    val b = AnnIndex.approxTopK(embs, "vec_id", "embedding", q, 10, cfg)
      .select("id").as[Long].collect().toSeq
    assert(a == b)
  }

  test("IVF index: deterministic, recall ≥ 0.5 at k=10 with 6/16 probes") {
    val q = embs.filter(col("vec_id") === 7).select("embedding").head.getSeq[Float](0).toArray
    val exact = graft.operators.Similarity.topK(embs, "embedding", "vec_id", q, 10)
      .select(col("vec_id")).as[Long].collect().toSet
    def run() = IvfIndex.approxTopK(embs, "vec_id", "embedding", q, 10,
      nClusters = 16, nProbe = 6).select("id").as[Long].collect().toSeq
    val a = run(); val b = run()
    assert(a == b) // seeded k-means → deterministic
    val recall = a.toSet.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall $recall")
  }

  // -------------------------------------------------------- TextAnalysis
  test("token counting handles empty and multi-space text") {
    val df = Seq((1L, "a  b   c"), (2L, ""), (3L, "   ")).toDF("id", "text")
    val counts = df.select(col("id"), TextAnalysis.tokenCount(col("text")).as("n"))
      .as[(Long, Int)].collect().toMap
    assert(counts == Map(1L -> 3, 2L -> 0, 3L -> 0))
  }

  test("langId picks marker-hit argmax, 'und' when nothing matches") {
    val df = Seq(
      (1L, "the cat is on the mat and of course"),
      (2L, "der hund ist mit der katze und so"),
      (3L, "zzz qqq www")).toDF("id", "text")
    val got = df.select(col("id"), TextAnalysis.langId(col("text")).as("l"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "en", 2L -> "de", 3L -> "und"))
  }

  test("fingerprint is stable under token order permutation") {
    val df = Seq((1L, "alpha beta gamma"), (2L, "gamma alpha beta")).toDF("id", "text")
    val fps = df.select(TextAnalysis.fingerprint(col("text"), 8)).as[String].collect()
    assert(fps(0) == fps(1))
  }

  test("qualityScore stays within [0,1]") {
    val stats = docs.select(TextAnalysis.qualityScore(col("text")).as("q"))
      .agg(min("q"), max("q")).head
    assert(stats.getDouble(0) >= 0.0 && stats.getDouble(1) <= 1.0)
  }

  // ------------------------------------------------------------ Embedder
  test("hashing embedder: deterministic, unit-norm, strict on empty text") {
    val e = HashingEmbedder(32)
    val v1 = e.embedOne("hello world")
    val v2 = e.embedOne("hello world")
    assert(v1.toSeq == v2.toSeq)
    val norm = math.sqrt(v1.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-6)

    val df = Seq((1L, "ok"), (2L, "  ")).toDF("id", "text")
    val ex = intercept[Exception] { e.embed(df, "text", "emb").collect() }
    def chain(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: chain(t.getCause)
    assert(chain(ex).exists(_.isInstanceOf[EmbedError]))
    // lenient path: zero vector instead of failure
    val z = e.embedLenient(df, "text", "emb").filter(col("id") === 2)
      .select("emb").as[Seq[Float]].head
    assert(z.forall(_ == 0f))
  }

  test("GraftExtensions injects the SQL functions; CachedModelEmbedder builds once per JVM") {
    // extensions injection (unit level: the injector registers cleanly)
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(ext)

    // cached-model embedder: buildModel exactly ONCE per JVM per key, even
    // across repeated jobs (task closures deserialize fresh instances; the
    // JVM-wide cache is what makes the cost once-per-executor)
    val out = CountingEmbedder.instance
      .embedLenient(Seq("a", "b", "c").toDF("text"), "text", "emb")
      .select("emb").as[Seq[Float]].collect()
    assert(out.forall(_.length == 8))
    CountingEmbedder.instance
      .embedLenient(Seq("d", "e").toDF("text"), "text", "emb").collect()
    assert(CountingEmbedder.builds.get() == 1)
  }

  // ---------------------------------------------------------- Multimodal
  test("ANN persisted index: probes prune partitions of the written index") {
    val dir = java.nio.file.Files.createTempDirectory("graft-annidx").toString + "/idx"
    val cfg = AnnIndex.Config(dim = 64, nBits = 6, nTables = 4)
    AnnIndex.writeIndex(AnnIndex.buildIndex(embs, "vec_id", "embedding", cfg), dir, cfg)
    val index = spark.read.parquet(dir)
    val q = embs.filter(col("vec_id") === 3).select("embedding").head.getSeq[Float](0).toArray
    val result = AnnIndex.queryTopK(index, q, 5, cfg)
    val scan = result.queryExecution.executedPlan.toString
    // 4 probed (table,bucket) partitions out of 4×2^6 — the scan must
    // carry partition filters, not read the whole index
    assert(scan.contains("PartitionFilters: ["), scan.take(500))
    assert(!scan.matches("(?s).*PartitionFilters: \\[\\].*"), "partition filters empty")
    assert(result.count() > 0)
  }

  test("decodeFeaturesPartitioned (mapPartitions batch shape) matches the scalar UDF path") {
    val df = Seq((1L, "alpha bravo"), (2L, "charlie delta")).toDF("id", "text")
    val assets = Multimodal.fakeAssets(df, "text")
    val viaPart = Multimodal.decodeFeaturesPartitioned(assets, "id", "asset_bytes", 16)
      .orderBy("id").select("features").as[Seq[Float]].collect()
    val viaUdf = assets.orderBy("id")
      .select(Multimodal.decodeFeaturesCol(col("asset_bytes"), 16)).as[Seq[Float]].collect()
    assert(viaPart.toSeq == viaUdf.toSeq)
  }

  test("fakeDecodeAccum: normalize(accum) == featurize, and accums differ across docs") {
    // The hash-checked multimodal_features row digests the INTEGER
    // accumulation (round-12); this pins that the declared digest's input
    // and the float feature path are the same computation.
    val texts = Seq("alpha bravo charlie", "delta echo foxtrot golf", "über café naïve 日本語")
    for (t <- texts) {
      val bytes = t.getBytes("UTF-8")
      val accum = Multimodal.fakeDecodeAccum(bytes, 16)
      val viaAccum = graft.functions.VectorOps.l2Normalize(accum.map(_.toFloat))
      assert(viaAccum.toSeq == Multimodal.fakeDecodeFeatures(bytes, 16).toSeq, s"mismatch for '$t'")
    }
    val accums = texts.map(t => Multimodal.fakeDecodeAccum(t.getBytes("UTF-8"), 16).toSeq)
    assert(accums.distinct.size == texts.size, "degenerate accumulation: docs collide")
    assert(Multimodal.fakeDecodeAccum(Array.emptyByteArray, 16).toSeq == Seq.fill(16)(0))
  }

  test("multimodal plumbing: byte metadata, fake features, frame explode") {
    val df = Seq((1L, "abcdefgh" * 32)).toDF("id", "text")
    val feat = Multimodal.featurize(df, "text", dim = 16)
    val row = feat.select(col("asset_meta.n_bytes"), col("features")).head
    assert(row.getInt(0) == 256)
    assert(row.getSeq[Float](1).length == 16)

    val frames = Multimodal.sampleFrames(feat, "asset_bytes", frameBytes = 64, stride = 2)
    // 256 bytes → 4 frames of 64 → stride 2 keeps 2
    assert(frames.count() == 2)
    assert(frames.select("n_frames").head.getInt(0) == 2)
    assert(frames.columns.contains("frame_index") && frames.columns.contains("frame_bytes"))
  }

  test("resizeAsset: budget cap, ordered subsequence, passthrough, metadata rewrite") {
    val df = Seq((1L, "abcdefgh" * 32), (2L, "tiny")).toDF("id", "text")
    val resized = Multimodal.resizeAsset(Multimodal.fakeAssets(df, "text"),
      "asset_bytes", "asset_meta", targetW = 4, targetH = 8) // budget 32
    val rows = resized.orderBy("id")
      .select(col("asset_bytes"), col("asset_meta.n_bytes"),
        col("asset_meta.width"), col("asset_meta.height"), col("asset_meta.mime"))
      .collect()

    // oversized payload: sampled down to exactly the budget, bytes form an
    // order-preserving subsequence of the original
    val big = rows(0)
    val bigBytes = big.getAs[Array[Byte]](0)
    assert(bigBytes.length == 32 && big.getInt(1) == 32)
    val orig = ("abcdefgh" * 32).getBytes("UTF-8")
    var oi = 0
    bigBytes.foreach { b =>
      while (oi < orig.length && orig(oi) != b) oi += 1
      assert(oi < orig.length, "resized bytes are not a subsequence of the original")
      oi += 1
    }
    // within-budget payload: untouched bytes, metadata still moves
    val small = rows(1)
    assert(small.getAs[Array[Byte]](0).sameElements("tiny".getBytes("UTF-8")))
    assert(small.getInt(1) == 4)
    rows.foreach { r =>
      assert(r.getInt(2) == 4 && r.getInt(3) == 8 && r.getString(4) == "text/plain")
    }
    // deterministic across runs
    val again = Multimodal.resizeAsset(Multimodal.fakeAssets(df, "text"),
        "asset_bytes", "asset_meta", 4, 8)
      .orderBy("id").select("asset_bytes").as[Array[Byte]].collect()
    assert(again(0).sameElements(bigBytes))
  }

  test("resizeAsset: Int-overflowing target rejected loudly, not as negative budget") {
    val df = Seq((1L, "abc")).toDF("id", "text")
    val assets = Multimodal.fakeAssets(df, "text")
    val ex = intercept[IllegalArgumentException] {
      Multimodal.resizeAsset(assets, "asset_bytes", "asset_meta", 50000, 50000)
    }
    assert(ex.getMessage.contains("exceeds Int.MaxValue"))
    intercept[IllegalArgumentException] {
      Multimodal.resizeAsset(assets, "asset_bytes", "asset_meta", 0, 8)
    }
  }

  test("AnnIndex.Config rejects sign-bit / wrapping nBits and degenerate shapes") {
    // legal boundary: bit 30 is the highest set for nBits=31 → non-negative
    AnnIndex.Config(dim = 4, nBits = 31, nTables = 1)
    intercept[IllegalArgumentException](AnnIndex.Config(dim = 4, nBits = 32))
    intercept[IllegalArgumentException](AnnIndex.Config(dim = 4, nBits = 0))
    intercept[IllegalArgumentException](AnnIndex.Config(dim = 4, nTables = 0))
    intercept[IllegalArgumentException](AnnIndex.Config(dim = 0))
  }

  test("contaminationPairs matches brute-force shingle intersection; no self-matches leak") {
    val corpus = docs.filter(col("doc_id") >= 10 && col("doc_id") < 100)
    val probes = docs.filter(col("doc_id") < 10)
    val got = Dedup.contaminationPairs(corpus, probes,
        "doc_id", "text", "doc_id", "text", n = 2, minOverlap = 3)
      .select("doc_id", "probe_id", "n_shared")
      .as[(Long, Long, Long)].collect().toSet
    val cs = corpus.select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => id -> Dedup.shinglesOf(t, 2).toSet }
    val ps = probes.select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => id -> Dedup.shinglesOf(t, 2).toSet }
    val brute = (for {
      (cid, csh) <- cs; (pid, psh) <- ps
      shared = csh.intersect(psh).size.toLong if shared >= 3
    } yield (cid, pid, shared)).toSet
    assert(got == brute)
    assert(got.nonEmpty) // the fixture genuinely contains contamination
  }

  // -------------------------------------------------------------- Splits
  test("assignSplit: deterministic, exhaustive, ~weight-proportional, growth-stable") {
    val w = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val a = Splits.assignSplit(docs, "doc_id", w)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val b = Splits.assignSplit(docs, "doc_id", w)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(a == b) // bit-deterministic
    assert(a.size == docs.count()) // every row assigned
    val frac = a.values.groupBy(identity).view.mapValues(_.size.toDouble / a.size).toMap
    assert(math.abs(frac("train") - 0.8) < 0.08, s"train frac ${frac("train")}")
    assert(frac.keySet == Set("train", "val", "test"))
    // growth stability: assignments computed on a SUBSET are identical —
    // adding/removing other docs can never move a doc across splits
    val sub = Splits.assignSplit(docs.filter(col("doc_id") < 100), "doc_id", w)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(sub.forall { case (id, s) => a(id) == s })
  }

  test("deterministicSample keeps a stable ~fraction subset; bad weights refused") {
    val s1 = Splits.deterministicSample(docs, "doc_id", 0.2)
      .select("doc_id").as[Long].collect().toSet
    val s2 = Splits.deterministicSample(docs, "doc_id", 0.2)
      .select("doc_id").as[Long].collect().toSet
    assert(s1 == s2)
    assert(math.abs(s1.size.toDouble / docs.count() - 0.2) < 0.08)
    // a larger fraction strictly contains the smaller (nested samples)
    val s3 = Splits.deterministicSample(docs, "doc_id", 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(s1.subsetOf(s3))
    intercept[IllegalArgumentException] {
      Splits.assignSplit(docs, "doc_id", Seq("a" -> 0.5, "b" -> 0.2))
    }
    intercept[IllegalArgumentException] {
      Splits.deterministicSample(docs, "doc_id", 1.5)
    }
  }

  test("dedupIncremental: within-batch min-id survivor, corpus-known content dropped") {
    val corpus = Seq((1L, "alpha text"), (2L, "beta text")).toDF("id", "text")
    val batch = Seq(
      (10L, "alpha text"),  // already in corpus → dropped
      (11L, "gamma text"),  // new
      (12L, "gamma text"),  // within-batch dup → loses to 11
      (13L, "delta text")   // new
    ).toDF("id", "text")
    val out = Dedup.dedupIncremental(batch, "id", "text",
        Dedup.contentHashes(corpus, "text"))
      .select("id").as[Long].collect().toSet
    assert(out == Set(11L, 13L))
    // idempotence: appending the survivors and re-deduping the same batch
    // against the grown corpus drops everything
    val grown = corpus.unionAll(batch.filter(col("id").isin(11L, 13L)))
    assert(Dedup.dedupIncremental(batch, "id", "text",
      Dedup.contentHashes(grown, "text")).count() == 0L)
  }

  test("dupTokenFrac / dupNgramFrac: repetition signals with exact edge cases") {
    val df = Seq(
      (1L, "a b c d"),          // all distinct → 0, bigrams distinct → 0
      (2L, "a a a a"),          // 4 tokens 1 distinct → 0.75; 3 bigrams 1 distinct → 2/3
      (3L, "spam ham spam ham"),// 0.5 tokens; bigrams: [spam ham, ham spam, spam ham] → 1/3
      (4L, ""),                 // empty → 0, 0
      (5L, "solo")              // 1 token → 0; <2 tokens → 0 bigrams
    ).toDF("id", "text")
    val got = df.select(col("id"),
        TextAnalysis.dupTokenFrac(col("text")).as("t"),
        TextAnalysis.dupNgramFrac(col("text"), 2).as("g"))
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    assert(got(0) == ((1L, 0.0, 0.0)))
    assert(got(1)._2 == 0.75 && math.abs(got(1)._3 - 2.0 / 3.0) < 1e-12)
    assert(got(2)._2 == 0.5 && math.abs(got(2)._3 - 1.0 / 3.0) < 1e-12)
    assert(got(3) == ((4L, 0.0, 0.0)))
    assert(got(4) == ((5L, 0.0, 0.0)))
  }

  test("fused metrics struct equals the Column forms field-for-field on the fixture") {
    val cols = docs.select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
      TextAnalysis.approxSubwordCount(col("text")).as("approx_subwords"),
      TextAnalysis.dupTokenFrac(col("text")).as("dup_token_frac"),
      TextAnalysis.dupNgramFrac(col("text"), 2).as("dup_2gram_frac"),
      TextAnalysis.punctRatio(col("text")).as("punct_ratio"),
      TextAnalysis.avgTokenLen(col("text")).as("avg_token_len"),
      TextAnalysis.stopwordRatio(col("text"), TextAnalysis.EnStopwords).as("stopword_ratio"),
      TextAnalysis.qualityScore(col("text")).as("quality"),
      TextAnalysis.filterReasons(col("text")).as("reasons"))
    val fused = docs.select(col("doc_id"), TextAnalysis.metrics(col("text")).as("m"))
      .select(col("doc_id"), col("m.*"))
    // exact equality including doubles: both paths run the same integer
    // divisions / clamp order / HALF_UP rounding
    val a = cols.orderBy("doc_id").collect().map(_.toSeq)
    val b = fused.orderBy("doc_id").collect().map(_.toSeq)
    assert(a.length == b.length && a.length > 0)
    a.zip(b).foreach { case (x, y) => assert(x == y, s"mismatch: $x vs $y") }
    // and on crafted edge cases (empty, single token, repeated phrases)
    val edge = Seq("", "   ", "solo", "a a a a", "spam ham spam ham", "t\tx\ny  z")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val ea = edge.select(TextAnalysis.dupNgramFrac(col("text"), 2),
      TextAnalysis.qualityScore(col("text"))).collect().map(_.toSeq)
    val eb = edge.select(col("doc_id"), TextAnalysis.metrics(col("text")).as("m"))
      .select(col("m.dup_2gram_frac"), col("m.quality")).collect().map(_.toSeq)
    ea.zip(eb).foreach { case (x, y) => assert(x == y, s"edge mismatch: $x vs $y") }
  }

  test("filterReasons: audit trail lists exactly the failing rules") {
    val longClean = "the quick brown fox jumps over a lazy dog and it is " +
      "running for miles with great speed on winding country roads"
    val df = Seq(
      (1L, longClean),                    // passes everything
      (2L, "tiny"),                       // short + few tokens + low quality
      (3L, ("dup " * 30).trim + " " + longClean) // long enough, but repetitive
    ).toDF("id", "text")
    val got = df.select(col("id"), TextAnalysis.filterReasons(col("text")).as("r"))
      .as[(Long, String)].collect().sortBy(_._1)
    assert(got(0)._2 == "")
    assert(got(1)._2.split(",").toSet ==
      Set("too_short", "too_few_tokens", "low_quality"))
    assert(got(2)._2 == "repetitive")
  }

  test("packSequences: first-fit-in-order packing matches brute force across partitions") {
    val df = (1 to 100).map(i => (i.toLong, ((i % 7) + 1).toLong)).toDF("id", "tok")
      .repartition(7)
    val out = Splits.packSequences(df, "id", col("tok"), 10L)
      .select("id", "seq_id").as[(Long, Long)].collect().sortBy(_._1)
    var pre = 0L
    val expect = (1 to 100).map { i =>
      val t = (i % 7) + 1
      val s = pre / 10
      pre += t
      (i.toLong, s)
    }
    assert(out.toSeq == expect)
    // seq ids are contiguous from 0 and non-decreasing in id order
    assert(out.map(_._2).toSet == (0L to out.map(_._2).max).toSet)
    // original columns preserved, helper column dropped
    val cols = Splits.packSequences(df, "id", col("tok"), 10L).columns.toSeq
    assert(cols == Seq("id", "tok", "seq_id"))
  }

  test("packSequences refuses scratch/output column collisions (round-9 guard)") {
    val df = Seq((1L, 3L)).toDF("id", "tok")
    intercept[IllegalArgumentException] {
      Splits.packSequences(df.withColumnRenamed("tok", "__tok"), "id", col("__tok"), 10L)
    }
    intercept[IllegalArgumentException] {
      Splits.packSequences(df.withColumnRenamed("tok", "seq_id"), "id", col("seq_id"), 10L)
    }
    // a precomputed token COLUMN is the supported fast path
    val out = Splits.packSequences(df, "id", col("tok"), 10L)
    assert(out.columns.toSeq == Seq("id", "tok", "seq_id"))
  }

  test("sampleToTokenBudget: deterministic, ~budget tokens per group, small groups kept whole") {
    val tok = TextAnalysis.tokenCount(col("text"))
    val out = Splits.sampleToTokenBudget(docs, "doc_id", "source", tok, 2000L)
    val a = out.select("doc_id").as[Long].collect().toSet
    val b = Splits.sampleToTokenBudget(docs, "doc_id", "source", tok, 2000L)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b) // bit-deterministic
    // each group's kept token mass is ≈budget (or everything, if under)
    val totals = docs.groupBy("source").agg(sum(tok).as("total"))
      .as[(String, Long)].collect().toMap
    val kept = out.groupBy("source").agg(sum(tok).as("kept"))
      .as[(String, Long)].collect().toMap
    totals.foreach { case (src, total) =>
      val k = kept.getOrElse(src, 0L)
      if (total <= 2000L) assert(k == total, s"$src: under-budget group must be kept whole")
      else assert(math.abs(k - 2000L) < 900L, s"$src: kept $k of $total vs budget 2000")
    }
    // a giant budget keeps every row
    assert(Splits.sampleToTokenBudget(docs, "doc_id", "source", tok, 10000000L).count() ==
      docs.count())
  }

  test("splits and samples are decorrelated (salted); null ids are refused") {
    val w = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    // sample-then-split must yield ALL splits: with a shared unsalted
    // hash every sampled row's bucket would sit below the train cut and
    // val/test would be empty.
    val sampledSplits = Splits.assignSplit(
        Splits.deterministicSample(docs, "doc_id", 0.3), "doc_id", w)
      .select("split").as[String].collect().toSet
    assert(sampledSplits == Set("train", "val", "test"))
    // a null id is a data bug, not split policy: fail, don't route
    val withNull = Seq((Some(1L), "a"), (Option.empty[Long], "b")).toDF("id", "text")
    val e = intercept[Exception] {
      Splits.assignSplit(withNull, "id", w).collect()
    }
    assert(e.getMessage.contains("null id") ||
      Option(e.getCause).exists(_.getMessage.contains("null id")))
  }

  test("vocabulary: counts match a brute-force tally; top-N k-bounded plan") {
    val rows = TextAnalysis.vocabulary(docs, "doc_id", "text", topN = 5).collect()
    // brute force on the driver over the same fixture
    val raw = docs.select("doc_id", "text").as[(Long, String)].collect()
    val tf = scala.collection.mutable.Map.empty[String, Long]
    val df = scala.collection.mutable.Map.empty[String, Set[Long]]
    raw.foreach { case (id, t) =>
      t.trim.split("\\s+").filter(_.nonEmpty).foreach { w =>
        tf(w) = tf.getOrElse(w, 0L) + 1
        df(w) = df.getOrElse(w, Set.empty) + id
      }
    }
    val expect = tf.toSeq.map { case (w, c) => (w, c, df(w).size.toLong) }
      .sortBy { case (w, c, _) => (-c, w) }.take(5)
    assert(rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq == expect)
    // top-N must plan as TakeOrderedAndProject (k-bounded), not a global sort
    val plan = TextAnalysis.vocabulary(docs, "doc_id", "text", topN = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected k-bounded top-N:\n$plan")
  }

  test("distinctWordStats: exact count right, sketch within tolerance") {
    val r = TextAnalysis.distinctWordStats(docs, "text").collect().head
    val exact = docs.select(explode(TextAnalysis.tokens(col("text"))).as("w"))
      .distinct().count()
    assert(r.getLong(0) == exact)
    assert(r.getBoolean(1), "HLL++ sketch fell outside the 5% bound")
  }

  test("scrubPii/piiCount: emails and both phone shapes redacted; clean text untouched") {
    val in = Seq(
      (1L, "mail a.b-c_1%d@sub.example.org now"),
      (2L, "call 555-867-5309 or 555-0199 today"),
      (3L, "x@y.io and 123-4567"),
      (4L, "no pii here 12-34 a@b almost@.com"),
      (5L, "")).toDF("id", "t")
    val out = in.select(col("id"), TextAnalysis.scrubPii(col("t")).as("s"),
        TextAnalysis.piiCount(col("t")).as("n"))
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(out(0) == ((1L, "mail <EMAIL> now", 1L)))
    assert(out(1) == ((2L, "call <PHONE> or <PHONE> today", 2L)))
    assert(out(2) == ((3L, "<EMAIL> and <PHONE>", 2L)))
    // '12-34' is not phone-shaped; 'a@b' lacks a dotted TLD; 'almost@.com'
    // fails because the domain needs ≥1 char before its final dot
    assert(out(3) == ((4L, "no pii here 12-34 a@b almost@.com", 0L)))
    assert(out(4) == ((5L, "", 0L)))
  }

  test("stratifiedSample: per-stratum rates hold, default drops unknowns, membership stable") {
    val d = docs.select(col("doc_id"),
      when(col("doc_id") % 3 === 0, "high")
        .when(col("doc_id") % 3 === 1, "mid").otherwise("weird").as("tier"))
    val kept = Splits.stratifiedSample(d, "doc_id", col("tier"),
      Seq("high" -> 1.0, "mid" -> 0.5))
    val byTier = kept.groupBy("tier").count().as[(String, Long)].collect().toMap
    val totals = d.groupBy("tier").count().as[(String, Long)].collect().toMap
    assert(byTier("high") == totals("high"), "rate 1.0 must keep every row")
    val midFrac = byTier("mid").toDouble / totals("mid")
    assert(midFrac > 0.3 && midFrac < 0.7, s"mid keep-rate off: $midFrac")
    assert(!byTier.contains("weird"), "unknown stratum must take defaultRate=0")
    // determinism: same call, same membership
    val again = Splits.stratifiedSample(d, "doc_id", col("tier"),
      Seq("high" -> 1.0, "mid" -> 0.5)).select("doc_id").as[Long].collect().toSet
    assert(again == kept.select("doc_id").as[Long].collect().toSet)
    val e = intercept[IllegalArgumentException] {
      Splits.stratifiedSample(d, "doc_id", col("tier"), Seq("high" -> 1.5))
    }
    assert(e.getMessage.contains("out of [0,1]"))
  }

  test("diversitySample: min(size, cap) per semantic cluster, deterministic, partitioning-stable (r17)") {
    import graft.operators.IvfIndex
    // two well-separated directions: ids 0-5 point along e0 (6 docs),
    // ids 10-11 along e1 (2 docs) — k=2 k-means must split them
    val emb = (
      (0 to 5).map(i => (i.toLong, Seq(1f, 0.01f * i, 0f, 0f))) ++
      (10 to 11).map(i => (i.toLong, Seq(0.01f * (i - 10), 1f, 0f, 0f)))
    ).toDF("vec_id", "embedding")
    val model = IvfIndex.fit(emb, "embedding", k = 2)
    def run(df: org.apache.spark.sql.DataFrame): Set[(Int, Long)] =
      Splits.diversitySample(df, "vec_id", "embedding", model, perClusterCap = 3)
        .select(col("cluster"), col("id"))
        .as[(Int, Long)].collect().toSet
    val sample = run(emb)
    val byCluster = sample.groupBy(_._1).view.mapValues(_.size).toMap
    // the big cluster is capped at 3, the small one keeps BOTH members
    assert(byCluster.values.toSeq.sorted == Seq(2, 3), s"per-cluster counts: $byCluster")
    val smallClusterIds = sample.groupBy(_._1).values.find(_.size == 2).get.map(_._2)
    assert(smallClusterIds == Set(10L, 11L), s"sparse cluster not fully kept: $smallClusterIds")
    // deterministic and invariant under physical partitioning
    assert(run(emb) == sample)
    assert(run(emb.repartition(7)) == sample, "sample changed under repartition")
    intercept[IllegalArgumentException](
      Splits.diversitySample(emb, "vec_id", "embedding", model, 0))
  }

  test("clusterStats: exact per-cluster counts; cohesion 1.0 for identical members (r17)") {
    import graft.operators.IvfIndex
    // two axis-aligned groups whose members EQUAL their direction —
    // k-means centroids land on the directions, so mean_cos is exactly 1
    val emb = (
      (0 to 4).map(i => (i.toLong, Seq(1f, 0f, 0f, 0f))) ++
      (10 to 11).map(i => (i.toLong, Seq(0f, 1f, 0f, 0f)))
    ).toDF("vec_id", "embedding")
    val model = IvfIndex.fit(emb, "embedding", k = 2)
    val stats = IvfIndex.clusterStats(emb, "vec_id", "embedding", model)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq.sortBy(_._1)
    assert(stats.map(_._1) == Seq(2L, 5L), s"cluster sizes: $stats")
    assert(stats.forall { case (_, c) => math.abs(c - 1.0) < 1e-6 },
      s"cohesion of identical members must be 1: $stats")
  }

  test("ngramCounts: counts, prune, and tie-break match brute force") {
    val got = TextAnalysis.ngramCounts(docs, "text", n = 2, minCount = 2L, topN = 10)
      .as[(String, Long)].collect().toSeq
    val raw = docs.select("text").as[String].collect()
    val counts = scala.collection.mutable.Map.empty[String, Long]
    raw.foreach { t =>
      val toks = t.trim.split("\\s+").filter(_.nonEmpty)
      toks.sliding(2).filter(_.length == 2)
        .foreach { b => val k = b.mkString(" "); counts(k) = counts.getOrElse(k, 0L) + 1 }
    }
    val expect = counts.toSeq.filter(_._2 >= 2L)
      .sortBy { case (g, c) => (-c, g) }.take(10)
    assert(got == expect)
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.ngramCounts(docs, "text", n = 0, minCount = 1L, topN = 1)
    }
    assert(e.getMessage.contains("n must be >= 1"))
  }

  test("CountTable lifecycle: append merges exactly, compact == rebuild, topN serves from state") {
    val path = graft.core.SessionCache.newTempDir("spec-count-table")
    val first = docs.filter(col("doc_id") < 250)
    val rest = docs.filter(col("doc_id") >= 250)
    CountTable.build(first, "text", n = 1, path)
    CountTable.append(rest, "text", n = 1, path)
    val rebuilt = CountTable.counts(docs, "text", n = 1)
    // merge-on-read over build+delta equals the from-scratch recount
    val merged = CountTable.read(spark, path)
    assert(merged.except(rebuilt).isEmpty && rebuilt.except(merged).isEmpty,
      "merge-on-read drifted from the recount")
    // compact: same content, fewer files (deltas pre-merged)
    val filesBefore = new java.io.File(s"$path/counts")
      .listFiles().count(_.getName.endsWith(".parquet"))
    CountTable.compact(spark, path)
    val filesAfter = new java.io.File(s"$path/counts")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(filesAfter < filesBefore, s"compact did not merge files ($filesBefore -> $filesAfter)")
    val compacted = CountTable.read(spark, path)
    assert(compacted.except(rebuilt).isEmpty && rebuilt.except(compacted).isEmpty,
      "compaction changed table content")
    // topN over the maintained table == vocabulary over the corpus
    val fromState = CountTable.topN(spark, path, 5)
      .select(col("ngram"), col("tf"), col("df"))
      .as[(String, Long, Long)].collect().toSeq
    val fromCorpus = TextAnalysis.vocabulary(docs, "doc_id", "text", 5)
      .as[(String, Long, Long)].collect().toSeq
    assert(fromState == fromCorpus)

    // DELETE is the exact inverse of append: negated deltas cancel, and
    // the view equals a recount over the surviving docs; fully-zeroed
    // ngrams drop; compact folds the cancellation physically
    CountTable.delete(rest, "text", n = 1, path)
    val withoutRest = CountTable.counts(first, "text", n = 1)
    val afterDelete = CountTable.read(spark, path)
    assert(afterDelete.except(withoutRest).isEmpty &&
      withoutRest.except(afterDelete).isEmpty,
      "delete did not invert append")
    CountTable.compact(spark, path)
    val foldedRows = CountTable.read(spark, path)
    assert(foldedRows.except(withoutRest).isEmpty &&
      withoutRest.except(foldedRows).isEmpty)
  }

  test("vocabIds + tokenizeToIds: round-trippable ids, order preserved, OOV=0, blanks kept") {
    val in = Seq(
      (1L, "b a b c b a"),
      (2L, "zzz a"),        // zzz is in-vocab here (corpus-derived)
      (3L, "")).toDF("doc_id", "text")
    val vocab = TextAnalysis.vocabIds(CountTable.counts(in, "text", n = 1))
    // ranking: b(tf3)=1, a(tf3)? a appears 3 times (2 in doc1 + 1 in doc2): tie
    // with b → word asc: a=1, b=2; c=3... derive expectations from the data:
    val v = vocab.as[(String, Long)].collect().toMap
    assert(v.keySet == Set("a", "b", "c", "zzz"))
    assert(v.values.toSeq.sorted == Seq(1L, 2L, 3L, 4L), s"ids not dense: $v")
    // tf: a=3, b=3, c=1, zzz=1 → tie-break word asc: a=1, b=2, c=3, zzz=4
    assert(v == Map("a" -> 1L, "b" -> 2L, "c" -> 3L, "zzz" -> 4L))
    val out = TextAnalysis.tokenizeToIds(in, "doc_id", "text", vocab)
      .as[(Long, Seq[Long])].collect().sortBy(_._1)
    assert(out(0) == ((1L, Seq(2L, 1L, 2L, 3L, 2L, 1L))))
    assert(out(1) == ((2L, Seq(4L, 1L))))
    assert(out(2) == ((3L, Seq.empty[Long])))
    // OOV maps to 0 under a foreign vocab
    val foreign = Seq(("a", 7L)).toDF("word", "id")
    val oov = TextAnalysis.tokenizeToIds(in, "doc_id", "text", foreign)
      .as[(Long, Seq[Long])].collect().sortBy(_._1)
    assert(oov(0) == ((1L, Seq(0L, 7L, 0L, 0L, 0L, 7L))))
    // the distributed join form (for unbroadcastable vocabularies) agrees
    // with the broadcast-map form exactly, including blanks and OOV
    val joinForm = TextAnalysis.tokenizeToIdsJoin(in, "doc_id", "text", vocab)
      .as[(Long, Seq[Long])].collect().sortBy(_._1)
    assert(joinForm.toSeq == out.toSeq)
    // a vocab over the broadcast cap silently routes to the join form
    val capped = TextAnalysis.tokenizeToIds(in, "doc_id", "text", vocab,
        maxBroadcastEntries = 2)
      .as[(Long, Seq[Long])].collect().sortBy(_._1)
    assert(capped.toSeq == out.toSeq)
  }

  test("lengthHistogram: floor bucketing, empty docs in bucket 0, token mass per bucket") {
    val in = Seq((1L, "a b c"), (2L, ""), (3L, "a b c d e"), (4L, "x"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.lengthHistogram(in, "text", bucketWidth = 4L)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // n_tokens: 3, 0, 5, 1 → bucket 0 (n<4): docs 1,2,4 (mass 4); bucket 1: doc 3 (mass 5)
    assert(got == Seq((0L, 0L, 3L, 4L), (1L, 4L, 1L, 5L)), got.toString)
    intercept[IllegalArgumentException] {
      TextAnalysis.lengthHistogram(in, "text", 0L)
    }
  }

  test("lineClean: word floor, marker regex, terminal-punct flag, within-doc line dedup") {
    val in = Seq(
      (1L, "one two three four five six.\nSubscribe now\ntiny line\nanother good line right here"),
      (2L, "repeat me over and over again\nrepeat me over and over again\nclosing words of this doc."),
      (3L, "")).toDF("doc_id", "text")

    val base = TextAnalysis.lineClean(in, "text", minWords = 4,
        boilerplateRe = "(?i)subscribe")
      .select("doc_id", "n_lines", "n_kept", "cleaned")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    // doc 1: 4 lines; "Subscribe now" (regex) and "tiny line" (<4 words) drop
    assert(base(0) == (1L, 4L, 2L,
      "one two three four five six.\nanother good line right here"))
    // doc 2: repeated line kept twice WITHOUT dedup
    assert(base(1)._3 == 3L)
    // empty text: zero lines, empty cleaned
    assert(base(2) == (3L, 0L, 0L, ""))

    // dedupLines: the repeated line collapses to its first occurrence
    val dd = TextAnalysis.lineClean(in, "text", minWords = 4,
        boilerplateRe = "(?i)subscribe", dedupLines = true)
      .filter(col("doc_id") === 2L)
      .select("n_kept", "cleaned").as[(Long, String)].head()
    assert(dd == (2L,
      "repeat me over and over again\nclosing words of this doc."))

    // requireTerminalPunct: only sentence-final lines survive
    val tp = TextAnalysis.lineClean(in, "text", minWords = 4,
        boilerplateRe = "(?i)subscribe", requireTerminalPunct = true)
      .filter(col("doc_id") === 1L)
      .select("cleaned").as[String].head()
    assert(tp == "one two three four five six.")
  }

  test("hotLines/removeHotLines: interdoc df via per-doc distinct, in-row removal, cap guard") {
    // the footer appears once per doc (doubled in doc 1 — per-doc
    // distinctness must count it ONCE per doc) across 3 docs; cap 2
    val in = Seq(
      (1L, "alpha content\nshared footer\nshared footer"),
      (2L, "beta content\nshared footer"),
      (3L, "gamma content\nshared footer")).toDF("doc_id", "text")
    val hot = TextAnalysis.hotLines(in, "text", maxDocFreq = 2L)
    assert(hot.as[(String, Long)].collect().toSeq == Seq(("shared footer", 3L)))

    val cleaned = TextAnalysis.removeHotLines(in, "text", hot)
      .select("doc_id", "n_removed", "cleaned")
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(cleaned == Seq(
      (1L, 2L, "alpha content"), // BOTH copies of a hot line are removed
      (2L, 1L, "beta content"),
      (3L, 1L, "gamma content")), cleaned.toString)

    // past the broadcast cap the call degrades to the distributed join
    // form (round-14) — same answer, line-level exchange instead of a
    // driver set
    val viaJoin = TextAnalysis.removeHotLines(in, "text", hot, maxBroadcastLines = 0)
      .select("doc_id", "n_removed", "cleaned")
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(viaJoin == cleaned, s"join fallback diverged: $viaJoin")
    // and the join form directly, including a doc whose every line is hot
    val allHot = Seq((9L, "shared footer\nshared footer")).toDF("doc_id", "text")
    val gone = TextAnalysis.removeHotLinesJoin(allHot, "text", hot)
      .select("doc_id", "n_removed", "cleaned")
      .as[(Long, Long, String)].collect().toSeq
    assert(gone == Seq((9L, 2L, "")), gone.toString)
  }

  test("phrasePositions/containsPhrase: exact token-sequence match, overlaps, edges") {
    val in = Seq(
      (1L, "a b c a b"),     // "a b" at 1 and 4
      (2L, "ab c"),          // no token-boundary match for "a b"
      (3L, "a"),             // shorter than the phrase
      (4L, ""),              // empty
      (5L, "a a a")).toDF("doc_id", "text") // overlapping "a a" at 1 and 2
    val out = in.select(col("doc_id"),
        TextAnalysis.phrasePositions(col("text"), Seq("a", "b")).as("p"),
        TextAnalysis.containsPhrase(col("text"), Seq("a", "b")).as("hit"))
      .as[(Long, Seq[Int], Boolean)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, Seq(1, 4), true), (2L, Seq.empty, false), (3L, Seq.empty, false),
      (4L, Seq.empty, false), (5L, Seq.empty, false)))
    val overlap = in.filter(col("doc_id") === 5)
      .select(TextAnalysis.phrasePositions(col("text"), Seq("a", "a")))
      .as[Seq[Int]].head
    assert(overlap == Seq(1, 2))
  }

  test("snippet: leftmost term wins, window clamps at start, miss gives empty") {
    val in = Seq(
      (1L, "xxxx target yyyy"),
      (2L, "target at start"),
      (3L, "nothing here")).toDF("doc_id", "text")
    val out = in.select(col("doc_id"),
        TextAnalysis.snippet(col("text"), Seq("target", "start"), width = 3).as("s"))
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    // width 3, maxTermLen 6 → 12 chars from max(1, pos-3)
    assert(out(0) == ((1L, "xx target yy")))
    assert(out(1) == ((2L, "target at st"))) // clamped at 1; leftmost of the two terms
    assert(out(2) == ((3L, "")))
  }

  test("bigramNovelty: integer signals match brute force; short docs get zeros") {
    val in = Seq(
      (1L, "a b c"),          // bigrams: "a b", "b c"
      (2L, "a b a b"),        // "a b" ×2, "b a"
      (3L, "x"),              // no bigrams
      (4L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramNovelty(in, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // corpus counts: "a b"→3, "b c"→1, "b a"→1
    assert(out(0) == ((1L, 2L, 4L, 1L)))   // 3+1, rarest "b c"=1
    assert(out(1) == ((2L, 3L, 7L, 1L)))   // 3+3+1, rarest "b a"=1
    assert(out(2) == ((3L, 0L, 0L, 0L)))
    assert(out(3) == ((4L, 0L, 0L, 0L)))
  }
}
