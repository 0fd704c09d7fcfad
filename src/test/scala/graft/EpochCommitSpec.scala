package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, HotLinesIndex, IndexedBm25}

/** CRASH-INJECTION contracts for the single-commit append protocol
  * (round-15; VERDICT r14 "wrong" #1): a multi-dir index append must be
  * all-or-nothing — probes between a crash and the next compact must see
  * either the WHOLE batch or NONE of it, never postings without their
  * stats/sidecar. The former 3-write (BM25) and 2-write (shingle
  * postings) sequences are now stage-then-commit; these tests stop the
  * lifecycle at every former crash point and assert invisibility, then
  * commit and assert full parity with a from-scratch rebuild.
  */
class EpochCommitSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "apple"),
    (4L, "dog dog dog dog"),
    (5L, "cherry dog apple banana"))
  private def corpusDF = corpus.toDF("doc_id", "text")
  private def oldDF = corpusDF.filter(col("doc_id") <= 3)
  private def batchDF = corpusDF.filter(col("doc_id") > 3)
  private val terms = Seq("apple", "dog")

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Minimal staged-data dir for protocol-level commit tests (r20: commit
    * verifies the staged data still exists — a bare marker with no staged
    * dir is the completed-compact data-loss signature and is refused).
    */
  private def stageDummy(path: String, e: String): Unit = {
    val d = new org.apache.hadoop.fs.Path(s"$path/data/epoch=$e")
    d.getFileSystem(spark.sparkContext.hadoopConfiguration).mkdirs(d)
  }

  private def bm25Rows(path: String): Seq[(Long, Double)] =
    IndexedBm25.topK(spark, path, terms, 10)
      .select(col("doc_id"), round(col("score"), 9).as("s"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  private def fsDelete(p: String): Unit = {
    val hp = new org.apache.hadoop.fs.Path(p)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(hp, true)
  }

  test("bm25 append: a staged-but-uncommitted batch is COMPLETELY invisible to probes") {
    val path = tmp("graft-epoch-bm25")
    IndexedBm25.build(oldDF, "doc_id", "text", path)
    val baseline = bm25Rows(path)

    // crash AFTER all three data writes but BEFORE the commit marker —
    // the worst case of the former append (everything on disk, nothing
    // linearized). Probes must score exactly as before the append: same
    // docs, same (n, total)-dependent scores.
    val staged = IndexedBm25.stageBatch(batchDF, "doc_id", "text", path)
    assert(bm25Rows(path) == baseline,
      "staged (uncommitted) batch leaked into a probe")

    // crash BETWEEN the former write 1 and write 2: only postings of a
    // second stage exist, its meta/doclens dirs missing entirely.
    val staged2 = IndexedBm25.stageBatch(batchDF, "doc_id", "text", path)
    fsDelete(s"$path/meta/epoch=$staged2")
    fsDelete(s"$path/doclens/epoch=$staged2")
    assert(bm25Rows(path) == baseline,
      "postings-only partial stage leaked into a probe")

    // the commit marker is the linearization point: afterwards the probe
    // equals a from-scratch rebuild over old ∪ batch.
    graft.store.EpochCommit.commit(spark, path, staged)
    val rebuilt = tmp("graft-epoch-bm25-rebuild")
    IndexedBm25.build(corpusDF, "doc_id", "text", rebuilt)
    assert(bm25Rows(path) == bm25Rows(rebuilt),
      "committed append != rebuild over old ∪ batch")

    // compact garbage-collects the orphaned partial stage and preserves
    // the probe (delete-free compact == plain rewrite).
    IndexedBm25.compact(spark, path)
    assert(bm25Rows(path) == bm25Rows(rebuilt))
    val orphan = new org.apache.hadoop.fs.Path(s"$path/postings/epoch=$staged2")
    assert(!orphan.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(orphan),
      "compact did not GC the orphaned staged epoch")
  }

  test("bm25: a never-committed index fails loudly instead of reading as empty") {
    val path = tmp("graft-epoch-bm25-unbuilt")
    IndexedBm25.stageBatch(corpusDF, "doc_id", "text", path)
    val e = intercept[graft.core.EngineError](bm25Rows(path))
    assert(e.getMessage.contains("no committed epochs"))
  }

  test("shingle postings append: staged batch invisible; commit == rebuild; compact GCs orphans") {
    val path = tmp("graft-epoch-shingle")
    Dedup.buildPostingsIndex(oldDF, "doc_id", "text", n = 2, path)
    def rows() = Dedup.readPostingsIndex(spark, path)
      .select("corpus_id", "corpus_size", "shingle")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val baseline = rows()

    // crash after the postings write, before the freqs sidecar (the
    // former 2-write window): stage fully, then remove the freqs half —
    // on-disk state identical to that crash. Readers see NOTHING of it.
    val staged = Dedup.stagePostingsBatch(batchDF, "doc_id", "text", 2, path, 1000L)
    fsDelete(s"$path/freqs/epoch=$staged")
    assert(rows() == baseline, "partial stage leaked into readPostingsIndex")

    // a clean stage+commit equals append; append equals rebuild.
    Dedup.appendPostingsIndex(batchDF, "doc_id", "text", n = 2, path)
    val rebuilt = tmp("graft-epoch-shingle-rebuild")
    Dedup.buildPostingsIndex(corpusDF, "doc_id", "text", n = 2, rebuilt)
    def rowsAt(p: String) = Dedup.readPostingsIndex(spark, p)
      .select("corpus_id", "corpus_size", "shingle")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(rowsAt(path) == rowsAt(rebuilt))

    // compact: orphaned freqs-less stage is GC'd, content still == rebuild
    // (the global re-cap needs the freqs sidecar — which every COMMITTED
    // epoch is now guaranteed to carry).
    Dedup.compactPostingsIndex(spark, path)
    assert(rowsAt(path) == rowsAt(rebuilt))
    val orphan = new org.apache.hadoop.fs.Path(s"$path/postings/epoch=$staged")
    assert(!orphan.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(orphan),
      "compact did not GC the orphaned staged epoch")
  }

  test("hot-lines index: staged delta invisible; append sums to recompute; compact preserves") {
    import graft.operators.{HotLinesIndex, TextAnalysis}
    val corpus = Seq(
      (1L, "chrome line\nreal content one"),
      (2L, "chrome line\nreal content two"),
      (3L, "chrome line\nreal content three"),
      (4L, "chrome line\nanother body"),
      (5L, "chrome line\nlast body"))
      .toDF("doc_id", "text")
    val oldDocs = corpus.filter(col("doc_id") <= 3)
    val batch = corpus.filter(col("doc_id") > 3)
    val path = tmp("graft-epoch-hotlines")
    def served(cap: Long) = HotLinesIndex.hotLines(spark, path, cap)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet

    HotLinesIndex.build(oldDocs, "text", path)
    assert(served(2L) == Set(("chrome line", 3L)))

    // staged-but-uncommitted batch delta is invisible
    HotLinesIndex.stageBatch(batch, "text", path)
    assert(served(2L) == Set(("chrome line", 3L)), "uncommitted delta leaked")

    // committed append: per-batch deltas SUM to the whole-corpus
    // recompute (each doc in exactly one batch)
    HotLinesIndex.append(batch, "text", path)
    val recomputed = TextAnalysis.hotLines(corpus, "text", maxDocFreq = 2L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(served(2L) == recomputed && served(2L) == Set(("chrome line", 5L)))

    // the cap is a read-time parameter (re-threshold without rebuild)
    assert(served(4L) == Set(("chrome line", 5L)) && served(5L).isEmpty)

    // compact collapses deltas (incl. GC of the orphaned stage), content
    // unchanged; the freqs dir is down to one committed epoch
    HotLinesIndex.compact(spark, path)
    assert(served(2L) == recomputed)
    assert(graft.store.EpochCommit.committed(spark, path).size == 1)

    // DELETE: retire the appended batch via negated deltas — served
    // counts must equal a recompute over the survivors, and the retired
    // docs' lines cancel to zero (excluded at any cap; compact folds
    // the cancellation into a physically clean table)
    HotLinesIndex.delete(batch, "text", path)
    assert(served(2L) == Set(("chrome line", 3L)), "delete did not subtract")
    HotLinesIndex.compact(spark, path)
    assert(served(2L) == Set(("chrome line", 3L)))
    val allRows = graft.store.EpochCommit
      .readCommitted(spark, path, s"$path/freqs", "hot-lines index")
      .collect()
    assert(allRows.forall(_.getLong(1) != 0L), "compact kept a cancelled line")
  }

  test("commit marker create is refused for a duplicate epoch id") {
    val path = tmp("graft-epoch-dup")
    val e = graft.store.EpochCommit.newEpochId()
    stageDummy(path, e)
    graft.store.EpochCommit.commit(spark, path, e)
    intercept[Exception](graft.store.EpochCommit.commit(spark, path, e))
    assert(graft.store.EpochCommit.committed(spark, path) == Seq(e))
  }

  test("committed() ignores stray files that are not epoch ids (r16 advisor)") {
    val path = tmp("graft-epoch-stray")
    val e = graft.store.EpochCommit.newEpochId()
    stageDummy(path, e)
    graft.store.EpochCommit.commit(spark, path, e)
    // plant crash artifacts / editor temps next to the real marker
    val dir = new org.apache.hadoop.fs.Path(s"$path/epochs")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(".e123.swp", "e1", "E" + "0" * 32, e + "x", "_SUCCESS").foreach { n =>
      fs.create(new org.apache.hadoop.fs.Path(dir, n), false).close()
    }
    assert(graft.store.EpochCommit.committed(spark, path) == Seq(e),
      "a stray file entered the committed set")
    assert(graft.store.EpochCommit.committedCount(spark, path) == 1)
    // …but the filtered names are SURFACED, not swallowed (r16 advisor:
    // the shape filter must not turn a corrupt/foreign marker into
    // invisible data — an operator reads this next to committedCount)
    // .sorted on the expectation too: `e` is a RANDOM epoch id, so the
    // relative order of "e1" and e+"x" depends on e's first hex digit —
    // the hand-ordered form flaked 1 run in 16 (caught round 18)
    assert(graft.store.EpochCommit.strayMarkers(spark, path)
      == Seq(".e123.swp", "E" + "0" * 32, "_SUCCESS", "e1", e + "x").sorted)
    assert(graft.store.EpochCommit.strayMarkers(spark, tmp("graft-epoch-nostray"))
      .isEmpty)
  }

  test("commit refuses malformed epoch ids and a held swap lock (r16 advisor)") {
    val path = tmp("graft-epoch-guard")
    intercept[IllegalArgumentException](
      graft.store.EpochCommit.commit(spark, path, "e1"))
    // a held swap lock means a compact is rewriting the tree — an epoch
    // committed now would vanish with the swap; commit must fail loudly
    val lock = new org.apache.hadoop.fs.Path(path + ".lock")
    val fs = lock.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(lock, false).close()
    try {
      val err = intercept[graft.core.EngineError](
        graft.store.EpochCommit.commit(spark, path, graft.store.EpochCommit.newEpochId()))
      assert(err.getMessage.contains("swap lock"))
    } finally fs.delete(lock, false)
    // lock released → commit goes through
    val e = graft.store.EpochCommit.newEpochId()
    stageDummy(path, e)
    graft.store.EpochCommit.commit(spark, path, e)
    assert(graft.store.EpochCommit.committed(spark, path) == Seq(e))
  }

  test("hot-lines append/delete skip the epoch for an EMPTY batch (r16 advisor)") {
    import spark.implicits._
    val path = tmp("graft-epoch-emptybatch")
    val d = Seq((1L, "a line\nshared"), (2L, "b line\nshared")).toDF("doc_id", "text")
    HotLinesIndex.build(d, "text", path)
    val before = graft.store.EpochCommit.committed(spark, path)
    // an empty micro-batch (legitimate in streaming maintenance) must be
    // a no-op — an empty parquet delta dir could poison schema inference
    HotLinesIndex.append(d.filter(col("doc_id") > 99L), "text", path)
    HotLinesIndex.delete(d.filter(col("doc_id") > 99L), "text", path)
    assert(graft.store.EpochCommit.committed(spark, path) == before,
      "empty batch committed an epoch")
    val hot = HotLinesIndex.hotLines(spark, path, maxDocFreq = 1L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(hot == Set(("shared", 2L)))
  }

  test("idempotent appends: a replayed micro-batch lands its delta exactly once (r17)") {
    import spark.implicits._
    val path = tmp("graft-epoch-idem")
    val d = Seq((1L, "shared line\nalpha"), (2L, "shared line\nbeta")).toDF("doc_id", "text")
    HotLinesIndex.build(d, "text", path)
    val batch = Seq((3L, "shared line\ngamma")).toDF("doc_id", "text")
    def served: Set[(String, Long)] =
      HotLinesIndex.hotLines(spark, path, maxDocFreq = 1L)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet

    // same tag twice == once: the deterministic epoch's marker dedups
    HotLinesIndex.append(batch, "text", path, idempotencyTag = Some("run:b1"))
    val after = served
    assert(after == Set(("shared line", 3L)), s"first append wrong: $after")
    HotLinesIndex.append(batch, "text", path, idempotencyTag = Some("run:b1"))
    assert(served == after, "replayed append doubled the delta")
    assert(graft.store.EpochCommit.committedCount(spark, path) == 2)

    // crashed-attempt replay: a PARTIAL stage under the deterministic
    // epoch (no marker) is overwritten by the retry, never duplicated
    // and never error-on-exists
    val e = graft.store.EpochCommit.deterministicEpochId("run:b2")
    HotLinesIndex.stageBatch(batch, "text", path, Some(e)) // crash before commit
    assert(served == after, "uncommitted stage leaked")
    HotLinesIndex.append(batch, "text", path, idempotencyTag = Some("run:b2"))
    // b2 re-ingests the same doc (caller-contract violation, deliberate):
    // the point is the delta lands ONCE — shared 3+1, gamma 1+1, exactly
    assert(served == Set(("shared line", 4L), ("gamma", 2L)),
      s"retry after crash wrong: $served")

    // deterministic ids have the canonical shape and are stable
    assert(e.matches("^e[0-9a-f]{32}$") &&
      e == graft.store.EpochCommit.deterministicEpochId("run:b2") &&
      e != graft.store.EpochCommit.deterministicEpochId("run:b3"))

    // the delete face shares the contract: one batch retired once
    // (shared 4-1, gamma 2-1 → at or under the cap → out of the hot set)
    HotLinesIndex.delete(batch, "text", path, idempotencyTag = Some("run:del1"))
    HotLinesIndex.delete(batch, "text", path, idempotencyTag = Some("run:del1"))
    assert(served == Set(("shared line", 3L)), s"replayed delete double-subtracted: $served")
  }

  test("compactIfNeeded: fires at the threshold, not below; rejects a degenerate threshold (r17)") {
    val path = tmp("graft-epoch-governor")
    var fired = 0
    def tryCompact(threshold: Int): Boolean =
      graft.store.EpochCommit.compactIfNeeded(spark, path, threshold) { fired += 1 }
    intercept[IllegalArgumentException](tryCompact(1)) // 1-epoch index is already compact
    assert(!tryCompact(2) && fired == 0, "fired on an empty index")
    val e1 = graft.store.EpochCommit.newEpochId()
    stageDummy(path, e1)
    graft.store.EpochCommit.commit(spark, path, e1)
    assert(!tryCompact(2) && fired == 0, "fired below the threshold")
    val e2 = graft.store.EpochCommit.newEpochId()
    stageDummy(path, e2)
    graft.store.EpochCommit.commit(spark, path, e2)
    assert(tryCompact(2) && fired == 1, "did not fire at the threshold")
    // the helper reports; the caller's compactFn owns the actual fold —
    // the count is unchanged here because the test's fn is a counter
    assert(graft.store.EpochCommit.committedCount(spark, path) == 2)
  }

  test("commit refuses when the staged data vanished — the completed-compact window (r20 review)") {
    // a compact that starts AND finishes inside the stage→commit gap
    // leaves no lock to observe, but its dir swap deleted the staged
    // files: committing a marker for them would be silent batch loss
    val path = tmp("graft-epoch-gone")
    val e = graft.store.EpochCommit.newEpochId()
    stageDummy(path, e)
    fsDelete(s"$path/data/epoch=$e")
    val err = intercept[graft.core.EngineError](
      graft.store.EpochCommit.commit(spark, path, e))
    assert(err.getMessage.contains("no staged data"), err.getMessage)
    assert(graft.store.EpochCommit.committed(spark, path).isEmpty,
      "refused commit left a marker behind")
    // with the staged data present the same commit goes through
    stageDummy(path, e)
    graft.store.EpochCommit.commit(spark, path, e)
    assert(graft.store.EpochCommit.committed(spark, path) == Seq(e))
  }

  test("an emptied index with swap debris names the .bak restore, never 'build it first' (r20 review)") {
    val parent = tmp("graft-epoch-debris")
    val path = s"$parent/idx"
    val bak = new org.apache.hadoop.fs.Path(s"$parent/idx.bak-12345")
    bak.getFileSystem(spark.sparkContext.hadoopConfiguration).mkdirs(bak)
    val err = intercept[graft.core.EngineError](
      graft.store.EpochCommit.committedOrThrow(spark, path, "test index"))
    assert(err.getMessage.contains("RESTORE") && err.getMessage.contains(".bak"),
      err.getMessage)
    // without debris the unbuilt message stands
    val clean = intercept[graft.core.EngineError](
      graft.store.EpochCommit.committedOrThrow(spark, tmp("graft-epoch-clean"),
        "test index"))
    assert(clean.getMessage.contains("build it first"), clean.getMessage)
  }

  test("hot-lines: one tag drives append AND delete as distinct epochs; all-cancelled compact refuses (r20 review)") {
    import graft.operators.HotLinesIndex
    val docs = Seq(
      (1L, "chrome line\nbody one"),
      (2L, "chrome line\nbody two"),
      (3L, "chrome line\nbody three")).toDF("doc_id", "text")
    val batch = docs.filter(col("doc_id") === 3L)
    val path = tmp("graft-epoch-hl-tag")
    HotLinesIndex.build(docs.filter(col("doc_id") <= 2), "text", path)
    def served() = HotLinesIndex.hotLines(spark, path, 1L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(served() == Set(("chrome line", 2L)))
    // the documented (run, batchId)-scoped tag, SAME for both verbs: the
    // pre-fix shared epoch id silently skipped the delete as a "replay"
    val tag = Some("run42:7")
    HotLinesIndex.append(batch, "text", path, idempotencyTag = tag)
    assert(served() == Set(("chrome line", 3L)), "tagged append did not land")
    HotLinesIndex.delete(batch, "text", path, idempotencyTag = tag)
    assert(served() == Set(("chrome line", 2L)),
      "the delete under the same tag was silently skipped as a replay")
    // ...while a REPLAY of the same verb under the same tag stays a no-op
    HotLinesIndex.delete(batch, "text", path, idempotencyTag = tag)
    assert(served() == Set(("chrome line", 2L)), "replayed delete double-applied")

    // fully-cancelled table: reads serve the (correct) empty hot set,
    // compact refuses the footer-less fold loudly
    val path2 = tmp("graft-epoch-hl-cancel")
    HotLinesIndex.build(docs, "text", path2)
    HotLinesIndex.delete(docs, "text", path2)
    assert(HotLinesIndex.hotLines(spark, path2, 1L).isEmpty)
    val err = intercept[graft.core.EngineError](HotLinesIndex.compact(spark, path2))
    assert(err.getMessage.contains("fully cancelled"), err.getMessage)
    // and a no-line batch stages NO epoch (delta-level guard)
    val before = graft.store.EpochCommit.committedCount(spark, path2)
    HotLinesIndex.append(Seq((9L, "   \n  ")).toDF("doc_id", "text"), "text", path2)
    assert(graft.store.EpochCommit.committedCount(spark, path2) == before,
      "a no-line batch staged an (unreadable) empty epoch")
  }
}
