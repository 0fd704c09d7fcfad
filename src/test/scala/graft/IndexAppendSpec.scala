package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{AnnIndex, IvfIndex}

/** Index MAINTENANCE contracts (round-9): appending a daily batch into a
  * persisted index must probe identically to a from-scratch build over
  * old ∪ new — LSH unconditionally (data-independent hyperplanes), IVF
  * against the frozen model — and the drift check must separate
  * same-distribution batches from genuinely shifted ones.
  */
class IndexAppendSpec extends SparkSpec {

  private lazy val embs = spark.read.parquet(s"$Sf0001/embeddings.parquet")
  private lazy val cfg = AnnIndex.Config(dim = 64, nBits = 4, nTables = 8)
  private lazy val qVec = embs.filter(col("vec_id") === 3)
    .select("embedding").head.getSeq[Float](0).toArray

  private def probeRows(df: DataFrame): Seq[(Long, Double)] =
    df.select(col("id"), round(col("score"), 6).as("s"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  test("LSH appendToIndex: probe equals rebuild-from-scratch over old ∪ new") {
    val old = embs.filter(col("vec_id") < 150)
    val batch = embs.filter(col("vec_id") >= 150)
    val path = java.nio.file.Files.createTempDirectory("graft-lsh-append").toString
    AnnIndex.writeIndex(AnnIndex.buildIndex(old, "vec_id", "embedding", cfg), path)
    AnnIndex.appendToIndex(batch, path, "vec_id", "embedding", cfg)
    val viaAppend = probeRows(AnnIndex.queryTopK(spark.read.parquet(path), qVec, 10, cfg))
    val viaRebuild = probeRows(
      AnnIndex.queryTopK(AnnIndex.buildIndex(embs, "vec_id", "embedding", cfg), qVec, 10, cfg))
    assert(viaAppend == viaRebuild)
    // and the appended rows are really served from the index files
    assert(spark.read.parquet(path).count() == embs.count() * cfg.nTables)

    // compaction: per-append files collapse back to one per dir, rows and
    // probes unchanged
    def parquetFiles() = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(path)).iterator().asScala
        .count(_.toString.endsWith(".parquet"))
    }
    val before = parquetFiles()
    AnnIndex.compactIndex(spark, path)
    assert(parquetFiles() < before, s"compaction did not reduce files ($before)")
    assert(spark.read.parquet(path).count() == embs.count() * cfg.nTables)
    assert(probeRows(AnnIndex.queryTopK(spark.read.parquet(path), qVec, 10, cfg)) == viaRebuild)
  }

  test("IVF appendToIndex: frozen-model append probes equal to frozen-model rebuild") {
    val old = embs.filter(col("vec_id") < 150)
    val batch = embs.filter(col("vec_id") >= 150)
    val model = IvfIndex.fit(old, "embedding", k = 8)
    val nProbe = IvfIndex.defaultNProbe(8)
    val path = java.nio.file.Files.createTempDirectory("graft-ivf-append").toString
    IvfIndex.writeIndex(IvfIndex.buildIndex(old, "vec_id", "embedding", model), path)
    IvfIndex.appendToIndex(batch, path, "vec_id", "embedding", model)
    val viaAppend = probeRows(
      IvfIndex.queryTopK(spark.read.parquet(path), model, qVec, 10, nProbe))
    val viaRebuild = probeRows(
      IvfIndex.queryTopK(IvfIndex.buildIndex(embs, "vec_id", "embedding", model), model, qVec, 10, nProbe))
    assert(viaAppend == viaRebuild)
    assert(spark.read.parquet(path).count() == embs.count())

    // IVF compaction: same contract as the LSH twin — fewer files, rows
    // and probes unchanged
    def parquetFiles() = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(path)).iterator().asScala
        .count(_.toString.endsWith(".parquet"))
    }
    val before = parquetFiles()
    IvfIndex.compactIndex(spark, path)
    assert(parquetFiles() < before, s"IVF compaction did not reduce files ($before)")
    assert(spark.read.parquet(path).count() == embs.count())
    assert(probeRows(IvfIndex.queryTopK(spark.read.parquet(path), model, qVec, 10, nProbe)) == viaRebuild)
  }

  test("driftCheck: same-distribution batch passes; shifted batch recommends a re-fit") {
    // baseline must be OUT-OF-SAMPLE: in-sample assignment quality is
    // ~0.15 optimistic at this geometry (measured), which would flag
    // every healthy batch
    val fitPart = embs.filter(col("vec_id") < 100)
    val heldOut = embs.filter(col("vec_id") >= 100 && col("vec_id") < 150)
    val batch = embs.filter(col("vec_id") >= 150)
    val model = IvfIndex.fit(fitPart, "embedding", k = 8)
    val baseline = IvfIndex.meanAssignedCosine(heldOut, "embedding", model)
    assert(!baseline.isNaN && baseline > 0)

    val same = IvfIndex.driftCheck(batch, "embedding", model, baseline)
    assert(!same.refitRecommended,
      s"same-distribution batch flagged: batch=${same.batchMeanCos} baseline=$baseline")

    // an unscorable batch (all-zero vectors) must not read as healthy
    val zeros = spark.range(3).select(col("id").as("vec_id"),
      array_repeat(lit(0f), 64).as("embedding"))
    assert(IvfIndex.driftCheck(zeros, "embedding", model, baseline).refitRecommended)
  }

  test("driftCheck flags a genuine distribution shift (clustered corpus)") {
    // The fixture embeddings are weakly clustered — assignment quality
    // sits near the random-vector level, so no batch can drop much below
    // baseline there. A REAL deployment fits on clustered data; emulate
    // it: 3 tight clusters around orthogonal axes (deterministic noise).
    import spark.implicits._
    def cluster(axis: Int, ids: Range): Seq[(Long, Array[Float])] =
      ids.map { i =>
        val v = Array.tabulate(16)(d =>
          (if (d == axis) 1.0f else 0.0f) + ((i * 31 + d * 7) % 11 - 5) / 100.0f)
        (i.toLong, v)
      }
    val corpus = (cluster(0, 0 until 40) ++ cluster(1, 40 until 80) ++
      cluster(2, 80 until 120)).toDF("vec_id", "embedding")
    val heldOut = (cluster(0, 200 until 220) ++ cluster(1, 220 until 240))
      .toDF("vec_id", "embedding")
    val model = IvfIndex.fit(corpus, "embedding", k = 3)
    val baseline = IvfIndex.meanAssignedCosine(heldOut, "embedding", model)
    assert(baseline > 0.9, s"clustered baseline should be high, got $baseline")

    // same-distribution batch: fine
    val okBatch = (cluster(1, 300 until 330) ++ cluster(2, 330 until 360))
      .toDF("vec_id", "embedding")
    assert(!IvfIndex.driftCheck(okBatch, "embedding", model, baseline).refitRecommended)

    // shifted batch: mass around axes the model never saw
    val shifted = (cluster(9, 400 until 430) ++ cluster(13, 430 until 460))
      .toDF("vec_id", "embedding")
    val drift = IvfIndex.driftCheck(shifted, "embedding", model, baseline)
    assert(drift.refitRecommended,
      s"shifted batch not flagged: batch=${drift.batchMeanCos} baseline=$baseline")
  }
}
