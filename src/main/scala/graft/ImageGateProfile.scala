package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage decomposition of ONE gate-batch of the closed multimodal ingest
  * loop (round-20; VERDICT r19 "wrong" #2: `stream_image_gate_append`
  * rose 2.08 → 2.61 s (+25%) with the r19 banded-index switch, and the
  * fixture-scale cost of the new path was never attributed). Replays the
  * declared row's wave-1 batch against the same base index and times
  * each component the per-batch closure pays, so a future rise names its
  * stage. Dev-only (the [[DailyDropProfile]] pattern); run with
  * `sbt "runMain graft.ImageGateProfile [sfDir]"`.
  */
object ImageGateProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.pushdown.inFilterThreshold", "1024")
      .config("spark.ui.enabled", "false")
      .appName("image-gate-profile").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String, reps: Int = 1)(f: => A): A = {
      val t0 = System.nanoTime()
      var r = f
      var i = 1
      while (i < reps) { r = f; i += 1 }
      println(f"[profile] $label%-44s ${(System.nanoTime() - t0) / 1e9 / reps}%.3f s" +
        (if (reps > 1) s"  (mean of $reps)" else ""))
      r
    }
    import graft.operators.{Dedup, Multimodal}

    val d = graft.core.Tables.documents(spark, dir)
    def flip(df: DataFrame, off: Long) = df.select(
      (col("doc_id") + off).as("doc_id"),
      concat(lit("Z"), expr("substring(text, 2)")).as("text"))
    val w1 = d.select(col("doc_id"), col("text"))
      .filter(col("doc_id") >= 250 && col("doc_id") < 287)
      .unionByName(flip(
        d.select(col("doc_id"), col("text"))
          .filter(col("doc_id") < 250 && col("doc_id") % 9 === 0), 200000L))
      .localCheckpoint()

    // offline artifacts, untimed (the declared row session-caches them):
    // the banded base index AND an r18-style flat one for the old form
    val idx = graft.core.SessionCache.newTempDir("igp-banded") + "/idx"
    val flatIdx = graft.core.SessionCache.newTempDir("igp-flat") + "/idx"
    val corpusAssets = Multimodal.fakeAssets(
      d.filter(col("doc_id") < 250).select(col("doc_id"), col("text")), "text")
    Dedup.buildBandedDHashIndex(corpusAssets, "doc_id", "asset_bytes", idx,
      maxHamming = 10)
    Dedup.buildDHashIndex(corpusAssets, "doc_id", "asset_bytes", flatIdx)
    val batchAssets = Multimodal.fakeAssets(w1, "text").localCheckpoint()

    // ---- the per-batch component ledger --------------------------------
    val sigs = t("p1 decode+hash batch (dHashCol)") {
      batchAssets.select(col("doc_id").cast("long").as("id"),
        Multimodal.dHashCol(col("asset_bytes")).as("sig")).localCheckpoint()
    }
    t("p2 within-batch pairs->groups->survivors") {
      Dedup.dedupNear(batchAssets, "doc_id",
        Dedup.hammingPairs(sigs, maxHamming = 10)).count()
    }
    t("p3 _meta sidecar read (per call)", reps = 20) {
      graft.store.MetaSidecar.read(spark, idx, "banded dHash index")
    }
    t("p4 batch banding + touched-cells collect") {
      Dedup.bandSigs(sigs, 10)
        .select(col("band"), col("key"),
          pmod(xxhash64(col("band"), col("key")),
            lit(Dedup.DHashKeyBuckets.toLong)).cast("int").as("gb"))
        .distinct().collect().length
    }
    t("p5 GATE vs BANDED index (full sigDupIdsVsBandedIndex)", reps = 3) {
      Dedup.sigDupIdsVsBandedIndex(sigs, idx, maxHamming = 10).count()
    }
    t("p5' GATE r18 FLAT form (whole-table re-band)", reps = 3) {
      Dedup.sigDupIdsVsIndex(sigs, Dedup.readDHashIndex(spark, flatIdx),
        maxHamming = 10).count()
    }
    t("p6 tail listing (bandedTailFileCount, per call)", reps = 20) {
      Dedup.bandedTailFileCount(spark, idx)
    }
    t("p7 flat tail append (appendBandedDHashSigs)") {
      Dedup.appendBandedDHashSigs(
        sigs.select((col("id") + 900000L).as("id"), col("sig")), idx)
    }
    val out = graft.core.SessionCache.newTempDir("igp-out") + "/batch=p-0"
    t("p8 sink write (survivors partition)") {
      w1.write.mode("overwrite").parquet(out)
    }
    // the full closed loop, for the whole-row reference point (two
    // drains, checkpoint machinery, both waves — what Bench times)
    spark.stop()
  }
}
