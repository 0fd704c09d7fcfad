package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage decomposition of the `multimodal_delete_parity` lifecycle row
  * (round-21; VERDICT r20 "wrong" #3: at 7.0 s driver / 3.9 s local the
  * row was the second most expensive declared query from its first
  * round, with no stage ledger — future creep on it could not name its
  * stage). Replays the declared row's exact phases against the same
  * base index and times each one, so SCALE.md can carry the ledger.
  * Dev-only (the [[ImageGateProfile]] / [[DailyDropProfile]] pattern);
  * run with `sbt "runMain graft.MultimodalDeleteProfile [sfDir]"`.
  */
object MultimodalDeleteProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.pushdown.inFilterThreshold", "1024")
      .config("spark.ui.enabled", "false")
      .appName("multimodal-delete-profile").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String, reps: Int = 1)(f: => A): A = {
      val t0 = System.nanoTime()
      var r = f
      var i = 1
      while (i < reps) { r = f; i += 1 }
      println(f"[profile] $label%-46s ${(System.nanoTime() - t0) / 1e9 / reps}%.3f s" +
        (if (reps > 1) s"  (mean of $reps)" else ""))
      r
    }
    import graft.operators.{Dedup, Multimodal}

    val d = graft.core.Tables.documents(spark, dir)
    def flip(df: DataFrame, off: Long) = df.select(
      (col("doc_id") + off).as("doc_id"),
      concat(lit("Z"), expr("substring(text, 2)")).as("text"))

    // offline artifact, untimed (the declared row session-caches it)
    val baseIdx = graft.core.SessionCache.newTempDir("mdp-base") + "/idx"
    Dedup.buildBandedDHashIndex(
      Multimodal.fakeAssets(
        d.filter(col("doc_id") < 250).select(col("doc_id"), col("text")), "text"),
      "doc_id", "asset_bytes", baseIdx, maxHamming = 10)

    def sigsOf(df: DataFrame) = Multimodal.fakeAssets(df, "text")
      .select(col("doc_id").cast("long").as("id"),
        Multimodal.dHashCol(col("asset_bytes")).as("sig"))
    val big = flip(d.filter(col("doc_id") >= 240 && col("doc_id") < 287), 600000L)
      .unionByName(d.filter(col("doc_id") >= 287 && col("doc_id") < 300)
        .select(col("doc_id"), col("text")))
    val small = flip(d.filter(col("doc_id").isin(240L, 241L)), 700000L)

    // ---- the per-iteration stage ledger (the declared row's phases) ----
    val idx = t("s1 hardlink view of the base index (linkTree)") {
      val p = graft.core.SessionCache.newTempDir("mdp-idx") + "/idx"
      graft.core.SessionCache.linkTree(baseIdx, p)
      p
    }
    t("s2 tail append (fakeAssets+dHash+write, 37 sigs)") {
      Dedup.appendBandedDHashSigs(
        sigsOf(d.filter(col("doc_id") >= 250 && col("doc_id") < 287)
          .select(col("doc_id"), col("text"))), idx)
    }
    t("s3 tombstone write (deleteFromDHashIndex, 38 ids)") {
      Dedup.deleteFromDHashIndex(spark, idx,
        (0L until 250L by 10L) ++ (250L until 287L).filter(_ % 3 == 0))
    }
    val bigSigs = t("s4 probe decode+hash, big (60 assets, pinned)") {
      sigsOf(big).localCheckpoint()
    }
    val smallSigs = t("s5 probe decode+hash, small (2 assets, pinned)") {
      sigsOf(small).localCheckpoint()
    }
    t("s6 tombstoned gate, big probe", reps = 3) {
      Dedup.sigDupIdsVsBandedIndex(bigSigs, idx, maxHamming = 10).count()
    }
    t("s7 tombstoned gate, small probe", reps = 3) {
      Dedup.sigDupIdsVsBandedIndex(smallSigs, idx, maxHamming = 10).count()
    }
    t("s8 compact (tombstone fold + all-deleted guard)") {
      Dedup.compactBandedDHashIndex(spark, idx)
    }
    t("s9 compacted gate, big probe", reps = 3) {
      Dedup.sigDupIdsVsBandedIndex(bigSigs, idx, maxHamming = 10).count()
    }
    t("s10 compacted gate, small probe", reps = 3) {
      Dedup.sigDupIdsVsBandedIndex(smallSigs, idx, maxHamming = 10).count()
    }
    spark.stop()
  }
}
