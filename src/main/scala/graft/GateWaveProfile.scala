package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler (dev-only): decompose ONE wave of the jaccard
  * gate-then-append maintainer into its closure steps, timed as the
  * foreachBatch body runs them — names the dominant step of
  * stream_jaccard_gate_append's per-wave cost.
  */
object GateWaveProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("gate-wave-profile").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-42s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    import graft.core.Tables
    import graft.operators.Dedup

    val d = Tables.documents(spark, dir)
    for (round <- 1 to 3) {
      println(s"--- round $round ---")
      val idx = java.nio.file.Files.createTempDirectory("gwp-idx").toString
      Dedup.buildPostingsIndex(d.filter(col("doc_id") < 250), "doc_id", "text", n = 2, idx)
      val batch = d.filter(col("doc_id") >= 250 && col("doc_id") < 290)
      val out = java.nio.file.Files.createTempDirectory("gwp-out").toString

      val postings = t("readPostingsIndex") {
        Dedup.readPostingsIndex(spark, idx, 2)
      }
      val survivors = t("jaccardIncremental + eager localCheckpoint") {
        Dedup.jaccardIncremental(batch, "doc_id", "text", 2, 0.2, postings)
          .localCheckpoint()
      }
      t("isEmpty probe") { survivors.isEmpty }
      t("sink parquet write + marker") {
        survivors.write.mode("overwrite").parquet(s"$out/batch=p-0")
      }
      t("appendPostingsIndex") {
        Dedup.appendPostingsIndex(survivors, "doc_id", "text", 2, idx,
          idempotencyTag = Some(s"prof:$round:0"))
      }
      // jaccardIncremental sub-parts (separate evaluations, so times
      // overlap the composed number above — read them as shares)
      val pairs = t("  sub: jaccardPairs(batch).count") {
        val p = Dedup.jaccardPairs(batch, "doc_id", "text", 2, 0.2); p.count(); p
      }
      val within = t("  sub: dedupNear(batch, pairs).count") {
        val w = Dedup.dedupNear(batch, "doc_id", pairs); w.count(); w
      }
      t("  sub: dupIdsVsIndex(within).count") {
        Dedup.dupIdsVsIndex(within, "doc_id", "text", 2, 0.2, postings).count()
      }
    }
    spark.stop()
  }
}
