package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiler (dev-only, the ProbeProfile pattern): decompose the
  * per-micro-batch cost of the watermarked ANN probe stream vs its
  * unwatermarked twin — BENCH r22 baseline shows stream_ann_probe_wm at
  * ~4× stream_ann_probe on identical probe joins.
  */
object StreamWmProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("stream-wm-profile").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.core.Tables

    val embs = Tables.embeddings(spark, dir)
    val cfg = operators.AnnIndex.Config(dim = 64, nBits = 6, nTables = 16)
    val p = java.nio.file.Files.createTempDirectory("wm-prof").toString + "/idx"
    operators.AnnIndex.writeIndex(
      operators.AnnIndex.buildIndex(embs, "vec_id", "embedding", cfg), p, cfg)
    val idx = spark.read.parquet(p)
    idx.count() // warm listing

    def runOnce(label: String, wm: Boolean, seq: Int): Double = {
      val sink = s"wmprof_${label}_$seq"
      val t0 = System.nanoTime()
      val base = Tables.embeddingsStream(spark, dir).filter(col("vec_id") < 20)
      val out: DataFrame =
        if (wm) {
          val queries = base.withColumn("arrival_ts",
            timestamp_seconds(lit(1704067200L) + col("vec_id")))
          streaming.Streams.annProbeStreamWithinWatermark(queries,
            "vec_id", "embedding", idx, threshold = 0.5, cfg,
            tsCol = "arrival_ts", delay = "365 days")
        } else
          streaming.Streams.annProbeStream(base, "vec_id", "embedding", idx,
            threshold = 0.5, cfg)
      val sq = out
        .select(col("q_id"), col("c_id"), round(col("score"), 6).as("score"))
        .writeStream.format("memory").queryName(sink).outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      streaming.Streams.awaitOrAbort(sq, sink)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[profile] $label run$seq total $sec%.3f s, batches=${sq.recentProgress.length}")
      sq.recentProgress.foreach { pr =>
        println(s"  batch=${pr.batchId} rows=${pr.numInputRows} durationMs=${pr.durationMs}")
        pr.stateOperators.foreach { so =>
          println(s"    state: ${so.operatorName} rowsTotal=${so.numRowsTotal} " +
            s"commitTimeMs=${so.commitTimeMs} memoryUsedBytes=${so.memoryUsedBytes}")
        }
      }
      sec
    }

    // cost of one full static-side scan (the per-batch floor if the join
    // re-reads the whole 1024-dir index each micro-batch)
    {
      import scala.jdk.CollectionConverters._
      val nFiles = java.nio.file.Files.walk(java.nio.file.Paths.get(p))
        .iterator().asScala.count(_.toString.endsWith(".parquet"))
      println(s"[profile] index parquet files: $nFiles")
    }
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      idx.write.format("noop").mode("overwrite").save()
      println(f"[profile] static full scan (noop) $i ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    (1 to 3).foreach(i => runOnce("plain", wm = false, i))
    (1 to 3).foreach(i => runOnce("wm", wm = true, i))
    // fewer state partitions: the state-store commit cost is per
    // partition per batch; state here is 20 rows
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    (4 to 6).foreach(i => runOnce("wm_p8", wm = true, i))
    spark.conf.set("spark.sql.shuffle.partitions", cpus)
    spark.stop()
  }
}
