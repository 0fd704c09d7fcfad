package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the ann_topk probe path (not part of the library). */
object ProbeProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .appName("probe-profile").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    import graft.core.Tables
    val embs = Tables.embeddings(spark, dir)
    val cfg = operators.AnnIndex.Config(dim = 64, nBits = 6, nTables = 16)
    val q = embs.filter(col("vec_id") === 0).select("embedding").head.getSeq[Float](0).toArray
    val p = java.nio.file.Files.createTempDirectory("probe-prof").toString + "/idx"
    t("build+write") {
      operators.AnnIndex.writeIndex(operators.AnnIndex.buildIndex(embs, "vec_id", "embedding", cfg), p, cfg)
    }
    val nFiles = t("count files") {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(p)).iterator().asScala
        .count(f => f.toString.endsWith(".parquet"))
    }
    println(s"[profile] parquet files in index: $nFiles")
    val idx1 = t("read.parquet (listing)") { val d = spark.read.parquet(p); d.schema; d }
    t("probe 1 (cold)") {
      operators.AnnIndex.queryTopK(idx1, q, 10, cfg).collect()
    }
    t("probe 2 (warm, fresh df)") {
      operators.AnnIndex.queryTopK(spark.read.parquet(p), q, 10, cfg).collect()
    }
    spark.stop()
  }
}
