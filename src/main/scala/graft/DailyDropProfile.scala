package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the pipeline_daily_drop chain (not part of the
  * library): times each hygiene stage separately, then the composed chain
  * as declared, then the composed chain with batch-sized localCheckpoint
  * pins between stages — quantifying how much of the end-to-end cost is
  * re-evaluation of upstream stages (each stage's output feeds both a
  * probe/pair subtree and the final anti-join, so an unpinned composition
  * re-runs the whole upstream chain per consumer).
  */
object DailyDropProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("daily-drop-profile").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-34s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    import graft.core.Tables
    import graft.operators.{AnnIndex, Dedup}

    val d = Tables.documents(spark, dir)
    val e = Tables.embeddings(spark, dir)
    val cut = d.count() * 3 / 4
    val corpus = d.filter(col("doc_id") < cut)
    val batch = d.filter(col("doc_id") >= cut)
    val dedupCfg = AnnIndex.Config(dim = 64, nBits = 4, nTables = 12)

    // offline artifacts (not timed in the serving loop)
    val postingsPath = java.nio.file.Files.createTempDirectory("ddp-postings").toString
    Dedup.buildPostingsIndex(corpus, "doc_id", "text", n = 2, postingsPath)
    val lshPath = java.nio.file.Files.createTempDirectory("ddp-lsh").toString
    AnnIndex.writeIndex(
      AnnIndex.buildIndex(e.filter(col("vec_id") < cut), "vec_id", "embedding", dedupCfg), lshPath, dedupCfg)
    val lshIdx = spark.read.parquet(lshPath)

    def s1() = Dedup.dedupIncremental(batch, "doc_id", "text",
      Dedup.contentHashes(corpus, "text"))
    def s2(in: org.apache.spark.sql.DataFrame) = Dedup.jaccardIncremental(
      in, "doc_id", "text", n = 2, threshold = 0.2,
      Dedup.readPostingsIndex(spark, postingsPath))
    def s3(in: org.apache.spark.sql.DataFrame) = AnnIndex.dedupIncrementalLSH(
      in.join(e.filter(col("vec_id") >= cut), col("doc_id") === col("vec_id"))
        .select(col("doc_id"), col("embedding")),
      "doc_id", "embedding", lshIdx, threshold = 0.3, dedupCfg)

    for (i <- 1 to 2) {
      t(s"[$i] stage1 alone")(s1().count())
      t(s"[$i] stage1+2")(s2(s1()).count())
      t(s"[$i] full chain (as declared)")(s3(s2(s1())).count())
      t(s"[$i] full chain (pinned stages)") {
        val p1 = s1().localCheckpoint()
        val p2 = s2(p1).localCheckpoint()
        s3(p2).count()
      }
    }
    // stage-2 internals: where does the jaccard stage's time go?
    locally {
      val p1 = s1().localCheckpoint()
      t("s2 breakdown: within-batch jaccardPairs") {
        Dedup.jaccardPairs(p1, "doc_id", "text", n = 2, threshold = 0.2).count()
      }
      val pairs = Dedup.jaccardPairs(p1, "doc_id", "text", n = 2, threshold = 0.2)
      t("s2 breakdown: dedupNear (groups + anti-join)") {
        Dedup.dedupNear(p1, "doc_id", pairs).count()
      }
      val within = Dedup.dedupNear(p1, "doc_id", pairs).localCheckpoint()
      t("s2 breakdown: cross-index postings join (incl. residual within-pass)") {
        Dedup.jaccardIncremental(within, "doc_id", "text", n = 2,
          threshold = 0.2, Dedup.readPostingsIndex(spark, postingsPath)).count()
      }
      t("s2 breakdown: shingle UDF + explode scan only") {
        p1.select(org.apache.spark.sql.functions.explode(
          Dedup.shingles(col("text"), 2))).count()
      }
    }
    // Round-13 (VERDICT r12 #5): the same cross-index stage, corpus
    // postings served from a plain parquet read (the join reshuffles the
    // whole index side on shingle every drop) vs from the bucketed
    // catalog registration (zero-Exchange corpus side — the shuffle was
    // paid once at registration; PlanShapeSpec pins the plan shape).
    locally {
      val p1 = s1().localCheckpoint()
      Dedup.registerPostingsBucketed(spark, postingsPath,
        "ddp_postings_bucketed", nBuckets = 8)
      for (i <- 1 to 2) {
        t(s"[$i] s2 cross-join, PLAIN postings read") {
          Dedup.jaccardIncremental(p1, "doc_id", "text", n = 2,
            threshold = 0.2, Dedup.readPostingsIndex(spark, postingsPath)).count()
        }
        t(s"[$i] s2 cross-join, BUCKETED postings table") {
          Dedup.jaccardIncremental(p1, "doc_id", "text", n = 2,
            threshold = 0.2, spark.table("ddp_postings_bucketed")).count()
        }
      }
    }
    spark.stop()
  }
}
