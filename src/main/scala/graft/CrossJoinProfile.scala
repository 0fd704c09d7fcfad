package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler (dev-only): quantify the daily-drop stage-2
  * cross-index join — joined-row fan-out, per-task skew, and where the
  * time goes (candidate generation vs pair aggregation).
  */
object CrossJoinProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("cross-join-profile").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-44s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    import graft.core.Tables
    import graft.operators.Dedup

    val d = Tables.documents(spark, dir)
    val cut = d.count() * 3 / 4
    val corpus = d.filter(col("doc_id") < cut)
    val batch = d.filter(col("doc_id") >= cut)
    val postingsPath = java.nio.file.Files.createTempDirectory("cjp").toString
    Dedup.buildPostingsIndex(corpus, "doc_id", "text", n = 2, postingsPath)
    val postings = Dedup.readPostingsIndex(spark, postingsPath, 2)

    println(s"[stats] batch docs=${batch.count()} corpus postings=${postings.count()}")
    val bpost = batch.select(col("doc_id").cast("long").as("__b_id"),
      explode(Dedup.shingles(col("text"), 2)).as("shingle"))
    println(s"[stats] batch postings=${bpost.count()}")
    val joined = bpost.join(postings, Seq("shingle"))
    t("join row count") { println(s"[stats] joined rows=${joined.count()}") }
    // per-shingle fan-out distribution (top 10)
    val fan = bpost.groupBy("shingle").count().withColumnRenamed("count", "b")
      .join(postings.groupBy("shingle").count().withColumnRenamed("count", "c"), Seq("shingle"))
      .withColumn("fanout", col("b") * col("c"))
    t("fanout top10") {
      fan.orderBy(desc("fanout")).limit(10).collect()
        .foreach(r => println(s"[stats] shingle='${r.getString(0)}' b=${r.getLong(1)} c=${r.getLong(2)} fan=${r.getLong(3)}"))
      val total = fan.agg(sum("fanout")).head.getLong(0)
      println(s"[stats] total candidate fan-out=$total")
    }
    // timed: the actual dupIdsVsIndex
    (1 to 3).foreach { i =>
      t(s"dupIdsVsIndex run $i") {
        Dedup.dupIdsVsIndex(batch, "doc_id", "text", 2, 0.2, postings).count()
      }
    }
    // variants: where does the 8x over the bare join go?
    val W = org.apache.spark.sql.expressions.Window.partitionBy("__b_id")
    (1 to 2).foreach { i =>
      t(s"v1 join+agg(b,c) count, no window/hot $i") {
        bpost.join(postings, Seq("shingle"))
          .groupBy("__b_id", "corpus_id").agg(count(lit(1)).as("common")).count()
      }
      t(s"v2 v1 + sizes in keys $i") {
        val sized = bpost.withColumn("__b_size", count(lit(1)).over(W))
        sized.join(postings, Seq("shingle"))
          .groupBy("__b_id", "corpus_id", "__b_size", "corpus_size")
          .agg(count(lit(1)).as("common")).count()
      }
      t(s"v3 v2 + hot-filter anti-join $i") {
        val hot = bpost.groupBy("shingle").count().filter(col("count") > 1000L)
        val kept = bpost.join(hot.select("shingle"), Seq("shingle"), "left_anti")
          .withColumn("__b_size", count(lit(1)).over(W))
        kept.join(postings, Seq("shingle"))
          .groupBy("__b_id", "corpus_id", "__b_size", "corpus_size")
          .agg(count(lit(1)).as("common")).count()
      }
      t(s"v4 sizes as max() aggregates, 2 keys $i") {
        val sized = bpost.withColumn("__b_size", count(lit(1)).over(W))
        sized.join(postings, Seq("shingle"))
          .groupBy("__b_id", "corpus_id")
          .agg(count(lit(1)).as("common"),
            max(col("__b_size")).as("__b_size"), max(col("corpus_size")).as("corpus_size"))
          .count()
      }
      t(s"v6 full dupIds body, batch postings pinned $i") {
        val bsets = batch.select(col("doc_id").cast("long").as("__b_id"),
          Dedup.shingles(col("text"), 2).as("__sh")).localCheckpoint(eager = false)
        val p0 = bsets.select(col("__b_id"), explode(col("__sh")).as("shingle"))
        val hot = p0.groupBy("shingle").count().filter(col("count") > 1000L)
        val kept = p0.join(hot.select("shingle"), Seq("shingle"), "left_anti")
          .withColumn("__b_size", count(lit(1)).over(W))
        val n = kept.join(postings, Seq("shingle"))
          .groupBy("__b_id", "corpus_id")
          .agg(count(lit(1)).as("common"),
            max(col("__b_size")).as("__b_size"), max(col("corpus_size")).as("corpus_size"))
          .filter(col("common") / (col("__b_size") + col("corpus_size") - col("common")) >= 0.2)
          .select("__b_id").distinct().count()
        graft.operators.Dedup.releaseCheckpointBlocks(bsets)
        n
      }
      t(s"v5 packed single-long key $i") {
        val sized = bpost.withColumn("__b_size", count(lit(1)).over(W))
        sized.join(postings, Seq("shingle"))
          .select((shiftleft(col("__b_id"), 32).bitwiseOR(col("corpus_id"))).as("__pair"),
            col("__b_size"), col("corpus_size"))
          .groupBy("__pair")
          .agg(count(lit(1)).as("common"),
            max(col("__b_size")).as("__b_size"), max(col("corpus_size")).as("corpus_size"))
          .count()
      }
    }
    spark.stop()
  }
}
