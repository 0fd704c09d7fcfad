package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch (dev-only): print the physical plans of the dupIdsVsIndex
  * real path vs the bare-core variant, to find where the join strategy
  * diverges.
  */
object XPlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").appName("xplan").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.core.Tables
    import graft.operators.Dedup
    val d = Tables.documents(spark, dir)
    val cut = d.count() * 3 / 4
    val corpus = d.filter(col("doc_id") < cut)
    val batch = d.filter(col("doc_id") >= cut)
    val pp = java.nio.file.Files.createTempDirectory("xp").toString
    Dedup.buildPostingsIndex(corpus, "doc_id", "text", n = 2, pp)
    val postings = Dedup.readPostingsIndex(spark, pp, 2)
    println("=========== real dupIdsVsIndex ===========")
    Dedup.dupIdsVsIndex(batch, "doc_id", "text", 2, 0.2, postings).explain()
    println("=========== bare core (v4) ===========")
    val W = org.apache.spark.sql.expressions.Window.partitionBy("__b_id")
    val bpost = batch.select(col("doc_id").cast("long").as("__b_id"),
      explode(Dedup.shingles(col("text"), 2)).as("shingle"))
    bpost.withColumn("__b_size", count(lit(1)).over(W))
      .join(postings, Seq("shingle"))
      .groupBy("__b_id", "corpus_id")
      .agg(count(lit(1)).as("common"),
        max(col("__b_size")).as("__b_size"), max(col("corpus_size")).as("corpus_size"))
      .filter(col("common") / (col("__b_size") + col("corpus_size") - col("common")) >= 0.2)
      .select("__b_id").distinct().explain()
    spark.stop()
  }
}
