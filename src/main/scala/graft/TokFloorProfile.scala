package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler (dev-only): does a scan-parallelism floor (round-robin
  * repartition of the single-row-group fixture scan) pay for itself on the
  * tokenize-heavy operators? (r21 applied the floor to heavy-hitters only.)
  */
object TokFloorProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .appName("tok-floor-profile").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-44s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    import graft.core.Tables
    import graft.operators.{CountTable, TextAnalysis, Splits}

    val d = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val dFloored = d.repartition(spark.sparkContext.defaultParallelism)
    d.count(); dFloored.count() // warm

    for (i <- 1 to 3) {
      t(s"[$i] counts n=1, single-partition scan") {
        CountTable.counts(d, "text", n = 1).write.format("noop").mode("overwrite").save()
      }
      t(s"[$i] counts n=1, floored scan") {
        CountTable.counts(dFloored, "text", n = 1).write.format("noop").mode("overwrite").save()
      }
      t(s"[$i] tokenizeToIds, single-partition scan") {
        val vocab = TextAnalysis.vocabIds(CountTable.counts(d, "text", n = 1))
        TextAnalysis.tokenizeToIds(d, "doc_id", "text", vocab)
          .write.format("noop").mode("overwrite").save()
      }
      t(s"[$i] tokenizeToIds, floored scan") {
        val vocab = TextAnalysis.vocabIds(CountTable.counts(dFloored, "text", n = 1))
        TextAnalysis.tokenizeToIds(dFloored, "doc_id", "text", vocab)
          .write.format("noop").mode("overwrite").save()
      }
      t(s"[$i] full tokenize+pack chain, single") {
        val vocab = TextAnalysis.vocabIds(CountTable.counts(d, "text", n = 1))
        val ids = TextAnalysis.tokenizeToIds(d, "doc_id", "text", vocab)
        Splits.packSequences(ids, "doc_id", size(col("token_ids")).cast("long"), 512L)
          .write.format("noop").mode("overwrite").save()
      }
      t(s"[$i] full tokenize+pack chain, floored") {
        val vocab = TextAnalysis.vocabIds(CountTable.counts(dFloored, "text", n = 1))
        val ids = TextAnalysis.tokenizeToIds(dFloored, "doc_id", "text", vocab)
        Splits.packSequences(ids, "doc_id", size(col("token_ids")).cast("long"), 512L)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
