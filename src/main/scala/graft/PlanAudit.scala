package graft

import org.apache.spark.sql.SparkSession

/** Physical-plan audit harness: prints the formatted plan of each declared
  * query so scan pruning (ReadSchema/PushedFilters), exchange counts,
  * broadcast usage, partial aggregation, and WholeStageCodegen coverage can
  * be inspected and iterated (the "explain until it's the plan you'd want"
  * loop from the builder brief).
  *
  * Usage: runMain graft.PlanAudit <sfDir> [queryName ...]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSet else Set.empty[String]
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // exact id-set parquet pushdown for the rerank pools (IvfIndex.MaxInPushdownIds)
      .config("spark.sql.parquet.pushdown.inFilterThreshold", "1024")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => names.isEmpty || names.contains(n) }
      .foreach { case (name, fn) =>
        println(s"\n============================== $name ==============================")
        try fn(spark, sfDir).explain("formatted")
        catch { case e: Throwable => println(s"[audit] $name failed: ${e.getMessage}") }
      }
    spark.stop()
  }
}
