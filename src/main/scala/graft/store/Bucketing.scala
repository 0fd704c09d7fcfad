package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers — the co-located-join half of the scale story
  * (brief: "repartition()/bucketing for co-located joins"). Two tables
  * bucketed on the same key with the same bucket count join WITHOUT a
  * shuffle: each task zips matching buckets, so a 100 TB fact⋈fact join
  * moves zero rows over the network at query time (the shuffle is paid
  * once, at write).
  */
object Bucketing {

  /** Write `df` as a bucketed (and optionally sorted) catalog table.
    * Sorting within buckets additionally enables shuffle-AND-sort-free
    * sort-merge joins.
    *
    * The `repartition` on the bucket column (round-13): Spark's bucket
    * assignment uses the same Murmur3 hash as `repartition`, so
    * repartitioning to `nBuckets` tasks puts each bucket's rows in
    * exactly ONE task → ONE file per bucket. That matters beyond file
    * counts: the bucketed scan reports its `sortBy` ordering ONLY when
    * every bucket has at most one file (more files would need a merge),
    * and with it a sort-merge join elides the SORT of the bucketed side
    * too, not just its Exchange — the daily-drop postings join then
    * reads the corpus index as-is, no per-drop sort of the corpus
    * (PlanShapeSpec pins scan→join with neither Exchange nor Sort).
    * Without the repartition, each upstream task writes a file per
    * bucket it happens to hold and the ordering guarantee is lost.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    nBuckets: Int, sorted: Boolean = true,
                    path: Option[String] = None): Unit = {
    import org.apache.spark.sql.functions.col
    // Registration must survive process restarts: with the default
    // in-memory catalog a NEW JVM starts with an empty catalog but the
    // warehouse DIRECTORY persists, and saveAsTable refuses a managed
    // table whose leftover location already exists
    // (LOCATION_ALREADY_EXISTS — caught by a round-13 PlanAudit rerun).
    // Callers that re-register per process should pass `path` (an
    // EXTERNAL table at a caller-owned location, which Spark accepts
    // pre-existing); the drop handles same-session re-registration.
    df.sparkSession.sql(s"DROP TABLE IF EXISTS `$table`")
    val w0 = df.repartition(nBuckets, col(bucketCol)).write.mode("overwrite")
    val w = path.fold(w0)((p: String) => w0.option("path", p))
      .bucketBy(nBuckets, bucketCol)
    (if (sorted) w.sortBy(bucketCol) else w).saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket key — planned with no
    * Exchange on either side when bucket specs line up.
    */
  def cogroupJoin(spark: SparkSession, leftTable: String, rightTable: String,
                  key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
