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
                    nBuckets: Int, sorted: Boolean = true): Unit = {
    import org.apache.spark.sql.functions.col
    val w = df.repartition(nBuckets, col(bucketCol)).write.mode("overwrite")
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
