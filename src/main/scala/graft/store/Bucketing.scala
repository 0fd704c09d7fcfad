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
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    nBuckets: Int, sorted: Boolean = true): Unit = {
    val w = df.write.mode("overwrite")
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
