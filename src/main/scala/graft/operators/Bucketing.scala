package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers (SURVEY.md §7 100 TB design rule: "co-located
  * joins via bucketing").
  *
  * A fact table that is joined on the same key repeatedly (orders ⋈
  * lineitem every run) should pay its shuffle ONCE at write time:
  * `bucketBy(n, key)` hash-partitions the files, and every later
  * equi-join or aggregation on that key plans with zero Exchange on the
  * bucketed side(s) — Spark picks SortMergeJoin straight over the bucket
  * files. BucketingSpec asserts the no-shuffle plan.
  */
object Bucketing {

  /** Write `df` as a bucketed managed table (sorted within buckets, so
    * merge joins skip the per-partition sort too).
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — shuffle-free. */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
                    key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
