package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cohort retention analysis over event streams.
  *
  * Reference scope: the reference's assessment compares aggregate
  * activity release-over-release (assess_changes.qmd:97-114); the
  * product-analytics generalization tracks each acquisition cohort
  * forward in time — "of the users whose first event fell in week W,
  * how many were still active k weeks later?" — the classic triangle
  * retention matrix.
  */
object Cohort {

  /** Weekly retention matrix: one row per (cohort_week, week_offset)
    * with the count of cohort members active in that offset week and
    * the retention fraction relative to the cohort's size (its
    * offset-0 count — every member is by definition active in the
    * cohort week itself).
    *
    * Plan shape at scale: exchange 1 groups by entity with a map-side
    * partial `collect_set` of the entity's DISTINCT active weeks (set
    * size is bounded by the calendar span in weeks, not by event
    * count, so partials stay small no matter how hot the entity);
    * the cohort week is the set's min — no second pass, no self-join
    * back to the events. Exploding (cohort, offset) pairs then feeds
    * exchange 2, a plain combine-friendly count (each entity
    * contributes each pair at most once, so `count(*)` replaces the
    * non-combinable `countDistinct`). The final retention fraction is
    * a window partitioned BY COHORT — parallelism = number of cohort
    * weeks, which grows with calendar time, never with data volume,
    * and each cohort's frame holds one row per offset week.
    *
    * @param events   event table
    * @param entityCol grouping entity (user id)
    * @param tsCol    event-time column (timestamp)
    * @return (cohort_week DATE, week_offset BIGINT, active_users
    *         BIGINT, retention DOUBLE rounded 4), offset-0 row always
    *         present with retention 1.0
    */
  def retention(events: DataFrame, entityCol: String,
                tsCol: Column): DataFrame = {
    // r15 null contract: an event without a time belongs to no week
    val perEntity = events
      .filter(tsCol.isNotNull)
      .select(col(entityCol).as("e"),
        date_trunc("week", tsCol).cast("date").as("wk"))
      .groupBy("e")
      .agg(collect_set(col("wk")).as("wks"))
      .select(col("e"), array_min(col("wks")).as("cw"),
        explode(col("wks")).as("wk"))
    val counts = perEntity
      .groupBy(col("cw").as("cohort_week"),
        (datediff(col("wk"), col("cw")).cast("long") / 7)
          .cast("long").as("week_offset"))
      .agg(count(lit(1)).as("active_users"))
    val byCohort = Window.partitionBy("cohort_week")
      .orderBy("week_offset")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts.select(col("cohort_week"), col("week_offset"),
      col("active_users"),
      round(col("active_users").cast("double") /
        first(col("active_users")).over(byCohort), 4).as("retention"))
  }
}
