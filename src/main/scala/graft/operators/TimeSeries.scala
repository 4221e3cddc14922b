package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-entity time-series smoothing over event streams.
  *
  * Reference scope: the reference's assessment pipeline compares
  * release-over-release aggregates (assess_changes.qmd:97-114); a
  * training-data pipeline additionally wants per-entity temporal
  * features — smoothed engagement, decayed activity scores — computed
  * from the same event tables. EWMA is the canonical one.
  */
object TimeSeries {

  /** Exponential weighted moving average per entity:
    * `e_1 = x_1`, `e_i = α·x_i + (1-α)·e_{i-1}` over the entity's
    * events in `(timestamp, eventId)` order, emitting the final
    * smoothed value — the classic decayed-activity feature (user
    * engagement score, item popularity, QPS smoothing).
    *
    * Plan shape at scale: ONE entity-keyed exchange (the groupBy);
    * the ordered fold runs inside a codegen'd `aggregate` higher-order
    * function over the packed per-entity array — no window, no second
    * shuffle, no driver participation. Per-entity memory is bounded by
    * that entity's event count, the same inherent bound every
    * per-entity sequence op carries (session windows,
    * flatMapGroupsWithState); entities are independent, so 1000
    * executors scale by entity count, and a pathological mega-entity
    * is the same skew AQE handles for the session/funnel ops.
    *
    * Float parity: the recurrence is a strict LEFT FOLD in a fixed
    * total order (ts, eventId), seeded with the first observation, so
    * an engine replaying the identical fold (DuckDB `list_reduce`
    * over `list(... ORDER BY ...)`) walks bit-identical doubles.
    * α must be exactly representable in binary (0.25, 0.5, 0.125…) so
    * `1-α` is exact too and no literal-parsing path can diverge.
    *
    * @param alpha smoothing factor in (0,1); pick a binary-exact value
    * @return (entityCol, n, ewma) — one row per entity with ≥1
    *         non-null observation; `ewma` rounded to 4 decimals
    */
  /** OHLC resampling: downsample each entity's raw event stream into
    * one bar per calendar bucket — `open`/`close` are the first/last
    * observation in `(timestamp, seqCol)` order, `high`/`low` the
    * extremes, `vol` the sum, `n` the count. The bread-and-butter
    * reduction for charting, feature windows, and storage rollups.
    *
    * Plan shape at scale: ONE exchange on (entity, bucket) with full
    * map-side combine — `min_by`/`max_by` carry a single
    * (value, order-key) pair per partial, so partials stay
    * constant-size regardless of how many raw events a bucket holds.
    * No window, no per-entity array. Null observations are dropped
    * (an all-null bucket emits nothing, matching aggregate SQL).
    *
    * @return (entityCol, bucket DATE, open, high, low, close,
    *         vol = round(sum,2), n) — one row per non-empty bucket
    */
  def resample(events: DataFrame, entityCol: String, tsCol: Column,
               seqCol: Column, valueCol: Column,
               unit: String = "day"): DataFrame =
    events.filter(valueCol.isNotNull)
      .groupBy(col(entityCol),
        date_trunc(unit, tsCol).cast("date").as("bucket"))
      .agg(
        min_by(valueCol, struct(tsCol, seqCol)).as("open"),
        max(valueCol).as("high"),
        min(valueCol).as("low"),
        max_by(valueCol, struct(tsCol, seqCol)).as("close"),
        round(sum(valueCol), 2).as("vol"),
        count(lit(1)).as("n"))

  def ewma(events: DataFrame, entityCol: String, tsCol: Column,
           seqCol: Column, valueCol: Column,
           alpha: Double = 0.25): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1): $alpha")
    val packed = events
      .filter(valueCol.isNotNull)
      .select(col(entityCol),
        struct(tsCol.as("o1"), seqCol.as("o2"),
          valueCol.cast("double").as("x")).as("p"))
      .groupBy(entityCol)
      .agg(sort_array(collect_list(col("p"))).as("seq"))
    packed.select(col(entityCol),
      size(col("seq")).cast("long").as("n"),
      round(aggregate(
          slice(col("seq"), lit(2),
            greatest(size(col("seq")) - 1, lit(0))),
          element_at(col("seq"), 1).getField("x"),
          (acc, e) => lit(alpha) * e.getField("x") +
            lit(1.0 - alpha) * acc),
        4).as("ewma"))
  }
}
