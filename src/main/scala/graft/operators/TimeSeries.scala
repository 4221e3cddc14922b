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

  /** Holt double exponential smoothing (level + trend) per entity —
    * the one-step-ahead trend forecaster for entity activity
    * (engagement trajectories, volume projections):
    *
    *   l_1 = x_1,  b_1 = x_2 - x_1
    *   l_t = α·x_t + (1-α)·(l_{t-1} + b_{t-1})
    *   b_t = β·(l_t - l_{t-1}) + (1-β)·b_{t-1}
    *
    * emitting the final (level, trend) and the h-step forecast
    * `level + h·trend`. Entities with fewer than two observations are
    * dropped (no trend is defined).
    *
    * Plan shape at scale: identical to [[ewma]] — ONE entity-keyed
    * exchange, then a codegen'd `aggregate` fold over the packed
    * per-entity array with a two-field struct accumulator; no window,
    * no second shuffle, no driver participation. Same per-entity-
    * fits-executor contract as every per-entity sequence op.
    *
    * Float parity: strict left fold in (timestamp, seqCol) order;
    * α/β binary-exact so 1-α/1-β are exact; b_t consumes the freshly
    * computed l_t exactly as written, so an engine replaying the same
    * recurrence (DuckDB recursive CTE) walks bit-identical doubles.
    *
    * Ordering contract (same as every per-entity sequence op here):
    * `(tsCol, seqCol)` MUST uniquely order each entity's events. The
    * packed struct sorts as (o1, o2, x), so on an (o1, o2) tie the
    * VALUE becomes a third sort key — Spark's fold order would then
    * be deterministic while an oracle's `ORDER BY ts, seq` list
    * aggregation is tie-unstable, and the recurrences diverge.
    * TimeSeriesSpec asserts this contract on the events fixture.
    *
    * @return (entityCol, n, level, trend, fc) — `fc` = level +
    *         horizon·trend; all three rounded via the cross-engine
    *         floor(x·1e4 + 0.5)/1e4 convention
    */
  def holt(events: DataFrame, entityCol: String, tsCol: Column,
           seqCol: Column, valueCol: Column,
           alpha: Double = 0.5, beta: Double = 0.25,
           horizon: Int = 3): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1): $alpha")
    require(beta > 0 && beta < 1, s"beta must be in (0,1): $beta")
    // r15 null contract: an ordered fold needs BOTH a value and an
    // order key — null-ts rows would sort engine-dependently (Spark
    // nulls-first vs DuckDB nulls-last) and corrupt the fold order
    val packed = events
      .filter(valueCol.isNotNull && tsCol.isNotNull)
      .select(col(entityCol),
        struct(tsCol.as("o1"), seqCol.as("o2"),
          valueCol.cast("double").as("x")).as("p"))
      .groupBy(entityCol)
      .agg(sort_array(collect_list(col("p"))).as("seq"))
      .filter(size(col("seq")) >= 2)
    val x1 = element_at(col("seq"), 1).getField("x")
    val x2 = element_at(col("seq"), 2).getField("x")
    val init = struct(x1.as("l"), (x2 - x1).as("b"))
    def step(acc: Column, e: Column): Column = {
      val lNew = lit(alpha) * e.getField("x") +
        lit(1.0 - alpha) * (acc.getField("l") + acc.getField("b"))
      struct(lNew.as("l"),
        (lit(beta) * (lNew - acc.getField("l")) +
          lit(1.0 - beta) * acc.getField("b")).as("b"))
    }
    def r4(c: Column): Column = floor(c * lit(10000.0) + lit(0.5)) / lit(10000.0)
    packed.select(col(entityCol),
        size(col("seq")).cast("long").as("n"),
        aggregate(
          slice(col("seq"), lit(3),
            greatest(size(col("seq")) - 2, lit(0))),
          init, step).as("st"))
      .select(col(entityCol), col("n"),
        r4(col("st.l")).as("level"),
        r4(col("st.b")).as("trend"),
        r4(col("st.l") + lit(horizon.toDouble) * col("st.b")).as("fc"))
  }

  /** One-sided CUSUM change-point monitor per entity — the classic
    * upward mean-shift alarm (metric drift, abuse spikes, sensor
    * failure): standardize each observation against the entity's own
    * (population) moments, then fold
    * `s_t = max(0, s_{t-1} + z_t − k)` in (timestamp, seqCol) order,
    * counting alarms where `s_t > h`.
    *
    * Two passes, both entity-keyed: one moment aggregate (n, Σx, Σx²)
    * joined back, then the same single-exchange ordered fold as
    * [[ewma]]/[[holt]] with a (cusum, alarms, max) struct accumulator.
    * Entities with zero variance are dropped (no scale to detect
    * against). z is snapped to 6 decimals (floor convention) BEFORE
    * the fold, so both engines fold bit-identical doubles and the
    * integer alarm count cannot drift on sum-order noise.
    *
    * Ordering contract: `(tsCol, seqCol)` must uniquely order each
    * entity's events — on a tie the packed struct's z value becomes a
    * third sort key and the fold order diverges from an oracle's
    * tie-unstable ORDER BY (see [[holt]]). Asserted in TimeSeriesSpec.
    *
    * @return (entityCol, n, alarms, max_cusum) — max_cusum rounded via
    *         floor(x·1e4 + 0.5)/1e4
    */
  def cusum(events: DataFrame, entityCol: String, tsCol: Column,
            seqCol: Column, valueCol: Column,
            k: Double = 0.5, h: Double = 4.0): DataFrame = {
    // r15 null contract: see ewma — order keys must be non-null
    val vals = events.filter(valueCol.isNotNull && tsCol.isNotNull)
      .select(col(entityCol), tsCol.as("__ts_o1"), seqCol.as("__ts_o2"),
        valueCol.cast("double").as("__ts_x"))
    val moments = vals.groupBy(entityCol)
      .agg(count(lit(1)).cast("double").as("__ts_n"),
        sum(col("__ts_x")).as("__ts_s1"),
        sum(col("__ts_x") * col("__ts_x")).as("__ts_s2"))
      .select(col(entityCol),
        (col("__ts_s1") / col("__ts_n")).as("__ts_mu"),
        (col("__ts_s2") / col("__ts_n") -
          (col("__ts_s1") / col("__ts_n")) *
          (col("__ts_s1") / col("__ts_n"))).as("__ts_v2"))
      .filter(col("__ts_v2") > 0.0)
      .withColumn("__ts_sd", sqrt(col("__ts_v2")))
    val z = floor((col("__ts_x") - col("__ts_mu")) / col("__ts_sd") *
      lit(1e6) + lit(0.5)) / lit(1e6)
    val packed = vals.join(moments, entityCol)
      .select(col(entityCol),
        struct(col("__ts_o1").as("o1"), col("__ts_o2").as("o2"),
          z.as("z")).as("p"))
      .groupBy(entityCol)
      .agg(sort_array(collect_list(col("p"))).as("seq"))
    val init = struct(lit(0.0).as("s"), lit(0L).as("alarms"),
      lit(0.0).as("mx"))
    def step(acc: Column, e: Column): Column = {
      val sNew = greatest(lit(0.0),
        acc.getField("s") + e.getField("z") - lit(k))
      struct(sNew.as("s"),
        (acc.getField("alarms") +
          when(sNew > lit(h), 1L).otherwise(0L)).as("alarms"),
        greatest(acc.getField("mx"), sNew).as("mx"))
    }
    packed.select(col(entityCol),
        size(col("seq")).cast("long").as("n"),
        aggregate(col("seq"), init, step).as("st"))
      .select(col(entityCol), col("n"), col("st.alarms").as("alarms"),
        (floor(col("st.mx") * lit(10000.0) + lit(0.5)) / lit(10000.0))
          .as("max_cusum"))
  }

  def ewma(events: DataFrame, entityCol: String, tsCol: Column,
           seqCol: Column, valueCol: Column,
           alpha: Double = 0.25): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1): $alpha")
    // r15 null contract: an ordered fold needs BOTH a value and an
    // order key — null-ts rows would sort engine-dependently (Spark
    // nulls-first vs DuckDB nulls-last) and corrupt the fold order
    val packed = events
      .filter(valueCol.isNotNull && tsCol.isNotNull)
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
