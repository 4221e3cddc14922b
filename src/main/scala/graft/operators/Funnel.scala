package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered event-funnel analysis — the conversion measurement every
  * product/behavioral pipeline runs (view → click → purchase): a user
  * is at depth k when the first k funnel steps occur in order, each
  * strictly after the previous match (the first qualifying event per
  * step, i.e. the earliest completion).
  *
  * Plan shape at scale: filter to the step types (pushed to the scan),
  * then ONE user-keyed exchange: events pack into a per-user
  * sort_array'd list and a codegen'd `aggregate` HOF walks it once —
  * no window, no per-step join cascade (k steps would cost k
  * exchanges), no re-scan per step. The per-user array holds only
  * step-typed events; like all sessionization ops it assumes one
  * user's events fit an executor (millions of rows — the usual
  * behavioral-data contract; a pathological user would need a
  * per-(user, day) pre-split).
  *
  * Strict-after semantics: an event at exactly the timestamp of the
  * previous match does NOT advance the funnel (ties inside a step
  * resolve by the earliest (ts, id) — the scan order), so the result
  * is replayable by a cascade of `min(ts) WHERE ts > prev` aggregates
  * — a structurally different algorithm the oracle uses.
  *
  * @return (userCol, depth) — depth in 0..steps.length per user that
  *         has at least one step-typed event
  */
object Funnel {

  def depths(events: DataFrame, userCol: String, tsCol: String,
             idCol: String, typeCol: String,
             steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, s"duplicate steps: $steps")
    val stepArr = array(steps.map(lit): _*)
    // r15 null contract: strict-after matching needs an event time —
    // a null ts would sort engine-dependently inside the fold
    val packed = events
      .filter(col(tsCol).isNotNull)
      .filter(col(typeCol).isin(steps: _*))
      .select(col(userCol),
        struct(col(tsCol).as("ts"), col(idCol).as("id"),
          col(typeCol).as("et")).as("e"))
      .groupBy(col(userCol))
      .agg(sort_array(collect_list(col("e"))).as("evs"))
    packed.select(col(userCol),
      aggregate(col("evs"),
        struct(lit(0).as("d"),
          lit(null).cast(events.schema(tsCol).dataType).as("t")),
        (acc, e) => {
          val d = acc.getField("d")
          val advance = (d < steps.size) &&
            (e.getField("et") === element_at(stepArr, d + 1)) &&
            (d === 0 || e.getField("ts") > acc.getField("t"))
          when(advance,
            struct((d + 1).as("d"), e.getField("ts").as("t")))
            .otherwise(acc)
        }).getField("d").cast("long").as("depth"))
  }

  /** Per-depth user counts — the funnel report. `depth` counts users
    * whose funnel stopped EXACTLY there; cumulative reach is the
    * suffix sum, left to the caller/report layer.
    */
  def report(events: DataFrame, userCol: String, tsCol: String,
             idCol: String, typeCol: String,
             steps: Seq[String]): DataFrame =
    depths(events, userCol, tsCol, idCol, typeCol, steps)
      .groupBy(col("depth"))
      .agg(count(lit(1)).as("n_users"))
}
