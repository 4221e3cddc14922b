package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-overlap join WITHOUT an equi key — sessions × maintenance
  * windows, campaign spans × activity spans. Spark's planner turns a
  * bare `a.lo <= b.hi AND b.lo <= a.hi` predicate into a
  * BroadcastNestedLoopJoin (quadratic; the broadcast side must fit in
  * memory), so at scale the join needs a synthetic equi key: each
  * interval explodes into the fixed-width GRID CELLS it covers, the
  * join runs cell-equi + exact overlap predicate, and each pair emits
  * EXACTLY ONCE — not by a dedup shuffle, but by keeping a pair only
  * in the first cell both intervals share
  * (`cell == max(floor(a.lo/w), floor(b.lo/w))`), which costs one
  * codegen'd comparison.
  *
  * Plan shape at scale: shuffle size = Σ cells-per-interval — pick
  * `cellWidth` near the typical interval length so that factor is
  * O(1-2); work within a cell is (intervals in cell)², so a cell far
  * wider than the data's span concentration creates skew (the usual
  * AQE skew-join handling applies; a pathological single hot cell
  * would want the SkewJoin salt on the cell key).
  *
  * Intervals are CLOSED on both ends (touching endpoints overlap);
  * rows with hi < lo are dropped (guards the `sequence()`
  * descending-range trap). Bounds must be integral and |bound/width|
  * < 2^52 so the double-division floor is exact.
  */
object IntervalJoin {

  def overlap(a: DataFrame, b: DataFrame,
              aLo: String, aHi: String, bLo: String, bHi: String,
              cellWidth: Long): DataFrame = {
    require(cellWidth >= 1, s"cellWidth must be >= 1 (got $cellWidth)")
    require(a.columns.toSet.intersect(b.columns.toSet).isEmpty,
      "a and b must have disjoint column names")
    def cells(df: DataFrame, lo: String, hi: String) =
      df.filter(col(hi) >= col(lo))
        .withColumn("_cell", explode(sequence(
          floor(col(lo) / cellWidth).cast("long"),
          floor(col(hi) / cellWidth).cast("long"))))
    cells(a, aLo, aHi)
      .join(cells(b, bLo, bHi), Seq("_cell"))
      .filter(col(aLo) <= col(bHi) && col(bLo) <= col(aHi))
      .filter(col("_cell") === greatest(
        floor(col(aLo) / cellWidth), floor(col(bLo) / cellWidth))
        .cast("long"))
      .drop("_cell")
  }

  /** Per-side interval statistics for width selection: one aggregate-
    * only pass per side, FOUR driver scalars each — the documented
    * bounded-collect posture (no row ever reaches the driver).
    */
  private final case class SideStats(n: Long, avgLen: Double,
                                     lo: Double, hi: Double)

  private def stats(df: DataFrame, loCol: String, hiCol: String): SideStats = {
    val r = df.filter(col(hiCol) >= col(loCol))
      .agg(count(lit(1)), avg(col(hiCol) - col(loCol)),
        min(col(loCol)).cast("double"), max(col(hiCol)).cast("double"))
      .head()
    if (r.getLong(0) == 0L) SideStats(0L, 0.0, 0.0, 0.0)
    else SideStats(r.getLong(0), r.getDouble(1), r.getDouble(2),
      r.getDouble(3))
  }

  /** Data-derived cell width (round 13). The cost model: with mean
    * interval lengths La, Lb over a shared span S, a width-w grid
    * tests ~ (Na·Nb/S) · (w+La)(w+Lb)/w candidate pairs in total —
    * minimized in closed form at w* = sqrt(La·Lb), the geometric mean
    * of the two sides' typical lengths (densities Na/S, Nb/S scale the
    * total but cancel out of the argmin). Two refinements:
    *
    *  - per-cell volume bound: expected pair tests per cell at w* are
    *    (Na(w+La)/S)·(Nb(w+Lb)/S); while that exceeds `maxCellPairs`
    *    the width halves — total work rises off the optimum, but no
    *    single grid cell concentrates more than ~maxCellPairs of the
    *    quadratic (the uniform-density analog of the mega-bucket cap;
    *    true HOT SPOTS beyond it remain AQE skew-split's job);
    *  - shuffle floor: w never drops below 1 and never above the span
    *    (a span-wide cell is the degenerate single-bucket join).
    *
    * The sf corpus sweep (reports/SWEEP_CELLW_r14.md) measured the
    * model against wall clock across w ∈ {1..64} at 30×/100×.
    */
  def autoCellWidth(a: DataFrame, b: DataFrame,
                    aLo: String, aHi: String, bLo: String, bHi: String,
                    maxCellPairs: Double = 4e6): Long = {
    val sa = stats(a, aLo, aHi)
    val sb = stats(b, bLo, bHi)
    if (sa.n == 0L || sb.n == 0L) return 1L
    val span = math.max(1.0,
      math.max(sa.hi, sb.hi) - math.min(sa.lo, sb.lo))
    var w = math.sqrt(math.max(1.0, sa.avgLen) * math.max(1.0, sb.avgLen))
    w = math.min(w, span)
    def perCell(w: Double): Double =
      (sa.n * (w + sa.avgLen) / span) * (sb.n * (w + sb.avgLen) / span)
    while (w > 1.0 && perCell(w) > maxCellPairs) w /= 2
    math.max(1L, math.round(w))
  }

  /** [[overlap]] with the width chosen by [[autoCellWidth]] — the
    * production entry point when the caller has no prior on interval
    * lengths (two scalar aggregates, then the same exact grid join).
    */
  def overlapAuto(a: DataFrame, b: DataFrame,
                  aLo: String, aHi: String, bLo: String, bHi: String,
                  maxCellPairs: Double = 4e6): DataFrame =
    overlap(a, b, aLo, aHi, bLo, bHi,
      autoCellWidth(a, b, aLo, aHi, bLo, bHi, maxCellPairs))
}
