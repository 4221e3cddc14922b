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
}
