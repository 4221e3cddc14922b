package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Radius (distance-threshold) join between two point sets WITHOUT a
  * cross product — geo entity resolution, store-catchment assignment,
  * near-dup detection over 2-D embedding projections. Spark plans a
  * bare `dist(a, b) <= r` predicate as BroadcastNestedLoopJoin
  * (quadratic, broadcast side must fit in memory), so at scale the
  * plane is tiled into r×r grid cells: the `a` side keys by the single
  * cell containing the point, the `b` side replicates into its 3×3
  * cell neighborhood, the join runs cell-equi, and the exact squared
  * distance predicate keeps true pairs. Every qualifying pair emits
  * exactly once — `a`'s point lives in one cell, and any `b` point
  * within `r` of it lies in that cell's 3×3 neighborhood, so exactly
  * one replica of `b` meets it (no dedup shuffle needed).
  *
  * Shuffle cost: |a| + 9·|b| rows — pass the SMALLER side as `b`.
  * Dense cells square inside the join (the grid analog of a hot key):
  * AQE's skew-join split handles moderate skew; a pathological
  * single-cell hotspot wants the SkewJoin salt on the cell key, same
  * playbook as [[IntervalJoin]].
  *
  * The distance predicate is closed (`<= r`), coordinates must be
  * finite, and `|coord/r|` must stay below 2^52 so the double-division
  * floor is exact.
  */
object Spatial {

  def radiusJoin(a: DataFrame, b: DataFrame,
                 ax: String, ay: String, bx: String, by: String,
                 r: Double): DataFrame = {
    require(r > 0 && java.lang.Double.isFinite(r),
      s"radius must be finite and > 0 (got $r)")
    require(a.columns.toSet.intersect(b.columns.toSet).isEmpty,
      "a and b must have disjoint column names")
    val a2 = a
      .withColumn("_cx", floor(col(ax) / r).cast("long"))
      .withColumn("_cy", floor(col(ay) / r).cast("long"))
    val b2 = b
      .withColumn("_dx", explode(sequence(lit(-1L), lit(1L))))
      .withColumn("_dy", explode(sequence(lit(-1L), lit(1L))))
      .withColumn("_cx", floor(col(bx) / r).cast("long") + col("_dx"))
      .withColumn("_cy", floor(col(by) / r).cast("long") + col("_dy"))
      .drop("_dx", "_dy")
    val dx = col(ax) - col(bx)
    val dy = col(ay) - col(by)
    a2.join(b2, Seq("_cx", "_cy"))
      .filter(dx * dx + dy * dy <= lit(r * r))
      .drop("_cx", "_cy")
  }
}
