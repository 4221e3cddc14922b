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
                 r: Double): DataFrame =
    radiusJoin(a, b, ax, ay, bx, by, r, subCells = 1)

  /** [[radiusJoin]] with cells of width r/`subCells`: correctness is
    * unchanged (|x−y| <= k·w bounds the floor-cell offset by k, so the
    * (2k+1)² neighborhood still covers every qualifying pair and each
    * pair still meets in exactly one replica of `b`), but finer cells
    * trade replication for per-cell density:
    *
    *   candidate tests ∝ ((2 + 1/k)·r)²   — 9r² at k=1 → 6.25r² at
    *                                        k=2 → 4r² as k→∞
    *   b-side shuffle  ∝ (2k+1)²          — 9× at k=1, 25× at k=2
    *
    * i.e. the comparison saving is bounded at 2.25× TOTAL while
    * replication grows quadratically — so k>1 pays off only when
    * per-cell pair volume dominates the join (very dense r-cells), and
    * k>2 essentially never does. [[radiusJoinAuto]] applies exactly
    * that rule from two scalar aggregates.
    */
  def radiusJoin(a: DataFrame, b: DataFrame,
                 ax: String, ay: String, bx: String, by: String,
                 r: Double, subCells: Int): DataFrame = {
    require(r > 0 && java.lang.Double.isFinite(r),
      s"radius must be finite and > 0 (got $r)")
    require(subCells >= 1 && subCells <= 16,
      s"subCells must be in [1, 16] (got $subCells)")
    require(a.columns.toSet.intersect(b.columns.toSet).isEmpty,
      "a and b must have disjoint column names")
    val k = subCells.toLong
    val w = cellWidth(r, subCells)
    val a2 = a
      .withColumn("_cx", floor(col(ax) / w).cast("long"))
      .withColumn("_cy", floor(col(ay) / w).cast("long"))
    val b2 = b
      .withColumn("_dx", explode(sequence(lit(-k), lit(k))))
      .withColumn("_dy", explode(sequence(lit(-k), lit(k))))
      .withColumn("_cx", floor(col(bx) / w).cast("long") + col("_dx"))
      .withColumn("_cy", floor(col(by) / w).cast("long") + col("_dy"))
      .drop("_dx", "_dy")
    val dx = col(ax) - col(bx)
    val dy = col(ay) - col(by)
    a2.join(b2, Seq("_cx", "_cy"))
      .filter(dx * dx + dy * dy <= lit(r * r))
      .drop("_cx", "_cy")
  }

  /** Density-adaptive radius join (round 13): two aggregate-only
    * passes (count + bounding box per side, EIGHT driver scalars)
    * choose the physical plan; the exact predicate and output are
    * those of [[radiusJoin]].
    *
    *  - the SMALLER side replicates (shuffle = |big| + (2k+1)²·|small|
    *    — callers no longer need to order arguments);
    *  - `subCells` rises above 1 only when the estimated pair tests
    *    per r-cell exceed `maxCellPairs` (dense corpora get finer
    *    cells), and is capped at 2 — the analysis on [[radiusJoin]]
    *    shows k>2 buys <10% more comparison saving for ≥ 2× more
    *    replication. Sparse corpora keep the plain 3×3 plan.
    */
  /** Grid cell width for radius `r` at `subCells` sub-divisions. The
    * coverage proof ("a qualifying pair is never more than `subCells`
    * cells apart on an axis") needs w·subCells >= r EXACTLY in floating
    * point: fl(r/k)·k rounds BELOW r for most non-power-of-two k, and a
    * pair with axis distance in (k·w, r] could then land k+1 cells
    * apart and be silently dropped (r13 ADVICE). Bump by ULPs until the
    * product clears r — at most a couple of iterations, and the width
    * stays within a relative 2⁻⁵⁰ of r/k, so the cost model is
    * unaffected.
    */
  private[graft] def cellWidth(r: Double, subCells: Int): Double = {
    var w = r / subCells
    while (w * subCells < r) w = Math.nextUp(w)
    w
  }

  def radiusJoinAuto(a: DataFrame, b: DataFrame,
                     ax: String, ay: String, bx: String, by: String,
                     r: Double, maxCellPairs: Double = 4e6): DataFrame =
    radiusJoinPlanned(a, b, ax, ay, bx, by, r,
      radiusPlan(a, b, ax, ay, bx, by, r, maxCellPairs))

  /** The physical choice [[radiusJoinAuto]] derives from its two
    * aggregate passes: which side replicates, and the sub-cell factor.
    * A pure function of static corpus statistics — CACHEABLE per
    * (session, corpus) by callers that re-run the same join (the r13
    * form re-ran both stats aggregates on every call; pure fixed cost
    * on a static corpus and most of join_spatial's gate-SF regression).
    */
  final case class RadiusPlan(swapSides: Boolean, subCells: Int)

  /** Derive the [[RadiusPlan]]: two aggregate-only passes (count +
    * bounding box per side, EIGHT driver scalars total).
    */
  def radiusPlan(a: DataFrame, b: DataFrame,
                 ax: String, ay: String, bx: String, by: String,
                 r: Double, maxCellPairs: Double = 4e6): RadiusPlan = {
    def box(df: DataFrame, x: String, y: String) = {
      val h = df.agg(count(lit(1)), min(col(x)).cast("double"),
        max(col(x)).cast("double"), min(col(y)).cast("double"),
        max(col(y)).cast("double")).head()
      if (h.getLong(0) == 0L) (0L, 0.0, 0.0)
      else (h.getLong(0), h.getDouble(2) - h.getDouble(1),
        h.getDouble(4) - h.getDouble(3))
    }
    val (na, aw, ah) = box(a, ax, ay)
    val (nb, bw, bh) = box(b, bx, by)
    // area of the denser side's bounding box, floored at one r-cell
    val area = math.max(r * r,
      math.max(aw, bw) * math.max(ah, bh))
    val cellsInArea = area / (r * r)
    val pairsPerCell = (na / cellsInArea) * (nb / cellsInArea)
    val k = if (pairsPerCell > maxCellPairs) 2 else 1
    RadiusPlan(swapSides = nb > na, subCells = k)
  }

  /** Apply a previously derived (possibly cached) [[RadiusPlan]] —
    * the exact predicate and output are those of [[radiusJoin]].
    */
  def radiusJoinPlanned(a: DataFrame, b: DataFrame,
                        ax: String, ay: String, bx: String, by: String,
                        r: Double, plan: RadiusPlan): DataFrame =
    if (plan.swapSides) radiusJoin(b, a, bx, by, ax, ay, r, plan.subCells)
    else radiusJoin(a, b, ax, ay, bx, by, r, plan.subCells)
}
