package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EXACT distributed median / MAD — robust outlier statistics without
  * a global sort or an approximation.
  *
  * `approxQuantile` is fuzzy at the cut (rank error ε·n) and a global
  * `percentile_cont` plans a single-partition sort at 100 TB. Exact
  * order statistics don't need either: a rank is a SELECTION problem —
  * [[GlobalRank]]'s two-phase range-partitioned ranking already gives
  * every row its exact global rank in parallel, so the median is just
  * "the row(s) ranked ⌈n/2⌉ and ⌊n/2⌋+1" (averaged when n is even —
  * the `percentile_cont(0.5)` convention).
  *
  * MAD (median absolute deviation) composes the same selection twice:
  * med = median(x), mad = median(|x − med|). With the consistency
  * constant 1.4826 (≈ 1/Φ⁻¹(3/4)), `|x − med| > k·1.4826·mad` is the
  * robust z-score outlier rule — the standard data-quality screen that,
  * unlike mean/stddev, a few wild rows cannot drag.
  *
  * Driver participation is two bounded scalars (the two medians) plus
  * GlobalRank's p-row offset scans — metadata-scale, same posture as
  * the cluster-centroid and label-prior collects documented in
  * SURVEY §2. Everything row-scale stays distributed.
  */
object RobustStats {

  /** Exact median of `valueCol` (non-null rows). Returns the driver
    * scalar — the caller composes it as a literal (bounded collect:
    * ONE double).
    */
  def medianExact(df: DataFrame, valueCol: Column): Double = {
    val vals = df.select(valueCol.cast("double").as("__rs_x"))
      .filter(col("__rs_x").isNotNull)
    val n = vals.count()
    require(n > 0, "median of an empty input")
    val lo = (n + 1) / 2
    val hi = (n + 2) / 2
    val ranked = GlobalRank.withGlobalRank(vals, Seq(col("__rs_x")), "__rs_rk")
    // ties among equal values permute ranks but never the selected
    // VALUES, so no tiebreak column is needed for selection
    ranked.filter(col("__rs_rk") === lo || col("__rs_rk") === hi)
      .agg(avg(col("__rs_x"))).head().getDouble(0)
  }

  /** One-row robust summary of `valueCol`:
    * (n, med, mad, n_out) where n_out counts rows with
    * `|x − med| > k·1.4826·mad`. Exact at any scale — two GlobalRank
    * selections, no approximation, no single-partition sort.
    */
  def madOutlierSummary(df: DataFrame, valueCol: Column,
                        k: Double = 3.0): DataFrame = {
    val vals = df.select(valueCol.cast("double").as("__rs_x"))
      .filter(col("__rs_x").isNotNull)
    val med = medianExact(vals, col("__rs_x"))
    val mad = medianExact(
      vals.select(abs(col("__rs_x") - lit(med)).as("__rs_x")),
      col("__rs_x"))
    def r4(c: Column): Column =
      floor(c * lit(10000.0) + lit(0.5)) / lit(10000.0)
    vals.agg(
      count(lit(1)).as("n"),
      r4(lit(med)).as("med"),
      r4(lit(mad)).as("mad"),
      sum(when(abs(col("__rs_x") - lit(med)) >
        lit(k) * lit(1.4826) * lit(mad), 1L).otherwise(0L)).as("n_out"))
  }
}
