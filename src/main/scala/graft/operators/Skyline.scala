package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pareto frontier (skyline, Börzsönyi et al. ICDE '01) over a
  * LEVEL table — rows already aggregated to distinct values of the
  * maximize-dimension (the ScaleQ opt_skyline gate collapses parts to
  * min-price-per-size first; that aggregation is the only full scan).
  *
  * On the bounded level table the dominance test is a broadcast
  * self-anti-join: a level survives iff no level with a strictly
  * larger `maxCol` has an equal-or-smaller `minCol`. For unbounded
  * dominance dimensions the same reduction feeds a GlobalRank
  * sort-sweep (running min over a range ranking) instead — the
  * anti-join is the right tool only while the level table broadcasts.
  *
  * R8FuzzSpec pins randomized parity against the brute-force
  * dominance filter.
  */
object Skyline {

  /** @param levels frame with distinct `maxCol` values (one row per
    *               level) — pre-aggregate first
    * @param maxCol dimension to maximize (e.g. size)
    * @param minCol dimension to minimize (e.g. min_price)
    * @return the subset of `levels` on the Pareto frontier, all
    *         columns preserved
    */
  def frontier2d(levels: DataFrame, maxCol: String,
                 minCol: String): DataFrame = {
    val dom = broadcast(levels.select(col(maxCol).as("__sk_max"),
      col(minCol).as("__sk_min")))
    levels.join(dom,
      col("__sk_max") > col(maxCol) && col("__sk_min") <= col(minCol),
      "left_anti")
  }
}
