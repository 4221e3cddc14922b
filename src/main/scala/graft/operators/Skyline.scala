package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

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

  /** The unbounded-dimension form of [[frontier2d]]: a GlobalRank-style
    * sort-sweep, valid at ANY cardinality of the dominance dimensions
    * (no broadcast of the level table; no all-pairs join anywhere).
    *
    * Same dominance semantics as [[frontier2d]]: a row survives iff no
    * row with a strictly larger `maxCol` has an equal-or-smaller
    * `minCol` — i.e. iff `minCol` is strictly below the running MIN of
    * `minCol` over all strictly-larger `maxCol` values. That threshold
    * depends only on the distinct `maxCol` value, so the sweep runs
    * over the distinct-value frame, not the rows:
    *
    *  1. one map-side-partial `groupBy(maxCol).agg(min(minCol))` —
    *     exchange bounded by |distinct maxCol| (the only full scan);
    *  2. two-phase running min over that frame in DESCENDING `maxCol`
    *     order (the [[GlobalRank]] shape: range shuffle, freeze the
    *     partition id as data via [[Stage.materialize]], per-partition
    *     mins to the driver — p rows, metadata-scale — prefix-min on
    *     the driver, broadcast back, in-partition window over STRICTLY
    *     preceding rows). No global window, every stage parallel;
    *  3. equi-join the per-value threshold back to the input on
    *     `maxCol` (plain shuffle hash join) and filter
    *     `minCol < threshold`.
    *
    * Ties in `maxCol` do not dominate each other (strict inequality),
    * matching [[frontier2d]] — so on a pre-aggregated level table the
    * two forms return identical rows (R8FuzzSpec pins randomized
    * parity of BOTH forms against brute-force dominance, plus
    * sweep-vs-anti-join parity on raw rows).
    *
    * `maxCol`/`minCol` must be orderable atomic types whose JVM
    * external representation is `Comparable` (numeric, string, date,
    * timestamp, decimal) — the driver prefix-min compares the p
    * per-partition mins directly, with strings routed through
    * `UTF8String` so the driver ordering is byte-identical to Spark's.
    *
    * Null contract matches [[frontier2d]]: a null `maxCol` makes the
    * dominance predicate null in both directions, so null-max rows are
    * always ON the frontier and never dominate — they bypass the sweep
    * verbatim (the anti-join keeps them for the same reason). A null
    * `minCol` likewise can never be dominated (`x <= null` is null
    * under three-valued logic, so the anti-join keeps the row) and
    * never dominates (group `min()` skips nulls) — the survival filter
    * keeps null-min rows explicitly.
    */
  def frontierSweep(df: DataFrame, maxCol: String, minCol: String,
                    numPartitions: Int = 0): DataFrame = {
    require(!df.columns.exists(_.startsWith("__sk_")),
      "input uses Skyline's reserved __sk_* names")
    val spark = df.sparkSession
    val p =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val nullMax = df.filter(col(maxCol).isNull)
    val swept = df.filter(col(maxCol).isNotNull)
    // r17: stage the level table BEFORE the range shuffle — the range
    // partitioner's sampling pass and the shuffle itself would each
    // recompute the full-scan aggregate otherwise (two extra corpus
    // scans); staged, they read |levels| rows
    val grp = Stage.materialize(
      swept.groupBy(col(maxCol).as("__sk_max"))
        .agg(min(col(minCol)).as("__sk_gmin")),
      "skyline_levels")
    val ranged = Stage.materialize(
      grp.repartitionByRange(p, col("__sk_max").desc)
        .withColumn("__sk_pid", spark_partition_id()),
      "skyline_sweep")
    // prefix-min over PRECEDING partitions (pid order = descending
    // __sk_max order under the range shuffle above); p rows of
    // metadata, typed via the column's own external representation
    val partMins = ranged.groupBy("__sk_pid")
      .agg(min("__sk_gmin").as("m"))
      .collect().map(r => (r.getInt(0), r.get(1))).sortBy(_._1)
    // strings compare via Spark's own UTF-8 bytewise ordering — JVM
    // String.compareTo is UTF-16 code-unit order, which diverges on
    // supplementary (non-BMP) characters and would let the driver
    // prefix-min disagree with the in-partition window min()
    def lt(a: Any, b: Any): Boolean = (a, b) match {
      case (x: String, y: String) =>
        org.apache.spark.unsafe.types.UTF8String.fromString(x)
          .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(y)) < 0
      case _ => a.asInstanceOf[Comparable[Any]].compareTo(b) < 0
    }
    var best: Any = null
    val offRows = partMins.map { case (pid, m) =>
      val row = Row(pid, best) // min over partitions BEFORE this one
      if (m != null && (best == null || lt(m, best))) best = m
      row
    }
    val minType = grp.schema("__sk_gmin").dataType
    val offDf = spark.createDataFrame(
      java.util.Arrays.asList(offRows: _*),
      StructType(Seq(StructField("__sk_pid", IntegerType, nullable = false),
        StructField("__sk_poff", minType, nullable = true))))
    // strictly-preceding rows only: a value's own group min must not
    // feed its threshold (equal maxCol never dominates)
    val w = Window.partitionBy("__sk_pid").orderBy(col("__sk_max").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    // least() skips nulls: first row of the first partition has neither
    // an in-partition prefix nor an offset -> null threshold -> survives
    val thr = ranged
      .withColumn("__sk_thr0", min("__sk_gmin").over(w))
      .join(broadcast(offDf), "__sk_pid")
      .select(col("__sk_max"),
        least(col("__sk_thr0"), col("__sk_poff")).as("__sk_thr"))
    swept.join(thr, col(maxCol) === col("__sk_max"))
      .filter(col("__sk_thr").isNull || col(minCol).isNull ||
        col(minCol) < col("__sk_thr"))
      .drop("__sk_max", "__sk_thr")
      .unionByName(nullMax)
  }
}
