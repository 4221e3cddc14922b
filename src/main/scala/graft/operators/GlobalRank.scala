package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{BooleanType, DateType, NumericType,
  TimestampNTZType, TimestampType}

/** Exact global rank / ntile WITHOUT a global window.
  *
  * `row_number().over(Window.orderBy(...))` — an empty partition spec —
  * plans a single-partition WindowExec: one task sorts the entire
  * input, which is the canonical 100 TB scale-killer (and the warning
  * Spark prints as "No Partition Defined ... serious performance
  * degradation"). But exact global ranking doesn't need a global sort
  * in one task. The distributed shape here is VALUE-DETERMINISTIC
  * range bucketing:
  *
  *  1. sample B-1 quantile boundaries of the LEADING sort key (one
  *     bounded `approxQuantile` pass over that single column) and
  *     freeze them as literals;
  *  2. assign each row a bucket by binary-searching the literal
  *     boundaries (a log₂B-deep codegen'd `when` tree) — the bucket is
  *     a pure function of the ROW VALUES, so every plan branch and
  *     every re-evaluation agrees on it by construction (no partition
  *     ids pinned as data, no staged copy of the frame);
  *  3. per-bucket row counts → prefix-sum offsets → broadcast back.
  *     Callers that need n on the driver (ntile/topFraction) collect
  *     the ≤ B count rows (metadata-scale, the same posture as AQE's
  *     per-partition stats); the rank/running-total callers keep the
  *     offsets IN-PLAN (bucket b's counts explode to every bucket
  *     after it — ≤ B²/2 metadata rows — and a grouped sum is the
  *     prefix), so those calls run zero driver actions beyond the
  *     boundary sample;
  *  4. `row_number()` over a window PARTITIONED by the bucket
  *     (parallel, one key range per bucket) + the bucket's offset
  *     = the exact global rank.
  *
  * The result is identical to the global-window answer for any TOTAL
  * ordering (pass a tiebreak column — ranks among exact duplicates are
  * otherwise tie-broken by bucket placement), but the only full-width
  * data movement is the ONE hash exchange the bucketed window needs:
  * no range shuffle, no materialized staged copy of the frame, and the
  * only single-point work is the ≤B-row offset scan. Boundary QUALITY
  * affects only balance, never correctness — the offsets and in-bucket
  * ranks are exact whatever the sample said.
  *
  * Applicability: the fast path needs a leading sort key with a
  * monotone embedding into DOUBLE (numeric, date, timestamp, boolean)
  * AND a deterministic input lineage — the fast path re-evaluates the
  * input per pass, so a non-deterministic source (rand()-derived
  * columns, samples, monotonically_increasing_id) could disagree
  * between passes; such lineages are detected and routed to the staged
  * fallback, which pins the frame once and is immune.
  * Anything else (string/binary/struct leads) falls back to the
  * pinned-partition-id form: range-shuffle, stage the frame once
  * ([[Stage.materialize]] — boundaries come from sampling, so ids must
  * be pinned before two downstream jobs read them), offsets from the
  * staged counts. Same output, heavier I/O.
  *
  * Balance caveat: buckets split on the leading key only, so a single
  * key value carrying a large fraction of all rows funnels that
  * fraction through one bucket's sort (the staged form spreads exact
  * ties by the tiebreak column instead). Every registered caller leads
  * with a high-cardinality numeric (hash, price, length, z-value,
  * per-source rank); a degenerate lead key should pre-aggregate or
  * accept the straggler.
  *
  * Lineage caveat: the fast path evaluates the input lineage up to
  * three times (boundary sample over the lead column, per-bucket
  * counts, final ranking) instead of staging it — column pruning makes
  * the first two narrow. A caller whose input is EXPENSIVE to
  * recompute (a corpus-wide join/aggregate) should stage it once
  * itself ([[Stage.materialize]]) and rank the staged scan, which is
  * still strictly cheaper than the old always-staged form (that staged
  * the frame AFTER a full range shuffle).
  */
object GlobalRank {

  /** Cap on the sampled bucket count (and so on the ranking stage's
    * parallelism). The bucket expression is a binary-search `when`
    * tree — log₂B comparisons evaluated per row, B literal nodes in
    * the plan — so the cap keeps codegen method sizes sane when a
    * deployment runs tens of thousands of shuffle partitions.
    */
  val MaxBucketsKey = "spark.graft.globalrank.maxBuckets"
  val DefaultMaxBuckets = 1024

  /** `df` plus a `rankCol` (1-based, long) giving each row's exact
    * global rank under `sortCols`. See object doc for the plan shape.
    *
    * @param sortCols total ordering (include a tiebreak column);
    *                 `.desc` columns are honored
    * @param numPartitions range buckets; <= 0 uses
    *                      `spark.sql.shuffle.partitions`
    */
  def withGlobalRank(df: DataFrame, sortCols: Seq[Column],
                     rankCol: String = "rank",
                     numPartitions: Int = 0): DataFrame =
    ranked(df, sortCols, rankCol, numPartitions, None, "__gr_unused")._1

  /** `df` plus a `bucketCol` (1-based, long) replaying EXACT
    * `ntile(buckets)` semantics over the global `sortCols` order: with
    * n rows, the first n % buckets buckets hold n/buckets + 1 rows,
    * the rest n/buckets — bit-identical to the window function, minus
    * its single-partition sort. Bucket assignment is pure integer
    * arithmetic over the global rank (`div`, no doubles — safe past
    * 2^53 rows).
    */
  def withNtile(df: DataFrame, sortCols: Seq[Column], buckets: Int,
                bucketCol: String = "bucket",
                numPartitions: Int = 0): DataFrame = {
    require(buckets >= 1, s"ntile needs >= 1 bucket, got $buckets")
    require(!df.columns.contains(bucketCol),
      s"input already has a '$bucketCol' column")
    val (rankedDf, n) =
      ranked(df, sortCols, "__gr_rank", numPartitions, None, "__gr_unused",
        needCount = true)
    val q = n / buckets
    val rem = n % buckets
    val cut = rem * (q + 1) // ranks 1..cut land in the q+1-sized buckets
    val bucket = when(col("__gr_rank") <= cut,
        expr(s"(__gr_rank - 1) div ${q + 1} + 1"))
      .otherwise( // q = 0 only when n < buckets, where every rank <= cut
        expr(s"$rem + (__gr_rank - 1 - $cut) div ${math.max(q, 1L)} + 1"))
    rankedDf.withColumn(bucketCol, bucket.cast("long")).drop("__gr_rank")
  }

  /** EXACT top-fraction selection — the "keep the best p% by score"
    * curation cut (quality-percentile corpus filtering): rows whose
    * global rank under `sortCols` is <= round(frac * n). Exact where
    * an `approxQuantile` threshold is fuzzy at the boundary, and still
    * fully distributed (the only extra work over [[withGlobalRank]] is
    * a codegen'd filter). `round` (not ceil) on the boundary: IEEE
    * makes 0.1 * 500 land at 50.000000000000003, which `ceil` turns
    * into an off-by-one surprise on BOTH engines.
    */
  def topFraction(df: DataFrame, sortCols: Seq[Column], frac: Double,
                  rankCol: String = "rank",
                  numPartitions: Int = 0): DataFrame = {
    require(frac > 0.0 && frac <= 1.0, s"need 0 < frac <= 1, got $frac")
    val (rankedDf, n) =
      ranked(df, sortCols, rankCol, numPartitions, None, "__gr_unused",
        needCount = true)
    rankedDf.filter(col(rankCol) <= math.round(frac * n))
  }

  /** Deterministic epoch shuffle — the training-order permutation of a
    * corpus for one epoch, as an explicit `pos` (1..n): order by the
    * content hash of (id, epoch seed). Content-addressed, so the
    * permutation is reproducible across runs, retries, cluster sizes,
    * and (with `portable = true`, the md5 path the oracle replays)
    * engines — a `rand()` shuffle is none of those. A new seed per
    * epoch gives independent permutations without materializing any
    * shuffle state.
    */
  def epochShuffle(df: DataFrame, idCol: String, seed: Long,
                   posCol: String = "pos", portable: Boolean = false,
                   numPartitions: Int = 0): DataFrame =
    withGlobalRank(df,
      Seq(Sampling.contentHash(col(idCol), seed, portable), col(idCol)),
      posCol, numPartitions)

  /** `df` plus the exact global rank AND the exact global RUNNING
    * TOTAL of `valueCol` under `sortCols` (inclusive prefix sum in
    * rank order) — the primitive behind budgeted selection ("take
    * documents by descending quality until the token budget is
    * spent"). Same bucketed shape as [[withGlobalRank]]: the counts
    * pass carries a per-bucket SUM next to the count, the driver
    * prefix-sums both (≤ B rows), and the in-bucket window carries
    * the value sum alongside row_number — still no global window, one
    * extra long per offset row.
    *
    * `valueCol` must be integral (LONG) — integer prefix sums are
    * order-free and bit-identical cross-engine, where a double's
    * accumulation order would not be.
    *
    * Null contract: a null `valueCol` counts as 0 toward the running
    * total (it is coalesced at ingestion, so the per-bucket sums,
    * the driver prefix-sum, and the in-bucket window all see the
    * same non-null longs — a bucket of all-null values can no
    * longer NPE the driver's `getLong`, and rank/total cannot
    * desynchronize on null-skipping window sums).
    */
  def withRunningTotal(df: DataFrame, sortCols: Seq[Column],
                       valueCol: Column, rankCol: String = "rank",
                       totalCol: String = "running_total",
                       numPartitions: Int = 0): DataFrame =
    ranked(df, sortCols, rankCol, numPartitions, Some(valueCol), totalCol)._1

  // ---- shared machinery --------------------------------------------

  /** Rank (and optionally running-total) `df`; returns the augmented
    * frame and the exact total row count when `needCount` (known from
    * the offsets pass — `withNtile`/`topFraction` need it on the
    * driver; -1 otherwise, where the offsets stay in-plan and no
    * driver action runs at build time).
    */
  private def ranked(df: DataFrame, sortCols: Seq[Column], rankCol: String,
                     numPartitions: Int, value: Option[Column],
                     totalCol: String,
                     needCount: Boolean = false): (DataFrame, Long) = {
    // withColumn REPLACES silently — a caller column named like the
    // rank output or the internal bucket/offset scratch would corrupt
    // the result without a trace
    val taken = df.columns.toSet
    require(!taken(rankCol), s"input already has a '$rankCol' column")
    require(value.isEmpty || !taken(totalCol),
      s"input already has a '$totalCol' column")
    require(Seq("__gr_pid", "__gr_off", "__gr_voff", "__gr_v", "__gr_d",
        "__gr_b", "__gr_c", "__gr_s").forall(!taken(_)),
      "input uses GlobalRank's reserved __gr_* names")
    val spark = df.sparkSession
    val p =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    leadKey(df, sortCols.head) match {
      // determinism gate (r18, advisor item): the bucketed fast path
      // evaluates the input lineage up to three times (boundary sample,
      // counts, ranking) — a non-deterministic input (rand(), sample,
      // monotonically_increasing_id, order-dependent first()) could
      // disagree across those passes and silently duplicate/skip ranks.
      // The staged fallback pins the frame once and is immune, so
      // non-deterministic lineage routes there. Every registered caller
      // is deterministic (PlanGuardSpec bans the rand() family
      // repo-wide), so this is a latent-hazard gate, not a plan change.
      case Some(key) if deterministicLineage(df) =>
        rankedBucketed(df, sortCols, key, rankCol, p, value, totalCol,
          needCount)
      case _ =>
        rankedStaged(df, sortCols, rankCol, p, value, totalCol)
    }
  }

  /** Does every expression in `df`'s analyzed plan claim determinism?
    * (Catalyst's `Expression.deterministic` already folds children, so
    * a single sweep over node expressions suffices.)
    */
  private def deterministicLineage(df: DataFrame): Boolean =
    df.queryExecution.analyzed
      .find(p => p.expressions.exists(e => !e.deterministic))
      .isEmpty

  /** Monotone DOUBLE embedding of the leading sort key, pre-negated
    * for descending order so downstream bucketing is always
    * "ascending": (embedded key, nulls-first?, descending?). None when
    * the key's type has no monotone numeric embedding (string/binary/
    * complex) — those take the staged fallback. Non-strict
    * monotonicity (e.g. distinct longs past 2^53 collapsing to one
    * double) is fine: equal embedded values share a bucket, and the
    * in-bucket window re-sorts by the ORIGINAL columns.
    */
  private def leadKey(df: DataFrame,
                      c: Column): Option[(Column, Boolean, Boolean)] = {
    val (child, desc, nullsFirst) = Shim.sortOrder(c)
    // schema triggers analysis only (no job); the sort key must already
    // resolve against df for the ranking itself to be well-formed
    val dt = df.select(child.as("__gr_d")).schema.head.dataType
    val embedded: Option[Column] = dt match {
      case _: NumericType => Some(child.cast("double"))
      case TimestampType | TimestampNTZType => Some(child.cast("double"))
      case DateType => Some(child.cast("timestamp").cast("double"))
      case BooleanType => Some(child.cast("int").cast("double"))
      case _ => None
    }
    embedded.map(d => (if (desc) negate(d) else d, nullsFirst, desc))
  }

  /** The sampled-boundary bucket path — see the object doc. */
  private def rankedBucketed(df: DataFrame, sortCols: Seq[Column],
                             key: (Column, Boolean, Boolean),
                             rankCol: String, p: Int, value: Option[Column],
                             totalCol: String,
                             needCount: Boolean): (DataFrame, Long) = {
    val (keyed, nullsFirst, desc) = key
    val spark = df.sparkSession
    import spark.implicits._
    val maxBRaw = spark.conf.get(MaxBucketsKey, DefaultMaxBuckets.toString)
    val maxB =
      try maxBRaw.toInt
      catch { case e: NumberFormatException =>
        throw new IllegalArgumentException(
          s"$MaxBucketsKey must be an integer, got '$maxBRaw'", e)
      }
    val b = math.max(1, math.min(p, maxB))
    val withV = value match {
      case Some(v) =>
        df.withColumn("__gr_v", coalesce(v.cast("long"), lit(0L)))
      case None => df
    }
    val keyedDf = withV.withColumn("__gr_d", keyed)
    // bounded action 1: sample the boundaries (narrow, column-pruned
    // scan of the lead key; nulls and NaNs bucket by rule, not sample)
    // approxQuantile drops null and NaN itself — no pre-filter (a
    // Filter here measurably breaks codegen fusion with the summary
    // aggregate); nulls and NaNs bucket by the explicit rules below
    val bs: Array[Double] =
      if (b <= 1) Array.empty
      else keyedDf.select(col("__gr_d"))
        .stat.approxQuantile("__gr_d",
          (1 until b).map(_.toDouble / b).toArray,
          1.0 / math.max(1000, 4 * b))
        .distinct.sorted
    val k = bs.length // buckets 0..k: bucket(d) = #[ boundaries < d ]
    def tree(lo: Int, hi: Int): Column =
      if (lo == hi) lit(lo)
      else {
        val mid = (lo + hi) / 2
        when(col("__gr_d") > lit(bs(mid)), tree(mid + 1, hi))
          .otherwise(tree(lo, mid))
      }
    // null placement per the sort order's null ordering; NaN sorts
    // LARGEST in Spark, so it lands last ascending / first descending
    // (the embedding negates for desc but NaN survives negation)
    val bucket = when(col("__gr_d").isNull, lit(if (nullsFirst) 0 else k))
      .when(isnan(col("__gr_d")), lit(if (desc) 0 else k))
      .otherwise(tree(0, k))
    val bdf = keyedDf.withColumn("__gr_b", bucket).drop("__gr_d")
    val wr = Window.partitionBy("__gr_b").orderBy(sortCols: _*)
    val inBucket = value match {
      case Some(_) =>
        bdf.withColumn(rankCol, row_number().over(wr).cast("long"))
          .withColumn(totalCol, sum("__gr_v")
            .over(wr.rowsBetween(Window.unboundedPreceding, 0)))
      case None =>
        bdf.withColumn(rankCol, row_number().over(wr).cast("long"))
    }
    if (needCount) {
      // bounded action 2: per-bucket counts (and value sums) -> driver
      // (≤ b rows — metadata-scale, the AQE-stats posture). Only for
      // callers that need n on the driver (ntile/topFraction).
      val counts = (value match {
        case Some(_) => bdf.groupBy("__gr_b")
          .agg(count(lit(1)).as("c"), sum("__gr_v").as("s"))
        case None => bdf.groupBy("__gr_b").agg(count(lit(1)).as("c"))
      }).collect()
      val cs = Array.fill(k + 1)(0L)
      val ss = Array.fill(k + 1)(0L)
      counts.foreach { r =>
        cs(r.getInt(0)) = r.getLong(1)
        if (value.isDefined) ss(r.getInt(0)) = r.getLong(2)
      }
      var accC = 0L
      var accS = 0L
      val offsets = (0 to k).map { i =>
        val o = (i, accC, accS); accC += cs(i); accS += ss(i); o
      }
      val offDf = offsets.toDF("__gr_b", "__gr_off", "__gr_voff")
      // offsets join AFTER the window: the bucketed exchange moves only
      // the caller's columns + one int, not the offset longs
      val joined = inBucket.join(broadcast(offDf), "__gr_b")
        .withColumn(rankCol, col(rankCol) + col("__gr_off"))
      val out = value match {
        case Some(_) =>
          joined.withColumn(totalCol, col(totalCol) + col("__gr_voff"))
        case None => joined
      }
      (out.drop("__gr_b", "__gr_off", "__gr_voff", "__gr_v"), accC)
    } else {
      // offsets folded INTO the main query (r18, VERDICT item 6): when
      // the caller does not need n on the driver, the per-bucket
      // aggregate stays a plan subtree — each non-empty bucket b
      // contributes its (count, sum) to every bucket AFTER it via a
      // bounded explode(sequence(b+1, k)) (≤ B²/2 metadata rows), and
      // one tiny grouped sum yields exactly the prefix offsets the
      // collect computed. The broadcast LEFT join coalesces missing
      // offsets (no non-empty predecessor) to 0. One driver round-trip
      // fewer per call; the input-lineage pass count is unchanged.
      val counts = value match {
        case Some(_) => bdf.groupBy("__gr_b")
          .agg(count(lit(1)).as("__gr_c"), sum("__gr_v").as("__gr_s"))
        case None => bdf.groupBy("__gr_b")
          .agg(count(lit(1)).as("__gr_c"), lit(0L).as("__gr_s"))
      }
      val offDf = counts.filter(col("__gr_b") < lit(k))
        .select(explode(sequence(col("__gr_b") + lit(1), lit(k)))
          .as("__gr_b"), col("__gr_c"), col("__gr_s"))
        .groupBy("__gr_b")
        .agg(sum("__gr_c").as("__gr_off"), sum("__gr_s").as("__gr_voff"))
      val joined = inBucket.join(broadcast(offDf), Seq("__gr_b"), "left")
        .withColumn(rankCol,
          col(rankCol) + coalesce(col("__gr_off"), lit(0L)))
      val out = value match {
        case Some(_) => joined.withColumn(totalCol,
          col(totalCol) + coalesce(col("__gr_voff"), lit(0L)))
        case None => joined
      }
      (out.drop("__gr_b", "__gr_off", "__gr_voff", "__gr_v"), -1L)
    }
  }

  /** Pinned-partition-id fallback for lead keys with no monotone
    * numeric embedding: range-shuffle on the full sort tuple, freeze
    * each row's range-partition id AS DATA (`spark_partition_id()` +
    * [[Stage.materialize]] — boundaries come from sampling, so the id
    * must be pinned before two downstream jobs read the frame), then
    * the same offsets + partitioned-window arithmetic over the pid.
    */
  private def rankedStaged(df: DataFrame, sortCols: Seq[Column],
                           rankCol: String, p: Int, value: Option[Column],
                           totalCol: String): (DataFrame, Long) = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = value match {
      case Some(v) =>
        df.withColumn("__gr_v", coalesce(v.cast("long"), lit(0L)))
      case None => df
    }
    val ranged = Stage.materialize(
      base.repartitionByRange(p, sortCols: _*)
        .withColumn("__gr_pid", spark_partition_id()),
      if (value.isDefined) "global_running_total" else "global_rank")
    val parts = (value match {
      case Some(_) => ranged.groupBy("__gr_pid")
        .agg(count(lit(1)).as("c"), sum("__gr_v").as("s"))
      case None => ranged.groupBy("__gr_pid").agg(count(lit(1)).as("c"))
    }).collect()
      .map(r => (r.getInt(0), r.getLong(1),
        if (value.isDefined) r.getLong(2) else 0L))
      .sortBy(_._1)
    var accC = 0L
    var accS = 0L
    val offsets = parts.map { case (pid, c, s) =>
      val o = (pid, accC, accS); accC += c; accS += s; o
    }.toSeq
    val offDf = offsets.toDF("__gr_pid", "__gr_off", "__gr_voff")
    val wr = Window.partitionBy("__gr_pid").orderBy(sortCols: _*)
    val withRank = ranged.join(broadcast(offDf), "__gr_pid")
      .withColumn(rankCol,
        row_number().over(wr).cast("long") + col("__gr_off"))
    val out = value match {
      case Some(_) =>
        withRank.withColumn(totalCol, sum("__gr_v")
          .over(wr.rowsBetween(Window.unboundedPreceding, 0))
          + col("__gr_voff"))
      case None => withRank
    }
    (out.drop("__gr_pid", "__gr_off", "__gr_voff", "__gr_v"), accC)
  }
}
