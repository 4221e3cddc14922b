package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global rank / ntile WITHOUT a global window.
  *
  * `row_number().over(Window.orderBy(...))` — an empty partition spec —
  * plans a single-partition WindowExec: one task sorts the entire
  * input, which is the canonical 100 TB scale-killer (and the warning
  * Spark prints as "No Partition Defined ... serious performance
  * degradation"). But exact global ranking doesn't need a global sort
  * in one task; the classic two-phase shape distributes it:
  *
  *  1. `repartitionByRange(p, sortCols)` — each partition holds one
  *     contiguous key range (a sampled-boundary range shuffle, the
  *     same machinery as a distributed ORDER BY);
  *  2. freeze each row's range-partition id AS DATA
  *     (`spark_partition_id()` + [[Stage.materialize]] — boundaries
  *     come from sampling, so the id must be pinned before two
  *     downstream jobs read the frame);
  *  3. per-partition row counts → driver (p rows — metadata-scale,
  *     bounded by the shuffle partition count, the same posture as
  *     AQE's per-partition stats) → prefix-sum offsets, broadcast
  *     back;
  *  4. `row_number()` over a window PARTITIONED by the frozen id
  *     (parallel, one range per task) + the partition's offset
  *     = the exact global rank.
  *
  * The result is identical to the global-window answer for any TOTAL
  * ordering (pass a tiebreak column — ranks among exact duplicates are
  * otherwise tie-broken by partition placement), but every stage is
  * parallel: the only single-point work is the p-row offset scan.
  *
  * Callers should project to the scalar columns they need before
  * calling — step 2 stages the full frame to parquet.
  */
object GlobalRank {

  /** `df` plus a `rankCol` (1-based, long) giving each row's exact
    * global rank under `sortCols`. See object doc for the plan shape.
    *
    * @param sortCols total ordering (include a tiebreak column);
    *                 `.desc` columns are honored
    * @param numPartitions range partitions; <= 0 uses
    *                      `spark.sql.shuffle.partitions`
    */
  def withGlobalRank(df: DataFrame, sortCols: Seq[Column],
                     rankCol: String = "rank",
                     numPartitions: Int = 0): DataFrame =
    rankedWithTotal(df, sortCols, rankCol, numPartitions)._1

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
    val (ranked, n) = rankedWithTotal(df, sortCols, "__gr_rank", numPartitions)
    val q = n / buckets
    val rem = n % buckets
    val cut = rem * (q + 1) // ranks 1..cut land in the q+1-sized buckets
    val bucket = when(col("__gr_rank") <= cut,
        expr(s"(__gr_rank - 1) div ${q + 1} + 1"))
      .otherwise( // q = 0 only when n < buckets, where every rank <= cut
        expr(s"$rem + (__gr_rank - 1 - $cut) div ${math.max(q, 1L)} + 1"))
    ranked.withColumn(bucketCol, bucket.cast("long")).drop("__gr_rank")
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
    val (ranked, n) = rankedWithTotal(df, sortCols, rankCol, numPartitions)
    ranked.filter(col(rankCol) <= math.round(frac * n))
  }

  /** Deterministic epoch shuffle — the training-order permutation of a
    * corpus for one epoch, as an explicit `pos` (1..n): order by the
    * content hash of (id, epoch seed). Content-addressed, so the
    * permutation is reproducible across runs, retries, cluster sizes,
    * and (with `portable = true`, the md5 path the oracle replays)
    * engines — a `rand()` shuffle is none of those. A new seed per
    * epoch gives independent permutations without materializing any
    * shuffle state.
    *
    * The hash is evaluated as a sort EXPRESSION (twice: range shuffle +
    * in-partition window) rather than a materialized column — fine
    * because it is deterministic per row, which is the whole point.
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
    * spent"). Same two-phase shape as [[withGlobalRank]]: the range
    * stage adds a per-partition SUM next to the count, the driver
    * prefix-sums both (p rows), and the in-partition window carries
    * the value sum alongside row_number — still no global window, one
    * extra long per offset row.
    *
    * `valueCol` must be integral (LONG) — integer prefix sums are
    * order-free and bit-identical cross-engine, where a double's
    * accumulation order would not be.
    *
    * Null contract: a null `valueCol` counts as 0 toward the running
    * total (it is coalesced at ingestion, so the per-partition sums,
    * the driver prefix-sum, and the in-partition window all see the
    * same non-null longs — a partition of all-null values can no
    * longer NPE the driver's `getLong`, and rank/total cannot
    * desynchronize on null-skipping window sums).
    */
  def withRunningTotal(df: DataFrame, sortCols: Seq[Column],
                       valueCol: Column, rankCol: String = "rank",
                       totalCol: String = "running_total",
                       numPartitions: Int = 0): DataFrame = {
    val taken = df.columns.toSet
    require(!taken(rankCol), s"input already has a '$rankCol' column")
    require(!taken(totalCol), s"input already has a '$totalCol' column")
    require(!taken("__gr_pid") && !taken("__gr_off") && !taken("__gr_voff")
      && !taken("__gr_v"),
      "input uses GlobalRank's reserved __gr_* names")
    val spark = df.sparkSession
    import spark.implicits._
    val p =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val ranged = Stage.materialize(
      df.withColumn("__gr_v", coalesce(valueCol.cast("long"), lit(0L)))
        .repartitionByRange(p, sortCols: _*)
        .withColumn("__gr_pid", spark_partition_id()),
      "global_running_total")
    val parts = ranged.groupBy("__gr_pid")
      .agg(count(lit(1)).as("c"), sum("__gr_v").as("s"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    var accC = 0L; var accS = 0L
    val offsets = parts.map { case (pid, c, s) =>
      val o = (pid, accC, accS); accC += c; accS += s; o
    }.toSeq
    val offDf = offsets.toDF("__gr_pid", "__gr_off", "__gr_voff")
    val w = Window.partitionBy("__gr_pid").orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val wr = Window.partitionBy("__gr_pid").orderBy(sortCols: _*)
    ranged
      .join(broadcast(offDf), "__gr_pid")
      .withColumn(rankCol,
        (row_number().over(wr).cast("long") + col("__gr_off")))
      .withColumn(totalCol, (sum("__gr_v").over(w) + col("__gr_voff")))
      .drop("__gr_pid", "__gr_off", "__gr_voff", "__gr_v")
  }

  private def rankedWithTotal(df: DataFrame, sortCols: Seq[Column],
                              rankCol: String,
                              numPartitions: Int): (DataFrame, Long) = {
    // withColumn REPLACES silently — a caller column named like the
    // rank output or the internal pid/offset scratch would corrupt the
    // result without a trace
    val taken = df.columns.toSet
    require(!taken(rankCol), s"input already has a '$rankCol' column")
    require(!taken("__gr_pid") && !taken("__gr_off"),
      "input uses GlobalRank's reserved __gr_pid/__gr_off names")
    val spark = df.sparkSession
    import spark.implicits._
    val p =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val ranged = Stage.materialize(
      df.repartitionByRange(p, sortCols: _*)
        .withColumn("__gr_pid", spark_partition_id()),
      "global_rank")
    val counts = ranged.groupBy("__gr_pid").count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (pid, cnt) =>
      val o = (pid, acc); acc += cnt; o
    }.toSeq
    val offDf = offsets.toDF("__gr_pid", "__gr_off")
    val w = Window.partitionBy("__gr_pid").orderBy(sortCols: _*)
    val ranked = ranged
      .join(broadcast(offDf), "__gr_pid")
      .withColumn(rankCol,
        (row_number().over(w).cast("long") + col("__gr_off")))
      .drop("__gr_pid", "__gr_off")
    (ranked, acc)
  }
}
