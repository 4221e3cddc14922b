package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EXACT distributed median / MAD — robust outlier statistics without
  * a global sort, a row-scale shuffle, or an approximation.
  *
  * `approxQuantile` is fuzzy at the cut (rank error ε·n) and a global
  * `percentile_cont` plans a single-partition sort at 100 TB. Exact
  * order statistics don't need either: a rank is a SELECTION problem,
  * and selection narrows geometrically with aggregates alone — the
  * classic iterative-histogram algorithm:
  *
  *  1. one aggregate gives (n, min, max);
  *  2. one aggregate per pass histograms the candidate interval into
  *     B=2048 equi-width buckets, collecting per-bucket
  *     (count, min, max) — only B constant-size partials cross the
  *     wire, never rows;
  *  3. the driver prefix-sums the B counts (metadata-scale), picks the
  *     bucket holding the target rank, and recurses into that bucket's
  *     EXACT [min, max] span (taking bounds from the aggregate, not
  *     from bucket-edge arithmetic, makes float-boundary bucket
  *     misplacement harmless — the bucket partition itself defines the
  *     next candidate set);
  *  4. each pass divides the candidate span by ~B, so even 10^13 rows
  *     reach a driver-sized slice (≤ 64k values, ≤ 512 KB) in 2-3
  *     passes; all-equal candidates collapse the interval and
  *     terminate immediately.
  *
  * Unlike a range-shuffle ranking, NO row ever moves: every pass is a
  * full-scan aggregate with constant-size partials — the cheapest
  * distributed primitive there is. Driver memory is B triples per pass
  * plus the final slice — the documented bounded-collect posture
  * (SURVEY §2).
  *
  * MAD (median absolute deviation) composes the same selection twice:
  * med = median(x), mad = median(|x − med|). With the consistency
  * constant 1.4826 (≈ 1/Φ⁻¹(3/4)), `|x − med| > k·1.4826·mad` is the
  * robust z-score outlier rule — the standard data-quality screen
  * that, unlike mean/stddev, a few wild rows cannot drag.
  */
object RobustStats {

  private val Buckets = 2048
  private val DriverSliceMax = 65536L
  // Mechanical driver-OOM backstop (round 13): the narrowing loop's
  // exit invariant says the final slice holds <= DriverSliceMax rows
  // (the last histogram pass counted them), but that invariant rests
  // on the input being deterministic between the counting job and the
  // collect job — a non-deterministic source (rand()-derived column,
  // a table rewritten mid-query) can hand the collect arbitrarily more
  // rows than were counted. The cap collects through limit(cap + 1) —
  // a single bounded job — and falls back to value-group selection
  // (bounded by the DISTINCT count) when the slice fills the limit,
  // instead of trusting the stale count.
  private val SliceHardCap = 1048576L

  /** Exact median of `valueCol` (non-null rows) under the
    * `percentile_cont(0.5)` convention (average of the two middle
    * values for even n). Returns the driver scalar — the caller
    * composes it as a literal.
    */
  def medianExact(df: DataFrame, valueCol: Column): Double =
    medianExactImpl(df, valueCol, DriverSliceMax, SliceHardCap)

  /** [[medianExact]] with injectable collect bounds — package-private
    * so RobustStatsSpec can drive the hard-cap fallback without a
    * million-row fixture.
    */
  private[graft] def medianExactImpl(df: DataFrame, valueCol: Column,
                                     sliceMax: Long, hardCap: Long): Double = {
    val vals = df.select(valueCol.cast("double").as("__rs_x"))
      .filter(col("__rs_x").isNotNull)
    val head = vals.agg(count(lit(1)), min(col("__rs_x")),
      max(col("__rs_x"))).head()
    val n = head.getLong(0)
    require(n > 0, "median of an empty input")
    val (kLo, kHi) = ((n + 1) / 2, (n + 2) / 2)

    var lo = head.getDouble(1)
    var hi = head.getDouble(2)
    var cnt = n
    var k = kLo                     // rank of the first target within [lo, hi]
    var hiVal: Option[Double] =     // second target once it leaves the interval
      if (kHi == kLo) Some(Double.NaN) else None // NaN marker: same as loVal

    while (cnt > sliceMax && lo < hi) {
      val w = (hi - lo) / Buckets
      val bucket = least(greatest(
        floor((col("__rs_x") - lit(lo)) / lit(w)), lit(0.0)),
        lit((Buckets - 1).toDouble)).cast("int")
      val stats = vals
        .filter(col("__rs_x") >= lo && col("__rs_x") <= hi)
        .groupBy(bucket.as("__rs_b"))
        .agg(count(lit(1)).as("c"), min(col("__rs_x")).as("mn"),
          max(col("__rs_x")).as("mx"))
        .collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3)))
        .sortBy(_._1)
      var acc = 0L; var idx = -1; var below = 0L
      stats.indices.foreach { i =>
        if (idx < 0) {
          if (acc + stats(i)._2 >= k) { idx = i; below = acc }
          acc += stats(i)._2
        }
      }
      val (_, c, mn, mx) = stats(idx)
      // adjacent second target falling just past this bucket = the
      // next non-empty bucket's exact minimum (already collected)
      if (hiVal.isEmpty && k + 1 > below + c)
        hiVal = Some(stats(idx + 1)._3)
      if (mn == lo && mx == hi && c == cnt)
        // no shrink: the interval is a few ULPs wide (equi-width
        // bucketing degenerated) — the DISTINCT values inside are a
        // handful of adjacent doubles, so select by value groups
        return finishByValue(vals, lo, hi, k, hiVal)
      lo = mn; hi = mx; k -= below; cnt = c
    }
    if (lo == hi)
      // all remaining candidates hold ONE value (tie mass): no need to
      // collect any of them, however many rows that is
      (lo + hiVal.map(v => if (v.isNaN) lo else v).getOrElse(lo)) / 2.0
    else finishSlice(vals, lo, hi, k, hiVal, hardCap)
  }

  private def finishSlice(vals: DataFrame, lo: Double, hi: Double,
                          k: Long, hiVal: Option[Double],
                          hardCap: Long): Double = {
    val filtered = vals.filter(col("__rs_x") >= lo && col("__rs_x") <= hi)
      .select(col("__rs_x"))
    // hard cap in ONE pass (r14): collect through limit(hardCap + 1) —
    // the driver materializes at most hardCap + 1 rows whatever the
    // source does between jobs, and a full result means the slice
    // overflowed the cap, so selection falls back to value groups.
    // (r13 ran a separate count() job first — one extra full scan on
    // the common well-under-cap path.)
    val lim = math.min(hardCap + 1, Int.MaxValue.toLong).toInt
    val capped = filtered.limit(lim).collect()
    if (capped.length >= lim)
      return finishByValue(vals, lo, hi, k, hiVal)
    val slice = capped.map(_.getDouble(0))
    java.util.Arrays.sort(slice)
    val loVal = slice((k - 1).toInt)
    val second = hiVal match {
      case Some(v) if v.isNaN => loVal       // odd n: both ranks equal
      case Some(v) => v                      // resolved during narrowing
      case None => slice(k.toInt)            // both ranks in the slice
    }
    (loVal + second) / 2.0
  }

  /** Selection by (value, count) groups — bounded by the DISTINCT
    * count, for tie-collapsed intervals where the row count is not.
    */
  private def finishByValue(vals: DataFrame, lo: Double, hi: Double,
                            k: Long, hiVal: Option[Double]): Double = {
    val grouped = vals.filter(col("__rs_x") >= lo && col("__rs_x") <= hi)
      .groupBy(col("__rs_x")).agg(count(lit(1)).as("c"))
    // last line of defense: value groups are bounded by the DISTINCT
    // count — normally a handful (ULP-degenerate interval) or at most
    // the capped slice's diversity. A group count only reachable via a
    // source mutating between jobs fails loudly instead of OOMing.
    val ng = grouped.count()
    require(ng <= 16L * 1024 * 1024,
      s"median selection degenerate: $ng distinct values in [$lo, $hi] " +
        "— non-deterministic input changed between narrowing passes?")
    val groups = grouped
      .collect().map(r => (r.getDouble(0), r.getLong(1))).sortBy(_._1)
    def rankValue(r: Long): Double = {
      var acc = 0L
      groups.foreach { case (v, c) =>
        acc += c
        if (acc >= r) return v
      }
      groups.last._1
    }
    val loVal = rankValue(k)
    val second = hiVal match {
      case Some(v) if v.isNaN => loVal
      case Some(v) => v
      case None => rankValue(k + 1)
    }
    (loVal + second) / 2.0
  }

  /** Per-KEY exact median under the same `percentile_cont(0.5)`
    * convention as [[medianExact]], vectorized across keys with the
    * identical aggregate-only iterative-histogram selection — one
    * histogram pass narrows EVERY active key's candidate interval at
    * once, so K keys cost the same 2-4 full-scan aggregate passes one
    * key does, and NO row ever shuffles or sorts (the input feeds a
    * map-side partial aggregate; only activeKeys × B constant-size
    * partials cross the wire per pass).
    *
    * The input frame is RE-EVALUATED once per pass (head + 1-3
    * histogram passes + the final slice/value collect), so callers
    * pass a cheap-to-recompute lineage — a staged scan, or a
    * generated stream whose enumeration is map-side compute (the
    * Theil-Sen pair stream). Driver memory is O(activeKeys × B) per
    * pass plus the final per-key slices (batched under `hardCap` rows
    * per collect) — callers must bound the KEY cardinality
    * (count-then-choose; [[Metrics.theilSen]] gates on
    * [[Metrics.groupedKeyLimit]]).
    *
    * @param gen frame with columns `__rs_k` (any type, the key) and
    *            `__rs_x` (double, non-null)
    * @return per key: (n, median); keys with no rows yield no entry
    */
  private[operators] def groupedMedianExact(gen: DataFrame,
      sliceMax: Long = DriverSliceMax,
      hardCap: Long = SliceHardCap): Seq[(Any, Long, Double)] = {
    val spark = gen.sparkSession
    val keyType = gen.schema.apply("__rs_k").dataType
    val keyNullable = gen.schema.apply("__rs_k").nullable

    final class St(var lo: Double, var hi: Double, var cnt: Long,
                   var k: Long, var hiVal: Option[Double], val n: Long,
                   var byValue: Boolean = false, var done: Boolean = false,
                   var med: Double = 0.0)
    val st = scala.collection.mutable.LinkedHashMap.empty[Any, St]
    gen.groupBy("__rs_k")
      .agg(count(lit(1)).as("n"), min("__rs_x").as("mn"),
        max("__rs_x").as("mx"))
      .collect()
      .foreach { r =>
        val n = r.getLong(1)
        val (kLo, kHi) = ((n + 1) / 2, (n + 2) / 2)
        st(r.get(0)) = new St(r.getDouble(2), r.getDouble(3), n, kLo,
          if (kHi == kLo) Some(Double.NaN) else None, n)
      }

    def boundsDf(keys: Seq[Any]): DataFrame = {
      import scala.jdk.CollectionConverters._
      val rows: java.util.List[org.apache.spark.sql.Row] =
        keys.map { ky =>
          org.apache.spark.sql.Row(ky, st(ky).lo, st(ky).hi)
        }.asJava
      broadcast(spark.createDataFrame(rows,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("__rs_k", keyType,
            keyNullable),
          org.apache.spark.sql.types.StructField("__rs_lo",
            org.apache.spark.sql.types.DoubleType, nullable = false),
          org.apache.spark.sql.types.StructField("__rs_hi",
            org.apache.spark.sql.types.DoubleType, nullable = false)))))
    }
    def inRange = col("__rs_x") >= col("__rs_lo") &&
      col("__rs_x") <= col("__rs_hi")

    var active = st.collect {
      case (ky, s) if s.cnt > sliceMax && s.lo < s.hi => ky
    }.toSeq
    var guard = 0
    while (active.nonEmpty && guard < 64) {
      guard += 1
      val w = (col("__rs_hi") - col("__rs_lo")) / lit(Buckets.toDouble)
      val bucket = least(greatest(
        floor((col("__rs_x") - col("__rs_lo")) / w), lit(0.0)),
        lit((Buckets - 1).toDouble)).cast("int")
      val stats = gen.join(boundsDf(active), "__rs_k")
        .filter(inRange)
        .groupBy(col("__rs_k"), bucket.as("__rs_b"))
        .agg(count(lit(1)).as("c"), min("__rs_x").as("mn"),
          max("__rs_x").as("mx"))
        .collect()
        .groupBy(_.get(0))
      val next = Seq.newBuilder[Any]
      active.foreach { ky =>
        val s = st(ky)
        stats.get(ky) match {
          case None =>
            // a deterministic source always re-yields the counted rows;
            // an empty pass means it changed between jobs — fall back
            // to value-group selection rather than trusting stale state
            s.byValue = true
          case Some(rs) =>
            val rows = rs.map(r => (r.getInt(1), r.getLong(2),
              r.getDouble(3), r.getDouble(4))).sortBy(_._1)
            var acc = 0L; var idx = -1; var below = 0L
            rows.indices.foreach { i =>
              if (idx < 0) {
                if (acc + rows(i)._2 >= s.k) { idx = i; below = acc }
                acc += rows(i)._2
              }
            }
            if (idx < 0) { s.byValue = true }
            else {
              val (_, c, mn, mx) = rows(idx)
              if (s.hiVal.isEmpty && s.k + 1 > below + c)
                s.hiVal = Some(rows(idx + 1)._3)
              if (mn == s.lo && mx == s.hi && c == s.cnt) s.byValue = true
              else {
                s.lo = mn; s.hi = mx; s.k -= below; s.cnt = c
                if (s.cnt > sliceMax && s.lo < s.hi) next += ky
              }
            }
        }
      }
      active = next.result()
    }

    def resolve(loVal: Double, s: St, second: => Double): Double = {
      val hi2 = s.hiVal match {
        case Some(v) if v.isNaN => loVal
        case Some(v) => v
        case None => second
      }
      (loVal + hi2) / 2.0
    }

    // collapsed intervals: one value holds both target ranks
    st.values.foreach { s =>
      if (!s.done && !s.byValue && s.lo >= s.hi) {
        s.med = resolve(s.lo, s, s.lo); s.done = true
      }
    }

    // slice finish, batched so one collect never materializes more
    // than hardCap rows (the medianExact limit(cap + 1) discipline —
    // a source mutating between jobs overflows the limit and falls
    // back to value groups instead of flooding the driver)
    val sliceKeys = st.collect {
      case (ky, s) if !s.done && !s.byValue => ky
    }.toSeq
    val batches = Seq.newBuilder[Seq[Any]]
    var cur = Seq.newBuilder[Any]; var curRows = 0L
    sliceKeys.foreach { ky =>
      val c = st(ky).cnt
      if (c > hardCap) st(ky).byValue = true
      else {
        if (curRows + c > hardCap) {
          batches += cur.result(); cur = Seq.newBuilder[Any]; curRows = 0L
        }
        cur += ky; curRows += c
      }
    }
    val lastB = cur.result(); if (lastB.nonEmpty) batches += lastB
    batches.result().foreach { batch =>
      val expect = batch.map(st(_).cnt).sum
      val lim = math.min(expect + 1, Int.MaxValue.toLong).toInt
      val capped = gen.join(boundsDf(batch), "__rs_k").filter(inRange)
        .select(col("__rs_k"), col("__rs_x"))
        .limit(lim).collect()
      if (capped.length >= lim) batch.foreach(st(_).byValue = true)
      else {
        val byKey = capped.groupBy(_.get(0))
        batch.foreach { ky =>
          val s = st(ky)
          byKey.get(ky) match {
            case None => s.byValue = true
            case Some(rs) =>
              val slice = rs.map(_.getDouble(1))
              java.util.Arrays.sort(slice)
              if (s.k > slice.length) s.byValue = true
              else {
                val loVal = slice((s.k - 1).toInt)
                s.med = resolve(loVal, s,
                  if (s.k < slice.length) slice(s.k.toInt) else loVal)
                s.done = true
              }
          }
        }
      }
    }

    // value-group finish (ULP-degenerate intervals + every fallback):
    // bounded by the DISTINCT count inside each key's interval
    val bvKeys = st.collect {
      case (ky, s) if !s.done && s.byValue => ky
    }.toSeq
    if (bvKeys.nonEmpty) {
      val grouped = gen.join(boundsDf(bvKeys), "__rs_k").filter(inRange)
        .groupBy(col("__rs_k"), col("__rs_x"))
        .agg(count(lit(1)).as("c"))
      val ng = grouped.count()
      require(ng <= 16L * 1024 * 1024,
        s"grouped median selection degenerate: $ng distinct (key, value) " +
          "groups — non-deterministic input changed between passes?")
      val byKey = grouped.collect().groupBy(_.get(0))
      bvKeys.foreach { ky =>
        val s = st(ky)
        val groups = byKey(ky).map(r => (r.getDouble(1), r.getLong(2)))
          .sortBy(_._1)
        def rankValue(r: Long): Double = {
          var acc = 0L
          groups.foreach { case (v, c) =>
            acc += c
            if (acc >= r) return v
          }
          groups.last._1
        }
        val loVal = rankValue(s.k)
        s.med = resolve(loVal, s, rankValue(s.k + 1))
        s.done = true
      }
    }
    st.toSeq.map { case (ky, s) => (ky, s.n, s.med) }
  }

  /** EXACT lower weighted median: the smallest value v whose
    * cumulative weight (in value order) reaches ⌈W/2⌉, W = Σweights.
    * Same iterative-histogram selection as [[medianExact]] — the rank
    * is a WEIGHT rank instead of a row rank, so each pass histograms
    * per-bucket (row count, weight sum, min, max) and the driver walks
    * the B weight sums to pick the bucket holding the target. Still
    * aggregate-only: no row ever moves, no range shuffle, no
    * materialized ranking — strictly cheaper than a running-total
    * ranking when only the scalar is needed (the GlobalRank
    * running-total shape remains the right tool when every row needs
    * its cumulative position).
    *
    * Weights must be positive longs (exact integer arithmetic end to
    * end — the ⌈W/2⌉ threshold and every cumulation are order-free).
    * Returns (median value, total weight W).
    */
  def weightedMedianExact(df: DataFrame, valueCol: Column,
                          weightCol: Column): (Double, Long) =
    weightedQuantileExact(df, valueCol, weightCol, 1L, 2L)

  /** Exact lower weighted quantile at p = num/den: the smallest value
    * whose cumulative weight reaches ceil(p * W). The fraction arrives
    * as INTEGERS so the threshold ceil(num*W / den) =
    * (num*W + den - 1) / den is computed without a single float —
    * p = 0.9 as (9, 10) can never land on the wrong side of an exact
    * multiple the way ceil(0.9 * W) in doubles can.
    */
  def weightedQuantileExact(df: DataFrame, valueCol: Column,
                            weightCol: Column,
                            num: Long, den: Long): (Double, Long) =
    weightedQuantileImpl(df, valueCol, weightCol, num, den,
      DriverSliceMax, SliceHardCap)

  /** [[weightedQuantileExact]] with injectable collect bounds (see
    * [[medianExactImpl]]).
    */
  private[graft] def weightedQuantileImpl(df: DataFrame, valueCol: Column,
                                          weightCol: Column,
                                          num: Long, den: Long,
                                          sliceMax: Long,
                                          hardCap: Long): (Double, Long) = {
    require(num >= 1 && den >= 1 && num <= den,
      s"quantile fraction must satisfy 1 <= num <= den (got $num/$den)")
    val vals = df.select(valueCol.cast("double").as("__rs_x"),
        weightCol.cast("long").as("__rs_w"))
      .filter(col("__rs_x").isNotNull && col("__rs_w").isNotNull)
    val head = vals.agg(count(lit(1)), sum(col("__rs_w")),
      min(col("__rs_w")), min(col("__rs_x")), max(col("__rs_x"))).head()
    val n = head.getLong(0)
    require(n > 0, "weighted quantile of an empty input")
    require(head.getLong(2) > 0,
      s"weights must be positive (min = ${head.getLong(2)})")
    val totalW = head.getLong(1)

    var lo = head.getDouble(3)
    var hi = head.getDouble(4)
    var cnt = n
    // threshold via BigInt: num * W overflows a Long once W passes
    // ~Long.Max/num (reachable — W is a corpus-wide weight sum), and
    // the wrapped-negative k would silently select min(v); the
    // RESULT k <= W always fits a Long
    var k = ((BigInt(num) * totalW + den - 1) / den).toLong

    while (cnt > sliceMax && lo < hi) {
      val w = (hi - lo) / Buckets
      val bucket = least(greatest(
        floor((col("__rs_x") - lit(lo)) / lit(w)), lit(0.0)),
        lit((Buckets - 1).toDouble)).cast("int")
      val stats = vals
        .filter(col("__rs_x") >= lo && col("__rs_x") <= hi)
        .groupBy(bucket.as("__rs_b"))
        .agg(count(lit(1)).as("c"), sum(col("__rs_w")).as("ws"),
          min(col("__rs_x")).as("mn"), max(col("__rs_x")).as("mx"))
        .collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getDouble(4)))
        .sortBy(_._1)
      var acc = 0L; var idx = -1; var below = 0L
      stats.indices.foreach { i =>
        if (idx < 0) {
          if (acc + stats(i)._3 >= k) { idx = i; below = acc }
          acc += stats(i)._3
        }
      }
      val (_, c, _, mn, mx) = stats(idx)
      if (mn == lo && mx == hi && c == cnt)
        // ULP-degenerate interval: select among the few distinct
        // values by weight groups (bounded by the distinct count)
        return (weightedByValue(vals, lo, hi, k), totalW)
      lo = mn; hi = mx; k -= below; cnt = c
    }
    if (lo == hi) return (lo, totalW)
    val filtered = vals.filter(col("__rs_x") >= lo && col("__rs_x") <= hi)
    // same single-pass hard cap as finishSlice: limit(hardCap + 1)
    // bounds the driver materialization; a full result = overflow
    val lim = math.min(hardCap + 1, Int.MaxValue.toLong).toInt
    val capped = filtered.limit(lim).collect()
    if (capped.length >= lim)
      return (weightedByValue(vals, lo, hi, k), totalW)
    val slice = capped.map(r => (r.getDouble(0), r.getLong(1))).sortBy(_._1)
    var a = 0L
    slice.foreach { case (v, sw) =>
      a += sw
      if (a >= k) return (v, totalW)
    }
    (slice.last._1, totalW)
  }

  /** Weight-rank selection by (value, weight-sum) groups — bounded by
    * the DISTINCT count, shared by the ULP-degenerate branch and the
    * hard-cap fallback of [[weightedQuantileImpl]].
    */
  private def weightedByValue(vals: DataFrame, lo: Double, hi: Double,
                              k: Long): Double = {
    val grouped = vals.filter(col("__rs_x") >= lo && col("__rs_x") <= hi)
      .groupBy(col("__rs_x")).agg(sum(col("__rs_w")).as("ws"))
    val ng = grouped.count()
    require(ng <= 16L * 1024 * 1024,
      s"weighted selection degenerate: $ng distinct values in [$lo, $hi] " +
        "— non-deterministic input changed between narrowing passes?")
    val groups = grouped
      .collect().map(r => (r.getDouble(0), r.getLong(1))).sortBy(_._1)
    var a = 0L
    groups.foreach { case (v, gw) =>
      a += gw
      if (a >= k) return v
    }
    groups.last._1
  }

  /** One-row robust summary of `valueCol`:
    * (n, med, mad, n_out) where n_out counts rows with
    * `|x − med| > k·1.4826·mad`. Exact at any scale — iterative-
    * histogram selections, no approximation, no row-scale shuffle.
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
