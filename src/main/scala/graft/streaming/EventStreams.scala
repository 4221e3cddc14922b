package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Structured Streaming surface (SURVEY.md §2.9 [EXT]) — the true
  * streaming path. Every transform here is written against an unbounded
  * `events`-shaped DataFrame (ts timestamp, event_id, user_id,
  * event_type, value) and works identically on batch frames (StreamQ
  * validates the batch twins against DuckDB; StreamingSpec drives these
  * through MemoryStream).
  *
  * Scale notes: all aggregations are keyed on (window, type) or
  * session/user keys, so state is partitioned across executors by the
  * shuffle; watermarks bound state size — without them, windowed state
  * grows forever at 100 TB/day ingest. `dropDuplicates` state is likewise
  * watermark-bounded.
  */
object EventStreams {

  /** Null contract (round 15, NULL audit dimension): a row whose
    * EVENT-TIME or another field the operator FOLDS INTO STATE is
    * null never enters a stateful computation — the batch analog of
    * what event-time processing already does natively (Spark's
    * TimeWindowing rewrite filters null-ts rows before every
    * window()/session_window() aggregate, and a watermark cannot be
    * computed from a null event time). The typed operators below must
    * enforce it EXPLICITLY because their tuple encoders decode into
    * primitive Long/Double fields — a null consumed field is a
    * runtime NOT_NULL_ASSERT_VIOLATION, not a skipped value (the r15
    * null-corpus sweep caught exactly this: `value` was filtered
    * since r12 but `ts` reached unix_micros un-checked). Fields the
    * operator does NOT fold (e.g. a grouping column with SQL
    * null-group semantics) keep their engine-native behavior.
    */
  private def wellFormed(events: DataFrame, cols: String*): DataFrame =
    cols.foldLeft(events)((d, c) => d.filter(col(c).isNotNull))

  /** Tumbling-window counts/sums per event type, watermark-bounded. */
  def tumble(events: DataFrame, watermark: String = "10 minutes",
             width: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_v"))

  /** Tumbling-window approximate distinct users — the live-audience /
    * unique-visitors counter. approx_count_distinct's HLL++ partials
    * are MERGEABLE, so streaming state per window is one fixed-size
    * sketch buffer (never a per-user set: an adversarial user-id flood
    * cannot grow state), merged across triggers by the normal partial
    * aggregation path; watermark bounds how many window sketches live
    * at once. The batch gate (StreamQ stream_distinct) checks the
    * estimate against the exact count with the agg_approx_distinct
    * error-bound convention. Default rsd is 0.005, NOT the builtin
    * 0.05: hourly windows hold tens of users, and HLL++ at loose rsd
    * biases LOW at small cardinalities (measured 18% at n=11 with
    * rsd 0.02) — the tighter sketch stays in its near-exact sparse
    * regime there (max observed error 1.7% across every gate SF) at
    * ~48 KB per window sketch (2^16 six-bit registers), which is still
    * fixed-size, cardinality-independent state.
    */
  def windowDistinct(events: DataFrame, watermark: String = "10 minutes",
                     width: String = "1 hour", rsd: Double = 0.005): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width).as("w"))
      .agg(approx_count_distinct(col("user_id"), rsd).as("approx_users"))

  /** Per-window top-`k` heavy hitters over a term-like column via the
    * Space-Saving sketch aggregate (expressions.SpaceSavingTopK) —
    * streaming state per window is ONE capacity-bounded sketch buffer
    * (the typed-imperative serialize/deserialize path), not a
    * per-distinct-term count map, so an adversarial high-cardinality
    * stream cannot grow state past `capacity` entries per window.
    * Watermark-bounded like every other windowed aggregate here.
    */
  def windowTopTerms(events: DataFrame, termCol: String,
                     watermark: String = "10 minutes",
                     width: String = "1 hour",
                     k: Int = 3, capacity: Int = 64): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width).as("w"))
      .agg(graft.functions.TextFns.topTerms(col(termCol), k, capacity).as("tt"))

  /** Sliding-window counts/sums. */
  def slide(events: DataFrame, watermark: String = "10 minutes",
            width: String = "1 hour", step: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width, step).as("w"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_v"))

  /** Session windows (gap-based) per user. */
  def session(events: DataFrame, watermark: String = "10 minutes",
              gap: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_v"))

  /** Late-data-tolerant exact dedup on event_id: duplicates arriving
    * within the watermark horizon are dropped; state for event ids older
    * than the watermark is reclaimed.
    */
  def dedup(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicates("event_id")

  /** Stream-STATIC enrichment join — the most common production
    * streaming shape: each arriving event joins a slowly-changing
    * dimension snapshot (users, catalogs, geo tables), then aggregates
    * per window. The dim side is a bounded DataFrame, so Spark plans a
    * broadcast hash join against the stream with NO join state at all
    * (unlike stream-stream, nothing buffers: the dim is re-resolved
    * per micro-batch, which is also what picks up dim updates between
    * triggers). Watermark bounds the windowed aggregate exactly as in
    * `tumble`.
    */
  def enrich(events: DataFrame, dim: DataFrame, joinCond: Column,
             dimGroup: Column, watermark: String = "10 minutes",
             width: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .join(broadcast(dim), joinCond)
      .groupBy(window(col("ts"), width).as("w"), dimGroup)
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_v"))

  /** Stream-stream interval join: each event pairs with follow-up
    * events of the same user inside `horizon` (the streaming twin of
    * Relational's `join_range`). Both sides carry watermarks and the
    * join condition bounds the time range in BOTH directions — the two
    * constraints Structured Streaming needs to reclaim buffered rows;
    * without them, stream-stream join state grows without bound.
    */
  def intervalJoin(events: DataFrame, watermark: String = "10 minutes",
                   horizon: String = "5 minutes"): DataFrame = {
    val a = events.select(col("user_id"), col("event_id").as("a_id"),
      col("ts").as("a_ts"), col("event_type"))
      .withWatermark("a_ts", watermark)
    val b = events.select(col("user_id").as("b_user"),
      col("event_id").as("b_id"), col("ts").as("b_ts"),
      col("value").as("b_value"))
      .withWatermark("b_ts", watermark)
    a.join(b,
      col("user_id") === col("b_user") &&
        col("b_ts") > col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr(s"INTERVAL $horizon"))
      .select(col("event_type"), col("a_id"), col("b_id"), col("b_value"))
  }

  /** Per-user running aggregate state. */
  final case class UserState(n: Long, sum: Double)
  /** One emitted update per user per trigger. */
  final case class UserUpdate(user_id: Long, n: Long, sum_v: Double)

  /** Per-user funnel progress: current depth + timestamp of the last
    * matched step. TWO fields per user regardless of event volume —
    * the bounded-state counterexample to "sessionization needs the
    * whole history".
    */
  final case class FunnelState(depth: Int, lastTs: Long)
  /** One progress row per user per trigger. */
  final case class FunnelProgress(user_id: Long, depth: Int)

  /** ONLINE ordered-funnel tracking (the incremental twin of
    * `operators.Funnel`): per-user state advances through `steps` with
    * strict-after semantics as events arrive; each trigger emits the
    * user's current depth. Within a trigger the group's rows are
    * sorted by (ts, event_id), so batch-mode execution (empty state
    * store, one group per user) reproduces `Funnel.depths` exactly —
    * which is what the gate's oracle checks. Across triggers the scan
    * is online: an event arriving AFTER a later-timestamped match has
    * already advanced the funnel cannot retroactively insert itself —
    * the standard latency/exactness trade of streaming funnels (replay
    * through the batch operator for the exact answer).
    *
    * State is (depth, lastTs) — two scalars per user, no event
    * retention, no watermark needed for correctness (only for state
    * eviction policy if users are unbounded).
    */
  /** Per-group funnel advance — the ONE step core both state APIs run
    * (shared code is what makes the two paths equivalent by
    * construction, not by parallel maintenance).
    */
  private def funnelStep(steps: Seq[String], prev: FunnelState,
                         rows: Iterator[(Long, Long, Long, String)]): FunnelState = {
    var d = prev.depth
    var last = prev.lastTs
    rows.toSeq.sortBy(r => (r._2, r._3)).foreach { case (_, t, _, e) =>
      if (d < steps.size && e == steps(d) && (d == 0 || t > last)) {
        d += 1
        last = t
      }
    }
    FunnelState(d, last)
  }

  private class FunnelProc(steps: Seq[String])
      extends StatefulProcessor[Long, (Long, Long, Long, String), FunnelProgress] {
    @transient private var st: ValueState[FunnelState] = _
    override def init(om: OutputMode, tm: TimeMode): Unit =
      st = StateApi.valueState[FunnelState](getHandle, "funnel",
        Encoders.product[FunnelState], TTLConfig.NONE)
    override def handleInputRows(uid: Long,
                                 rows: Iterator[(Long, Long, Long, String)],
                                 tv: TimerValues): Iterator[FunnelProgress] = {
      val prev = Option(st.get()).getOrElse(FunnelState(0, Long.MinValue))
      val next = funnelStep(steps, prev, rows)
      st.update(next)
      Iterator(FunnelProgress(uid, next.depth))
    }
  }

  def funnelDepths(spark: SparkSession, events: DataFrame,
                   steps: Seq[String]): Dataset[FunnelProgress] = {
    import spark.implicits._
    require(steps.nonEmpty, "funnel needs at least one step")
    // isin() already drops null event_type (three-valued logic);
    // ts must not reach unix_micros null (primitive tuple decode)
    val keyed = wellFormed(events, "ts")
      .filter(col("event_type").isin(steps: _*))
      .select(col("user_id").cast("long"), unix_micros(col("ts")),
        col("event_id").cast("long"), col("event_type"))
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
    if (StateApi.useTws(spark))
      keyed.transformWithState(new FunnelProc(steps), TimeMode.None(),
        OutputMode.Update(), Encoders.product[FunnelProgress])
    else keyed.flatMapGroupsWithState[FunnelState, FunnelProgress](
      OutputMode.Update, GroupStateTimeout.NoTimeout) {
      (uid: Long, rows: Iterator[(Long, Long, Long, String)],
       state: GroupState[FunnelState]) =>
        val next = funnelStep(steps,
          state.getOption.getOrElse(FunnelState(0, Long.MinValue)), rows)
        state.update(next)
        Iterator(FunnelProgress(uid, next.depth))
    }
  }

  /** Per-user prefix-moment accumulator: count plus EXACT integer
    * sums of cent-quantized values (Σc, Σc²) — THREE scalars per user.
    *
    * Round 12 replaced the float Welford triple (n, mean, m2): the
    * skewed-corpus audit showed Welford's incremental rounding and the
    * oracle's windowed avg/var_samp drifting apart over hot users'
    * 30×-longer histories — 74 borderline |z|>3 flips and a z-snap
    * boundary crossing in the CUSUM fold. Integer sums are
    * plan/engine/order-free (the Cols.sumCents discipline applied to
    * second moments); both engines derive mean/var/z from the
    * IDENTICAL integers with the IDENTICAL double expression tree, so
    * the comparison can never flip. Values quantize to cents first —
    * the registry's standing sub-cent convention for events.value.
    * Long bounds: Σc² overflows past ~9.2e18 (e.g. 10⁹ events/user at
    * ~$1k magnitudes); the step guards and fails loudly — widen the
    * state to Decimal(38,0) when a corpus legitimately crosses that.
    */
  final case class MomentState(n: Long, s1c: Long, s2c2: Long)
  /** One emitted row per flagged event. */
  final case class AnomalyHit(user_id: Long, event_id: Long,
                              value: Double, z: Double)

  /** ONLINE per-user z-score anomaly detection: each arriving event is
    * scored against the user's OWN history so far (z = (x − mean) /
    * sample-sd of the strictly-preceding events) and flagged when
    * |z| > `threshold`; the Welford state then absorbs the event —
    * anomalies pollute future baselines like any real monitor, but a
    * spike cannot mask ITSELF. Scoring starts once `minObs` events
    * precede (small-sample variance is noise). Within a trigger rows
    * score in (ts, event_id) order, so batch mode (empty state store)
    * reproduces the full prefix scan — what the gate's windowed
    * avg/var_samp oracle checks — while StreamingSpec drives the
    * cross-trigger state path.
    *
    * State is three scalars per user — no event retention, no
    * watermark needed for correctness (only as an eviction policy for
    * unbounded key spaces).
    */
  /** z of the current cent value against the EXACT prefix moments,
    * computed with the expression tree the oracle SQL mirrors verbatim:
    * mean = s1/n, var = (s2 − s1·s1/n)/(n−1), z = (c − mean)/sqrt(var).
    * Integer→double casts round identically in any IEEE engine, so the
    * result is bit-equal wherever the inputs are. NaN when var ≤ 0 or
    * n < 2 — callers gate on prefix length and positivity.
    */
  @inline private def prefixZ(c: Long, n: Long, s1c: Long,
      s2c2: Long): Double = {
    val cd = c.toDouble; val s1d = s1c.toDouble; val s2d = s2c2.toDouble
    val varc = (s2d - s1d * s1d / n) / (n - 1)
    (cd - s1d / n) / math.sqrt(varc)
  }

  @inline private def prefixVar(n: Long, s1c: Long, s2c2: Long): Double = {
    val s1d = s1c.toDouble; val s2d = s2c2.toDouble
    (s2d - s1d * s1d / n) / (n - 1)
  }

  /** Portable cent snap — the scalar mirror of Cols.cents and the
    * oracle's `CAST(floor(x * 100 + 0.5) AS BIGINT)`: floor(x·100 +
    * 0.5), round-half-UP computed entirely in IEEE doubles, so it is
    * bit-identical here, in Spark SQL, and in ANY DuckDB version.
    * (r16: replaced the sign-symmetric round-half-away quantization —
    * engine-native round() is a cross-version fault line at exact
    * half-cents, the r15 win_moving_avg driver-gate regression. floor
    * has no tie case. math.floor(x·100 + 0.5) and the engines' floor
    * evaluate the identical double expression.)
    */
  @inline private def toCents(x: Double): Long =
    math.floor(x * 100 + 0.5).toLong

  @inline private def absorb(st: MomentState, c: Long): MomentState =
    // every step is overflow-CHECKED: c*c itself wraps silently for
    // |c| >= ~3.04e9 cents (c = 2^32 squares to exactly 0), so the
    // old `s2c2 <= Long.MaxValue - c2` guard never saw the wrap, and
    // the s1c accumulation was unchecked entirely
    try MomentState(st.n + 1, Math.addExact(st.s1c, c),
      Math.addExact(st.s2c2, Math.multiplyExact(c, c)))
    catch {
      case _: ArithmeticException => throw new IllegalStateException(
        s"prefix moment would overflow long (n=${st.n}, c=$c): widen " +
          "MomentState to Decimal(38,0) for this corpus")
    }

  /** Per-group prefix-moment scan — shared step core for both state
    * APIs. Values quantize to integer cents on entry (the events.value
    * sub-cent convention); the emitted `value` stays the raw double.
    */
  private def welfordStep(threshold: Double, minObs: Long, uid: Long,
                          prev: MomentState,
                          rows: Iterator[(Long, Long, Long, Double)])
      : (MomentState, Seq[AnomalyHit]) = {
    var st = prev
    val hits = Seq.newBuilder[AnomalyHit]
    rows.toSeq.sortBy(r => (r._2, r._3)).foreach {
      case (_, _, eid, x) =>
        val c = toCents(x)
        if (st.n >= minObs && prefixVar(st.n, st.s1c, st.s2c2) > 0) {
          val z = prefixZ(c, st.n, st.s1c, st.s2c2)
          if (math.abs(z) > threshold) hits += AnomalyHit(uid, eid, x, z)
        }
        st = absorb(st, c)
    }
    (st, hits.result())
  }

  private class AnomalyProc(threshold: Double, minObs: Long)
      extends StatefulProcessor[Long, (Long, Long, Long, Double), AnomalyHit] {
    @transient private var st: ValueState[MomentState] = _
    override def init(om: OutputMode, tm: TimeMode): Unit =
      st = StateApi.valueState[MomentState](getHandle, "welford",
        Encoders.product[MomentState], TTLConfig.NONE)
    override def handleInputRows(uid: Long,
                                 rows: Iterator[(Long, Long, Long, Double)],
                                 tv: TimerValues): Iterator[AnomalyHit] = {
      val prev = Option(st.get()).getOrElse(MomentState(0L, 0L, 0L))
      val (next, hits) = welfordStep(threshold, minObs, uid, prev, rows)
      st.update(next)
      hits.iterator
    }
  }

  def anomalies(spark: SparkSession, events: DataFrame,
                threshold: Double = 3.0, minObs: Long = 12): Dataset[AnomalyHit] = {
    import spark.implicits._
    require(minObs >= 2, s"minObs must be >= 2 (got $minObs)")
    // null values AND null event times drop BEFORE the primitive
    // decode (wellFormed contract above): either would throw
    // NOT_NULL_ASSERT_VIOLATION inside .as[(…, Double)]; the oracle
    // mirrors with WHERE ts IS NOT NULL AND value IS NOT NULL
    val keyed = wellFormed(events, "ts", "value")
      .select(col("user_id").cast("long"), unix_micros(col("ts")),
        col("event_id").cast("long"), col("value").cast("double"))
      .as[(Long, Long, Long, Double)]
      .groupByKey(_._1)
    if (StateApi.useTws(spark))
      keyed.transformWithState(new AnomalyProc(threshold, minObs),
        TimeMode.None(), OutputMode.Append(), Encoders.product[AnomalyHit])
    else keyed.flatMapGroupsWithState[MomentState, AnomalyHit](
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (uid: Long, rows: Iterator[(Long, Long, Long, Double)],
       state: GroupState[MomentState]) =>
        val (next, hits) = welfordStep(threshold, minObs, uid,
          state.getOption.getOrElse(MomentState(0L, 0L, 0L)), rows)
        state.update(next)
        hits.iterator
    }
  }

  /** Per-user CUSUM accumulator: the three exact prefix-moment scalars
    * (see [[MomentState]] — integer cent sums since round 12) plus the
    * running one-sided CUSUM statistic and its lifetime stats — SIX
    * scalars per user, no event retention.
    */
  final case class CusumState(n: Long, s1c: Long, s2c2: Long,
                              s: Double, alarms: Long, maxS: Double)
  /** One emitted summary row per user per trigger. */
  final case class CusumUpdate(user_id: Long, n: Long, alarms: Long,
                               max_cusum: Double)

  /** ONLINE per-user CUSUM mean-shift monitor — the sustained-drift
    * detector [[anomalies]]' z-score screen cannot provide (a +1σ
    * shift never trips |z| > 3, but its CUSUM grows without bound):
    * each arriving event standardizes against the user's OWN
    * strictly-preceding history (Welford prefix moments, the
    * [[anomalies]] discipline — a drift cannot mask itself), the
    * statistic folds `s = max(0, s + z − k)`, and `s > h` counts an
    * alarm. Scoring starts once `minObs` events precede. z snaps to
    * 4 decimals before the fold so batch replay and the oracle fold
    * identical doubles. State is six scalars per user; within a
    * trigger rows process in (ts, event_id) order, so batch mode
    * reproduces the full prefix scan the gate oracle replays, while
    * StreamingSpec drives the cross-trigger state path.
    */
  def cusumMonitor(spark: SparkSession, events: DataFrame,
                   k: Double = 0.5, h: Double = 4.0,
                   minObs: Long = 12): Dataset[CusumUpdate] = {
    import spark.implicits._
    require(minObs >= 2, s"minObs must be >= 2 (got $minObs)")
    // null values AND null event times drop BEFORE the primitive
    // decode (wellFormed contract above): either would throw
    // NOT_NULL_ASSERT_VIOLATION inside .as[(…, Double)]; the oracle
    // mirrors with WHERE ts IS NOT NULL AND value IS NOT NULL
    val keyed = wellFormed(events, "ts", "value")
      .select(col("user_id").cast("long"), unix_micros(col("ts")),
        col("event_id").cast("long"), col("value").cast("double"))
      .as[(Long, Long, Long, Double)]
      .groupByKey(_._1)
    if (StateApi.useTws(spark))
      keyed.transformWithState(new CusumProc(k, h, minObs), TimeMode.None(),
        OutputMode.Append(), Encoders.product[CusumUpdate])
    else keyed.flatMapGroupsWithState[CusumState, CusumUpdate](
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (uid: Long, rows: Iterator[(Long, Long, Long, Double)],
       state: GroupState[CusumState]) =>
        val (next, out) = cusumStep(k, h, minObs, uid,
          state.getOption.getOrElse(CusumState(0L, 0L, 0L, 0.0, 0L, 0.0)),
          rows)
        state.update(next)
        Iterator.single(out)
    }
  }

  /** Per-group CUSUM fold — shared step core for both state APIs. */
  private def cusumStep(k: Double, h: Double, minObs: Long, uid: Long,
                        prev: CusumState,
                        rows: Iterator[(Long, Long, Long, Double)])
      : (CusumState, CusumUpdate) = {
    var mom = MomentState(prev.n, prev.s1c, prev.s2c2)
    var s = prev.s; var alarms = prev.alarms; var maxS = prev.maxS
    rows.toSeq.sortBy(r => (r._2, r._3)).foreach {
      case (_, _, _, x) =>
        val c = toCents(x)
        if (mom.n >= minObs && prefixVar(mom.n, mom.s1c, mom.s2c2) > 0) {
          val zRaw = prefixZ(c, mom.n, mom.s1c, mom.s2c2)
          val z = math.floor(zRaw * 1e4 + 0.5) / 1e4
          s = math.max(0.0, s + z - k)
          if (s > h) alarms += 1
          if (s > maxS) maxS = s
        }
        mom = absorb(mom, c)
    }
    (CusumState(mom.n, mom.s1c, mom.s2c2, s, alarms, maxS),
      CusumUpdate(uid, mom.n, alarms, math.floor(maxS * 1e4 + 0.5) / 1e4))
  }

  private class CusumProc(k: Double, h: Double, minObs: Long)
      extends StatefulProcessor[Long, (Long, Long, Long, Double), CusumUpdate] {
    @transient private var st: ValueState[CusumState] = _
    override def init(om: OutputMode, tm: TimeMode): Unit =
      st = StateApi.valueState[CusumState](getHandle, "cusum",
        Encoders.product[CusumState], TTLConfig.NONE)
    override def handleInputRows(uid: Long,
                                 rows: Iterator[(Long, Long, Long, Double)],
                                 tv: TimerValues): Iterator[CusumUpdate] = {
      val prev = Option(st.get())
        .getOrElse(CusumState(0L, 0L, 0L, 0.0, 0L, 0.0))
      val (next, out) = cusumStep(k, h, minObs, uid, prev, rows)
      st.update(next)
      Iterator.single(out)
    }
  }

  /** Custom per-key state via flatMapGroupsWithState: maintains a running
    * (count, sum) per user and emits the updated totals each trigger. In
    * batch mode the state store is empty and this degenerates to a plain
    * per-user aggregate — which is exactly what the DuckDB oracle checks.
    */
  /** Per-group (count, sum) fold — shared step core for both state APIs. */
  private def userStep(prev: UserState, rows: Iterator[(Long, Double)]): UserState = {
    var n = prev.n
    var sum = prev.sum
    rows.foreach { case (_, v) => n += 1; sum += v }
    UserState(n, sum)
  }

  private class RunningUserProc
      extends StatefulProcessor[Long, (Long, Double), UserUpdate] {
    @transient private var st: ValueState[UserState] = _
    override def init(om: OutputMode, tm: TimeMode): Unit =
      st = StateApi.valueState[UserState](getHandle, "totals",
        Encoders.product[UserState], TTLConfig.NONE)
    override def handleInputRows(uid: Long, rows: Iterator[(Long, Double)],
                                 tv: TimerValues): Iterator[UserUpdate] = {
      val next = userStep(Option(st.get()).getOrElse(UserState(0L, 0.0)), rows)
      st.update(next)
      Iterator(UserUpdate(uid, next.n, math.rint(next.sum * 100) / 100))
    }
  }

  def runningUserState(spark: SparkSession, events: DataFrame): Dataset[UserUpdate] = {
    import spark.implicits._
    // the state folds `value` — a null would NOT_NULL-throw in the
    // primitive tuple decode (wellFormed contract above); oracle
    // mirrors with WHERE value IS NOT NULL
    val keyed = wellFormed(events, "value")
      .select(col("user_id").cast("long"), col("value").cast("double"))
      .as[(Long, Double)]
      .groupByKey(_._1)
    if (StateApi.useTws(spark))
      keyed.transformWithState(new RunningUserProc, TimeMode.None(),
        OutputMode.Update(), Encoders.product[UserUpdate])
    else keyed.flatMapGroupsWithState[UserState, UserUpdate](
      OutputMode.Update, GroupStateTimeout.NoTimeout) {
      (uid: Long, rows: Iterator[(Long, Double)], state: GroupState[UserState]) =>
        val next = userStep(state.getOption.getOrElse(UserState(0L, 0.0)), rows)
        state.update(next)
        Iterator(UserUpdate(uid, next.n, math.rint(next.sum * 100) / 100))
    }
  }

  /** Last touch carried per user: when it happened and what it was.
    * `channel` is null until the first view/click arrives — THREE
    * scalars per user, no event retention.
    */
  final case class TouchState(tsu: Long, eventId: Long, channel: String)
  /** One emitted row per purchase, credited to the latest prior touch. */
  final case class AttributedPurchase(user_id: Long, event_id: Long,
                                      channel: String, cents: Long)

  /** ONLINE last-touch attribution (the incremental twin of StreamQ's
    * `funnel_attrib` aggregate): per-user state carries the most recent
    * view/click; each arriving purchase emits one attributed row
    * ('direct' when no touch has been seen). Within a trigger the
    * group's rows sort by (ts, event_id), so batch-mode execution (all
    * rows in one group) reproduces the as-of window semantics exactly —
    * what the gate's oracle checks. Across triggers the attribution is
    * online: a touch arriving AFTER its purchase's trigger cannot
    * retroactively re-credit it, and a LATE touch older than the
    * carried one is ignored rather than allowed to roll the state
    * backwards (the same latency/exactness trade as the streaming
    * funnel — replay through the batch aggregate for the exact
    * answer). Null purchase values attribute 0 cents: revenue
    * accounting skips them either way, but the PURCHASE COUNT must not
    * silently drop rows the batch twin counts.
    *
    * Memory bound: the carried STATE is three scalars, but each
    * trigger buffers and sorts the group's rows delivered IN THAT
    * TRIGGER (`rows.toSeq.sortBy` — the per-trigger sort that makes
    * intra-batch ordering deterministic; same convention as the other
    * stateful steps above). Per-key executor memory is therefore
    * O(rows per user per trigger) — in the batch-replay gate, where a
    * user's whole history is one "trigger", that is O(events per
    * user); in a real stream it is one micro-batch's worth.
    */
  private def attribStep(prev: TouchState,
      rows: Iterator[(Long, Long, Long, String, Long)])
      : (TouchState, Seq[AttributedPurchase]) = {
    var st = prev
    val out = Seq.newBuilder[AttributedPurchase]
    rows.toSeq.sortBy(r => (r._2, r._3)).foreach { case (uid, t, e, tpe, c) =>
      if (tpe == "purchase")
        out += AttributedPurchase(uid, e,
          if (st.channel == null) "direct" else st.channel, c)
      // LAST-touch only: a LATE touch (arriving a trigger after a newer
      // one already took the slot) must not roll the carried touch
      // backwards and mis-credit every later purchase — within one
      // trigger the sort makes this guard a no-op, across triggers it
      // is load-bearing (the state stores (tsu, eventId) exactly for
      // this comparison)
      else if (t > st.tsu || (t == st.tsu && e > st.eventId))
        st = TouchState(t, e, tpe)
    }
    (st, out.result())
  }

  private class AttribProc
      extends StatefulProcessor[Long, (Long, Long, Long, String, Long), AttributedPurchase] {
    @transient private var st: ValueState[TouchState] = _
    override def init(om: OutputMode, tm: TimeMode): Unit =
      st = StateApi.valueState[TouchState](getHandle, "touch",
        Encoders.product[TouchState], TTLConfig.NONE)
    override def handleInputRows(uid: Long,
        rows: Iterator[(Long, Long, Long, String, Long)],
        tv: TimerValues): Iterator[AttributedPurchase] = {
      val (next, hits) = attribStep(
        Option(st.get()).getOrElse(TouchState(Long.MinValue, 0L, null)), rows)
      st.update(next)
      hits.iterator
    }
  }

  def lastTouchAttribution(spark: SparkSession,
                           events: DataFrame): Dataset[AttributedPurchase] = {
    import spark.implicits._
    // ts folds into the as-of ordering state (null would NOT_NULL-
    // throw in unix_micros' tuple decode); null value stays — it
    // attributes 0 cents per the contract above. isin() drops null
    // event_type natively.
    val keyed = wellFormed(events, "ts")
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id").cast("long"), unix_micros(col("ts")),
        col("event_id").cast("long"), col("event_type"),
        coalesce(graft.functions.Cols.cents(col("value")), lit(0L)))
      .as[(Long, Long, Long, String, Long)]
      .groupByKey(_._1)
    if (StateApi.useTws(spark))
      keyed.transformWithState(new AttribProc, TimeMode.None(),
        OutputMode.Append(), Encoders.product[AttributedPurchase])
    else keyed.flatMapGroupsWithState[TouchState, AttributedPurchase](
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (uid: Long, rows: Iterator[(Long, Long, Long, String, Long)],
       state: GroupState[TouchState]) =>
        val (next, hits) = attribStep(
          state.getOption.getOrElse(TouchState(Long.MinValue, 0L, null)),
          rows)
        state.update(next)
        hits.iterator
    }
  }
}
