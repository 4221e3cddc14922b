package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.Cols

/** Relational operator surface (SURVEY.md §2.2–2.6 + [EXT] rows) over the
  * driver's TPC-H-ish tables. Scale notes per query are in the Scaladoc:
  * the dimension side of every join is explicitly broadcast, aggregates
  * rely on partial (map-side) aggregation, and no query collects data to
  * the driver.
  */
object Relational {

  /** Auto-planner statistics cached per (session, corpus) — r14. The
    * grid width (join_overlap) and the radius plan (join_spatial) are
    * pure functions of STATIC corpus statistics, so their stats
    * aggregates are pure fixed cost on every repeat call (r13 ran them
    * per call — most of join_overlap's 0.34→0.66 s and join_spatial's
    * 0.41→0.56 s gate-SF regressions). Same fit-once ModelCache
    * discipline as the ANN indexes: static instances, session-identity
    * validated, purged with the stage directories.
    */
  private val overlapWidthCache = new TextQ.ModelCache[Long](4)
  private val radiusPlanCache =
    new TextQ.ModelCache[graft.operators.Spatial.RadiusPlan](4)

  val all: Seq[Q] = Seq(

    // ---- aggregations -------------------------------------------------

    // agg_group [EXT]: hash aggregate, multiple measures; TPC-H Q1 shape.
    // Map-side partial agg → 6-group final agg: shuffle carries only
    // per-partition partials regardless of input size. Money sums are
    // exact integer cents (Cols.sumCents): per-cell summand counts here
    // scale with the corpus, and a reassociated double sum diverges
    // across engines past the round boundary (30× sweep). sum_qty/
    // avg_qty stay plain: quantities are integer-valued, so their
    // double sum is order-free exact at any scale.
    Q("q1_agg",
      (s, d) => t(s, d, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          Cols.sumCents(col("l_extendedprice")).as("sum_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          min("l_quantity").as("min_qty"),
          max("l_quantity").as("max_qty"),
          count(lit(1)).as("n")),
      Some("""SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity), 2) AS sum_qty,
             sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) / 100.0 AS sum_price,
             round(avg(l_quantity), 4) AS avg_qty,
             min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
             count(*) AS n
             FROM lineitem GROUP BY l_returnflag, l_linestatus""")),

    // agg_count: total row count (`assess_changes.qmd:145-147`).
    Q("agg_count",
      (s, d) => t(s, d, "lineitem").agg(count(lit(1)).as("n_lineitem")),
      Some("SELECT count(*) AS n_lineitem FROM lineitem")),

    // agg_ndistinct: exact distinct cardinalities
    // (`assess_changes.qmd:332-333,345-346`).
    Q("agg_ndistinct",
      (s, d) => t(s, d, "lineitem").agg(
        countDistinct(col("l_partkey")).as("nd_part"),
        countDistinct(col("l_suppkey")).as("nd_supp"),
        countDistinct(col("l_orderkey")).as("nd_order")),
      Some("""SELECT count(DISTINCT l_partkey) AS nd_part,
             count(DISTINCT l_suppkey) AS nd_supp,
             count(DISTINCT l_orderkey) AS nd_order FROM lineitem""")),

    // agg_approx_distinct: HLL sketch — the 100 TB-scale variant of
    // agg_ndistinct (single pass, constant memory, no exact-distinct
    // shuffle explosion). DuckDB cannot replay Spark's HLL, so the gate
    // is an ERROR-BOUND assertion instead of a golden: the query emits
    // the exact cardinalities (independently recomputed by the oracle)
    // plus booleans asserting the sketch landed within 5% of exact
    // (2.5× the requested 2% rsd) — a sketch regression flips a boolean
    // and hash-mismatches. The exact side exists only to audit the
    // sketch at gate SF; the 100 TB path is the sketch alone.
    Q("agg_approx_distinct",
      (s, d) => t(s, d, "lineitem").agg(
          approx_count_distinct(col("l_partkey"), 0.02).as("ap"),
          approx_count_distinct(col("l_orderkey"), 0.02).as("ao"),
          countDistinct(col("l_partkey")).as("nd_part"),
          countDistinct(col("l_orderkey")).as("nd_order"))
        .select(col("nd_part"), col("nd_order"),
          (abs(col("ap") - col("nd_part")) / col("nd_part") <= 0.05)
            .as("part_ok"),
          (abs(col("ao") - col("nd_order")) / col("nd_order") <= 0.05)
            .as("order_ok")),
      Some("""SELECT count(DISTINCT l_partkey) AS nd_part,
             count(DISTINCT l_orderkey) AS nd_order,
             true AS part_ok, true AS order_ok FROM lineitem""")),

    // agg_bool_any: boolean aggregate gates (`assess_changes.qmd:215,226`).
    Q("agg_bool_any",
      (s, d) => t(s, d, "lineitem").groupBy("l_returnflag").agg(
        bool_or(col("l_discount") > 0.05).as("any_disc"),
        bool_and(col("l_quantity") > 0).as("all_pos")),
      Some("""SELECT l_returnflag, bool_or(l_discount > 0.05) AS any_disc,
             bool_and(l_quantity > 0) AS all_pos
             FROM lineitem GROUP BY l_returnflag""")),

    // agg_rollup [EXT]: hierarchical totals (region → nation → grand).
    Q("agg_rollup",
      (s, d) => {
        t(s, d, "customer").createOrReplaceTempView("v_customer")
        t(s, d, "nation").createOrReplaceTempView("v_nation")
        t(s, d, "region").createOrReplaceTempView("v_region")
        s.sql("""SELECT /*+ BROADCAST(v_nation, v_region) */
                r_name, n_name, count(*) AS n_cust,
                sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) / 100.0D AS sum_bal
                FROM v_customer
                JOIN v_nation ON c_nationkey = n_nationkey
                JOIN v_region ON n_regionkey = r_regionkey
                GROUP BY ROLLUP(r_name, n_name)""")
      },
      Some("""SELECT r_name, n_name, count(*) AS n_cust,
             sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) / 100.0 AS sum_bal
             FROM customer
             JOIN nation ON c_nationkey = n_nationkey
             JOIN region ON n_regionkey = r_regionkey
             GROUP BY ROLLUP(r_name, n_name)""")),

    // agg_grouping_sets [EXT, new r8]: explicit GROUPING SETS — the
    // general form behind rollup/cube, for when the report needs a
    // HAND-PICKED set of aggregation levels ((flag,status), (flag),
    // grand) rather than a full lattice. Plans as ONE Expand over one
    // scan (the agg_cube PlanSpec shape), not per-set rescans;
    // grouping_id() disambiguates levels where the group key is NULL
    // vs null-as-data. Integer sums only — nothing to drift.
    Q("agg_grouping_sets",
      (s, d) => {
        t(s, d, "lineitem").createOrReplaceTempView("v_li_gs")
        s.sql("""SELECT l_returnflag, l_linestatus,
                CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT)
                  AS gid,
                count(*) AS n,
                CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
                FROM v_li_gs
                GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                  (l_returnflag), ())""")
      },
      Some("""SELECT l_returnflag, l_linestatus,
             CAST(grouping(l_returnflag, l_linestatus) AS BIGINT) AS gid,
             count(*) AS n,
             sum(l_quantity::BIGINT)::BIGINT AS sum_qty
             FROM lineitem
             GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
               (l_returnflag), ())""")),

    // win_moving_avg [EXT]: a RANGE frame over event time — the moving
    // average "everything in the last hour" shape. RANGE frames bound
    // by VALUE, not row count (ties and gaps behave differently from
    // ROWS); computed over epoch seconds so both engines frame
    // identically at integer precision.
    Q("win_moving_avg",
      (s, d) => {
        t(s, d, "events").createOrReplaceTempView("v_events")
        // r15 (null x skew sweep): avg() folds doubles in frame order —
        // over a skew-folded hot user's 30x-longer RANGE frames the two
        // engines' summation orders drift past the 4-decimal rounding.
        // The standing integer-cent discipline applies: sum exact cent
        // LONGs over the frame, divide once (count of NON-NULL values,
        // the avg denominator) — bit-identical cross-engine.
        // r16 driver red (local bit-green, reports/ORACLEENV_r16.md):
        // the two remaining driver-environment fault lines are duckdb's
        // epoch() convention and driver float-hash normalization of the
        // DOUBLE output. r17 removes both: (a) the oracle order key is
        // epoch(date_trunc('second', ts)) — integral seconds, so no
        // floor-vs-round epoch convention can shift a RANGE frame;
        // (b) avg_1h_e4 is emitted as BIGINT ten-thousandths (the
        // floor-snap result is integral; no DOUBLE is hashed at all).
        s.sql("""SELECT event_id, user_id,
                CAST(floor(CAST(sum(c) OVER w AS DOUBLE) / 100.0
                  / CAST(count(value) OVER w AS DOUBLE)
                  * 10000.0 + 0.5) AS LONG) AS avg_1h_e4,
                count(*) OVER w AS n_1h
                FROM (SELECT event_id, user_id, value,
                  CAST(floor(value * 100 + 0.5) AS LONG) AS c,
                  CAST(ts AS LONG) AS es FROM v_events
                  WHERE ts IS NOT NULL)
                WINDOW w AS (PARTITION BY user_id ORDER BY es
                  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)""")
      },
      Some("""SELECT event_id, user_id,
             CAST(floor(CAST(sum(c) OVER w AS DOUBLE) / 100.0
               / CAST(count(value) OVER w AS DOUBLE)
               * 10000.0 + 0.5) AS BIGINT) AS avg_1h_e4,
             count(*) OVER w AS n_1h
             FROM (SELECT event_id, user_id, value,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS c,
               -- integral-second epoch: date_trunc zeroes the fraction
               -- BEFORE epoch(), so the BIGINT cast is exact under any
               -- duckdb epoch()/cast rounding convention; matches
               -- Spark's flooring CAST(ts AS LONG) for sub-second ts
               CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS es
               FROM events
               -- r15: a RANGE-by-time frame needs a non-null order key
               WHERE ts IS NOT NULL)
             WINDOW w AS (PARTITION BY user_id ORDER BY es
               RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)""")),

    // join_lateral [EXT]: correlated LATERAL subquery — per customer,
    // their two most expensive orders. Catalyst decorrelates the
    // lateral into a ranked join (no per-row re-execution); DuckDB runs
    // the same ANSI shape.
    Q("join_lateral",
      (s, d) => {
        t(s, d, "customer").createOrReplaceTempView("v_customer")
        t(s, d, "orders").createOrReplaceTempView("v_orders")
        s.sql("""SELECT c_custkey, t.o_orderkey, t.o_totalprice
                FROM v_customer,
                LATERAL (SELECT o_orderkey, o_totalprice FROM v_orders
                         WHERE o_custkey = c_custkey
                         ORDER BY o_totalprice DESC, o_orderkey
                         LIMIT 2) t""")
      },
      Some("""SELECT c_custkey, t.o_orderkey, t.o_totalprice
             FROM customer,
             LATERAL (SELECT o_orderkey, o_totalprice FROM orders
                      WHERE o_custkey = c_custkey
                      ORDER BY o_totalprice DESC, o_orderkey
                      LIMIT 2) t""")),

    // win_distribution [EXT]: the distribution-function window family
    // (percent_rank / cume_dist / ntile) over a deterministic total
    // order — identical definitions in Spark and DuckDB, ties broken
    // by key so both engines see one order.
    Q("win_distribution",
      (s, d) => {
        t(s, d, "customer").createOrReplaceTempView("v_customer")
        s.sql("""SELECT c_custkey,
                round(percent_rank() OVER w, 6) AS pr,
                round(cume_dist() OVER w, 6) AS cd,
                ntile(10) OVER w AS decile
                FROM v_customer
                WINDOW w AS (PARTITION BY c_mktsegment
                  ORDER BY c_acctbal NULLS LAST, c_custkey)""")
      },
      Some("""SELECT c_custkey,
             round(percent_rank() OVER w, 6) AS pr,
             round(cume_dist() OVER w, 6) AS cd,
             ntile(10) OVER w AS decile
             FROM customer
             -- r15: a ranking over a NULLABLE key must PIN null
             -- placement — Spark ASC defaults nulls-first, DuckDB
             -- nulls-last, so the bare ORDER BY diverges the ranks
             WINDOW w AS (PARTITION BY c_mktsegment
               ORDER BY c_acctbal NULLS LAST, c_custkey)""")),

    // agg_corr [EXT]: the covariance/correlation aggregate family over
    // a grouped frame — single-pass partially-aggregatable moments on
    // both engines; rounded to 4 decimals (the moment sums agree far
    // below that).
    Q("agg_corr",
      (s, d) => t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(round(corr(col("l_quantity"), col("l_extendedprice")), 4)
            .as("corr_qp"),
          round(covar_samp(col("l_quantity"), col("l_discount")), 4)
            .as("cov_qd"),
          round(stddev_samp(col("l_quantity")), 4).as("sd_q")),
      Some("""SELECT l_returnflag,
             round(corr(l_quantity, l_extendedprice), 4) AS corr_qp,
             round(covar_samp(l_quantity, l_discount), 4) AS cov_qd,
             round(stddev_samp(l_quantity), 4) AS sd_q
             FROM lineitem GROUP BY l_returnflag""")),

    // agg_skew_kurt [EXT, new r7]: higher distribution moments per
    // group — population skewness and excess kurtosis from raw moment
    // sums (s1..s4), the shape screen that catches what mean/stddev
    // miss (lopsided or heavy-tailed quantity distributions). The
    // moment formulas are written TEXTUALLY PARALLEL in both engines;
    // sum-order float noise (~1e-12) is absorbed by the repo's
    // 4-decimal rounding, the agg_corr convention.
    Q("agg_skew_kurt",
      (s, d) => {
        val x = col("l_quantity").cast("double")
        t(s, d, "lineitem")
          .groupBy("l_returnflag")
          .agg(count(lit(1)).cast("double").as("n"),
            sum(x).as("s1"), sum(x * x).as("s2"),
            sum(x * x * x).as("s3"), sum(x * x * x * x).as("s4"))
          .select(col("l_returnflag"), col("n").cast("long").as("n"), {
            val m = col("s1") / col("n")
            val v = col("s2") / col("n") - m * m
            val sk = (col("s3") / col("n") - lit(3.0) * m * (col("s2") / col("n")) +
              lit(2.0) * m * m * m) / pow(v, 1.5)
            round(sk, 4).as("skew")
          }, {
            val m = col("s1") / col("n")
            val v = col("s2") / col("n") - m * m
            val ku = (col("s4") / col("n") - lit(4.0) * m * (col("s3") / col("n")) +
              lit(6.0) * m * m * (col("s2") / col("n")) -
              lit(3.0) * m * m * m * m) / (v * v) - lit(3.0)
            round(ku, 4).as("kurt")
          })
      },
      Some("""WITH a AS (SELECT l_returnflag,
             |    count(*)::DOUBLE AS n, sum(l_quantity) AS s1,
             |    sum(l_quantity * l_quantity) AS s2,
             |    sum(l_quantity * l_quantity * l_quantity) AS s3,
             |    sum(l_quantity * l_quantity * l_quantity * l_quantity)
             |      AS s4
             |  FROM lineitem GROUP BY 1)
             |SELECT l_returnflag, n::BIGINT AS n,
             |  round((s3 / n - 3.0 * (s1 / n) * (s2 / n) +
             |    2.0 * (s1 / n) * (s1 / n) * (s1 / n)) /
             |    pow(s2 / n - (s1 / n) * (s1 / n), 1.5), 4) AS skew,
             |  round((s4 / n - 4.0 * (s1 / n) * (s3 / n) +
             |    6.0 * (s1 / n) * (s1 / n) * (s2 / n) -
             |    3.0 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n)) /
             |    ((s2 / n - (s1 / n) * (s1 / n)) *
             |     (s2 / n - (s1 / n) * (s1 / n))) - 3.0, 4) AS kurt
             |FROM a""".stripMargin)),

    // agg_mode [EXT, new r7]: exact per-group MODE with a
    // deterministic tie-break — each supplier's most-shipped part
    // (highest line count; smallest partkey on ties). Two map-side-
    // combinable exchanges: (supplier, part) counts, then one min_by
    // over the (−count, partkey) struct order per supplier — no
    // window, constant-size partials, the at-scale argmax shape.
    Q("agg_mode",
      (s, d) => t(s, d, "lineitem")
        .groupBy(col("l_suppkey"), col("l_partkey"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("l_suppkey"))
        .agg(min_by(struct(col("l_partkey"), col("c")),
          struct((-col("c")).as("nc"), col("l_partkey"))).as("m"))
        .select(col("l_suppkey"), col("m.l_partkey").as("mode_part"),
          col("m.c").as("cnt")),
      Some("""WITH c AS (SELECT l_suppkey, l_partkey,
             |    count(*)::BIGINT AS c
             |  FROM lineitem GROUP BY 1, 2)
             |SELECT l_suppkey, l_partkey AS mode_part, c AS cnt FROM c
             |QUALIFY row_number() OVER (PARTITION BY l_suppkey
             |  ORDER BY c DESC, l_partkey) = 1""".stripMargin)),

    // agg_cube [EXT]: all grouping-set combinations (status × priority
    // marginals + grand total) in one pass — Spark expands the sets
    // inside a single Expand + aggregate, no per-set rescan.
    Q("agg_cube",
      (s, d) => {
        t(s, d, "orders").createOrReplaceTempView("v_orders")
        s.sql("""SELECT o_orderstatus, o_orderpriority,
                count(*) AS n_ord,
                sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) / 100.0D AS sum_price
                FROM v_orders
                GROUP BY CUBE(o_orderstatus, o_orderpriority)""")
      },
      Some("""SELECT o_orderstatus, o_orderpriority,
             count(*) AS n_ord,
             sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) / 100.0 AS sum_price
             FROM orders
             GROUP BY CUBE(o_orderstatus, o_orderpriority)""")),

    // agg_distinct_col: distinct projection (`assess_changes.qmd:335-338`).
    Q("agg_distinct_col",
      (s, d) => t(s, d, "customer").select(col("c_mktsegment").as("segment"))
        .distinct(),
      Some("SELECT DISTINCT c_mktsegment AS segment FROM customer")),

    // ---- joins --------------------------------------------------------

    // join_equi [EXT]: star join; both dims broadcast (no shuffle of the
    // fact side beyond the final 25-group aggregate).
    Q("join_equi",
      (s, d) => t(s, d, "orders")
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(Cols.sumCents(col("o_totalprice")).as("revenue"),
          count(lit(1)).as("n_orders")),
      Some("""SELECT n_name,
             sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) / 100.0 AS revenue,
             count(*) AS n_orders
             FROM orders JOIN customer ON o_custkey = c_custkey
             JOIN nation ON c_nationkey = n_nationkey
             GROUP BY n_name""")),

    // join_semi [EXT]: existence filter (`assess_changes.qmd:118` row form).
    Q("join_semi",
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"),
          "left_semi")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n_active")),
      Some("""SELECT c_mktsegment, count(*) AS n_active FROM customer
             WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             GROUP BY c_mktsegment""")),

    // join_anti: set-difference formulation (`assess_changes.qmd:335-338`).
    // Anti-joins against URGENT orders only — every customer has *some*
    // order in this data, so the unfiltered anti-join would be a trivially
    // empty vector; this one returns ~200 customers per sf0.01.
    Q("join_anti",
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "orders")
            .filter(col("o_orderpriority").startsWith("1")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n_inactive")),
      Some("""SELECT c_mktsegment, count(*) AS n_inactive FROM customer
             WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
               AND o_orderpriority LIKE '1%')
             GROUP BY c_mktsegment""")),

    // join_range [EXT]: interval self-join — per user, pair each event
    // with follow-up events inside a 5-minute window. Equi on user_id
    // (shuffle key), the range predicate is a cheap post-join filter, so
    // the plan is a plain shuffled hash join that scales with the key
    // cardinality. Timestamps pass through millisecond truncation
    // (events.ts is ns; Spark reads µs) so both engines compare
    // identical instants. Returns ~80 rows per sf0.01 (previously a
    // trivially-empty vector: events are 2024, orders 1995-2001).
    Q("join_range",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("user_id"), col("event_id"),
            Cols.toMillis(col("ts")).as("ts_ms"), col("value"),
            col("event_type"))
        val a = ev.select(col("user_id"), col("event_id").as("a_id"),
          col("ts_ms").as("a_ts"), col("event_type"))
        val b = ev.select(col("user_id").as("b_user"),
          col("event_id").as("b_id"), col("ts_ms").as("b_ts"),
          col("value").as("b_value"))
        a.join(b,
          col("user_id") === col("b_user") &&
            col("b_ts") > col("a_ts") &&
            col("b_ts") <= col("a_ts") + expr("INTERVAL 5 MINUTES"))
          .groupBy("event_type")
          // events.value has sub-cent precision, so sumCents is a real
          // per-value quantization here: the query's DEFINED result is
          // the sum of cent-rounded values (both engines quantize the
          // same multiset) — not round(sum(raw), 2). See Cols.sumCents.
          .agg(count(lit(1)).as("n"),
            Cols.sumCents(col("b_value")).as("sum_v"))
      },
      Some("""SELECT a.event_type, count(*) AS n,
             sum(CAST(floor(b.value * 100 + 0.5) AS BIGINT)) / 100.0 AS sum_v
             FROM (SELECT user_id, event_id,
                   date_trunc('millisecond', ts) AS ts, event_type
                   FROM events) a
             JOIN (SELECT user_id, event_id,
                   date_trunc('millisecond', ts) AS ts, value
                   FROM events) b
               ON a.user_id = b.user_id
               AND b.ts > a.ts
               AND b.ts <= a.ts + INTERVAL 5 MINUTE
             GROUP BY a.event_type""")),

    // join_overlap [EXT]: interval-overlap join with NO equi key —
    // order-date spans (length keyed off the order key) from two
    // disjoint key sets, joined where the spans intersect. Spark side
    // runs the grid-cell algorithm (explode into 16-day cells,
    // cell-equi join, emit once in the first shared cell — see
    // operators/IntervalJoin.scala); the oracle runs the plain
    // quadratic overlap predicate, a genuinely different algorithm.
    // The a side subsamples to keys %100==0 to keep the pair count
    // bench-sized at every SF.
    Q("join_overlap",
      (s, d) => {
        val o = t(s, d, "orders").filter(col("o_orderdate").isNotNull)
          .withColumn("day", datediff(to_date(col("o_orderdate")),
            to_date(lit("1995-01-01"))).cast("long"))
        val a = o.filter(col("o_orderkey") % 100 === 0)
          .select(col("o_orderstatus").as("a_st"), col("day").as("a_lo"),
            (col("day") + col("o_orderkey") % 20).as("a_hi"))
        val b = o.filter(col("o_orderkey") % 2 === 1)
          .select(col("o_orderstatus").as("b_st"),
            col("o_totalprice").as("b_price"), col("day").as("b_lo"),
            (col("day") + col("o_orderkey") % 15).as("b_hi"))
        // sum_p accumulates as exact integer CENTS (order-free long
        // sum) with ONE final IEEE division — a double sum over the
        // ~37M pairs of the 10x corpus drifts past the round(2)
        // boundary between engines (the r10 sweep caught +0.54 at
        // 10^12 magnitude); the 1x gate never saw it
        // r13: width from IntervalJoin.autoCellWidth — the a side's
        // spans are length-0 here (keys %100==0 make o_orderkey%20
        // vanish), so the model picks ~sqrt(1*Lb) ≈ 3, not the old
        // fixed 16: fewer candidate tests per cell at slightly more
        // cells per b-interval (sweep data in reports/SWEEP_CELLW_r14.md)
        // r14: the width is cached per (session, corpus) — the two
        // stats aggregates run once, not per call
        val w = overlapWidthCache.getOrFit(s, d,
          graft.operators.IntervalJoin.autoCellWidth(
            a, b, "a_lo", "a_hi", "b_lo", "b_hi"))
        graft.operators.IntervalJoin.overlap(
            a, b, "a_lo", "a_hi", "b_lo", "b_hi", w)
          .groupBy("a_st", "b_st")
          .agg(count(lit(1)).as("n"),
            (sum(round(col("b_price") * 100).cast("long")) / 100.0)
              .as("sum_p"))
      },
      Some("""WITH o AS (SELECT o_orderkey, o_orderstatus, o_totalprice,
             |    date_diff('day', DATE '1995-01-01',
             |      o_orderdate)::BIGINT AS day
             |  FROM orders WHERE o_orderdate IS NOT NULL),
             |a AS (SELECT o_orderstatus AS a_st, day AS a_lo,
             |    day + o_orderkey % 20 AS a_hi FROM o
             |  WHERE o_orderkey % 100 = 0),
             |b AS (SELECT o_orderstatus AS b_st, o_totalprice AS b_price,
             |    day AS b_lo, day + o_orderkey % 15 AS b_hi FROM o
             |  WHERE o_orderkey % 2 = 1)
             |SELECT a_st, b_st, count(*)::BIGINT AS n,
             |  sum(CAST(floor(b_price * 100 + 0.5) AS BIGINT)) / 100.0 AS sum_p
             |FROM a JOIN b ON a_lo <= b_hi AND b_lo <= a_hi
             |GROUP BY 1, 2""".stripMargin)),

    // join_spatial [EXT]: radius join between two point sets with NO
    // cross product — customers and suppliers get deterministic
    // content-hash coordinates in [0,100)², then pair within distance
    // 5. Spark runs the r×r grid-cell algorithm (supplier side — the
    // small one — replicates into its 3×3 neighborhood, cell-equi
    // join, exact distance filter; operators/Spatial.scala); the
    // oracle runs the plain quadratic distance predicate, a genuinely
    // different algorithm. Coordinates are exact double quotients of
    // the md5-low-60 portable hash, so dx²+dy² and min() are
    // bit-identical cross-engine; sqrt is IEEE-correctly-rounded.
    Q("join_spatial",
      (s, d) => {
        import graft.operators.Sampling.contentHash
        def coord(c: org.apache.spark.sql.Column, seed: Long) =
          pmod(contentHash(c, seed, portable = true), lit(1000000L))
            .cast("double") / 10000.0
        val cust = t(s, d, "customer").select(col("c_custkey"),
          coord(col("c_custkey"), 7).as("cx"),
          coord(col("c_custkey"), 8).as("cy"))
        val supp = t(s, d, "supplier").select(col("s_suppkey"),
          coord(col("s_suppkey"), 9).as("sx"),
          coord(col("s_suppkey"), 10).as("sy"))
        // r13: auto plan — replicates whichever side is smaller
        // (supplier, 10x fewer rows) and moves to r/2 sub-cells only
        // past the per-cell density bound. r14: the plan is cached per
        // (session, corpus) — the two box aggregates run once
        val plan = radiusPlanCache.getOrFit(s, d,
          graft.operators.Spatial.radiusPlan(
            cust, supp, "cx", "cy", "sx", "sy", r = 5.0))
        graft.operators.Spatial.radiusJoinPlanned(
            cust, supp, "cx", "cy", "sx", "sy", r = 5.0, plan)
          .groupBy("c_custkey")
          .agg(count(lit(1)).as("n_near"),
            round(sqrt(min((col("cx") - col("sx")) * (col("cx") - col("sx"))
              + (col("cy") - col("sy")) * (col("cy") - col("sy")))), 6)
              .as("min_d"))
      },
      Some("""WITH cust AS (SELECT c_custkey,
             |    (('0x' || substr(md5(c_custkey::VARCHAR || ':7'), 1, 15))
             |      ::BIGINT % 1000000)::DOUBLE / 10000.0 AS cx,
             |    (('0x' || substr(md5(c_custkey::VARCHAR || ':8'), 1, 15))
             |      ::BIGINT % 1000000)::DOUBLE / 10000.0 AS cy
             |  FROM customer),
             |supp AS (SELECT s_suppkey,
             |    (('0x' || substr(md5(s_suppkey::VARCHAR || ':9'), 1, 15))
             |      ::BIGINT % 1000000)::DOUBLE / 10000.0 AS sx,
             |    (('0x' || substr(md5(s_suppkey::VARCHAR || ':10'), 1, 15))
             |      ::BIGINT % 1000000)::DOUBLE / 10000.0 AS sy
             |  FROM supplier)
             |SELECT c_custkey, count(*)::BIGINT AS n_near,
             |  round(sqrt(min((cx - sx) * (cx - sx)
             |    + (cy - sy) * (cy - sy))), 6) AS min_d
             |FROM cust JOIN supp
             |  ON (cx - sx) * (cx - sx) + (cy - sy) * (cy - sy) <= 25.0
             |GROUP BY 1""".stripMargin)),

    // join_bucketed [EXT]: the write-once-shuffle-never pattern for a
    // fact table joined on the same key every run — both sides bucketed
    // by custkey at write time (paying the shuffle once), the join then
    // plans SortMergeJoin straight over bucket files with zero Exchange
    // (asserted in PlanSpec/BucketingSpec). Result must equal the plain
    // join, which is what the oracle checks.
    Q("join_bucketed",
      (s, d) => {
        graft.operators.Bucketing.writeBucketed(
          t(s, d, "orders").select("o_custkey", "o_totalprice"),
          "g_bkt_orders", "o_custkey", buckets = 8)
        graft.operators.Bucketing.writeBucketed(
          t(s, d, "customer").select(col("c_custkey").as("o_custkey"),
            col("c_mktsegment")),
          "g_bkt_customer", "o_custkey", buckets = 8)
        graft.operators.Bucketing.colocatedJoin(s, "g_bkt_orders",
          "g_bkt_customer", "o_custkey")
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n"),
            Cols.sumCents(col("o_totalprice")).as("revenue"))
      },
      Some("""SELECT c_mktsegment, count(*) AS n,
             sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) / 100.0 AS revenue
             FROM orders JOIN customer ON o_custkey = c_custkey
             GROUP BY c_mktsegment""")),

    // join_asof [EXT]: as-of join — each event picks up the most recent
    // checkpoint (every-97th event, acting as a per-user rate table) with
    // checkpoint.ts <= event.ts. Implemented union+window (ONE shuffle of
    // the merged per-user timeline, no range-join blowup); the oracle is
    // DuckDB's native ASOF LEFT JOIN, so the semantics are pinned against
    // an independent implementation.
    Q("join_asof",
      (s, d) => {
        val ev = t(s, d, "events").select(col("event_id"), col("user_id"),
          Cols.toMillis(col("ts")).as("ts"), col("value"))
        val cp = ev.filter(col("event_id") % 97 === 0)
          .select(col("user_id"), col("ts"), col("value").as("rate"))
        graft.operators.AsofJoin.asofJoin(
          ev.select("event_id", "user_id", "ts"), cp,
          keyCols = Seq("user_id"), timeCol = "ts", payload = Seq("rate"))
          .select(col("event_id"), col("user_id"),
            round(col("rate"), 2).as("rate"))
      },
      Some("""WITH e AS (SELECT event_id, user_id,
               date_trunc('millisecond', ts) AS ts, value FROM events),
             cp AS (SELECT user_id, ts, value AS rate FROM e
               WHERE event_id % 97 = 0 AND ts IS NOT NULL)
             -- r15 null contract: an event with no time has NO as-of
             -- match (DuckDB's ASOF would sort a NULL probe LAST and
             -- hand it the NEWEST rate — the sorted-merge artifact,
             -- not the predicate's three-valued semantics); null-ts
             -- probes union back as explicit no-match rows, and
             -- null-ts checkpoints can never be "latest" (AsofJoin
             -- drops them the same way)
             SELECT e.event_id, e.user_id, round(cp.rate, 2) AS rate
             FROM (SELECT * FROM e WHERE ts IS NOT NULL) e
             ASOF LEFT JOIN cp
               ON e.user_id = cp.user_id AND e.ts >= cp.ts
             UNION ALL
             SELECT event_id, user_id, CAST(NULL AS DOUBLE) AS rate
             FROM e WHERE ts IS NULL""")),

    // join_asof_tol [EXT, new r8]: as-of join with a STALENESS BOUND —
    // the feature-store contract ("latest feature value, but never
    // older than 2 h"): an unbounded lookback silently serves a
    // week-old rate after a feed outage, which is usually worse than
    // serving none. Same single-exchange union+carry plan as
    // join_asof; the bound is one codegen'd filter on the carried
    // struct's own match-time field — not a second join, not a range
    // join. Millis timestamps subtract as exact integers, so the 2 h
    // cutoff compares identically cross-engine.
    Q("join_asof_tol",
      (s, d) => {
        val ev = t(s, d, "events").select(col("event_id"), col("user_id"),
          unix_millis(Cols.toMillis(col("ts"))).as("tsm"), col("value"))
        val cp = ev.filter(col("event_id") % 97 === 0)
          .select(col("user_id"), col("tsm"), col("value").as("rate"))
        graft.operators.AsofJoin.asofJoin(
          ev.select("event_id", "user_id", "tsm"), cp,
          keyCols = Seq("user_id"), timeCol = "tsm",
          payload = Seq("rate"),
          tolerance = Some(lit(7200000L)))
          .select(col("event_id"), col("user_id"),
            round(col("rate"), 2).as("rate"))
      },
      Some("""WITH e AS (SELECT event_id, user_id,
             |    epoch_ms(date_trunc('millisecond', ts)) AS tsm, value
             |  FROM events),
             |cp AS (SELECT user_id, tsm, value AS rate FROM e
             |  WHERE event_id % 97 = 0)
             |SELECT e.event_id, e.user_id,
             |  CASE WHEN e.tsm - cp.tsm <= 7200000
             |    THEN round(cp.rate, 2) END AS rate
             |FROM e ASOF LEFT JOIN cp
             |  ON e.user_id = cp.user_id AND e.tsm >= cp.tsm""".stripMargin)),

    // agg_argmax [EXT, new r8]: deterministic argmax/argmin per group —
    // WHICH event carried the peak value, not just the peak (the
    // incident-drilldown aggregate). Spark's max_by/arg_max break ties
    // arbitrarily (partition-order-dependent → nondeterministic under
    // retries AND unorderable cross-engine); lexicographic max over a
    // (value, id) STRUCT is the deterministic form — the id tiebreak
    // rides the same single comparison, one map-side-partial
    // aggregate, no window. Both engines compare the struct
    // identically.
    Q("agg_argmax",
      (s, d) => t(s, d, "events").filter(col("value").isNotNull)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          max(struct(col("value").as("v"), col("event_id").as("id")))
            .as("pk"),
          min(struct(col("value").as("v"), col("event_id").as("id")))
            .as("lo"))
        .select(col("event_type"), col("n"),
          col("pk.id").as("peak_event_id"),
          round(col("pk.v"), 2).as("peak_value"),
          col("lo.id").as("low_event_id"),
          round(col("lo.v"), 2).as("low_value")),
      Some("""SELECT event_type, count(*)::BIGINT AS n,
             |  (max({'v': value, 'id': event_id})).id AS peak_event_id,
             |  round((max({'v': value, 'id': event_id})).v, 2)
             |    AS peak_value,
             |  (min({'v': value, 'id': event_id})).id AS low_event_id,
             |  round((min({'v': value, 'id': event_id})).v, 2)
             |    AS low_value
             |FROM events WHERE value IS NOT NULL
             |GROUP BY 1""".stripMargin)),

    // win_vshape [EXT, new r8]: per-user V-reversal counting (strict
    // down-step immediately followed by a strict up-step in the value
    // sequence) — the row-pattern-matching shape (SQL MATCH_RECOGNIZE,
    // which Spark lacks) expressed as composed lags: for fixed-length
    // patterns the lag form IS the right Spark encoding — one
    // user-keyed exchange, codegen'd comparisons, no NFA state.
    // Integer-cent comparisons so strictness can't blur on float ulp.
    Q("win_vshape",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id")
          .orderBy(col("tsu"), col("event_id"))
        t(s, d, "events")
          .filter(col("value").isNotNull && col("ts").isNotNull)
          .select(col("user_id"), unix_micros(col("ts")).as("tsu"),
            col("event_id"),
            Cols.cents(col("value")).as("c"))
          .withColumn("p1", lag(col("c"), 1).over(w))
          .withColumn("p2", lag(col("c"), 2).over(w))
          .filter(col("p2").isNotNull)
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_windows"),
            sum(when(col("p2") > col("p1") && col("p1") < col("c"), 1L)
              .otherwise(0L)).as("n_vshapes"))
      },
      Some("""WITH s AS (SELECT user_id,
             |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS c,
             |    lag(CAST(floor(value * 100 + 0.5) AS BIGINT), 1) OVER w AS p1,
             |    lag(CAST(floor(value * 100 + 0.5) AS BIGINT), 2) OVER w AS p2
             |  FROM events
             |  WHERE value IS NOT NULL AND ts IS NOT NULL
             |  WINDOW w AS (PARTITION BY user_id
             |    ORDER BY epoch_us(ts), event_id))
             |SELECT user_id, count(*)::BIGINT AS n_windows,
             |  sum(CASE WHEN p2 > p1 AND p1 < c THEN 1 ELSE 0 END)
             |    ::BIGINT AS n_vshapes
             |FROM s WHERE p2 IS NOT NULL GROUP BY 1""".stripMargin)),

    // join_salted [EXT]: skew-mitigated equi-join (hot-key scatter +
    // dim replication, SkewJoin.saltedJoin) — result must equal the
    // plain join, which is exactly what the oracle checks.
    Q("join_salted",
      (s, d) => graft.operators.SkewJoin.saltedJoin(
        t(s, d, "lineitem").select("l_partkey", "l_quantity"),
        t(s, d, "part").select(col("p_partkey").as("l_partkey"),
          col("p_brand")),
        "l_partkey", salt = 8)
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty")),
      Some("""SELECT p_brand, count(*) AS n,
             round(sum(l_quantity), 2) AS qty
             FROM lineitem JOIN part ON l_partkey = p_partkey
             GROUP BY p_brand""")),

    // ---- windows / sort / top-k ----------------------------------------

    // win_rank [EXT]: top-3 orders per customer, deterministic tie-break.
    Q("win_rank",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        t(s, d, "orders")
          .select(col("o_custkey"), col("o_orderkey"),
            round(col("o_totalprice"), 2).as("price"))
          .withColumn("rn", row_number().over(
            Window.partitionBy("o_custkey")
              .orderBy(col("price").desc, col("o_orderkey").asc)))
          .filter(col("rn") <= 3)
      },
      Some("""SELECT * FROM (
             SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price,
             row_number() OVER (PARTITION BY o_custkey
               ORDER BY round(o_totalprice, 2) DESC, o_orderkey) AS rn
             FROM orders) WHERE rn <= 3""")),

    // win_analytic [EXT]: lag + running sum per user over event order.
    Q("win_analytic",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy("event_id")
        t(s, d, "events").select(
          col("user_id"), col("event_id"),
          round(lag("value", 1).over(w), 2).as("prev_v"),
          round(sum("value").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
            .as("running_v"))
      },
      Some("""SELECT user_id, event_id,
             round(lag(value, 1) OVER w, 2) AS prev_v,
             round(sum(value) OVER (PARTITION BY user_id ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
               AS running_v
             FROM events
             WINDOW w AS (PARTITION BY user_id ORDER BY event_id)""")),

    // topk_limit [EXT]: global top-k → TakeOrderedAndProject (no total
    // sort; per-partition heaps + driver merge of k rows).
    Q("topk_limit",
      (s, d) => t(s, d, "orders")
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))
        .orderBy(col("price").desc, col("o_orderkey").asc)
        .limit(10),
      Some("""SELECT o_orderkey, round(o_totalprice, 2) AS price FROM orders
             ORDER BY price DESC, o_orderkey LIMIT 10""")),

    // sort_names: total sort (`assess_changes.qmd:366,375`).
    Q("sort_names",
      (s, d) => t(s, d, "part").select(col("p_brand").as("brand"))
        .distinct().orderBy("brand"),
      Some("SELECT DISTINCT p_brand AS brand FROM part ORDER BY brand")),

    // ---- set operations -------------------------------------------------

    // set_union_tag: tagged UNION ALL (`assess_changes.qmd:82-86`).
    Q("set_union_tag",
      (s, d) => t(s, d, "supplier")
        .select(col("s_name").as("name"), lit("supplier").as("src"))
        .unionByName(t(s, d, "customer")
          .select(col("c_name").as("name"), lit("customer").as("src"))),
      Some("""SELECT s_name AS name, 'supplier' AS src FROM supplier
             UNION ALL
             SELECT c_name AS name, 'customer' AS src FROM customer""")),

    // set_except: EXCEPT DISTINCT (`assess_changes.qmd:335-338`).
    // Parts ordered in bulk (qty > 45) but never in small lots (qty < 5):
    // ~170 of ~1900 keys per sf0.01 — a discriminating, non-empty vector
    // (customer-vs-supplier nationkeys was trivially empty: both cover
    // all 25 nations).
    Q("set_except",
      (s, d) => t(s, d, "lineitem").filter(col("l_quantity") > 45)
        .select(col("l_partkey").as("partkey"))
        .except(t(s, d, "lineitem").filter(col("l_quantity") < 5)
          .select(col("l_partkey").as("partkey"))),
      Some("""SELECT DISTINCT l_partkey AS partkey FROM lineitem
             WHERE l_quantity > 45
             EXCEPT
             SELECT DISTINCT l_partkey AS partkey FROM lineitem
             WHERE l_quantity < 5""")),

    // set_intersect [EXT].
    Q("set_intersect",
      (s, d) => t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
        .intersect(t(s, d, "supplier").select(col("s_nationkey").as("nationkey"))),
      Some("""SELECT c_nationkey AS nationkey FROM customer
             INTERSECT
             SELECT s_nationkey AS nationkey FROM supplier""")),

    // set_union_distinct (`assess_changes.qmd:161-163`).
    Q("set_union_distinct",
      (s, d) => t(s, d, "part").filter(col("p_size") < 15)
        .select(col("p_brand").as("brand"))
        .union(t(s, d, "part").filter(col("p_size") >= 40)
          .select(col("p_brand").as("brand")))
        .distinct(),
      Some("""SELECT p_brand AS brand FROM part WHERE p_size < 15
             UNION
             SELECT p_brand AS brand FROM part WHERE p_size >= 40""")),

    // unpivot: wide→long melt (inverse of pivot_dir's pivot_wider) via
    // the stack generator — stays a narrow generate, no shuffle.
    Q("unpivot",
      (s, d) => t(s, d, "part")
        .select(col("p_partkey"), expr(
          "stack(2, 'size', CAST(p_size AS DOUBLE), 'retail', p_retailprice) AS (metric, value)"))
        .groupBy("metric")
        .agg(count(lit(1)).as("n"), Cols.sumCents(col("value")).as("sum_v")),
      Some("""SELECT metric, count(*) AS n,
             sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100.0 AS sum_v
             FROM (
               SELECT 'size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
               UNION ALL
               SELECT 'retail' AS metric, p_retailprice AS value FROM part)
             GROUP BY metric""")),

    // dedup_exact (`scrape_newest_baci_data.R:41`): min-id per key group.
    Q("dedup_exact",
      (s, d) => t(s, d, "documents").groupBy("lang", "source")
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n")),
      Some("""SELECT lang, source, min(doc_id) AS keep_id, count(*) AS n
             FROM documents GROUP BY lang, source""")),

    // ---- projections / filters ------------------------------------------

    Q("proj_select",
      (s, d) => t(s, d, "customer").select("c_custkey", "c_name", "c_mktsegment"),
      Some("SELECT c_custkey, c_name, c_mktsegment FROM customer")),

    // proj_any_of: schema-tolerant projection (`assess_changes.qmd:281-287`)
    // — "no_such_col" is requested but absent, silently skipped.
    Q("proj_any_of",
      (s, d) => Cols.selectAnyOf(t(s, d, "customer"),
        Seq("c_custkey", "c_acctbal", "no_such_col")),
      Some("SELECT c_custkey, c_acctbal FROM customer")),

    Q("proj_rename",
      (s, d) => t(s, d, "nation")
        .withColumnRenamed("n_nationkey", "nation_id")
        .withColumnRenamed("n_name", "nation_name")
        .select("nation_id", "nation_name"),
      Some("SELECT n_nationkey AS nation_id, n_name AS nation_name FROM nation")),

    // filt_notnull (`scrape_newest_baci_data.R:32`) over a derived
    // nullable column.
    Q("filt_notnull",
      (s, d) => t(s, d, "lineitem")
        .filter(expr("nullif(l_returnflag, 'N')").isNotNull)
        .agg(count(lit(1)).as("n")),
      Some("""SELECT count(*) AS n FROM lineitem
             WHERE nullif(l_returnflag, 'N') IS NOT NULL""")),

    // filt_regex (`scrape_newest_baci_data.R:35`), case-insensitive.
    Q("filt_regex",
      (s, d) => t(s, d, "part")
        .filter(col("p_type").rlike("(?i)^(promo|econ).*"))
        .groupBy(col("p_type").as("ptype"))
        .agg(count(lit(1)).as("n"), Cols.sumCents(col("p_retailprice")).as("tot")),
      Some("""SELECT p_type AS ptype, count(*) AS n,
             sum(CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)) / 100.0 AS tot
             FROM part WHERE regexp_matches(p_type, '(?i)^(promo|econ).*')
             GROUP BY p_type""")),

    // filt_conj (`assess_changes.qmd:118`).
    Q("filt_conj",
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_discount") > 0.03 && col("l_quantity") < 25)
        .agg(count(lit(1)).as("n"), Cols.sumCents(col("l_extendedprice")).as("tot")),
      Some("""SELECT count(*) AS n,
             sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) / 100.0 AS tot
             FROM lineitem WHERE l_discount > 0.03 AND l_quantity < 25""")),

    // filt_notin: R `!x %in% set` fidelity — NULL rows are KEPT
    // (SURVEY.md §2.2 nulls note). The nullable column is derived via
    // nullif so the semantics actually fire.
    Q("filt_notin",
      (s, d) => t(s, d, "customer")
        .withColumn("seg_n", expr("nullif(c_mktsegment, 'BUILDING')"))
        .filter(Cols.notInRSemantics(col("seg_n"),
          Seq("MACHINERY", "FURNITURE")))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n")),
      Some("""SELECT c_mktsegment, count(*) AS n FROM (
             SELECT c_mktsegment, nullif(c_mktsegment, 'BUILDING') AS seg_n
             FROM customer)
             WHERE seg_n IS NULL OR seg_n NOT IN ('MACHINERY', 'FURNITURE')
             GROUP BY c_mktsegment""")),

    // cond_expr (`scrape_newest_baci_data.R:38` shape).
    Q("cond_expr",
      (s, d) => t(s, d, "orders")
        .select(when(col("o_orderpriority").rlike("^[12]"), lit("high"))
          .otherwise(lit("normal")).as("urgency"))
        .groupBy("urgency").agg(count(lit(1)).as("n")),
      Some("""SELECT CASE WHEN regexp_matches(o_orderpriority, '^[12]')
             THEN 'high' ELSE 'normal' END AS urgency, count(*) AS n
             FROM orders GROUP BY 1""")),

    // struct_unnest (`assess_changes.qmd:183`): pack → flatten.
    Q("struct_unnest",
      (s, d) => t(s, d, "nation")
        .select(struct(col("n_name"), col("n_regionkey")).as("comparison"))
        .select(col("comparison.*")),
      Some("SELECT n_name, n_regionkey FROM nation")),

    // json_props [EXT]: JSON field extraction + aggregate.
    Q("json_props",
      (s, d) => t(s, d, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k")),
      Some("""SELECT event_type, count(*) AS n,
             CAST(sum(CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INT))
               AS BIGINT) AS sum_k
             FROM events GROUP BY event_type""")),

    // date_fns [EXT]: calendar bucketing.
    Q("date_fns",
      (s, d) => t(s, d, "orders")
        .groupBy(year(col("o_orderdate")).as("yr"),
          quarter(col("o_orderdate")).as("qtr"))
        .agg(count(lit(1)).as("n"), Cols.sumCents(col("o_totalprice")).as("tot")),
      Some("""SELECT year(o_orderdate) AS yr, quarter(o_orderdate) AS qtr,
             count(*) AS n,
             sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) / 100.0 AS tot
             FROM orders GROUP BY 1, 2""")),

    // src_parquet (SURVEY.md §2.1).
    Q("src_parquet",
      (s, d) => t(s, d, "region").select("r_regionkey", "r_name"),
      Some("SELECT r_regionkey, r_name FROM region")),
  )
}
