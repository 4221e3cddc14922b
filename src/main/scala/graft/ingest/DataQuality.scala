package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks — the constraint-validation pass a
  * lake runs after ingest (the deequ/"unit tests for data" shape). The
  * reference's quality surface is schema drift + row/size deltas
  * (`assess_changes.qmd:127-176`); these are the VALUE-level
  * constraints: null rates, key uniqueness, referential integrity,
  * domain ranges. Each check emits (rule, metric, pass) where metric
  * is the violation fraction and pass compares it to the rule's
  * tolerance — a report of violation RATES, not a crash on first bad
  * row, so one report covers the whole corpus.
  *
  * Plan shape at scale: every single-table check is one aggregate over
  * one scan (several checks on the same table can union without
  * re-reading — Spark reuses the scan per branch; at worst k small
  * aggregates). Referential integrity is a left-anti join on the key —
  * broadcast when the parent's keys fit, shuffle otherwise, exactly
  * like any dimension join.
  */
object DataQuality {

  /** k-anonymity / ℓ-diversity risk report — the privacy-side quality
    * check a curation pipeline runs before releasing tabular data:
    * every quasi-identifier combination shared by fewer than `k` rows
    * re-identifies its members ("size" risk), and a combination whose
    * rows carry fewer than `minL` distinct sensitive values leaks the
    * sensitive attribute even at size ≥ k ("diversity" risk, the
    * homogeneity attack). Returns only the failing groups with their
    * size `n`, diversity `l`, and dominant risk tag (size first when
    * both fail — the stronger condition).
    *
    * One quasi-identifier-keyed aggregate (map-side partial counts;
    * the distinct-count expands per sensitive value before the same
    * single exchange) — no second scan, no join, output bounded by
    * the failing-group count.
    */
  def kAnonymity(df: DataFrame, qi: Seq[String], sensitive: Column,
                 k: Long, minL: Long): DataFrame = {
    require(qi.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1 && minL >= 1, s"k and minL must be >= 1 (got $k, $minL)")
    df.groupBy(qi.map(col): _*)
      .agg(count(lit(1)).as("n"), countDistinct(sensitive).as("l"))
      .filter(col("n") < k || col("l") < minL)
      .withColumn("risk",
        when(col("n") < k, lit("size")).otherwise(lit("diversity")))
  }

  /** Benford first-significant-digit conformance report — the
    * fraud/synthetic-data smell test a quality pipeline runs over
    * naturally-occurring monetary or size columns: organically grown
    * magnitudes follow P(d) = log10(1 + 1/d), while fabricated,
    * truncated, or unit-mixed data drifts toward uniform digits. Emits
    * one row per leading digit 1-9 with the observed count/fraction,
    * the Benford expectation, and that digit's chi-square contribution
    * (sum them and compare against the chi-square(8 df) critical value
    * to make it a gate).
    *
    * One scan, one 9-group aggregate with map-side partials — the
    * cheapest possible shape at any corpus size. Values < 1 or null
    * are excluded (no leading significant digit in the integer part).
    */
  def benford(df: DataFrame, c: Column): DataFrame = {
    val digit = substring(floor(c).cast("long").cast("string"), 1, 1)
      .cast("int")
    val obs = df.filter(c.isNotNull && c >= 1)
      .groupBy(digit.as("digit"))
      .agg(count(lit(1)).as("obs"))
    val tot = obs.agg(sum("obs").as("n"))
    obs.crossJoin(broadcast(tot))
      .select(col("digit"), col("obs"),
        round(col("obs").cast("double") / col("n"), 6).as("obs_frac"),
        round(log10(lit(1.0) + lit(1.0) / col("digit")), 6)
          .as("exp_frac"),
        round(pow(col("obs") - col("n") * log10(lit(1.0) +
          lit(1.0) / col("digit")), 2) /
          (col("n") * log10(lit(1.0) + lit(1.0) / col("digit"))), 4)
          .as("chi2_part"))
  }

  /** Fraction of rows where `c` is NULL. */
  def nullCheck(df: DataFrame, table: String, c: String,
                maxFraction: Double = 0.0): DataFrame =
    oneRow(s"$table.$c.not_null",
      df.agg(((count(lit(1)) - count(col(c))) /
        greatest(count(lit(1)), lit(1L))).as("metric")), maxFraction)

  /** Fraction of rows carrying a duplicated value of `c` (0 = unique). */
  def uniqueCheck(df: DataFrame, table: String, c: String,
                  maxFraction: Double = 0.0): DataFrame =
    oneRow(s"$table.$c.unique",
      df.agg(((count(col(c)) - countDistinct(col(c))) /
        greatest(count(lit(1)), lit(1L))).as("metric")), maxFraction)

  /** Fraction of child rows whose key has no match in the parent. */
  def fkCheck(child: DataFrame, table: String, key: String,
              parent: DataFrame, pkey: String,
              maxFraction: Double = 0.0): DataFrame = {
    val orphans = child.select(col(key))
      .join(parent.select(col(pkey).as(key)).distinct(), Seq(key),
        "left_anti")
    oneRow(s"$table.$key.fk",
      child.agg(count(lit(1)).as("n")).crossJoin(
        orphans.agg(count(lit(1)).as("bad")))
        .select((col("bad") / greatest(col("n"), lit(1L))).as("metric")),
      maxFraction)
  }

  /** Fraction of non-null values outside [lo, hi]. */
  def rangeCheck(df: DataFrame, table: String, c: String,
                 lo: Double, hi: Double,
                 maxFraction: Double = 0.0): DataFrame =
    oneRow(s"$table.$c.range",
      df.filter(col(c).isNotNull)
        .agg((sum(when(col(c) < lo || col(c) > hi, 1L).otherwise(0L)) /
          greatest(count(lit(1)), lit(1L))).as("metric")), maxFraction)

  /** Population-Stability-Index drift report between two versions of a
    * table — the distribution-level companion to the reference's
    * schema/row-delta drift checks (`assess_changes.qmd:148-174`): a
    * column can keep its name, type, and row count while its VALUES
    * shift (price inflation, a new category code), which only a
    * distribution compare catches. Numeric columns bucket by fixed
    * width over the min/max of the union (both versions, so the two
    * sides share boundaries); categorical columns use the raw value.
    * PSI per column = Σ (p−q)·ln(p/q) over cells with Laplace-0.5
    * smoothing (p, q = smoothed cell fractions of version a / b);
    * empty numeric buckets still contribute whenever the two sides'
    * totals differ, so the grid enumerates all `buckets` cells. The
    * usual reading: < 0.1 stable, > 0.2 drifted.
    *
    * Plan shape at scale: column count never multiplies scans — TWO
    * aggregates per side total (one for all numeric bounds, one
    * exploding (column, cell) pairs for all counts), then everything
    * downstream is cell-cardinality-sized (≤ buckets + distinct
    * categories per column) with one-row bounds frames broadcast into
    * the scans. The per-(column, cell) count shuffle is the only
    * data-sized exchange.
    *
    * @return one row per column: (col_name, kind, psi, drifted)
    */
  def drift(a: DataFrame, b: DataFrame, numericCols: Seq[String],
            categoricalCols: Seq[String], buckets: Int = 16,
            threshold: Double = 0.2): DataFrame = {
    require(numericCols.nonEmpty || categoricalCols.nonEmpty,
      "drift needs at least one column")
    require(buckets >= 2, s"need >= 2 buckets (got $buckets)")
    val spark = a.sparkSession

    // Shared bucket bounds per numeric column, collected to the driver
    // as 2·|numericCols| scalars per side (a documented bounded
    // collect — column COUNT, never row count) and re-embedded as
    // literals. r13 kept bounds as a one-row frame crossJoin-broadcast
    // into each side's scan, which re-ran the four min/max aggregates
    // inside BOTH staged sides — most of dq_drift's job count and its
    // bench variance. Literal bounds cost two aggregate jobs total and
    // constant-fold into the cell expression.
    def sideBounds(df: DataFrame): Array[Option[Double]] = {
      val r = df.agg(lit(1).as("one"),
        numericCols.flatMap(c => Seq(
          min(col(c).cast("double")).as(s"lo_$c"),
          max(col(c).cast("double")).as(s"hi_$c"))): _*).head()
      Array.tabulate[Option[Double]](2 * numericCols.size)(j =>
        if (r.isNullAt(1 + j)) None else Some(r.getDouble(1 + j)))
    }
    val ba = sideBounds(a)
    val bb = sideBounds(b)
    // elementwise min/max across sides; an all-null column (no bound on
    // either side) never produces a cell anyway, so any finite
    // placeholder is unobservable — matches the r12 null-propagation
    def comb(x: Option[Double], y: Option[Double],
             f: (Double, Double) => Double): Option[Double] = (x, y) match {
      case (Some(u), Some(v)) => Some(f(u, v))
      case _ => x.orElse(y)
    }
    val bounds: Map[String, (Double, Double)] =
      numericCols.zipWithIndex.map { case (c, i) =>
        val lo = comb(ba(2 * i), bb(2 * i), math.min)
        val hi = comb(ba(2 * i + 1), bb(2 * i + 1), math.max)
        c -> (lo.getOrElse(0.0), hi.getOrElse(0.0))
      }.toMap

    // ONE exploding scan per side fused into ONE (column, cell)-keyed
    // exchange: every row contributes one (col_name, kind, cell) per
    // drift column tagged with its side, and both sides' counts come
    // out of the same partial-aggregated groupBy (r13 ran one scan,
    // one shuffle, and one parquet stage write PER SIDE, then joined)
    def exploded(df: DataFrame, side: String) = {
      val numCells = numericCols.map { c =>
        val (lo, hi) = bounds(c)
        val x = col(c).cast("double")
        // same expression shape as r12, with the bounds constant-folded
        // — bit-identical cells on identical inputs
        val cell = if (hi <= lo) lit(0L)
          else least(floor((x - lit(lo)) /
            ((lit(hi) - lit(lo)) / buckets)), lit((buckets - 1).toLong))
        struct(lit(c).as("col_name"), lit("numeric").as("kind"),
          when(x.isNotNull, cell.cast("string")).as("cell"))
      }
      val catCells = categoricalCols.map(c =>
        struct(lit(c).as("col_name"), lit("categorical").as("kind"),
          col(c).cast("string").as("cell")))
      df.select(explode(array(numCells ++ catCells: _*)).as("e"))
        .select(col("e.col_name"), col("e.kind"), col("e.cell"),
          lit(side).as("side"))
        .filter(col("cell").isNotNull) // null values sit out, per column
    }
    val counts = exploded(a, "a").unionByName(exploded(b, "b"))
      .groupBy("col_name", "kind", "cell")
      .agg(count(when(col("side") === "a", 1)).cast("double").as("ca"),
        count(when(col("side") === "b", 1)).cast("double").as("cb"))

    // fixed numeric grid (empty buckets count toward k and carry the
    // 0.5 smoothing mass) unioned in with zero counts; the re-aggregate
    // is over the TINY cell frame (≤ cols × cells rows)
    val grid = spark.range(buckets).crossJoin(
        spark.createDataFrame(numericCols.map(Tuple1(_)))
          .toDF("col_name"))
      .select(col("col_name"), lit("numeric").as("kind"),
        col("id").cast("string").as("cell"),
        lit(0.0).as("ca"), lit(0.0).as("cb"))
    val cells = counts.unionByName(grid)
      .groupBy("col_name", "kind", "cell")
      .agg(sum("ca").as("ca"), sum("cb").as("cb"))

    // per-column totals as a window over the cell frame — no re-scan,
    // no join; partitioned by column (never a global window)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("col_name")
    val p = (col("ca") + 0.5) / (col("na") + lit(0.5) * col("k"))
    val q = (col("cb") + 0.5) / (col("nb") + lit(0.5) * col("k"))
    cells
      .withColumn("na", sum("ca").over(w))
      .withColumn("nb", sum("cb").over(w))
      .withColumn("k", count(lit(1)).over(w).cast("double"))
      .select(col("col_name"), col("kind"),
        ((p - q) * log(p / q)).as("term"))
      .groupBy("col_name", "kind")
      .agg(round(sum("term"), 4).as("psi"))
      .select(col("col_name"), col("kind"), col("psi"),
        (col("psi") > threshold).as("drifted"))
  }

  /** Stack any number of checks into one report frame. */
  def report(checks: DataFrame*): DataFrame =
    checks.reduce(_ unionByName _)

  private def oneRow(rule: String, metric: DataFrame,
                     maxFraction: Double): DataFrame =
    metric.select(lit(rule).as("rule"),
      round(coalesce(col("metric"), lit(0.0)), 6).as("metric"),
      (coalesce(col("metric"), lit(0.0)) <= maxFraction).as("pass"))
}
