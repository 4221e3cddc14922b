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

  /** Stack any number of checks into one report frame. */
  def report(checks: DataFrame*): DataFrame =
    checks.reduce(_ unionByName _)

  private def oneRow(rule: String, metric: DataFrame,
                     maxFraction: Double): DataFrame =
    metric.select(lit(rule).as("rule"),
      round(coalesce(col("metric"), lit(0.0)), 6).as("metric"),
      (coalesce(col("metric"), lit(0.0)) <= maxFraction).as("pass"))
}
