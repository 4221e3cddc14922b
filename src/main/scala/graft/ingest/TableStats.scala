package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANALYZE-style column statistics — the planner-input collection step
  * (null counts, exact NDV, numeric min/max) a large lake runs after
  * ingest so joins/filters can be costed. The reference's schema
  * introspection reports column NAMES and dtypes (`assess_changes.qmd`
  * schema diff); this is the value-level generalization.
  *
  * Plan shape at scale: ALL columns' statistics compute in ONE
  * aggregate over ONE scan — k columns contribute 4k aggregate
  * expressions to a single node, not k passes over the table. The
  * exact multi-column distinct counts plan as one Expand (k-way row
  * expansion, one shuffle): exact NDV is inherently a shuffle of the
  * distinct values; swap `countDistinct` for
  * `approx_count_distinct` when a 2% HLL answer is enough (that
  * variant is partial-aggregatable and Expand-free).
  *
  * @return long-format (column, n_nulls, n_distinct, min_num, max_num)
  *         — min/max are NULL for non-numeric columns (string min/max
  *         cross engines with collation hazards; NDV and null counts
  *         are collation-free)
  */
object TableStats {

  def columnStats(df: DataFrame, numericCols: Seq[String],
                  otherCols: Seq[String]): DataFrame = {
    val all = numericCols ++ otherCols
    require(all.nonEmpty, "no columns requested")
    require(all.distinct.size == all.size,
      s"duplicate columns requested: ${all.diff(all.distinct).distinct}")
    val aggs = all.flatMap { c =>
      val base = Seq(
        // count(1) - count(col), NOT sum(when(isNull)): over zero rows
        // the sum is NULL but the count difference is the correct 0
        (count(lit(1)) - count(col(c))).as(s"${c}__nn"),
        countDistinct(col(c)).as(s"${c}__nd"))
      if (numericCols.contains(c)) base ++ Seq(
        round(min(col(c)).cast("double"), 4).as(s"${c}__mn"),
        round(max(col(c)).cast("double"), 4).as(s"${c}__mx"))
      else base
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = all.map { c =>
      val mn = if (numericCols.contains(c)) col(s"${c}__mn")
               else lit(null).cast("double")
      val mx = if (numericCols.contains(c)) col(s"${c}__mx")
               else lit(null).cast("double")
      struct(lit(c).as("column"), col(s"${c}__nn").as("n_nulls"),
        col(s"${c}__nd").as("n_distinct"), mn.as("min_num"),
        mx.as("max_num"))
    }
    one.select(explode(array(rows: _*)).as("r")).select("r.*")
  }
}
