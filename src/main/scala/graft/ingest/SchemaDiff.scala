package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Schema-introspection operators — the reference's signature capability
  * (SURVEY.md §2.8): reify a StructType into data, diff two schemas, diff
  * row counts, and orchestrate the per-pair compare of
  * `assess_changes.qmd:127-188`.
  */
object SchemaDiff {

  /** `colnames(df)`-as-data (`assess_changes.qmd:148-149`): reify a schema
    * into a (column, dtype) DataFrame.
    */
  def reify(spark: SparkSession, schema: StructType): DataFrame = {
    import spark.implicits._
    schema.fields.map(f => (f.name, f.dataType.simpleString)).toSeq
      .toDF("column", "dtype")
  }

  /** Column-level drift: full-outer join of two reified schemas on column
    * name; `type_changed` uses null-propagating inequality, matching R
    * `old != new` with NA → NA (`assess_changes.qmd:160-174`).
    * Output: (column, old_type, new_type, added, removed, type_changed).
    */
  def schemaDiff(spark: SparkSession, oldS: StructType, newS: StructType): DataFrame = {
    val o = reify(spark, oldS).select(col("column"), col("dtype").as("old_type"))
    val n = reify(spark, newS).select(col("column"), col("dtype").as("new_type"))
    o.join(n, Seq("column"), "full_outer").select(
      col("column"), col("old_type"), col("new_type"),
      col("old_type").isNull.as("added"),
      col("new_type").isNull.as("removed"),
      (col("old_type") =!= col("new_type")).as("type_changed"))
  }

  /** Added/removed column lists as nullable arrays — NA-when-empty, never
    * empty array, matching `assess_changes.qmd:150-158`.
    */
  def colSetDiff(spark: SparkSession, oldS: StructType, newS: StructType): DataFrame = {
    val d = schemaDiff(spark, oldS, newS)
    val added = d.filter(col("added")).agg(sort_array(collect_list("column")).as("a"))
    val removed = d.filter(col("removed")).agg(sort_array(collect_list("column")).as("r"))
    added.crossJoin(removed).select(
      when(size(col("a")) > 0, col("a")).as("added_cols"),
      when(size(col("r")) > 0, col("r")).as("removed_cols"))
  }

  /** Row-count drift for one matched pair (`assess_changes.qmd:145-147`). */
  def rowDiff(oldDf: DataFrame, newDf: DataFrame): (Long, Long, Long) = {
    val (o, n) = (oldDf.count(), newDf.count())
    (o, n, n - o)
  }

  /** Per-pair compare orchestration (`pair_compare`,
    * `assess_changes.qmd:127-179`): a driver loop over matched (old, new)
    * path pairs — metadata-scale by design (the loop iterates file pairs,
    * each iteration launches distributed reads; no data is collected).
    * `readFn` opens a path as a DataFrame (csv/parquet/...).
    *
    * Schema drift is computed directly on the driver-side StructTypes —
    * schemas are metadata already resident on the driver, so round 2's
    * three filter+collect Spark jobs per pair were pure overhead. The
    * only cluster work per pair is the two row counts.
    */
  def pairCompare(spark: SparkSession, pairs: Seq[(String, String, String)],
                  readFn: String => DataFrame): DataFrame = {
    import spark.implicits._
    val rows = pairs.map { case (stdName, oldPath, newPath) =>
      val (oldDf, newDf) = (readFn(oldPath), readFn(newPath))
      val (oc, nc, delta) = rowDiff(oldDf, newDf)
      def types(s: StructType) =
        s.fields.map(f => f.name -> f.dataType.simpleString).toMap
      val (o, n) = (types(oldDf.schema), types(newDf.schema))
      val added = (n.keySet -- o.keySet).toArray.sorted
      val removed = (o.keySet -- n.keySet).toArray.sorted
      val typeChanged = o.keySet.intersect(n.keySet)
        .filter(c => o(c) != n(c)).toArray.sorted
      (stdName, oc, nc, delta,
        if (added.isEmpty) null else added,
        if (removed.isEmpty) null else removed,
        if (typeChanged.isEmpty) null else typeChanged)
    }
    rows.toDF("std_name", "old_rows", "new_rows", "row_change",
      "added_cols", "removed_cols", "type_changed_cols")
  }
}
