package graft.ingest

import org.apache.spark.sql.{DataFrame, Row}

/** `sink_report` — the reference renders its changelog as kable tables
  * in a Quarto PDF (`assess_changes.qmd:249-258` and siblings). The
  * engine-side equivalent is a markdown report over the same frames:
  * file drift (new/removed files, size changes), column drift, and the
  * country/species diff — one section per table the reference prints.
  *
  * Rendering is driver-side by design: every input frame is
  * metadata-scale (one row per FILE or per diff entry, never per
  * record). A `maxRows` guard caps pathological inputs and says so in
  * the output — no silent truncation.
  */
object Report {

  /** One frame → one markdown table (header from the schema). */
  def mdTable(df: DataFrame, maxRows: Int = 1000): String =
    render(df.columns.toSeq, df.limit(maxRows + 1).collect(), maxRows)

  /** One collected frame → one markdown table, or "None." when empty —
    * ONE Spark action per section (round 2 ran isEmpty + a second
    * collect per section, doubling the job count of the whole report).
    */
  private def mdTableOrNone(df: DataFrame, maxRows: Int = 1000): String = {
    val rows = df.limit(maxRows + 1).collect()
    if (rows.isEmpty) "None.\n" else render(df.columns.toSeq, rows, maxRows)
  }

  private def render(cols: Seq[String], rows: Array[Row],
                     maxRows: Int): String = {
    def cell(v: Any): String = v match {
      case null => ""
      case s: scala.collection.Seq[_] => s.mkString(", ")
      case a: Array[_] => a.mkString(", ")
      case x => x.toString
    }
    val sb = new StringBuilder
    sb.append(cols.mkString("| ", " | ", " |\n"))
    sb.append(cols.map(_ => "---").mkString("| ", " | ", " |\n"))
    rows.take(maxRows).foreach { r: Row =>
      sb.append(cols.indices.map(i => cell(r.get(i)))
        .mkString("| ", " | ", " |\n"))
    }
    if (rows.length > maxRows)
      sb.append(s"\n*(truncated at $maxRows rows)*\n")
    sb.toString
  }

  /** The full changelog report. Mirrors the reference's section order:
    * new files, removed files, size changes, column changes
    * (`tab:added_removed_columns`), country and species changes.
    */
  def changelog(fileDiff: DataFrame, pairReport: DataFrame,
                countrySpecies: DataFrame, title: String = "Data changelog"): String = {
    import org.apache.spark.sql.functions._
    val sb = new StringBuilder
    sb.append(s"# $title\n\n")

    sb.append("## New files\n\n")
    sb.append(mdTableOrNone(
      fileDiff.filter(!col("exists_in_old") && col("exists_in_new"))
        .select("std_name").orderBy("std_name")))

    sb.append("\n## Removed files\n\n")
    sb.append(mdTableOrNone(
      fileDiff.filter(col("exists_in_old") && !col("exists_in_new"))
        .select("std_name").orderBy("std_name")))

    sb.append("\n## Size changes\n\n")
    sb.append(mdTableOrNone(
      fileDiff.filter(col("exists_in_old") && col("exists_in_new"))
        .select("std_name", "size_change_mb").orderBy("std_name")))

    sb.append("\n## Column changes\n\n")
    sb.append("Only matching .csv and .xlsx files were compared.\n\n")
    sb.append(mdTableOrNone(pairReport
      .filter(col("added_cols").isNotNull || col("removed_cols").isNotNull)
      .select("std_name", "added_cols", "removed_cols").orderBy("std_name")))

    sb.append("\n## Row-count changes\n\n")
    sb.append(mdTableOrNone(pairReport.filter(col("row_change") =!= 0)
      .select("std_name", "old_rows", "new_rows", "row_change")
      .orderBy("std_name")))

    sb.append("\n## Country and species changes\n\n")
    sb.append(mdTableOrNone(countrySpecies))
    sb.toString
  }

  /** Render and write to a local path (`sink_report`). */
  def write(dest: java.nio.file.Path, fileDiff: DataFrame,
            pairReport: DataFrame, countrySpecies: DataFrame,
            title: String = "Data changelog"): java.nio.file.Path = {
    java.nio.file.Files.createDirectories(dest.getParent)
    java.nio.file.Files.writeString(dest,
      changelog(fileDiff, pairReport, countrySpecies, title))
    dest
  }
}
