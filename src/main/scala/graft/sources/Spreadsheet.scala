package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Excel source (SURVEY.md §2.1 `src_xlsx`; the reference reads
  * `read_xlsx(skip = 1)`, `assess_changes.qmd:132,138`).
  *
  * Two implementations of one contract: `XlsxNativeReader` parses real
  * .xlsx workbooks with the dependency-free OOXML reader (graft.sources.
  * Xlsx — executor-parallel via binaryFile, no POI); `CsvTwinReader`
  * implements the identical contract (including the skip-N-leading-rows
  * semantics) over CSV twins, kept because the reference's sibling
  * inputs are CSV and the two paths must agree.
  */
trait SpreadsheetReader {
  /** Read one spreadsheet; `skip` leading rows are discarded BEFORE the
    * header row is taken (read_xlsx(skip=1) semantics).
    */
  def read(spark: SparkSession, path: String, skip: Int): DataFrame
}

/** CSV-backed reader honoring the skip-then-header contract. */
object CsvTwinReader extends SpreadsheetReader {
  def read(spark: SparkSession, path: String, skip: Int): DataFrame = {
    import spark.implicits._
    // per-file line index via zipWithIndex inside each file's partition
    // order (spark.read.text preserves line order per file)
    val lines = spark.read.textFile(path)
    val kept = lines.mapPartitions { it => it.zipWithIndex.collect {
      case (l, i) if i >= skip => l
    } }
    spark.read.option("header", "true").option("inferSchema", "true")
      .csv(kept)
  }
}

/** Real .xlsx parse via the dependency-free OOXML reader. */
object XlsxNativeReader extends SpreadsheetReader {
  def read(spark: SparkSession, path: String, skip: Int): DataFrame =
    Xlsx.read(spark, path, skip)
}

object Spreadsheet {
  /** Entry point: native OOXML parse for .xlsx, CSV twin otherwise. */
  def read(spark: SparkSession, path: String, skip: Int = 0): DataFrame =
    if (path.toLowerCase.endsWith(".xlsx"))
      XlsxNativeReader.read(spark, path, skip)
    else CsvTwinReader.read(spark, path, skip)
}
