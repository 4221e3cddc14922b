package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Excel source (SURVEY.md §2.1 `src_xlsx`; the reference reads
  * `read_xlsx(skip = 1)`, `assess_changes.qmd:132,138`).
  *
  * The build is zero-egress (no POI / spark-excel jar available), so the
  * source is a pluggable interface: `XlsxPoiReader` binds lazily to
  * Apache POI via reflection when the jar is on the classpath at a real
  * deployment; `CsvTwinReader` implements the identical contract
  * (including the skip-N-leading-rows semantics) over CSV twins and
  * carries the tests.
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

/** POI-backed reader, bound by reflection so the class loads (and the
  * interface is exercised) without the jar; `available` reports whether
  * the runtime actually has POI.
  */
object XlsxPoiReader extends SpreadsheetReader {
  lazy val available: Boolean =
    try { Class.forName("org.apache.poi.ss.usermodel.WorkbookFactory"); true }
    catch { case _: Throwable => false }

  def read(spark: SparkSession, path: String, skip: Int): DataFrame = {
    if (!available)
      throw new UnsupportedOperationException(
        "Apache POI not on classpath; use CsvTwinReader or deploy with poi-ooxml")
    // Driver-side parse (spreadsheets are metadata-scale in the reference
    // pipeline): WorkbookFactory.create(file) → rows → createDataFrame.
    // Bound via reflection only at call time.
    val wbf = Class.forName("org.apache.poi.ss.usermodel.WorkbookFactory")
    val create = wbf.getMethod("create", classOf[java.io.File])
    val wb = create.invoke(null, new java.io.File(path))
    try {
      val sheet = wb.getClass.getMethod("getSheetAt", classOf[Int])
        .invoke(wb, Integer.valueOf(0))
      val it = sheet.getClass.getMethod("iterator").invoke(sheet)
        .asInstanceOf[java.util.Iterator[AnyRef]]
      val rows = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
      while (it.hasNext) {
        val row = it.next()
        val cells = row.getClass.getMethod("iterator").invoke(row)
          .asInstanceOf[java.util.Iterator[AnyRef]]
        val vals = scala.collection.mutable.ArrayBuffer.empty[String]
        while (cells.hasNext) vals += String.valueOf(cells.next())
        rows += vals.toSeq
      }
      val data = rows.drop(skip)
      val header = data.head
      import spark.implicits._
      val width = header.length
      data.tail.map(r => r.padTo(width, "").take(width)).toSeq
        .toDF("row")
        .selectExpr(header.indices.map(i => s"row[$i] AS `${header(i)}`"): _*)
    } finally wb.getClass.getMethod("close").invoke(wb)
  }
}

object Spreadsheet {
  /** Entry point: POI when present, CSV twin otherwise. */
  def read(spark: SparkSession, path: String, skip: Int = 0): DataFrame =
    if (path.toLowerCase.endsWith(".xlsx") && XlsxPoiReader.available)
      XlsxPoiReader.read(spark, path, skip)
    else CsvTwinReader.read(spark, path, skip)
}
