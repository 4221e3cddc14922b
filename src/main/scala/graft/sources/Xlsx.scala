package graft.sources

import java.io.{ByteArrayInputStream, InputStream}
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dependency-free OOXML (.xlsx) reader/writer (SURVEY.md §2.1
  * `src_xlsx`; the reference reads `read_xlsx(skip = 1)`,
  * `assess_changes.qmd:132,138`).
  *
  * An .xlsx is a zip of XML parts; the two that carry the data are
  * `xl/sharedStrings.xml` (string table) and `xl/worksheets/sheet1.xml`
  * (cells). Both are parsed with the JDK's streaming StAX reader — no
  * POI, no external jars, works in the zero-egress build and anywhere
  * else.
  *
  * Scale shape mirrors ZipCsv: files arrive via the `binaryFile` source
  * (one task per file — xlsx isn't splittable), each parses on an
  * executor, and thousands of workbooks parallelize across the cluster.
  * Only the first file's header area is touched driver-side (to fix the
  * output schema before the distributed pass).
  */
object Xlsx {

  private val sharedStringsEntry = "xl/sharedStrings.xml"
  private val sheetEntryPattern = "xl/worksheets/sheet\\d+\\.xml"

  /** All rows of the FIRST worksheet (lowest sheet number) as string
    * cells, in sheet order. Driver- or executor-side (pure function of
    * the bytes).
    */
  def parseRows(xlsxBytes: Array[Byte]): Seq[Seq[String]] = {
    // ZipInputStream is sequential and entry order is arbitrary in files
    // written by other tools, so scan EVERY entry and keep the sheet
    // with the lowest number — taking the first matching entry would
    // silently read whichever sheet the writer happened to store first.
    var shared: Option[Array[Byte]] = None
    var sheet: Option[Array[Byte]] = None
    var sheetNum = Int.MaxValue
    val zis = new ZipInputStream(new ByteArrayInputStream(xlsxBytes))
    var e = zis.getNextEntry
    while (e != null) {
      if (e.getName == sharedStringsEntry) shared = Some(zis.readAllBytes())
      else if (e.getName.matches(sheetEntryPattern)) {
        val num = e.getName.replaceAll("\\D+", "").toInt
        if (num < sheetNum) { sheetNum = num; sheet = Some(zis.readAllBytes()) }
      }
      e = zis.getNextEntry
    }
    val sst = shared.map(b => parseSharedStrings(
      new ByteArrayInputStream(b))).getOrElse(Array.empty[String])
    sheet.map(b => parseSheet(new ByteArrayInputStream(b), sst))
      .getOrElse(Seq.empty)
  }

  /** `<sst><si><t>…</t></si>…` — rich-text runs (`<r><t>`) concatenate. */
  private def parseSharedStrings(in: InputStream): Array[String] = {
    val r = newReader(in)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inSi = false
    var inT = false
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "si" => inSi = true; cur.clear()
            case "t" if inSi => inT = true
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS if inT =>
          cur.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "si" => inSi = false; out += cur.toString
            case "t" => inT = false
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    out.toArray
  }

  /** `<sheetData><row><c r="B3" t="s|inlineStr|str|b|…"><v>…` — cells land
    * at their column index (ref letters), missing cells leave gaps ("").
    */
  private def parseSheet(in: InputStream, sst: Array[String]): Seq[Seq[String]] = {
    val r = newReader(in)
    val rows = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
    var row: scala.collection.mutable.ArrayBuffer[String] = null
    var cellCol = 0
    var cellType = ""
    var inV = false
    var inT = false
    val text = new StringBuilder
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" =>
              row = scala.collection.mutable.ArrayBuffer.empty[String]
              cellCol = -1
            case "c" if row != null =>
              val ref = Option(r.getAttributeValue(null, "r"))
              // no ref attribute → next column after the previous cell
              cellCol = ref.map(colIndex).getOrElse(cellCol + 1)
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
              text.clear()
            case "v" => inV = true
            case "t" => inT = true
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS if inV || inT =>
          text.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "row" => rows += row.toSeq; row = null
            case "c" if row != null =>
              val raw = text.toString
              val v = cellType match {
                // a self-closed or valueless typed cell (<c t="s"/>) has
                // no index to look up — it is an empty cell, not an error
                case "s" if raw.trim.nonEmpty => sst(raw.trim.toInt)
                case "s" => ""
                case "b" => if (raw.trim == "1") "true" else "false"
                case _ => raw
              }
              while (row.length <= cellCol) row += ""
              row(cellCol) = v
            case "v" => inV = false
            case "t" => inT = false
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    rows.toSeq
  }

  /** "B3" → 1; "AA1" → 26. */
  private def colIndex(ref: String): Int =
    ref.takeWhile(_.isLetter).foldLeft(0)((a, c) => a * 26 + (c - 'A' + 1)) - 1

  private def newReader(in: InputStream) = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.createXMLStreamReader(in)
  }

  /** Read all .xlsx files under `path` as one DataFrame of string
    * columns. `skip` leading rows are discarded BEFORE the header row is
    * taken, per file (read_xlsx(skip=1) semantics). The schema comes
    * from the first file (driver-side header peek); all files must share
    * it, as the reference's FAO exports do.
    */
  def read(spark: SparkSession, path: String, skip: Int = 0): DataFrame = {
    import spark.implicits._
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.xlsx")
      .load(path)
      .select("path", "content")
      .as[(String, Array[Byte])]
    // schema peek: first file only, driver-side — through the Hadoop
    // FileSystem API so the same code reads file:, hdfs: and s3a: URIs
    // (java.nio Path.of(URI) only resolves file: and would throw
    // FileSystemNotFoundException on the cluster deployment shape)
    val firstPath = files.select("path").as[String].orderBy("path").head()
    val hp = new org.apache.hadoop.fs.Path(java.net.URI.create(firstPath))
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(hp)
    val headerBytes = try in.readAllBytes() finally in.close()
    val header = parseRows(headerBytes).drop(skip).headOption.getOrElse(
      throw new IllegalArgumentException(s"$firstPath: no header row"))
      .zipWithIndex.map { case (h, i) => if (h.isEmpty) s"_c$i" else h }
    val width = header.length
    val data = files.flatMap { case (_, bytes) =>
      parseRows(bytes).drop(skip + 1)
        .map(r => r.padTo(width, "").take(width))
    }
    data.toDF("row")
      .selectExpr(header.indices.map(i => s"row[$i] AS `${header(i)}`"): _*)
  }

  /** Minimal conforming .xlsx writer (fixtures, `sink_report` exports):
    * one sheet, numeric cells for number-parseable values, inline
    * strings otherwise — exercises both cell kinds on read-back.
    */
  def write(dest: java.nio.file.Path, rows: Seq[Seq[String]]): Unit = {
    def colRef(i: Int): String = {
      var n = i + 1; val sb = new StringBuilder
      while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
      sb.toString
    }
    def esc(s: String) = s.replace("&", "&amp;").replace("<", "&lt;")
      .replace(">", "&gt;")
    val sheetXml = {
      val sb = new StringBuilder
      sb.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
      sb.append("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
      rows.zipWithIndex.foreach { case (r, ri) =>
        sb.append(s"""<row r="${ri + 1}">""")
        r.zipWithIndex.foreach { case (v, ci) =>
          val ref = s"${colRef(ci)}${ri + 1}"
          if (v.nonEmpty && v.matches("-?\\d+(\\.\\d+)?"))
            sb.append(s"""<c r="$ref"><v>$v</v></c>""")
          else
            sb.append(s"""<c r="$ref" t="inlineStr"><is><t>${esc(v)}</t></is></c>""")
        }
        sb.append("</row>")
      }
      sb.append("</sheetData></worksheet>")
      sb.toString
    }
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
      """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
      """<Default Extension="xml" ContentType="application/xml"/>""" +
      """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
      """<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""" +
      """</Types>"""
    val rels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
      """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
      """</Relationships>"""
    val workbook =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
      """<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>"""
    val wbRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
      """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>""" +
      """</Relationships>"""
    val zos = new ZipOutputStream(java.nio.file.Files.newOutputStream(dest))
    def entry(name: String, body: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(body.getBytes("UTF-8")); zos.closeEntry()
    }
    try {
      entry("[Content_Types].xml", contentTypes)
      entry("_rels/.rels", rels)
      entry("xl/workbook.xml", workbook)
      entry("xl/_rels/workbook.xml.rels", wbRels)
      entry("xl/worksheets/sheet1.xml", sheetXml)
    } finally zos.close()
  }
}
