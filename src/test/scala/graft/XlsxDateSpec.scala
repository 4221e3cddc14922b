package graft

import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Xlsx

/** Date-formatted numeric cells — the xlsx fidelity gap beyond raw
  * strings: Excel stores dates as serial numbers plus a number format
  * reached through the cell's style index (s → cellXfs → numFmtId).
  * Fixtures are hand-built workbooks (external-writer shapes, not our
  * own writer) covering builtin date/time/datetime ids, a custom date
  * code, the duration ids that must NOT decode, the 1900 leap-bug
  * serials, and the 1904 date system.
  */
class XlsxDateSpec extends AnyFunSuite {

  private val stylesXml =
    """<?xml version="1.0"?><styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""" +
      """<numFmts count="1"><numFmt numFmtId="164" formatCode="yyyy\-mm\-dd"/></numFmts>""" +
      """<cellXfs count="7">""" +
      """<xf numFmtId="0"/>""" +      // 0 general
      """<xf numFmtId="14"/>""" +     // 1 builtin date
      """<xf numFmtId="22"/>""" +     // 2 builtin datetime
      """<xf numFmtId="164"/>""" +    // 3 custom date code
      """<xf numFmtId="18"/>""" +     // 4 builtin time
      """<xf numFmtId="45"/>""" +     // 5 duration — stays raw
      """<xf numFmtId="2"/>""" +      // 6 plain numeric — stays raw
      """</cellXfs></styleSheet>"""

  private def workbook(cells: String, date1904: Boolean = false): Array[Byte] = {
    val sheet =
      """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""" +
        cells + "</sheetData></worksheet>"
    val wb =
      """<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""" +
        (if (date1904) """<workbookPr date1904="1"/>""" else "<workbookPr/>") +
        """<sheets><sheet name="S" sheetId="1"/></sheets></workbook>"""
    val dir = Files.createTempDirectory("xd")
    val f = dir.resolve("w.xlsx")
    val zos = new ZipOutputStream(Files.newOutputStream(f))
    def entry(n: String, b: String): Unit = {
      zos.putNextEntry(new ZipEntry(n)); zos.write(b.getBytes); zos.closeEntry()
    }
    entry("xl/workbook.xml", wb)
    entry("xl/styles.xml", stylesXml)
    entry("xl/worksheets/sheet1.xml", sheet)
    zos.close()
    Files.readAllBytes(f)
  }

  test("builtin date, datetime, custom code, and time styles decode") {
    val rows = Xlsx.parseRows(workbook(
      """<row r="1">""" +
        """<c r="A1" s="1"><v>44927</v></c>""" +
        """<c r="B1" s="2"><v>44927.5</v></c>""" +
        """<c r="C1" s="3"><v>44927</v></c>""" +
        """<c r="D1" s="4"><v>0.75</v></c></row>"""))
    assert(rows === Seq(Seq(
      "2023-01-01", "2023-01-01 12:00:00", "2023-01-01", "18:00:00")))
  }

  test("durations and plain numerics stay raw; unstyled too") {
    val rows = Xlsx.parseRows(workbook(
      """<row r="1">""" +
        """<c r="A1" s="5"><v>1.5</v></c>""" +
        """<c r="B1" s="6"><v>44927</v></c>""" +
        """<c r="C1"><v>44927</v></c>""" +
        """<c r="D1" s="0"><v>7</v></c></row>"""))
    assert(rows === Seq(Seq("1.5", "44927", "44927", "7")))
  }

  test("1900 leap-bug serials: 59, the fictitious 60, and 61") {
    val rows = Xlsx.parseRows(workbook(
      """<row r="1">""" +
        """<c r="A1" s="1"><v>59</v></c>""" +
        """<c r="B1" s="1"><v>60</v></c>""" +
        """<c r="C1" s="1"><v>61</v></c>""" +
        """<c r="D1" s="1"><v>1</v></c></row>"""))
    assert(rows === Seq(Seq(
      "1900-02-28", "1900-02-28", "1900-03-01", "1900-01-01")))
  }

  test("1904 date system shifts the epoch and has no leap bug") {
    val rows = Xlsx.parseRows(workbook(
      """<row r="1">""" +
        """<c r="A1" s="1"><v>0</v></c>""" +
        """<c r="B1" s="1"><v>366</v></c></row>""", date1904 = true))
    assert(rows === Seq(Seq("1904-01-01", "1905-01-01")))
  }

  test("time fraction rounds to whole seconds and rolls over midnight") {
    val rows = Xlsx.parseRows(workbook(
      """<row r="1">""" +
        """<c r="A1" s="2"><v>44927.999999</v></c>""" +
        """<c r="B1" s="2"><v>44927.25</v></c></row>"""))
    assert(rows === Seq(Seq("2023-01-02 00:00:00", "2023-01-01 06:00:00")))
  }

  test("custom-code classifier: quoted/bracketed text never reads as tokens") {
    import graft.sources.Xlsx.DateStyles.classifyCode
    assert(classifyCode("yyyy-mm-dd") === ((true, true, false)))
    assert(classifyCode("hh:mm:ss") === ((true, false, true)))
    assert(classifyCode("yyyy-mm-dd hh:mm") === ((true, true, true)))
    assert(classifyCode("0.00") === ((false, false, false)))
    assert(classifyCode("\"yards\" 0.0") === ((false, false, false)))
    assert(classifyCode("[Red]0.0") === ((false, false, false)))
    assert(classifyCode("#,##0") === ((false, false, false)))
    // custom DURATION codes (elapsed time in brackets) must stay raw,
    // like the builtin duration ids 45-47 — decoding 1.5 "[h]:mm:ss"
    // as 12:00:00 instead of 36 elapsed hours would corrupt the cell
    assert(classifyCode("[h]:mm:ss") === ((false, false, false)))
    assert(classifyCode("[hh]:mm") === ((false, false, false)))
    assert(classifyCode("[mm]:ss") === ((false, false, false)))
  }

  test("valueless typed boolean cell reads empty, not FALSE") {
    val rows = Xlsx.parseRows(workbook(
      """<row r="1"><c r="A1" t="b"/>""" +
        """<c r="B1" t="b"><v>1</v></c></row>"""))
    assert(rows === Seq(Seq("", "true")))
  }

  test("workbooks without styles.xml read every number raw (regression)") {
    val dir = Files.createTempDirectory("xn")
    val f = dir.resolve("n.xlsx")
    val zos = new ZipOutputStream(Files.newOutputStream(f))
    zos.putNextEntry(new ZipEntry("xl/worksheets/sheet1.xml"))
    zos.write(("""<?xml version="1.0"?><worksheet xmlns="x"><sheetData>""" +
      """<row r="1"><c r="A1" s="1"><v>44927</v></c></row>""" +
      """</sheetData></worksheet>""").getBytes)
    zos.closeEntry(); zos.close()
    assert(Xlsx.parseRows(Files.readAllBytes(f)) === Seq(Seq("44927")))
  }

  test("formula and shared-formula cells read cached values, never formula text") {
    // Excel stores each formula cell as <f>expr</f> + the cached <v>;
    // a SHARED formula writes the expression once (t="shared" with a
    // si group id) and follower cells carry only <f t="shared" si=.../>
    // plus their own cached <v>. The reader's contract: the cached
    // value, byte-exact, with the formula text (including any digits
    // in it) never leaking into the cell
    val rows = Xlsx.parseRows(workbook(
      """<row r="1">""" +
        """<c r="A1"><f>SUM(B1:B9)*100</f><v>42</v></c>""" +
        """<c r="B1"><f t="shared" ref="B1:B3" si="0">A1*2</f><v>84</v></c>""" +
        """</row>""" +
        """<row r="2"><c r="B2"><f t="shared" si="0"/><v>86</v></c></row>""" +
        """<row r="3"><c r="B3" t="str"><f t="shared" si="0"/><v>err</v></c></row>"""))
    assert(rows === Seq(Seq("42", "84"), Seq("", "86"), Seq("", "err")))
  }

  test("multi-sheet workbook reads the LOWEST-numbered sheet regardless of zip order") {
    // external writers store worksheet entries in arbitrary zip order;
    // the reader must select sheet1 by NUMBER, not first-seen
    val dir = Files.createTempDirectory("xm")
    val f = dir.resolve("m.xlsx")
    val zos = new ZipOutputStream(Files.newOutputStream(f))
    def sheet(v: String) =
      """<?xml version="1.0"?><worksheet xmlns="x"><sheetData>""" +
        s"""<row r="1"><c r="A1"><v>$v</v></c></row>""" +
        """</sheetData></worksheet>"""
    def entry(n: String, b: String): Unit = {
      zos.putNextEntry(new ZipEntry(n)); zos.write(b.getBytes); zos.closeEntry()
    }
    entry("xl/worksheets/sheet10.xml", sheet("wrong-10"))
    entry("xl/worksheets/sheet2.xml", sheet("wrong-2"))
    entry("xl/worksheets/sheet1.xml", sheet("right"))
    zos.close()
    assert(Xlsx.parseRows(Files.readAllBytes(f)) === Seq(Seq("right")))
  }
}
