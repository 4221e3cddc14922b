package graft

import java.nio.charset.StandardCharsets
import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.Pdf

/** Structural + round-trip pins for the hand-written PDF 1.4 writer.
  * The oracle gate (`sink_report_pdf`) checks the TEXT round-trip on
  * the real changelog; this spec checks what an oracle can't — byte
  * layout, xref integrity, pagination, determinism, and escaping edge
  * cases.
  */
class PdfSpec extends AnyFunSuite {

  private def doc(lines: Seq[String], lpp: Int = Pdf.DefaultLinesPerPage) =
    Pdf.render(lines, lpp)

  private def ascii(b: Array[Byte]) = new String(b, StandardCharsets.ISO_8859_1)

  test("header, binary marker, and EOF framing") {
    val d = ascii(doc(Seq("hello")))
    assert(d.startsWith("%PDF-1.4\n"))
    assert(d.charAt(9) == '%' && (d.charAt(10) & 0xFF) > 127,
      "binary-content marker comment expected after the version line")
    assert(d.endsWith("%%EOF\n"))
  }

  test("xref offsets all point at their own 'N 0 obj' header") {
    val d = ascii(doc((1 to 130).map(i => s"line $i"), lpp = 60))
    val sx = d.lastIndexOf("startxref\n")
    val xrefAt = d.substring(sx + 10).trim.takeWhile(_.isDigit).toLong
    assert(d.startsWith("xref", xrefAt.toInt))
    val table = d.substring(xrefAt.toInt)
    val header = table.linesIterator.drop(1).next()
    val Array(first, count) = header.split(" ").map(_.toInt)
    assert(first == 0)
    // 3 pages at 60 lpp: 1 catalog + 1 pages + 1 font + 3*(page+content) = 9 objs
    assert(count == 10, s"expected 10 xref entries, got $count")
    val entries = table.linesIterator.drop(2).take(count).toSeq
    assert(entries.head.startsWith("0000000000 65535 f"))
    entries.tail.zipWithIndex.foreach { case (e, i) =>
      val off = e.take(10).toInt
      val objNum = i + 1
      assert(d.startsWith(s"$objNum 0 obj", off),
        s"xref entry $objNum -> offset $off does not start an object")
    }
  }

  test("page tree count and kids match pagination") {
    val d = ascii(doc((1 to 130).map(_.toString), lpp = 60))
    assert(d.contains("/Count 3"))
    assert(d.contains("/Kids [4 0 R 6 0 R 8 0 R]"))
    // content stream /Length declarations are byte-accurate
    val lenRe = "/Length (\\d+) >>\nstream\n".r
    lenRe.findAllMatchIn(d).foreach { m =>
      val start = m.end
      val end = d.indexOf("endstream", start)
      assert(end - start == m.group(1).toInt + 0,
        "declared /Length must equal stream byte count")
    }
  }

  test("text round-trips across pages, in order") {
    val lines = (1 to 130).map(i => s"row $i of the report")
    assert(Pdf.extractLines(doc(lines, lpp = 60)) == lines)
  }

  test("escaping round-trips parens, backslashes, and Latin-1") {
    val lines = Seq("paren (nested (deep)) end", "back\\slash \\( literal",
      "café façade ß", "", "  leading and trailing  ")
    assert(Pdf.extractLines(doc(lines)) == lines)
  }

  test("non-Latin-1 degrades to '?' rather than corrupting the stream") {
    assert(Pdf.extractLines(doc(Seq("ok 中文 end"))) ==
      Seq("ok ?? end"))
  }

  test("empty input still renders one valid, empty page") {
    val d = doc(Seq.empty)
    assert(ascii(d).contains("/Count 1"))
    assert(Pdf.extractLines(d).isEmpty)
  }

  test("text containing PDF structural keywords round-trips") {
    // extraction slices by declared /Length — a rendered line that
    // itself says "endstream" or "stream" must not truncate the scan
    val lines = Seq("see endstream marker", "stream\nof thought",
      "xref table notes", "%%EOF is not the end here")
    assert(Pdf.extractLines(doc(lines)) == lines)
  }

  test("render is byte-deterministic") {
    val lines = Seq("a", "b (c)", "d\\e")
    assert(doc(lines).sameElements(doc(lines)))
  }
}
