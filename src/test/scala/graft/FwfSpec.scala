package graft

import java.nio.file.Files
import graft.sources.Fwf

/** Fixed-width reader edges the oracle round-trip can't reach: ragged
  * short lines, blank-line skips, empty-slice null casts, and the
  * spec-validation guards.
  */
class FwfSpec extends SparkFunSuite {

  private def write(lines: String*): String = {
    val dir = Files.createTempDirectory("fwf")
    Files.writeString(dir.resolve("a.dat"), lines.mkString("\n"))
    dir.toString
  }

  private val cols = Seq(
    Fwf.Col("name", 1, 6),
    Fwf.Col("qty", 7, 4, "int"),
    Fwf.Col("grp", 11, 3))

  // name(6) | qty(4, right-just) | grp(3)
  private def line(n: String, q: String, g: String): String =
    n.padTo(6, ' ') + q.reverse.padTo(4, ' ').reverse + g.padTo(3, ' ')

  test("carves columns at 1-based positions with trim and cast") {
    val dir = write(
      line("tuna", "12", "a"),
      line("cod", "7", "bb"))
    val rows = Fwf.read(spark, dir, cols)
      .orderBy("name").collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    assert(rows.toSeq === Seq(("cod", 7, "bb"), ("tuna", 12, "a")))
  }

  test("ragged short lines null-fill; blank lines skip") {
    val dir = write(
      line("eel", "9", "zz"),
      "",
      "shrimp")
    val df = Fwf.read(spark, dir, cols).orderBy("name")
    val rows = df.collect()
    assert(rows.length === 2)
    val shrimp = rows.find(_.getString(0) == "shrimp").get
    // r15 null contract: an all-blank field IS the FWF encoding of
    // NULL — string fields read blank -> NULL, same as the typed
    // fields' try_cast('')
    assert(shrimp.isNullAt(1) && shrimp.isNullAt(2))
  }

  test("empty numeric slice parses to null, not zero") {
    val dir = write("crab      ")
    val r = Fwf.read(spark, dir, cols).collect().head
    assert(r.getString(0) === "crab" && r.isNullAt(1))
  }

  test("guards: 1-based positions, positive widths, unique names") {
    intercept[IllegalArgumentException](Fwf.Col("x", 0, 3))
    intercept[IllegalArgumentException](Fwf.Col("x", 1, 0))
    intercept[IllegalArgumentException](
      Fwf.read(spark, "/tmp", Seq(Fwf.Col("a", 1, 2), Fwf.Col("a", 3, 2))))
  }
}
