package graft

import java.nio.file.Files
import scala.util.Random

import org.apache.spark.sql.functions._
import graft.ingest.Pdf
import graft.sources.Fwf

/** Seeded randomized fuzzing of the round-8 operators (the FuzzSpec
  * convention): many small adversarial shapes per property,
  * deterministic seed so a failure reproduces.
  */
class R8FuzzSpec extends SparkFunSuite {
  import spark.implicits._

  test("Pdf: 30 random documents of hostile text round-trip exactly") {
    val rnd = new Random(8)
    def randLine(): String = {
      val pool = "ab(}) \\()\t%häö—中stream endstream Tj BT %%EOF 0123"
      (0 until rnd.nextInt(60)).map(_ => pool(rnd.nextInt(pool.length)))
        .mkString
    }
    for (trial <- 1 to 30) {
      val lines = Seq.fill(rnd.nextInt(140))(randLine())
      // the writer's documented degradation: beyond-Latin-1 chars
      // render as '?', everything else must survive byte-exact
      val expected = lines.map(_.map(c =>
        if (c.toInt <= 255) c else '?'))
      val lpp = 1 + rnd.nextInt(70)
      assert(Pdf.extractLines(Pdf.render(lines, lpp)) == expected,
        s"trial $trial (lpp=$lpp, ${lines.size} lines)")
    }
  }

  test("Fwf: 20 random layouts encode -> carve back exactly") {
    val rnd = new Random(8)
    for (trial <- 1 to 20) {
      val nCols = 1 + rnd.nextInt(5)
      val widths = Seq.fill(nCols)(2 + rnd.nextInt(8))
      val starts = widths.scanLeft(1)(_ + _).init
      val nRows = 1 + rnd.nextInt(30)
      // cell content: digits or letters, never wider than the column,
      // no leading/trailing spaces (trim is lossy on those by design)
      val rows = Seq.fill(nRows)(widths.map { w =>
        val len = rnd.nextInt(w) // may be empty
        (0 until len).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      })
      val dir = Files.createTempDirectory("fwf_fuzz")
      Files.writeString(dir.resolve("d.dat"),
        rows.map(r => r.zip(widths).map { case (v, w) => v.padTo(w, ' ') }
          .mkString).mkString("\n"))
      val cols = starts.zip(widths).zipWithIndex.map {
        case ((st, w), i) => Fwf.Col(s"c$i", st, w)
      }
      val got = Fwf.read(spark, dir.toString, cols)
        .collect().map(r => (0 until nCols).map(r.getString))
      // all-empty rows render as all-space lines and carve back as
      // empty cells; rows order is not guaranteed — compare as bags
      val want = rows.map(_.map(_.trim))
      assert(got.map(_.mkString("|")).sorted.toSeq ===
        want.map(_.mkString("|")).sorted,
        s"trial $trial widths=$widths rows=$nRows")
    }
  }

  test("weightedQuantileExact: 25 random (data, fraction) match brute") {
    val rnd = new Random(8)
    for (trial <- 1 to 25) {
      val rows = Seq.fill(1 + rnd.nextInt(200))(
        (rnd.nextInt(50).toDouble / 4.0, 1L + rnd.nextInt(20).toLong))
      val den = 1L + rnd.nextInt(20)
      val num = 1L + rnd.nextInt(den.toInt)
      val (got, tw) = graft.operators.RobustStats.weightedQuantileExact(
        rows.toDF("v", "w"), col("v"), col("w"), num, den)
      val sorted = rows.sortBy(_._1)
      val total = rows.map(_._2).sum
      val thr = (BigInt(num) * total + den - 1) / den
      var acc = BigInt(0)
      val want = sorted.find { case (_, w) => acc += w; acc >= thr }.get._1
      assert(tw == total && got == want,
        s"trial $trial p=$num/$den n=${rows.size}")
    }
  }
}
