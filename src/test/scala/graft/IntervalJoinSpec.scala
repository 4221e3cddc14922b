package graft

import org.apache.spark.sql.functions._
import graft.operators.IntervalJoin

/** Grid-bucketed interval-overlap join: hand cases (multi-cell pairs
  * emit once, closed endpoints, negatives, invalid intervals) plus a
  * randomized parity sweep against the naive quadratic join.
  */
class IntervalJoinSpec extends SparkFunSuite {
  import spark.implicits._

  private def af(rows: (Long, Long, Long)*) =
    rows.toSeq.toDF("a_id", "a_lo", "a_hi")
  private def bf(rows: (Long, Long, Long)*) =
    rows.toSeq.toDF("b_id", "b_lo", "b_hi")

  private def pairs(a: org.apache.spark.sql.DataFrame,
                    b: org.apache.spark.sql.DataFrame, w: Long) =
    IntervalJoin.overlap(a, b, "a_lo", "a_hi", "b_lo", "b_hi", w)
      .select("a_id", "b_id").as[(Long, Long)].collect().sorted.toSeq

  test("pair spanning many shared cells emits exactly once") {
    // both intervals cover cells 0..12 at width 8 — 13 shared cells
    val got = pairs(af((1L, 0L, 100L)), bf((2L, 5L, 99L)), w = 8)
    assert(got === Seq((1L, 2L)))
  }

  test("closed endpoints: touching intervals overlap; gap of 1 does not") {
    val got = pairs(
      af((1L, 0L, 10L), (2L, 0L, 10L)),
      bf((3L, 10L, 20L), (4L, 11L, 20L)), w = 4)
    // a1-b3 and a2-b3 touch at 10; 11 > 10 excludes b4
    assert(got === Seq((1L, 3L), (2L, 3L)))
  }

  test("negative coordinates floor to the correct cells") {
    val got = pairs(af((1L, -10L, -1L)), bf((2L, -3L, 5L), (3L, 0L, 5L)),
      w = 4)
    assert(got === Seq((1L, 2L)))
  }

  test("hi < lo rows are dropped, not exploded descending") {
    val got = pairs(af((1L, 10L, 0L), (2L, 0L, 5L)), bf((3L, 0L, 5L)),
      w = 4)
    assert(got === Seq((2L, 3L)))
  }

  test("randomized parity with the naive quadratic join, 3 widths") {
    val rnd = new scala.util.Random(421)
    val aRows = (1L to 200L).map { i =>
      val lo = rnd.nextInt(400).toLong - 50
      (i, lo, lo + rnd.nextInt(30))
    }
    val bRows = (1001L to 1200L).map { i =>
      val lo = rnd.nextInt(400).toLong - 50
      (i, lo, lo + rnd.nextInt(12))
    }
    val a = af(aRows: _*)
    val b = bf(bRows: _*)
    val naive = a.crossJoin(b)
      .filter(col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
      .select("a_id", "b_id").as[(Long, Long)].collect().sorted.toSeq
    assert(naive.nonEmpty)
    for (w <- Seq(1L, 7L, 64L))
      assert(pairs(a, b, w) === naive, s"width $w diverged")
  }
}
