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
    // auto width: same exact output, and the chosen width sits at the
    // cost model's optimum sqrt(La*Lb) — mean lengths ~14.5 and ~5.5
    // here, so w* ∈ [6, 12]
    val wAuto = IntervalJoin.autoCellWidth(a, b, "a_lo", "a_hi",
      "b_lo", "b_hi")
    assert(wAuto >= 6L && wAuto <= 12L, s"auto width $wAuto off-model")
    val auto = IntervalJoin.overlapAuto(a, b, "a_lo", "a_hi", "b_lo", "b_hi")
      .select("a_id", "b_id").as[(Long, Long)].collect().sorted.toSeq
    assert(auto === naive, "auto width diverged")
    // the per-cell volume bound kicks in when maxCellPairs is tiny:
    // width drops toward 1 but the result stays exact
    val wTight = IntervalJoin.autoCellWidth(a, b, "a_lo", "a_hi",
      "b_lo", "b_hi", maxCellPairs = 1.0)
    assert(wTight === 1L, s"tight bound chose $wTight")
    val tight = IntervalJoin.overlapAuto(a, b, "a_lo", "a_hi",
        "b_lo", "b_hi", maxCellPairs = 1.0)
      .select("a_id", "b_id").as[(Long, Long)].collect().sorted.toSeq
    assert(tight === naive, "tight-bound width diverged")
  }

  test("autoCellWidth: empty side, degenerate zero-length intervals") {
    val a = af((1L, 5L, 5L), (2L, 9L, 9L))
    val b = bf()
    assert(IntervalJoin.autoCellWidth(a, b, "a_lo", "a_hi",
      "b_lo", "b_hi") === 1L)
    // zero mean lengths floor at 1 → width 1, never 0
    val b2 = bf((3L, 5L, 5L))
    assert(IntervalJoin.autoCellWidth(a, b2, "a_lo", "a_hi",
      "b_lo", "b_hi") === 1L)
    val got = IntervalJoin.overlapAuto(a, b2, "a_lo", "a_hi",
        "b_lo", "b_hi")
      .select("a_id", "b_id").as[(Long, Long)].collect().sorted.toSeq
    assert(got === Seq((1L, 3L)))
  }
}
