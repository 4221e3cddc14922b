package graft

import org.apache.spark.sql.functions._
import graft.operators.TimeSeries

/** EWMA semantics: seeded-left-fold recurrence, (ts, seq) ordering,
  * null handling, and the binary-exact-α requirement.
  */
class TimeSeriesSpec extends SparkFunSuite {
  import spark.implicits._

  private def run(rows: Seq[(Long, Long, Long, java.lang.Double)],
                  alpha: Double = 0.25): Map[Long, (Long, Double)] =
    TimeSeries.ewma(
        rows.toDF("user_id", "ts_us", "event_id", "value"),
        "user_id", col("ts_us"), col("event_id"), col("value"), alpha)
      .as[(Long, Long, Double)].collect()
      .map { case (u, n, e) => u -> (n, e) }.toMap

  test("recurrence matches the hand-computed seeded left fold") {
    // e1 = 8, e2 = .25*4 + .75*8 = 7, e3 = .25*16 + .75*7 = 9.25
    val got = run(Seq(
      (1L, 10L, 1L, 8.0), (1L, 20L, 2L, 4.0), (1L, 30L, 3L, 16.0)))
    assert(got === Map(1L -> ((3L, 9.25))))
  }

  test("fold order is (ts, seq), not arrival order") {
    // same multiset, shuffled input rows; ties on ts break by event_id
    val got = run(Seq(
      (1L, 30L, 3L, 16.0), (1L, 10L, 1L, 8.0), (1L, 20L, 2L, 4.0),
      (2L, 10L, 2L, 4.0), (2L, 10L, 1L, 8.0))) // tied ts → id order
    assert(got(1L) === ((3L, 9.25)))
    // u2: e1 = 8 (id 1 first), e2 = .25*4 + .75*8 = 7
    assert(got(2L) === ((2L, 7.0)))
  }

  test("single observation returns itself; null values are skipped") {
    val got = run(Seq(
      (1L, 10L, 1L, 5.5),
      (2L, 10L, 1L, null), (2L, 20L, 2L, 8.0)))
    assert(got === Map(1L -> ((1L, 5.5)), 2L -> ((1L, 8.0))))
  }

  test("users with only null observations are absent") {
    val got = run(Seq((1L, 10L, 1L, null)))
    assert(got.isEmpty)
  }

  test("alpha outside (0,1) is rejected") {
    val one = Seq((1L, 1L, 1L, java.lang.Double.valueOf(1.0)))
    intercept[IllegalArgumentException](run(one, 1.0))
    intercept[IllegalArgumentException](run(one, 0.0))
  }
}
