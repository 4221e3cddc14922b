package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.Cohort

/** Retention semantics: cohort = first active week, offsets count
  * whole weeks, counts are distinct entities, retention is relative
  * to the cohort's own size.
  */
class CohortSpec extends SparkFunSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s + " 12:00:00")

  private def run(rows: Seq[(Long, Timestamp)]) =
    Cohort.retention(rows.toDF("user_id", "ts"), "user_id", col("ts"))
      .select(col("cohort_week").cast("string"), col("week_offset"),
        col("active_users"), col("retention"))
      .as[(String, Long, Long, Double)].collect()
      .map { case (c, o, a, r) => (c, o) -> ((a, r)) }.toMap

  test("triangle counts distinct users per (cohort, offset)") {
    // 2024-01-01 is a Monday. u1,u2 cohort W0; u1 returns W1 twice
    // (still one active row), u2 never returns; u3 cohort W1.
    val got = run(Seq(
      (1L, ts("2024-01-01")), (1L, ts("2024-01-08")),
      (1L, ts("2024-01-10")), (2L, ts("2024-01-03")),
      (3L, ts("2024-01-09"))))
    assert(got === Map(
      ("2024-01-01", 0L) -> ((2L, 1.0)),
      ("2024-01-01", 1L) -> ((1L, 0.5)),
      ("2024-01-08", 0L) -> ((1L, 1.0))))
  }

  test("offset-0 always present, retention 1.0, even with gaps") {
    // active W0 and W3 only — offsets {0, 3}, no 1/2 rows
    val got = run(Seq((7L, ts("2024-01-02")), (7L, ts("2024-01-23"))))
    assert(got === Map(
      ("2024-01-01", 0L) -> ((1L, 1.0)),
      ("2024-01-01", 3L) -> ((1L, 1.0))))
  }

  test("sunday and monday of the same ISO week share a cohort") {
    val got = run(Seq((1L, ts("2024-01-08")), (2L, ts("2024-01-14"))))
    assert(got === Map(("2024-01-08", 0L) -> ((2L, 1.0))))
  }
}
