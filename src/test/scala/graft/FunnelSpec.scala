package graft

import java.sql.Timestamp
import graft.operators.Funnel

/** Ordered-funnel semantics: strict-after matching, out-of-order
  * events, repeats, and per-depth counting.
  */
class FunnelSpec extends SparkFunSuite {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
  private val steps = Seq("view", "click", "purchase")

  private def run(rows: Seq[(Long, Timestamp, Long, String)]): Map[Long, Long] =
    Funnel.depths(rows.toDF("user_id", "ts", "event_id", "event_type"),
        "user_id", "ts", "event_id", "event_type", steps)
      .as[(Long, Long)].collect().toMap

  test("depths: ordered, partial, out-of-order, and off-funnel users") {
    val got = run(Seq(
      // u1: full ordered funnel (with noise events ignored by filter)
      (1L, ts(1), 1L, "view"), (1L, ts(2), 2L, "error"),
      (1L, ts(3), 3L, "click"), (1L, ts(4), 4L, "purchase"),
      // u2: purchase BEFORE the view→click chain → depth 2
      (2L, ts(1), 5L, "purchase"), (2L, ts(2), 6L, "view"),
      (2L, ts(3), 7L, "click"),
      // u3: click only — first step never fires → depth 0
      (3L, ts(1), 8L, "click"),
      // u4: view then nothing else → depth 1
      (4L, ts(1), 9L, "view")
    ))
    assert(got === Map(1L -> 3L, 2L -> 2L, 3L -> 0L, 4L -> 1L))
  }

  test("strict-after: same-timestamp next step does not advance") {
    val got = run(Seq(
      (1L, ts(1), 1L, "view"), (1L, ts(1), 2L, "click"), // tied → no
      (2L, ts(1), 3L, "view"), (2L, ts(2), 4L, "click")  // later → yes
    ))
    assert(got === Map(1L -> 1L, 2L -> 2L))
  }

  test("earliest completion: repeats pick the first qualifying event") {
    // the LATER view must not reset progress; click matches after the
    // FIRST view even though a fresher view exists
    val got = run(Seq(
      (1L, ts(1), 1L, "view"), (1L, ts(5), 2L, "view"),
      (1L, ts(3), 3L, "click"), (1L, ts(4), 4L, "purchase")
    ))
    assert(got === Map(1L -> 3L))
  }

  test("report counts users at their exact stop depth") {
    val rep = Funnel.report(Seq(
        (1L, ts(1), 1L, "view"),
        (2L, ts(1), 2L, "view"), (2L, ts(2), 3L, "click"),
        (3L, ts(1), 4L, "purchase")
      ).toDF("user_id", "ts", "event_id", "event_type"),
      "user_id", "ts", "event_id", "event_type", steps)
      .as[(Long, Long)].collect().toMap
    assert(rep === Map(0L -> 1L, 1L -> 1L, 2L -> 1L))
  }
}
