package graft

import graft.operators.AsofJoin

/** As-of join semantics: latest right row with rt <= lt per key, ties
  * match, no prior row → NULL, keys never cross.
  */
class AsofJoinSpec extends SparkFunSuite {
  import spark.implicits._

  test("asofJoin: hand-checked timeline") {
    val quotes = Seq( // (sym, t, px)
      ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
      ("B", 15L, 9.0)
    ).toDF("sym", "t", "px")
    val trades = Seq( // (sym, t, qty)
      ("A", 5L, 100L),  // before any quote -> null
      ("A", 10L, 101L), // tie -> 1.0
      ("A", 25L, 102L), // -> 2.0
      ("A", 99L, 103L), // -> 3.0
      ("B", 20L, 104L), // -> 9.0 (A quotes invisible)
      ("C", 50L, 105L)  // no quotes for key -> null
    ).toDF("sym", "t", "qty")
    val out = AsofJoin.asofJoin(trades, quotes, Seq("sym"), "t", Seq("px"))
      .select("qty", "px").as[(Long, Option[Double])].collect().toMap
    assert(out === Map(
      100L -> None, 101L -> Some(1.0), 102L -> Some(2.0),
      103L -> Some(3.0), 104L -> Some(9.0), 105L -> None))
  }

  test("asofJoin: a matched right row's NULL payload survives (no stale fill)") {
    val quotes = Seq( // (sym, t, px) — the t=20 quote has a NULL price
      ("A", 10L, Some(1.0)), ("A", 20L, None), ("A", 30L, Some(3.0))
    ).toDF("sym", "t", "px")
    val trades = Seq(("A", 25L, 102L)).toDF("sym", "t", "qty")
    val out = AsofJoin.asofJoin(trades, quotes, Seq("sym"), "t", Seq("px"))
      .select("qty", "px").as[(Long, Option[Double])].collect().toMap
    // matched row is the t=20 quote; its NULL must NOT be replaced by t=10's 1.0
    assert(out === Map(102L -> None))
  }

  test("asofJoin: same-(key,time) right rows tie-break deterministically") {
    val quotes = Seq(("A", 10L, 1.0), ("A", 10L, 7.0), ("A", 10L, 4.0))
      .toDF("sym", "t", "px").repartition(3)
    val trades = Seq(("A", 15L, 100L)).toDF("sym", "t", "qty")
    val got = (1 to 5).map { _ =>
      AsofJoin.asofJoin(trades, quotes, Seq("sym"), "t", Seq("px"))
        .select("px").as[Double].collect().head
    }
    assert(got.distinct === Seq(7.0), s"non-deterministic tie-break: $got")
  }

  test("asofJoin plans one shuffle (union+window, no range join)") {
    val quotes = Seq(("A", 10L, 1.0)).toDF("sym", "t", "px")
    val trades = Seq(("A", 25L, 102L)).toDF("sym", "t", "qty")
    val plan = AsofJoin.asofJoin(trades, quotes, Seq("sym"), "t", Seq("px"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "as-of must not plan a join:\n" + plan)
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges === 1, s"expected exactly one key shuffle, got $exchanges")
  }

  test("asofJoin tolerance: stale matches null out, fresh ones survive") {
    import org.apache.spark.sql.functions.lit
    val quotes = Seq(("A", 10L, 1.0), ("A", 50L, 5.0))
      .toDF("sym", "t", "px")
    val trades = Seq(
      ("A", 12L, 100L), // matched t=10, age 2  <= 5 -> 1.0
      ("A", 40L, 101L), // matched t=10, age 30 >  5 -> null (not t=50!)
      ("A", 55L, 102L), // matched t=50, age 5  <= 5 -> 5.0
      ("A", 56L, 103L)  // matched t=50, age 6  >  5 -> null
    ).toDF("sym", "t", "qty")
    val out = AsofJoin.asofJoin(trades, quotes, Seq("sym"), "t", Seq("px"),
        tolerance = Some(lit(5L)))
      .select("qty", "px").as[(Long, Option[Double])].collect().toMap
    assert(out === Map(100L -> Some(1.0), 101L -> None,
      102L -> Some(5.0), 103L -> None))
  }
}
