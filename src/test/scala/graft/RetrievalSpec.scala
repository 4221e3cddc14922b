package graft

import org.apache.spark.sql.functions._
import graft.operators.Retrieval

/** RRF hybrid-retrieval fusion: hand-computed ranks and scores, absent
  * ids, tie-breaks, and the window-free plan contract.
  */
class RetrievalSpec extends SparkFunSuite {
  import spark.implicits._

  test("topKRanked: order, tie-break on id, and the k cut") {
    val df = Seq((1L, 0.5), (2L, 0.9), (3L, 0.5), (4L, 0.1))
      .toDF("id", "s")
    val got = Retrieval.topKRanked(df, "id", "s", k = 3)
      .as[(Long, Int)].collect().toSeq
    // 0.9 first, then the 0.5 tie resolves by id asc, 0.1 cut away
    assert(got === Seq((2L, 1), (1L, 2), (3L, 3)))
  }

  test("rrfFuse: hand-computed RRF with an id absent from one list") {
    val a = Seq((10L, 1), (11L, 2)).toDF("id", "rk")
    val b = Seq((11L, 1), (12L, 2)).toDF("id", "rk")
    val got = Retrieval.rrfFuse(Seq("a" -> a, "b" -> b), "id",
        kConst = 60, topK = 10)
      .as[(Long, Option[Int], Option[Int], Double, Int)].collect()
      .map(r => r._1 -> r).toMap
    // 11 hits both lists: 1/62 + 1/61
    val s11 = math.rint((1.0 / 62 + 1.0 / 61) * 1e6) / 1e6
    assert(got(11L) === ((11L, Some(2), Some(1), s11, 1)))
    // 10 only in a at rank 1: 1/61; 12 only in b at rank 2: 1/62
    val s10 = math.rint(1.0 / 61 * 1e6) / 1e6
    assert(got(10L) === ((10L, Some(1), None, s10, 2)))
    val s12 = math.rint(1.0 / 62 * 1e6) / 1e6
    assert(got(12L) === ((12L, None, Some(2), s12, 3)))
  }

  test("rrf tie between ids in symmetric positions breaks by id") {
    // 20 is rank 1 in a / rank 2 in b; 21 is rank 2 in a / rank 1 in b
    val a = Seq((21L, 2), (20L, 1)).toDF("id", "rk")
    val b = Seq((21L, 1), (20L, 2)).toDF("id", "rk")
    val got = Retrieval.rrfFuse(Seq("a" -> a, "b" -> b), "id")
      .select("id", "rank").as[(Long, Int)].collect().toSeq
    assert(got === Seq((20L, 1), (21L, 2)))
  }

  test("plans stay window-free (TakeOrderedAndProject, no WindowExec)") {
    val df = (1L to 100L).map(i => (i, (i % 7).toDouble)).toDF("id", "s")
    val ranked = Retrieval.topKRanked(df, "id", "s", k = 5)
    val fused = Retrieval.rrfFuse(Seq("x" -> ranked), "id")
    for (plan <- Seq(ranked, fused)) {
      val phys = plan.queryExecution.executedPlan.toString
      assert(!phys.contains("Window"), phys)
      assert(phys.contains("TakeOrderedAndProject"), phys)
    }
  }
}
