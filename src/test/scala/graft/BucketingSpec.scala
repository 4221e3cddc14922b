package graft

import org.apache.spark.sql.functions._
import graft.operators.Bucketing

/** Bucketed co-located join: same-bucketed tables must join with no
  * shuffle exchange (the write-once-shuffle-never pattern for repeated
  * big-table joins).
  */
class BucketingSpec extends SparkFunSuite {
  import spark.implicits._

  test("same-bucketed tables join without a shuffle exchange") {
    val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "vb")
    Bucketing.writeBucketed(a, "bkt_a", "k", 4)
    Bucketing.writeBucketed(b, "bkt_b", "k", 4)
    val broadcastBefore = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force the sort-merge path a big-table join would take: broadcast
    // would mask the bucketing (planner disables it when it broadcasts)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.colocatedJoin(spark, "bkt_a", "bkt_b", "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"bucketed join should be shuffle-free:\n$plan")
      assert(plan.contains("Bucketed: true"),
        s"scan did not use buckets:\n$plan")
      assert(joined.count() === 1000)
      // and the data is actually right
      val r = joined.filter($"k" === 7L).select("va", "vb")
        .as[(String, Double)].head()
      assert(r === (("a7", 14.0)))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", broadcastBefore)
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }

  test("dedup path tolerates null and empty text without corrupting pairs") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"),
      (3L, null.asInstanceOf[String]),
      (4L, ""),
      (5L, "   ")).toDF("doc_id", "text")
    val pairs = graft.operators.Dedup
      .minhashPairs(docs, "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L))) // exact dup found
    // null text drops out (null-intolerant expressions), it must never pair
    assert(!pairs.exists { case (x, y) => x == 3L || y == 3L })
    // empty/whitespace docs hash to the same empty shingle — they may pair
    // with each other but never with real text
    assert(!pairs.exists { case (x, y) => Set(x, y).intersect(Set(1L, 2L)).nonEmpty &&
      Set(x, y).intersect(Set(4L, 5L)).nonEmpty })
  }
}
