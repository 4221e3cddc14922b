package graft

import org.apache.spark.sql.functions._
import graft.operators.SkewJoin

/** Salted skew join: result must equal the plain join, including
  * duplicate right-side keys and hot left-side keys.
  */
class SkewJoinSpec extends SparkFunSuite {
  import spark.implicits._

  test("saltedJoin equals plain join on a skewed corpus") {
    // 90% of left rows share one hot key
    val left = (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong, i))
      .toDF("k", "v")
    val right = Seq((1L, "hot"), (950L, "cold"), (950L, "cold2")).toDF("k", "tag")
    val salted = SkewJoin.saltedJoin(left, right, "k", salt = 16)
      .select("k", "v", "tag").as[(Long, Int, String)].collect().sorted
    val plain = left.join(right, "k")
      .select("k", "v", "tag").as[(Long, Int, String)].collect().sorted
    assert(salted.length === 902) // 900 hot + 2 for the duplicate cold key
    assert(salted.toSeq === plain.toSeq)
  }

  test("salting actually scatters the hot key across sub-keys") {
    val left = (1 to 500).map(i => (1L, i)).toDF("k", "v")
    val scattered = left.withColumn("__salt",
      pmod(xxhash64(struct(left.columns.map(col).toIndexedSeq: _*)), lit(16)))
      .groupBy("__salt").count().collect()
    assert(scattered.length > 8) // hot key spread over most sub-keys
  }
}
