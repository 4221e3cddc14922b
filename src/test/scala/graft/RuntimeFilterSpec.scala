package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Shim

import graft.expressions.{BloomBuildAgg, BloomMightContain, BloomUtil}
import graft.operators.RuntimeFilter

/** Bloom runtime filter: no false negatives ever, measured false
  * positives near the designed rate, and the operator's result exactly
  * equal to the plain semi-join it accelerates.
  */
class RuntimeFilterSpec extends SparkFunSuite {
  import spark.implicits._

  private def buildBloom(keys: Seq[Long], numBits: Int, k: Int): Array[Byte] =
    keys.toDF("k")
      .select(Shim.column(BloomBuildAgg(
        Shim.expression(col("k")), numBits, k)).as("bf"))
      .head().getAs[Array[Byte]]("bf")

  test("no false negatives; FPR near design point") {
    val members = (0L until 1000L).map(_ * 7919L)
    val bloom = buildBloom(members, numBits = 16384, k = 8)
    val probe = BloomMightContain(Shim.expression(lit(0L)), bloom, 8)
    members.foreach(m => assert(probe.compute(m), s"false negative for $m"))
    val nonMembers = (1L to 20000L).map(i => i * 7919L + 1L)
    val fp = nonMembers.count(probe.compute)
    // 16384 bits / 1000 keys ≈ 16 bits/key, k=8 → FPR ≈ 5e-4; allow 10×
    assert(fp <= 100, s"FPR too high: $fp/20000")
  }

  test("partial bitsets OR-merge to the same filter as one pass") {
    val keys = (0L until 512L).map(_ * 31L)
    val once = buildBloom(keys, 8192, 8)
    val (lo, hi) = keys.splitAt(256)
    val merged = (BloomUtil.fromBytes(buildBloom(lo, 8192, 8)),
      BloomUtil.fromBytes(buildBloom(hi, 8192, 8))) match {
      case (a, b) => BloomUtil.toBytes(a.zip(b).map { case (x, y) => x | y })
    }
    assert(java.util.Arrays.equals(once, merged))
  }

  test("bloomSemiJoin equals the plain left-semi join on driver tables") {
    val fact = queries.t(spark, sfDir, "lineitem")
    val dim = queries.t(spark, sfDir, "supplier")
      .filter(col("s_acctbal") > 5000)
    val got = RuntimeFilter.bloomSemiJoin(fact, "l_suppkey", dim, "s_suppkey")
      .select("l_orderkey", "l_linenumber").as[(Long, Long)].collect().sorted
    val want = fact
      .join(dim.select(col("s_suppkey").as("l_suppkey")),
        Seq("l_suppkey"), "left_semi")
      .select("l_orderkey", "l_linenumber").as[(Long, Long)].collect().sorted
    assert(got.length > 0 && got.toSeq === want.toSeq)
  }

  test("null fact keys are dropped, matching semi-join semantics") {
    val fact = Seq(Some(1L), None, Some(2L)).toDF("k")
    val dim = Seq(1L).toDF("j")
    val got = RuntimeFilter.bloomSemiJoin(fact, "k", dim, "j")
      .as[Option[Long]].collect()
    assert(got.toSeq === Seq(Some(1L)))
  }
}
