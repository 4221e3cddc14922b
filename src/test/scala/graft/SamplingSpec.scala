package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

/** Deterministic content-hash sampling: reproducibility under
  * re-partitioning (the property rand()-based sampling lacks), fraction
  * accuracy, and sampleBy-compatible stratum dropping.
  */
class SamplingSpec extends SparkFunSuite {
  import spark.implicits._

  private def corpus = spark.range(0, 10000).toDF("id")
    .withColumn("grp", (col("id") % 4).cast("string"))

  test("deterministicSample: same rows regardless of partitioning") {
    val a = Sampling.deterministicSample(corpus, col("id"), 0.3)
      .select("id").as[Long].collect().toSet
    val b = Sampling.deterministicSample(corpus.repartition(7, col("grp")),
      col("id"), 0.3).select("id").as[Long].collect().toSet
    assert(a === b)
    // fraction lands near the target (hash-uniformity)
    assert(math.abs(a.size / 10000.0 - 0.3) < 0.02)
  }

  test("assignSplits: exhaustive, disjoint, proportional, growth-stable") {
    val out = Sampling.assignSplits(corpus, col("id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val bySplit = out.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    // every row gets exactly one split
    assert(bySplit.values.sum == 10000L)
    assert(math.abs(bySplit("train") / 10000.0 - 0.8) < 0.03)
    assert(math.abs(bySplit("val") / 10000.0 - 0.1) < 0.02)
    assert(math.abs(bySplit("test") / 10000.0 - 0.1) < 0.02)
    // growth stability: a doc's split is a pure function of its id —
    // the half-corpus assigns identically
    val half = Sampling.assignSplits(
      corpus.filter(col("id") < 5000), col("id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("id", "split").as[(Long, String)].collect().toMap
    val full = out.select("id", "split").as[(Long, String)].collect().toMap
    half.foreach { case (id, sp) => assert(full(id) == sp, s"id $id moved") }
  }

  test("assignSplits rejects bad fractions") {
    intercept[IllegalArgumentException] {
      Sampling.assignSplits(corpus, col("id"), Seq("a" -> 0.5, "b" -> 0.4))
    }
    intercept[IllegalArgumentException] {
      Sampling.assignSplits(corpus, col("id"), Seq.empty)
    }
  }

  test("stratifiedSample: per-stratum fractions, absent strata dropped") {
    val s = Sampling.stratifiedSample(corpus, col("grp"), col("id"),
      Map("0" -> 0.5, "1" -> 0.1))
    val byGrp = s.groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(byGrp.keySet === Set("0", "1")) // "2","3" dropped
    assert(math.abs(byGrp("0") / 2500.0 - 0.5) < 0.05)
    assert(math.abs(byGrp("1") / 2500.0 - 0.1) < 0.05)
    // deterministic: second run identical
    val again = Sampling.stratifiedSample(corpus, col("grp"), col("id"),
      Map("0" -> 0.5, "1" -> 0.1)).select("id").as[Long].collect().toSet
    assert(again === s.select("id").as[Long].collect().toSet)
  }
}
