package graft

import org.apache.spark.sql.functions.col
import graft.operators.Dsir

/** DSIR selection: target-likeness ordering, smoothing, determinism. */
class DsirSpec extends SparkFunSuite {
  import spark.implicits._

  private def docs3 = Seq(
    (1L, "xx yy xx yy xx yy", "tgt"),
    (2L, "xx yy xx yy", "raw"),
    (3L, "zz ww zz ww zz ww", "raw"))
    .toDF("doc_id", "text", "source")

  test("target-vocabulary docs outrank off-target docs") {
    val out = Dsir.select(docs3, "doc_id", "text",
      col("source") === "tgt", topK = 3)
      .as[(Long, Long, Long, Long)].collect().toList
    assert(out.map(_._1) == List(1L, 2L, 3L),
      s"target words xx/yy carry high ratio points: $out")
    // docs 1 and 2 share every bucket → identical avg points
    assert(out(0)._4 == out(1)._4)
    assert(out(1)._4 > out(2)._4)
  }

  test("token-less and null-text docs never rank") {
    val docs = Seq((1L, "xx yy", "tgt"), (2L, "", "raw"),
      (3L, null.asInstanceOf[String], "raw")).toDF("doc_id", "text", "source")
    val out = Dsir.select(docs, "doc_id", "text",
      col("source") === "tgt", topK = 10).collect()
    assert(out.map(_.getLong(0)).toSet == Set(1L))
  }

  test("topK bounds the selection; order is (avg_pts desc, doc_id)") {
    val out = Dsir.select(docs3, "doc_id", "text",
      col("source") === "tgt", topK = 1)
      .as[(Long, Long, Long, Long)].collect().toList
    assert(out.map(_._1) == List(1L), "tie at avg_pts breaks by doc_id")
  }

  test("deterministic across reruns") {
    val a = Dsir.select(docs3, "doc_id", "text",
      col("source") === "tgt", topK = 3).collect().toList
    val b = Dsir.select(docs3, "doc_id", "text",
      col("source") === "tgt", topK = 3).collect().toList
    assert(a == b)
  }

  test("add-one smoothing keeps empty-target selection total") {
    // no target rows at all: every bucket ratio collapses to the same
    // smoothed constant shape — selection still returns topK docs
    val out = Dsir.select(docs3, "doc_id", "text",
      col("source") === "nope", topK = 3).collect()
    assert(out.length == 3)
  }
}
