package graft

import org.apache.spark.sql.functions._
import graft.ingest.TableStats

class TableStatsSpec extends SparkFunSuite {
  import spark.implicits._

  test("columnStats: nulls, NDV, min/max; empty table yields zeros") {
    val df = Seq(
      (Some(1L), Some(2.5), Some("a")),
      (Some(1L), None, Some("b")),
      (None, Some(7.5), Some("a"))).toDF("k", "v", "s")
    val out = TableStats.columnStats(df, Seq("k", "v"), Seq("s"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3)), Option(r.get(4)))))
      .toMap
    assert(out("k") == ((1L, 1L, Some(1.0), Some(1.0))))
    assert(out("v") == ((1L, 2L, Some(2.5), Some(7.5))))
    assert(out("s") == ((0L, 2L, None, None)))

    val empty = TableStats.columnStats(df.filter(lit(false)),
      Seq("k"), Seq("s")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(empty("k") == ((0L, 0L)), "empty table must report 0, not NULL")
    assert(empty("s") == ((0L, 0L)))
  }

  test("columnStats rejects duplicate or empty column requests") {
    val df = Seq((1L, "x")).toDF("k", "s")
    intercept[IllegalArgumentException] {
      TableStats.columnStats(df, Seq("k"), Seq("k"))
    }
    intercept[IllegalArgumentException] {
      TableStats.columnStats(df, Nil, Nil)
    }
  }

  test("columnStats plans ONE scan of the input for all columns") {
    val df = spark.read.parquet(s"$sfDir/orders.parquet")
    val plan = TableStats.columnStats(df,
      Seq("o_orderkey", "o_totalprice"), Seq("o_orderstatus"))
      .queryExecution.executedPlan.toString
    val scans = plan.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans == 1, s"expected one scan, saw $scans:\n" + plan.take(1200))
  }
}
