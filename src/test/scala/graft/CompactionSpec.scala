package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.Compaction

/** Compaction: file count collapses to the byte-derived target, rows
  * and values survive the rewrite bit-for-bit.
  */
class CompactionSpec extends SparkFunSuite {
  import spark.implicits._

  test("collapses a many-small-files directory; preserves every row") {
    val dir = Files.createTempDirectory("graft_compact").toString
    val in = s"$dir/in"
    val out = s"$dir/out"
    // 64 tiny files
    (1 to 10000).map(i => (i.toLong, s"row$i")).toDF("id", "s")
      .repartition(64).write.parquet(in)
    val stats = Compaction.compact(spark, in, out, targetBytes = 256L * 1024)
    assert(stats.filesBefore === 64L)
    assert(stats.filesAfter < 8L,
      s"expected <8 compacted files, got ${stats.filesAfter}")
    val got = spark.read.parquet(out).as[(Long, String)].collect().sortBy(_._1)
    assert(got.length === 10000 && got.head === ((1L, "row1")))
  }

  test("hive-partitioned input is sized from the RECURSIVE listing") {
    val dir = Files.createTempDirectory("graft_compact3").toString
    (1 to 4000).map(i => (i.toLong, i % 3, s"v$i")).toDF("id", "p", "s")
      .repartition(16).write.partitionBy("p").parquet(s"$dir/in")
    val stats = Compaction.compact(spark, s"$dir/in", s"$dir/out",
      targetBytes = 64L * 1024)
    // top-level listing would have seen 0 files / 0 bytes -> 1 file
    assert(stats.filesBefore >= 16L, s"recursive census missed files: $stats")
    assert(stats.bytes > 0L)
    assert(stats.filesAfter > 1L,
      s"partitioned input funneled to one file: $stats")
    val got = spark.read.parquet(s"$dir/out")
    assert(got.count() === 4000L)
    assert(got.columns.toSet === Set("id", "p", "s"),
      "partition column lost in the rewrite")
  }

  test("refuses to clobber an existing output directory") {
    val dir = Files.createTempDirectory("graft_compact2").toString
    Seq((1, "a")).toDF("id", "s").write.parquet(s"$dir/in")
    Seq((2, "b")).toDF("id", "s").write.parquet(s"$dir/out")
    intercept[Exception] {
      Compaction.compact(spark, s"$dir/in", s"$dir/out")
    }
  }
}
