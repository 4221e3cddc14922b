package graft

import org.apache.spark.sql.functions._
import graft.operators.Spatial

/** Grid-bucketed radius join: hand cases (boundary distance inclusive,
  * cell-border points, cross-cell neighbors, no duplicate emits) plus
  * a randomized parity sweep against the naive quadratic join.
  */
class SpatialSpec extends SparkFunSuite {
  import spark.implicits._

  private def af(rows: (Long, Double, Double)*) =
    rows.toSeq.toDF("a_id", "ax", "ay")
  private def bf(rows: (Long, Double, Double)*) =
    rows.toSeq.toDF("b_id", "bx", "by")

  private def pairs(a: org.apache.spark.sql.DataFrame,
                    b: org.apache.spark.sql.DataFrame, r: Double) =
    Spatial.radiusJoin(a, b, "ax", "ay", "bx", "by", r)
      .select("a_id", "b_id").as[(Long, Long)].collect().sorted.toSeq

  test("distance exactly r is kept; just beyond is dropped") {
    val got = pairs(
      af((1L, 0.0, 0.0)),
      bf((2L, 3.0, 4.0), (3L, 3.0, 4.001)), r = 5.0)
    assert(got === Seq((1L, 2L)))
  }

  test("neighbors across cell borders are found exactly once") {
    // a sits at the top-right corner of cell (0,0); b lives in cell
    // (1,1) — only the 3×3 replication can meet it
    val got = pairs(af((1L, 0.99, 0.99)), bf((2L, 1.01, 1.01)), r = 1.0)
    assert(got === Seq((1L, 2L)))
  }

  test("coincident points pair at any radius and emit once") {
    val got = pairs(af((1L, 42.5, -7.25)), bf((2L, 42.5, -7.25)), r = 0.5)
    assert(got === Seq((1L, 2L)))
  }

  test("negative coordinates floor to the correct cells") {
    val got = pairs(
      af((1L, -2.1, -2.1)),
      bf((2L, -2.0, -2.0), (3L, 2.0, 2.0)), r = 1.0)
    assert(got === Seq((1L, 2L)))
  }

  test("cellWidth: w * subCells >= r exactly, for every subCells") {
    // fl(r/k)*k rounds below r for most non-power-of-two k; a width
    // one ULP short breaks the k-cell coverage proof (r13 ADVICE).
    val rnd = new scala.util.Random(7331)
    var bumped = 0
    for (_ <- 1 to 2000; k <- 1 to 16) {
      val r = math.exp(rnd.nextDouble() * 20 - 10) // 4.5e-5 .. 2.2e4
      val w = Spatial.cellWidth(r, k)
      assert(w * k >= r, s"cellWidth($r, $k) = $w: w*k < r")
      // and it stays essentially r/k — never a coarser-grid rewrite
      assert(w <= Math.nextUp(Math.nextUp(r / k)),
        s"cellWidth($r, $k) drifted above r/k")
      if (w != r / k) bumped += 1
    }
    assert(bumped > 0, "fixture never exercised the ULP-bump branch")
  }

  test("non-power-of-two subCells keep boundary pairs (parity, k=3,5,7)") {
    val rnd = new scala.util.Random(40714)
    def pts(ids: Range) = ids.map(i =>
      (i.toLong, rnd.nextDouble() * 20 - 10, rnd.nextDouble() * 20 - 10))
    val a = af(pts(1 to 150): _*)
    val b = bf(pts(1001 to 1120): _*)
    val r = 3.7
    val naive = a.crossJoin(b)
      .filter((col("ax") - col("bx")) * (col("ax") - col("bx"))
        + (col("ay") - col("by")) * (col("ay") - col("by"))
        <= lit(r * r))
      .select("a_id", "b_id").as[(Long, Long)].collect().sorted.toSeq
    assert(naive.nonEmpty)
    for (k <- Seq(3, 5, 7)) {
      val got = Spatial.radiusJoin(a, b, "ax", "ay", "bx", "by", r,
          subCells = k)
        .select("a_id", "b_id").as[(Long, Long)].collect().sorted.toSeq
      assert(got === naive, s"subCells=$k diverged")
    }
  }

  test("randomized parity with the naive quadratic join, 3 radii") {
    val rnd = new scala.util.Random(1123)
    def pts(ids: Range) = ids.map(i =>
      (i.toLong, rnd.nextDouble() * 60 - 30, rnd.nextDouble() * 60 - 30))
    val a = af(pts(1 to 250): _*)
    val b = bf(pts(1001 to 1200): _*)
    for (r <- Seq(0.8, 4.0, 50.0)) {
      val naive = a.crossJoin(b)
        .filter((col("ax") - col("bx")) * (col("ax") - col("bx"))
          + (col("ay") - col("by")) * (col("ay") - col("by"))
          <= lit(r * r))
        .select("a_id", "b_id").as[(Long, Long)].collect().sorted.toSeq
      assert(naive.nonEmpty, s"radius $r fixture is vacuous")
      assert(pairs(a, b, r) === naive, s"radius $r diverged")
      // sub-cell grid (k=2: r/2-wide cells, 5x5 replication) — the
      // dense-corpus physical plan — must be pair-for-pair identical
      val sub = Spatial.radiusJoin(a, b, "ax", "ay", "bx", "by", r,
          subCells = 2)
        .select("a_id", "b_id").as[(Long, Long)].collect().sorted.toSeq
      assert(sub === naive, s"radius $r subCells=2 diverged")
      // auto plan selection (side swap + density-derived k): same set
      val auto = Spatial.radiusJoinAuto(a, b, "ax", "ay", "bx", "by", r)
        .select("a_id", "b_id").as[(Long, Long)].collect().sorted.toSeq
      assert(auto === naive, s"radius $r auto diverged")
      // force the dense branch (k=2 via a tiny per-cell budget)
      val dense = Spatial.radiusJoinAuto(a, b, "ax", "ay", "bx", "by", r,
          maxCellPairs = 0.5)
        .select("a_id", "b_id").as[(Long, Long)].collect().sorted.toSeq
      assert(dense === naive, s"radius $r dense-auto diverged")
    }
  }
}
