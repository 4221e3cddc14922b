package graft

import org.apache.spark.sql.functions._

/** Boundary pins for the agg_wmedian shape: exact weighted median as
  * first-row-past-⌈W/2⌉ over GlobalRank.withRunningTotal. The oracle
  * gate checks one corpus; this spec checks the threshold arithmetic
  * where it can actually go wrong — even/odd totals, a single heavy
  * weight, ties in the value column — against brute-force enumeration.
  */
class WeightedMedianSpec extends SparkFunSuite {

  private def wmedian(rows: Seq[(Double, Long)]): Double = {
    import spark.implicits._
    val df = rows.zipWithIndex
      .map { case ((v, w), i) => (v, i.toLong, w) }
      .toDF("v", "id", "w")
    val rt = graft.operators.GlobalRank.withRunningTotal(
      df, Seq(col("v"), col("id")), col("w"), "rk", "cw")
    rt.crossJoin(broadcast(df.agg(sum(col("w")).as("tw"))))
      .filter(col("cw") >= expr("(tw + 1) div 2"))
      .orderBy(col("rk")).limit(1)
      .select(col("v")).as[Double].head()
  }

  private def brute(rows: Seq[(Double, Long)]): Double = {
    val sorted = rows.sortBy(_._1)
    val total = rows.map(_._2).sum
    val threshold = (total + 1) / 2
    var acc = 0L
    sorted.find { case (_, w) => acc += w; acc >= threshold }.get._1
  }

  test("odd total weight: middle unit lands exactly") {
    val rows = Seq((1.0, 1L), (2.0, 1L), (3.0, 1L))
    assert(wmedian(rows) == 2.0)
    assert(wmedian(rows) == brute(rows))
  }

  test("even total weight: lower median by the ceil-threshold contract") {
    val rows = Seq((1.0, 1L), (2.0, 1L), (3.0, 2L))
    // W=4, threshold=2 -> cum 1,2 -> v=2 (lower weighted median)
    assert(wmedian(rows) == 2.0)
    assert(wmedian(rows) == brute(rows))
  }

  test("one heavy weight dominates") {
    val rows = Seq((1.0, 1L), (2.0, 1L), (10.0, 6L))
    assert(wmedian(rows) == 10.0)
    assert(wmedian(rows) == brute(rows))
  }

  test("value ties: deterministic id tiebreak agrees with stable brute order") {
    val rows = Seq((5.0, 3L), (5.0, 3L), (1.0, 1L), (9.0, 1L))
    assert(wmedian(rows) == 5.0)
    assert(wmedian(rows) == brute(rows))
  }

  test("randomized parity vs brute force") {
    val rnd = new scala.util.Random(8)
    (1 to 5).foreach { _ =>
      val rows = Seq.fill(50 + rnd.nextInt(50))(
        (rnd.nextInt(20).toDouble, 1L + rnd.nextInt(9).toLong))
      assert(wmedian(rows) == brute(rows))
    }
  }
}
