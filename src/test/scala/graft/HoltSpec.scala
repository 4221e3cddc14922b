package graft

import org.apache.spark.sql.functions._
import graft.operators.TimeSeries

class HoltSpec extends SparkFunSuite {
  import spark.implicits._

  private def run(xs: Seq[Double]): (Double, Double, Double) = {
    val df = xs.zipWithIndex
      .map { case (x, i) => ("u", i.toLong, i.toLong, x) }
      .toDF("id", "ts", "seq", "v")
    val r = TimeSeries.holt(df, "id", col("ts"), col("seq"), col("v"))
      .head()
    (r.getAs[Double]("level"), r.getAs[Double]("trend"),
      r.getAs[Double]("fc"))
  }

  // reference fold in plain Scala (α=0.5, β=0.25)
  private def oracle(xs: Seq[Double]): (Double, Double) = {
    var l = xs(0); var b = xs(1) - xs(0)
    xs.drop(2).foreach { x =>
      val lN = 0.5 * x + 0.5 * (l + b)
      b = 0.25 * (lN - l) + 0.75 * b
      l = lN
    }
    (l, b)
  }
  private def r4(x: Double): Double =
    math.floor(x * 10000.0 + 0.5) / 10000.0

  test("matches the scalar fold on a trending series") {
    val xs = Seq(1.0, 2.0, 3.5, 4.0, 6.0, 7.5, 8.0)
    val (l, b) = oracle(xs)
    assert(run(xs) === ((r4(l), r4(b), r4(l + 3.0 * b))))
  }

  test("a perfectly linear series converges toward its slope") {
    // β=0.25 converges geometrically; 20 points land within ~1e-2
    val xs = (1 to 20).map(_.toDouble * 2.0)
    val (_, trend, _) = run(xs)
    assert(math.abs(trend - 2.0) < 0.01)
    // and a longer series tightens further (monotone convergence)
    val xs2 = (1 to 60).map(_.toDouble * 2.0)
    val (_, trend2, _) = run(xs2)
    assert(math.abs(trend2 - 2.0) < math.abs(trend - 2.0))
  }

  test("entities with fewer than two observations are dropped") {
    val df = Seq(("a", 1L, 1L, 5.0), ("b", 1L, 1L, 1.0),
      ("b", 2L, 2L, 2.0)).toDF("id", "ts", "seq", "v")
    val out = TimeSeries.holt(df, "id", col("ts"), col("seq"), col("v"))
    assert(out.select("id").as[String].collect().toSeq === Seq("b"))
  }

  test("fold order follows (ts, seq), not input order") {
    val xs = Seq(1.0, 2.0, 3.0, 10.0)
    val shuffled = Seq((3L, 10.0), (0L, 1.0), (2L, 3.0), (1L, 2.0))
      .map { case (i, x) => ("u", i, i, x) }
      .toDF("id", "ts", "seq", "v")
    val r = TimeSeries.holt(shuffled, "id", col("ts"), col("seq"), col("v"))
      .head()
    val (l, b) = oracle(xs)
    assert(r.getAs[Double]("level") === r4(l))
    assert(r.getAs[Double]("trend") === r4(b))
  }
}
