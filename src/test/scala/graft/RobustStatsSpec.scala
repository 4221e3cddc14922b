package graft

import org.apache.spark.sql.functions._
import graft.operators.RobustStats

class RobustStatsSpec extends SparkFunSuite {
  import spark.implicits._

  test("medianExact matches the sort-based answer, odd and even n") {
    val odd = Seq(5.0, 1.0, 9.0, 3.0, 7.0).toDF("x")
    assert(RobustStats.medianExact(odd, col("x")) === 5.0)
    val even = Seq(4.0, 1.0, 3.0, 2.0).toDF("x")
    // percentile_cont(0.5) convention: (2 + 3) / 2
    assert(RobustStats.medianExact(even, col("x")) === 2.5)
  }

  test("medianExact ignores nulls and survives heavy ties") {
    val df = Seq[Option[Double]](Some(1.0), None, Some(1.0), Some(1.0),
      Some(8.0)).toDF("x")
    assert(RobustStats.medianExact(df, col("x")) === 1.0)
  }

  test("madOutlierSummary flags exactly the planted wild rows") {
    // 100 tight values plus 3 wild ones; med/mad sit in the tight mass
    val base = (1 to 100).map(i => 50.0 + (i % 7))
    val df = (base ++ Seq(1e6, -1e6, 5e5)).toDF("x")
    val row = RobustStats.madOutlierSummary(df, col("x"), k = 3.0).head()
    assert(row.getAs[Long]("n") === 103L)
    assert(row.getAs[Long]("n_out") === 3L)
    assert(math.abs(row.getAs[Double]("med") - 53.0) < 1.5)
  }

  test("outlier rule is scale-free around the median") {
    val df = ((1 to 50).map(_.toDouble) ++ Seq(10000.0)).toDF("x")
    val row = RobustStats.madOutlierSummary(df, col("x")).head()
    assert(row.getAs[Long]("n_out") === 1L)
  }

  test("dq_outlier gate query is non-vacuous at gate SF") {
    val out = SparkEntry.queries("dq_outlier")(spark, sfDir).head()
    assert(out.getAs[Long]("n") > 0L)
    assert(out.getAs[Double]("mad") > 0.0)
  }
}
