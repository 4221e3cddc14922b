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

  test("histogram narrowing path agrees with percentile on 200k rows") {
    // > DriverSliceMax forces at least one narrowing pass
    val df = spark.range(200000)
      .selectExpr("CAST((id * 2654435761) % 1000003 AS DOUBLE) AS x")
    val expected = df
      .selectExpr("percentile(x, 0.5D) AS p").head().getDouble(0)
    assert(RobustStats.medianExact(df, col("x")) === expected)
    // odd n exercises the single-rank path through the same loop
    val odd = df.limit(199999)
    val expOdd = odd
      .selectExpr("percentile(x, 0.5D) AS p").head().getDouble(0)
    assert(RobustStats.medianExact(odd, col("x")) === expOdd)
  }

  test("tie mass larger than the driver slice resolves without collecting") {
    // 150k rows, 100k of them a single value: the chosen bucket
    // collapses to [5,5] and the answer must come from the interval,
    // not a 100k-row collect
    val df = spark.range(150000)
      .selectExpr("CASE WHEN id < 100000 THEN 5.0D ELSE 10.0D END AS x")
    assert(RobustStats.medianExact(df, col("x")) === 5.0)
    // median straddling the tie boundary: 100k fives + 100k tens
    val df2 = spark.range(200000)
      .selectExpr("CASE WHEN id < 100000 THEN 5.0D ELSE 10.0D END AS x")
    assert(RobustStats.medianExact(df2, col("x")) === 7.5)
  }

  test("hard cap: an over-cap final slice falls back to value-group " +
       "selection instead of a row collect") {
    // adversarial near-degenerate distribution: 601 rows packed into a
    // sub-bucket-width interval around 500, holding the median rank.
    // With sliceMax=1000 the narrowing loop exits on that 601-row
    // bucket; with hardCap=500 the slice re-count trips and selection
    // must finish through finishByValue (3 value groups) — the
    // driver-OOM backstop path for a slice the loop invariant no
    // longer vouches for.
    val df = spark.range(2001).selectExpr(
      """CASE
         WHEN id < 700 THEN CAST(id % 100 AS DOUBLE)
         WHEN id < 900 THEN 500.0000001D
         WHEN id < 1101 THEN 500.0000002D
         WHEN id < 1301 THEN 500.0000003D
         ELSE CAST(900 + id % 100 AS DOUBLE) END AS x""")
    assert(RobustStats.medianExactImpl(df, col("x"),
      sliceMax = 1000L, hardCap = 500L) === 500.0000002)
    // unchanged caps give the same answer through the normal path
    assert(RobustStats.medianExact(df, col("x")) === 500.0000002)
    // the weighted twin takes the same fallback (unit weights, p=1/2:
    // weight rank 1001 lands in the packed groups)
    assert(RobustStats.weightedQuantileImpl(df, col("x"), lit(1L),
      1L, 2L, sliceMax = 1000L, hardCap = 500L) === ((500.0000002, 2001L)))
  }

  test("dq_outlier gate query is non-vacuous at gate SF") {
    val out = SparkEntry.queries("dq_outlier")(spark, sfDir).head()
    assert(out.getAs[Long]("n") > 0L)
    assert(out.getAs[Double]("mad") > 0.0)
  }
}
