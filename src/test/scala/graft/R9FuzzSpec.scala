package graft

import scala.util.Random

import org.apache.spark.sql.functions._

/** Seeded randomized fuzzing of the round-9 operators (the FuzzSpec
  * convention): many small adversarial shapes per property,
  * deterministic seed so a failure reproduces.
  */
class R9FuzzSpec extends SparkFunSuite {
  import spark.implicits._

  test("Skyline.frontierSweep: 25 random ROW tables match brute dominance") {
    val rnd = new Random(9)
    for (trial <- 1 to 25) {
      // raw rows, NOT pre-aggregated: several rows per max-dim value,
      // ties on both dims, so the sweep's per-level threshold and the
      // strict < filter are both exercised on duplicates
      val rows = (0 until 5 + rnd.nextInt(60)).map { i =>
        (i.toLong, rnd.nextInt(10).toLong, rnd.nextInt(12).toLong)
      }
      val got = graft.operators.Skyline
        .frontierSweep(rows.toDF("id", "mx", "mn"), "mx", "mn",
          numPartitions = 1 + rnd.nextInt(5))
        .as[(Long, Long, Long)].collect().toSet
      val want = rows.filter { case (_, x, y) =>
        !rows.exists { case (_, x2, y2) => x2 > x && y2 <= y }
      }.toSet
      assert(got === want, s"trial $trial rows=$rows")
    }
  }

  test("Skyline: sweep and anti-join forms agree on random level tables") {
    val rnd = new Random(9)
    for (trial <- 1 to 15) {
      val levels = rnd.shuffle((0 until 30).toList)
        .take(1 + rnd.nextInt(15))
        .map(x => (x.toLong, rnd.nextInt(8).toLong))
      val df = levels.toDF("mx", "mn")
      val viaSweep = graft.operators.Skyline
        .frontierSweep(df, "mx", "mn").as[(Long, Long)].collect().toSet
      val viaAnti = graft.operators.Skyline
        .frontier2d(df, "mx", "mn").as[(Long, Long)].collect().toSet
      assert(viaSweep === viaAnti, s"trial $trial levels=$levels")
    }
  }

  test("Skyline: null-max rows survive both forms identically") {
    // dominance is null in both directions for a null max-dim, so such
    // rows sit on the frontier and dominate nothing — in BOTH forms
    val rows = Seq((1L, Some(1L), 9L), (2L, None, 0L), (3L, Some(5L), 3L),
      (4L, Some(2L), 3L), (5L, None, 99L))
    val df = rows.toDF("id", "mx", "mn")
    val viaSweep = graft.operators.Skyline
      .frontierSweep(df, "mx", "mn").select("id").as[Long].collect().toSet
    val viaAnti = graft.operators.Skyline
      .frontier2d(df, "mx", "mn").select("id").as[Long].collect().toSet
    // id 1 dominated (mx 5 has mn 3 <= 9); id 4 dominated by the
    // equal-min id 3 (<= edge); both null-max rows kept
    assert(viaSweep === Set(2L, 3L, 5L))
    assert(viaAnti === viaSweep)
  }

  test("Skyline.frontierSweep: double min-dim and single-partition edge") {
    // doubles exercise the typed driver prefix-min (java.lang.Double is
    // Comparable); numPartitions = 1 exercises the no-offset path where
    // the whole sweep lives in one range partition
    val rows = Seq((1L, 1.0, 5.5), (2L, 2.0, 5.5), (3L, 3.0, 2.25),
      (4L, 3.0, 9.0), (5L, 4.0, 2.25), (6L, 5.0, 7.0))
    val got = graft.operators.Skyline
      .frontierSweep(rows.toDF("id", "mx", "mn"), "mx", "mn",
        numPartitions = 1)
      .as[(Long, Double, Double)].collect().map(_._1).toSet
    // id 1/2: price 5.5, larger-q mins are 2.25 -> dominated; id 4:
    // 9.0 beaten by 2.25 at q=4 -> dominated; id 3: q=3 price 2.25,
    // q=4 has 2.25 <= 2.25 -> dominated (strict survival); id 5:
    // only q=5 is larger, 7.0 > 2.25 -> survives; id 6: max q survives
    assert(got === Set(5L, 6L))
  }
}
