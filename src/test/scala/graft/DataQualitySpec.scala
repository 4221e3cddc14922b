package graft

import org.apache.spark.sql.functions._
import graft.ingest.DataQuality._

class DataQualitySpec extends SparkFunSuite {
  import spark.implicits._

  test("null/unique/range checks: hand-computed fractions and tolerances") {
    val df = Seq(
      (Some(1L), 5.0), (Some(1L), 60.0), (Some(2L), 10.0), (None, 20.0)
    ).toDF("k", "v")
    val rep = report(
      nullCheck(df, "t", "k", maxFraction = 0.3),
      uniqueCheck(df, "t", "k"),
      rangeCheck(df, "t", "v", 1.0, 50.0, maxFraction = 0.25))
      .as[(String, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(rep("t.k.not_null") == ((0.25, true)))     // 1 of 4 null, tol .3
    // k has 3 non-null values, 2 distinct → 1 duplicated row
    assert(rep("t.k.unique") == ((0.25, false)))
    assert(rep("t.v.range") == ((0.25, true)))        // 60 of 4 values out
  }

  test("fkCheck: orphan fraction against the parent's key set") {
    val child = Seq(1L, 1L, 2L, 99L).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = fkCheck(child, "c", "fk", parent, "pk", maxFraction = 0.2)
      .as[(String, Double, Boolean)].head()
    assert(r == (("c.fk.fk", 0.25, false)))
  }

  test("kAnonymity: size risk, diversity risk, and passing groups") {
    // group (a): 2 rows < k=3 → size risk (even though l also low)
    // group (b): 3 rows, sensitive all equal → diversity risk at minL=2
    // group (c): 3 rows, 2 distinct sensitive values → passes
    val df = Seq(
      ("a", 1), ("a", 2),
      ("b", 7), ("b", 7), ("b", 7),
      ("c", 1), ("c", 1), ("c", 2)
    ).toDF("qi", "s")
    val got = kAnonymity(df, Seq("qi"), col("s"), k = 3L, minL = 2L)
      .as[(String, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got === Map("a" -> ((2L, 2L, "size")), "b" -> ((3L, 1L, "diversity"))))
  }

  test("benford: hand-computed digit histogram; sub-1 and null sit out") {
    // digits: 1×"1.5", 2×"2x", 1×"9000"; 0.4 and null excluded
    val df = Seq(Some(1.5), Some(25.0), Some(2000.0), Some(9000.0),
      Some(0.4), None).toDF("v")
    val rows = benford(df, col("v"))
      .as[(Int, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows.keySet === Set(1, 2, 9))
    assert(rows(2)._2 === 2L)
    assert(rows(2)._3 === 0.5) // 2 of 4
    // expected fraction for digit 1 = log10(2)
    assert(math.abs(rows(1)._4 - 0.30103) < 1e-6)
    // chi2 term for digit 9: exp = 4*log10(10/9)
    val e9 = 4 * math.log10(10.0 / 9.0)
    assert(math.abs(rows(9)._5 - math.pow(1 - e9, 2) / e9) < 1e-3)
  }

  test("benford: a Benford-distributed sample yields small chi2 terms") {
    // v = 10^u for u uniform in [0,3) is exactly Benford-distributed
    val rnd = new scala.util.Random(77)
    val df = Seq.fill(20000)(math.pow(10, rnd.nextDouble() * 3)).toDF("v")
    val chi2 = benford(df, col("v"))
      .agg(sum("chi2_part")).as[Double].head()
    // chi-square with 8 df: p=0.001 critical value is 26.1
    assert(chi2 < 26.1, s"benford sample rejected: chi2=$chi2")
  }

  test("drift: planted shift flags, identical distributions don't") {
    val a = (1 to 400).map(i => (i.toDouble % 20, "c" + (i % 3), i.toDouble))
      .toDF("num_shift", "cat_shift", "num_same")
    // numeric values jump by +100, categories collapse to one NEW code
    val b = (1 to 400).map(i => (i.toDouble % 20 + 100, "zz", i.toDouble))
      .toDF("num_shift", "cat_shift", "num_same")
    val got = drift(a, b, Seq("num_shift", "num_same"), Seq("cat_shift"))
      .as[(String, String, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("num_shift")._1 == "numeric" && got("num_shift")._3,
      s"shifted numeric must drift: $got")
    assert(got("cat_shift")._1 == "categorical" && got("cat_shift")._3,
      s"new-category collapse must drift: $got")
    assert(!got("num_same")._3 && got("num_same")._2 < 0.01,
      s"identical column must not drift: $got")
  }

  test("drift: constant column and nulls don't crash; nulls sit out") {
    val a = Seq((5.0, Some("x")), (5.0, None)).toDF("c", "v")
    val b = Seq((5.0, Some("x")), (5.0, Some("x"))).toDF("c", "v")
    val got = drift(a, b, Seq("c"), Seq("v"))
      .as[(String, String, Double, Boolean)].collect()
      .map(r => r._1 -> r._4).toMap
    // constant numeric: all mass in bucket 0 both sides (hi == lo guard)
    assert(!got("c"))
    // v: a has 1 non-null 'x', b has 2 — small totals diff, no drift flag
    assert(!got("v"))
  }

  test("empty table: every check reports 0 and passes") {
    val df = Seq((1L, 1.0)).toDF("k", "v").filter(lit(false))
    val rep = report(
      nullCheck(df, "t", "k"), uniqueCheck(df, "t", "k"),
      rangeCheck(df, "t", "v", 0, 1))
      .as[(String, Double, Boolean)].collect()
    assert(rep.forall(r => r._2 == 0.0 && r._3), rep.mkString(","))
  }
}
