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
