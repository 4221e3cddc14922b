package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Shim
import graft.expressions._

/** Edge-case behavior of the native expressions through the real query
  * path (null inputs, empty arrays, zero vectors, length mismatches).
  */
class ExpressionEdgeSpec extends SparkFunSuite {
  import spark.implicits._

  test("null input → null output (expressions are null-intolerant)") {
    val df = Seq(Option.empty[Seq[String]]).toDF("toks")
    val r = df.select(
      Shim.column(SimHash64(Shim.expression(col("toks")))).as("sh"),
      Shim.column(ShingleHashes(Shim.expression(col("toks")), 3)).as("sg"))
      .collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("empty token array still yields a non-empty shingle set") {
    val r = Seq(Seq.empty[String]).toDF("toks")
      .select(Shim.column(ShingleHashes(Shim.expression(col("toks")), 3)))
      .as[Seq[Long]].head()
    assert(r.length === 1) // the single empty-window shingle
  }

  test("cosine guards: empty arrays and zero vectors give 0.0, never NaN") {
    val r = Seq((Seq.empty[Float], Seq.empty[Float]),
      (Seq(0f, 0f), Seq(1f, 2f))).toDF("a", "b")
      .select(Shim.column(CosineSim(Shim.expression(col("a")),
        Shim.expression(col("b")))))
      .as[Double].collect()
    assert(r.toSeq === Seq(0.0, 0.0))
  }

  test("SortedJaccard: empty sets → 0.0; identical sets → 1.0") {
    val r = Seq(
      (Seq.empty[Long], Seq.empty[Long]),
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)),
      (Seq(1L, 2L), Seq(3L, 4L)))
      .toDF("a", "b")
      .select(Shim.column(SortedJaccard(Shim.expression(col("a")),
        Shim.expression(col("b")))))
      .as[Double].collect()
    assert(r.toSeq === Seq(0.0, 1.0, 0.0))
  }

  test("FirstAgreeIndex: first match, no match → -1, empty/mismatched → -1") {
    val r = Seq(
      (Seq(1, 2, 3), Seq(9, 2, 3)),   // first agree at 1
      (Seq(1, 2, 3), Seq(1, 2, 3)),   // 0
      (Seq(1, 2, 3), Seq(4, 5, 6)),   // none → -1
      (Seq.empty[Int], Seq(1, 2)),    // empty → -1
      (Seq(7), Seq(9, 7)))            // min-length compare → -1
      .toDF("a", "b")
      .select(graft.functions.VecFns.firstAgree(col("a"), col("b")))
      .as[Int].collect()
    assert(r.toSeq === Seq(1, 0, -1, -1, -1))
    // null propagates
    val n = Seq((Option.empty[Seq[Int]], Some(Seq(1))))
      .toDF("a", "b")
      .select(graft.functions.VecFns.firstAgree(col("a"), col("b")))
      .collect()(0)
    assert(n.isNullAt(0))
  }

  test("SigAgreement tolerates length mismatch via min-length compare") {
    val r = Seq((Seq(1L, 2L, 3L, 4L), Seq(1L, 2L)))
      .toDF("a", "b")
      .select(Shim.column(SigAgreement(Shim.expression(col("a")),
        Shim.expression(col("b")))))
      .as[Double].head()
    assert(r === 1.0)
  }

  test("MinHashSig on an empty hash set yields the identity signature") {
    val r = Seq(Seq.empty[Long]).toDF("h")
      .select(Shim.column(MinHashSig(Shim.expression(col("h")), 8, 42L)))
      .as[Seq[Long]].head()
    assert(r === Seq.fill(8)(Long.MaxValue))
  }

  test("WinnowFingerprint: short strings (< k) still fingerprint") {
    val r = Seq("ab").toDF("t")
      .select(Shim.column(WinnowFingerprint(Shim.expression(col("t")), 8, 16)))
      .as[Seq[Long]].head()
    assert(r.length === 1)
  }
}
