package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Shim
import graft.expressions._
import graft.functions.TextFns

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

  test("shingle hash width: 63-bit escapes the 31-bit range, low 31 " +
       "bits agree with the default, distinct counts never shrink") {
    // a vocabulary big enough that SOME shingle hash exceeds 2^31 at
    // 63 bits (probability a given hash stays below is 2^-32)
    val toks = (1 to 5000).map(i => s"tok$i")
    val df = Seq(toks).toDF("toks")
    val (h31, h63) = df.select(
        Shim.column(ShingleHashes(Shim.expression(col("toks")), 3))
          .as("a"),
        Shim.column(ShingleHashes(Shim.expression(col("toks")), 3, 63))
          .as("b"))
      .as[(Seq[Long], Seq[Long])].head()
    assert(h63.exists(_ > 0x7fffffffL), "63-bit hashes never left 31-bit range")
    assert(h63.forall(_ >= 0L))
    // same underlying mix: masking 63-bit values to 31 bits recovers
    // exactly the 31-bit set (collisions can only SHRINK the 31 set)
    assert(h63.map(_ & 0x7fffffffL).toSet === h31.toSet)
    assert(h63.size >= h31.size)
    intercept[IllegalArgumentException] {
      ShingleHashes(Shim.expression(col("toks")), 3, 64)
    }
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

  test("TextSignals equals the regex formulation on adversarial inputs") {
    // empty, all-punct, unicode (zh + accents), underscores (\w but not
    // alnum), digits in runs, stopwords glued by punctuation
    val docs = Seq("", "?!...", "the the the", "the,and;of", "the1 and_x",
      "中文 文本 the was", "café the naïve", "  padded   the  ",
      "la la est du", "x" * 20 + " the").toDF("t")
    val sig = TextFns.signals(col("t"))
    val rows = docs.select(
      sig.getField("n_words").as("w"), sig.getField("n_chars").as("c"),
      sig.getField("n_punct").as("p"), sig.getField("n_nonws").as("nw"),
      sig.getField("en").as("en"), sig.getField("es").as("es"),
      sig.getField("fr").as("fr"), sig.getField("zh").as("zh"),
      size(split(trim(col("t")), "\\s+")).as("w2"),
      length(col("t")).as("c2"),
      size(regexp_extract_all(col("t"), lit("[^A-Za-z0-9\\s]"), lit(0))).as("p2"),
      length(regexp_replace(col("t"), "\\s+", "")).as("nw2"),
      size(regexp_extract_all(col("t"),
        lit(TextFns.StopwordPatterns.toMap.apply("en")), lit(0))).as("en2"),
      size(regexp_extract_all(col("t"),
        lit(TextFns.StopwordPatterns.toMap.apply("es")), lit(0))).as("es2"),
      size(regexp_extract_all(col("t"),
        lit(TextFns.StopwordPatterns.toMap.apply("fr")), lit(0))).as("fr2"),
      size(regexp_extract_all(col("t"),
        lit(TextFns.StopwordPatterns.toMap.apply("zh")), lit(0))).as("zh2")
    ).collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      for ((a, b, name) <- Seq((0, 8, "n_words"), (1, 9, "n_chars"),
        (2, 10, "n_punct"), (3, 11, "n_nonws"), (4, 12, "en"),
        (5, 13, "es"), (6, 14, "fr"), (7, 15, "zh")))
        assert(r.getInt(a) === r.getInt(b),
          s"doc $i: $name scan=${r.getInt(a)} regex=${r.getInt(b)}")
    }
  }

  test("NormalizeAlnum equals the regex normalization on adversarial inputs") {
    val docs = Seq("", "?!...", "  MiXeD   CaSe 42 ", "a--b__c",
      "中文toKENs人 the", "café naïve", "\ttabs\nand\rreturns ").toDF("t")
    val rows = docs.select(
      TextFns.normalizedBytes(col("t")).cast("string").as("scan"),
      trim(regexp_replace(lower(col("t")), "[^a-z0-9]+", " ")).as("rx"))
      .as[(String, String)].collect()
    rows.zipWithIndex.foreach { case ((s, r), i) =>
      assert(s === r, s"doc $i: scan='$s' regex='$r'")
    }
  }

  test("ScrubText equals the staged regexp_replace chain on adversarial inputs") {
    val docs = Seq(
      "",
      "   \t\n  ",
      "plain text, no markup at all",
      "<a href='x'>link</a> plain <b>bold</b>",
      "<div class=\"x\"><p>Contact: bob.smith+a@example.org</p></div> tail",
      "unterminated <div class= stays literal",
      "x<y and z>w",                       // '<'..nearest '>' IS a tag
      "5<6>7",
      "<<a>> nested",
      "<> empty tag",
      "&amp; &unknown &ab; &a; &abcdef; &abcdefg; &#1; &#12345; &#123456; &#x41;",
      "a&amp;b@c.org entity feeding an email",
      "12&amp;34-56-7890 entity-made phone separator",
      "call +1 555 0100 9999 &amp; write&#33;",
      "1-234-5678-90 and 12.34.56.78 and 999-99",
      "mail a@b.co x.y+z@mail.example.com no-at-here.com",
      "café <b>naïve</b> 中文&amp;字",
      "\t mixed \n whitespace \r\n runs  end ",
      "&am<b>p; tag inside entity candidate",
      "trailing unterminated <",
      "trailing amp &",
      "only <b>tags</b> and &amp; entities")
      .toDF("t")
    val rows = docs.select(
      TextFns.scrub(col("t")).as("fused"),
      TextFns.redactPii(TextFns.stripHtml(col("t"))).as("staged"))
      .as[(String, String)].collect()
    rows.zipWithIndex.foreach { case ((f, s), i) =>
      assert(f === s, s"doc $i: fused='$f' staged='$s'")
    }
  }

  test("WinnowFingerprint: short strings (< k) still fingerprint") {
    val r = Seq("ab").toDF("t")
      .select(Shim.column(WinnowFingerprint(Shim.expression(col("t")), 8, 16)))
      .as[Seq[Long]].head()
    assert(r.length === 1)
  }
}
