package graft

import org.apache.spark.sql.functions.round
import graft.functions.TextFns

/** Text-analysis operators (SURVEY.md §2 [EXT] north-star). */
class TextFnsSpec extends SparkFunSuite {
  import spark.implicits._

  test("token counts: whitespace and BPE-ish") {
    val r = Seq("Hello, world! 42 times").toDF("t")
      .select(TextFns.wsTokenCount($"t"), TextFns.bpeTokenCount($"t"))
      .as[(Int, Int)].head()
    assert(r._1 === 4)
    // Hello , world ! 42 times → 6
    assert(r._2 === 6)
  }

  test("langId picks the dominant stopword language, und when none") {
    val r = Seq(
      "the cat sat on the mat and it was happy",
      "el perro corre por la calle y la plaza",
      "der hund und die katze sind nicht da",
      "xyzzy qwerty") // no stopwords
      .toDF("t").select(TextFns.langId($"t")).as[String].collect().toSeq
    assert(r === Seq("en", "es", "de", "und"))
  }

  test("fingerprint is casing/punctuation/whitespace invariant") {
    val r = Seq("Hello,   World!", "hello world", "different")
      .toDF("t").select(TextFns.fingerprint($"t")).as[String].collect()
    assert(r(0) === r(1))
    assert(r(0) !== r(2))
  }

  test("quality score in [0,1], higher for prose than garbage") {
    val r = Seq(
      "the quick brown fox jumps over the lazy dog and then continues " * 3,
      "!!!###$$$%%%^^^&&&")
      .toDF("t").select(TextFns.qualityScore($"t")).as[Double].collect()
    assert(r.forall(s => s >= 0.0 && s <= 1.0))
    assert(r(0) > r(1))
  }

  test("winnow fingerprints: offset-robust overlap, disjoint docs disjoint") {
    val shared = "the common stretch of text that both documents contain verbatim"
    val r = Seq(
      ("PREFIX AAA " + shared + " suffix one"),
      ("totally different lead-in words before " + shared),
      ("nothing in common here at all with anything else whatsoever okay"))
      .toDF("t").select(TextFns.winnowFingerprint($"t").as("fp"))
      .as[Seq[Long]].collect()
    val overlap01 = r(0).toSet.intersect(r(1).toSet).size
    val overlap02 = r(0).toSet.intersect(r(2).toSet).size
    assert(overlap01 >= 3, s"shared run must share fingerprints, got $overlap01")
    assert(overlap02 <= 1, s"disjoint docs should share ~none, got $overlap02")
  }

  test("winnow fingerprints are deterministic and sorted-distinct") {
    val df = Seq("some document body with enough characters to fingerprint")
      .toDF("t")
    val a = df.select(TextFns.winnowFingerprint($"t")).as[Seq[Long]].head()
    val b = df.select(TextFns.winnowFingerprint($"t")).as[Seq[Long]].head()
    assert(a === b)
    assert(a === a.distinct.sorted)
    assert(a.nonEmpty)
  }

  test("punct ratio and avg word len guards on empty text") {
    val r = Seq("").toDF("t")
      .select(TextFns.punctRatio($"t"), TextFns.avgWordLen($"t"))
      .as[(Double, Double)].head()
    assert(r === ((0.0, 0.0)))
  }

  test("stripHtml removes tags and entities, collapses whitespace") {
    val r = Seq("<div class=\"a\"><p>Hello &amp; welcome!</p></div>  <br/>bye")
      .toDF("t").select(TextFns.stripHtml($"t")).as[String].head()
    assert(r === "Hello welcome! bye")
  }

  test("repetition signals count 2/3-gram totals, top, and duplicated mass") {
    // "a b a b a b" → 2-grams: (a,b)x3 (b,a)x2 → n2=5 top2=3 dup2=5;
    //                 3-grams: (a,b,a)x2 (b,a,b)x2 → n3=4 top3=2 dup3=4
    val rep = Seq("a b a b a b").toDF("t")
      .select(TextFns.repetitionSignals($"t").as("r"))
      .select($"r.n2", $"r.top2", $"r.dup2", $"r.n3", $"r.top3", $"r.dup3")
      .as[(Int, Int, Int, Int, Int, Int)].head()
    assert(rep === ((5, 3, 5, 4, 2, 4)))
    // all-distinct tokens: no duplicated grams, top frequency 1
    val uniq = Seq("one two three four").toDF("t")
      .select(TextFns.repetitionSignals($"t").as("r"))
      .select($"r.n2", $"r.top2", $"r.dup2", $"r.n3", $"r.top3", $"r.dup3")
      .as[(Int, Int, Int, Int, Int, Int)].head()
    assert(uniq === ((3, 1, 0, 2, 1, 0)))
    // normalization applies first (casing/punctuation invisible); short
    // and empty docs yield all-zero signals, not errors
    val norm = Seq("The, CAT! the cat", "single", "", "?!").toDF("t")
      .select(TextFns.repetitionSignals($"t").as("r"))
      .select($"r.n2", $"r.top2", $"r.dup2", $"r.n3")
      .as[(Int, Int, Int, Int)].collect().toSeq
    assert(norm(0) === ((3, 2, 2, 2))) // the cat ×2, cat the ×1
    assert(norm(1) === ((0, 0, 0, 0)))
    assert(norm(2) === ((0, 0, 0, 0)))
    assert(norm(3) === ((0, 0, 0, 0)))
  }

  test("readingEase: hand-computed FRE, punctuation-less text, empty doc") {
    // 6 words / 2 sentences / 6 single-syllable words:
    // 206.835 - 1.015*3 - 84.6*1 = 119.19
    val r = Seq("The cat sat. The dog ran!").toDF("t")
      .select(round(TextFns.readingEase($"t"), 4)).as[Double].head()
    assert(r === 119.19)
    // no terminal punctuation → sentence floor of 1 (not div-by-zero)
    val nf = Seq("one two three").toDF("t")
      .select(round(TextFns.readingEase($"t"), 4)).as[Double].head()
    // 3 words, 1 sentence floor, 4 vowel groups ('o','e','ee','o')
    assert(nf === 90.99)
    // word-less doc → null, not NaN
    val e = Seq("?!", "").toDF("t")
      .select(TextFns.readingEase($"t")).as[Option[Double]].collect()
    assert(e.forall(_.isEmpty))
  }

  test("redactPii replaces emails and phones with typed placeholders") {
    val r = Seq("mail a.b+c@x-corp.io or call +44 20 7946 0958 today")
      .toDF("t").select(TextFns.redactPii($"t")).as[String].head()
    assert(r === "mail <EMAIL> or call <PHONE> today")
    // clean text untouched
    val clean = Seq("no pii here at all").toDF("t")
      .select(TextFns.redactPii($"t")).as[String].head()
    assert(clean === "no pii here at all")
  }

  test("luhnValid accepts real PANs across lengths, rejects perturbations") {
    val cases = Seq(
      "4111111111111111" -> true,  // 16-digit Visa test PAN
      "4111111111111112" -> false, // last digit off by one
      "5500005555555559" -> true,  // 16-digit Mastercard test PAN
      "378282246310005" -> true,   // 15-digit Amex test PAN
      "4222222222222" -> true,     // 13-digit Visa test PAN
      "1234567890123456" -> false,
      "0000000000000000" -> true,  // degenerate but mod-10 valid
      "" -> false)                 // no digits → invalid, not vacuous-true
    val r = cases.map(_._1).toDF("c")
      .select(TextFns.luhnValid($"c")).as[Boolean].collect().toSeq
    assert(r === cases.map(_._2), cases.map(_._1).zip(r).toString)
  }
}
