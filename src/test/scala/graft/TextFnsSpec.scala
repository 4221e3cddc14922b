package graft

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

  test("punct ratio and avg word len guards on empty text") {
    val r = Seq("").toDF("t")
      .select(TextFns.punctRatio($"t"), TextFns.avgWordLen($"t"))
      .as[(Double, Double)].head()
    assert(r === ((0.0, 0.0)))
  }
}
