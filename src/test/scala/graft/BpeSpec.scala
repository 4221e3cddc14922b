package graft

import graft.operators.Bpe

/** BPE merge training: hand-computed merges, greedy-scan semantics,
  * and driver-side vs distributed-loop parity.
  */
class BpeSpec extends SparkFunSuite {
  import spark.implicits._

  test("trainMerges learns hand-computable merges in order") {
    // corpus: "low low low lower newest newest"
    // vocab: low:3 lower:1 newest:2
    // round 1 pairs: (l,o):4 (o,w):4 (w,e):3 (e,r):1 (n,e):2 (e,w):2
    //   (e,s):2 (s,t):2 → max 4, tie (l o) vs (o w) → 'l o' < 'o w'
    // round 2: lo+w → (lo,w):4 wins (others <= 3)
    // round 3: (w,e):1(lower) .. (n,e):2 (e,w):2 (e,s):2 (s,t):2
    //   → tie at 2 → 'e s' < 'e w' < 'n e' < 's t' → merge (e,s)
    val docs = Seq("low low low lower newest newest").toDF("text")
    val out = Bpe.trainMerges(docs, "text", numMerges = 3)
      .as[(Int, String, String, String, Long)].collect().sortBy(_._1)
    assert(out.length == 3)
    assert(out(0) == ((1, "l", "o", "lo", 4L)))
    assert(out(1) == ((2, "lo", "w", "low", 4L)))
    assert(out(2) == ((3, "e", "s", "es", 2L)))
  }

  test("greedy scan: merged output does not re-merge within a round") {
    // "aaaa": round-1 pairs (a,a):3 → greedy scan gives [aa][aa], so
    // round 2 merges (aa,aa), NOT (a,aa)
    val docs = Seq("aaaa").toDF("text")
    val out = Bpe.trainMerges(docs, "text", numMerges = 2)
      .as[(Int, String, String, String, Long)].collect().sortBy(_._1)
    assert(out(0) == ((1, "a", "a", "aa", 3L)),
      "pair count is per adjacent position (3 in 'aaaa')")
    assert(out(1) == ((2, "aa", "aa", "aaaa", 1L)))
  }

  test("mergeOnce greedy left scan handles overlap runs") {
    assert(Bpe.mergeOnce(Array("a", "a", "a"), "a", "a", "aa").toList ==
      List("aa", "a"))
    assert(Bpe.mergeOnce(Array("a", "a", "a", "a"), "a", "a", "aa").toList ==
      List("aa", "aa"))
    assert(Bpe.mergeOnce(Array("x"), "a", "a", "aa").toList == List("x"))
  }

  test("distributed loop is bit-identical to the driver-side fast path") {
    val docs = Seq("banana bandana cabana", "ban ban banana an an")
      .toDF("text")
    val local = Bpe.trainMerges(docs, "text", numMerges = 6)
      .as[(Int, String, String, String, Long)].collect().sortBy(_._1).toList
    val dist = Bpe.trainMerges(docs, "text", numMerges = 6,
      localVocabLimit = 0L)
      .as[(Int, String, String, String, Long)].collect().sortBy(_._1).toList
    assert(local == dist, s"local=$local dist=$dist")
    assert(local.nonEmpty)
  }

  test("subwordStats: hand-computed fertility under learned merges") {
    // one merge on "low low" corpus: (l,o) and (o,w) tie at 2 →
    // 'l o' wins → vocab "low" encodes to [lo, w] → 2 subwords/word
    val docs = Seq((1L, "low low"), (2L, ""), (3L, "low"))
      .toDF("doc_id", "text")
    val out = Bpe.subwordStats(docs, "doc_id", "text", numMerges = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]))).sortBy(_._1).toList
    assert(out(0) == ((1L, 2L, 4L, Some(2.0))))
    assert(out(1) == ((2L, 0L, 0L, None)), "token-less doc keeps a row")
    assert(out(2) == ((3L, 1L, 2L, Some(2.0))))
  }

  test("fuzz: 8 random corpora — distributed and local trainers agree") {
    // the riskiest equivalence in the operator: the SQL higher-order
    // merge fold vs the driver-side array scan, including tie-breaks
    // and early exhaustion, across corpora nobody hand-picked
    val rnd = new scala.util.Random(37)
    val lexicon = Vector("aa", "ab", "abc", "bca", "cab", "a", "b",
      "aab", "bb", "abab")
    for (trial <- 1 to 8) {
      val docs = (0 until (2 + rnd.nextInt(4))).map(_ =>
        Seq.fill(1 + rnd.nextInt(15))(
          lexicon(rnd.nextInt(lexicon.length))).mkString(" "))
        .toDF("text")
      val n = 1 + rnd.nextInt(6)
      val local = Bpe.trainMerges(docs, "text", n)
        .as[(Int, String, String, String, Long)].collect().sortBy(_._1).toList
      val dist = Bpe.trainMerges(docs, "text", n, localVocabLimit = 0L)
        .as[(Int, String, String, String, Long)].collect().sortBy(_._1).toList
      assert(local == dist, s"trial $trial (n=$n): local=$local dist=$dist")
    }
  }

  test("vocabulary exhaustion stops early with fewer rows") {
    // single char per word → one pair-less round after 0 merges? No:
    // "a b" has two single-char words, no adjacent pairs at all
    val docs = Seq("a b a b").toDF("text")
    val out = Bpe.trainMerges(docs, "text", numMerges = 5)
    assert(out.count() == 0L)
  }
}
