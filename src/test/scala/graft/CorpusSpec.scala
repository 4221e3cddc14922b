package graft

import org.apache.spark.sql.functions._
import graft.functions.VecFns
import graft.operators.Corpus

/** Corpus-curation operators: boilerplate line removal, tf-idf top-k,
  * target-proportion mixing, and the random-projection expression.
  */
class CorpusSpec extends SparkFunSuite {
  import spark.implicits._

  test("stripBoilerplateLines removes threshold lines, preserves order") {
    val docs = (0L until 12L).map { i =>
      (i, s"HEADER\nbody-$i-one\nbody-$i-two\nFOOTER")
    }.toDF("doc_id", "text")
    val rows = Corpus.stripBoilerplateLines(docs, "doc_id", "text", minDocs = 10L)
      .as[(Long, String, Long)].collect()
    assert(rows.length == 12)
    rows.foreach { case (id, clean, removed) =>
      assert(clean == s"body-$id-one\nbody-$id-two", s"doc $id: $clean")
      assert(removed == 2L)
    }
  }

  test("stripBoilerplateLines: below-threshold lines survive; all-boiler doc → empty") {
    val docs = ((0L until 11L).map(i => (i, "SPAM")) :+ (99L, "SPAM\nunique-line"))
      .toDF("doc_id", "text")
    val out = Corpus.stripBoilerplateLines(docs, "doc_id", "text", minDocs = 10L)
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(0L) == (("", 1L)))
    assert(out(99L) == (("unique-line", 1L)))
  }

  test("tfidfTopK scores and ranks: rare terms beat common ones") {
    // 4 docs; "common" is in all (idf = ln(1) = 0), "rare" in one
    val docs = Seq(
      (1L, "common rare rare"),
      (2L, "common midway"),
      (3L, "common midway"),
      (4L, "common")).toDF("doc_id", "text")
    val out = Corpus.tfidfTopK(docs, "doc_id", "text", k = 2)
      .as[(Long, String, Double, Int)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.sortBy(_._4).map(_._2).toList }
    assert(out(1L).head == "rare") // tf 2 * ln(4/1) beats everything
    assert(out(2L).head == "midway") // ln(4/2) > ln(4/4) = 0
    // doc 4 has only the zero-idf term; it still ranks (score 0)
    assert(out(4L) == List("common"))
  }

  test("mixToTarget hits target proportions; scarcest stratum kept whole") {
    // 200 a / 40 b: target 50/50 → budget = min(200/.5, 40/.5) = 80
    // → keep all 40 b, sample a at fraction 0.2
    val df = ((0L until 200L).map(i => (i, "a")) ++
      (1000L until 1040L).map(i => (i, "b"))).toDF("id", "s")
    val out = Corpus.mixToTarget(df, col("s"), col("id"),
      Map("a" -> 0.5, "b" -> 0.5))
    val byS = out.groupBy("s").count().as[(String, Long)].collect().toMap
    assert(byS("b") == 40L, "scarcest stratum must be kept whole")
    // hash sampling is Bernoulli at 0.2: expect ~40, tolerate 3 sigma
    assert(math.abs(byS("a") - 40L) <= 20L, s"got ${byS("a")}")
    // deterministic: same membership on a second run
    val again = Corpus.mixToTarget(df, col("s"), col("id"),
      Map("a" -> 0.5, "b" -> 0.5))
    assert(out.select("id").except(again.select("id")).isEmpty &&
      again.select("id").except(out.select("id")).isEmpty)
  }

  test("topTerms exact regime: matches a full count, counts exact, errs zero") {
    val terms = (Seq.fill(30)("alpha") ++ Seq.fill(20)("beta") ++
      Seq.fill(10)("gamma") ++ Seq.fill(5)("delta") ++ Seq("eps"))
    val df = scala.util.Random.shuffle(terms).map(Tuple1(_)).toDF("term")
      .repartition(4) // force multi-partition partial sketches + merge
    val got = df.agg(graft.functions.TextFns.topTerms(col("term"), 3, 16).as("t"))
      .selectExpr("inline(t)").as[(String, Long, Long)].collect().toList
    assert(got == List(("alpha", 30L, 0L), ("beta", 20L, 0L), ("gamma", 10L, 0L)))
  }

  test("topTerms boundary: a partial at EXACTLY capacity distinct merges exactly") {
    // partition 0 holds {x:5, y:5} (2 distinct == capacity 2, NO
    // eviction), partition 1 holds {z:3}. A merge that treats
    // size==capacity as "has evicted" would inflate z to cnt 8 / err 5;
    // the exact answer is x=5 err 0
    val rows = Seq.fill(5)(("x", 0)) ++ Seq.fill(5)(("y", 0)) ++
      Seq.fill(3)(("z", 1))
    val df = rows.toDF("term", "p").repartitionByRange(2, col("p"))
    val got = df.agg(graft.functions.TextFns.topTerms(col("term"), 1, 2).as("t"))
      .selectExpr("inline(t)").as[(String, Long, Long)].collect().toList
    assert(got == List(("x", 5L, 0L)), s"boundary merge not exact: $got")
  }

  test("stripBoilerplateLines: null text keeps its row as empty text") {
    val docs = ((0L until 11L).map(i => (i, "SPAM")) :+ (99L, null))
      .toDF("doc_id", "text")
    val out = Corpus.stripBoilerplateLines(docs, "doc_id", "text", minDocs = 10L)
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out.contains(99L), "null-text doc vanished from the output")
    assert(out(99L) == (("", 0L)))
  }

  test("mixToTarget with no weighted stratum present returns empty, not a crash") {
    val df = Seq((1L, "zh"), (2L, "ja")).toDF("id", "s")
    val out = Corpus.mixToTarget(df, col("s"), col("id"), Map("en" -> 1.0))
    assert(out.isEmpty)
  }

  test("topTermsExact: certified sketch path equals the exact count (vocab < capacity)") {
    val terms = Seq.fill(30)("alpha") ++ Seq.fill(20)("beta") ++
      Seq.fill(20)("bravo") ++ Seq.fill(10)("gamma") ++ Seq("eps")
    val df = scala.util.Random.shuffle(terms).map(Tuple1(_)).toDF("term")
      .repartition(4)
    val got = Corpus.topTermsExact(df, "term", 3, 16)
      .as[(Int, String, Long)].collect().toList
    // beta/bravo tie at 20 → term ASC breaks it, the oracle's order
    assert(got == List((1, "alpha", 30L), (2, "beta", 20L), (3, "bravo", 20L)))
  }

  test("topTermsExact: uncertifiable vocabulary falls back to the exact count") {
    // 300 distinct singletons through capacity 16 — the sketch's top
    // slots are eviction noise (est ≈ N/capacity), the fat-corpus
    // regime (reports/SWEEP_FAT_r14.md). The planted heavies sit at
    // counts 9/8 — far BELOW the eviction error, unrecoverable by any
    // sketch, so only the fallback can answer.
    val terms = Seq.fill(9)("heavy1") ++ Seq.fill(8)("heavy2") ++
      (0 until 300).map(i => s"noise$i")
    val df = scala.util.Random.shuffle(terms).map(Tuple1(_)).toDF("term")
      .repartition(4)
    val got = Corpus.topTermsExact(df, "term", 2, 16)
      .as[(Int, String, Long)].collect().toList
    assert(got == List((1, "heavy1", 9L), (2, "heavy2", 8L)))
  }

  test("topTermsExact: exactly-capacity distinct lands on the fallback and stays exact") {
    // the deliberately-ambiguous boundary: 16 distinct == capacity 16
    // is indistinguishable from eviction from the outside → fallback
    val terms = (0 until 16).flatMap(i => Seq.fill(i + 1)(s"t$i"))
    val df = terms.map(Tuple1(_)).toDF("term").repartition(3)
    val got = Corpus.topTermsExact(df, "term", 2, 16)
      .as[(Int, String, Long)].collect().toList
    assert(got == List((1, "t15", 16L), (2, "t14", 15L)))
  }

  test("topTerms over capacity: heavy hitter survives with a valid error bound") {
    // 1 heavy item + 40 distinct light items through capacity-8 sketches:
    // evictions must keep the heavy item and keep est-err <= true <= est
    val terms = Seq.fill(200)("heavy") ++ (0 until 40).flatMap(i => Seq.fill(2)(s"light$i"))
    val df = terms.map(Tuple1(_)).toDF("term").repartition(3)
    val got = df.agg(graft.functions.TextFns.topTerms(col("term"), 1, 8).as("t"))
      .selectExpr("inline(t)").as[(String, Long, Long)].collect().toList
    val (term, cnt, err) = got.head
    assert(term == "heavy")
    assert(cnt >= 200L, s"estimate must upper-bound the true count, got $cnt")
    assert(cnt - err <= 200L, s"est-err must lower-bound the true count ($cnt-$err)")
  }

  test("packChunks: per-shard streams tile exactly, straddlers span chunks") {
    val docs = (0L until 40L).map(i => (i, (i % 7 + 1) * 10)).toDF("id", "n")
    val out = Corpus.packChunks(docs, "id", col("n"), window = 64L,
      shards = 2, portable = true)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map { case (id, sh, n, off, fc, lc) => id -> ((sh, n, off, fc, lc)) }
      .toMap
    assert(out.size == 40)
    // within each shard, docs in id order tile the stream with no gaps
    out.values.groupBy(_._1).foreach { case (_, rows) =>
      val ordered = rows.toSeq.sortBy(_._3)
      ordered.zip(ordered.tail).foreach { case (a, b) =>
        assert(a._3 + a._2 == b._3, "gap or overlap in the packed stream")
      }
      assert(ordered.head._3 == 0L)
    }
    // chunk math: first = floor(start/64), last = floor((start+n-1)/64)
    out.values.foreach { case (_, n, off, fc, lc) =>
      assert(fc == off / 64 && lc == (off + n - 1) / 64)
      assert(lc >= fc)
    }
    // with doc sizes up to 70 > window 64, at least one doc straddles
    assert(out.values.exists { case (_, _, _, fc, lc) => lc > fc })
  }

  test("randomProjection matches a naive reference computation") {
    def mix64(zIn: Long): Long = {
      var z = zIn + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val vec = Array.tabulate(64)(i => (math.sin(i + 1) * 10).toFloat)
    val expected = Array.tabulate(8) { j =>
      var acc = 0.0
      for (i <- 0 until 64) {
        val w = (mix64(1337L + j * 1000003L + i) >>> 12).toDouble /
          (1L << 52).toDouble * 2.0 - 1.0
        acc += vec(i).toDouble * w
      }
      acc
    }
    val got = Seq(Tuple1(vec)).toDF("v")
      .select(VecFns.randomProjection(col("v"), 64, 8, 1337L).as("p"))
      .as[Array[Double]].head()
    assert(got.length == 8)
    got.zip(expected).foreach { case (g, e) => assert(g == e, s"$g != $e") }
  }

  test("randomProjection: short vectors project over their prefix; null stays null") {
    val out = Seq((1L, Some(Array(1f, 2f))), (2L, None))
      .toDF("id", "v")
      .select(col("id"), VecFns.randomProjection(col("v"), 64, 8, 1337L).as("p"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L).isDefined && out(2L).isEmpty)
  }

  test("chunkText: overlap reconstruction, final short chunk, edge lengths") {
    // 10-char chunks, stride 7: "0123456789abcdefghij" (20 chars)
    // → chunks at 0,7,14: "0123456789","789abcdefg","efghij"
    val docs = Seq(
      (1L, "0123456789abcdefghij"), // 20 chars → 3 chunks
      (2L, "short"),                // < chunkSize → 1 whole chunk
      (3L, ""),                     // empty → 1 empty chunk
      (4L, null.asInstanceOf[String]), // null → treated as empty
      (5L, "0123456789")            // exactly chunkSize → 1 chunk
    ).toDF("doc_id", "text")
    val out = Corpus.chunkText(docs, "doc_id", "text", 10, 3)
      .as[(Long, Long, Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).toList).toMap
    assert(out(1L).map(_._5) == List("0123456789", "789abcdefg", "efghij"))
    assert(out(1L).map(_._3) == List(0L, 7L, 14L), "start offsets")
    assert(out(1L).map(_._4) == List(10L, 10L, 6L), "chunk lengths")
    assert(out(2L) == List((2L, 0L, 0L, 5L, "short")))
    assert(out(3L) == List((3L, 0L, 0L, 0L, "")))
    assert(out(4L) == List((4L, 0L, 0L, 0L, "")))
    assert(out(5L) == List((5L, 0L, 0L, 10L, "0123456789")))
    // every character of every doc is covered by some chunk
    val covered = out(1L).flatMap(c => c._3 until (c._3 + c._4)).toSet
    assert(covered == (0L until 20L).toSet)
  }

  test("chunkText: multibyte characters — parity with the substr " +
       "formulation across 2/3/4-byte code points") {
    // the r13 one-pass ChunkSlices must count CHARACTERS exactly like
    // SQL substr: é (2-byte), 中 (3-byte), 𝄞 (4-byte / surrogate pair
    // in UTF-16) all land on chunk boundaries here
    val texts = Seq(
      (1L, "héllo wörld çafé über nöel straße 0123456789"),
      (2L, "中文分词测试中文分词测试中文分词测试中文分词测试"),
      (3L, "a𝄞b𝄞c𝄞d𝄞e𝄞f𝄞g𝄞h𝄞i𝄞j𝄞k𝄞l𝄞m𝄞n𝄞"),
      (4L, "mixàd 中 ascii 𝄞 and wide 字 chars here padded out"))
    val docs = texts.toDF("doc_id", "text")
    for ((cs, ov) <- Seq((10, 3), (7, 0), (5, 4))) {
      val stride = cs - ov
      val got = Corpus.chunkText(docs, "doc_id", "text", cs, ov)
        .as[(Long, Long, Long, Long, String)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._2).toList).toMap
      // oracle: the old per-chunk substr, straight from Spark SQL
      val want = docs
        .selectExpr("doc_id", "text AS t", "length(text) AS len")
        .selectExpr("doc_id", "t", "len",
          s"explode(sequence(0L, CASE WHEN len <= $cs THEN 0L ELSE " +
            s"(len - $cs + ${stride - 1}) DIV $stride END)) AS cid")
        .selectExpr("doc_id", "cid",
          s"substring(t, CAST(cid * $stride + 1 AS INT), $cs) AS body")
        .as[(Long, Long, String)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toList).toMap
      texts.foreach { case (id, _) =>
        assert(got(id).map(_._5) == want(id),
          s"doc $id diverged at chunkSize=$cs overlap=$ov")
      }
    }
  }

  test("chunkText rejects overlap >= chunkSize") {
    val docs = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Corpus.chunkText(docs, "doc_id", "text", 10, 10)
    }
  }

  test("capPerGroup: cap enforced, deterministic, stable under repartition") {
    val df = (0L until 300L).map(i => (i, s"g${i % 3}")).toDF("id", "g")
    val out = Corpus.capPerGroup(df, col("g"), col("id"), 7)
      .as[(Long, String, Int)].collect()
    assert(out.length == 21, "3 groups x cap 7")
    assert(out.groupBy(_._2).forall(_._2.length == 7))
    assert(out.forall(_._3 >= 1) && out.forall(_._3 <= 7))
    // determinism: same rows regardless of input partitioning
    val out2 = Corpus.capPerGroup(df.repartition(13), col("g"), col("id"), 7)
      .as[(Long, String, Int)].collect()
    assert(out.map(r => (r._1, r._2)).toSet == out2.map(r => (r._1, r._2)).toSet)
    // portable and fast hashes select per their own (different) priority
    val port = Corpus.capPerGroup(df, col("g"), col("id"), 7, portable = true)
      .as[(Long, String, Int)].collect()
    assert(port.length == 21)
  }

  test("unigramCrossEntropy: hand-computed LM scores; empty doc → null") {
    // corpus: "a a b" + "a c" + "" → counts a=3 b=1 c=1, total=5
    val docs = Seq((1L, "a a b"), (2L, "a c"), (3L, ""))
      .toDF("doc_id", "text")
    val out = Corpus.unigramCrossEntropy(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]))).toList.sortBy(_._1)
    def r4(x: Double) = math.rint(x * 1e4) / 1e4
    val h1 = -(2 * math.log(3.0 / 5) + 1 * math.log(1.0 / 5)) / 3
    val h2 = -(math.log(3.0 / 5) + math.log(1.0 / 5)) / 2
    assert(out(0) == ((1L, 3L, Some(r4(h1)))))
    assert(out(1) == ((2L, 2L, Some(r4(h2)))))
    assert(out(2) == ((3L, 0L, None)), "token-less doc keeps a NULL-score row")
    // rare-token doc scores strictly higher than the common-token doc
    assert(out(1)._3.get > out(0)._3.get)
  }

  test("collocations: hand-computed PMI, minCount threshold, tie order") {
    // 10 docs "new york", 5 docs "of the of the" → bigrams:
    //   (new,york):10, (of,the):10, (the,of):5 → Nb=25
    // unigrams: new:10 york:10 of:10 the:10 → Nu=40
    val docs = (Seq.fill(10)("new york") ++ Seq.fill(5)("of the of the"))
      .toDF("text")
    val out = Corpus.collocations(docs, "text", minCount = 5L, k = 10)
      .as[(String, String, Long, Double, Int)].collect().sortBy(_._5)
    def pmi(cab: Long, ca: Long, cb: Long): Double =
      math.rint(math.log((cab / 25.0) / ((ca / 40.0) * (cb / 40.0))) * 1e4) / 1e4
    assert(out.length == 3)
    // (new,york) ties (of,the) on PMI; the (w1, w2) tie-break orders them
    assert(out(0) == (("new", "york", 10L, pmi(10, 10, 10), 1)))
    assert(out(1) == (("of", "the", 10L, pmi(10, 10, 10), 2)))
    assert(out(2) == (("the", "of", 5L, pmi(5, 10, 10), 3)))
    // minCount prunes: raising it to 6 drops (the,of)
    assert(Corpus.collocations(docs, "text", 6L, 10).count() == 2L)
  }

  test("capPerGroup: groups below the cap keep every row") {
    val df = (0L until 5L).map(i => (i, "only")).toDF("id", "g")
    val out = Corpus.capPerGroup(df, col("g"), col("id"), 10)
    assert(out.count() == 5L)
  }

  test("bm25: hand-computed scores, df/dl normalization, no-match docs absent") {
    // N=3, sum_dl=9, avgdl=3; df(x)=df(y)=2 → idf = ln(1.6)
    val docs = Seq((1L, "x x y"), (2L, "x z"), (3L, "y y y z"))
      .toDF("doc_id", "text")
    val got = Corpus.bm25(docs, "doc_id", "text", Seq("x", "y"))
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val idf = math.log(1.6)
    def s(tf: Long, dl: Long): Double =
      idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / 3.0))
    def r4(d: Double): Double = math.rint(d * 1e4) / 1e4
    assert(got(1L) === ((3L, 2L, r4(s(2, 3) + s(1, 3)))))
    assert(got(2L) === ((2L, 1L, r4(s(1, 2)))))
    assert(got(3L) === ((4L, 1L, r4(s(3, 4)))))
  }

  test("bm25: query term casing folds; absent term contributes no df row") {
    val docs = Seq((1L, "alpha beta"), (2L, "alpha")).toDF("doc_id", "text")
    val got = Corpus.bm25(docs, "doc_id", "text", Seq("ALPHA", "nosuch"))
      .as[(Long, Long, Long, Double)].collect()
    assert(got.map(_._1).sorted === Array(1L, 2L))
    assert(got.forall(_._3 == 1L)) // n_hit counts only the matched term
  }

  test("tokenEntropy: uniform, degenerate, and empty documents") {
    val docs = Seq(
      (1L, "a b a b"),   // H = ln 2
      (2L, "a a a"),     // single type → 0
      (3L, "a b c d"),   // uniform over 4 → ln 4
      (4L, "--- !!!")    // no tokens → null entropy
    ).toDF("doc_id", "text")
    val got = Corpus.tokenEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    def r4(d: Double): Double = math.rint(d * 1e4) / 1e4
    assert(got(1L) === ((4L, 2L, Some(r4(math.log(2))))))
    assert(got(2L) === ((3L, 1L, Some(0.0))))
    assert(got(3L) === ((4L, 4L, Some(r4(math.log(4))))))
    assert(got(4L) === ((0L, 0L, None)))
  }
}
