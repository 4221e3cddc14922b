package graft

import org.apache.spark.sql.functions._
import graft.operators.Classify

/** Multinomial Naive Bayes (operators/Classify.scala): separable
  * corpora must classify perfectly, unseen-vocabulary docs must fall
  * back to the documented prior+default scoring with the deterministic
  * tie-break, zero-token docs drop, and the class-cardinality bound
  * fails loudly. The oracle-gated query (class_nb) covers the
  * engine-vs-engine math; this spec pins the MODEL semantics.
  */
class ClassifySpec extends SparkFunSuite {
  import spark.implicits._

  private val train = Seq(
    (0L, "apple banana cherry apple", "fruit"),
    (2L, "banana cherry banana melon", "fruit"),
    (4L, "dog emu fox dog", "beast"),
    (6L, "fox emu wolf emu", "beast")
  ).toDF("doc_id", "text", "source")

  private lazy val model =
    Classify.trainNb(train, "doc_id", "text", "source")

  test("separable held-out docs classify perfectly") {
    val test = Seq(
      (1L, "apple cherry melon"),
      (3L, "banana banana"),
      (5L, "wolf dog"),
      (7L, "emu fox fox wolf")
    ).toDF("doc_id", "text")
    val got = Classify.scoreNb(test, model, "doc_id", "text")
      .select("doc_id", "pred").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "fruit", 3L -> "fruit",
      5L -> "beast", 7L -> "beast"))
  }

  test("model shape: sorted classes, aligned priors and defaults") {
    assert(model.classes === Seq("beast", "fruit"))
    // equal doc counts -> equal priors ln(1/2)
    assert(model.priorLp.forall(p => math.abs(p - math.log(0.5)) < 1e-12))
    // both classes have 8 training tokens, shared V=8 vocab
    assert(model.defaultLp === Seq.fill(2)(math.log(1.0 / (8 + 8))))
  }

  test("unseen-vocab doc: exact score tie breaks to the larger class") {
    // every token unseen -> score_c = prior_c + n*default_c; priors and
    // defaults are equal here, so the tie must go to "fruit" (max name)
    // on Spark exactly as the oracle's ORDER BY score DESC, cls DESC
    val got = Classify.scoreNb(Seq((9L, "zebra quark")).toDF("doc_id", "text"),
      model, "doc_id", "text").as[(Long, String, Long, Double)].head()
    assert(got._2 === "fruit")
    assert(got._3 === 2L)
    // score is per token: (prior + n*default)/n
    val want = (math.log(0.5) + 2 * math.log(1.0 / 16)) / 2
    assert(math.abs(got._4 - math.rint(want * 1e4) / 1e4) < 1e-9)
  }

  test("zero-token docs are unclassifiable and drop from the output") {
    val got = Classify.scoreNb(
      Seq((11L, "...!!!"), (12L, "apple")).toDF("doc_id", "text"),
      model, "doc_id", "text")
    assert(got.select("doc_id").as[Long].collect().toSeq === Seq(12L))
  }

  test("class cardinality above maxClasses fails loudly") {
    val wide = (0 until 5).map(i => (i.toLong, s"tok$i", s"cls$i"))
      .toDF("doc_id", "text", "source")
    val e = intercept[IllegalArgumentException] {
      Classify.trainNb(wide, "doc_id", "text", "source", maxClasses = 3)
    }
    assert(e.getMessage.contains("maxClasses"))
  }

  test("scoring joins 1x the token stream: no cartesian, no window") {
    val test = Seq((1L, "apple wolf")).toDF("doc_id", "text")
    val p = Classify.scoreNb(test, model, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("Window"),
      "argmax must be the struct-max expression, not a window/cross join:\n" +
        p.take(1200))
  }
}
