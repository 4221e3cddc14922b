package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interpolated Kneser-Ney bigram language-model training (Kneser &
  * Ney '95; the formulation in Chen & Goodman '98) — the KenLM-style
  * count-based LM a pretraining pipeline trains for perplexity
  * filtering and decontamination scoring (CCNet trains exactly this
  * class of model over the corpus it curates). text_perplexity scores
  * under a unigram LM; this is the bigram upgrade with the KN
  * continuation-count smoothing that made count LMs production-grade.
  *
  * Model (fixed absolute discount D = 0.75, the Chen-Goodman default
  * for singletons-rich corpora):
  *
  *   P(w2|w1) = (c(w1,w2) − D)/c(w1)
  *            + D·N1+(w1,·)/c(w1) · Pcont(w2)
  *   Pcont(w2) = N1+(·,w2) / N1+(·,·)
  *
  * where c(w1) = Σ_w2 c(w1,w2) (history occurrences), N1+(w1,·) =
  * distinct continuations of w1, N1+(·,w2) = distinct histories of
  * w2, N1+(·,·) = distinct bigram types. Every input is an exact
  * integer; c(w1,w2) ≥ 1 > D so the discounted term never clips.
  *
  * Cross-engine determinism: NO transcendentals (the repo's ln()
  * posture is not needed here — KN is rational). The probability is a
  * fixed IEEE expression tree over integer-valued doubles, written
  * with the identical operation order in the operator and the DuckDB
  * oracle ([[probExpr]] is interpolated into BOTH), then floor-snapped
  * to 8 decimals — bit-identical on any IEEE engine. Everything else
  * the gate hashes is integers and words.
  *
  * Scale shape (100 TB): bigrams stream as narrow (w1, w2) scalar
  * rows — the token array never fans out (each pair row carries two
  * words, the text_colloc lesson from the fat sweep); all counts are
  * map-side-combinable aggregates over the bigram-type table; the
  * single-row type count broadcasts; top-k plans as TakeOrdered.
  * Scoring joins the scored corpus's bigram stream against the model
  * table on (w1, w2) — a plain shuffle-hash equi-join that partitions
  * by the join key, with per-doc INTEGER rollups after.
  */
object NgramLm {

  val D = 0.75

  /** The shared probability formula — interpolated into the Spark
    * plan AND the DuckDB oracle so the two expression trees cannot
    * drift (the text_chunk single-source-of-truth discipline). Column
    * requirements: c12, c1, n1fwd, n1rev, ntot (integers). Literals
    * are e-notation: a bare `0.75` parses as DECIMAL in Spark SQL
    * (and DuckDB), which would silently turn the whole expression —
    * and the output schema — decimal; `0.75e0` is DOUBLE in both.
    */
  def probExpr(cast: String => String): String = {
    val (c12, c1, n1f, n1r, nt) =
      (cast("c12"), cast("c1"), cast("n1fwd"), cast("n1rev"), cast("ntot"))
    s"floor((($c12 - ${D}e0) / $c1 + ${D}e0 / $c1 * $n1f * ($n1r / $nt)) " +
      "* 1e8 + 0.5e0) / 1e8"
  }

  /** Spark-dialect cast for [[probExpr]]. */
  private def sparkProb: String = probExpr(c => s"cast($c as double)")

  /** Full model table: one row per bigram TYPE with its counts and
    * snapped KN probability — (w1, w2, c12, c1, n1fwd, n1rev, ntot,
    * prob). Internal: trainers and scorers select from it.
    */
  def knBigramTable(docs: DataFrame, textCol: String): DataFrame = {
    // one pass emits bigrams AND history-final markers (w2 null on the
    // last token) — the collocations shape; only (w1, w2) scalars fan
    // out, never the token array
    val pairs = docs.select(expr(
      s"filter(split(lower($textCol), '[^a-z0-9]+'), x -> x != '')").as("t"))
      .select(explode(expr(
        """CASE WHEN size(t) < 2 THEN array()
          |ELSE transform(sequence(1, size(t) - 1),
          |  j -> struct(element_at(t, j) AS w1,
          |    element_at(t, j + 1) AS w2))
          |END""".stripMargin)).as("pr"))
      .select(col("pr.w1").as("w1"), col("pr.w2").as("w2"))
    val bg = Stage.materialize(
      pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c12")), "kn_bigrams")
    val h = bg.groupBy("w1")
      .agg(sum("c12").as("c1"), count(lit(1)).as("n1fwd"))
    val r = bg.groupBy("w2").agg(count(lit(1)).as("n1rev"))
    val n = bg.agg(count(lit(1)).as("ntot"))
    bg.join(h, "w1").join(r, "w2").crossJoin(broadcast(n))
      .withColumn("prob", expr(sparkProb))
  }

  /** Train and emit the top-`topK` bigrams by (c12 DESC, w1, w2) —
    * the gate-sized model summary: counts pin the smoothing inputs,
    * prob pins the formula.
    */
  def trainKnBigram(docs: DataFrame, textCol: String, topK: Int): DataFrame =
    knBigramTable(docs, textCol)
      .orderBy(col("c12").desc, col("w1"), col("w2"))
      .limit(topK)
      .select(col("w1"), col("w2"), col("c12"), col("n1fwd"),
        col("n1rev"), col("prob"))

  /** Score a corpus under a model trained on (a slice of) it: per
    * document, how many bigrams it has, how many the model knows, and
    * how many score below `lowProb` — the integer surprise profile a
    * perplexity filter thresholds on (kept integer so the gate hash
    * never sees an accumulated float). Docs with < 2 tokens keep a
    * (0, 0, 0) row.
    */
  def scoreKnBigram(trainDocs: DataFrame, scoreDocs: DataFrame,
                    idCol: String, textCol: String,
                    lowProb: Double): DataFrame = {
    val model = knBigramTable(trainDocs, textCol)
      .select(col("w1"), col("w2"), col("prob"))
    val pairs = scoreDocs.select(col(idCol), expr(
      s"filter(split(lower($textCol), '[^a-z0-9]+'), x -> x != '')").as("t"))
      .select(col(idCol), explode(expr(
        """CASE WHEN size(t) < 2 THEN array()
          |ELSE transform(sequence(1, size(t) - 1),
          |  j -> struct(element_at(t, j) AS w1,
          |    element_at(t, j + 1) AS w2))
          |END""".stripMargin)).as("pr"))
      .select(col(idCol), col("pr.w1").as("w1"), col("pr.w2").as("w2"))
    val scored = pairs.join(model, Seq("w1", "w2"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("nb"),
        count(col("prob")).as("nh"),
        sum(when(col("prob") < lowProb, 1L).otherwise(0L)).as("nl"))
    scoreDocs.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("nb"), lit(0L)).as("n_bigrams"),
        coalesce(col("nh"), lit(0L)).as("n_in_lm"),
        coalesce(col("nl"), lit(0L)).as("n_low"))
  }
}
