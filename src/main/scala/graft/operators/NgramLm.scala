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

  /** The trigram probability formula (r17) — the same single-source
    * discipline as [[probExpr]]: interpolated into the Spark plan AND
    * the DuckDB oracle with an identical operation order. Chen-Goodman
    * interpolated KN one order up, recursing to continuation counts:
    *
    *   P(w3|w1,w2) = (c(w1w2w3) − D)/c(w1w2·)
    *               + D·N1+(w1w2,·)/c(w1w2·) · P_mid(w3|w2)
    *   P_mid(w3|w2) = (N1+(·w2w3) − D)/N1+(·w2·)
    *               + D·N1+cont(w2,·)/N1+(·w2·) · Pcont(w3)
    *   Pcont(w3) = N1+mid(·,w3) / |mid types|
    *
    * where EVERY middle/low count derives from the trigram TYPE table
    * (the Chen-Goodman continuation-count convention — the middle
    * level's "counts" are N1+(·,w2,w3), not raw bigram counts):
    * c123, c12 = Σ_w3 c123, n1mid = N1+(w1w2,·) distinct w3 after
    * (w1,w2); nc23 = N1+(·w2w3) distinct w1 before (w2,w3); nc2dot =
    * Σ_w3 nc23 = N1+(·w2·); n1fwd2 = distinct w3 in the mid table for
    * w2; n1rev3 = distinct w2 in the mid table before w3; ntot =
    * mid-table type count. All exact integers ≥ 1, so neither
    * discounted numerator clips.
    */
  def probExpr3(cast: String => String): String = {
    val (c123, c12, n1mid, nc23, nc2, n1f2, n1r3, nt) =
      (cast("c123"), cast("c12"), cast("n1mid"), cast("nc23"),
        cast("nc2dot"), cast("n1fwd2"), cast("n1rev3"), cast("ntot"))
    s"floor((($c123 - ${D}e0) / $c12 + ${D}e0 / $c12 * $n1mid * " +
      s"(($nc23 - ${D}e0) / $nc2 + ${D}e0 / $nc2 * $n1f2 * " +
      s"($n1r3 / $nt))) * 1e8 + 0.5e0) / 1e8"
  }

  /** Spark-dialect cast for [[probExpr3]]. */
  private def sparkProb3: String = probExpr3(c => s"cast($c as double)")

  /** Full trigram model table: one row per trigram TYPE with every
    * smoothing input and the snapped probability — (w1, w2, w3, c123,
    * c12, n1mid, nc23, nc2dot, n1fwd2, n1rev3, ntot, prob).
    *
    * Scale shape: identical to [[knBigramTable]] one order up — the
    * token array fans out to narrow (w1, w2, w3) scalar rows (three
    * words per row, never the array); the trigram type table stages
    * once and every higher/middle/low aggregate is a
    * map-side-combinable groupBy over it; the mid table (w2, w3,
    * nc23) stages once and feeds three bounded rollups; the single
    * type-total row broadcasts.
    */
  def knTrigramTable(docs: DataFrame, textCol: String): DataFrame = {
    val trips = docs.select(expr(
      s"filter(split(lower($textCol), '[^a-z0-9]+'), x -> x != '')").as("t"))
      .select(explode(expr(
        """CASE WHEN size(t) < 3 THEN array()
          |ELSE transform(sequence(1, size(t) - 2),
          |  j -> struct(element_at(t, j) AS w1,
          |    element_at(t, j + 1) AS w2,
          |    element_at(t, j + 2) AS w3))
          |END""".stripMargin)).as("tr"))
      .select(col("tr.w1").as("w1"), col("tr.w2").as("w2"),
        col("tr.w3").as("w3"))
    val tg = Stage.materialize(
      trips.groupBy("w1", "w2", "w3").agg(count(lit(1)).as("c123")),
      "kn3_trigrams")
    val h12 = tg.groupBy("w1", "w2")
      .agg(sum("c123").as("c12"), count(lit(1)).as("n1mid"))
    val mid = Stage.materialize(
      tg.groupBy("w2", "w3").agg(count(lit(1)).as("nc23")), "kn3_mid")
    val m2 = mid.groupBy("w2")
      .agg(sum("nc23").as("nc2dot"), count(lit(1)).as("n1fwd2"))
    val lo = mid.groupBy("w3").agg(count(lit(1)).as("n1rev3"))
    val n = mid.agg(count(lit(1)).as("ntot"))
    tg.join(h12, Seq("w1", "w2")).join(mid, Seq("w2", "w3"))
      .join(m2, "w2").join(lo, "w3").crossJoin(broadcast(n))
      .withColumn("prob", expr(sparkProb3))
  }

  /** Train and emit the top-`topK` trigrams by (c123 DESC, w1, w2,
    * w3) — counts pin the smoothing inputs, prob pins the recursive
    * formula.
    */
  def trainKnTrigram(docs: DataFrame, textCol: String, topK: Int): DataFrame =
    knTrigramTable(docs, textCol)
      .orderBy(col("c123").desc, col("w1"), col("w2"), col("w3"))
      .limit(topK)
      .select(col("w1"), col("w2"), col("w3"), col("c123"),
        col("n1mid"), col("nc23"), col("prob"))

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
