package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level text curation operators (SURVEY.md §2 [EXT]
  * training-data pipeline): line-level boilerplate removal, tf-idf
  * keyword extraction, and target-proportion data mixing. The
  * reference's cleaning surface is per-value string standardization
  * (`assess_changes.qmd:289-331`); these are the corpus-wide
  * generalizations an LLM data pipeline runs at scale.
  */
object Corpus {

  /** CCNet-style line-level boilerplate removal: a LINE that occurs in
    * at least `minDocs` distinct documents (headers, footers, cookie
    * banners, nav text) is stripped from every document; per-document
    * line order is preserved for the surviving lines.
    *
    * Plan shape at scale: one exploded pass aggregates
    * `line → count(distinct doc)` (shuffle keyed on the line text);
    * the resulting blocklist is ONLY the lines above the threshold —
    * tiny next to the corpus (a line must repeat `minDocs`× to enter) —
    * so it broadcasts and the second exploded pass never shuffles
    * document text. The doc-side rebuild groups by id (one corpus-keyed
    * shuffle, unavoidable: the output is per-document).
    *
    * @return (idCol, clean_text, n_removed) — empty string when every
    *         line was boilerplate. NULL text is treated as empty text
    *         (the doc keeps its output row rather than silently
    *         vanishing from the curated corpus).
    */
  def stripBoilerplateLines(docs: DataFrame, idCol: String, textCol: String,
                            minDocs: Long): DataFrame = {
    def lines = docs.select(col(idCol),
      posexplode(split(coalesce(col(textCol), lit("")), "\n"))
        .as(Seq("pos", "line")))
    val blocklist = lines.groupBy("line")
      .agg(countDistinct(col(idCol)).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col("line"), lit(true).as("is_boiler"))
    lines.join(broadcast(blocklist), Seq("line"), "left")
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("pos"), col("line"),
        coalesce(col("is_boiler"), lit(false)).as("is_boiler")))).as("ls"))
      .select(col(idCol),
        concat_ws("\n",
          expr("transform(filter(ls, x -> NOT x.is_boiler), x -> x.line)"))
          .as("clean_text"),
        expr("CAST(size(filter(ls, x -> x.is_boiler)) AS BIGINT)")
          .as("n_removed"))
  }

  /** Top-`k` tf-idf keywords per document: terms are lowercase
    * alphanumeric runs; score = tf · ln(N / df); ties broken by term.
    *
    * Plan shape at scale: term frequencies shuffle on (doc, term),
    * document frequencies on term; the scored stream joins on term
    * (both sides already term-keyed) and the per-doc top-k runs as a
    * rank-limit window — Spark's WindowGroupLimit prunes to k rows per
    * doc on the map side before the final shuffle.
    *
    * @return (idCol, term, tfidf, rank), rank 1..k per document
    */
  def tfidfTopK(docs: DataFrame, idCol: String, textCol: String,
                k: Int): DataFrame = {
    def tok = docs.select(col(idCol),
      explode(split(lower(col(textCol)), "[^a-z0-9]+")).as("term"))
      .filter(col("term") =!= "")
    val tf = tok.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfq = tok.groupBy("term").agg(countDistinct(col(idCol)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("term"))
    tf.join(dfq, "term")
      .crossJoin(broadcast(n))
      .withColumn("score", col("tf") * log(col("n_docs") / col("df")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("term"),
        round(col("score"), 4).as("tfidf"), col("rank"))
  }

  /** Concat-then-chunk sequence packing — the standard LLM-pretraining
    * batching step: documents are laid end-to-end in a deterministic
    * order and the token stream is sliced into fixed `window`-token
    * training chunks; each document reports the chunk range it lands
    * in. Packing runs independently per SHARD (content-hash of the id,
    * `shards` of them), so the cumulative-sum window parallelizes —
    * one ordered window per shard over (id, n_tokens) SCALARS — while
    * staying fully deterministic and replayable (a single global
    * cumulative sum would serialize into one task at 100 TB).
    *
    * @return (idCol, shard, n_tokens, start_off, first_chunk,
    *         last_chunk); offsets are within the shard's stream
    */
  def packChunks(docs: DataFrame, idCol: String, nTokCol: Column,
                 window: Long, shards: Int, seed: Long = 42L,
                 portable: Boolean = false): DataFrame = {
    // same portable-vs-fast membership hash split as [[Sampling]]:
    // md5-low-60 replays in any engine, xxhash64 is the 100 TB path
    val shard =
      if (portable) pmod(conv(substring(md5(concat(col(idCol).cast("string"),
        lit(":" + seed))), 1, 15), 16, 10).cast("long"), lit(shards.toLong))
      else pmod(xxhash64(col(idCol), lit(seed)), lit(shards.toLong))
    val w = Window.partitionBy("shard").orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col(idCol), nTokCol.as("n_tokens"), shard.as("shard"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .select(col(idCol), col("shard"), col("n_tokens"),
        (col("cum") - col("n_tokens")).as("start_off"),
        floor((col("cum") - col("n_tokens")) / window).as("first_chunk"),
        floor((col("cum") - 1) / window).as("last_chunk"))
  }

  /** Downsample strata to hit TARGET PROPORTIONS (data mixing: "train
    * on 40% en / 20% de / 20% fr / 20% es"): the output is the LARGEST
    * corpus achievable at exactly the target mix — the scarcest stratum
    * (relative to its weight) is kept whole and every other stratum is
    * deterministically content-hash-sampled down to match.
    *
    * The per-stratum counts are a bounded driver-side aggregate (one
    * row per stratum — metadata, same posture as the reference's
    * column-name vectors); the sampling itself is [[Sampling]]'s
    * retry/repartition-stable membership hash, so the mixed corpus is
    * reproducible on any cluster size. Strata not named in `weights`
    * are dropped.
    */
  def mixToTarget(df: DataFrame, strataCol: Column, idCol: Column,
                  weights: Map[String, Double], seed: Long = 42L,
                  portable: Boolean = false): DataFrame = {
    val counts = df.filter(strataCol.isin(weights.keys.toSeq: _*))
      .groupBy(strataCol.as("s")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // no weighted stratum present → the target mix is unachievable at
    // any size; the largest conforming corpus is empty (not a crash)
    if (counts.isEmpty) return df.filter(lit(false))
    val budget = weights.collect {
      case (k, w) if w > 0 && counts.contains(k) => counts(k) / w
    }.min
    val fracs = weights.collect {
      case (k, w) if counts.contains(k) =>
        k -> math.min(1.0, budget * w / counts(k))
    }
    Sampling.stratifiedSample(df, strataCol, idCol, fracs, seed, portable)
  }
}
