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

  /** Exact corpus-wide top-k terms with a Space-Saving fast path —
    * the adaptive form the r14 FAT audit forced (a single 64 MB
    * document with a ~1M-token namespace drowns any fixed-capacity
    * sketch: its N/capacity error bound (~65k counts) dwarfs the true
    * top terms (~960), so the sketch's answer is eviction-slot noise
    * while the exact answer is unreachable by ANY capacity a sketch
    * could afford).
    *
    * Plan: ONE sketch pass first (capacity-bounded partials, one
    * serialized summary row per partition at the exchange — the
    * vocabulary never shuffles), emitting ALL `capacity` slots. If the
    * merged summary holds FEWER than `capacity` slots, then no partial
    * ever reached capacity, so nothing was ever evicted or trimmed
    * anywhere — every count is exact and the summary IS the complete
    * vocabulary: top-k membership, order, and counts are all certified,
    * and the result builds driver-side from the ≤ capacity collected
    * slots (bounded by construction). Otherwise the distribution is
    * uncertifiable (the boundary case "exactly capacity distinct
    * terms" deliberately lands here — indistinguishable from eviction
    * from the outside) and the EXACT path runs: map-side-combined
    * `groupBy(term).count` + `orderBy.limit(k)` — Spark plans the
    * limit as TakeOrderedAndProject (per-partition top-k, driver
    * merge of k·partitions rows), so the only wide exchange is the
    * vocabulary-keyed count, the honest price of exactness under an
    * adversarial distribution. Both paths tie-break (cnt DESC, term
    * ASC) — identical to the SQL replay.
    *
    * At 100 TB: natural-language corpora whose working vocabulary fits
    * `capacity` (stopword/label/enum domains) stay on the one-pass
    * sketch; open vocabularies pay one extra aggregation instead of
    * returning silently wrong numbers. Driver memory is bounded by
    * `capacity + k` rows on every path.
    *
    * Execution contract (r15, ADVICE): the CERTIFICATION collect is
    * necessarily eager — whether the sketch is exact is a fact about
    * the data, so the path choice cannot be deferred into the plan.
    * One sketch pass therefore runs when this method is CALLED (and a
    * certified result is a LocalRelation built from its slots). The
    * fallback, however, is returned LAZY: the exact distributed count
    * + TakeOrdered top-k frame, with rank attached by a row_number
    * over the already-limited k rows (a bounded child, so the
    * single-partition window is k rows by construction — ScaleGuard's
    * unpartitioned-window rule explicitly admits it). A harness that
    * times actions, not construction, attributes the heavy exact pass
    * correctly; only the capacity-bounded sketch pass is
    * construction-time.
    */
  def topTermsExact(tok: DataFrame, termCol: String, k: Int,
                    capacity: Int): DataFrame = {
    val spark = tok.sparkSession
    val slots = topTermsSketch(tok, termCol, capacity).collect()
    if (slots.length < capacity) {
      import spark.implicits._
      slots.iterator.map(r => (r.getString(0), r.getLong(1))).toSeq
        .sortBy { case (t, c) => (-c, t) }.take(k)
        .zipWithIndex
        .map { case ((t, c), i) => (i + 1, t, c) }
        .toDF("rank", "term", "cnt")
    } else
      tok.groupBy(col(termCol).as("term"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("term")).limit(k)
        .select(row_number().over(org.apache.spark.sql.expressions.Window
            .orderBy(col("cnt").desc, col("term"))).as("rank"),
          col("term"), col("cnt"))
  }

  /** The sketch stage of [[topTermsExact]] — all `capacity` summary
    * slots as (term, cnt) rows. Factored out so plan tests can assert
    * the map-side partial sketch shape without running the adaptive
    * collect.
    */
  def topTermsSketch(tok: DataFrame, termCol: String,
                     capacity: Int): DataFrame =
    tok.agg(graft.functions.TextFns.topTerms(col(termCol), capacity,
        capacity).as("tt"))
      .select(explode(col("tt")).as("x"))
      .select(col("x.term"), col("x.cnt"))

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
    * Plan shape at scale: the token stream shuffles ONCE on term; that
    * exchange serves the (doc, term) frequency aggregate (subset-key
    * clustering), the document-frequency aggregate (derived from tf —
    * one row per (doc, term), so count(*) per term IS the distinct-doc
    * count), and the tf ⋈ df join. The per-doc top-k runs as a
    * rank-limit window — Spark's WindowGroupLimit prunes to k rows per
    * doc on the map side before that second, output-inherent shuffle.
    *
    * @return (idCol, term, tfidf, rank), rank 1..k per document
    */
  def tfidfTopK(docs: DataFrame, idCol: String, textCol: String,
                k: Int): DataFrame = {
    val tok = docs.select(col(idCol),
      explode(split(lower(col(textCol)), "[^a-z0-9]+")).as("term"))
      .filter(col("term") =!= "")
    // ONE term-keyed exchange serves the whole scoring side: the
    // (doc, term) frequency aggregate runs on it (subset-key
    // clustering), document frequency derives FROM tf (one row per
    // (doc, term) — count(*) per term IS the distinct-doc count; no
    // second corpus scan), and the tf ⋈ df join is already term-keyed
    // on both sides. The only other exchange is the per-doc rank
    // window's — inherent to the output.
    val tf = tok.repartition(col("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfq = tf.groupBy("term").agg(count(lit(1)).as("df"))
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
    // Sampling's shared content-hash convention: md5-low-60 replays in
    // any engine, xxhash64 is the 100 TB path
    val shard = pmod(Sampling.contentHash(col(idCol), seed, portable),
      lit(shards.toLong))
    val w = Window.partitionBy("shard").orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col(idCol), nTokCol.as("n_tokens"), shard.as("shard"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .select(col(idCol), col("shard"), col("n_tokens"),
        (col("cum") - col("n_tokens")).as("start_off"),
        floor((col("cum") - col("n_tokens")) / window).as("first_chunk"),
        floor((col("cum") - 1) / window).as("last_chunk"))
  }

  /** Unigram cross-entropy document scoring — the perplexity-style
    * quality filter of a CCNet-like pipeline (there: a KenLM 5-gram;
    * here: the dependency-free unigram LM trained on the corpus
    * itself). A document's score is the average negative log-likelihood
    * of its tokens under the corpus-wide term distribution, in nats per
    * token: low = built from common tokens (boilerplate-ish), high =
    * rare-token-heavy (noise, codes, other languages). Real pipelines
    * threshold or stratify on this score.
    *
    * Plan shape at scale: "training" the LM and scoring share ONE
    * tokenized pass — per-doc term frequencies first (shuffle on
    * (doc, term), map-side partial agg), the term totals derive from
    * that (term-keyed shuffle of the already-aggregated counts, NOT the
    * token stream), and scoring joins tf to the totals on term (both
    * sides term-keyed). The vocabulary is never broadcast or collected
    * — at 100 TB it wouldn't fit anywhere but a shuffle.
    *
    * @return (idCol, n_tokens, xent) — xent is NULL for documents with
    *         no tokens (they carry no evidence either way; callers
    *         filter or coalesce per policy)
    */
  def unigramCrossEntropy(docs: DataFrame, idCol: String,
                          textCol: String): DataFrame = {
    val tok = docs.select(col(idCol),
      explode(split(lower(col(textCol)), "[^a-z0-9]+")).as("term"))
      .filter(col("term") =!= "")
    // one term-keyed exchange shared by tf, the term totals, and the
    // scoring join (same single-exchange shape as tfidfTopK)
    val tf = tok.repartition(col("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val tc = tf.groupBy("term").agg(sum("tf").as("cnt"))
    val total = tc.agg(sum("cnt").as("total"))
    val scored = tf.join(tc, "term")
      .crossJoin(broadcast(total))
      .groupBy(col(idCol))
      .agg(sum(col("tf")).as("n_tokens"),
        (-sum(col("tf") * log(col("cnt") / col("total"))) /
          sum(col("tf"))).as("h"))
    docs.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        round(col("h"), 4).as("xent"))
  }

  /** PMI collocation mining — the top-k adjacent word pairs whose
    * pointwise mutual information `ln(p(ab) / (p(a)·p(b)))` is highest
    * among pairs seen at least `minCount` times: multiword expressions
    * ("new york", "machine learning") that tokenizers, stopword lists,
    * and phrase-aware dedup want to know about.
    *
    * Plan shape at scale: ONE tokenized pass — each token position j
    * emits exactly one `(t[j], t[j+1] | null)` pair (null marks "last
    * token of its document"), so a single map-side-combinable count
    * keyed on the pair carries BOTH statistics: bigram counts are the
    * non-null-w2 rows, and the unigram count of w is the exact sum of
    * `c_ab` over pairs with `w1 = w`. The pair table (distinct
    * adjacent pairs — vocabulary-scale, not corpus-scale) is staged
    * once and every downstream branch re-aggregates that small file;
    * round 7 tokenized the corpus twice because the bigram and
    * unigram branches each consumed the raw token stream — 2× the
    * dominant cost at 100 TB. The totals are one-row broadcasts; the
    * scoring joins key on the word.
    * The final rank is a GLOBAL top-k planned as
    * `TakeOrderedAndProject` — every partition keeps its local top k
    * and only k-row partials meet at the driver, so no task ever sorts
    * the full candidate stream (a global `row_number` window here
    * would serialize billions of ≥minCount pairs into one task at web
    * scale). Rank is then derived from the ≤k-row result by a single
    * bounded pack-sort-explode aggregate — no WindowExec anywhere in
    * the plan (PlanGuardSpec asserts this repo-wide).
    *
    * @return (w1, w2, c_ab, pmi, rank), rank 1..k by (pmi desc, pair)
    */
  def collocations(docs: DataFrame, textCol: String,
                   minCount: Long, k: Int): DataFrame = {
    val pairs = docs.select(expr(
      s"filter(split(lower($textCol), '[^a-z0-9]+'), x -> x != '')").as("t"))
      .select(explode(expr(
        """CASE WHEN size(t) = 0 THEN array()
          |ELSE transform(sequence(1, size(t)),
          |  j -> struct(element_at(t, j) AS w1,
          |    CASE WHEN j < size(t) THEN element_at(t, j + 1) END AS w2))
          |END""".stripMargin)).as("pr"))
      .select(col("pr.w1").as("w1"), col("pr.w2").as("w2"))
    val pc = Stage.materialize(
      pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c_ab")),
      "colloc_pairs")
    val bg = pc.filter(col("w2").isNotNull)
    val uni = pc.groupBy(col("w1").as("w")).agg(sum("c_ab").as("c"))
    val nb = bg.agg(sum("c_ab").as("nb"))
    val nu = uni.agg(sum("c").as("nu"))
    val top = bg.filter(col("c_ab") >= minCount)
      .join(uni.select(col("w").as("w1"), col("c").as("c_a")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("c_b")), "w2")
      .crossJoin(broadcast(nb)).crossJoin(broadcast(nu))
      .withColumn("pmi", log((col("c_ab") / col("nb")) /
        ((col("c_a") / col("nu")) * (col("c_b") / col("nu")))))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(k)
    // rank without a window: pack the ≤k winners into one array,
    // sort_array on (-pmi, pair) replays the top-k order (pmi is a
    // finite log — no NaN; -0.0 sorts equal to 0.0 and the unique
    // (w1, w2) tiebreak resolves it), posexplode numbers them
    top
      .agg(sort_array(collect_list(struct(
        (col("pmi") * -1d).as("np"), col("w1"), col("w2"),
        col("c_ab"), col("pmi")))).as("a"))
      .select(posexplode(col("a")).as(Seq("i", "x")))
      .select(col("x.w1").as("w1"), col("x.w2").as("w2"),
        col("x.c_ab").as("c_ab"), round(col("x.pmi"), 4).as("pmi"),
        (col("i") + 1).cast("int").as("rank"))
  }

  /** Fixed-size overlapping text chunking — the RAG / context-window
    * preparation step: each document is cut into `chunkSize`-character
    * windows advancing by `chunkSize - overlap` characters, so
    * consecutive chunks share `overlap` characters of context. Every
    * document yields at least one chunk (an empty text yields one empty
    * chunk rather than vanishing); the final chunk may be shorter.
    *
    * Plan shape at scale: a narrow exploding projection — chunk count,
    * offsets, and slices all derive per-row from the text length with
    * integer arithmetic (`DIV`, no floating ceil), entirely inside
    * whole-stage codegen. No shuffle: chunks inherit the parent
    * document's partition, which is exactly what a downstream embed /
    * index stage wants to `mapPartitions` over.
    *
    * @return (idCol, chunk_id, start_off, chunk_len, chunk_text);
    *         chunk_id counts from 0 per document, start_off is the
    *         0-based character offset
    */
  def chunkText(docs: DataFrame, idCol: String, textCol: String,
                chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      s"need 0 <= overlap < chunkSize, got chunkSize=$chunkSize overlap=$overlap")
    val stride = chunkSize - overlap
    // r13 (fat-record sweep): chunks come from the ONE-PASS native
    // ChunkSlices expression, not a per-chunk substr(). substr(k, size)
    // on a UTF8String is O(k) — the byte scan restarts from 0 to find
    // character k — so the exploded-substr formulation priced a 64 MB
    // document's ~447k chunks at ~10^13 byte reads (one task pinned
    // for hours, measured in the r13 sweep). ChunkSlices walks the
    // bytes once and copies each chunk out: O(text + output), same
    // output contract (offsets, counts, slices — ChunkSpec parity).
    docs.select(col(idCol), coalesce(col(textCol), lit("")).as("t"))
      .withColumn("len", length(col("t")).cast("long"))
      .select(col(idCol), col("len"),
        posexplode(org.apache.spark.sql.graftshim.Shim.column(
          graft.expressions.ChunkSlices(
            org.apache.spark.sql.graftshim.Shim.expression(col("t")),
            chunkSize, overlap))))
      .withColumn("chunk_id", col("pos").cast("long"))
      .withColumn("start_off", col("chunk_id") * stride)
      .select(col(idCol), col("chunk_id"), col("start_off"),
        least(lit(chunkSize.toLong), col("len") - col("start_off"))
          .as("chunk_len"),
        col("col").as("chunk_text"))
  }

  /** Per-group document cap — the C4/RefinedWeb-style "at most N pages
    * per domain" balancing step: within each group, documents are
    * ranked by a deterministic content hash of their id (so the kept
    * subset is stable across runs, retries, and cluster sizes — unlike
    * a rand() ordering) and rows past `maxPerGroup` are dropped.
    *
    * Plan shape at scale: one shuffle keyed on the group. The
    * rank-then-filter pattern is recognized by Spark's WindowGroupLimit
    * rule, which prunes each map-side partition to its top
    * `maxPerGroup` rows BEFORE the exchange — so a mega-domain (the
    * exact skew case domain capping exists for) ships at most
    * `maxPerGroup` rows per map task, not its full population.
    *
    * @return input columns + `cap_rank` (1-based rank within the
    *         group), only rows with cap_rank <= maxPerGroup
    */
  def capPerGroup(df: DataFrame, groupCol: Column, idCol: Column,
                  maxPerGroup: Int, seed: Long = 42L,
                  portable: Boolean = false): DataFrame = {
    // Sampling's shared content-hash convention as the priority
    val pri = Sampling.contentHash(idCol, seed, portable)
    val w = Window.partitionBy(groupCol).orderBy(col("graft_pri"), idCol)
    df.withColumn("graft_pri", pri)
      .withColumn("cap_rank", row_number().over(w))
      .filter(col("cap_rank") <= maxPerGroup)
      .drop("graft_pri")
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

  /** Temperature-based source rebalancing (the mT5/XLM-R alpha-sampling
    * stage): stratum s keeps fraction (n_min / n_s)^alpha of its rows,
    * so alpha = 1 preserves the natural distribution's SHAPE scaled to
    * the smallest stratum and alpha -> 0 flattens toward uniform. The
    * smallest stratum always keeps everything; membership is the shared
    * content-hash convention (retry/repartition-stable, and with
    * `portable` replayable in any engine with md5).
    *
    * Scale shape: the stratum-count aggregate is metadata-sized, its
    * single-row min cross-joins back (broadcast), and the per-row
    * decision is a narrow filter on the broadcast fraction — the corpus
    * itself is scanned once and never shuffled.
    *
    * alpha = 0.5 (the default, and the common published setting) is
    * computed as sqrt(n_min/n) — IEEE-correctly-rounded on every
    * engine, so the sampled set is BIT-IDENTICAL cross-engine. Other
    * alphas go through pow(), where engines may differ by 1 ulp — fine
    * for training mixes, but an exactness-gated replay should use 0.5.
    *
    * @return kept rows with their stratum's `frac` appended
    */
  def temperatureMix(df: DataFrame, strataCol: Column, idCol: Column,
                     alpha: Double = 0.5, seed: Long = 42L,
                     portable: Boolean = false): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    val counts = df.groupBy(strataCol.as("__s")).agg(count(lit(1)).as("__n"))
    val ratio = counts.crossJoin(counts.agg(min("__n").as("__nmin")))
      .withColumn("frac",
        if (alpha == 0.5) sqrt(col("__nmin") / col("__n"))
        else pow(col("__nmin") / col("__n"), lit(alpha)))
      .select(col("__s"), col("frac"))
    df.join(broadcast(ratio), strataCol === col("__s"))
      .filter(Sampling.keepByFraction(idCol, col("frac"), seed, portable))
      .drop("__s")
  }

  /** Okapi BM25 relevance scoring of every document against a fixed
    * term query — the retrieval scorer behind corpus search, RAG
    * candidate generation, and targeted-subset mining ("find the docs
    * about X to upsample"). Per matched document:
    * `sum_t idf(t) · tf·(k1+1) / (tf + k1·(1-b + b·dl/avgdl))` with
    * the Lucene idf `ln(1 + (N-df+0.5)/(df+0.5))` (always positive).
    *
    * Plan shape at scale: document length is a NARROW projection (no
    * tokenize shuffle — `dl` rides alongside the id), corpus stats
    * (N, Σdl) are one metadata-sized aggregate broadcast back, the
    * token stream is filtered to the query's terms BEFORE its only
    * exchange (so the shuffled volume is proportional to query-term
    * occurrences, not the corpus), and df is an aggregate of that
    * already-tiny tf frame, broadcast into the scoring join. Nothing
    * corpus-sized ever shuffles.
    *
    * Float parity: avgdl is computed as `Σdl / N` — ONE division of
    * exactly-summed integers — and every scoring step is written in
    * the same operation order as the SQL oracle, so both engines walk
    * identical IEEE doubles into the final ≤|query|-term sum.
    *
    * @return (idCol, dl, n_hit, bm25) for documents matching ≥1 term
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           queryTerms: Seq[String], k1: Double = 1.2,
           b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val terms = queryTerms.map(_.toLowerCase)
    val base = docs.select(col(idCol),
        filter(split(lower(col(textCol)), "[^a-z0-9]+"),
          t => t =!= "").as("tk"))
      .withColumn("dl", size(col("tk")).cast("long"))
    val stats = base.agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
    val tf = base.select(col(idCol), col("dl"), explode(col("tk")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col(idCol), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", col("sum_dl").cast("double") / col("n_docs"))
      .withColumn("s",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5))) *
        (col("tf") * lit(k1 + 1)) /
        (col("tf") + lit(k1) *
          (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col(idCol), col("dl"))
      .agg(count(lit(1)).as("n_hit"), round(sum("s"), 4).as("bm25"))
      .select(col(idCol), col("dl"), col("n_hit"), col("bm25"))
  }

  /** Per-document unigram (token) Shannon entropy in nats — the
    * lexical-diversity / gibberish signal of a Gopher-style quality
    * suite: near-zero entropy flags keyword-stuffed or looping text,
    * abnormally high entropy flags random-token noise. Computed as
    * `ln(n) - Σ tf·ln(tf) / n`, which is algebraically
    * `-Σ p·ln(p)` but needs no per-term probability pass — one
    * aggregate over the (doc, term) frequencies suffices, and the
    * oracle can replay the exact same operation order.
    *
    * Plan shape at scale: the token stream is repartitioned on the
    * document id ONCE; both the (doc, term) frequency aggregate and
    * the per-doc entropy aggregate run on that partitioning without
    * further exchange (subset-key clustering). Nothing is broadcast,
    * no vocabulary is materialized.
    *
    * @return (idCol, n_tokens, n_types, entropy); entropy is NULL for
    *         token-free documents (same posture as unigramCrossEntropy)
    */
  def tokenEntropy(docs: DataFrame, idCol: String,
                   textCol: String): DataFrame = {
    val tok = docs.select(col(idCol),
      explode(split(lower(col(textCol)), "[^a-z0-9]+")).as("term"))
      .filter(col("term") =!= "")
    val tf = tok.repartition(col(idCol))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val h = tf.groupBy(col(idCol))
      .agg(sum("tf").as("n_tokens"), count(lit(1)).as("n_types"),
        (log(sum("tf")) -
          sum(col("tf") * log(col("tf"))) / sum("tf")).as("h"))
    docs.select(col(idCol))
      .join(h, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_types"), lit(0L)).as("n_types"),
        round(col("h"), 4).as("entropy"))
  }
}
