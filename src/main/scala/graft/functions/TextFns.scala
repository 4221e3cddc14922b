package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis surface for large-scale training-data pipelines (the
  * north-star [EXT] operators in SURVEY.md §2 / BASELINE.json): token
  * counting, quality scoring, language-ID heuristics, fingerprinting.
  * All pure built-in expressions — codegen'd, shuffle-free per row, and
  * therefore safe to run over 100 TB of `documents`-shaped data.
  */
object TextFns {

  /** BPE-ish token pattern: runs of letters, runs of digits, or single
    * non-alphanumeric-non-space symbols — a cheap deterministic proxy for
    * subword tokenizers' pre-tokenization split.
    */
  val BpeTokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  /** Corpus-wide approximate top-`k` heavy hitters over a term column
    * in one pass with `capacity`-bounded memory per partial sketch
    * (Space-Saving; see expressions.SpaceSavingTopK). Returns
    * array<struct<term, cnt, err>> with est - err <= true <= est;
    * exact (err 0) while distinct terms per partial <= capacity.
    */
  def topTerms(term: Column, k: Int, capacity: Int): Column =
    org.apache.spark.sql.graftshim.Shim.column(
      graft.expressions.SpaceSavingTopK(
        org.apache.spark.sql.graftshim.Shim.expression(term), k, capacity)
        .toAggregateExpression())

  /** All per-document signals from ONE native byte scan
    * (graft.expressions.TextSignals) — the round-1/2 regex formulations
    * cost ~10 regex passes per document. Field extractions over
    * identical `signals(text)` subtrees collapse via codegen
    * subexpression elimination, so every consumer below shares the one
    * scan. Semantics are regex-identical; the DuckDB oracles still
    * verify that equivalence against a real regex engine at the gate.
    */
  def signals(text: Column): Column =
    org.apache.spark.sql.graftshim.Shim.column(
      graft.expressions.TextSignals(
        org.apache.spark.sql.graftshim.Shim.expression(text)))

  /** Whitespace token count (`size(split(trim(text), "\s+"))`). */
  def wsTokenCount(text: Column): Column =
    signals(text).getField("n_words")

  /** BPE-ish token count via regexp_extract_all. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeTokenPattern), lit(0)))

  /** Flesch Reading Ease (206.835 − 1.015·words/sentences −
    * 84.6·syllables/words) on the corpus's standard heuristics:
    * words = the repo's [a-z0-9]+ tokens, sentences = runs of
    * terminal punctuation (min 1), syllables = vowel-group runs
    * [aeiouy]+ in the lowercased text. Null for word-less docs.
    * A narrow codegen'd projection — three regex passes, no shuffle.
    */
  def readingEase(text: Column): Column = {
    val words = size(filter(split(lower(text), "[^a-z0-9]+"),
      t => t =!= "")).cast("double")
    val sentences = greatest(
      size(regexp_extract_all(text, lit("[.!?]+"), lit(0))), lit(1))
      .cast("double")
    val syllables = size(regexp_extract_all(lower(text),
      lit("[aeiouy]+"), lit(0))).cast("double")
    when(words > 0,
      lit(206.835) - lit(1.015) * (words / sentences) -
        lit(84.6) * (syllables / words))
  }

  /** Punctuation character ratio (0 when empty). */
  def punctRatio(text: Column): Column =
    when(signals(text).getField("n_chars") > 0,
      signals(text).getField("n_punct").cast("double") /
        signals(text).getField("n_chars"))
      .otherwise(lit(0.0))

  /** Mean whitespace-token length. */
  def avgWordLen(text: Column): Column =
    when(wsTokenCount(text) > 0,
      signals(text).getField("n_nonws").cast("double") /
        wsTokenCount(text))
      .otherwise(lit(0.0))

  // Minimal per-language stopword regexes for the n-gram/stopword
  // language-ID heuristic. Word-boundary anchored, case-insensitive.
  val StopwordPatterns: Seq[(String, String)] = Seq(
    "en" -> "(?i)\\b(the|and|of|to|in|is|that|it|for|was)\\b",
    "es" -> "(?i)\\b(el|la|de|que|y|los|del|las|por|una)\\b",
    "de" -> "(?i)\\b(der|die|und|das|ist|von|mit|den|nicht|ein)\\b",
    "fr" -> "(?i)\\b(le|la|et|les|des|en|un|du|une|est)\\b",
    "zh" -> "[\\u4e00-\\u9fff]",
  )

  /** Per-language stopword hit count (field of the one-scan signals
    * struct; the regex patterns above document the exact semantics and
    * back the DuckDB oracles).
    */
  def stopwordHits(text: Column, lang: String): Column =
    signals(text).getField(lang)

  /** Stopword ratio against English stopwords (quality signal). */
  def stopwordRatio(text: Column): Column =
    when(wsTokenCount(text) > 0,
      stopwordHits(text, "en").cast("double") / wsTokenCount(text))
      .otherwise(lit(0.0))

  /** Heuristic language ID: argmax of stopword hits with a fixed
    * alphabetical tie-break, `und` when all scores are zero. Expressed as
    * a deterministic greatest/when chain so an oracle can mirror it.
    */
  def langId(text: Column): Column = {
    val langs = StopwordPatterns.map(_._1).sorted // deterministic tie-break
    val scores = langs.map(l => l -> stopwordHits(text, l))
    val best = greatest(scores.map(_._2): _*)
    val chain = scores.foldRight(lit("und")) { case ((l, s), acc) =>
      when(best > 0 && s === best, lit(l)).otherwise(acc)
    }
    chain
  }

  /** Composite quality score in [0,1]: rewards mid-length docs, prose-like
    * punctuation levels, and some stopword presence. Deterministic
    * arithmetic only.
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / 500.0, lit(1.0))
    val punctOk = when(punctRatio(text) < 0.2, 1.0).otherwise(0.5)
    val stopOk = when(stopwordRatio(text) > 0.0, 1.0).otherwise(0.7)
    round(lenScore * punctOk * stopOk, 4)
  }

  /** Normalized-content fingerprint: lowercase, strip non-alphanumerics,
    * collapse whitespace, md5. Two documents with the same fingerprint are
    * exact dups modulo casing/punctuation/whitespace — the cheap first
    * pass of a dedup pipeline (before MinHash).
    */
  def fingerprint(text: Column): Column =
    md5(normalizedBytes(text))

  /** One-pass native normalization (lowercase alnum, collapse, trim) as
    * the exact UTF-8 bytes — see expressions.NormalizeAlnum. Fronts
    * every dedup sketch; replaces a per-document regex NFA walk.
    */
  def normalizedBytes(text: Column): Column =
    org.apache.spark.sql.graftshim.Shim.column(
      graft.expressions.NormalizeAlnum(
        org.apache.spark.sql.graftshim.Shim.expression(text)))

  /** Per-document n-gram repetition signals (Gopher-style repetition
    * quality filters) from one native pass over the normalized bytes —
    * struct (n2, top2, dup2, n3, top3, dup3). See
    * expressions.RepetitionSignals.
    */
  def repetitionSignals(text: Column): Column =
    org.apache.spark.sql.graftshim.Shim.column(
      graft.expressions.RepetitionSignals(
        org.apache.spark.sql.graftshim.Shim.expression(normalizedBytes(text))))

  /** One-pass fused scrub — `redactPii(stripHtml(text))` semantics in a
    * single native byte scan (graft.expressions.ScrubText) instead of
    * five regexp_replace NFA walks. The regex formulations below remain
    * the specification: ExpressionEdgeSpec asserts fused/staged parity on
    * adversarial inputs, and the DuckDB oracle replays the regex chain.
    */
  def scrub(text: Column): Column =
    org.apache.spark.sql.graftshim.Shim.column(
      graft.expressions.ScrubText(
        org.apache.spark.sql.graftshim.Shim.expression(text)))

  /** Strip HTML/XML tags and entities, collapse the leftover whitespace —
    * the boilerplate-removal first pass over scraped corpora. Pure
    * codegen'd regexp_replace chain (RE2-compatible patterns).
    */
  def stripHtml(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(text, "<[^>]*>", " "),
        "&[a-zA-Z]{2,6};|&#[0-9]{1,5};", " "),
      "\\s+", " "))

  /** Redact common PII (emails, international-ish phone numbers) with
    * typed placeholders — the privacy-scrub stage of a training-data
    * pipeline. Deliberately conservative patterns; a production deploy
    * layers NER on top, but the regex tier catches the structured 90%.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text,
        "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
      "\\+?[0-9]{1,3}[-. ][0-9]{2,4}[-. ][0-9]{2,4}[-. ][0-9]{2,6}", "<PHONE>")

  /** Luhn mod-10 validity of a digit-string candidate (ISO/IEC 7812) —
    * separates real payment-card numbers from random digit runs in a
    * PII scan. Pure builtin array HOFs (reverse → indexed transform →
    * aggregate), codegen-friendly, integer arithmetic only: from the
    * right, every second digit doubles (−9 when > 9) and the total must
    * be ≡ 0 (mod 10). Non-digit characters are ignored (pass candidates
    * from a digit-run regex, not raw text).
    */
  def luhnValid(card: Column): Column = {
    val terms = transform(
      reverse(regexp_extract_all(card, lit("\\d"), lit(0))), (x, i) => {
        val v = x.cast("int")
        when(i % 2 === 1,
          when(v * 2 > 9, v * 2 - 9).otherwise(v * 2)).otherwise(v)
      })
    size(terms) > 0 && aggregate(terms, lit(0), (a, b) => a + b) % 10 === 0
  }

  /** Winnowing (rolling-hash) fingerprint set over the normalized text —
    * position-robust partial-overlap detection (the MOSS scheme): any
    * shared run of ≳ k+w characters yields shared fingerprints at any
    * offset. Native expression (graft.expressions.WinnowFingerprint).
    */
  def winnowFingerprint(text: Column, k: Int = 8, w: Int = 16,
                        portable: Boolean = false): Column = {
    val norm = normalizedBytes(text).cast("string")
    org.apache.spark.sql.graftshim.Shim.column(
      graft.expressions.WinnowFingerprint(
        org.apache.spark.sql.graftshim.Shim.expression(norm), k, w, portable))
  }
}
