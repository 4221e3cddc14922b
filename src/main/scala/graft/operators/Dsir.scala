package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection via importance resampling (Xie et al.
  * '23, "Data Selection for Language Models via Importance
  * Resampling") — rank a raw corpus by how target-domain-like each
  * document's hashed-feature profile is, and keep the top slice. The
  * production pretraining-curation move: train-distribution shaping
  * without a learned classifier (the counterpart to class_nb's
  * fastText-shape filter).
  *
  * Faithful-but-rational variant, documented deltas from the paper:
  *
  *  - features are hashed word unigrams (the paper hashes n-grams;
  *    the bucket machinery is identical) into `numBuckets` buckets
  *    via the first 24 bits of md5 — md5 is the repo's established
  *    cross-engine hash (text_fingerprint), so the oracle replays
  *    bucketing exactly;
  *  - the paper scores docs by Σ log(p_target(b)/p_raw(b)); log is a
  *    libm fault line and float sums are partition-order-dependent,
  *    so the per-BUCKET likelihood ratio (add-one smoothed) is
  *    snapped ONCE to integer ten-thousandths —
  *    `floor(((ct+1)(Nr+B))/((cr+1)(Nt+B)) · 10⁴ + 0.5)` — and the
  *    per-doc score is an INTEGER sum of those points (order-free,
  *    hash-safe). Ratio-points instead of log-points reweights large
  *    ratios linearly rather than logarithmically; the top-slice
  *    SELECTION this exists for is rank-based either way.
  *  - the paper resamples with Gumbel noise; selection here is the
  *    deterministic top-k by (avg points per token DESC, doc_id) —
  *    the reproducible-curation convention every corpus_* op follows.
  *
  * Scale shape (100 TB): ONE token pass → a staged (doc, bucket,
  * count) partial aggregate (narrow scalars, ≤ numBuckets rows per doc
  * however fat the doc — r18, the fat-corpus A/B in
  * reports/DSIRFAT_r18.md retired the second tokenize+md5 pass); the
  * bucket table aggregates from the stage to ≤ numBuckets rows and
  * BROADCASTS back onto it (a 4096-row dimension); the totals are one
  * broadcast row; per-doc rollups are integer sums over the stage and
  * the cut is a TakeOrdered — no window, no driver collect.
  */
object Dsir {

  /** Importance-rank `docs` against the target slice `isTarget`.
    *
    * @param isTarget boolean Column marking target-domain rows (rows
    *                 where it is null count as non-target)
    * @param topK     documents to keep
    * @return (idCol, n_tokens, pts, avg_pts) — the selected topK by
    *         (avg_pts DESC, id); token-less docs never rank
    */
  def select(docs: DataFrame, idCol: String, textCol: String,
             isTarget: Column, topK: Int,
             numBuckets: Int = 4096): DataFrame = {
    val tok = docs.select(col(idCol),
      when(isTarget, 1L).otherwise(0L).as("is_t"),
      explode(expr(
        s"filter(split(lower($textCol), '[^a-z0-9]+'), x -> x != '')"))
        .as("w"))
    val bt = tok.select(col(idCol), col("is_t"),
      (conv(substring(md5(col("w")), 1, 6), 16, 10).cast("long")
        % numBuckets).as("b"))
    // r18 (fat-corpus A/B, reports/DSIRFAT_r18.md): tokenize+md5 ONCE.
    // The (doc, bucket) partial aggregate is staged — O(docs × distinct
    // buckets per doc) narrow scalars, ≤ numBuckets rows per doc
    // however fat the doc — and BOTH rollups (bucket table, per-doc
    // points) read it, where the previous shape re-ran the full
    // tokenize+md5+explode pass for the per-doc rollup (2-3× slower on
    // the 64 MB-giant corpus: 46-80 s vs 23-25 s).
    val bt2 = Stage.materialize(
      bt.groupBy(col(idCol), col("is_t"), col("b"))
        .agg(count(lit(1)).as("c")),
      "dsir_doc_buckets")
    val bc = bt2.groupBy("b")
      .agg(sum("c").as("cr"), sum(col("is_t") * col("c")).as("ct"))
    val n = bc.agg(sum("cr").as("nr"), sum("ct").as("nt"))
    // r16 advice: cast each factor to double BEFORE multiplying — the
    // int64 products (ct+1)(nr+B) / (cr+1)(nt+B) overflow once the
    // corpus token count nears ~1e9·B/ct, where Spark wraps silently
    // and duckdb raises (an engine divergence). Double products are
    // exact to 2^53 and IEEE-identical cross-engine above it; the
    // snapped points are unchanged at all safe scales.
    val pts = bc.crossJoin(broadcast(n))
      .select(col("b"), floor(
        ((col("ct") + 1).cast("double") *
          (col("nr") + numBuckets).cast("double")) /
          ((col("cr") + 1).cast("double") *
            (col("nt") + numBuckets).cast("double")) *
          lit(10000.0) + lit(0.5)).as("p"))
    val ds = bt2.join(broadcast(pts), "b")
      .groupBy(col(idCol))
      .agg(sum("c").as("n_tokens"), sum(col("c") * col("p")).as("pts"))
      .withColumn("avg_pts", expr("pts div n_tokens"))
    ds.orderBy(col("avg_pts").desc, col(idCol))
      .limit(topK)
      .select(col(idCol), col("n_tokens"), col("pts"), col("avg_pts"))
  }
}
