package graft.queries

/** Independent DuckDB oracle for `dedup_minhash`: replays the whole
  * MinHash pipeline from raw text in SQL —
  *
  *  1. tokenize/shingle exactly like `Dedup.normTokens`/`ShingleHashes`
  *     (per-token FNV-1a 64, then a 3-step mix64 chain per word
  *     3-window, masked to 31 bits, distinct);
  *  2. derive the 64 universal-hash params from the seed exactly like
  *     `HashUtil.hashParams` (mix64 of 42+2j / 42+2j+1);
  *  3. per-doc signature = min (a·s + b) mod P31 per hash;
  *  4. est_jaccard = fraction of agreeing signature entries over ALL
  *     pairs, kept at est >= 0.35.
  *
  * 64-bit wraparound arithmetic is emulated with UHUGEINT mod 2^64;
  * each mix64 step is its own CTE stage (columns referenced by name),
  * so the splitmix chain doesn't explode into duplicated
  * subexpressions. Sums/mins that must stay exact avoid UHUGEINT
  * aggregates (DuckDB sums UHUGEINT as DOUBLE, losing low bits).
  *
  * The SQL is assembled here (one helper emits the four CTE stages of a
  * mix64 application) rather than pasted, so the constant structure is
  * auditable against HashUtil.mix64.
  */
object MinhashOracle {

  private val Mod = "'18446744073709551616'::UHUGEINT" // 2^64
  private val C1 = "11400714819323198485::UBIGINT" // 0x9e3779b97f4a7c15
  private val C2 = "13787848793156543929::UBIGINT" // 0xbf58476d1ce4e5b9
  private val C3 = "10723151780598845931::UBIGINT" // 0x94d049bb133111eb

  /** Four CTE stages computing `outCol` = mix64(`inExpr`) over rows of
    * `srcCte` (z + C1; (z^z>>>30)·C2; (z^z>>>27)·C3; z^z>>>31 — all
    * mod 2^64).
    */
  private[queries] def mixStages(srcCte: String, inExpr: String, outCol: String,
                        tag: String): String =
    s"""${tag}a AS (SELECT *, ((($inExpr)::UHUGEINT + $C1) % $Mod)::UBIGINT AS z$tag FROM $srcCte),
       |${tag}b AS (SELECT * REPLACE ((((xor(z$tag, z$tag >> 30))::UHUGEINT * $C2) % $Mod)::UBIGINT AS z$tag) FROM ${tag}a),
       |${tag}c AS (SELECT * REPLACE ((((xor(z$tag, z$tag >> 27))::UHUGEINT * $C3) % $Mod)::UBIGINT AS z$tag) FROM ${tag}b),
       |${tag}d AS (SELECT * EXCLUDE (z$tag), xor(z$tag, z$tag >> 31) AS $outCol FROM ${tag}c)""".stripMargin

  /** The shared CTE pipeline: raw text → signature-level agreement
    * `sagree(ta, tb, eq)` (of 64 signature entries) over DISTINCT
    * texts, plus the doc→text map `dmap` — the distinct-representative
    * discipline the Spark operators themselves follow.
    *
    * Round-12 restructure: the r11 form computed the sketch and the
    * pair agreement PER DOC. On a replicated corpus (documents clone
    * verbatim, mult× clusters) that re-sketches every clone and —
    * fatally at 100× — materializes clone-group PAIR cross-products
    * inside the agreement aggregation: ~2.9 GB of (id_a, id_b) groups
    * became >160 GB of DuckDB hash/spill and killed a 90 GB box. Here
    * the sketch (tokenize → FNV-1a → mix64 shingles → 64 universal-
    * hash minima) runs once per DISTINCT text keyed by md5(text) (kept
    * on md5 deliberately after r14 moved the engine's clone key to
    * SHA-256: the two engines now group by DIFFERENT hash functions, so
    * an engineered md5 collision in the corpus would surface as a gate
    * mismatch instead of both engines silently agreeing), the
    * agreement join runs over distinct-signature pairs (clone-count-
    * free), and [[agreeExpand]] re-expands to doc pairs as a pure
    * streaming join against `dmap` — constant aggregate state, no
    * pair-keyed hash table. Semantics are unchanged: clones share a
    * text, hence a signature, hence agree on all 64 entries (eq = 64,
    * est 1.0); cross-text agreement is a pure function of the texts.
    *
    * Pair enumeration joins on (j, v) EQUALITY and counts matches —
    * lossless relative to the r8 all-pairs form, because a pair
    * agreeing on ZERO entries cannot pass any downstream `eq/64 >= t`
    * filter, and mathematically distinct from the Spark side's BANDED
    * candidate generation (band collisions can miss true pairs;
    * value-equality grouping cannot).
    *
    * `tsig` (texts that produced >= 1 shingle) guards the intra-text
    * expansion: a doc whose text has < 3 tokens has NO signature, so
    * the r11 per-doc form never paired it — not even with an identical
    * clone — and the expansion must not either.
    */
  private val pipeline: String =
    s"""WITH planted AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000, text || ' zz'
       |  FROM documents WHERE doc_id % 50 = 0
       |),
       |dmap AS (SELECT doc_id, md5(text) AS tkey,
       |    length(text)::BIGINT AS n_chars FROM planted),
       |dt AS (SELECT md5(text) AS tkey, any_value(text) AS text
       |  FROM planted GROUP BY 1),
       |tk AS (SELECT tkey, string_split(trim(regexp_replace(lower(text),
       |    '[^a-z0-9]+', ' ', 'g')), ' ') AS tk FROM dt),
       |th AS (SELECT tkey, list_transform(tk, t -> list_reduce(
       |    list_prepend(14695981039346656037::UBIGINT,
       |      list_transform(generate_series(1, length(t)),
       |        i -> ord(substr(t, i, 1))::UBIGINT)),
       |    (h, b) -> (((xor(h, b))::UHUGEINT * 1099511628211::UBIGINT::UHUGEINT) % $Mod)::UBIGINT)) AS hs
       |  FROM tk),
       |wix AS (SELECT tkey, hs,
       |    unnest(generate_series(1, greatest(len(hs) - 2, 0))) AS i FROM th),
       |win AS (SELECT tkey, hs[i] AS ta, hs[i+1] AS tb, hs[i+2] AS tc FROM wix),
       |${mixStages("win", "xor(14695981039346656037::UBIGINT, ta)", "h1", "q1")},
       |${mixStages("q1d", "xor(h1, tb)", "h2", "q2")},
       |${mixStages("q2d", "xor(h2, tc)", "h3", "q3")},
       |sh AS (SELECT DISTINCT tkey, h3 & 2147483647::UBIGINT AS s FROM q3d),
       |pj AS (SELECT g.j AS j, (42 + 2*g.j)::UBIGINT AS za, (42 + 2*g.j + 1)::UBIGINT AS zb
       |  FROM generate_series(0, 63) AS g(j)),
       |${mixStages("pj", "za", "ma", "p1")},
       |${mixStages("p1d", "zb", "mb", "p2")},
       |params AS (SELECT j, (ma & 2147483647::UBIGINT) | 1::UBIGINT AS a,
       |    mb & 2147483647::UBIGINT AS b FROM p2d),
       |sig AS (SELECT tkey, j, min((a::BIGINT * s::BIGINT + b::BIGINT) % 2147483647) AS v
       |  FROM sh, params GROUP BY tkey, j),
       |tsig AS (SELECT DISTINCT tkey FROM sig),
       |sagree AS (SELECT x.tkey AS ta, y.tkey AS tb, count(*) AS eq
       |  FROM sig x JOIN sig y
       |    ON x.j = y.j AND x.v = y.v AND x.tkey < y.tkey
       |  GROUP BY 1, 2)""".stripMargin

  /** Doc-pair expansion of [[pipeline]]'s text-level agreement:
    * `agree(id_a, id_b, eq)` — identical contract to the r11 per-doc
    * CTE. Cross-text pairs fan out `sagree` through two `dmap` joins
    * (streamed: the only hash tables are the ~|docs| `dmap` sides, and
    * the 28.9M-row 100× expansion flows straight into the consumer);
    * intra-text clone pairs carry eq = 64 by identity, guarded by
    * `tsig` so signature-less texts pair with nothing.
    */
  private val agreeExpand: String =
    s"""agree AS (
       |  SELECT least(a.doc_id, b.doc_id) AS id_a,
       |    greatest(a.doc_id, b.doc_id) AS id_b, s.eq
       |  FROM sagree s
       |  JOIN dmap a ON a.tkey = s.ta
       |  JOIN dmap b ON b.tkey = s.tb
       |  UNION ALL
       |  SELECT a.doc_id, b.doc_id, 64::BIGINT AS eq
       |  FROM dmap a
       |  JOIN dmap b ON a.tkey = b.tkey AND a.doc_id < b.doc_id
       |  JOIN tsig t ON t.tkey = a.tkey)""".stripMargin

  val sql: String =
    s"""$pipeline,
       |$agreeExpand
       |SELECT id_a, id_b, round(eq / 64.0, 4) AS est_jaccard
       |FROM agree WHERE eq / 64.0 >= 0.35""".stripMargin

  /** Oracle for `dedup_incr`: the planted corpus splits into the
    * original documents (the INDEXED corpus) and the perturbed copies
    * (the NEW batch); the incremental probe must surface exactly the
    * cross near-dup pairs. Batch membership is STRUCTURAL — the batch
    * id set re-derived from the documents table, tested on BOTH pair
    * sides — not an id-magnitude split: the round-9 replicated-corpus
    * sweep showed the old `id < 1e6` threshold misclassifying
    * replica-offset corpus ids (>= 1e9) as batch docs, and pair
    * orientation flipping when a batch id from one replica block pairs
    * with a corpus id from a higher block. Exactly-one-side-in-batch
    * keeps cross pairs only, at any id scale.
    */
  val incrSql: String =
    s"""$pipeline,
       |$agreeExpand,
       |batch AS (SELECT doc_id + 1000000 AS id
       |  FROM documents WHERE doc_id % 50 = 0),
       |sel AS (SELECT id_a, id_b, eq,
       |    id_a IN (SELECT id FROM batch) AS a_b,
       |    id_b IN (SELECT id FROM batch) AS b_b
       |  FROM agree WHERE eq / 64.0 >= 0.35)
       |SELECT CASE WHEN a_b THEN id_b ELSE id_a END AS corpus_id,
       |  CASE WHEN a_b THEN id_a ELSE id_b END AS batch_id,
       |  round(eq / 64.0, 4) AS est_jaccard
       |FROM sel WHERE a_b <> b_b""".stripMargin

  /** Oracle for `stream_neardup`: each doc paired with its EARLIEST
    * (min-id) near-duplicate predecessor at est >= 0.35.
    */
  val firstDupSql: String =
    s"""$pipeline,
       |$agreeExpand
       |SELECT id_b AS doc_id, min(id_a) AS dup_of
       |FROM agree WHERE eq / 64.0 >= 0.35 GROUP BY id_b""".stripMargin

  /** Oracle for `dedup_cluster`: the same full sketch replay produces
    * the candidate-pair edge set; a recursive CTE then computes the
    * TRANSITIVE closure — the ground-truth connected component,
    * computed by an algorithm (reachability fixpoint) entirely unlike
    * the Spark side's alternating-star contraction.
    *
    * Round-12 restructure: the reachability fixpoint runs at the TEXT
    * level (nodes = distinct signatures' texts, edges = `sagree` at
    * est >= 0.35), then doc labels expand through `dmap`. Doc-level
    * components ARE text-level components expanded: clones of one text
    * agree on all 64 entries (est 1.0 >= 0.35), so every doc of a text
    * is connected to every doc of any text in the same text-component,
    * and `cluster_id` = min doc_id over the component's docs — exactly
    * the r11 per-doc fixpoint's label. The r11 form seeded `reach` with
    * every planted doc and joined doc-level edges: at 100× that is
    * ~clone² reach tuples per component per iteration (>100M rows a
    * round), where the text-level fixpoint is |distinct texts|-sized.
    * Signature-less texts (< 3 tokens → no edges possible) fall out of
    * `tcomp`; their docs keep themselves via the COALESCE, matching the
    * r11 self-seeded reach.
    */
  private val clusterCtes: String =
    s"""${pipeline.replaceFirst("WITH ", "WITH RECURSIVE ")},
       |tedges AS (
       |  SELECT ta AS a, tb AS b FROM sagree WHERE eq / 64.0 >= 0.35
       |  UNION
       |  SELECT tb, ta FROM sagree WHERE eq / 64.0 >= 0.35),
       |treach(src, dst) AS (
       |  SELECT tkey, tkey FROM tsig
       |  UNION
       |  SELECT r.src, e.b FROM treach r JOIN tedges e ON r.dst = e.a),
       |tcomp AS (SELECT src AS tkey, min(dst) AS tcid
       |  FROM treach GROUP BY src),
       |cmin AS (SELECT t.tcid, min(d.doc_id) AS cluster_id
       |  FROM tcomp t JOIN dmap d ON d.tkey = t.tkey GROUP BY 1),
       |lab AS (
       |  SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id
       |  FROM dmap d
       |  LEFT JOIN tcomp t ON d.tkey = t.tkey
       |  LEFT JOIN cmin c ON c.tcid = t.tcid)""".stripMargin

  val clusterSql: String =
    s"""$clusterCtes
       |SELECT doc_id, cluster_id, doc_id = cluster_id AS keep
       |FROM lab""".stripMargin

  /** Oracle for `corpus_split_safe`: ground-truth components (same
    * recursive reachability as [[clusterSql]]), then the 80/10/10
    * portable-hash split assignment computed on the CLUSTER id — the
    * leakage-free guarantee is structural: two docs in one component
    * share the hash input, hence the split.
    */
  val splitSafeSql: String =
    s"""$clusterCtes
       |SELECT doc_id, cluster_id,
       |  CASE WHEN b < 800000 THEN 'train'
       |       WHEN b < 900000 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM (SELECT doc_id, cluster_id,
       |  ('0x' || substr(md5(cluster_id::VARCHAR || ':42'), 1, 15))
       |    ::BIGINT % 1000000 AS b FROM lab)""".stripMargin

  /** Oracle for `dedup_best`: same ground-truth components as
    * [[clusterSql]], but the canonical member is the LONGEST document
    * (ties → lowest doc_id) — the keep-the-most-complete-version
    * heuristic — instead of the minimum id.
    */
  val bestSql: String =
    s"""$clusterCtes,
       |jl AS (SELECT lab.doc_id, lab.cluster_id, d.n_chars
       |  FROM lab JOIN dmap d ON lab.doc_id = d.doc_id)
       |SELECT doc_id, cluster_id, n_chars,
       |  (row_number() OVER (PARTITION BY cluster_id
       |    ORDER BY n_chars DESC, doc_id)) = 1 AS keep
       |FROM jl""".stripMargin
}

/** Independent DuckDB oracle for `sim_ann_lsh`: replays hyperplane LSH
  * end-to-end from the raw embeddings —
  *
  *  1. the weight matrix exactly as `HyperplaneBuckets` derives it
  *     (mix64(seed + t·7919 + p·1000003 + i) >>> 12, scaled to [-1,1));
  *  2. per-(vector, table) bucket = the 4 projection sign bits. A plain
  *     SQL SUM is safe here even though double addition isn't
  *     associative: the smallest |projection| over the corpus is ~1e-4
  *     while reorder error is ~1e-16, so no sign can flip;
  *  3. candidates = corpus vectors sharing any table's bucket with a
  *     query; exact cosine ranking, top-5.
  *
  * Together with the recall spec this makes the LSH ANN path fully
  * cross-engine verified; only the IVF/PQ rankings (float k-means
  * internals) remain golden-pinned.
  */
object LshOracle {
  // sim_ann_lsh params: dim=64, planes=4, tables=12, seed=42, k=5.
  // `ctes` ends at the ranked candidate CTE `r` so sim_recall can
  // join the same replay against the exact brute-force ranking.
  val ctes: String =
    s"""WITH tpigrid AS (
       |  SELECT t.t AS t, p.p AS p, i.i AS i,
       |    (42 + t.t*7919 + p.p*1000003 + i.i)::UBIGINT AS z0
       |  FROM generate_series(0,11) t(t), generate_series(0,3) p(p),
       |       generate_series(0,63) i(i)),
       |${MinhashOracle.mixStages("tpigrid", "z0", "mx", "w1")},
       |w AS (SELECT t, p, i,
       |    (mx >> 12)::DOUBLE / 4503599627370496.0 * 2.0 - 1.0 AS wt
       |  FROM w1d),
       |v AS (SELECT vec_id, unnest(embedding) AS x,
       |    generate_subscripts(embedding, 1) - 1 AS i FROM embeddings),
       |proj AS (SELECT v.vec_id, w.t, w.p, sum(v.x::DOUBLE * w.wt) AS pr
       |  FROM v JOIN w ON v.i = w.i GROUP BY v.vec_id, w.t, w.p),
       |bkt AS (SELECT vec_id, t,
       |    CAST(sum(CASE WHEN pr >= 0 THEN 1 << p ELSE 0 END) AS BIGINT)
       |      AS bucket
       |  FROM proj GROUP BY vec_id, t),
       |cand AS (SELECT DISTINCT q.vec_id AS qid, c.vec_id AS vec_id
       |  FROM bkt q JOIN bkt c ON q.t = c.t AND q.bucket = c.bucket
       |  WHERE q.vec_id < 5 AND c.vec_id != q.vec_id),
       |sc AS (SELECT cand.qid, cand.vec_id,
       |    list_cosine_similarity(CAST(qe.embedding AS DOUBLE[]),
       |      CAST(ce.embedding AS DOUBLE[])) AS sim_raw
       |  FROM cand
       |  JOIN embeddings qe ON qe.vec_id = cand.qid
       |  JOIN embeddings ce ON ce.vec_id = cand.vec_id),
       |r AS (SELECT qid, vec_id, sim_raw, row_number() OVER (
       |    PARTITION BY qid ORDER BY sim_raw DESC, vec_id) AS rk FROM sc)""".stripMargin

  val sql: String = ctes +
    """
      |SELECT qid, vec_id, round(sim_raw, 3) AS sim, rk
      |FROM r WHERE rk <= 5""".stripMargin
}
