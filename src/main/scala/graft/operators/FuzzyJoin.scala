package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked edit-distance (record-linkage) join.
  *
  * The reference's version matching joins files on an EXACT
  * standardized key (`assess_changes.qmd:97-114` via
  * `str_std_key`-normalized names); this is the fuzzy generalization a
  * large ingest pipeline needs when upstream names drift by more than
  * case/punctuation — typos, renamed tokens, truncations.
  *
  * Naive fuzzy join is O(n²) distance evaluations — a non-starter at
  * any scale. The standard fix is BLOCKING (Newcombe-style record
  * linkage): only pairs sharing a cheap deterministic block key are
  * compared. The block key is the caller's choice of discriminative
  * token (here: a name token); candidates then pass two filters that
  * each strictly under-approximate edit distance cost:
  *
  *  1. length band — `|len(a) - len(b)| <= maxDist` is implied by
  *     `lev(a,b) <= maxDist`, costs two ints, and prunes before any
  *     DP runs;
  *  2. banded Levenshtein — Spark's 3-arg `levenshtein(l, r, k)`
  *     computes only the `2k+1`-wide DP diagonal and bails to -1 the
  *     moment the distance provably exceeds `k`: O(k·min(|a|,|b|))
  *     per surviving pair instead of O(|a|·|b|).
  *
  * Scale shape: the only shuffle is the equi-join on the block key.
  * Within-block pair enumeration is quadratic in block size — that is
  * inherent to exact pairwise linkage — so oversized blocks are the
  * skew hazard, and the same guardrail as Dedup's mega-bucket salting
  * applies (Dedup.scala): blocks larger than `maxBlockSize` are split
  * into deterministic hash sub-blocks on the left side while the right
  * side replicates across the sub-blocks. Each pair is still compared
  * EXACTLY once (left occurrence decides the sub-block; the `a < b`
  * orientation kills the mirror), recall is 1.0 by construction, and
  * per-task row count is bounded by `maxBlockSize · |block|/nsub`
  * regardless of how hot the block key is.
  */
object FuzzyJoin {

  /** All intra-block pairs of `df` rows at edit distance 1..maxDist.
    *
    * @param df       input; one row per record
    * @param keyCol   unique orderable record id (pair orientation)
    * @param textCol  string compared by edit distance
    * @param blockCol blocking key: candidates are generated only within
    *                 equal block values (recall vs the unblocked ideal
    *                 is the caller's modeling choice, exactly as in
    *                 classical record linkage)
    * @param maxDist  inclusive edit-distance ceiling (>= 1)
    * @param maxBlockSize blocks above this size sub-salt (see scaladoc)
    * @return (blk, a_key, b_key, a_txt, b_txt, dist) with a_key < b_key
    */
  def selfPairs(df: DataFrame, keyCol: Column, textCol: Column,
                blockCol: Column, maxDist: Int,
                maxBlockSize: Int = 1000): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    // staged once: the frame feeds THREE plan branches (size aggregate,
    // a-side, b-side) — without the stage checkpoint any expensive
    // upstream pipeline (parsing, normalization) would execute 3x
    val base = Stage.materialize(
      df.select(keyCol.as("k"), textCol.as("txt"),
        blockCol.as("blk"), length(textCol).as("len")),
      "fuzzy_base")

    // Sub-salt plan: ONLY the oversized blocks (rare by construction),
    // broadcast to both sides — same shape as Dedup's cross-candidate
    // guardrail. A per-row count window here would shuffle the whole
    // input by blk just to learn sizes; the filtered aggregate moves
    // one count per block and the broadcast stays metadata-scale even
    // when the block-key cardinality is huge.
    val subPlan = broadcast(base.groupBy("blk")
      .agg(count(lit(1)).as("bn"))
      .filter(col("bn") > maxBlockSize)
      .select(col("blk"), ceil(col("bn") / maxBlockSize).cast("long")
        .as("nsub")))

    val a = base.join(subPlan, Seq("blk"), "left")
      .withColumn("sub",
        when(col("nsub").isNull, lit(0L))
          .otherwise(pmod(xxhash64(col("k")), col("nsub"))))
      .select(col("blk"), col("sub"), col("k").as("a_key"),
        col("txt").as("a_txt"), col("len").as("a_len"))
    val b = base.join(subPlan, Seq("blk"), "left")
      .withColumn("sub",
        explode(sequence(lit(0L), coalesce(col("nsub") - 1, lit(0L)))))
      .select(col("blk"), col("sub"), col("k").as("b_key"),
        col("txt").as("b_txt"), col("len").as("b_len"))

    a.join(b, Seq("blk", "sub"))
      .filter(col("a_key") < col("b_key") &&
        abs(col("a_len") - col("b_len")) <= maxDist)
      .withColumn("dist", levenshtein(col("a_txt"), col("b_txt"), maxDist))
      .filter(col("dist").between(1, maxDist))
      .select("blk", "a_key", "b_key", "a_txt", "b_txt", "dist")
  }
}
