package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Deduplication operators for training-data pipelines (SURVEY.md §2 [EXT],
  * BASELINE.json north-star): exact, MinHash+LSH, SimHash, and exact n-gram
  * Jaccard verification. Everything is built from Catalyst expressions and
  * DataFrame joins — no driver-side loops — so each operator scales out:
  *
  *  - signatures/sketches are per-row narrow projections (codegen'd),
  *  - candidate generation shuffles only (band, bucket) keys (a few ints
  *    per document, not the document text),
  *  - mega-buckets (degenerate keys that would quadratically explode at
  *    100 TB) are capped via `maxBucketSize`, the standard LSH guardrail.
  *
  * ANSI-safe arithmetic: hash mixing stays under 2^62 (31-bit operands) so
  * Spark 4's default ANSI overflow checking never trips.
  */
object Dedup {

  /** Mersenne prime 2^31-1 for universal hashing. */
  private val P31 = 2147483647L

  /** Deterministic per-seed hash parameters (a, b) with 0 < a,b < 2^31. */
  private def hashParams(k: Int, seed: Long): Seq[(Long, Long)] =
    (0 until k).map { i =>
      val a = (mix64(seed + 2L * i) & 0x7fffffffL) | 1L
      val b = mix64(seed + 2L * i + 1) & 0x7fffffffL
      (a, b)
    }

  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Normalized word tokens: lowercase, strip non-alphanumerics, split. */
  def normTokens(text: Column): Column =
    split(trim(regexp_replace(lower(text), "[^a-z0-9]+", " ")), " ")

  /** Word n-gram shingles of the normalized text (distinct). */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = normTokens(text)
    val ngrams = transform(
      sequence(lit(0), greatest(size(toks) - n, lit(0))),
      i => concat_ws(" ", slice(toks, i + 1, lit(n))))
    array_distinct(when(size(toks) >= n, ngrams)
      .otherwise(array(concat_ws(" ", toks))))
  }

  /** 31-bit shingle hashes (distinct), the MinHash input set. */
  def shingleHashes(text: Column, n: Int = 3): Column =
    array_distinct(transform(shingles(text, n), s => pmod(xxhash64(s), lit(P31))))

  /** MinHash signature: array of k minima of universal hashes over the
    * shingle-hash set. One nested higher-order expression — evaluated
    * per row, no shuffle.
    */
  def minhashSignature(text: Column, k: Int = 64, n: Int = 3,
                       seed: Long = 42L): Column = {
    val hs = shingleHashes(text, n)
    val mins = hashParams(k, seed).map { case (a, b) =>
      array_min(transform(hs, h => pmod(lit(a) * h + lit(b), lit(P31))))
    }
    array(mins: _*)
  }

  /** Estimated Jaccard similarity from two equal-length signatures. */
  def sigSimilarity(sigA: Column, sigB: Column): Column =
    aggregate(
      zip_with(sigA, sigB, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, x) => acc + x).cast("double") / size(sigA)

  /** MinHash+LSH near-duplicate candidate pairs.
    *
    * Banding: k = bands * rowsPerBand; a pair lands in a bucket iff one
    * band of their signatures matches exactly. Shuffle key is
    * (band, xxhash64(band slice)) — constant bytes per doc per band.
    *
    * @return (id_a, id_b, est_jaccard) with id_a < id_b,
    *         est_jaccard >= threshold.
    */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
                   bands: Int = 16, rowsPerBand: Int = 4, n: Int = 3,
                   threshold: Double = 0.5, seed: Long = 42L,
                   maxBucketSize: Int = 1000): DataFrame = {
    val k = bands * rowsPerBand
    val sigs = df.select(
      col(idCol).as("id"),
      minhashSignature(col(textCol), k, n, seed).as("sig"))

    val banded = sigs.select(
      col("id"), col("sig"),
      posexplode(transform(
        sequence(lit(0), lit(bands - 1)),
        b => xxhash64(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")

    // Guardrail: drop degenerate mega-buckets before the quadratic join.
    val counted = banded
      .withColumn("bucket_n",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy("band", "bucket")))
      .filter(col("bucket_n") <= maxBucketSize)
      .drop("bucket_n")

    val a = counted.select(col("band"), col("bucket"),
      col("id").as("id_a"), col("sig").as("sig_a"))
    val b = counted.select(col("band"), col("bucket"),
      col("id").as("id_b"), col("sig").as("sig_b"))

    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        sigSimilarity(col("sig_a"), col("sig_b")).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
      .groupBy("id_a", "id_b").agg(max("est_jaccard").as("est_jaccard"))
  }

  /** 64-bit SimHash of the normalized token multiset. Per-row aggregate
    * over token hashes maintaining 64 signed counters, then sign-packed.
    */
  def simhash64(text: Column): Column = {
    val hashes = transform(normTokens(text), t => xxhash64(t))
    val counters = aggregate(
      hashes,
      array_repeat(lit(0), 64),
      (acc, h) => zip_with(
        acc,
        transform(sequence(lit(0), lit(63)),
          i => when(call_function("shiftrightunsigned", h, i).bitwiseAND(lit(1L)) === 1L, 1)
            .otherwise(-1)),
        (c, d) => c + d))
    // pack sign bits into a long: sum of 2^i over positive counters,
    // built from 31-bit-safe pieces via shiftleft on a long literal
    aggregate(
      zip_with(counters, sequence(lit(0), lit(63)),
        (c, i) => when(c > 0, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** SimHash near-duplicate pairs: block on 8 8-bit chunks — by pigeonhole
    * any pair with Hamming distance <= 7 shares at least one exact chunk,
    * so recall is guaranteed for maxDist <= 7. bit_count(xor) is a single
    * codegen'd expression.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxDist: Int = 7, maxBucketSize: Int = 1000): DataFrame = {
    val sk = df.select(col(idCol).as("id"), simhash64(col(textCol)).as("sh"))
    val chunked = sk.select(
      col("id"), col("sh"),
      posexplode(transform(sequence(lit(0), lit(7)),
        i => call_function("shiftrightunsigned", col("sh"), i * 8).bitwiseAND(lit(0xffL)))))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "key")
    val capped = chunked
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("chunk", "key")))
      .filter(col("n") <= maxBucketSize).drop("n")
    val a = capped.select(col("chunk"), col("key"),
      col("id").as("id_a"), col("sh").as("sh_a"))
    val b = capped.select(col("chunk"), col("key"),
      col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("chunk", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .filter(col("hamming") <= maxDist)
      .groupBy("id_a", "id_b").agg(min("hamming").as("hamming"))
  }

  /** Exact n-gram Jaccard for a candidate-pair relation: joins the shingle
    * sets back in and computes |A∩B|/|A∪B| exactly. Use after
    * `minhashPairs` to verify estimates.
    */
  def jaccardVerify(pairs: DataFrame, docs: DataFrame, idCol: String,
                    textCol: String, n: Int = 3): DataFrame = {
    val sets = docs.select(col(idCol).as("id"),
      shingles(col(textCol), n).as("sh"))
    pairs
      .join(sets.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
  }

  /** Exact dedup: keep the minimum id per distinct key expression. */
  def exactByKey(df: DataFrame, idCol: String, key: Column): DataFrame =
    df.groupBy(key.as("dedup_key"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))
}
