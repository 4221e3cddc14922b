package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for corpus balancing (SURVEY.md §2 [EXT]
  * training-data pipeline).
  *
  * `df.sample`/`sampleBy` draw from `rand()`, which is evaluated per
  * task attempt — a retried or re-partitioned stage yields a DIFFERENT
  * sample, so a 100 TB job that loses one executor produces a corpus
  * nobody can reproduce. These operators decide membership by hashing
  * row CONTENT (the id column) with the seed: the same row lands in the
  * same sample on every run, every cluster size, every retry — the same
  * reasoning as SkewJoin's deterministic salt.
  */
object Sampling {

  /** Keep a row iff hash(id, seed) mod 1e6 < fraction·1e6 — a
    * content-addressed Bernoulli sample at `fraction`.
    */
  def deterministicSample(df: DataFrame, idCol: Column, fraction: Double,
                          seed: Long = 42L, portable: Boolean = false): DataFrame =
    df.filter(bucket1M(idCol, seed, portable) < (fraction * 1e6).toLong)

  /** Per-stratum fractions (corpus balancing: e.g. downsample the
    * dominant language). Strata absent from `fractions` are dropped,
    * matching `DataFrameStatFunctions.sampleBy` semantics.
    */
  def stratifiedSample(df: DataFrame, strataCol: Column, idCol: Column,
                       fractions: Map[String, Double],
                       seed: Long = 42L, portable: Boolean = false): DataFrame = {
    val frac = fractions.foldLeft(lit(null).cast("double")) {
      case (acc, (k, f)) => when(strataCol === k, lit(f)).otherwise(acc)
    }
    df.filter(frac.isNotNull &&
      bucket1M(idCol, seed, portable) < (frac * 1e6).cast("long"))
  }

  /** Membership predicate for a per-row COLUMN fraction (the
    * stratified/temperature mixers compute fractions in-frame): keep a
    * row iff hash(id, seed) mod 1e6 < floor(frac·1e6) — the same
    * truncation `stratifiedSample` applies to its literal fractions, so
    * column-valued and literal-valued sampling can never disagree on a
    * boundary bucket.
    */
  def keepByFraction(idCol: Column, fracCol: Column, seed: Long = 42L,
                     portable: Boolean = false): Column =
    bucket1M(idCol, seed, portable) < (fracCol * 1e6).cast("long")

  /** Deterministic multi-way split assignment — the train/val/test
    * partitioning step of a training-data pipeline: each row gets the
    * first split whose cumulative fraction bound exceeds the row's
    * content-hash bucket. Content addressing makes the split
    * reproducible across runs, retries, cluster sizes, and (with
    * `portable = true`) across engines — and a document keeps its split
    * when the corpus around it grows, which `ntile`/`rand` splits do
    * not guarantee. Narrow projection: no shuffle.
    *
    * @param splits ordered (name, fraction) list; fractions must sum
    *               to 1 (last split absorbs the hash-bucket remainder)
    * @return input columns + `split`
    */
  def assignSplits(df: DataFrame, idCol: Column,
                   splits: Seq[(String, Double)], seed: Long = 42L,
                   portable: Boolean = false): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0) &&
      math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must be positive and sum to 1: $splits")
    val b = bucket1M(idCol, seed, portable)
    val uppers = splits.scanLeft(0.0)(_ + _._2).tail // cumulative bounds
    val assign = splits.zip(uppers).init
      .foldRight(lit(splits.last._1): Column) {
        case (((name, _), upper), els) =>
          // round, not truncate: cumulative IEEE sums land a hair BELOW
          // round fractions as often as above (0.6 + 0.1 = 0.6999…),
          // and truncation would silently shift the bucket boundary
          when(b < math.round(upper * 1e6), lit(name)).otherwise(els)
      }
    df.withColumn("split", assign)
  }

  /** THE content-hash convention, shared by every deterministic
    * sampling/sharding/priority operator (here, `Corpus.packChunks`,
    * `Corpus.capPerGroup`) — one definition so the portable encoding
    * can never drift between call sites and silently diverge an
    * oracle-gated query.
    *
    * `portable = false`: xxhash64 — the fast path (one multiply-rotate
    * per row; use at 100 TB). `portable = true`: the low 60 bits of
    * md5(id || ':' || seed) — byte-identical in any engine with md5
    * (DuckDB: `('0x' || substr(md5(x), 1, 15))::BIGINT`), so a sample
    * drawn by one engine can be reproduced/audited by another. Both are
    * content-addressed and retry/repartition-stable.
    */
  private[graft] def contentHash(idCol: Column, seed: Long,
                                     portable: Boolean): Column =
    if (portable)
      conv(substring(md5(concat(idCol.cast("string"), lit(":" + seed))),
        1, 15), 16, 10).cast("long")
    else xxhash64(idCol, lit(seed))

  private def bucket1M(idCol: Column, seed: Long, portable: Boolean): Column =
    pmod(contentHash(idCol, seed, portable), lit(1000000L))
}
