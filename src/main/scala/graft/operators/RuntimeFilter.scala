package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Shim

import graft.expressions.{BloomBuildAgg, BloomMightContain}

/** Explicit bloom runtime filter for selective-dim joins (see
  * BloomExprs scaladoc for the sketch itself).
  *
  * Execution shape: the dim side reduces to ONE binary scalar (per-
  * partition bitsets OR-merged at a single-row exchange), collected to
  * the driver exactly like a broadcast variable — bounded by
  * numBits/8 bytes regardless of dim cardinality. The fact side then
  * filters through a codegen'd probe INSIDE its scan stage, so the
  * join's exchange carries only probable matches. This is what Spark's
  * AQE-injected bloom filter does for plain equi-joins; carrying it as
  * an operator makes it available where the optimizer won't inject it
  * (derived keys, pre-aggregated facts, semi-join pipelines) and keeps
  * the filter deterministic across retries.
  */
object RuntimeFilter {

  /** `fact` rows whose `factKey` is in `dim`'s `dimKey` set —
    * exactly `fact JOIN dim ON factKey = dimKey LEFT SEMI`, with the
    * bloom pruning the fact side before the join shuffle. Keys must be
    * integral (cast to bigint internally).
    *
    * @param bitsPerKey bloom sizing relative to the dim key count
    *                   (16 bits/key + 8 hashes ≈ 5e-4 false positives)
    */
  def bloomSemiJoin(fact: DataFrame, factKey: String,
                    dim: DataFrame, dimKey: String,
                    bitsPerKey: Int = 16, numHashes: Int = 8): DataFrame = {
    // sizing pass: plain row count (an upper bound on distinct keys —
    // no extra shuffle, and oversizing a bloom only lowers its FPR);
    // bits = nKeys·bitsPerKey rounded UP to a power of two (pow2 keeps
    // the positions() modulo bias negligible AND satisfies the
    // 64-alignment BloomBuildAgg requires — the probe reconstructs
    // numBits from the bitset length, so a misaligned cap here would
    // mean probing a different modulus than the build: silent false
    // negatives). Cap is itself a power of two (128 Mbit = 16 MB).
    val nKeys = math.max(64L, dim.count())
    val numBits = math.min(1L << 27,
      java.lang.Long.highestOneBit(nKeys * bitsPerKey * 2 - 1)).toInt
    val bloom = dim
      .select(Shim.column(BloomBuildAgg(
        Shim.expression(col(dimKey).cast("long")), numBits, numHashes))
        .as("bf"))
      .head().getAs[Array[Byte]]("bf")
    fact
      .filter(Shim.column(BloomMightContain(
        Shim.expression(col(factKey).cast("long")), bloom, numHashes)))
      .join(dim.select(col(dimKey).as(factKey)), Seq(factKey), "left_semi")
  }
}
