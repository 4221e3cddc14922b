package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for equi-joins (SURVEY.md §7 100 TB design rule).
  *
  * AQE's skew-join split (on by default) rebalances oversized sort-merge
  * partitions at runtime, but it cannot split a single hot KEY whose hash
  * bucket exceeds an executor — the classic "null key / whale customer"
  * failure at 100 TB. Salting fixes that shape: scatter the skewed side
  * uniformly over `salt` sub-keys (deterministic content hash, no rand()
  * so retried tasks stay consistent), replicate the other side once per
  * sub-key, join on (key, salt), drop the salt. Replication cost is
  * `salt × |right|` rows — use for moderate-size right sides that are
  * too big to broadcast but far smaller than the skewed left.
  */
object SkewJoin {

  /** Inner equi-join of a skewed `left` against `right` on `key`,
    * salted `salt` ways. Result equals `left.join(right, key)` exactly.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salt: Int): DataFrame = {
    // deterministic per-row scatter: hash the whole left row
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(struct(left.columns.map(col).toIndexedSeq: _*)), lit(salt))
        .cast("int"))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedLeft.join(replicatedRight, Seq(key, "__salt")).drop("__salt")
  }
}
