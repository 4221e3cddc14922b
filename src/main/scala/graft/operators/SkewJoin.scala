package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for equi-joins (SURVEY.md §7 100 TB design rule).
  *
  * Measured head-to-head (ScaleProbe round 4, whale key = 50% of an
  * 8M-row fact side, non-broadcastable dim): unmitigated SMJ 9.9 s,
  * AQE skew-split 3.5 s, saltedJoin 3.0 s. So the DEFAULT at scale is
  * AQE's skew-join (on by default, zero config, adapts at runtime —
  * for inner joins it splits the hot partition and replicates the
  * matching right blocks, which handles even a single hot key).
  * Salting is the explicit tool for the shapes AQE's split cannot
  * reach: outer joins where the replicated side is the outer side
  * (row duplication would change semantics, so AQE refuses), skew
  * mitigation that must happen BEFORE a downstream stage reuses the
  * partitioning, or when deterministic task sizing is required up
  * front. Mechanism: scatter the skewed side uniformly over `salt`
  * sub-keys (deterministic content hash, no rand() so retried tasks
  * stay consistent), replicate the other side once per sub-key, join
  * on (key, salt), drop the salt. Replication cost is `salt × |right|`
  * rows — use for moderate-size right sides that are too big to
  * broadcast but far smaller than the skewed left.
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
