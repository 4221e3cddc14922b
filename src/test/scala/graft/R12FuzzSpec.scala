package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.functions.Cols

/** Round-12 hardening: randomized exactness fuzz for `Cols.sumCents`
  * (Cols.scala) — now load-bearing for 10 money-sum gate queries but
  * previously covered only by the single IngestSpec case from the 30×
  * sweep fix. The property under test is the one the convention exists
  * for: over >10⁶ two-decimal summands per cell, the Spark partial-agg
  * tree (any partitioning) returns BIT-IDENTICAL doubles equal to a
  * sequential BigDecimal fold of the same values — i.e. the sum is
  * plan-independent and engine-exact, where a plain `sum(double)`'s
  * last-ulp value depends on the aggregation tree shape.
  *
  * Data is generated distributed (xxhash64-derived cents, seeded) so
  * the test exercises real partial aggregation across partitions, not
  * a driver-side array; the driver only folds the collected values for
  * the independent truth.
  */
class R12FuzzSpec extends SparkFunSuite {
  import spark.implicits._

  test("sumCents: 10^6+ summands/cell, bit-exact vs sequential " +
       "BigDecimal fold, invariant across repartitionings") {
    val rnd = new Random(20260815L)
    for (trial <- 0 until 2) {
      val seed = rnd.nextLong()
      val n = 2200000L // 2 cells x 1.1M summands
      // cents in [-10^8, 10^8): values up to +-$1M with exactly 2
      // decimals; c/100.0 then round(v*100) round-trips exactly at
      // this magnitude (|c| << 2^51)
      val base = spark.range(n)
        .withColumn("g", (col("id") % 2).cast("int"))
        .withColumn("cents",
          pmod(xxhash64(col("id"), lit(seed)), lit(200000000L))
            - lit(100000000L))
        .withColumn("v", col("cents") / lit(100.0))
        .select("g", "v")

      def run(parts: Int): Map[Int, Double] =
        base.repartition(parts)
          .groupBy("g").agg(Cols.sumCents(col("v")).as("s"))
          .as[(Int, Double)].collect().toMap

      val byPlan = Seq(1, 13, 64).map(run)
      // independent sequential truth: BigDecimal fold of the
      // 2-decimal values, ONE final division like the convention
      val truth = base.as[(Int, Double)].collect()
        .groupBy(_._1)
        .map { case (g, rows) =>
          val centsSum = rows.foldLeft(BigDecimal(0)) { (acc, r) =>
            acc + BigDecimal(math.round(r._2 * 100), 2)
          }
          g -> ((centsSum * 100).toLongExact / 100.0)
        }

      for (plan <- byPlan; (g, s) <- plan) {
        assert(java.lang.Double.doubleToLongBits(s) ==
               java.lang.Double.doubleToLongBits(truth(g)),
          s"trial $trial seed $seed cell $g: sumCents=$s truth=${truth(g)}")
      }
      // plan-independence stated directly: all three partitionings
      // produced the identical bit pattern per cell
      assert(byPlan.distinct.size == 1,
        s"trial $trial seed $seed: partitioning changed the sum: $byPlan")
    }
  }

  test("minhashPairsDistinct / minhashClusters: exact parity with the " +
       "doc-level path on a clone-heavy corpus") {
    import graft.operators.{ConnectedComponents, Dedup}
    // clone-heavy fixture: sf0.001 planted docs x5 verbatim clones with
    // offset ids — the shape that made doc-level banding quadratic
    val base = queries.t(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    // r13: three NULL-text docs ride along — the clone collapse must
    // keep them as self-singleton membership rows (SQL equality never
    // equates NULLs), where the r12 text-keyed equi-join dropped them
    // from membership entirely
    val clones = ReplicateCorpus.fanOut(spark, base, "documents",
        Seq("doc_id"), mult = 5, skew = 0)
      .unionByName(Seq(9000000001L, 9000000002L, 9000000003L).toDF("doc_id")
        .withColumn("text", lit(null).cast("string")))
    val tau = 0.35

    val docPairs = Dedup.minhashPairs(clones, "doc_id", "text",
      threshold = tau).select("id_a", "id_b", "est_jaccard")
    val distPairs = Dedup.minhashPairsDistinct(clones, "doc_id", "text",
      threshold = tau).select("id_a", "id_b", "est_jaccard")
    assert(docPairs.exceptAll(distPairs).isEmpty &&
           distPairs.exceptAll(docPairs).isEmpty,
      "pair sets (incl. est) must be identical")

    val docLabels = {
      val labels = ConnectedComponents.labels(
        docPairs.select("id_a", "id_b"), "id_a", "id_b")
      clones.select(col("doc_id").as("id"))
        .join(labels, Seq("id"), "left")
        .select(col("id"), coalesce(col("cluster"), col("id")).as("cluster"))
    }
    val distLabels = Dedup.minhashClusters(clones, "doc_id", "text",
      threshold = tau)
    assert(docLabels.exceptAll(distLabels).isEmpty &&
           distLabels.exceptAll(docLabels).isEmpty,
      "component labels must be identical")
    // the null-text docs are present, each its own singleton cluster
    val nullClusters = distLabels.filter(col("id") >= 9000000001L)
      .as[(Long, Long)].collect().toMap
    assert(nullClusters ==
      Map(9000000001L -> 9000000001L, 9000000002L -> 9000000002L,
          9000000003L -> 9000000003L),
      s"null-text docs must self-cluster, got $nullClusters")
  }

  test("verifiedPairsDistinct: exact parity (incl. jaccard values) with " +
       "the doc-level verified path on a clone-heavy corpus") {
    import graft.operators.Dedup
    // same clone-heavy fixture as the minhash parity test, plus
    // null-text riders (must never pair — singleton membership) and a
    // pair of EMPTY-text clones (ShingleHashes emits ONE whole-text
    // shingle for <= n tokens, so the doc-level contract pairs them at
    // jaccard 1.0 — the collapsed intra path must reproduce that, not
    // drop them)
    val base = queries.t(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    val clones = ReplicateCorpus.fanOut(spark, base, "documents",
        Seq("doc_id"), mult = 5, skew = 0)
      .unionByName(Seq(9000000001L, 9000000002L).toDF("doc_id")
        .withColumn("text", lit(null).cast("string")))
      .unionByName(Seq(9000000003L, 9000000004L).toDF("doc_id")
        .withColumn("text", lit("")))

    val docPairs = Dedup.verifiedPairs(clones, "doc_id", "text",
      finalThreshold = 0.5).select("id_a", "id_b", "jaccard")
    val (membership, reps) = Dedup.textGroups(clones, "doc_id", "text")
    val distPairs = Dedup.verifiedPairsDistinct(membership,
        Dedup.fitShingleSets(reps, "rep", "text"), finalThreshold = 0.5)
      .select("id_a", "id_b", "jaccard")
    assert(docPairs.exceptAll(distPairs).isEmpty &&
           distPairs.exceptAll(docPairs).isEmpty,
      "verified pair sets (incl. exact jaccard) must be identical")
    // sanity: the clone corpus actually produces intra-group pairs
    assert(distPairs.filter(col("jaccard") === 1.0).count() > 0)
    // null-text docs never pair; the empty-text clone pair IS emitted
    // at exactly 1.0 (the whole-text-shingle contract), on both paths
    val riders = distPairs.filter(col("id_a") >= 9000000001L)
      .as[(Long, Long, Double)].collect().toList
    assert(riders == List((9000000003L, 9000000004L, 1.0)),
      s"degenerate riders: $riders")
  }

  test("verifiedPairsDistinct: clone group > maxBucketSize — collapsed " +
       "path emits ALL C(n,2) intra pairs where doc-level salting drops " +
       "some (intended divergence, Dedup.scala parity-scope contract)") {
    import graft.operators.Dedup
    // 100 verbatim clones of one text with maxBucketSize = 5: every
    // band bucket holds the whole group (identical minhash rows), so
    // saltOversized splits it into ~20 hash sub-buckets per band and
    // the doc-level self-join only pairs ids that co-land in SOME
    // band's sub-bucket (P ≈ 1-(19/20)^16 ≈ 0.56 per pair —
    // deterministic here: fixed ids, fixed seed). The collapsed path
    // never bands the group at all — one rep, selfJ jaccard 1.0, and
    // the intra expansion emits every pair.
    val n = 100
    val text = "the quick brown fox jumps over the lazy dog while " +
      "the sun sets slowly behind the tall green hills tonight"
    val clones = (1 to n).map(i => (i.toLong, text)).toDF("doc_id", "text")
    val cap = 5

    val docPairs = Dedup.verifiedPairs(clones, "doc_id", "text",
      finalThreshold = 0.5, maxBucketSize = cap)
    val (membership, reps) = Dedup.textGroups(clones, "doc_id", "text")
    val distPairs = Dedup.verifiedPairsDistinct(membership,
      Dedup.fitShingleSets(reps, "rep", "text"),
      finalThreshold = 0.5, maxBucketSize = cap)

    val all = n.toLong * (n - 1) / 2
    assert(distPairs.count() == all,
      s"collapsed path must emit all $all intra-clone pairs")
    assert(distPairs.filter(col("jaccard") =!= 1.0).count() == 0)
    val docCount = docPairs.count()
    assert(docCount < all,
      s"doc-level path expected to under-emit under oversize salting " +
        s"(got $docCount of $all — if equal, the divergence contract " +
        s"in Dedup.verifiedPairsDistinct's scaladoc no longer holds)")
  }
}
