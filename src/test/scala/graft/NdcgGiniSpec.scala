package graft

/** Gate-level pins for the round-7 evaluation/audit queries. The full
  * cross-engine semantics are covered by the DuckDB oracles; these
  * assert the invariants that a hash comparison alone can satisfy
  * vacuously.
  */
class NdcgGiniSpec extends SparkFunSuite {

  test("rank_ndcg: one row per query, ndcg within [0,1]") {
    val rows = SparkEntry.queries("rank_ndcg")(spark, sfDir).collect()
    assert(rows.length === 25) // vec_id < 25 queries
    rows.foreach { r =>
      val ndcg = r.getAs[Double]("ndcg")
      assert(ndcg >= 0.0 && ndcg <= 1.0, s"ndcg out of range: $r")
      val dcg = r.getAs[Long]("dcg")
      assert(dcg >= 0L && dcg <= 4543560L, s"dcg out of micro-range: $r")
    }
    // non-vacuous: retrieval must find SOME relevant neighbors at the
    // tiny spec SF (mean ndcg ≈ 0.13 at sf0.001 — the label clusters
    // are weak there; the oracle pins the exact values)
    val mean = rows.map(_.getAs[Double]("ndcg")).sum / rows.length
    assert(mean > 0.0, s"no relevant results retrieved at all: $mean")
    assert(rows.exists(_.getAs[Long]("dcg") > 0L))
  }

  test("ts_mad: one row per user, outliers flagged, mad non-negative") {
    val rows = SparkEntry.queries("ts_mad")(spark, sfDir).collect()
    val users = queries.t(spark, sfDir, "events")
      .filter(org.apache.spark.sql.functions.col("value").isNotNull)
      .select("user_id").distinct().count()
    assert(rows.length.toLong === users)
    rows.foreach { r =>
      assert(r.getAs[Double]("mad") >= 0.0)
      assert(r.getAs[Long]("n_out") <= r.getAs[Long]("n"))
    }
    assert(rows.map(_.getAs[Long]("n_out")).sum > 0L,
      "no outliers flagged anywhere — check the rule")
  }

  test("scd1_latest: one row per user, latest event is the max (ts, id)") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("scd1_latest")(spark, sfDir)
    val ev = queries.t(spark, sfDir, "events")
    assert(out.count() === ev.select("user_id").distinct().count())
    // cross-check one user end-to-end against a plain sort
    val u = ev.select("user_id").head().getLong(0)
    val want = ev.filter(col("user_id") === u)
      .orderBy(col("ts").desc, col("event_id").desc)
      .select(col("event_id")).head().getLong(0)
    val got = out.filter(col("user_id") === u)
      .select(col("last_event_id")).head().getLong(0)
    assert(got === want)
  }

  test("corpus_gini: one row, gini within [0,1), k matches sources") {
    val r = SparkEntry.queries("corpus_gini")(spark, sfDir).head()
    val k = r.getAs[Long]("k")
    val srcs = queries.t(spark, sfDir, "documents")
      .select("source").distinct().count()
    assert(k === srcs)
    val gini = r.getAs[Double]("gini")
    assert(gini >= 0.0 && gini < 1.0)
    assert(r.getAs[Long]("total_tokens") > 0L)
  }
}
