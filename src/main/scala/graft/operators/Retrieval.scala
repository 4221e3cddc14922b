package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hybrid-retrieval fusion — the RAG serving-side combiner: a lexical
  * ranking (BM25) and a vector ranking (embedding cosine) each see
  * different evidence, and Reciprocal Rank Fusion
  * (`score(d) = Σ_r 1/(kConst + rank_r(d))`, Cormack et al., SIGIR'09)
  * merges them on RANKS alone, so the two scorers' incomparable score
  * scales never mix.
  *
  * Everything here is window-free: global top-k rankings plan as
  * `TakeOrderedAndProject` (parallel partial top-k on every partition,
  * one k-row reduce — no single-task global sort at any corpus size)
  * and ranks derive from the bounded pack-sort-explode tail, the same
  * shape as `text_colloc`. Fusion then joins k-row frames —
  * driver-of-cost is the upstream scorers, never the fusion.
  */
object Retrieval {

  /** Global top-`k` of `df` by (`scoreCol` desc, `idCol` asc), with a
    * 1-based `rk` column and NO window: orderBy+limit plans as
    * TakeOrderedAndProject, and the ≤k winners pack into one array
    * whose sort replays the order (score negated; the unique id breaks
    * ties, which also settles -0.0 vs 0.0). Score must be finite
    * (no NaN — a NaN would sort above every real score).
    */
  def topKRanked(df: DataFrame, idCol: String, scoreCol: String,
                 k: Int): DataFrame =
    df.orderBy(col(scoreCol).desc, col(idCol).asc).limit(k)
      .agg(sort_array(collect_list(struct(
        (col(scoreCol) * -1d).as("ns"), col(idCol).as("id")))).as("a"))
      .select(posexplode(col("a")).as(Seq("i", "x")))
      .select(col("x.id").as(idCol),
        (col("i") + 1).cast("int").as("rk"))

  /** Fuse named rank lists — each `(name, frame)` with columns
    * (`idCol`, rk) — into the RRF top-`topK`:
    * (idCol, r_<name>..., rrf, rank). An id absent from a list
    * contributes nothing for that list (its r_<name> is null).
    */
  def rrfFuse(rankings: Seq[(String, DataFrame)], idCol: String,
              kConst: Int = 60, topK: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(kConst >= 1, s"kConst must be >= 1 (got $kConst)")
    val renamed = rankings.map { case (n, df) =>
      df.select(col(idCol), col("rk").as(s"r_$n"))
    }
    val joined = renamed.reduce(_.join(_, Seq(idCol), "full_outer"))
    val score = rankings.map { case (n, _) =>
      coalesce(lit(1.0) / (lit(kConst) + col(s"r_$n")), lit(0.0))
    }.reduce(_ + _)
    val rankCols = rankings.map { case (n, _) => col(s"r_$n") }
    val packed = joined.withColumn("rrf", score)
      .orderBy(col("rrf").desc, col(idCol).asc).limit(topK)
      .agg(sort_array(collect_list(struct(
        (col("rrf") * -1d).as("ns") +: col(idCol).as("id") +:
          rankCols :+ col("rrf").as("rrf"): _*))).as("a"))
      .select(posexplode(col("a")).as(Seq("i", "x")))
    packed.select(col("x.id").as(idCol) +:
      rankings.map { case (n, _) => col(s"x.r_$n").as(s"r_$n") } :+
      round(col("x.rrf"), 6).as("rrf") :+
      (col("i") + 1).cast("int").as("rank"): _*)
  }
}
