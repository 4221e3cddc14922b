package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source breadth-first search — min-hop distances from a seed
  * set over a directed edge list, bounded by a hop budget.
  *
  * Shape (the ScaleQ graph_bfs gate runs this against a recursive-CTE
  * oracle): each round is ONE key-shuffled join of the current
  * distance frame against the edge list plus a min-distance
  * re-aggregate, with the frame re-staged per round to cut lineage
  * (the ConnectedComponents alternating-star discipline). Rounds are
  * bounded by `maxHops`, per-round cost is linear in |E| (ScaleGate
  * asserts the measured ratio), and nothing runs driver-side. For an
  * unbounded-depth traversal use ConnectedComponents (reachability) —
  * an unbounded BFS frontier loop would need the same fingerprint
  * convergence machinery it already has.
  *
  * Disk lifecycle: each round writes one [[Stage]] directory (the
  * distance frame, ~|reached nodes| rows), and per Stage's contract
  * those persist until `Stage.purge`/JVM exit — a long-lived session
  * running many BFS invocations (or a large `maxHops`) accumulates
  * maxHops directories per call. Call `Stage.purge(spark)` between
  * jobs, per the Stage object's guidance.
  */
object Bfs {

  /** @param edges directed (src, dst) pairs; mirror beforehand for an
    *              undirected walk
    * @param seeds frame with a `node` column (deduplicated here);
    *              seeds not present in the graph still report dist 0
    * @param maxHops hop budget (rounds); >= 0
    * @return (node, dist) — min hops from any seed, nodes beyond
    *         `maxHops` absent
    */
  def distances(edges: DataFrame, seeds: DataFrame,
                maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0 (got $maxHops)")
    val e = edges.select(col("src"), col("dst"))
    var dist = seeds.select(col("node")).distinct()
      .withColumn("dist", lit(0L))
    for (k <- 1 to maxHops) {
      val frontier = dist.filter(col("dist") === (k - 1))
        .join(e, col("node") === col("src"))
        .select(col("dst").as("node"), lit(k.toLong).as("dist"))
      dist = Stage.materialize(
        dist.unionByName(frontier)
          .groupBy("node").agg(min("dist").as("dist")),
        s"bfs_round_$k")
    }
    dist
  }
}
