package graft

import org.apache.spark.sql.functions._
import graft.operators.ConnectedComponents

/** Connected components (dedup clustering stage): labels must be the
  * component minimum for every endpoint, across shapes that exercise
  * the alternating-star rounds — stars, chains (deep diameter), messy
  * duplicate/self-loop input, and disjoint singleton pairs.
  *
  * Every shape runs through BOTH execution paths: the driver-side
  * union-find fast path (edge count under the local limit — the
  * default at these sizes) and the distributed alternating-star loop
  * (forced with localEdgeLimit = 0). The two must agree exactly.
  */
class ConnectedComponentsSpec extends SparkFunSuite {
  import spark.implicits._

  private def labelMap(edges: Seq[(Long, Long)],
                       localEdgeLimit: Long): Map[Long, Long] =
    ConnectedComponents.labels(edges.toDF("a", "b"), "a", "b",
        localEdgeLimit = localEdgeLimit)
      .as[(Long, Long)].collect().toMap

  private def bothPaths(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val local = labelMap(edges, localEdgeLimit = 1000000L)
    val dist = labelMap(edges, localEdgeLimit = 0L)
    assert(local == dist,
      s"local union-find and distributed star loop disagree:\n$local\n$dist")
    local
  }

  test("two disjoint components label to their minima") {
    val m = bothPaths(Seq((5L, 3L), (3L, 9L), (20L, 21L)))
    assert(m == Map(3L -> 3L, 5L -> 3L, 9L -> 3L, 20L -> 20L, 21L -> 20L))
  }

  test("deep chain collapses to one component (log-round contraction)") {
    // path 0-1-2-...-40: diameter 40 >> default rounds if propagation
    // were per-hop; star contraction must still converge
    val edges = (0L until 40L).map(i => (i, i + 1))
    val m = bothPaths(edges)
    assert(m.size == 41 && m.values.forall(_ == 0L))
  }

  test("duplicate, reversed, and self-loop edges are tolerated") {
    val m = bothPaths(Seq((2L, 7L), (7L, 2L), (2L, 7L), (4L, 4L), (7L, 11L)))
    // self-loop (4,4) introduces no 4-node (filtered); 2-7-11 one component
    assert(m == Map(2L -> 2L, 7L -> 2L, 11L -> 2L))
  }

  test("every endpoint appears exactly once in the labeling (both paths)") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L), (3L, 10L))
    for (limit <- Seq(1000000L, 0L)) {
      val df = ConnectedComponents.labels(edges.toDF("a", "b"), "a", "b",
        localEdgeLimit = limit)
      assert(df.groupBy("id").count().filter($"count" > 1).isEmpty)
      assert(df.count() == 6)
      assert(df.agg(countDistinct($"cluster")).as[Long].head() == 1L)
    }
  }

  test("random graph: both paths agree on a non-trivial component mix") {
    // deterministic pseudo-random graph: 120 nodes, ~90 edges via a
    // fixed LCG so the shape is stable across runs
    var seed = 0x9e3779b97f4a7c15L
    def next(bound: Int): Long = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      math.floorMod(seed >>> 17, bound.toLong)
    }
    val edges = Seq.fill(90)((next(120), next(120)))
    val m = bothPaths(edges)
    // labels are component minima: every cluster id labels itself
    assert(m.filter { case (id, c) => id == c }.keySet == m.values.toSet)
  }

  test("exhausted maxIter degrades loudly to one MIN label per node") {
    // star contraction needs ~log rounds; maxIter = 1 on a deep chain
    // cannot converge. The contract: warn on stderr, still emit exactly
    // ONE row per node (min provisional label) — never conflicting
    // duplicate labels — and stay a coarsening-consistent labeling
    // (every label is a node id <= its member).
    val edges = (0L until 60L).map(i => (i, i + 1))
    val df = ConnectedComponents.labels(edges.toDF("a", "b"), "a", "b",
      maxIter = 1, localEdgeLimit = 0L)
    val rows = df.as[(Long, Long)].collect()
    assert(rows.map(_._1).distinct.length == rows.length,
      "non-converged output emitted conflicting labels for a node")
    assert(rows.map(_._1).toSet == (0L to 60L).toSet)
    assert(rows.forall { case (id, c) => c <= id })
    // same input, enough rounds: converges to the exact answer
    val ok = labelMap(edges, localEdgeLimit = 0L)
    assert(ok.size == 61 && ok.values.forall(_ == 0L))
  }

  test("non-long node ids fall back to the distributed path") {
    val edges = Seq(("x", "y"), ("y", "z"), ("p", "q"))
      .toDF("a", "b")
    val m = ConnectedComponents.labels(edges, "a", "b")
      .as[(String, String)].collect().toMap
    assert(m == Map("x" -> "x", "y" -> "x", "z" -> "x", "p" -> "p", "q" -> "p"))
  }
}
