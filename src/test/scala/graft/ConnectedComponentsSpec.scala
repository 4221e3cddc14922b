package graft

import org.apache.spark.sql.functions._
import graft.operators.ConnectedComponents

/** Connected components (dedup clustering stage): labels must be the
  * component minimum for every endpoint, across shapes that exercise
  * the alternating-star rounds — stars, chains (deep diameter), messy
  * duplicate/self-loop input, and disjoint singleton pairs.
  */
class ConnectedComponentsSpec extends SparkFunSuite {
  import spark.implicits._

  private def labelMap(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.labels(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

  test("two disjoint components label to their minima") {
    val m = labelMap(Seq((5L, 3L), (3L, 9L), (20L, 21L)))
    assert(m == Map(3L -> 3L, 5L -> 3L, 9L -> 3L, 20L -> 20L, 21L -> 20L))
  }

  test("deep chain collapses to one component (log-round contraction)") {
    // path 0-1-2-...-40: diameter 40 >> default rounds if propagation
    // were per-hop; star contraction must still converge
    val edges = (0L until 40L).map(i => (i, i + 1))
    val m = labelMap(edges)
    assert(m.size == 41 && m.values.forall(_ == 0L))
  }

  test("duplicate, reversed, and self-loop edges are tolerated") {
    val m = labelMap(Seq((2L, 7L), (7L, 2L), (2L, 7L), (4L, 4L), (7L, 11L)))
    // self-loop (4,4) introduces no 4-node (filtered); 2-7-11 one component
    assert(m == Map(2L -> 2L, 7L -> 2L, 11L -> 2L))
  }

  test("every endpoint appears exactly once in the labeling") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L), (3L, 10L))
    val df = ConnectedComponents.labels(edges.toDF("a", "b"), "a", "b")
    assert(df.groupBy("id").count().filter($"count" > 1).isEmpty)
    assert(df.count() == 6)
    assert(df.agg(countDistinct($"cluster")).as[Long].head() == 1L)
  }
}
