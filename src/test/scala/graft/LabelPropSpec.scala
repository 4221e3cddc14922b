package graft

import graft.operators.LabelProp

/** Deterministic synchronous LPA: hand-traced rounds, convergence on a
  * hub shape, and parity with a local reference implementation.
  */
class LabelPropSpec extends SparkFunSuite {
  import spark.implicits._

  /** Local reference: synchronous rounds, most-frequent neighbor
    * label, ties to the smallest label.
    */
  private def localLpa(edges: Seq[(Long, Long)], rounds: Int)
      : Map[Long, Long] = {
    val adj = (edges ++ edges.map(_.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var lab = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to rounds) {
      lab = adj.map { case (n, nbrs) =>
        val counts = nbrs.groupBy(lab).view.mapValues(_.size).toMap
        n -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    lab
  }

  test("triangle with a pendant converges to one community") {
    // 1-2, 1-3, 2-3, 3-4: hand trace lands all four nodes on label 1
    // by round 3 (r1: 1→2 2→1 3→1 4→3; r2: all→1 except 1→1; r3: 1s)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
      .toDF("a", "b")
    val out = LabelProp.communities(edges, "a", "b", rounds = 3)
      .as[(Long, Long)].collect().toList
    assert(out == List((1L, 4L)), s"got $out")
  }

  test("path graph 2-cycles deterministically (fixed rounds pin it)") {
    // 1-2-3: synchronous LPA oscillates; after exactly 3 rounds the
    // hand trace is node1→2, node2→1, node3→2
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val out = LabelProp.communities(edges, "a", "b", rounds = 3)
      .as[(Long, Long)].collect().sortBy(_._1).toList
    assert(out == List((1L, 1L), (2L, 2L)), s"got $out")
  }

  test("two cliques joined by one bridge stay two communities") {
    val k1 = Seq((1L, 2L), (1L, 3L), (2L, 3L))
    val k2 = Seq((10L, 11L), (10L, 12L), (11L, 12L))
    val edges = (k1 ++ k2 :+ (3L -> 10L)).toDF("a", "b")
    val out = LabelProp.communities(edges, "a", "b", rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(out.values.sum == 6L)
    assert(out.size == 2, s"bridge must not merge the cliques: $out")
  }

  test("fuzz: 8 random graphs match the local reference") {
    val rnd = new scala.util.Random(53)
    for (trial <- 1 to 8) {
      val n = 5 + rnd.nextInt(12)
      val edges = (for {
        a <- 1L to n.toLong; b <- (a + 1) to n.toLong
        if rnd.nextDouble() < 0.3
      } yield (a, b)).toList
      if (edges.nonEmpty) {
        val rounds = 1 + rnd.nextInt(4)
        val expect = localLpa(edges, rounds)
          .groupBy(_._2).view.mapValues(_.size.toLong).toMap
        val got = LabelProp.communities(edges.toDF("a", "b"), "a", "b",
          rounds).as[(Long, Long)].collect().toMap
        assert(got == expect, s"trial $trial rounds=$rounds: " +
          s"got $got expect $expect edges $edges")
      }
    }
  }
}
