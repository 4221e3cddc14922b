package graft

import graft.operators.PageRank

/** PageRank power iteration against an in-memory reference
  * implementation, plus the mass-conservation invariants.
  */
class PageRankSpec extends SparkFunSuite {
  import spark.implicits._

  /** Reference: same fixed-iteration PageRank on the driver. */
  private def reference(edges: Seq[(String, String)], iters: Int,
                        d: Double): Map[String, Double] = {
    val dir = (edges ++ edges.map(e => (e._2, e._1))).distinct
    val verts = dir.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val out = dir.groupBy(_._1).map { case (k, v) => k -> v.size }
    val n = verts.size
    var r = verts.map(_ -> 1.0 / n).toMap
    for (_ <- 0 until iters) {
      val contrib = dir.groupBy(_._2).map { case (v, es) =>
        v -> es.map(e => r(e._1) / out(e._1)).sum
      }
      r = verts.map(v => v -> ((1 - d) / n + d * contrib.getOrElse(v, 0.0))).toMap
    }
    r.map { case (k, v) => k -> v * n }
  }

  private def run(edges: Seq[(String, String)], iters: Int = 5,
                  undirected: Boolean = true): Map[String, Double] =
    PageRank.ranks(edges.toDF("s", "t"), "s", "t", iters = iters,
        undirected = undirected)
      .as[(String, Double)].collect().toMap

  test("path graph matches the reference; interior vertex dominates") {
    val edges = Seq(("a", "b"), ("b", "c"))
    val got = run(edges)
    val want = reference(edges, 5, 0.85)
    assert(got.keySet === want.keySet)
    got.foreach { case (v, r) =>
      assert(math.abs(r - want(v)) < 2e-4, s"$v: $r vs ${want(v)}")
    }
    assert(got("b") > got("a") && got("a") === got("c"))
  }

  test("star graph: hub outranks leaves; scaled ranks sum to N") {
    val edges = (1 to 6).map(i => ("hub", s"leaf$i"))
    val got = run(edges)
    assert((1 to 6).forall(i => got("hub") > got(s"leaf$i")))
    // mass conserved up to the 4-decimal output rounding (7 × 5e-5)
    assert(math.abs(got.values.sum - 7.0) < 4e-4)
    val want = reference(edges, 5, 0.85)
    got.foreach { case (v, r) =>
      assert(math.abs(r - want(v)) < 2e-4, s"$v: $r vs ${want(v)}")
    }
  }

  test("directed mode: dangling sink absorbs, source keeps teleport only") {
    // a -> b: b never redistributes (dangling), a has no in-edges
    val got = run(Seq(("a", "b")), iters = 3, undirected = false)
    // a's fixpoint is teleport only: (1-0.85)/2, scaled by N=2 → 0.15
    assert(math.abs(got("a") - 0.15) < 1e-9)
    assert(got("b") > got("a"))
    assert(got.values.sum < 2.0) // mass leaks through the sink
  }

  test("duplicate and reversed input pairs collapse to one undirected edge") {
    val base = Seq(("a", "b"), ("b", "c"))
    val noisy = base ++ Seq(("b", "a"), ("a", "b"))
    assert(run(noisy) === run(base))
  }
}
