package graft

import org.apache.spark.sql.functions._
import graft.operators.GraphSim

class GraphSimSpec extends SparkFunSuite {
  import spark.implicits._

  test("neighborJaccard on a hand-checked square + diagonal") {
    // square 1-2-3-4 plus edge 1-3: N(1)={2,3,4}, N(2)={1,3},
    // N(3)={1,2,4}, N(4)={1,3}
    val e = Seq((1, 2), (2, 3), (3, 4), (1, 4), (1, 3)).toDF("a", "b")
    val out = GraphSim.neighborJaccard(e, "a", "b", minJac = 0.0)
      .collect().map(r => ((r.getAs[Int]("a"), r.getAs[Int]("b")),
        (r.getAs[Long]("common"), r.getAs[Double]("jac")))).toMap
    // pair (2,4): N∩={1,3} N∪={1,3} → J=1; pair (1,3): N∩={2,4},
    // N∪={1,2,3,4} → J=1/2
    assert(out((2, 4)) === ((2L, 1.0)))
    assert(out((1, 3)) === ((2L, 0.5)))
    // adjacent pair with partial overlap: (1,2): N∩={3}, N∪={1,2,3,4}
    assert(out((1, 2)) === ((1L, 0.25)))
  }

  test("pairs with no shared neighbor never appear") {
    // path 1-2-3: candidate pairs only through wedges at 2
    val e = Seq((1, 2), (2, 3)).toDF("a", "b")
    val rows = GraphSim.neighborJaccard(e, "a", "b", minJac = 0.0).collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[Int]("a") === 1 && rows.head.getAs[Int]("b") === 3)
  }

  test("threshold filters by jac") {
    val e = Seq((1, 2), (2, 3), (3, 4), (1, 4), (1, 3)).toDF("a", "b")
    val rows = GraphSim.neighborJaccard(e, "a", "b", minJac = 0.9).collect()
    assert(rows.map(r => (r.getAs[Int]("a"), r.getAs[Int]("b"))).toSet ===
      Set((2, 4)))
  }

  test("graph_jaccard gate query is non-vacuous at gate SF") {
    // this query once risked passing on 0 == 0 rows; pin it non-empty
    assert(SparkEntry.queries("graph_jaccard")(spark, sfDir).count() > 0L)
  }
}
