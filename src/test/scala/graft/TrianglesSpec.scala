package graft

import org.apache.spark.sql.functions._
import graft.operators.Triangles

/** Degree-oriented triangle counting: hand graphs, dirty-input
  * hygiene, and a randomized parity sweep against the canonical
  * sorted-triple enumeration.
  */
class TrianglesSpec extends SparkFunSuite {
  import spark.implicits._

  private def count(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Triangles.perVertex(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

  test("one triangle plus a dangling edge") {
    val got = count(Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("K4: every vertex sits on 3 of the 4 triangles") {
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    assert(count(k4) === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("self-loops, duplicates, and reversed duplicates don't distort") {
    val got = count(Seq((1L, 2L), (2L, 1L), (1L, 1L), (2L, 3L),
      (2L, 3L), (3L, 1L)))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("star graph has no triangles (hub survives orientation)") {
    val star = (2L to 30L).map(i => (1L, i))
    assert(count(star) === Map.empty)
  }

  test("randomized parity with canonical sorted-triple enumeration") {
    val rnd = new scala.util.Random(99)
    val edges = (1 to 600).map(_ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    val canon = edges.map { case (a, b) => (a.min(b), a.max(b)) }
      .filter { case (a, b) => a != b }.distinct.toSet
    val naive = scala.collection.mutable.Map[Long, Long]()
      .withDefaultValue(0L)
    val nodes = canon.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    for {
      a <- nodes; b <- nodes if a < b && canon((a, b))
      c <- nodes if b < c && canon((b, c)) && canon((a, c))
    } { naive(a) += 1; naive(b) += 1; naive(c) += 1 }
    assert(naive.nonEmpty)
    assert(count(edges) === naive.toMap)
  }
}
