package graft

import org.apache.spark.sql.functions._
import graft.operators.FuzzyJoin

/** Blocked edit-distance linkage: exact pair set vs an in-memory brute
  * force, exactly-once orientation, and sub-salting completeness on an
  * oversized block (the recall property the asymmetric replicate side
  * exists to guarantee).
  */
class FuzzyJoinSpec extends SparkFunSuite {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private val names = Seq(
    (1L, "red gear", "gear"), (2L, "rad gear", "gear"),
    (3L, "blue gear", "gear"), (4L, "red bolt", "bolt"),
    (5L, "red belt", "bolt"), // blocked apart from 4? no: same block "bolt"
    (6L, "red gear", "gear"), // exact duplicate of 1 → dist 0, excluded
    (7L, "enormous widget", "widget"))

  private def brute(maxDist: Int): Set[(Long, Long)] =
    (for {
      (ka, ta, ba) <- names; (kb, tb, bb) <- names
      if ka < kb && ba == bb
      d = lev(ta, tb) if d >= 1 && d <= maxDist
    } yield (ka, kb)).toSet

  test("pair set matches brute force within blocks, each pair once") {
    val df = names.toDF("k", "txt", "blk")
    val got = FuzzyJoin.selfPairs(df, col("k"), col("txt"), col("blk"),
      maxDist = 2)
    val pairs = got.select("a_key", "b_key").as[(Long, Long)].collect()
    assert(pairs.length === pairs.distinct.length, "pair emitted twice")
    assert(pairs.toSet === brute(2))
    // distances are the true distances (3-arg levenshtein not truncated)
    val dists = got.select("a_txt", "b_txt", "dist")
      .as[(String, String, Int)].collect()
    dists.foreach { case (a, b, d) => assert(d === lev(a, b)) }
  }

  test("oversized block sub-salts without losing pairs") {
    // one block of 60 names — way over maxBlockSize=8 — where every
    // adjacent numeric suffix pair is at distance <= 2
    val rows = (0 until 60).map(i => (i.toLong, "item" + i, "one"))
    val df = rows.toDF("k", "txt", "blk")
    val expected = (for {
      (ka, ta, _) <- rows; (kb, tb, _) <- rows
      if ka < kb
      d = lev(ta, tb) if d >= 1 && d <= 2
    } yield (ka, kb)).toSet
    val got = FuzzyJoin.selfPairs(df, col("k"), col("txt"), col("blk"),
      maxDist = 2, maxBlockSize = 8)
      .select("a_key", "b_key").as[(Long, Long)].collect()
    assert(got.length === got.distinct.length)
    assert(got.toSet === expected)
  }

  test("registered join_fuzzy gate query returns NON-EMPTY output") {
    // regression guard: the first-letter blocking refinement once made
    // every surviving same-block pair identical (distance 0), so the
    // query returned zero rows and the oracle passed vacuously on
    // 0 == 0. The planted-typo fixture must keep real pairs flowing.
    val out = SparkEntry.queries("join_fuzzy")(spark, sfDir)
    val rows = out.collect()
    assert(rows.nonEmpty, "join_fuzzy gate output is empty — hollow oracle")
    assert(rows.map(_.getAs[Long]("n_pairs")).sum > 0L)
  }

  test("blocks do not leak pairs across block keys") {
    val df = Seq((1L, "same", "x"), (2L, "samo", "y")).toDF("k", "txt", "blk")
    assert(FuzzyJoin.selfPairs(df, col("k"), col("txt"), col("blk"), 3)
      .count() === 0L)
  }
}
