package graft

import graft.operators.Cluster

/** Distributed full-corpus Lloyd k-means: hand-checkable convergence,
  * determinism across partitionings, and empty-cluster carry-forward.
  */
class ClusterSpec extends SparkFunSuite {
  import spark.implicits._

  private def vecsDF(rows: Seq[(Long, Seq[Float])]) =
    rows.toDF("vec_id", "embedding")

  test("two well-split blobs converge to their means") {
    // ids 1,2 (the k lowest) seed one centroid in each blob
    val rows = Seq[(Long, Seq[Float])](
      (1L, Seq(0.0f, 0.0f)), (2L, Seq(10.0f, 10.0f)),
      (3L, Seq(0.2f, 0.0f)), (4L, Seq(0.0f, 0.2f)),
      (5L, Seq(10.2f, 10.0f)), (6L, Seq(10.0f, 10.2f)))
    val got = Cluster.kmeans(vecsDF(rows), "vec_id", "embedding",
        k = 2, iters = 3)
      .as[(Long, Long, Double, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    // cluster 0 = mean of {(0,0),(.2,0),(0,.2)}; cluster 1 likewise
    assert(got((0L, 0L)) == ((0.0667, 3L)), s"got $got")
    assert(got((0L, 1L)) == ((0.0667, 3L)))
    assert(got((1L, 0L)) == ((10.0667, 3L)))
    assert(got((1L, 1L)) == ((10.0667, 3L)))
  }

  test("result is partitioning-invariant (float32 centroid snap)") {
    val rnd = new java.util.Random(7)
    val rows = (1L to 200L).map { i =>
      val base = if (i % 3 == 0) 5.0f else 0.0f
      (i, Seq(base + rnd.nextFloat(), base + rnd.nextFloat(),
        base + rnd.nextFloat()))
    }
    val df = vecsDF(rows)
    val a = Cluster.kmeans(df.repartition(1), "vec_id", "embedding",
      k = 3, iters = 4).orderBy("cluster_id", "dim")
      .as[(Long, Long, Double, Long)].collect().toSeq
    val b = Cluster.kmeans(df.repartition(13), "vec_id", "embedding",
      k = 3, iters = 4).orderBy("cluster_id", "dim")
      .as[(Long, Long, Double, Long)].collect().toSeq
    assert(a === b)
  }

  test("a cluster that captures nothing carries its centroid forward") {
    // centroid 1 starts at (100,100), every point sits near the origin:
    // round 1 assigns all to cluster 0, cluster 1 keeps (100,100) and
    // owns nothing at the end (inner join drops its coord rows)
    val rows = Seq[(Long, Seq[Float])](
      (1L, Seq(0.0f, 0.0f)), (2L, Seq(100.0f, 100.0f)),
      (3L, Seq(0.1f, 0.1f)), (4L, Seq(0.2f, 0.0f)))
    // vec 2 is an outlier FAR from the rest but still nearest to
    // centroid 1 (itself), so both clusters stay non-empty here...
    val got = Cluster.kmeans(vecsDF(rows), "vec_id", "embedding",
        k = 2, iters = 2)
      .as[(Long, Long, Double, Long)].collect()
    assert(got.filter(_._1 == 1L).forall(_._4 == 1L))
    // ...and the true empty case: every vector identical to vec 1
    val deg = Seq[(Long, Seq[Float])](
      (1L, Seq(0.0f, 0.0f)), (2L, Seq(0.0f, 0.0f)), (3L, Seq(0.0f, 0.0f)))
    val d = Cluster.kmeans(vecsDF(deg), "vec_id", "embedding",
        k = 2, iters = 2)
      .as[(Long, Long, Double, Long)].collect()
    // ties go to the lowest cluster id: cluster 0 owns all 3, cluster 1
    // (seeded with the identical vec 2) ends empty and drops out
    assert(d.forall(_._1 == 0L) && d.forall(_._4 == 3L), d.mkString(","))
  }

  test("fewer non-null vectors than k fails loudly (null contract)") {
    // ADVICE r15: limit(k) would silently seed < k centers when the
    // null contract (null vector = no position) has eaten the corpus;
    // the require names the contract instead.
    val rows = Seq(1L -> Seq(0f, 0f), 2L -> Seq(1f, 1f))
    val withNull = vecsDF(rows).unionByName(
      Seq((3L, null.asInstanceOf[Seq[Float]])).toDF("vec_id", "embedding"))
    val e = intercept[IllegalArgumentException] {
      Cluster.kmeans(withNull, "vec_id", "embedding", k = 3, iters = 1)
    }
    assert(e.getMessage.contains("null contract"), e.getMessage)
    // exactly k non-null still seeds fine
    assert(Cluster.kmeans(withNull, "vec_id", "embedding", k = 2,
      iters = 1).count() > 0)
  }
}
