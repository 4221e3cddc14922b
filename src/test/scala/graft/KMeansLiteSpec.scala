package graft

import graft.operators.KMeansLite

/** Driver-side seeded k-means: determinism, edge cases, and basic
  * clustering quality (it backs the IVF and PQ quantizers).
  */
class KMeansLiteSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def blob(cx: Float, cy: Float, n: Int, seed: Int): Array[Array[Float]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(n)(Array(cx + rnd.nextFloat() * 0.1f, cy + rnd.nextFloat() * 0.1f))
  }

  test("same sample + seed → identical centroids on repeat fits") {
    val pts = blob(0f, 0f, 50, 1) ++ blob(5f, 5f, 50, 2)
    val a = KMeansLite.fit(pts, k = 2, seed = 42L)
    val b = KMeansLite.fit(pts, k = 2, seed = 42L)
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
  }

  test("separates two well-split blobs") {
    val pts = blob(0f, 0f, 50, 1) ++ blob(5f, 5f, 50, 2)
    val cs = KMeansLite.fit(pts, k = 2, seed = 42L)
    val sums = cs.map(c => c(0) + c(1)).sorted
    assert(sums(0) < 1.0f, s"low centroid drifted: ${sums(0)}")
    assert(sums(1) > 9.0f, s"high centroid drifted: ${sums(1)}")
  }

  test("k larger than the sample clamps instead of crashing") {
    val pts = blob(0f, 0f, 3, 1)
    val cs = KMeansLite.fit(pts, k = 8, seed = 42L)
    assert(cs.length === 3)
  }

  test("duplicate-heavy samples (forced empty clusters) still fit") {
    val pts = Array.fill(100)(Array(1f, 1f)) ++ blob(5f, 5f, 5, 3)
    val cs = KMeansLite.fit(pts, k = 8, seed = 42L)
    assert(cs.length === 8)
    assert(cs.forall(c => c.forall(v => !v.isNaN)))
  }
}
