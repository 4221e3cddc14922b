package graft.operators

/** Driver-side seeded k-means (kmeans++ init + Lloyd's iterations) for
  * coarse-quantizer training over a BOUNDED in-memory sample.
  *
  * Why not an ML-pipeline KMeans: an IVF quantizer needs `nlist`
  * centroids from a bounded sample — metadata-scale work. A distributed
  * iterative fit costs one cluster job per iteration (driver-coordinated
  * barriers), which round 2's bench showed dominating `sim_ann_ivf`.
  * Training on the collected sample is one in-process loop; only the
  * ASSIGNMENT pass over the full corpus is distributed (a narrow
  * codegen'd map via `expressions.NearestCentroid`).
  *
  * Deterministic: seeded `java.util.Random` (spec-fixed LCG) drives both
  * the kmeans++ picks and empty-cluster reseeds, so the same sample +
  * seed always yields the same model on any JVM.
  */
object KMeansLite {

  def fit(points: Array[Array[Float]], k: Int, seed: Long,
          iters: Int = 10): Array[Array[Float]] = {
    require(points.nonEmpty, "empty training sample")
    val dim = points(0).length
    val k2 = math.min(k, points.length)
    val rnd = new java.util.Random(seed)
    def d2(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0
      var i = 0
      while (i < dim) { val t = a(i).toDouble - b(i); d += t * t; i += 1 }
      d
    }
    // kmeans++ seeding: next center drawn ∝ squared distance to nearest
    val centers = new Array[Array[Float]](k2)
    centers(0) = points(rnd.nextInt(points.length)).clone()
    val minD = Array.fill(points.length)(Double.MaxValue)
    var c = 1
    while (c < k2) {
      var i = 0
      var sum = 0.0
      while (i < points.length) {
        val d = d2(points(i), centers(c - 1))
        if (d < minD(i)) minD(i) = d
        sum += minD(i)
        i += 1
      }
      var r = rnd.nextDouble() * sum
      var j = 0
      while (j < points.length - 1 && r > minD(j)) { r -= minD(j); j += 1 }
      centers(c) = points(j).clone()
      c += 1
    }
    // Lloyd's iterations
    val assign = new Array[Int](points.length)
    var it = 0
    while (it < iters) {
      var i = 0
      while (i < points.length) {
        var best = 0
        var bd = Double.MaxValue
        var cc = 0
        while (cc < k2) {
          val d = d2(points(i), centers(cc))
          if (d < bd) { bd = d; best = cc }
          cc += 1
        }
        assign(i) = best
        i += 1
      }
      val sums = Array.ofDim[Double](k2, dim)
      val cnt = new Array[Int](k2)
      i = 0
      while (i < points.length) {
        val a = assign(i)
        cnt(a) += 1
        var j = 0
        while (j < dim) { sums(a)(j) += points(i)(j); j += 1 }
        i += 1
      }
      var cc = 0
      while (cc < k2) {
        if (cnt(cc) == 0) centers(cc) = points(rnd.nextInt(points.length)).clone()
        else {
          var j = 0
          while (j < dim) { centers(cc)(j) = (sums(cc)(j) / cnt(cc)).toFloat; j += 1 }
        }
        cc += 1
      }
      it += 1
    }
    centers
  }
}
