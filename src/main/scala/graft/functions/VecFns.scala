package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType` embedding columns, built entirely from
  * higher-order functions (`zip_with`/`aggregate`) — pure Catalyst
  * expressions, no UDF/serialization cost, distributable over any
  * partitioning. Arithmetic is done in double precision (inputs are
  * float arrays) so results are reproducible against a double-precision
  * oracle.
  */
object VecFns {

  private def d(v: Column): Column = v.cast("array<double>")

  /** Dot product of two numeric array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val den = norm(a) * norm(b)
    when(den > 0, dot(a, b) / den).otherwise(lit(0.0))
  }

  /** Signed random-hyperplane sketch (SimHash for embeddings): the sign
    * pattern of `k` pseudo-random projections packed into a bitstring.
    * Hyperplanes are generated deterministically from `seed` via a
    * splitmix-style integer mix evaluated per (plane, dim) — expressed as
    * literal weight arrays so the whole sketch stays a Catalyst expression.
    * Used by LSH-bucketed ANN (SURVEY.md §2 [EXT] similarity search).
    */
  def hyperplaneBuckets(v: Column, dim: Int, planes: Int, seed: Long): Column = {
    val ws = hyperplanes(dim, planes, seed)
    val bits = ws.map { w =>
      val proj = dot(v, array(w.map(x => lit(x)): _*))
      when(proj >= 0, lit(1)).otherwise(lit(0))
    }
    // pack sign bits into an int bucket id
    bits.zipWithIndex.foldLeft(lit(0)) { case (acc, (b, i)) =>
      acc + b * (1 << i)
    }
  }

  /** Deterministic pseudo-random unit-free hyperplane weights in [-1, 1). */
  def hyperplanes(dim: Int, planes: Int, seed: Long): Seq[Array[Double]] =
    (0 until planes).map { p =>
      Array.tabulate(dim) { i =>
        val x = mix64(seed + p.toLong * 1000003L + i.toLong)
        // map to [-1, 1)
        (x >>> 11).toDouble / (1L << 52).toDouble * 2.0 - 1.0
      }
    }

  /** SplitMix64 finalizer — public-domain integer mix. */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}
