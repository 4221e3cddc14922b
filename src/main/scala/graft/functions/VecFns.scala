package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.Shim
import graft.expressions.{CosineSim, DotProduct, FirstAgreeIndex, HyperplaneBuckets, RandomProjection}

/** Vector math over `ArrayType` embedding columns, backed by native
  * Catalyst expressions (graft.expressions.VectorExprs): one primitive
  * JVM loop per row, fused into whole-stage codegen. Accumulation is in
  * double precision (inputs are float arrays) so results are reproducible
  * against a double-precision oracle.
  */
object VecFns {

  /** Dot product of two numeric array columns (double accumulation). */
  def dot(a: Column, b: Column): Column =
    Shim.column(DotProduct(Shim.expression(a), Shim.expression(b)))

  /** L2 norm. */
  def norm(a: Column): Column =
    org.apache.spark.sql.functions.sqrt(dot(a, a))

  /** Cosine similarity; 0 when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column =
    Shim.column(CosineSim(Shim.expression(a), Shim.expression(b)))

  /** Random-hyperplane LSH bucket ids, one per hash table, in a single
    * pass (SURVEY.md §2 [EXT] similarity search): array<int> of length
    * `tables`; entry t packs the sign bits of `planes` projections.
    */
  def hyperplaneBucketsAll(v: Column, dim: Int, planes: Int, tables: Int,
                           seed: Long): Column =
    Shim.column(HyperplaneBuckets(Shim.expression(v), dim, planes, tables, seed))

  /** 0-based first index where two int arrays agree; -1 if none
    * (LSH first-collision pair dedup).
    */
  def firstAgree(a: Column, b: Column): Column =
    Shim.column(FirstAgreeIndex(Shim.expression(a), Shim.expression(b)))

  /** Johnson-Lindenstrauss random projection to `outDim` doubles
    * (seeded, replayable — see expressions.RandomProjection).
    */
  def randomProjection(v: Column, dim: Int, outDim: Int, seed: Long): Column =
    Shim.column(RandomProjection(Shim.expression(v), dim, outDim, seed))
}
