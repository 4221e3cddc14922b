package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.LongInputTypes
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType}

/** Bloom-filter runtime filter, the explicit form of Spark's own
  * injected `bloom_filter_agg`/`might_contain` pair (Spark's is an
  * optimizer-internal rewrite, `spark.sql.optimizer.runtime.bloomFilter.*`,
  * not a stable public function surface — so graft carries its own).
  *
  * Purpose at 100 TB: a selective dimension predicate should prune the
  * FACT side before the join shuffle, not after. The dim side folds to
  * one fixed-size bitset scalar (partials OR together at the exchange —
  * one row per partition, not a key stream); the fact side then drops
  * non-candidate rows inside its scan stage, so the join exchanges only
  * rows that can match. False positives cost nothing but wasted shuffle
  * (the exact join removes them); false negatives are impossible, so
  * the filtered plan returns EXACTLY the unfiltered result.
  *
  * Layout: `numBits` bits in long words; k probe positions by
  * Kirsch–Mitzenmacher double hashing (h1 + i·h2, two splitmix64 mixes
  * per key — public-domain math, self-contained like HashExprs). With
  * m/n = 16 bits/key and k = 8 the false-positive rate is ~5e-4.
  */
object BloomUtil {
  final val Seed1 = 0x243f6a8885a308d3L
  final val Seed2 = 0x13198a2e03707344L

  def wordCount(numBits: Int): Int = (numBits + 63) >>> 6

  /** Probe position i (Kirsch-Mitzenmacher double hashing). Callers
    * derive h1/h2 once per key and loop — no per-row allocation.
    */
  def position(h1: Long, h2: Long, i: Int, numBits: Int): Int =
    (((h1 + i * h2) & Long.MaxValue) % numBits).toInt

  def toBytes(words: Array[Long]): Array[Byte] = {
    val bytes = new Array[Byte](words.length * 8)
    var i = 0
    while (i < words.length) {
      var w = words(i)
      var j = 0
      while (j < 8) { bytes(i * 8 + j) = (w & 0xff).toByte; w >>>= 8; j += 1 }
      i += 1
    }
    bytes
  }

  def fromBytes(bytes: Array[Byte]): Array[Long] = {
    val words = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < words.length) {
      var w = 0L
      var j = 7
      while (j >= 0) { w = (w << 8) | (bytes(i * 8 + j) & 0xffL); j -= 1 }
      words(i) = w
      i += 1
    }
    words
  }
}

/** Builds the bitset over a bigint key column; evaluates to the
  * serialized bitset (binary). Partial states are the bitsets
  * themselves; merge is bitwise OR — associative, commutative,
  * retry-deterministic.
  */
case class BloomBuildAgg(child: Expression, numBits: Int, numHashes: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with LongInputTypes {

  // numBits MUST be a multiple of 64: the probe side reconstructs
  // numBits as words.length*64 from the serialized bitset — a non-
  // aligned build would probe a different modulus and produce silent
  // FALSE NEGATIVES (dropped matches), the one failure a bloom filter
  // must never have
  require(numBits >= 64 && numBits % 64 == 0 && numHashes >= 1,
    s"need numBits >= 64 and divisible by 64, numHashes >= 1; " +
      s"got $numBits/$numHashes")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_bloom_build"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](BloomUtil.wordCount(numBits))

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[Long]
      val h1 = HashUtil.mix64(key ^ BloomUtil.Seed1)
      val h2 = HashUtil.mix64(key ^ BloomUtil.Seed2) | 1L
      var i = 0
      while (i < numHashes) {
        val p = BloomUtil.position(h1, h2, i, numBits)
        buf(p >>> 6) |= 1L << (p & 63)
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = BloomUtil.toBytes(buf)
  override def serialize(buf: Array[Long]): Array[Byte] = BloomUtil.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] =
    BloomUtil.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomBuildAgg =
    copy(child = newChildren.head)
}

/** Membership probe against a driver-materialized bitset. Codegen emits
  * one virtual call on the referenced expression (same fusion posture
  * as HashExprs) so the probe rides inside the scan's WholeStageCodegen
  * span instead of breaking it.
  */
case class BloomMightContain(child: Expression, bloom: Array[Byte],
    numHashes: Int)
    extends UnaryExpression with LongInputTypes {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  @transient private lazy val words: Array[Long] = BloomUtil.fromBytes(bloom)
  @transient private lazy val numBits: Int = words.length * 64

  def compute(key: Long): Boolean = {
    val h1 = HashUtil.mix64(key ^ BloomUtil.Seed1)
    val h2 = HashUtil.mix64(key ^ BloomUtil.Seed2) | 1L
    var i = 0
    while (i < numHashes) {
      val p = BloomUtil.position(h1, h2, i, numBits)
      if ((words(p >>> 6) & (1L << (p & 63))) == 0L) return false
      i += 1
    }
    true
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", this, classOf[BloomMightContain].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}
