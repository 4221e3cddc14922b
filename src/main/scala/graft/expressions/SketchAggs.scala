package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.StringInputTypes
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Space-Saving summary buffer: a hash map (term → [count, err]) plus
  * an ordered mirror keyed (count, err, term) so the eviction victim —
  * the DETERMINISTIC minimum under that total order — is O(log
  * capacity) instead of a full scan per evicting row (the cited
  * Metwally et al. stream-summary achieves O(1); the tree keeps the
  * deterministic tie-break cheap, which the linked-bucket structure
  * does not). `evicted` records whether this summary EVER dropped an
  * item (by eviction here or trimming in merge): only then may an
  * absent term have nonzero unseen mass, which is what keeps the
  * boundary case "exactly capacity distinct terms, no eviction" in the
  * exact regime through merges.
  */
final class SpaceSavingBuffer {
  val m = new java.util.HashMap[String, Array[Long]]()
  val order = mutable.TreeSet.empty[(Long, Long, String)]
  var evicted: Boolean = false

  def put(term: String, c: Long, e: Long): Unit = {
    val old = m.get(term)
    if (old != null) order.remove((old(0), old(1), term))
    m.put(term, Array(c, e))
    order.add((c, e, term))
  }
  def remove(term: String): Unit = {
    val old = m.remove(term)
    if (old != null) order.remove((old(0), old(1), term))
  }
  def minEntry: (Long, Long, String) = order.head
}

/** Space-Saving heavy hitters (Metwally et al., "Efficient computation
  * of frequent and top-k elements in data streams", ICDT'05) as a
  * partially-aggregatable native aggregate — corpus-wide top-k terms
  * in ONE pass with capacity-bounded memory.
  *
  * Why not `groupBy(term).count.orderBy.limit`: that shuffles the whole
  * vocabulary (at 100 TB, billions of distinct n-grams) to count items
  * of which only the top k matter. This aggregate keeps a fixed
  * `capacity`-entry summary per partition, merges summaries at the
  * exchange (each partial is one serialized sketch row, not a term
  * stream), and guarantees for every reported item:
  * `est - err <= true <= est`. Any item with true frequency >
  * N/capacity is guaranteed present (the classic Space-Saving bound).
  *
  * EXACT regime: while no summary ever EVICTS (distinct items per
  * partial <= capacity and merged unions <= capacity), all errs are 0
  * and counts are exact — the oracle-gating rule (same posture as the
  * GK sketch behind text_stats_approx). The `evicted` flag makes the
  * boundary precise: a summary holding exactly `capacity` distinct
  * terms that never dropped one still merges exactly.
  *
  * Determinism: eviction and trimming pick victims by
  * (count asc, err asc, term asc) and `eval` orders by
  * (count desc, term asc) — no hash-iteration order leaks into the
  * result, so a retried task produces the identical sketch.
  */
case class SpaceSavingTopK(child: Expression, k: Int, capacity: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[SpaceSavingBuffer]
    with StringInputTypes {

  require(k > 0 && capacity >= k, s"need capacity >= k > 0, got k=$k capacity=$capacity")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_space_saving_topk"

  override def createAggregationBuffer(): SpaceSavingBuffer =
    new SpaceSavingBuffer

  private def add(buf: SpaceSavingBuffer, term: String,
                  inc: Long, err: Long): Unit = {
    val cur = buf.m.get(term)
    if (cur != null) buf.put(term, cur(0) + inc, cur(1) + err)
    else if (buf.m.size < capacity) buf.put(term, inc, err)
    else {
      val (vc, _, vt) = buf.minEntry
      buf.remove(vt)
      buf.evicted = true
      // the newcomer may have been counted up to vc times while evicted
      buf.put(term, vc + inc, vc + err)
    }
  }

  override def update(buf: SpaceSavingBuffer,
                      input: InternalRow): SpaceSavingBuffer = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[UTF8String].toString, 1L, 0L)
    buf
  }

  override def merge(buf: SpaceSavingBuffer,
                     other: SpaceSavingBuffer): SpaceSavingBuffer = {
    // conservative summary merge: an item absent from a side that has
    // EVICTED may have been counted up to that side's minimum before
    // being dropped; a side that never evicted gives exact zero
    val minBuf = if (buf.evicted) buf.minEntry._1 else 0L
    val minOth = if (other.evicted) other.minEntry._1 else 0L
    val out = new SpaceSavingBuffer
    out.evicted = buf.evicted || other.evicted
    val it = buf.m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val o = other.m.get(e.getKey)
      if (o != null) out.put(e.getKey, e.getValue()(0) + o(0), e.getValue()(1) + o(1))
      else out.put(e.getKey, e.getValue()(0) + minOth, e.getValue()(1) + minOth)
    }
    val it2 = other.m.entrySet().iterator()
    while (it2.hasNext) {
      val e = it2.next()
      if (!buf.m.containsKey(e.getKey))
        out.put(e.getKey, e.getValue()(0) + minBuf, e.getValue()(1) + minBuf)
    }
    while (out.m.size > capacity) { // trim smallest; mass was <= kept min
      val (_, _, vt) = out.minEntry
      out.remove(vt)
      out.evicted = true
    }
    out
  }

  override def eval(buf: SpaceSavingBuffer): Any = {
    val top = buf.order.toSeq.sortBy { case (c, _, t) => (-c, t) }.take(k)
    new GenericArrayData(top.map { case (c, e, t) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(t), c, e))
    }.toArray[Any])
  }

  override def serialize(buf: SpaceSavingBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeBoolean(buf.evicted)
    out.writeInt(buf.m.size)
    val it = buf.m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val b = e.getKey.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b)
      out.writeLong(e.getValue()(0)); out.writeLong(e.getValue()(1))
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new SpaceSavingBuffer
    buf.evicted = in.readBoolean()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.put(new String(b, "UTF-8"), in.readLong(), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SpaceSavingTopK =
    copy(child = newChildren.head)
}
