package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

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
  * EXACT regime: while the number of distinct items seen by every
  * partial sketch stays <= capacity, no eviction happens, all errs are
  * 0 and counts are exact — the oracle-gating rule (same posture as
  * the GK sketch behind text_stats_approx: the gate corpus is in the
  * exact regime, so independent SQL recomputes the semantics; at
  * larger scale only the error bound holds).
  *
  * Determinism: eviction and trimming pick victims by
  * (count asc, err asc, term asc) and `eval` orders by
  * (count desc, term asc) — no hash-iteration order leaks into the
  * result, so a retried task produces the identical sketch.
  */
case class SpaceSavingTopK(child: Expression, k: Int, capacity: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, (Long, Long)]] {

  require(k > 0 && capacity >= k, s"need capacity >= k > 0, got k=$k capacity=$capacity")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_space_saving_topk"

  override def createAggregationBuffer(): mutable.HashMap[String, (Long, Long)] =
    mutable.HashMap.empty

  private def victim(m: mutable.HashMap[String, (Long, Long)]): (String, (Long, Long)) =
    m.minBy { case (t, (c, e)) => (c, e, t) }

  private def add(m: mutable.HashMap[String, (Long, Long)], term: String,
                  inc: Long, err: Long): Unit =
    m.get(term) match {
      case Some((c, e)) => m.update(term, (c + inc, e + err))
      case None if m.size < capacity => m.update(term, (inc, err))
      case None =>
        val (vt, (vc, _)) = victim(m)
        m.remove(vt)
        // the newcomer may have been counted up to vc times while evicted
        m.update(term, (vc + inc, vc + err))
    }

  override def update(buf: mutable.HashMap[String, (Long, Long)],
                      input: InternalRow): mutable.HashMap[String, (Long, Long)] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[UTF8String].toString, 1L, 0L)
    buf
  }

  override def merge(buf: mutable.HashMap[String, (Long, Long)],
                     other: mutable.HashMap[String, (Long, Long)]): mutable.HashMap[String, (Long, Long)] = {
    // conservative summary merge: an item absent from a FULL side may
    // have been counted up to that side's minimum before eviction
    val minBuf = if (buf.size >= capacity) buf.values.map(_._1).min else 0L
    val minOth = if (other.size >= capacity) other.values.map(_._1).min else 0L
    val out = mutable.HashMap.empty[String, (Long, Long)]
    (buf.keySet ++ other.keySet).foreach { t =>
      val (cb, eb) = buf.getOrElse(t, (minBuf, minBuf))
      val (co, eo) = other.getOrElse(t, (minOth, minOth))
      out.update(t, (cb + co, eb + eo))
    }
    if (out.size <= capacity) out
    else {
      val kept = out.toSeq
        .sortBy { case (t, (c, e)) => (-c, e, t) }
        .take(capacity)
      mutable.HashMap(kept: _*)
    }
  }

  override def eval(buf: mutable.HashMap[String, (Long, Long)]): Any = {
    val top = buf.toSeq.sortBy { case (t, (c, _)) => (-c, t) }.take(k)
    new GenericArrayData(top.map { case (t, (c, e)) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(t), c, e))
    }.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[String, (Long, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, (c, e)) =>
      val b = t.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c); out.writeLong(e)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, (Long, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = mutable.HashMap.empty[String, (Long, Long)]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      m.update(new String(b, "UTF-8"), (in.readLong(), in.readLong()))
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SpaceSavingTopK =
    copy(child = newChildren.head)
}
