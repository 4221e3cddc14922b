package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All fixed-size overlapping chunks of a document in ONE forward scan.
  *
  * Semantics are exactly `substr(text, i*stride + 1, chunkSize)` for
  * i = 0 until nChunks (character-counted, like SQL substr), with
  * nChunks = 1 for docs at most one chunk long, else
  * `(len - chunkSize + stride - 1) / stride + 1` — the contract
  * `Corpus.chunkText` and its DuckDB oracle share.
  *
  * The round-13 fat-record sweep caught the per-chunk formulation
  * melting down: `substr(k, size)` on a UTF8String costs O(k) (variable-
  * length encoding — the scan restarts from byte 0 to find character
  * k), so chunking one 64 MB document into its ~447k chunks priced at
  * ~10^13 byte reads — a single task pinned for hours. Here the byte
  * walk happens ONCE: character indices that begin or end a chunk are
  * two arithmetic progressions (i·stride and i·stride + chunkSize), so
  * a single pass records their byte offsets and every chunk is then an
  * O(chunkLen) byte copy. Total cost O(textBytes + outputBytes) — the
  * 64 MB doc chunks in milliseconds, and ordinary documents pay the
  * same single scan they always did.
  */
case class ChunkSlices(child: Expression, chunkSize: Int, overlap: Int)
    extends UnaryExpression {
  require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
    s"need 0 <= overlap < chunkSize, got chunkSize=$chunkSize overlap=$overlap")

  private val stride = chunkSize - overlap

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_chunk_slices"

  def compute(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    // byte offsets of chunk-start characters (i*stride) and chunk-end
    // characters (i*stride + chunkSize), collected in one walk
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    var nextStart = 0L
    var nextEnd = chunkSize.toLong
    var ci = 0L // character index
    var bi = 0  // byte index
    while (bi < n) {
      if (ci == nextStart) { starts.add(bi); nextStart += stride }
      if (ci == nextEnd) { ends.add(bi); nextEnd += stride }
      // Spark's own first-byte width table, so character counting here
      // is bit-identical to length()/substr() even on malformed UTF-8
      val len = UTF8String.numBytesForFirstByte(bytes(bi))
      bi += math.min(len, n - bi)
      ci += 1
    }
    val totalChars = ci
    val nChunks =
      if (totalChars <= chunkSize) 1L
      else (totalChars - chunkSize + stride - 1) / stride + 1L
    val out = new Array[Any](nChunks.toInt)
    var i = 0
    while (i < nChunks) {
      val startByte =
        if (i < starts.size) starts.get(i).intValue() else n // empty doc
      val endByte =
        if (i.toLong * stride + chunkSize >= totalChars) n
        else ends.get(i).intValue()
      out(i) = UTF8String.fromBytes(
        java.util.Arrays.copyOfRange(bytes, startByte, endByte))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("chunker", this, classOf[ChunkSlices].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): ChunkSlices =
    copy(child = newChild)
}
