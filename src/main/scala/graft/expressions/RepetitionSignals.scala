package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Per-document token n-gram repetition signals in one pass — the
  * Gopher/C4-style repetition quality filters (Rae et al. 2021 §A1.1:
  * "fraction of tokens in duplicate n-grams" / "fraction in the most
  * common n-gram"). A training-data pipeline drops documents dominated
  * by repeated boilerplate; both signals are per-document map-side
  * state, so the whole filter is ONE scan with no shuffle at any scale.
  *
  * Input: the NORMALIZED text bytes ([[NormalizeAlnum]] output —
  * lowercase alnum tokens separated by single spaces), so the token
  * walk is a byte scan with no splitting/allocation per token.
  *
  * For n in {2, 3} over the token sequence (token = FNV-1a 64 of its
  * bytes, gram key = mix64 chain of member hashes — collisions only
  * matter WITHIN a document, P ≈ m²/2⁶⁵):
  *
  *  - n{2,3}:   total n-gram occurrences = max(tokens - n + 1, 0)
  *  - top{2,3}: occurrences of the most frequent n-gram
  *  - dup{2,3}: occurrences of n-grams that appear more than once
  *
  * Output: struct of 6 ints; fraction math stays in the query so the
  * DuckDB oracle can replay it from raw strings.
  */
case class RepetitionSignals(child: Expression) extends UnaryExpression {

  override def dataType: DataType = RepetitionSignals.schema
  override def prettyName: String = "graft_repetition_signals"

  def compute(bytes: Array[Byte]): InternalRow = {
    val n = bytes.length
    val c2 = new java.util.HashMap[Long, Int]()
    val c3 = new java.util.HashMap[Long, Int]()
    var h1 = 0L; var h2 = 0L // previous two token hashes (valid per k)
    var k = 0                // tokens seen
    var i = 0
    while (i < n) {
      // token = bytes[i, j); tokens are single-space separated, no
      // leading/trailing space (NormalizeAlnum guarantees it)
      var h = 0xcbf29ce484222325L
      var j = i
      while (j < n && bytes(j) != ' ') {
        h ^= (bytes(j) & 0xffL)
        h *= 0x100000001b3L
        j += 1
      }
      if (j > i) {
        k += 1
        if (k >= 2) {
          val g2 = HashUtil.mix64(HashUtil.mix64(h1) ^ h)
          c2.merge(g2, 1, Integer.sum)
          if (k >= 3) {
            val g3 = HashUtil.mix64(HashUtil.mix64(HashUtil.mix64(h2) ^ h1) ^ h)
            c3.merge(g3, 1, Integer.sum)
          }
        }
        h2 = h1; h1 = h
      }
      i = j + 1
    }
    def stats(m: java.util.HashMap[Long, Int]): (Int, Int, Int) = {
      var tot = 0; var top = 0; var dup = 0
      val it = m.values().iterator()
      while (it.hasNext) {
        val c = it.next()
        tot += c
        if (c > top) top = c
        if (c > 1) dup += c
      }
      (tot, top, dup)
    }
    val (n2, top2, dup2) = stats(c2)
    val (n3, top3, dup3) = stats(c3)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n2, top2, dup2, n3, top3, dup3))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("reps", this, classOf[RepetitionSignals].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): RepetitionSignals =
    copy(child = newChild)
}

object RepetitionSignals {
  val schema: StructType = StructType(Seq(
    StructField("n2", IntegerType, nullable = false),
    StructField("top2", IntegerType, nullable = false),
    StructField("dup2", IntegerType, nullable = false),
    StructField("n3", IntegerType, nullable = false),
    StructField("top3", IntegerType, nullable = false),
    StructField("dup3", IntegerType, nullable = false)))
}
