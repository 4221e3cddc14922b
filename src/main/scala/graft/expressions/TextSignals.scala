package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All text-quality / language-ID signals in ONE byte scan.
  *
  * The regex formulation (`TextFns` round 1-2) runs ~10 regex passes per
  * document — the dominant cost of `corpus_clean` and the per-document
  * analysis queries. This expression computes every signal in a single
  * pass over the UTF-8 bytes and matches the regex semantics exactly
  * (the DuckDB oracles still CHECK that equivalence against real regex
  * engines at the gate):
  *
  *  - n_chars:  code points (`length(text)`)
  *  - n_nonws:  code points not in Java `\s` = [ \t\n\x0B\f\r]
  *              (`length(regexp_replace(text, '\s+', ''))`)
  *  - n_punct:  code points neither [A-Za-z0-9] nor `\s` — non-ASCII
  *              counts, matching `[^A-Za-z0-9\s]` per character
  *  - n_words:  whitespace tokens of the trimmed text; empty → 1
  *              (`size(split(trim(text), '\s+'))` split semantics)
  *  - en/es/de/fr: stopword hits. `(?i)\b(w1|...)\b` matches exactly the
  *              maximal `\w`-runs ([A-Za-z0-9_], ASCII — multi-byte
  *              chars break a run in RE2 and java.util.regex alike)
  *              whose lowercase equals a list word, so each run is
  *              packed into a long (all stopwords are ≤ 8 bytes) and
  *              looked up in a sorted array — no per-run allocation
  *  - zh:       code points in U+4E00..U+9FFF
  *
  * Output: struct of 9 ints. Downstream `TextFns` columns read single
  * fields; identical `TextSignals` subtrees collapse via codegen
  * subexpression elimination, so one scan feeds all of them.
  */
case class TextSignals(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TextSignals.schema
  override def prettyName: String = "graft_text_signals"

  def compute(s: UTF8String): InternalRow = {
    val bytes = s.getBytes
    val n = bytes.length
    var nChars = 0
    var nNonWs = 0
    var nPunct = 0
    var nWords = 0
    var zh = 0
    var en = 0; var es = 0; var de = 0; var fr = 0
    var inWsToken = false // inside a non-whitespace run
    var runPack = 0L      // current \w-run packed (0 when not in run)
    var runLen = 0
    var i = 0
    def endRun(): Unit = {
      if (runLen > 0 && runLen <= 8) {
        val p = runPack
        if (java.util.Arrays.binarySearch(TextSignals.EnWords, p) >= 0) en += 1
        else if (java.util.Arrays.binarySearch(TextSignals.EsWords, p) >= 0) es += 1
        else if (java.util.Arrays.binarySearch(TextSignals.DeWords, p) >= 0) de += 1
        if (java.util.Arrays.binarySearch(TextSignals.FrWords, p) >= 0) fr += 1
      }
      runPack = 0L
      runLen = 0
    }
    while (i < n) {
      val b = bytes(i) & 0xff
      if (b < 0x80) {
        nChars += 1
        val isWs = b == ' ' || b == '\t' || b == '\n' || b == 0x0b ||
          b == '\f' || b == '\r'
        if (isWs) {
          inWsToken = false
          endRun()
        } else {
          if (!inWsToken) { nWords += 1; inWsToken = true }
          nNonWs += 1
          val isAlnum = (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
            (b >= '0' && b <= '9')
          if (!isAlnum) nPunct += 1
          if (isAlnum || b == '_') {
            runLen += 1
            if (runLen <= 8) {
              val lower = if (b >= 'A' && b <= 'Z') b + 32 else b
              runPack = (runPack << 8) | lower
            }
          } else endRun()
        }
        i += 1
      } else {
        // multi-byte UTF-8: one code point, non-ws, non-alnum → punct;
        // breaks any \w-run; decode 3-byte sequences for the zh range
        nChars += 1
        nNonWs += 1
        nPunct += 1
        if (!inWsToken) { nWords += 1; inWsToken = true }
        endRun()
        val len =
          if (b < 0xe0) 2
          else if (b < 0xf0) 3
          else 4
        if (len == 3 && i + 2 < n) {
          val cp = ((b & 0x0f) << 12) | ((bytes(i + 1) & 0x3f) << 6) |
            (bytes(i + 2) & 0x3f)
          if (cp >= 0x4e00 && cp <= 0x9fff) zh += 1
        }
        i += math.min(len, n - i)
      }
    }
    endRun()
    if (nWords == 0) nWords = 1 // split('', '\s+') yields ['']
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nChars, nNonWs, nPunct, nWords, en, es, de, fr, zh))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sigs", this, classOf[TextSignals].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): TextSignals =
    copy(child = newChild)
}

object TextSignals {
  val schema: StructType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_nonws", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("n_words", IntegerType, nullable = false),
    StructField("en", IntegerType, nullable = false),
    StructField("es", IntegerType, nullable = false),
    StructField("de", IntegerType, nullable = false),
    StructField("fr", IntegerType, nullable = false),
    StructField("zh", IntegerType, nullable = false)))

  private def pack(w: String): Long =
    w.getBytes("US-ASCII").foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL))

  private def packed(ws: Seq[String]): Array[Long] = {
    val a = ws.map(pack).toArray
    java.util.Arrays.sort(a)
    a
  }

  // identical word lists to TextFns.StopwordPatterns
  val EnWords: Array[Long] = packed(Seq(
    "the", "and", "of", "to", "in", "is", "that", "it", "for", "was"))
  val EsWords: Array[Long] = packed(Seq(
    "el", "la", "de", "que", "y", "los", "del", "las", "por", "una"))
  val DeWords: Array[Long] = packed(Seq(
    "der", "die", "und", "das", "ist", "von", "mit", "den", "nicht", "ein"))
  val FrWords: Array[Long] = packed(Seq(
    "le", "la", "et", "les", "des", "en", "un", "du", "une", "est"))
}

/** One-pass `trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))` over
  * the UTF-8 bytes, emitted as BINARY (the normalized text's exact
  * bytes): ASCII alphanumerics lowercase in place, every other
  * code point (including whole multi-byte sequences) becomes a space,
  * space runs collapse, ends trim. This normalization fronts every
  * dedup sketch (fingerprint md5, shingling, winnowing), so at corpus
  * scale it must not cost a regex NFA walk per document.
  *
  * Divergence note: `lower()` in the regex formulation is Unicode-aware;
  * the rare code points that lowercase INTO ASCII (e.g. U+212A KELVIN
  * SIGN → 'k') normalize to a space here instead. The DuckDB oracles
  * (which use real `lower()` + regex) verify the equivalence holds on
  * the actual corpus at every gate run.
  */
case class NormalizeAlnum(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_normalize_alnum"

  def compute(s: UTF8String): Array[Byte] = {
    val bytes = s.getBytes
    val n = bytes.length
    val out = new Array[Byte](n)
    var o = 0
    var pendingSpace = false
    var i = 0
    while (i < n) {
      val b = bytes(i) & 0xff
      val isLower = b >= 'a' && b <= 'z'
      val isUpper = b >= 'A' && b <= 'Z'
      val isDigit = b >= '0' && b <= '9'
      if (isLower || isUpper || isDigit) {
        if (pendingSpace && o > 0) { out(o) = ' '; o += 1 }
        pendingSpace = false
        out(o) = if (isUpper) (b + 32).toByte else b.toByte
        o += 1
        i += 1
      } else {
        pendingSpace = true
        // skip the whole code point (multi-byte sequences → one space)
        i += (if (b < 0x80) 1 else if (b < 0xe0) 2 else if (b < 0xf0) 3 else 4)
      }
    }
    java.util.Arrays.copyOf(out, o)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("norm", this, classOf[NormalizeAlnum].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): NormalizeAlnum =
    copy(child = newChild)
}
