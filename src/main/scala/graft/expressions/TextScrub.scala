package graft.expressions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass boilerplate-strip + PII-redaction scrub:
  *
  * {{{ redactPii(trim(collapse(stripEntities(stripTags(text))))) }}}
  *
  * semantically identical to the five-`regexp_replace` chain in
  * `TextFns.stripHtml`/`redactPii` (the DuckDB oracle replays that chain
  * and a parity spec asserts equality against the Spark regex
  * formulation on adversarial inputs), but the three structural passes —
  *
  *  - `<[^>]*>` → ' '   (a tag runs from '<' to the NEAREST '>';
  *                       an unterminated '<' stays literal)
  *  - `&[a-zA-Z]{2,6};|&#[0-9]{1,5};` → ' '  (longer runs don't match:
  *                       greedy + backtrack still needs the ';' right
  *                       after ≤6 letters / ≤5 digits)
  *  - `\s+` → ' ' and trim  (Java `\s` = [ \t\n\x0B\f\r], ASCII-only)
  *
  * — fuse into ONE scan over the UTF-8 bytes instead of three regex NFA
  * walks with a UTF8String↔String round trip each. Fusing is sound
  * because a tag replacement inserts only ' ', which can never complete
  * an entity match, and '<' can never appear inside one — so scanning
  * the original bytes left-to-right sees exactly the matches the staged
  * chain sees.
  *
  * The two redaction patterns (EMAIL, PHONE) genuinely need regex
  * backtracking, so they stay `java.util.regex` — compiled once,
  * executed over the (much shorter) collapsed text, and only when the
  * byte scan proved a match is possible: EMAIL needs an '@' in the
  * output, PHONE needs a digit/[-. ]/digit triple (its first group
  * boundary). On a clean corpus both regexes are skipped entirely.
  *
  * Multi-byte UTF-8 sequences copy through verbatim: every structural
  * byte ('<', '>', '&', ';', '#', letters, digits, Java whitespace) is
  * ASCII, and continuation bytes are ≥ 0x80, so byte-level scanning
  * cannot false-match inside a code point.
  */
case class ScrubText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_scrub_text"

  def compute(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    val n = bytes.length
    val out = new Array[Byte](n) // structural passes only ever shrink
    var o = 0
    var pendingSpace = false
    var hasAt = false
    var phoneCand = false

    @inline def isDigit(b: Int): Boolean = b >= '0' && b <= '9'
    @inline def isAlpha(b: Int): Boolean =
      (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')
    @inline def isWs(b: Int): Boolean =
      b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'
    @inline def emit(b: Byte): Unit = {
      if (pendingSpace && o > 0) { out(o) = ' '; o += 1 }
      pendingSpace = false
      out(o) = b
      o += 1
    }

    var i = 0
    while (i < n) {
      val b = bytes(i) & 0xff
      if (b == '<') {
        var j = i + 1
        while (j < n && bytes(j) != '>') j += 1
        if (j < n) { pendingSpace = true; i = j + 1 } // whole tag → one ws
        else { emit('<'.toByte); i += 1 }             // unterminated: literal
      } else if (b == '&') {
        var j = i + 1
        var matched = false
        if (j < n && bytes(j) == '#') {
          j += 1
          val d0 = j
          while (j < n && j - d0 < 5 && isDigit(bytes(j) & 0xff)) j += 1
          matched = j > d0 && j < n && bytes(j) == ';'
        } else {
          val l0 = j
          while (j < n && j - l0 < 6 && isAlpha(bytes(j) & 0xff)) j += 1
          matched = j - l0 >= 2 && j < n && bytes(j) == ';'
        }
        if (matched) { pendingSpace = true; i = j + 1 }
        else { emit('&'.toByte); i += 1 }
      } else if (b < 0x80) {
        if (isWs(b)) { pendingSpace = true; i += 1 }
        else {
          if (b == '@') hasAt = true
          emit(b.toByte)
          if (!phoneCand && o >= 3) {
            val m = out(o - 2)
            if (isDigit(out(o - 3) & 0xff) && isDigit(b) &&
              (m == '-' || m == '.' || m == ' ')) phoneCand = true
          }
          i += 1
        }
      } else {
        // copy the whole code point; non-ASCII is never Java \s
        val len = if (b < 0xe0) 2 else if (b < 0xf0) 3 else 4
        val end = math.min(i + len, n)
        while (i < end) { emit(bytes(i)); i += 1 }
      }
    }

    if (!hasAt && !phoneCand) return UTF8String.fromBytes(out, 0, o)
    var result = new String(out, 0, o, java.nio.charset.StandardCharsets.UTF_8)
    if (hasAt)
      result = ScrubText.Email.matcher(result).replaceAll("<EMAIL>")
    if (phoneCand)
      result = ScrubText.Phone.matcher(result).replaceAll("<PHONE>")
    UTF8String.fromString(result)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("scrub", this, classOf[ScrubText].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): ScrubText =
    copy(child = newChild)
}

object ScrubText {
  // identical patterns to TextFns.stripHtml/redactPii (the reference
  // regex formulation); Pattern is thread-safe, Matchers are per-call
  val Email: Pattern =
    Pattern.compile("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}")
  val Phone: Pattern = Pattern.compile(
    "\\+?[0-9]{1,3}[-. ][0-9]{2,4}[-. ][0-9]{2,4}[-. ][0-9]{2,6}")
}
