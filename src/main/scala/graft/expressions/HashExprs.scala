package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the dedup/sketching hot path
  * (SURVEY.md §2 [EXT] dedup family).
  *
  * Rationale: the first implementation expressed MinHash/SimHash as nested
  * higher-order functions (`transform`/`aggregate`/`zip_with`). HOF lambdas
  * are evaluated interpreted, per element, with boxing — a k=64 MinHash over
  * S shingles costs 64·S boxed lambda calls per row and dominated the
  * benchmark (36 s for 500 docs). Each expression below does the same math
  * in one tight primitive JVM loop per row and participates in whole-stage
  * codegen by emitting a single virtual call on a referenced object — the
  * row never leaves the generated code path, so pipelines stay fused.
  *
  * All hashing is self-contained (splitmix64 / FNV-1a — public-domain
  * integer mixes); no dependence on Spark's hash expressions.
  */
object HashUtil {
  final val P31 = 2147483647L // Mersenne prime 2^31-1, universal hashing

  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** FNV-1a 64-bit over UTF-8 bytes. */
  def fnv1a(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Per-seed universal hash parameters (a odd, both < 2^31). */
  def hashParams(k: Int, seed: Long): (Array[Long], Array[Long]) = {
    val as = new Array[Long](k)
    val bs = new Array[Long](k)
    var i = 0
    while (i < k) {
      as(i) = (mix64(seed + 2L * i) & 0x7fffffffL) | 1L
      bs(i) = mix64(seed + 2L * i + 1) & 0x7fffffffL
      i += 1
    }
    (as, bs)
  }
}

/** Distinct `bits`-bit hashes of word n-gram shingles over a token
  * array. Input: array<string> (pre-normalized tokens); output:
  * array<bigint>. Documents shorter than n tokens produce one shingle
  * over all tokens (same convention as the HOF formulation it
  * replaces).
  *
  * Width (r14): default 31 — the MinHash universal-hash params are
  * < 2^31 so (a·x + b) stays in a long, and the dedup_jaccard oracle
  * replays the same 31-bit mask, so its collisions cancel across
  * engines. Callers whose ORACLE is exact strings (text_novelty) pass
  * bits = 63: the r14 fat sweep showed a ~1M-distinct-shingle document
  * books ~230 expected 31-bit collisions (n²/2^32), visibly bending
  * n_shingles/shared_frac away from the string-exact oracle, while at
  * 63 bits the expectation is ~5e-8 — collision-free for any
  * realistic document.
  */
case class ShingleHashes(child: Expression, n: Int, bits: Int = 31)
    extends UnaryExpression {

  require(bits >= 1 && bits <= 63, s"bits must be in [1, 63] (got $bits)")
  private val mask: Long = (1L << bits) - 1L

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  def compute(in: ArrayData): ArrayData = {
    val numToks = in.numElements()
    // rolling polynomial over per-token FNV hashes, window of n tokens
    val tokHash = new Array[Long](numToks)
    var i = 0
    while (i < numToks) {
      val s = in.getUTF8String(i)
      tokHash(i) = if (s == null) 0L else HashUtil.fnv1a(s.getBytes)
      i += 1
    }
    val out = new java.util.TreeSet[java.lang.Long]()
    if (numToks <= n) {
      var h = 0xcbf29ce484222325L
      i = 0
      while (i < numToks) { h = HashUtil.mix64(h ^ tokHash(i)); i += 1 }
      out.add(h & mask)
    } else {
      var start = 0
      while (start <= numToks - n) {
        var h = 0xcbf29ce484222325L
        var j = start
        while (j < start + n) { h = HashUtil.mix64(h ^ tokHash(j)); j += 1 }
        out.add(h & mask)
        start += 1
      }
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingler", this, classOf[ShingleHashes].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** MinHash signature: k minima of universal hashes over a 31-bit
  * shingle-hash set. Input array<bigint>, output array<bigint> length k.
  * One k·S primitive loop per row.
  */
case class MinHashSig(child: Expression, k: Int, seed: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  @transient private lazy val (as, bs) = HashUtil.hashParams(k, seed)

  def compute(in: ArrayData): ArrayData = {
    val hs = in.toLongArray()
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < hs.length) {
      val h = hs(i)
      var j = 0
      while (j < k) {
        val v = (as(j) * h + bs(j)) % HashUtil.P31 // < 2^62, no overflow
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhash", this, classOf[MinHashSig].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** LSH band keys from a MinHash signature: one 64-bit hash per band of
  * `rowsPerBand` consecutive signature entries. Output array<bigint>
  * length bands — the per-document shuffle payload of candidate
  * generation (a few longs, never the text).
  */
case class BandHashes(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_band_hashes"

  def compute(in: ArrayData): ArrayData = {
    val sig = in.toLongArray()
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 0xcbf29ce484222325L
      var j = b * rowsPerBand
      val end = math.min(j + rowsPerBand, sig.length)
      while (j < end) { h = HashUtil.mix64(h ^ sig(j)); j += 1 }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bander", this, classOf[BandHashes].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BandHashes =
    copy(child = newChild)
}

/** Fraction of positions where two equal-length long arrays agree —
  * the MinHash Jaccard estimate. Output double.
  */
case class SigAgreement(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_sig_agreement"

  def compute(l: ArrayData, r: ArrayData): Double = {
    val a = l.toLongArray()
    val b = r.toLongArray()
    val n = math.min(a.length, b.length)
    var eq = 0
    var i = 0
    while (i < n) { if (a(i) == b(i)) eq += 1; i += 1 }
    if (n == 0) 0.0 else eq.toDouble / n
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("agree", this, classOf[SigAgreement].getName)
    nullSafeCodeGen(ctx, ev, (l, r) => s"${ev.value} = $ref.compute($l, $r);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SigAgreement = copy(left = newLeft, right = newRight)
}

/** Winnowing document fingerprint (Schleimer/Wilkerson/Aiken's local
  * algorithm, the MOSS scheme): hashes of character k-grams over the
  * normalized text, then the minimum hash of every window of `w`
  * consecutive k-grams (rightmost-min tie-break). Output: sorted
  * distinct selected hashes — a compact, position-robust fingerprint
  * set; two documents sharing any sufficiently long run of text share
  * fingerprints, regardless of offset.
  * Input string, output array<bigint>.
  *
  * Gram hash modes:
  *  - `portable = false` (default): Rabin-Karp rolling polynomial mod
  *    P31 + splitmix finalizer — O(n) amortized, the 100 TB fast path.
  *  - `portable = true`: low 60 bits of md5(gram) — O(n·k) digesting,
  *    but byte-identical in any engine with md5 (DuckDB:
  *    `('0x' || substr(md5(g), 1, 15))::BIGINT`), so the winnow
  *    selection is independently recomputable for cross-engine
  *    verification. The SELECTION logic (windows, rightmost-min,
  *    distinct) is shared between modes.
  */
case class WinnowFingerprint(child: Expression, k: Int, w: Int,
    portable: Boolean = false)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow_fingerprint"

  private final val Base = 1000003L
  @transient private lazy val basePowK1: Long = {
    var p = 1L
    var i = 0
    while (i < k - 1) { p = (p * Base) % HashUtil.P31; i += 1 }
    p
  }
  @transient private lazy val md5 =
    java.security.MessageDigest.getInstance("MD5")

  /** Low 60 bits of md5 over bytes[off, off+len) — the value of the
    * digest's first 15 hex chars, `('0x'||substr(md5(g),1,15))::BIGINT`
    * in DuckDB.
    */
  private def md5Low60(bytes: Array[Byte], off: Int, len: Int): Long = {
    md5.reset()
    md5.update(bytes, off, len)
    val d = md5.digest()
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  private def rkGrams(bytes: Array[Byte], nGrams: Int): Array[Long] = {
    val grams = new Array[Long](nGrams)
    var h = 0L
    var i = 0
    while (i < k) { h = (h * Base + (bytes(i) & 0xff)) % HashUtil.P31; i += 1 }
    grams(0) = HashUtil.mix64(h) & 0x7fffffffL
    var g = 1
    while (g < nGrams) {
      // roll: remove leading byte, add trailing byte
      h = (h - (bytes(g - 1) & 0xff) * basePowK1 % HashUtil.P31 +
        HashUtil.P31 * 256L) % HashUtil.P31
      h = (h * Base + (bytes(g + k - 1) & 0xff)) % HashUtil.P31
      grams(g) = HashUtil.mix64(h) & 0x7fffffffL
      g += 1
    }
    grams
  }

  private def md5Grams(bytes: Array[Byte], nGrams: Int): Array[Long] = {
    val grams = new Array[Long](nGrams)
    var g = 0
    while (g < nGrams) { grams(g) = md5Low60(bytes, g, k); g += 1 }
    grams
  }

  def compute(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val out = new java.util.TreeSet[java.lang.Long]()
    if (n < k) {
      if (portable) out.add(md5Low60(bytes, 0, n))
      else {
        var h = 0L
        var i = 0
        while (i < n) { h = (h * Base + (bytes(i) & 0xff)) % HashUtil.P31; i += 1 }
        out.add(HashUtil.mix64(h) & 0x7fffffffL)
      }
    } else {
      val nGrams = n - k + 1
      val grams =
        if (portable) md5Grams(bytes, nGrams) else rkGrams(bytes, nGrams)
      // winnow: min of each window of w grams, rightmost on ties
      val win = math.min(w, nGrams)
      var start = 0
      while (start + win <= nGrams) {
        var minIdx = start
        var j = start + 1
        while (j < start + win) {
          if (grams(j) <= grams(minIdx)) minIdx = j
          j += 1
        }
        out.add(grams(minIdx))
        start += 1
      }
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var i2 = 0
    while (it.hasNext) { arr(i2) = it.next(); i2 += 1 }
    new GenericArrayData(arr)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnow", this, classOf[WinnowFingerprint].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprint =
    copy(child = newChild)
}

/** Exact Jaccard similarity |A∩B| / |A∪B| of two SORTED distinct long
  * arrays (ShingleHashes emits sorted-distinct) via a linear merge —
  * no hash sets, no boxing, no intermediate arrays. Output double.
  */
case class SortedJaccard(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_sorted_jaccard"

  def compute(l: ArrayData, r: ArrayData): Double = {
    val a = l.toLongArray()
    val b = r.toLongArray()
    var i = 0
    var j = 0
    var inter = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { inter += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    val union = a.length + b.length - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("jac", this, classOf[SortedJaccard].getName)
    nullSafeCodeGen(ctx, ev, (l, r) => s"${ev.value} = $ref.compute($l, $r);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SortedJaccard = copy(left = newLeft, right = newRight)
}

/** 64-bit SimHash over a token array: per-token FNV-1a hash votes on 64
  * sign counters, packed to a long. Single pass, no intermediate arrays.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  def compute(in: ArrayData): Long = {
    val counters = new Array[Int](64)
    val numToks = in.numElements()
    var i = 0
    while (i < numToks) {
      val s = in.getUTF8String(i)
      if (s != null) {
        val h = HashUtil.fnv1a(s.getBytes)
        var bit = 0
        while (bit < 64) {
          if (((h >>> bit) & 1L) == 1L) counters(bit) += 1
          else counters(bit) -= 1
          bit += 1
        }
      }
      i += 1
    }
    var out = 0L
    var bit = 0
    while (bit < 64) {
      if (counters(bit) > 0) out |= (1L << bit)
      bit += 1
    }
    out
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhash", this, classOf[SimHash64].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
