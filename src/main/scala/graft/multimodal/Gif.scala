package graft.multimodal

/** Real, dependency-free GIF codec for the single-frame, non-interlaced,
  * global-color-table subset — a full GIF-variant LZW implementation on
  * both sides (variable code width 3..12 bits, CLEAR/END codes,
  * dictionary growth and the `code == next` self-reference case),
  * LSB-first bit packing, and 255-byte sub-block framing. GIF is
  * palette-based, so `encode` builds the palette from the distinct
  * pixel colors (≤ 256 enforced); `Multimodal` dispatches
  * kind == "gif" payloads to `decode`, with the byte-level stub as the
  * per-row fallback for flavors outside the subset (interlaced, local
  * color tables, animations past frame one).
  *
  * Width-bump parity (the classic GIF-LZW off-by-one): when emitting
  * the k-th code after a CLEAR the encoder has defined k-1 dictionary
  * entries but the decoder only k-2 (it defines after reading), so the
  * largest possible k-th code is `end + k - 1` on BOTH sides. Hence
  * after adding an entry the ENCODER grows the width when
  * `next > (1 << width)` and the DECODER when `next >= (1 << width)`.
  * The encoder also emits a fresh CLEAR well before the 4096-entry cap
  * (at 4090) so the deferred-clear edge never arises in our own
  * streams, while the decoder's guarded add (`next < 4096`) still
  * accepts external deferred-clear files.
  */
object Gif {

  final case class Image(width: Int, height: Int,
                         /** RGB interleaved, row-major, top-down. */
                         rgb: Array[Byte])

  def isGif(bytes: Array[Byte]): Boolean =
    bytes.length > 13 && bytes(0) == 'G' && bytes(1) == 'I' &&
      bytes(2) == 'F' && bytes(3) == '8' &&
      (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a'

  private def u16le(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** LSB-first bit writer. */
  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0L
    private var nbits = 0
    def put(code: Int, width: Int): Unit = {
      acc |= code.toLong << nbits
      nbits += width
      while (nbits >= 8) {
        out.write((acc & 0xff).toInt)
        acc >>>= 8
        nbits -= 8
      }
    }
    def finish(): Array[Byte] = {
      if (nbits > 0) out.write((acc & 0xff).toInt)
      out.toByteArray
    }
  }

  /** LSB-first bit reader. */
  private final class BitReader(data: Array[Byte]) {
    private var pos = 0
    private var acc = 0L
    private var nbits = 0
    def get(width: Int): Int = {
      while (nbits < width) {
        Codec.check(pos < data.length, "LZW stream truncated")
        acc |= (data(pos) & 0xffL) << nbits
        pos += 1
        nbits += 8
      }
      val v = (acc & ((1L << width) - 1)).toInt
      acc >>>= width
      nbits -= width
      v
    }
  }

  /** Encode top-down RGB as a GIF89a with a global color table built
    * from the image's distinct colors (must be ≤ 256) and real LZW
    * compression of the index stream.
    */
  def encode(img: Image): Array[Byte] = {
    require(img.rgb.length == img.width * img.height * 3,
      s"rgb length ${img.rgb.length} != ${img.width}x${img.height}x3")
    require(img.width <= 0xffff && img.height <= 0xffff,
      s"${img.width}x${img.height} exceeds GIF's u16 descriptor fields")
    val n = img.width * img.height
    require(n > 0, "empty image")
    // palette: distinct colors in first-appearance order. Values stay
    // BOXED (java.lang.Integer): with a primitive-typed map, an
    // absent-key null would silently unbox to 0 and corrupt the palette
    val colorIdx = new java.util.LinkedHashMap[Integer, Integer]()
    val indices = new Array[Int](n)
    var i = 0
    while (i < n) {
      val c = ((img.rgb(3 * i) & 0xff) << 16) |
        ((img.rgb(3 * i + 1) & 0xff) << 8) | (img.rgb(3 * i + 2) & 0xff)
      val seen = colorIdx.get(Integer.valueOf(c))
      if (seen == null) {
        require(colorIdx.size < 256, "more than 256 distinct colors")
        val idx = colorIdx.size
        indices(i) = idx
        colorIdx.put(Integer.valueOf(c), Integer.valueOf(idx))
      } else indices(i) = seen.intValue()
      i += 1
    }
    val nColors = colorIdx.size
    var tableBits = 1 // color table holds 2^tableBits entries
    while ((1 << tableBits) < nColors) tableBits += 1
    val minCode = math.max(2, tableBits)

    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    // logical screen descriptor with global color table flag
    out.write(img.width & 0xff); out.write(img.width >> 8)
    out.write(img.height & 0xff); out.write(img.height >> 8)
    out.write(0x80 | (tableBits - 1))
    out.write(0); out.write(0)
    val it = colorIdx.keySet().iterator()
    var written = 0
    while (it.hasNext) {
      val c = it.next().intValue()
      out.write((c >> 16) & 0xff); out.write((c >> 8) & 0xff); out.write(c & 0xff)
      written += 1
    }
    while (written < (1 << tableBits)) { // pad table to declared size
      out.write(0); out.write(0); out.write(0); written += 1
    }
    // image descriptor: full frame, no local table, no interlace
    out.write(0x2c)
    out.write(0); out.write(0); out.write(0); out.write(0)
    out.write(img.width & 0xff); out.write(img.width >> 8)
    out.write(img.height & 0xff); out.write(img.height >> 8)
    out.write(0)

    // GIF-LZW over the index stream
    val clear = 1 << minCode
    val end = clear + 1
    val bw = new BitWriter
    var width = minCode + 1
    var next = end + 1
    val dict = new java.util.HashMap[Long, Integer]()
    def key(prefixCode: Int, b: Int): Long = (prefixCode.toLong << 9) | b
    bw.put(clear, width)
    var cur = indices(0)
    i = 1
    while (i < n) {
      val b = indices(i)
      val hit = dict.get(key(cur, b))
      if (hit != null) cur = hit.intValue()
      else {
        bw.put(cur, width)
        dict.put(key(cur, b), Integer.valueOf(next))
        next += 1
        if (next > (1 << width) && width < 12) width += 1
        if (next >= 4090) { // reset before the 4096 cap edge
          bw.put(clear, width)
          dict.clear()
          width = minCode + 1
          next = end + 1
        }
        cur = b
      }
      i += 1
    }
    bw.put(cur, width)
    bw.put(end, width)

    out.write(minCode)
    val lzw = bw.finish()
    var off = 0
    while (off < lzw.length) { // 255-byte sub-blocks
      val len = math.min(255, lzw.length - off)
      out.write(len)
      out.write(lzw, off, len)
      off += len
    }
    out.write(0) // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Decode the first frame of a non-interlaced global-color-table GIF
    * to top-down RGB. Throws on flavors outside the subset or corrupt
    * streams — honest partial coverage, no silent garbage.
    */
  def decode(bytes: Array[Byte]): Image = {
    Codec.check(isGif(bytes), "not a GIF (missing GIF87a/89a magic)")
    val sw = u16le(bytes, 6); val sh = u16le(bytes, 8)
    val packed = bytes(10) & 0xff
    Codec.check((packed & 0x80) != 0, "no global color table (unsupported)")
    val tableSize = 1 << ((packed & 0x07) + 1)
    var off = 13
    Codec.check(off + tableSize * 3 <= bytes.length, "truncated color table")
    val palette = java.util.Arrays.copyOfRange(bytes, off, off + tableSize * 3)
    off += tableSize * 3

    // skip extension blocks up to the first image descriptor
    while (off < bytes.length && (bytes(off) & 0xff) == 0x21) {
      off += 2 // introducer + label
      var len = -1
      while (len != 0) {
        Codec.check(off < bytes.length, "truncated extension")
        len = bytes(off) & 0xff
        off += 1 + len
      }
    }
    Codec.check(off < bytes.length && (bytes(off) & 0xff) == 0x2c,
      "no image descriptor")
    Codec.check(off + 10 <= bytes.length, "truncated image descriptor")
    val w = u16le(bytes, off + 5); val h = u16le(bytes, off + 7)
    val ipacked = bytes(off + 9) & 0xff
    Codec.check((ipacked & 0x80) == 0, "local color table unsupported")
    Codec.check((ipacked & 0x40) == 0, "interlaced GIF unsupported")
    Codec.check(w > 0 && h > 0 && w <= sw && h <= sh &&
      w.toLong * h * 3 <= Int.MaxValue, s"implausible frame ${w}x$h")
    off += 10
    Codec.check(off < bytes.length, "missing LZW min code size")
    val minCode = bytes(off) & 0xff
    Codec.check(minCode >= 2 && minCode <= 8, s"bad LZW min code size $minCode")
    off += 1
    val data = new java.io.ByteArrayOutputStream()
    var blockLen = -1
    while (blockLen != 0) {
      Codec.check(off < bytes.length, "truncated image data")
      blockLen = bytes(off) & 0xff
      Codec.check(off + 1 + blockLen <= bytes.length, "truncated sub-block")
      data.write(bytes, off + 1, blockLen)
      off += 1 + blockLen
    }

    // GIF-LZW decode of the index stream
    val clear = 1 << minCode
    val end = clear + 1
    val br = new BitReader(data.toByteArray)
    val prefix = new Array[Int](4096)
    val suffix = new Array[Int](4096)
    val stack = new Array[Int](4097)
    val out = new Array[Int](w * h)
    var width = minCode + 1
    var next = end + 1
    var prev = -1
    var produced = 0

    def firstOf(codeIn: Int): Int = {
      var c = codeIn
      while (c >= clear) c = prefix(c)
      c
    }
    def pushPixel(p: Int): Unit = {
      Codec.check(produced < out.length, "LZW produced more pixels than frame")
      out(produced) = p
      produced += 1
    }
    def emit(codeIn: Int): Int = { // emit expansion, return first index
      var c = codeIn
      var sp = 0
      while (c >= clear) {
        stack(sp) = suffix(c); sp += 1
        c = prefix(c)
        Codec.check(sp <= 4096, "corrupt LZW prefix chain")
      }
      val first = c
      stack(sp) = c; sp += 1
      while (sp > 0) { sp -= 1; pushPixel(stack(sp)) }
      first
    }

    var done = false
    while (!done) {
      val code = br.get(width)
      if (code == clear) {
        width = minCode + 1; next = end + 1; prev = -1
      } else if (code == end) {
        done = true
      } else if (prev == -1) {
        Codec.check(code < clear, "first code after clear must be a literal")
        emit(code)
        prev = code
      } else {
        Codec.check(code <= next && code < 4096 && code != clear && code != end,
          s"code $code out of range (next=$next)")
        val first =
          if (code == next) { // prev string + its own first char
            val f = firstOf(prev)
            emit(prev)
            pushPixel(f)
            f
          } else emit(code)
        if (next < 4096) {
          prefix(next) = prev; suffix(next) = first
          next += 1
          if (next >= (1 << width) && width < 12) width += 1
        }
        prev = code
      }
      if (!done && produced == out.length) done = true // frame complete
    }
    Codec.check(produced == out.length,
      s"LZW produced $produced of ${out.length} pixels")

    val rgb = new Array[Byte](w * h * 3)
    var i = 0
    while (i < out.length) {
      val p = out(i)
      Codec.check(p * 3 + 2 < palette.length, s"palette index $p out of range")
      rgb(3 * i) = palette(3 * p)
      rgb(3 * i + 1) = palette(3 * p + 1)
      rgb(3 * i + 2) = palette(3 * p + 2)
      i += 1
    }
    Image(w, h, rgb)
  }
}
