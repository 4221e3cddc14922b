package graft.multimodal

import scala.collection.mutable.ArrayBuffer

/** Real, dependency-free baseline JPEG codec (ITU-T T.81 sequential
  * DCT, Huffman entropy coding) — grayscale (1 component) and YCbCr
  * 4:4:4 (3 components, JFIF color transform). This is the last of the
  * multimodal family's real codecs (BMP/PNG/GIF/WAV being the others);
  * nothing here imports outside the JDK.
  *
  * Encode path: level shift → separable float FDCT per 8×8 block →
  * quality-scaled Annex-K quantization → zigzag → DC-difference +
  * AC run-length Huffman (Annex-K tables) → byte-stuffed bitstream
  * inside SOI/APP0/DQT/SOF0/DHT/SOS/EOI framing.
  *
  * Decode path is fully table-driven (DQT/DHT are read from the
  * stream, mincode/maxcode/valptr decoding per T.81 F.2.2.3), so it
  * reads real-world baseline JFIFs within the supported subset —
  * grayscale, YCbCr 4:4:4 and 4:2:0, restart intervals (DRI/RSTn);
  * progressive (SOF2), other sampling layouts, 16-bit quant, and
  * arithmetic coding throw an honest `require` and the caller
  * row-degrades to the byte stub (Multimodal dispatch).
  *
  * Losslessness note for the oracle gate: JPEG is lossy in general,
  * but a quality-100 (all-ones quant) GRAYSCALE image whose pixels are
  * constant within each 8×8 block survives exactly — such blocks carry
  * only a DC coefficient (AC terms integrate a constant against
  * zero-mean cosines), DC = 8·(v−128) is exact in float, quantizes by
  * 1, and the IDCT of a DC-only block is bit-exact the constant back.
  * multimodal_jpeg builds its fixture that way, so the full
  * marker/Huffman/bitstream/IDCT machinery is oracle-gated from the
  * pixel formula; general content is spec-gated by PSNR round-trips.
  */
object Jpeg {

  /** comps = 1: `data` is w·h luma bytes; comps = 3: interleaved RGB. */
  final case class Image(width: Int, height: Int, comps: Int,
                         data: Array[Byte])

  def isJpeg(bytes: Array[Byte]): Boolean =
    bytes.length > 3 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xff) == 0xd8 && (bytes(2) & 0xff) == 0xff

  // ---- tables (ITU-T T.81 Annex K — published spec constants) -------

  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  private val QLum: Array[Int] = Array( // K.1, natural order
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99)

  private val QChr: Array[Int] = Array( // K.2, natural order
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99)

  // Huffman table spec: (bits(1..16) counts, symbol values)
  private val DcLumBits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumVals = (0 to 11).toArray
  private val DcChrBits = Array(0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChrVals = (0 to 11).toArray

  private val AcLumBits = Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
    0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  private val AcChrBits = Array(0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChrVals: Array[Int] = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15,
    0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17,
    0x18, 0x19, 0x1a, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5,
    0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9,
    0xda, 0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  // every symbol the encoder can emit must exist in its table — guards
  // the hand-entered Annex-K value lists against transcription slips
  {
    val acNeeded = (for (r <- 0 to 15; s <- 1 to 10) yield (r << 4) | s)
      .toSet + 0x00 + 0xf0
    require(AcLumVals.toSet == acNeeded && AcChrVals.toSet == acNeeded,
      "AC Huffman value lists do not cover the RRRRSSSS symbol set")
    require(AcLumBits.drop(1).sum == AcLumVals.length &&
      AcChrBits.drop(1).sum == AcChrVals.length, "AC bits/vals mismatch")
    require(DcLumBits.drop(1).sum == DcLumVals.length &&
      DcChrBits.drop(1).sum == DcChrVals.length, "DC bits/vals mismatch")
  }

  /** IJG quality scaling: q in [1,100] → per-entry max(1, min(255,
    * (tbl·scale + 50)/100)); q=100 gives the all-ones (lossless-DC)
    * table.
    */
  private def scaledQ(base: Array[Int], quality: Int): Array[Int] = {
    require(quality >= 1 && quality <= 100, s"quality $quality")
    val scale = if (quality < 50) 5000 / quality else 200 - 2 * quality
    base.map(v => math.max(1, math.min(255, (v * scale + 50) / 100)))
  }

  // ---- DCT (separable float, T.81 A.3.3 normalization) --------------

  private val Cos: Array[Array[Double]] = Array.tabulate(8, 8)((u, x) =>
    math.cos((2 * x + 1) * u * math.Pi / 16))
  private val Alpha: Array[Double] =
    Array.tabulate(8)(u => if (u == 0) 1.0 / math.sqrt(2.0) else 1.0)

  private def fdct(f: Array[Double]): Array[Double] = {
    val out = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            s += f(y * 8 + x) * Cos(v)(x) * Cos(u)(y)
            x += 1
          }
          y += 1
        }
        out(u * 8 + v) = 0.25 * Alpha(u) * Alpha(v) * s
        v += 1
      }
      u += 1
    }
    out
  }

  private def idct(coef: Array[Double]): Array[Double] = {
    val out = new Array[Double](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          var v = 0
          while (v < 8) {
            s += Alpha(u) * Alpha(v) * coef(u * 8 + v) * Cos(v)(x) * Cos(u)(y)
            v += 1
          }
          u += 1
        }
        out(y * 8 + x) = 0.25 * s
        x += 1
      }
      y += 1
    }
    out
  }

  // ---- canonical Huffman ------------------------------------------

  /** symbol → (code, length), canonical assignment (T.81 C.2). */
  private def buildEncodeTable(bits: Array[Int],
                               vals: Array[Int]): Array[Array[Int]] = {
    val table = Array.fill(256)(null: Array[Int])
    var code = 0
    var k = 0
    var len = 1
    while (len <= 16) {
      var i = 0
      while (i < bits(len)) {
        table(vals(k)) = Array(code, len)
        code += 1; k += 1; i += 1
      }
      code <<= 1
      len += 1
    }
    table
  }

  /** Decode-side tables per T.81 F.2.2.3. */
  private final class HuffDecoder(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    private var code = 0
    private var k = 0
    for (len <- 1 to 16) {
      if (bits(len) > 0) {
        valPtr(len) = k
        minCode(len) = code
        code += bits(len); k += bits(len)
        maxCode(len) = code - 1
      }
      code <<= 1
    }

    def decode(br: BitReader): Int = {
      var code = br.bit()
      var len = 1
      while (len <= 16 && (maxCode(len) < 0 || code > maxCode(len))) {
        code = (code << 1) | br.bit()
        len += 1
      }
      Codec.check(len <= 16, "invalid Huffman code")
      vals(valPtr(len) + code - minCode(len))
    }
  }

  // ---- bit IO with 0xFF stuffing ----------------------------------

  private final class BitWriter(out: ArrayBuffer[Byte]) {
    private var acc = 0
    private var n = 0
    def write(value: Int, nbits: Int): Unit = {
      var i = nbits - 1
      while (i >= 0) {
        acc = (acc << 1) | ((value >>> i) & 1)
        n += 1
        if (n == 8) {
          out += acc.toByte
          if ((acc & 0xff) == 0xff) out += 0x00.toByte
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (n > 0) { // pad with 1s (spec convention)
      acc = (acc << (8 - n)) | ((1 << (8 - n)) - 1)
      out += acc.toByte
      if ((acc & 0xff) == 0xff) out += 0x00.toByte
      acc = 0; n = 0
    }
    /** Byte-align and emit a restart marker (unstuffed, by definition). */
    def restart(m: Int): Unit = {
      flush()
      out += 0xff.toByte
      out += (0xd0 + m).toByte
    }
  }

  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0
    private var n = 0
    def bit(): Int = {
      if (n == 0) {
        Codec.check(pos < bytes.length, "entropy stream truncated")
        val b = bytes(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          Codec.check(pos < bytes.length, "truncated after 0xFF")
          val m = bytes(pos) & 0xff
          Codec.check(m == 0x00, f"unexpected marker 0xFF$m%02x in scan")
          pos += 1
        }
        acc = b; n = 8
      }
      n -= 1
      (acc >>> n) & 1
    }
    def receive(nbits: Int): Int = {
      var v = 0
      var i = 0
      while (i < nbits) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** Discard partial bits and consume the expected RSTm marker. */
    def expectRestart(m: Int): Unit = {
      acc = 0; n = 0 // byte-align
      Codec.check(pos + 1 < bytes.length, "truncated at restart")
      Codec.check((bytes(pos) & 0xff) == 0xff &&
        (bytes(pos + 1) & 0xff) == 0xd0 + m,
        f"expected RST$m%d, got ${bytes(pos) & 0xff}%02x${bytes(pos + 1) & 0xff}%02x")
      pos += 2
    }
  }

  /** T.81 F.2.2.1 EXTEND: map the s received magnitude bits to the
    * signed value.
    */
  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  private def magnitude(v: Int): Int = {
    var s = 0
    var a = math.abs(v)
    while (a != 0) { a >>= 1; s += 1 }
    s
  }

  // ---- encoder ----------------------------------------------------

  /** Encode `img` as baseline JFIF at `quality` (1..100). Grayscale
    * images emit one component; RGB emits YCbCr — 4:4:4 by default, or
    * 4:2:0 (`subsample = true`: Y at 2×2, chroma averaged over each
    * 2×2 luma box — the dominant real-world layout; MCU = 4 Y blocks +
    * Cb + Cr).
    */
  def encode(img: Image, quality: Int = 90,
             subsample: Boolean = false,
             restartInterval: Int = 0): Array[Byte] = {
    require(restartInterval >= 0 && restartInterval <= 0xffff,
      s"restartInterval $restartInterval")
    require(img.comps == 1 || img.comps == 3, s"comps=${img.comps}")
    require(img.width > 0 && img.height > 0, "empty image")
    val sub = subsample && img.comps == 3
    // per-component (h, v) sampling factors
    val hv: Array[(Int, Int)] =
      if (sub) Array((2, 2), (1, 1), (1, 1))
      else Array.fill(img.comps)((1, 1))
    val hMax = hv.map(_._1).max
    val vMax = hv.map(_._2).max
    val qLum = scaledQ(QLum, quality)
    val qChr = scaledQ(QChr, quality)
    val out = new ArrayBuffer[Byte](1024)
    def u8(v: Int): Unit = out += v.toByte
    def u16(v: Int): Unit = { u8(v >>> 8); u8(v & 0xff) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }

    marker(0xd8) // SOI
    marker(0xe0); u16(16) // APP0 JFIF
    Seq('J', 'F', 'I', 'F', 0).foreach(c => u8(c.toInt))
    u8(1); u8(1); u8(0); u16(1); u16(1); u8(0); u8(0)

    def dqt(id: Int, tbl: Array[Int]): Unit = {
      marker(0xdb); u16(67); u8(id)
      var i = 0
      while (i < 64) { u8(tbl(Zigzag(i))); i += 1 } // stored zigzag
    }
    dqt(0, qLum)
    if (img.comps == 3) dqt(1, qChr)

    marker(0xc0); u16(8 + 3 * img.comps); u8(8) // SOF0
    u16(img.height); u16(img.width); u8(img.comps)
    for (c <- 0 until img.comps) {
      u8(c + 1); u8((hv(c)._1 << 4) | hv(c)._2); u8(if (c == 0) 0 else 1)
    }

    def dht(tc: Int, th: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); u16(2 + 1 + 16 + vals.length); u8((tc << 4) | th)
      for (l <- 1 to 16) u8(bits(l))
      vals.foreach(u8)
    }
    dht(0, 0, DcLumBits, DcLumVals); dht(1, 0, AcLumBits, AcLumVals)
    if (img.comps == 3) {
      dht(0, 1, DcChrBits, DcChrVals); dht(1, 1, AcChrBits, AcChrVals)
    }

    if (restartInterval > 0) { // DRI
      marker(0xdd); u16(4); u16(restartInterval)
    }

    marker(0xda); u16(6 + 2 * img.comps); u8(img.comps) // SOS
    for (c <- 0 until img.comps) {
      u8(c + 1); u8(if (c == 0) 0x00 else 0x11)
    }
    u8(0); u8(63); u8(0)

    // full-resolution component values (levels 0..255)
    val w = img.width; val h = img.height
    val full: Array[Array[Int]] =
      if (img.comps == 1) Array(img.data.map(_ & 0xff))
      else {
        val yP = new Array[Int](w * h)
        val cbP = new Array[Int](w * h)
        val crP = new Array[Int](w * h)
        var i = 0
        while (i < w * h) {
          val r = img.data(3 * i) & 0xff
          val g = img.data(3 * i + 1) & 0xff
          val b = img.data(3 * i + 2) & 0xff
          yP(i) = clamp8(math.round(0.299 * r + 0.587 * g + 0.114 * b).toInt)
          cbP(i) = clamp8(math.round(-0.168736 * r - 0.331264 * g + 0.5 * b).toInt + 128)
          crP(i) = clamp8(math.round(0.5 * r - 0.418688 * g - 0.081312 * b).toInt + 128)
          i += 1
        }
        Array(yP, cbP, crP)
      }

    // per-component planes PADDED to the MCU grid; subsampled comps
    // average their (hMax/h x vMax/v) source box (edge-clamped)
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
    val planeW = new Array[Int](img.comps)
    val planes: Array[Array[Int]] = Array.tabulate(img.comps) { c =>
      val (hc, vc) = hv(c)
      val pw = mcusX * 8 * hc
      val ph = mcusY * 8 * vc
      planeW(c) = pw
      val fx = hMax / hc
      val fy = vMax / vc
      val plane = new Array[Int](pw * ph)
      var py = 0
      while (py < ph) {
        var px = 0
        while (px < pw) {
          var sum = 0
          var dy = 0
          while (dy < fy) {
            var dx = 0
            while (dx < fx) {
              val sx = math.min(w - 1, px * fx + dx)
              val sy = math.min(h - 1, py * fy + dy)
              sum += full(c)(sy * w + sx)
              dx += 1
            }
            dy += 1
          }
          plane(py * pw + px) = (sum + fx * fy / 2) / (fx * fy)
          px += 1
        }
        py += 1
      }
      plane
    }

    val encDc = Array(buildEncodeTable(DcLumBits, DcLumVals),
      buildEncodeTable(DcChrBits, DcChrVals))
    val encAc = Array(buildEncodeTable(AcLumBits, AcLumVals),
      buildEncodeTable(AcChrBits, AcChrVals))
    val qt = Array(qLum, qChr)

    def encodeBlock(bw: BitWriter, c: Int, plane: Array[Int], pw: Int,
                    ox: Int, oy: Int, prevDc: Array[Int]): Unit = {
      val tbl = if (c == 0) 0 else 1
      val f = new Array[Double](64)
      var by = 0
      while (by < 8) {
        var bx = 0
        while (bx < 8) {
          f(by * 8 + bx) = plane((oy + by) * pw + ox + bx) - 128.0
          bx += 1
        }
        by += 1
      }
      val coef = fdct(f)
      val zz = new Array[Int](64)
      var i = 0
      while (i < 64) {
        val nat = Zigzag(i)
        zz(i) = math.round(coef(nat) / qt(tbl)(nat)).toInt
        i += 1
      }
      val diff = zz(0) - prevDc(c)
      prevDc(c) = zz(0)
      val sMag = magnitude(diff)
      val dcode = encDc(tbl)(sMag)
      bw.write(dcode(0), dcode(1))
      if (sMag > 0)
        bw.write(if (diff >= 0) diff else diff - 1 + (1 << sMag), sMag)
      var run = 0
      var kk = 1
      while (kk < 64) {
        val v = zz(kk)
        if (v == 0) run += 1
        else {
          while (run > 15) {
            val z = encAc(tbl)(0xf0); bw.write(z(0), z(1)); run -= 16
          }
          val sz = magnitude(v)
          val acode = encAc(tbl)((run << 4) | sz)
          bw.write(acode(0), acode(1))
          bw.write(if (v >= 0) v else v - 1 + (1 << sz), sz)
          run = 0
        }
        kk += 1
      }
      if (run > 0) { val e = encAc(tbl)(0x00); bw.write(e(0), e(1)) }
    }

    val bw = new BitWriter(out)
    val prevDc = new Array[Int](img.comps)
    var mcuSeq = 0
    var rstSeq = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        // restart BETWEEN interval groups: align, emit RSTm (mod 8),
        // reset every DC predictor — never after the final MCU
        if (restartInterval > 0 && mcuSeq > 0 &&
            mcuSeq % restartInterval == 0) {
          bw.restart(rstSeq % 8)
          rstSeq += 1
          java.util.Arrays.fill(prevDc, 0)
        }
        var c = 0
        while (c < img.comps) {
          val (hc, vc) = hv(c)
          var bv = 0
          while (bv < vc) {
            var bh = 0
            while (bh < hc) {
              encodeBlock(bw, c, planes(c), planeW(c),
                (mx * hc + bh) * 8, (my * vc + bv) * 8, prevDc)
              bh += 1
            }
            bv += 1
          }
          c += 1
        }
        mcuSeq += 1
        mx += 1
      }
      my += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toArray
  }

  private def clamp8(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  // ---- decoder ----------------------------------------------------

  def decode(bytes: Array[Byte]): Image = {
    Codec.check(isJpeg(bytes), "not a JPEG payload")
    var pos = 2
    def u8(): Int = { val v = bytes(pos) & 0xff; pos += 1; v }
    def u16(): Int = { val v = ((bytes(pos) & 0xff) << 8) | (bytes(pos + 1) & 0xff); pos += 2; v }

    val quant = new Array[Array[Int]](4)
    val dcDec = new Array[HuffDecoder](4)
    val acDec = new Array[HuffDecoder](4)
    var width = 0; var height = 0
    var nComps = 0
    var compQ: Array[Int] = null
    var compH: Array[Int] = null
    var compV: Array[Int] = null
    var compDcT: Array[Int] = null
    var compAcT: Array[Int] = null
    var restartInterval = 0

    var scanStart = -1
    while (scanStart < 0) {
      Codec.check(u8() == 0xff, "marker expected")
      var m = u8()
      while (m == 0xff) m = u8() // fill bytes
      m match {
        case 0xd9 => Codec.check(false, "EOI before SOS")
        case 0xdb => // DQT (possibly several tables)
          val segLen = u16() // read BEFORE touching pos (u16 moves it)
          Codec.check(segLen >= 2, "bad segment length")
          val end = pos + segLen - 2
          while (pos < end) {
            val pq = u8()
            Codec.check((pq >> 4) == 0, "16-bit quant tables unsupported")
            // 4-bit id, but only 0-3 are valid table slots (T.81 B.2.4.1)
            Codec.check((pq & 0xf) < 4, s"bad quant table id ${pq & 0xf}")
            val t = new Array[Int](64)
            var i = 0
            while (i < 64) { t(Zigzag(i)) = u8(); i += 1 }
            quant(pq & 0xf) = t
          }
        case 0xc4 => // DHT (possibly several tables)
          val segLen = u16()
          Codec.check(segLen >= 2, "bad segment length")
          val end = pos + segLen - 2
          while (pos < end) {
            val tcth = u8()
            Codec.check((tcth >> 4) <= 1 && (tcth & 0xf) < 4,
              s"bad Huffman table spec ${tcth}") // T.81 B.2.4.2: Tc 0/1, Th 0-3
            val bits = new Array[Int](17)
            var total = 0
            for (l <- 1 to 16) { bits(l) = u8(); total += bits(l) }
            val vals = new Array[Int](total)
            var i = 0
            while (i < total) { vals(i) = u8(); i += 1 }
            val dec = new HuffDecoder(bits, vals)
            if ((tcth >> 4) == 0) dcDec(tcth & 0xf) = dec
            else acDec(tcth & 0xf) = dec
          }
        case 0xc0 | 0xc1 => // SOF0/1 (baseline/extended sequential)
          u16()
          Codec.check(u8() == 8, "only 8-bit precision supported")
          height = u16(); width = u16()
          // cap BEFORE the plane allocation: a crafted ~100-byte header
          // can declare arbitrary dimensions, and an OutOfMemoryError
          // is not an exception the per-row degrade path may catch.
          // 2^22 px (2048x2048) bounds worst-case decode memory at
          // ~48 MB (3 int planes) — the supported in-pipeline subset
          Codec.check(width > 0 && height > 0 &&
            width.toLong * height <= (1L << 22),
            "unreasonable dimensions") // garbage behind a JPEG magic
          nComps = u8()
          Codec.check(nComps == 1 || nComps == 3,
            s"unsupported component count $nComps")
          compQ = new Array[Int](nComps)
          compH = new Array[Int](nComps)
          compV = new Array[Int](nComps)
          for (c <- 0 until nComps) {
            u8() // component id (assume 1..n order, as we emit)
            val hvByte = u8()
            compH(c) = hvByte >> 4; compV(c) = hvByte & 0xf
            compQ(c) = u8()
            Codec.check(compQ(c) < 4, s"bad quant table ref ${compQ(c)}")
          }
          if (nComps == 1) { compH(0) = 1; compV(0) = 1 } // single-comp
          val layout444 = compH.forall(_ == 1) && compV.forall(_ == 1)
          val layout420 = nComps == 3 && compH(0) == 2 && compV(0) == 2 &&
            compH(1) == 1 && compV(1) == 1 && compH(2) == 1 && compV(2) == 1
          Codec.check(layout444 || layout420,
            s"unsupported sampling layout H=${compH.toSeq} V=${compV.toSeq}")
        case 0xc2 => Codec.check(false, "progressive JPEG unsupported")
        case 0xdd => // DRI
          u16(); restartInterval = u16()
        case 0xda => // SOS
          u16()
          val ns = u8()
          Codec.check(ns == nComps, "partial scans unsupported")
          compDcT = new Array[Int](nComps)
          compAcT = new Array[Int](nComps)
          for (c <- 0 until nComps) {
            u8()
            val tdta = u8()
            compDcT(c) = tdta >> 4; compAcT(c) = tdta & 0xf
            Codec.check(compDcT(c) < 4 && compAcT(c) < 4,
              s"bad Huffman table ref $tdta")
          }
          pos += 3 // Ss, Se, AhAl
          scanStart = pos
        case _ => // APPn, COM, others: skip by length
          val segLen = u16()
          Codec.check(segLen >= 2, "bad segment length") // no backward walks
          pos += segLen - 2
      }
    }

    Codec.check(width > 0 && height > 0, "SOS before SOF")
    val hMax = compH.max
    val vMax = compV.max
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    val planeW = Array.tabulate(nComps)(c => mcusX * 8 * compH(c))
    val planes = Array.tabulate(nComps)(c =>
      new Array[Int](planeW(c) * mcusY * 8 * compV(c)))
    val br = new BitReader(bytes, scanStart)
    val prevDc = new Array[Int](nComps)
    val coef = new Array[Double](64)

    def decodeBlock(c: Int, ox: Int, oy: Int): Unit = {
      val qt = quant(compQ(c))
      Codec.check(qt != null, "missing quant table")
      val dc = dcDec(compDcT(c)); val ac = acDec(compAcT(c))
      Codec.check(dc != null && ac != null, "missing Huffman table")
      java.util.Arrays.fill(coef, 0.0)
      val sMag = dc.decode(br)
      prevDc(c) += extend(br.receive(sMag), sMag)
      coef(0) = prevDc(c).toDouble * qt(0)
      var k = 1
      while (k < 64) {
        val rs = ac.decode(br)
        if (rs == 0x00) k = 64 // EOB
        else if (rs == 0xf0) k += 16 // ZRL
        else {
          k += rs >> 4
          Codec.check(k < 64, "AC index overflow")
          val sz = rs & 0xf
          val nat = Zigzag(k)
          coef(nat) = extend(br.receive(sz), sz).toDouble * qt(nat)
          k += 1
        }
      }
      val px = idct(coef)
      val pw = planeW(c)
      var by = 0
      while (by < 8) {
        var bx = 0
        while (bx < 8) {
          planes(c)((oy + by) * pw + ox + bx) =
            clamp8(math.round(px(by * 8 + bx) + 128.0).toInt)
          bx += 1
        }
        by += 1
      }
    }

    var mcuSeq = 0
    var rstSeq = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcuSeq > 0 &&
            mcuSeq % restartInterval == 0) {
          br.expectRestart(rstSeq % 8)
          rstSeq += 1
          java.util.Arrays.fill(prevDc, 0)
        }
        var c = 0
        while (c < nComps) {
          var bv = 0
          while (bv < compV(c)) {
            var bh = 0
            while (bh < compH(c)) {
              decodeBlock(c, (mx * compH(c) + bh) * 8,
                (my * compV(c) + bv) * 8)
              bh += 1
            }
            bv += 1
          }
          c += 1
        }
        mcuSeq += 1
        mx += 1
      }
      my += 1
    }

    if (nComps == 1) {
      val pw = planeW(0)
      val out = new Array[Byte](width * height)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          out(y * width + x) = planes(0)(y * pw + x).toByte
          x += 1
        }
        y += 1
      }
      Image(width, height, 1, out)
    } else {
      // chroma upsampling by sample replication (nearest): a chroma
      // sample at (x*h/hMax, y*v/vMax) covers the luma pixel (x, y)
      val out = new Array[Byte](width * height * 3)
      val pw0 = planeW(0); val pw1 = planeW(1); val pw2 = planeW(2)
      val fx1 = hMax / compH(1); val fy1 = vMax / compV(1)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val yy = planes(0)(y * pw0 + x)
          val cb = planes(1)((y / fy1) * pw1 + x / fx1) - 128
          val cr = planes(2)((y / fy1) * pw2 + x / fx1) - 128
          val o = (y * width + x) * 3
          out(o) = clamp8(math.round(yy + 1.402 * cr).toInt).toByte
          out(o + 1) = clamp8(math.round(yy - 0.344136 * cb - 0.714136 * cr).toInt).toByte
          out(o + 2) = clamp8(math.round(yy + 1.772 * cb).toInt).toByte
          x += 1
        }
        y += 1
      }
      Image(width, height, 3, out)
    }
  }
}
