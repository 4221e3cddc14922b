package graft.multimodal

import java.util.zip.{CRC32, Deflater, Inflater}

/** Real, dependency-free PNG codec for the 8-bit truecolor (RGB,
  * color type 2) non-interlaced subset — decode handles ALL FIVE
  * scanline filter types (None/Sub/Up/Average/Paeth), the part of PNG
  * that is actual image-codec work; DEFLATE rides on `java.util.zip`
  * (in the JDK, no external dependency). `Multimodal` dispatches
  * kind == "png" payloads here; non-RGB8 flavors (palette, alpha,
  * 16-bit, interlaced) throw an honest `require` and the caller falls
  * back to the byte-level stub for that row.
  *
  * Layout handled (and exercised in MultimodalSpec):
  *  - 8-byte signature; length/type/data/CRC chunk framing with CRC32
  *    verified on every chunk (corrupt chunks must throw, not decode
  *    to garbage);
  *  - IHDR: bit depth 8, color type 2, compression 0, filter 0,
  *    interlace 0;
  *  - one or more IDAT chunks, concatenated then inflated to
  *    (1 + 3·width)·height filtered scanline bytes;
  *  - per-scanline unfiltering with bpp = 3: Sub (left), Up (above),
  *    Average (floor mean), Paeth (nearest-predictor).
  */
object Png {

  final case class Image(width: Int, height: Int,
                         /** RGB interleaved, row-major, top-down. */
                         rgb: Array[Byte])

  private val Sig: Array[Byte] = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a,
    0x1a, 0x0a).map(_.toByte)

  def isPng(bytes: Array[Byte]): Boolean =
    bytes.length > 8 && java.util.Arrays.equals(
      java.util.Arrays.copyOfRange(bytes, 0, 8), Sig)

  private def i32be(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def putI32be(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v >>> 24).toByte; b(off + 1) = (v >>> 16).toByte
    b(off + 2) = (v >>> 8).toByte; b(off + 3) = v.toByte
  }

  private def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val t = typ.getBytes("US-ASCII")
    val out = new Array[Byte](12 + data.length)
    putI32be(out, 0, data.length)
    System.arraycopy(t, 0, out, 4, 4)
    System.arraycopy(data, 0, out, 8, data.length)
    val crc = new CRC32()
    crc.update(out, 4, 4 + data.length)
    putI32be(out, 8 + data.length, crc.getValue.toInt)
    out
  }

  /** Encode top-down RGB as a filter-0 (None) truecolor PNG. */
  def encode(img: Image): Array[Byte] = {
    require(img.rgb.length == img.width * img.height * 3,
      s"rgb length ${img.rgb.length} != ${img.width}x${img.height}x3")
    val bpr = img.width * 3
    val raw = new Array[Byte]((bpr + 1) * img.height)
    var y = 0
    while (y < img.height) {
      raw(y * (bpr + 1)) = 0 // filter: None
      System.arraycopy(img.rgb, y * bpr, raw, y * (bpr + 1) + 1, bpr)
      y += 1
    }
    val d = new Deflater()
    d.setInput(raw); d.finish()
    var comp = new Array[Byte](raw.length + 256)
    var n = 0
    while (!d.finished()) {
      if (n == comp.length) comp = java.util.Arrays.copyOf(comp, comp.length * 2)
      n += d.deflate(comp, n, comp.length - n)
    }
    d.end()
    val ihdr = new Array[Byte](13)
    putI32be(ihdr, 0, img.width); putI32be(ihdr, 4, img.height)
    ihdr(8) = 8; ihdr(9) = 2 // bit depth 8, color type 2 (RGB)
    Sig ++ chunk("IHDR", ihdr) ++
      chunk("IDAT", java.util.Arrays.copyOf(comp, n)) ++
      chunk("IEND", Array.emptyByteArray)
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Decode an RGB8 non-interlaced PNG to top-down RGB. Throws on any
    * other flavor or corrupt framing — honest partial coverage, no
    * silent garbage.
    */
  def decode(bytes: Array[Byte]): Image = {
    Codec.check(isPng(bytes), "not a PNG (missing signature)")
    var off = 8
    var width = 0; var height = 0
    var seenIhdr = false
    val idat = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done) {
      Codec.check(off + 12 <= bytes.length, "truncated chunk framing")
      val len = i32be(bytes, off)
      Codec.check(len >= 0 && off + 12 + len <= bytes.length,
        s"chunk length $len exceeds payload")
      val typ = new String(bytes, off + 4, 4, "US-ASCII")
      val crc = new CRC32()
      crc.update(bytes, off + 4, 4 + len)
      Codec.check(crc.getValue.toInt == i32be(bytes, off + 8 + len),
        s"CRC mismatch in $typ chunk")
      typ match {
        case "IHDR" =>
          Codec.check(len == 13, s"IHDR length $len")
          width = i32be(bytes, off + 8); height = i32be(bytes, off + 12)
          val bitDepth = bytes(off + 16); val colorType = bytes(off + 17)
          val comp = bytes(off + 18); val filt = bytes(off + 19)
          val interlace = bytes(off + 20)
          Codec.check(bitDepth == 8 && colorType == 2,
            s"unsupported flavor (bitDepth=$bitDepth colorType=$colorType; " +
              "only 8-bit truecolor RGB)")
          Codec.check(comp == 0 && filt == 0 && interlace == 0,
            "unsupported compression/filter/interlace method")
          Codec.check(width > 0 && height > 0 &&
            width <= (1 << 20) && height <= (1 << 20) &&
            // the FILTERED buffer is (1 + 3w)·h — bound that, not just
            // the pixel array, or its allocation below overflows Int
            (1L + 3L * width) * height <= Int.MaxValue,
            s"implausible dimensions ${width}x$height")
          seenIhdr = true
        case "IDAT" => idat.write(bytes, off + 8, len)
        case "IEND" => done = true
        case _ => () // ancillary chunks skipped
      }
      off += 12 + len
    }
    Codec.check(seenIhdr && idat.size() > 0, "missing IHDR or IDAT")

    val bpr = width * 3
    val raw = new Array[Byte]((bpr + 1) * height)
    val inf = new Inflater()
    inf.setInput(idat.toByteArray)
    var got = 0
    try {
      while (got < raw.length && !inf.finished()) {
        val k = inf.inflate(raw, got, raw.length - got)
        Codec.check(k > 0 || inf.finished(), "truncated/undecodable IDAT stream")
        got += k
      }
    } catch {
      case e: java.util.zip.DataFormatException =>
        throw new IllegalArgumentException("corrupt DEFLATE stream", e)
    } finally inf.end()
    Codec.check(got == raw.length,
      s"inflated $got bytes, expected ${raw.length}")

    val rgb = new Array[Byte](bpr * height)
    var y = 0
    while (y < height) {
      val f = raw(y * (bpr + 1)) & 0xff
      val src = y * (bpr + 1) + 1
      val dst = y * bpr
      var x = 0
      while (x < bpr) {
        val cur = raw(src + x) & 0xff
        val a = if (x >= 3) rgb(dst + x - 3) & 0xff else 0 // left
        val b = if (y > 0) rgb(dst - bpr + x) & 0xff else 0 // above
        val c = if (x >= 3 && y > 0) rgb(dst - bpr + x - 3) & 0xff else 0
        val v = f match {
          case 0 => cur
          case 1 => cur + a
          case 2 => cur + b
          case 3 => cur + (a + b) / 2
          case 4 => cur + paeth(a, b, c)
          case other =>
            throw new IllegalArgumentException(s"unknown filter type $other")
        }
        rgb(dst + x) = (v & 0xff).toByte
        x += 1
      }
      y += 1
    }
    Image(width, height, rgb)
  }
}
