package graft.multimodal

/** Real, dependency-free BMP (Windows bitmap) codec — 24-bit
  * uncompressed BI_RGB with BITMAPINFOHEADER, the classic interchange
  * subset. BMP is the one mainstream image format whose decode is pure
  * byte math (no entropy coding), so the multimodal pipeline gets a
  * REAL decoder in the zero-dependency container: `Multimodal`
  * dispatches kind == "bmp" payloads here instead of the stub.
  *
  * Layout handled (and exercised in MultimodalSpec):
  *  - 14-byte file header: 'BM', file size, pixel-array offset;
  *  - 40-byte BITMAPINFOHEADER: width, height (positive → bottom-up
  *    row order, negative → top-down), planes, bpp = 24,
  *    compression = 0;
  *  - pixel rows padded to 4-byte boundaries, samples stored B,G,R.
  */
object Bmp {

  final case class Image(width: Int, height: Int,
                         /** RGB interleaved, row-major, top-down. */
                         rgb: Array[Byte])

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def i32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  def isBmp(bytes: Array[Byte]): Boolean =
    bytes.length >= 54 && bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte

  /** Decode a 24-bit BI_RGB BMP to top-down RGB. Throws on other BMP
    * flavors (compressed, paletted) — honest partial coverage, no
    * silent garbage.
    */
  def decode(bytes: Array[Byte]): Image = {
    Codec.check(isBmp(bytes), "not a BMP (missing BM magic or truncated)")
    val pixelOff = i32(bytes, 10)
    val width = i32(bytes, 18)
    val rawHeight = i32(bytes, 22)
    val bpp = u16(bytes, 28)
    val compression = i32(bytes, 30)
    Codec.check(bpp == 24, s"unsupported bpp $bpp (only 24-bit BI_RGB)")
    Codec.check(compression == 0, s"unsupported compression $compression")
    val topDown = rawHeight < 0
    val height = math.abs(rawHeight)
    // header fields are untrusted input: reject anything whose pixel
    // array would not fit the payload BEFORE touching it (a corrupt
    // header must throw a clean require, not read out of bounds or
    // allocate a negative/absurd array)
    Codec.check(width > 0 && height > 0 &&
      width <= (1 << 20) && height <= (1 << 20),
      s"implausible dimensions ${width}x$rawHeight")
    val rowBytes = ((width * 3 + 3) / 4) * 4 // rows pad to 4-byte boundary
    Codec.check(pixelOff >= 54 &&
      pixelOff.toLong + rowBytes.toLong * height <= bytes.length,
      s"pixel array (offset $pixelOff, ${rowBytes}x$height) exceeds " +
        s"payload of ${bytes.length} bytes")
    Codec.check(width.toLong * height * 3 <= Int.MaxValue,
      s"decoded image too large: ${width}x$height")
    val rgb = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      val srcRow = if (topDown) y else height - 1 - y // bottom-up storage
      val src = pixelOff + srcRow * rowBytes
      var x = 0
      while (x < width) {
        val s = src + x * 3
        val d = (y * width + x) * 3
        rgb(d) = bytes(s + 2)     // R   (stored B,G,R)
        rgb(d + 1) = bytes(s + 1) // G
        rgb(d + 2) = bytes(s)     // B
        x += 1
      }
      y += 1
    }
    Image(width, height, rgb)
  }

  /** Encode top-down RGB as a bottom-up 24-bit BI_RGB BMP. */
  def encode(img: Image): Array[Byte] = {
    val rowBytes = ((img.width * 3 + 3) / 4) * 4
    val dataSize = rowBytes * img.height
    val out = new Array[Byte](54 + dataSize)
    def putU16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
    }
    def putI32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte
      out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte
      out(off + 3) = ((v >> 24) & 0xff).toByte
    }
    out(0) = 'B'.toByte; out(1) = 'M'.toByte
    putI32(2, out.length); putI32(10, 54)
    putI32(14, 40); putI32(18, img.width); putI32(22, img.height)
    putU16(26, 1); putU16(28, 24); putI32(30, 0); putI32(34, dataSize)
    var y = 0
    while (y < img.height) {
      val dst = 54 + (img.height - 1 - y) * rowBytes // bottom-up
      var x = 0
      while (x < img.width) {
        val s = (y * img.width + x) * 3
        val d = dst + x * 3
        out(d) = img.rgb(s + 2)     // B
        out(d + 1) = img.rgb(s + 1) // G
        out(d + 2) = img.rgb(s)     // R
        x += 1
      }
      y += 1
    }
    out
  }
}
