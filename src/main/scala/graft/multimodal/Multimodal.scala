package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (BASELINE.json north-star): image/audio/
  * video payloads ride as opaque `binary` columns with typed metadata;
  * decode / feature-extraction runs batched per partition.
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * clearly-marked deterministic FAKE standing in for a real decoder —
  * everything around it (schema, batch shape, partition-parallel
  * execution, feature-vector typing) is the real Spark plumbing a
  * production decoder would plug into: swap `decodeStub`'s body for
  * JPEG/PNG/ffmpeg bindings and nothing else changes.
  *
  * Scale notes: payload bytes stay in the partition where they were read
  * (`mapPartitions` is narrow — no shuffle of blobs); only the fixed-size
  * feature vectors and scalar metadata flow onward. Control batch memory
  * with `spark.sql.files.maxPartitionBytes` at read time, not here.
  */
object Multimodal {

  /** Real file-format signatures (fixture building, tests): the exact
    * leading bytes a genuine file of each kind starts with.
    */
  val PngHeader: Array[Byte] = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a,
    0x1a, 0x0a).map(_.toByte)
  val JpegHeader: Array[Byte] = Array(0xff, 0xd8, 0xff, 0xe0, 0x00, 0x10,
    0x4a, 0x46, 0x49, 0x46, 0x00).map(_.toByte) // SOI + APP0 "JFIF"
  val RiffWaveHeader: Array[Byte] =
    "RIFF".getBytes("US-ASCII") ++ Array[Byte](0, 0, 0, 0) ++
      "WAVE".getBytes("US-ASCII")
  val GifHeader: Array[Byte] = "GIF89a".getBytes("US-ASCII")

  /** Magic-number content sniffing on the leading bytes — pure built-in
    * expressions (hex of a binary prefix), codegen'd.
    */
  def sniffKind(bin: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val h8 = upper(hex(substring(bin, 1, 4)))
    when(h8.startsWith("FFD8FF"), "jpeg")
      .when(h8 === "89504E47", "png")
      .when(h8 === "52494646", "riff") // wav/avi container
      .when(h8 === "47494638", "gif")
      .when(h8.startsWith("424D"), "bmp") // the REAL-decode path (Bmp)
      .otherwise("unknown")
  }

  /** Typed metadata projection over a binary column: byte length, header
    * hex, sniffed kind.
    */
  def withMeta(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("byte_len", length(col(binCol)))
      .withColumn("header_hex", lower(hex(substring(col(binCol), 1, 8))))
      .withColumn("kind", sniffKind(col(binCol)))

  final case class Feature(id: Long, kind: String, n_bytes: Long,
                           feature: Array[Float])

  /** STUB decoder — deterministic fake features (a 16-bin byte histogram,
    * L1-normalized). A real implementation decodes pixels/samples here;
    * signature and batch shape are what production code would use.
    */
  def decodeStub(id: Long, kind: String, bytes: Array[Byte]): Feature = {
    val hist = new Array[Float](16)
    var i = 0
    while (i < bytes.length) {
      hist((bytes(i) & 0xf0) >>> 4) += 1f
      i += 1
    }
    val total = math.max(1f, bytes.length.toFloat)
    var j = 0
    while (j < 16) { hist(j) /= total; j += 1 }
    Feature(id, kind, bytes.length.toLong, hist)
  }

  /** 16-bin LUMINANCE histogram (Rec.601 luma, L1-normalized) over
    * decoded top-down RGB — the shared real-decode feature for the BMP
    * and PNG paths; pixel-derived, unlike decodeStub's raw-byte
    * histogram. Same Feature shape, so the pipeline downstream of the
    * dispatch is identical for real and stubbed kinds.
    */
  private def lumaFeature(id: Long, kind: String, nBytes: Long,
                          w: Int, h: Int, rgb: Array[Byte]): Feature = {
    val hist = new Array[Float](16)
    val n = w * h
    var i = 0
    while (i < n) {
      val r = rgb(3 * i) & 0xff
      val g = rgb(3 * i + 1) & 0xff
      val b = rgb(3 * i + 2) & 0xff
      val lum = (r * 299 + g * 587 + b * 114) / 1000
      hist(lum >> 4) += 1f
      i += 1
    }
    val total = math.max(1, n).toFloat
    var j = 0
    while (j < 16) { hist(j) /= total; j += 1 }
    Feature(id, kind, nBytes, hist)
  }

  /** REAL decode for BMP payloads (see [[lumaFeature]]). */
  def decodeBmpFeature(id: Long, bytes: Array[Byte]): Feature = {
    val img = Bmp.decode(bytes)
    lumaFeature(id, "bmp", bytes.length.toLong, img.width, img.height, img.rgb)
  }

  /** REAL decode for RGB8 PNG payloads (see [[lumaFeature]]): full
    * chunk/CRC framing, DEFLATE via the JDK, all five scanline filters
    * unfiltered (multimodal.Png).
    */
  def decodePngFeature(id: Long, bytes: Array[Byte]): Feature = {
    val img = Png.decode(bytes)
    lumaFeature(id, "png", bytes.length.toLong, img.width, img.height, img.rgb)
  }

  /** REAL decode for single-frame non-interlaced GIF payloads (see
    * [[lumaFeature]]): full LZW with variable code widths, palette
    * mapping (multimodal.Gif).
    */
  def decodeGifFeature(id: Long, bytes: Array[Byte]): Feature = {
    val img = Gif.decode(bytes)
    lumaFeature(id, "gif", bytes.length.toLong, img.width, img.height, img.rgb)
  }

  /** REAL decode for RIFF/WAVE 16-bit PCM payloads: 16-bin AMPLITUDE
    * histogram over the decoded samples (bin = (s + 32768) >> 12,
    * L1-normalized) — sample-derived, the audio analog of
    * `decodeBmpFeature`'s luminance histogram. Kind is reported as
    * "wav" (the parse proved it; "riff" is only the sniff).
    */
  def decodeWavFeature(id: Long, bytes: Array[Byte]): Feature = {
    val pcm = Wav.decode(bytes)
    val hist = new Array[Float](16)
    var i = 0
    while (i < pcm.samples.length) {
      hist((pcm.samples(i) + 32768) >> 12) += 1f
      i += 1
    }
    val total = math.max(1, pcm.samples.length).toFloat
    var j = 0
    while (j < 16) { hist(j) /= total; j += 1 }
    Feature(id, "wav", bytes.length.toLong, hist)
  }

  /** REAL decode for baseline JFIF payloads (multimodal.Jpeg: marker
    * parse, table-driven Huffman, dequant + IDCT, 4:4:4 or grayscale).
    * Gray planes feed the luminance histogram directly; color goes
    * through [[lumaFeature]] like the other image kinds.
    */
  def decodeJpegFeature(id: Long, bytes: Array[Byte]): Feature = {
    val img = Jpeg.decode(bytes)
    if (img.comps == 3)
      lumaFeature(id, "jpeg", bytes.length.toLong, img.width, img.height,
        img.data)
    else {
      val hist = new Array[Float](16)
      val n = img.width * img.height
      var i = 0
      while (i < n) { hist((img.data(i) & 0xff) >> 4) += 1f; i += 1 }
      val total = math.max(1, n).toFloat
      var j = 0
      while (j < 16) { hist(j) /= total; j += 1 }
      Feature(id, "jpeg", bytes.length.toLong, hist)
    }
  }

  /** Partition-parallel feature extraction over (id, kind, payload) rows.
    * Batched per partition (the decoder amortizes any model/codec init
    * across the partition's rows — same shape as mapInPandas batches).
    * BMP, RGB8 PNG, single-frame GIF, RIFF/WAVE-PCM, and baseline-JFIF
    * JPEG payloads all take REAL decode paths (`Bmp`, `Png`, `Gif`,
    * `Wav`, `Jpeg`); the stub remains only as the per-row degradation
    * target for unsupported flavors and unknown kinds.
    */
  def extractFeatures(spark: SparkSession, df: DataFrame,
                      idCol: String = "id", binCol: String = "payload"): Dataset[Feature] = {
    import spark.implicits._
    // null contract (r15, NULL audit): a NULL payload is a MISSING
    // asset — it produces no feature row (the skip-missing-asset
    // behavior of any media pipeline), never an NPE inside the codec
    df.filter(col(binCol).isNotNull)
      .select(col(idCol).cast("long"), sniffKind(col(binCol)), col(binCol))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder init would happen here (once, not per row)
        it.map {
          case (id, "bmp", bytes) =>
            // a malformed/unsupported-flavor payload that merely sniffs
            // as BMP ('BM' is 2 bytes — arbitrary data can start with
            // it) must not kill the whole extraction job: fall back to
            // the byte-level stub for that ROW, keep kind honest
            try decodeBmpFeature(id, bytes)
            catch {
              case _: IllegalArgumentException |
                   _: IndexOutOfBoundsException =>
                decodeStub(id, "bmp", bytes)
            }
          case (id, "png", bytes) =>
            // same row-level degradation as bmp: the 8-byte signature
            // can prefix a payload that is not a decodable RGB8 PNG
            // (palette/alpha flavors, or arbitrary data behind the
            // magic); only a well-formed truecolor stream decodes
            try decodePngFeature(id, bytes)
            catch {
              case _: IllegalArgumentException |
                   _: IndexOutOfBoundsException =>
                decodeStub(id, "png", bytes)
            }
          case (id, "gif", bytes) =>
            // same row-level degradation: 'GIF89a' can prefix arbitrary
            // data, and interlaced/local-table/animated flavors are
            // outside the decode subset
            try decodeGifFeature(id, bytes)
            catch {
              case _: IllegalArgumentException |
                   _: IndexOutOfBoundsException =>
                decodeStub(id, "gif", bytes)
            }
          case (id, "jpeg", bytes) =>
            // same row-level degradation: FFD8FF prefixes progressive,
            // subsampled, and arithmetic-coded flavors outside the
            // baseline 4:4:4/grayscale decode subset
            try decodeJpegFeature(id, bytes)
            catch {
              case _: IllegalArgumentException |
                   _: IndexOutOfBoundsException =>
                decodeStub(id, "jpeg", bytes)
            }
          case (id, "riff", bytes) =>
            // same row-level degradation: 'RIFF' is 4 arbitrary bytes —
            // AVI, non-PCM WAV, or plain text starting with RIFF all
            // sniff here; only a parseable 16-bit PCM WAVE decodes
            try decodeWavFeature(id, bytes)
            catch {
              case _: IllegalArgumentException |
                   _: IndexOutOfBoundsException |
                   _: java.nio.BufferUnderflowException =>
                decodeStub(id, "riff", bytes)
            }
          case (id, kind, bytes) => decodeStub(id, kind, bytes)
        }
      }
  }

  /** STUB resize — a real implementation decodes pixels and rescales;
    * the fake is deterministic (strided byte sample of the payload to
    * exactly w·h bytes), so the plumbing is testable. Output payloads
    * are fixed-size regardless of input size — the property downstream
    * batch-inference relies on.
    */
  /** REAL pixel-space box resample over decoded RGB (the downscale
    * step of a thumbnail/feature pipeline): every source pixel lands
    * in output cell `(x·ow/w, y·oh/h)` (integer division — uneven box
    * boundaries when ow∤w), and each cell is the integer mean of its
    * box per channel. Deterministic integer arithmetic end to end, so
    * an oracle can replay it from the source pixel values.
    */
  def boxResize(w: Int, h: Int, rgb: Array[Byte],
                ow: Int, oh: Int): Array[Byte] = {
    require(w > 0 && h > 0 && ow > 0 && oh > 0 && ow <= w && oh <= h,
      s"box resample needs 0 < ow <= w, 0 < oh <= h (got ${w}x$h -> ${ow}x$oh)")
    require(rgb.length == w * h * 3, s"rgb length ${rgb.length} != ${w}x${h}x3")
    val sum = new Array[Long](ow * oh * 3)
    val cnt = new Array[Int](ow * oh)
    var y = 0
    while (y < h) {
      // Long products: decoded planes admit up to 2^20 px per side, so
      // y*oh / x*ow overflow Int and would corrupt the cell index
      val oy = (y.toLong * oh / h).toInt
      var x = 0
      while (x < w) {
        val o = oy * ow + (x.toLong * ow / w).toInt
        cnt(o) += 1
        var c = 0
        while (c < 3) {
          sum(o * 3 + c) += rgb((y * w + x) * 3 + c) & 0xff; c += 1
        }
        x += 1
      }
      y += 1
    }
    Array.tabulate(ow * oh * 3)(i => (sum(i) / cnt(i / 3)).toByte)
  }

  /** Difference-hash (dHash) perceptual fingerprint of decoded RGB:
    * box-resample to 9×8, integer grayscale `(r+g+b)/3` per pixel,
    * then one bit per horizontal neighbor pair (`gray[x+1] > gray[x]`,
    * 8 bits × 8 rows). Emitted as a 16-hex-char string (row bytes in
    * row order, bit x = comparison at column x) — no 64-bit sign games
    * and directly replayable by an engine building the same hex.
    *
    * dHash keys on luminance GRADIENTS, so uniform brightness shifts
    * (no wraparound/clipping) leave the hash unchanged — the property
    * that makes exact-hash bucketing a near-dup candidate generator
    * for re-encoded/brightness-adjusted images, the image analog of
    * MinHash banding (bucket join, never all-pairs).
    */
  def dhash(w: Int, h: Int, rgb: Array[Byte]): String = {
    val t = boxResize(w, h, rgb, 9, 8)
    val gray = Array.tabulate(9 * 8) { i =>
      ((t(3 * i) & 0xff) + (t(3 * i + 1) & 0xff) + (t(3 * i + 2) & 0xff)) / 3
    }
    val sb = new StringBuilder(16)
    var y = 0
    while (y < 8) {
      var b = 0
      var x = 0
      while (x < 8) {
        if (gray(y * 9 + x + 1) > gray(y * 9 + x)) b |= 1 << x
        x += 1
      }
      sb.append(f"$b%02x")
      y += 1
    }
    sb.toString
  }

  def resizeStub(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](w * h)
    if (bytes.nonEmpty) {
      var i = 0
      while (i < out.length) {
        out(i) = bytes((i.toLong * bytes.length / out.length).toInt)
        i += 1
      }
    }
    out
  }

  final case class Frames(id: Long, kind: String, n_frames: Int,
                          frames: Array[Array[Byte]])

  /** STUB frame sampling — a real implementation seeks keyframes via a
    * video codec; the fake slices the payload into `everyN`-byte strides
    * capped at `maxFrames`. Plumbing shape is the production one: blobs
    * stay in their partition, each emitted frame is itself an opaque
    * binary ready for resize → feature-extract.
    */
  def sampleFrames(spark: SparkSession, df: DataFrame, everyN: Int,
                   maxFrames: Int = 16, idCol: String = "id",
                   binCol: String = "payload"): Dataset[Frames] = {
    import spark.implicits._
    // null payload = missing asset -> no frames (see extractFeatures)
    df.filter(col(binCol).isNotNull)
      .select(col(idCol).cast("long"), sniffKind(col(binCol)), col(binCol))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, kind, bytes) =>
          val frames = bytes.grouped(everyN).take(maxFrames).toArray
          Frames(id, kind, frames.length, frames)
        }
      }
  }
}
