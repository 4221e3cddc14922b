package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Dependency-free RIFF/WAVE codec for 16-bit integer PCM — the second
  * REAL decode path (after `Bmp`) behind the multimodal plumbing: the
  * container ships no audio libraries, so everything here is
  * first-principles RIFF chunk walking.
  *
  * Layout handled (the canonical WAV shape): `RIFF <size> WAVE`, then a
  * chunk sequence that must include `fmt ` (PCM tag 1, 16 bits/sample)
  * before `data`. Unknown chunks (LIST, fact, cue …) are skipped, with
  * RIFF's word-alignment rule honored: an odd-sized chunk is followed by
  * one pad byte that is not part of the chunk.
  *
  * Malformed input throws IllegalArgumentException (via require) —
  * `Multimodal.extractFeatures` catches and falls back to the byte-level
  * stub for that row, so a payload that merely sniffs as RIFF (arbitrary
  * bytes, AVI, non-PCM WAV) degrades gracefully instead of killing the
  * partition.
  */
object Wav {

  /** Decoded PCM payload: interleaved samples, all channels. */
  final case class Pcm(sampleRate: Int, channels: Int, samples: Array[Short])

  /** Encode as a canonical 44-byte-header WAV (fmt then data, no extra
    * chunks).
    */
  def encode(p: Pcm): Array[Byte] = {
    require(p.channels >= 1, "channels must be >= 1")
    val dataLen = p.samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1)                                 // audio format: PCM
    buf.putShort(p.channels.toShort)
    buf.putInt(p.sampleRate)
    buf.putInt(p.sampleRate * p.channels * 2)       // byte rate
    buf.putShort((p.channels * 2).toShort)          // block align
    buf.putShort(16)                                // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < p.samples.length) { buf.putShort(p.samples(i)); i += 1 }
    buf.array()
  }

  /** Decode a 16-bit PCM WAV, walking the chunk sequence. Sizes are
    * validated against the actual byte count — the declared RIFF size is
    * untrusted, exactly like the BMP header fields.
    */
  def decode(bytes: Array[Byte]): Pcm = {
    Codec.check(bytes.length >= 12, "truncated RIFF header")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    Codec.check(tag() == "RIFF", "not a RIFF container")
    buf.getInt                                      // declared size: untrusted
    Codec.check(tag() == "WAVE", "not a WAVE form")
    var rate = 0
    var channels = 0
    var fmtSeen = false
    var samples: Array[Short] = null
    while (samples == null && buf.remaining >= 8) {
      val id = tag()
      val size = buf.getInt
      Codec.check(size >= 0 && size <= buf.remaining, s"chunk $id overruns file")
      if (id == "fmt ") {
        Codec.check(size >= 16, "fmt chunk too short")
        val audioFormat = buf.getShort
        Codec.check(audioFormat == 1, s"not integer PCM (format $audioFormat)")
        channels = buf.getShort.toInt
        Codec.check(channels >= 1, "no channels")
        rate = buf.getInt
        Codec.check(rate > 0, "bad sample rate")
        buf.getInt                                  // byte rate (derived)
        buf.getShort                                // block align (derived)
        val bits = buf.getShort
        Codec.check(bits == 16, s"only 16-bit PCM supported (got $bits)")
        buf.position(buf.position() + (size - 16))  // fmt extension bytes
      } else if (id == "data") {
        Codec.check(fmtSeen, "data chunk before fmt chunk")
        val n = size / 2
        val out = new Array[Short](n)
        var i = 0
        while (i < n) { out(i) = buf.getShort; i += 1 }
        samples = out
      } else {
        buf.position(buf.position() + size)         // skip unknown chunk
      }
      if (id == "fmt ") fmtSeen = true
      // RIFF chunks are word-aligned: odd payload -> one pad byte
      if (samples == null && (size & 1) == 1 && buf.remaining >= 1)
        buf.position(buf.position() + 1)
    }
    Codec.check(samples != null, "no data chunk")
    Pcm(rate, channels, samples)
  }
}
