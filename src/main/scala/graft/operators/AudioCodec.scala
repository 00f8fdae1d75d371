package graft.operators

/** Zero-dependency audio decode: RIFF/WAVE containers with integer PCM
  * payloads — pure byte arithmetic, no codec library.
  *
  *  - Container: `RIFF....WAVE` with a chunk walk (`fmt `, `data`;
  *    anything else — `LIST`, `fact`, `cue ` — skipped by its declared
  *    size, word-aligned as the RIFF spec requires).
  *  - Formats: PCM (wFormatTag 1), IEEE-float PCM (wFormatTag 3,
  *    32-bit — round 16), G.711 A-law/µ-law (wFormatTags 6/7 — round
  *    16, expanded to 16-bit linear by the standard segmented
  *    formulas, JDK-codec-cross-checked on every code point), and
  *    WAVE_FORMAT_EXTENSIBLE (0xFFFE) wrapping any of them;
  *    8-bit unsigned and 16/24/32-bit signed little-endian
  *    integer samples, any channel count ≥ 1, any sample rate ≥ 1.
  *    (Sums stay exact in Long at any width; sums-of-squares are exact
  *    for ≤16-bit always and for wider samples at realistic
  *    levels/lengths.) Float samples are mapped to 24-bit ints
  *    deterministically (`rint(f · 8388607)`, clamped) so the
  *    integer-feature contract — and the closed-form oracles built on
  *    it — hold for float payloads too; fixtures whose floats are
  *    exact k/8388607 lattice points round-trip bit-exactly.
  *  - Output: interleaved samples normalized to signed ints (8-bit is
  *    stored unsigned in WAV: 128 maps to 0), so features are exact
  *    integers an oracle can recompute in closed form.
  *
  * Compressed audio (MP3/AAC/FLAC/μ-law…) needs an entropy codec and
  * falls back to the labeled stub path, same contract as WebP on the
  * image side. Anything malformed decodes to None, never an exception —
  * corrupt media in a 100 TB crawl is data, not an error.
  *
  * Reference capability: multimodal columns over binary payloads
  * (BASELINE.md north star; audio is carried like images — opaque
  * binary + typed metadata).
  */
object AudioCodec {

  /** Decoded clip: interleaved signed samples, frame-major
    * (frame 0 ch 0, frame 0 ch 1, …). `encoding` names the source
    * sample coding — "pcm" integers, "float" (samples carry the
    * deterministic 24-bit mapping), or the G.711 companded pair
    * "ulaw"/"alaw" (samples are the standard 16-bit linear expansion). */
  final case class PcmClip(sampleRate: Int, channels: Int, bitsPerSample: Int,
      samples: Array[Int], encoding: String = "pcm") {
    def frames: Int = samples.length / channels
    def float: Boolean = encoding == "float"
  }

  /** Exact integer features per channel + clip-level counts. Sums and
    * sums-of-squares are exact (oracle-checkable bit-for-bit); RMS and
    * other derived stats follow from them downstream. */
  final case class PcmFeatures(sumByChannel: Array[Long],
      sumSqByChannel: Array[Long], peakAbs: Int)

  /** Cap on decoded samples (guards a hostile header against a tiny
    * payload before any allocation): 64 M samples ≈ 256 MB of ints. */
  private val MaxSamples = 1 << 26

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
  private def tag(b: Array[Byte], i: Int, t: String): Boolean =
    b(i) == t.charAt(0) && b(i + 1) == t.charAt(1) &&
      b(i + 2) == t.charAt(2) && b(i + 3) == t.charAt(3)

  def decode(b: Array[Byte]): Option[PcmClip] = {
    if (b == null || b.length < 44) return None
    if (!tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return None
    var fmtTag = -1
    var channels = 0
    var sampleRate = 0
    var bits = 0
    var dataOff = -1
    var dataLen = 0
    var i = 12
    while (i + 8 <= b.length && (dataOff < 0 || fmtTag < 0)) {
      val size = le32(b, i + 4)
      if (size < 0 || i + 8 + size.toLong > b.length) return None
      if (tag(b, i, "fmt ")) {
        if (size < 16) return None
        fmtTag = le16(b, i + 8)
        channels = le16(b, i + 10)
        sampleRate = le32(b, i + 12)
        bits = le16(b, i + 22)
        // EXTENSIBLE: the real format lives in SubFormat's first word
        if (fmtTag == 0xfffe) {
          if (size < 40) return None
          fmtTag = le16(b, i + 32)
        }
      } else if (tag(b, i, "data")) {
        dataOff = i + 8
        dataLen = size
      }
      i += 8 + size + (size & 1) // RIFF chunks are word-aligned
    }
    val encoding = fmtTag match {
      case 1 => "pcm"
      case 3 => "float"
      case 6 => "alaw"
      case 7 => "ulaw"
      case _ => return None // compressed codecs → stub path
    }
    if (dataOff < 0 || channels < 1 || sampleRate < 1) return None
    encoding match {
      case "float" => if (bits != 32) return None // float64 → stub path
      case "alaw" | "ulaw" => if (bits != 8) return None
      case _ =>
        if (bits != 8 && bits != 16 && bits != 24 && bits != 32) return None
    }
    val bytesPer = bits / 8
    val n = dataLen / (bytesPer * channels) * channels // whole frames only
    if (n <= 0 || n > MaxSamples) return None
    val out = new Array[Int](n)
    var s = 0
    while (s < n) {
      val o = dataOff + s * bytesPer
      out(s) = encoding match {
        case "float" =>
          // [-1,1] float → 24-bit int, round-half-even, clamped: keeps
          // the exact-integer feature contract for float payloads
          val f = java.lang.Float.intBitsToFloat(le32(b, o))
          if (f.isNaN) 0
          else {
            val v = math.rint(f.toDouble * 8388607.0)
            if (v > 8388607.0) 8388607
            else if (v < -8388608.0) -8388608
            else v.toInt
          }
        case "ulaw" => ulawToLinear(b(o) & 0xff)
        case "alaw" => alawToLinear(b(o) & 0xff)
        case _ => bits match {
          case 8 => (b(o) & 0xff) - 128 // WAV 8-bit is unsigned
          case 16 => le16(b, o).toShort.toInt
          case 24 => // sign-extend the 24-bit LE value
            (((b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
              ((b(o + 2) & 0xff) << 16)) << 8) >> 8
          case _ => le32(b, o)
        }
      }
      s += 1
    }
    Some(PcmClip(sampleRate, channels, bits, out, encoding))
  }

  /** ITU-T G.711 µ-law byte → 16-bit linear (the standard segmented
    * expansion: 4-bit mantissa biased by 0x84, 3-bit segment shift,
    * complemented on the wire). Pure formula — no table to transcribe;
    * javax.sound's own ULAW→PCM16 converter must agree byte-for-byte. */
  private[operators] def ulawToLinear(u0: Int): Int = {
    val u = ~u0 & 0xff
    var t = ((u & 0x0f) << 3) + 0x84
    t <<= (u & 0x70) >> 4
    if ((u & 0x80) != 0) 0x84 - t else t - 0x84
  }

  /** ITU-T G.711 A-law byte → 16-bit linear (even-bit-inverted wire
    * form, 4-bit mantissa, segmented; sign bit SET means positive). */
  private[operators] def alawToLinear(a0: Int): Int = {
    val a = a0 ^ 0x55
    var t = (a & 0x0f) << 4
    val seg = (a & 0x70) >> 4
    if (seg == 0) t += 8
    else { t += 0x108; if (seg > 1) t <<= seg - 1 }
    if ((a & 0x80) != 0) t else -t
  }

  /** Exact per-channel sums / sums-of-squares + clip peak. */
  def features(clip: PcmClip): PcmFeatures = {
    val sums = new Array[Long](clip.channels)
    val sumSq = new Array[Long](clip.channels)
    var peak = 0
    var i = 0
    while (i < clip.samples.length) {
      val v = clip.samples(i)
      val c = i % clip.channels
      sums(c) += v
      sumSq(c) += v.toLong * v
      val a = math.abs(v)
      if (a > peak) peak = a
      i += 1
    }
    PcmFeatures(sums, sumSq, peak)
  }

  // ------------------------------------------------------------- encode

  /** Real IEEE-float RIFF/WAVE bytes (fixtures + round-trip tests):
    * canonical header with wFormatTag 3, 32-bit LE floats, interleaved
    * frame-major. Floats on the k/8388607 lattice round-trip to exact
    * ints through [[decode]]'s deterministic mapping. */
  def encodeWavFloat(sampleRate: Int, channels: Int,
      samples: Array[Float]): Array[Byte] = {
    require(sampleRate > 0 && channels > 0 && samples.length % channels == 0)
    val dataLen = samples.length * 4
    val b = new Array[Byte](44 + dataLen)
    def wtag(i: Int, t: String): Unit = {
      var k = 0
      while (k < 4) { b(i + k) = t.charAt(k).toByte; k += 1 }
    }
    def wle16(i: Int, v: Int): Unit = { b(i) = v.toByte; b(i + 1) = (v >> 8).toByte }
    def wle32(i: Int, v: Int): Unit = {
      b(i) = v.toByte; b(i + 1) = (v >> 8).toByte
      b(i + 2) = (v >> 16).toByte; b(i + 3) = (v >> 24).toByte
    }
    wtag(0, "RIFF"); wle32(4, 36 + dataLen); wtag(8, "WAVE")
    wtag(12, "fmt "); wle32(16, 16)
    wle16(20, 3); wle16(22, channels); wle32(24, sampleRate) // IEEE float
    wle32(28, sampleRate * channels * 4)
    wle16(32, channels * 4); wle16(34, 32)
    wtag(36, "data"); wle32(40, dataLen)
    var s = 0
    while (s < samples.length) {
      wle32(44 + s * 4, java.lang.Float.floatToIntBits(samples(s)))
      s += 1
    }
    b
  }

  /** Real G.711 µ-law RIFF/WAVE bytes (fixtures): canonical header
    * with wFormatTag 7, mono, the 8-bit code stream as given. */
  def encodeWavUlaw(sampleRate: Int, codes: Array[Byte]): Array[Byte] = {
    require(sampleRate > 0 && codes.nonEmpty)
    val b = new Array[Byte](44 + codes.length)
    def wtag(i: Int, t: String): Unit = {
      var k = 0
      while (k < 4) { b(i + k) = t.charAt(k).toByte; k += 1 }
    }
    def wle16(i: Int, v: Int): Unit = { b(i) = v.toByte; b(i + 1) = (v >> 8).toByte }
    def wle32(i: Int, v: Int): Unit = {
      b(i) = v.toByte; b(i + 1) = (v >> 8).toByte
      b(i + 2) = (v >> 16).toByte; b(i + 3) = (v >> 24).toByte
    }
    wtag(0, "RIFF"); wle32(4, 36 + codes.length); wtag(8, "WAVE")
    wtag(12, "fmt "); wle32(16, 16)
    wle16(20, 7); wle16(22, 1); wle32(24, sampleRate) // µ-law, mono
    wle32(28, sampleRate); wle16(32, 1); wle16(34, 8)
    wtag(36, "data"); wle32(40, codes.length)
    System.arraycopy(codes, 0, b, 44, codes.length)
    b
  }

  /** Real RIFF/WAVE bytes (fixtures + round-trip tests): canonical
    * 44-byte header, 16-bit signed LE PCM, interleaved `samples`
    * (frame-major, length must be a multiple of `channels`). */
  def encodeWav(sampleRate: Int, channels: Int, samples: Array[Int]): Array[Byte] = {
    require(sampleRate > 0 && channels > 0 && samples.length % channels == 0)
    require(samples.forall(s => s >= Short.MinValue && s <= Short.MaxValue))
    val dataLen = samples.length * 2
    val b = new Array[Byte](44 + dataLen)
    def wtag(i: Int, t: String): Unit = {
      var k = 0
      while (k < 4) { b(i + k) = t.charAt(k).toByte; k += 1 }
    }
    def wle16(i: Int, v: Int): Unit = { b(i) = v.toByte; b(i + 1) = (v >> 8).toByte }
    def wle32(i: Int, v: Int): Unit = {
      b(i) = v.toByte; b(i + 1) = (v >> 8).toByte
      b(i + 2) = (v >> 16).toByte; b(i + 3) = (v >> 24).toByte
    }
    wtag(0, "RIFF"); wle32(4, 36 + dataLen); wtag(8, "WAVE")
    wtag(12, "fmt "); wle32(16, 16)
    wle16(20, 1); wle16(22, channels); wle32(24, sampleRate)
    wle32(28, sampleRate * channels * 2) // byte rate
    wle16(32, channels * 2); wle16(34, 16) // block align, bits
    wtag(36, "data"); wle32(40, dataLen)
    var s = 0
    while (s < samples.length) {
      wle16(44 + s * 2, samples(s))
      s += 1
    }
    b
  }
}
