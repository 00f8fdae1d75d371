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
  *    formulas, JDK-codec-cross-checked on every code point), IMA/DVI
  *    ADPCM (wFormatTag 0x11 — round 16, the block-structured 4-bit
  *    coding decoded with the standard 89-entry step table; the first
  *    COMPRESSED audio coding), Microsoft ADPCM (wFormatTag 2 —
  *    round 18, the second-order linear-predictor 4-bit coding with
  *    the registered 7 coefficient pairs and 16-entry delta
  *    adaptation), and
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
  * FLAC decodes for real since round 18 ([[FlacCodec]] — rice codes,
  * fixed + LPC predictors, CRC-verified frames, lossless so every
  * closed-form oracle carries over bit-exactly). PERCEPTUAL codecs
  * (MP3/AAC/Vorbis…) fall back to the labeled stub path — their
  * synthesis filterbanks need coefficient tables that cannot be
  * transcribed offline. MP3 CONTAINER metadata (exact frame-counted
  * duration, bitrate, sample rate, channels, VBR detection) is real
  * since round 19 via the [[graft.functions.Mp3Meta]] header walk —
  * the filter-before-decode path; only sample synthesis stays stubbed.
  * Anything malformed decodes to None, never an
  * exception — corrupt media in a 100 TB crawl is data, not an error.
  *
  * Reference capability: multimodal columns over binary payloads
  * (BASELINE.md north star; audio is carried like images — opaque
  * binary + typed metadata).
  */
object AudioCodec {

  /** Decoded clip: interleaved signed samples, frame-major
    * (frame 0 ch 0, frame 0 ch 1, …). `encoding` names the source
    * sample coding — "pcm" integers, "float" (samples carry the
    * deterministic 24-bit mapping), the G.711 companded pair
    * "ulaw"/"alaw" (standard 16-bit linear expansion), or "adpcm"
    * (IMA 4-bit codes; samples are the 16-bit reconstruction). */
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
    if (b == null || b.length < 8) return None
    if (b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C')
      return FlacCodec.decode(b) // round 18: lossless entropy-coded tier
    if (b.length < 44) return None
    if (!tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return None
    var fmtTag = -1
    var channels = 0
    var sampleRate = 0
    var bits = 0
    var fmtOff = -1
    var fmtSize = 0
    var dataOff = -1
    var dataLen = 0
    var i = 12
    while (i + 8 <= b.length && (dataOff < 0 || fmtTag < 0)) {
      val size = le32(b, i + 4)
      if (size < 0 || i + 8 + size.toLong > b.length) return None
      if (tag(b, i, "fmt ")) {
        if (size < 16) return None
        fmtOff = i + 8
        fmtSize = size
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
      case 2 => "msadpcm" // Microsoft ADPCM (round 18)
      case 0x11 => "adpcm" // IMA/DVI ADPCM (round 16)
      case _ => return None // compressed codecs → stub path
    }
    if (dataOff < 0 || channels < 1 || sampleRate < 1) return None
    encoding match {
      case "float" => if (bits != 32 && bits != 64) return None
      case "alaw" | "ulaw" => if (bits != 8) return None
      case "adpcm" =>
        if (bits != 4) return None
        return decodeAdpcm(b, fmtOff, fmtSize, channels, sampleRate,
          dataOff, dataLen)
      case "msadpcm" =>
        if (bits != 4) return None
        return decodeMsAdpcm(b, fmtOff, fmtSize, channels, sampleRate,
          dataOff, dataLen)
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
          // the exact-integer feature contract for float payloads.
          // 64-bit doubles (wFormatTag 3, bits=64) take the same
          // deterministic mapping — every k/8388607 lattice point is
          // exactly representable in both widths, so the feature
          // contract is width-independent
          val d =
            if (bits == 32) java.lang.Float.intBitsToFloat(le32(b, o)).toDouble
            else java.lang.Double.longBitsToDouble(
              ((le32(b, o + 4).toLong & 0xffffffffL) << 32) |
                (le32(b, o).toLong & 0xffffffffL))
          if (d.isNaN) 0
          else {
            val v = math.rint(d * 8388607.0)
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

  // ------------------------------------------------------ IMA ADPCM

  /** The standard IMA/DVI ADPCM step-size table (89 entries, ~1.1×
    * geometric growth) and index-adjustment table — the tables every
    * IMA implementation shares (IMA Digital Audio Focus Group, 1992;
    * also Microsoft's WAVE registration of format 0x0011).
    * AudioCodecSpec pins their structural invariants (monotone, 7 →
    * 32767, per-entry growth ratio) and the encoder/decoder inverse
    * property that makes fixtures exact. */
  private[operators] val AdpcmStep: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17,
    19, 21, 23, 25, 28, 31, 34, 37, 41, 45,
    50, 55, 60, 66, 73, 80, 88, 97, 107, 118,
    130, 143, 157, 173, 190, 209, 230, 253, 279, 307,
    337, 371, 408, 449, 494, 544, 598, 658, 724, 796,
    876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358,
    5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)
  private[operators] val AdpcmIndexAdj: Array[Int] =
    Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** One IMA decode step: reconstruct the delta for `nibble` from the
    * current step size (step/8 + optional step/4 + step/2 + step terms,
    * bit 8 = sign), clamp the predictor to int16, walk the index. */
  private def adpcmAdvance(nibble: Int, pred: Int, index: Int): (Int, Int) = {
    val step = AdpcmStep(index)
    var diff = step >> 3
    if ((nibble & 1) != 0) diff += step >> 2
    if ((nibble & 2) != 0) diff += step >> 1
    if ((nibble & 4) != 0) diff += step
    val p0 = if ((nibble & 8) != 0) pred - diff else pred + diff
    val p = if (p0 > 32767) 32767 else if (p0 < -32768) -32768 else p0
    val i0 = index + AdpcmIndexAdj(nibble & 7)
    (p, if (i0 < 0) 0 else if (i0 > 88) 88 else i0)
  }

  /** WAVE format 0x0011 block decode. Per block and channel: a 4-byte
    * header (int16 initial predictor — which IS the first output
    * sample — uint8 step index ≤ 88, reserved byte), then 4-bit codes
    * low-nibble-first; stereo interleaves the code stream in 4-byte
    * (8-sample) groups per channel. wSamplesPerBlock from the fmt
    * extension must agree with the block geometry
    * ((blockAlign − 4·ch)·2/ch + 1). Only complete blocks decode (the
    * same whole-frames-only policy as PCM); a hostile index byte or
    * geometry mismatch → None. Output samples are the 16-bit linear
    * reconstruction, so the exact-integer feature contract holds.
    * There is no JDK ADPCM reader to cross-check (javax.sound stops at
    * G.711), so AudioCodecSpec anchors the tables structurally and
    * pins decode↔encode inverse identities instead. */
  private def decodeAdpcm(b: Array[Byte], fmtOff: Int, fmtSize: Int,
      channels: Int, sampleRate: Int, dataOff: Int, dataLen: Int)
      : Option[PcmClip] = {
    if (fmtSize < 20) return None // needs cbSize + wSamplesPerBlock
    val blockAlign = le16(b, fmtOff + 12)
    val spb = le16(b, fmtOff + 18)
    val headerBytes = 4 * channels
    val dataArea = blockAlign - headerBytes
    if (dataArea < 0) return None
    if (channels > 1 && dataArea % (4 * channels) != 0) return None
    if (spb != dataArea * 2 / channels + 1) return None
    val nBlocks = if (blockAlign == 0) 0 else dataLen / blockAlign
    if (nBlocks <= 0) return None
    val total = nBlocks.toLong * spb * channels
    if (total > MaxSamples) return None
    val out = new Array[Int](total.toInt)
    val pred = new Array[Int](channels)
    val index = new Array[Int](channels)
    var blk = 0
    while (blk < nBlocks) {
      val base = dataOff + blk * blockAlign
      val outBase = blk * spb * channels
      var c = 0
      while (c < channels) {
        pred(c) = le16(b, base + 4 * c).toShort.toInt
        index(c) = b(base + 4 * c + 2) & 0xff
        if (index(c) > 88) return None // hostile step index
        out(outBase + c) = pred(c) // the header predictor is sample 0
        c += 1
      }
      // code area: mono reads bytes sequentially; stereo alternates
      // 4-byte groups per channel. Sample s of channel c lands at
      // interleaved position (s·ch + c).
      var off = base + headerBytes
      var done = 1 // samples emitted per channel so far
      while (done < spb) {
        c = 0
        while (c < channels) {
          val groupSamples = math.min(8, spb - done)
          var k = 0
          while (k < groupSamples) {
            val byte = b(off + (k >> 1)) & 0xff
            val nib = if ((k & 1) == 0) byte & 0x0f else byte >> 4
            val (p, ix) = adpcmAdvance(nib, pred(c), index(c))
            pred(c) = p; index(c) = ix
            out(outBase + (done + k) * channels + c) = p
            k += 1
          }
          off += 4
          c += 1
        }
        done += math.min(8, spb - done)
      }
      blk += 1
    }
    Some(PcmClip(sampleRate, channels, 4, out, "adpcm"))
  }

  // ------------------------------------------------------- MS ADPCM

  /** Microsoft ADPCM (wFormatTag 2) constants — the second-order
    * linear-predictor coding registered in Microsoft's WAVE spec: 7
    * fixed coefficient pairs (÷256), a 16-entry delta-adaptation table
    * (÷256, floored at 16). Both tables are from the published format
    * registration; AudioCodecSpec pins the decoder↔encoder inverse
    * identities and the exact blockwise-constant shape. */
  private[operators] val MsAdaptTable: Array[Int] = Array(
    230, 230, 230, 230, 307, 409, 512, 614,
    768, 614, 512, 409, 307, 230, 230, 230)
  private[operators] val MsCoef1: Array[Int] = Array(256, 512, 0, 192, 240, 460, 392)
  private[operators] val MsCoef2: Array[Int] = Array(0, -256, 0, 64, 0, -208, -232)

  private def clamp16(v: Int): Int =
    if (v > 32767) 32767 else if (v < -32768) -32768 else v

  /** One MS-ADPCM decode step: second-order prediction (÷256,
    * truncating like the C reference), signed-nibble × delta residual,
    * int16 clamp, delta adaptation with the 16 floor. Returns
    * (sample, newDelta). */
  private def msAdvance(nib: Int, samp1: Int, samp2: Int, coef: Int,
      delta: Int): (Int, Int) = {
    val predictor = (samp1 * MsCoef1(coef) + samp2 * MsCoef2(coef)) / 256
    val signed = if (nib >= 8) nib - 16 else nib
    val sample = clamp16(predictor + signed * delta)
    val d0 = MsAdaptTable(nib) * delta / 256
    (sample, if (d0 < 16) 16 else d0)
  }

  /** WAVE format 0x0002 block decode. Per block: per-channel predictor
    * indexes (1 byte, < wNumCoef), per-channel int16 initial deltas,
    * then the two seed samples per channel (iSamp1, iSamp2) — iSamp2 is
    * the OLDER one and is emitted first — followed by 4-bit codes HIGH
    * nibble first, alternating channels sample-by-sample.
    * wSamplesPerBlock must equal (blockAlign − 7·ch)·2/ch + 2. Only
    * complete blocks decode; a hostile predictor index or geometry
    * mismatch → None. Like IMA there is no JDK reader to cross-check,
    * so the spec pins inverse identities + the exact constant shape. */
  private def decodeMsAdpcm(b: Array[Byte], fmtOff: Int, fmtSize: Int,
      channels: Int, sampleRate: Int, dataOff: Int, dataLen: Int)
      : Option[PcmClip] = {
    if (fmtSize < 22) return None // cbSize + wSamplesPerBlock + wNumCoef
    val blockAlign = le16(b, fmtOff + 12)
    val spb = le16(b, fmtOff + 18)
    val numCoef = le16(b, fmtOff + 20)
    if (numCoef < 1 || fmtSize < 22 + 4 * numCoef) return None
    // custom coefficient sets are legal in the container; this decoder
    // requires the standard 7 pairs as a prefix so every stream it
    // accepts reconstructs with the registered arithmetic
    if (numCoef > 7) return None
    var k = 0
    while (k < numCoef) {
      if (le16(b, fmtOff + 22 + 4 * k).toShort.toInt != MsCoef1(k) ||
        le16(b, fmtOff + 24 + 4 * k).toShort.toInt != MsCoef2(k)) return None
      k += 1
    }
    val headerBytes = 7 * channels
    val dataArea = blockAlign - headerBytes
    if (dataArea < 0) return None
    if ((dataArea * 2) % channels != 0) return None
    if (spb != dataArea * 2 / channels + 2) return None
    val nBlocks = if (blockAlign == 0) 0 else dataLen / blockAlign
    if (nBlocks <= 0) return None
    val total = nBlocks.toLong * spb * channels
    if (total > MaxSamples) return None
    val out = new Array[Int](total.toInt)
    val coef = new Array[Int](channels)
    val delta = new Array[Int](channels)
    val samp1 = new Array[Int](channels)
    val samp2 = new Array[Int](channels)
    var blk = 0
    while (blk < nBlocks) {
      val base = dataOff + blk * blockAlign
      val outBase = blk * spb * channels
      var c = 0
      while (c < channels) {
        coef(c) = b(base + c) & 0xff
        if (coef(c) >= numCoef) return None // hostile predictor index
        delta(c) = le16(b, base + channels + 2 * c).toShort.toInt
        samp1(c) = le16(b, base + 3 * channels + 2 * c).toShort.toInt
        samp2(c) = le16(b, base + 5 * channels + 2 * c).toShort.toInt
        out(outBase + c) = samp2(c) // iSamp2 is the earlier sample
        out(outBase + channels + c) = samp1(c)
        c += 1
      }
      var nibIdx = 0
      val nNibs = (spb - 2) * channels
      while (nibIdx < nNibs) {
        val byte = b(base + headerBytes + (nibIdx >> 1)) & 0xff
        val nib = if ((nibIdx & 1) == 0) byte >> 4 else byte & 0x0f
        val c2 = nibIdx % channels
        val (s, d) = msAdvance(nib, samp1(c2), samp2(c2), coef(c2), delta(c2))
        samp2(c2) = samp1(c2); samp1(c2) = s; delta(c2) = d
        out(outBase + (2 + nibIdx / channels) * channels + c2) = s
        nibIdx += 1
      }
      blk += 1
    }
    Some(PcmClip(sampleRate, channels, 4, out, "msadpcm"))
  }

  /** Real MS-ADPCM RIFF/WAVE bytes (fixtures + round-trip tests): the
    * format-0x0002 compressor with predictor set 0 ({256, 0} — first-
    * order) and exhaustive 16-way nibble choice (each candidate scored
    * by the decoder's own reconstruction, so encode∘decode state always
    * agrees). The two seed samples ride the header VERBATIM, so a
    * blockwise-constant input encodes to all-zero nibbles and
    * reconstructs EXACTLY — the closed-form fixture shape. `samples`
    * is interleaved frame-major and must fill whole blocks. */
  def encodeWavMsAdpcm(sampleRate: Int, channels: Int, samples: Array[Int],
      blockAlign: Int, initialDelta: Int = 16): Array[Byte] = {
    require(sampleRate > 0 && channels > 0 && blockAlign > 7 * channels)
    val dataArea = blockAlign - 7 * channels
    require((dataArea * 2) % channels == 0)
    val spb = dataArea * 2 / channels + 2
    require(samples.length % (spb * channels) == 0 && samples.nonEmpty)
    require(samples.forall(s => s >= Short.MinValue && s <= Short.MaxValue))
    require(initialDelta >= 16 && initialDelta <= Short.MaxValue)
    val nBlocks = samples.length / (spb * channels)
    val data = new Array[Byte](nBlocks * blockAlign)
    val delta = new Array[Int](channels)
    val samp1 = new Array[Int](channels)
    val samp2 = new Array[Int](channels)
    var blk = 0
    while (blk < nBlocks) {
      val base = blk * blockAlign
      val inBase = blk * spb * channels
      var c = 0
      while (c < channels) {
        delta(c) = initialDelta
        samp2(c) = samples(inBase + c)
        samp1(c) = samples(inBase + channels + c)
        data(base + c) = 0 // bPredictor 0: coef {256, 0}
        data(base + channels + 2 * c) = delta(c).toByte
        data(base + channels + 2 * c + 1) = (delta(c) >> 8).toByte
        data(base + 3 * channels + 2 * c) = samp1(c).toByte
        data(base + 3 * channels + 2 * c + 1) = (samp1(c) >> 8).toByte
        data(base + 5 * channels + 2 * c) = samp2(c).toByte
        data(base + 5 * channels + 2 * c + 1) = (samp2(c) >> 8).toByte
        c += 1
      }
      var nibIdx = 0
      val nNibs = (spb - 2) * channels
      while (nibIdx < nNibs) {
        val c2 = nibIdx % channels
        val x = samples(inBase + (2 + nibIdx / channels) * channels + c2)
        // exhaustive candidate scoring through the decode arithmetic
        var bestNib = 0
        var bestErr = Long.MaxValue
        var cand = 0
        while (cand < 16) {
          val (s, _) = msAdvance(cand, samp1(c2), samp2(c2), 0, delta(c2))
          val e = math.abs(s.toLong - x)
          if (e < bestErr) { bestErr = e; bestNib = cand }
          cand += 1
        }
        val (s, d) = msAdvance(bestNib, samp1(c2), samp2(c2), 0, delta(c2))
        samp2(c2) = samp1(c2); samp1(c2) = s; delta(c2) = d
        val at = base + 7 * channels + (nibIdx >> 1)
        if ((nibIdx & 1) == 0) data(at) = (bestNib << 4).toByte
        else data(at) = (data(at) | bestNib).toByte
        nibIdx += 1
      }
      blk += 1
    }
    wrapWavMsAdpcm(sampleRate, channels, blockAlign, spb, data)
  }

  /** Raw format-0x0002 container around caller-built block bytes
    * (adversarial fixtures: hostile predictor indexes, bad geometry). */
  def wrapWavMsAdpcm(sampleRate: Int, channels: Int, blockAlign: Int,
      samplesPerBlock: Int, data: Array[Byte]): Array[Byte] = {
    val fmtLen = 22 + 4 * 7 // through the 7 standard coefficient pairs
    val b = new Array[Byte](28 + fmtLen + 8 + data.length)
    def wtag(i: Int, t: String): Unit = wtagAt(b, i, t)
    def wle16(i: Int, v: Int): Unit = wle16At(b, i, v)
    def wle32(i: Int, v: Int): Unit = wle32At(b, i, v)
    wtag(0, "RIFF"); wle32(4, 20 + fmtLen + 8 + data.length); wtag(8, "WAVE")
    wtag(12, "fmt "); wle32(16, fmtLen)
    wle16(20, 0x02); wle16(22, channels); wle32(24, sampleRate)
    wle32(28, if (samplesPerBlock > 0)
      (sampleRate.toLong * blockAlign / samplesPerBlock).toInt else 0)
    wle16(32, blockAlign); wle16(34, 4)
    wle16(36, fmtLen - 18) // cbSize
    wle16(38, samplesPerBlock); wle16(40, 7)
    var k = 0
    while (k < 7) {
      wle16(42 + 4 * k, MsCoef1(k)); wle16(44 + 4 * k, MsCoef2(k))
      k += 1
    }
    wtag(20 + fmtLen, "data"); wle32(24 + fmtLen, data.length)
    System.arraycopy(data, 0, b, 28 + fmtLen, data.length)
    b
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

  // shared little-endian writers for the fixture encoders (one copy —
  // every canonical-header writer below uses these)
  private def wtagAt(b: Array[Byte], i: Int, t: String): Unit = {
    var k = 0
    while (k < 4) { b(i + k) = t.charAt(k).toByte; k += 1 }
  }
  private def wle16At(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = v.toByte; b(i + 1) = (v >> 8).toByte
  }
  private def wle32At(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = v.toByte; b(i + 1) = (v >> 8).toByte
    b(i + 2) = (v >> 16).toByte; b(i + 3) = (v >> 24).toByte
  }

  /** Real IEEE-float RIFF/WAVE bytes (fixtures + round-trip tests):
    * canonical header with wFormatTag 3, 32-bit LE floats, interleaved
    * frame-major. Floats on the k/8388607 lattice round-trip to exact
    * ints through [[decode]]'s deterministic mapping. */
  def encodeWavFloat(sampleRate: Int, channels: Int,
      samples: Array[Float]): Array[Byte] = {
    require(sampleRate > 0 && channels > 0 && samples.length % channels == 0)
    val dataLen = samples.length * 4
    val b = new Array[Byte](44 + dataLen)
    def wtag(i: Int, t: String): Unit = wtagAt(b, i, t)
    def wle16(i: Int, v: Int): Unit = wle16At(b, i, v)
    def wle32(i: Int, v: Int): Unit = wle32At(b, i, v)
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

  /** 64-bit IEEE-float WAV fixture (wFormatTag 3, bits=64) — the double
    * sibling of [[encodeWavFloat]]; same deterministic 24-bit mapping on
    * decode, so lattice doubles round-trip to exact ints. */
  def encodeWavFloat64(sampleRate: Int, channels: Int,
      samples: Array[Double]): Array[Byte] = {
    require(sampleRate > 0 && channels > 0 && samples.length % channels == 0)
    val dataLen = samples.length * 8
    val b = new Array[Byte](44 + dataLen)
    def wtag(i: Int, t: String): Unit = wtagAt(b, i, t)
    def wle16(i: Int, v: Int): Unit = wle16At(b, i, v)
    def wle32(i: Int, v: Int): Unit = wle32At(b, i, v)
    wtag(0, "RIFF"); wle32(4, 36 + dataLen); wtag(8, "WAVE")
    wtag(12, "fmt "); wle32(16, 16)
    wle16(20, 3); wle16(22, channels); wle32(24, sampleRate) // IEEE float
    wle32(28, sampleRate * channels * 8)
    wle16(32, channels * 8); wle16(34, 64)
    wtag(36, "data"); wle32(40, dataLen)
    var s = 0
    while (s < samples.length) {
      val bits = java.lang.Double.doubleToLongBits(samples(s))
      wle32(44 + s * 8, bits.toInt)
      wle32(44 + s * 8 + 4, (bits >>> 32).toInt)
      s += 1
    }
    b
  }

  /** Real G.711 µ-law RIFF/WAVE bytes (fixtures): canonical header
    * with wFormatTag 7, mono, the 8-bit code stream as given. */
  def encodeWavUlaw(sampleRate: Int, codes: Array[Byte]): Array[Byte] = {
    require(sampleRate > 0 && codes.nonEmpty)
    val b = new Array[Byte](44 + codes.length)
    def wtag(i: Int, t: String): Unit = wtagAt(b, i, t)
    def wle16(i: Int, v: Int): Unit = wle16At(b, i, v)
    def wle32(i: Int, v: Int): Unit = wle32At(b, i, v)
    wtag(0, "RIFF"); wle32(4, 36 + codes.length); wtag(8, "WAVE")
    wtag(12, "fmt "); wle32(16, 16)
    wle16(20, 7); wle16(22, 1); wle32(24, sampleRate) // µ-law, mono
    wle32(28, sampleRate); wle16(32, 1); wle16(34, 8)
    wtag(36, "data"); wle32(40, codes.length)
    System.arraycopy(codes, 0, b, 44, codes.length)
    b
  }

  /** Real IMA-ADPCM RIFF/WAVE bytes (fixtures + round-trip tests): the
    * standard format-0x0011 compressor. Per block and channel the
    * header carries the first input sample VERBATIM as the predictor
    * (so a blockwise-constant input encodes to all-zero nibbles at
    * step index 0 and reconstructs EXACTLY — the closed-form fixture
    * shape) plus the carried step index; remaining samples quantize
    * through the standard bit-by-bit comparison, state advanced by the
    * same reconstruction arithmetic the decoder runs. `samples` is
    * interleaved frame-major; frames must fill whole blocks. */
  def encodeWavAdpcm(sampleRate: Int, channels: Int, samples: Array[Int],
      blockAlign: Int, initialIndex: Int = 0): Array[Byte] = {
    require(sampleRate > 0 && channels > 0 && blockAlign > 4 * channels)
    val dataArea = blockAlign - 4 * channels
    require(channels == 1 || dataArea % (4 * channels) == 0)
    val spb = dataArea * 2 / channels + 1
    require(samples.length % (spb * channels) == 0 && samples.nonEmpty)
    require(samples.forall(s => s >= Short.MinValue && s <= Short.MaxValue))
    require(initialIndex >= 0 && initialIndex <= 88)
    val nBlocks = samples.length / (spb * channels)
    val data = new Array[Byte](nBlocks * blockAlign)
    val pred = new Array[Int](channels)
    val index = Array.fill(channels)(initialIndex)
    var blk = 0
    while (blk < nBlocks) {
      val base = blk * blockAlign
      val inBase = blk * spb * channels
      var c = 0
      while (c < channels) {
        pred(c) = samples(inBase + c)
        data(base + 4 * c) = pred(c).toByte
        data(base + 4 * c + 1) = (pred(c) >> 8).toByte
        data(base + 4 * c + 2) = index(c).toByte
        c += 1
      }
      var off = base + 4 * channels
      var done = 1
      while (done < spb) {
        c = 0
        while (c < channels) {
          val groupSamples = math.min(8, spb - done)
          var k = 0
          while (k < groupSamples) {
            val x = samples(inBase + (done + k) * channels + c)
            val step = AdpcmStep(index(c))
            var diff = x - pred(c)
            var nib = 0
            if (diff < 0) { nib = 8; diff = -diff }
            if (diff >= step) { nib |= 4; diff -= step }
            if (diff >= (step >> 1)) { nib |= 2; diff -= step >> 1 }
            if (diff >= (step >> 2)) nib |= 1
            val (p, ix) = adpcmAdvance(nib, pred(c), index(c))
            pred(c) = p; index(c) = ix
            val at = off + (k >> 1)
            if ((k & 1) == 0) data(at) = nib.toByte
            else data(at) = (data(at) | (nib << 4)).toByte
            k += 1
          }
          off += 4
          c += 1
        }
        done += math.min(8, spb - done)
      }
      blk += 1
    }
    wrapWavAdpcm(sampleRate, channels, blockAlign, spb, data)
  }

  /** Raw format-0x0011 container around caller-built block bytes
    * (adversarial fixtures: hostile indexes, mismatched geometry). */
  def wrapWavAdpcm(sampleRate: Int, channels: Int, blockAlign: Int,
      samplesPerBlock: Int, data: Array[Byte]): Array[Byte] = {
    val b = new Array[Byte](48 + data.length)
    def wtag(i: Int, t: String): Unit = wtagAt(b, i, t)
    def wle16(i: Int, v: Int): Unit = wle16At(b, i, v)
    def wle32(i: Int, v: Int): Unit = wle32At(b, i, v)
    wtag(0, "RIFF"); wle32(4, 40 + data.length); wtag(8, "WAVE")
    wtag(12, "fmt "); wle32(16, 20)
    wle16(20, 0x11); wle16(22, channels); wle32(24, sampleRate)
    wle32(28, if (samplesPerBlock > 0)
      (sampleRate.toLong * blockAlign / samplesPerBlock).toInt else 0)
    wle16(32, blockAlign); wle16(34, 4) // block align, 4-bit codes
    wle16(36, 2); wle16(38, samplesPerBlock) // cbSize, wSamplesPerBlock
    wtag(40, "data"); wle32(44, data.length)
    System.arraycopy(data, 0, b, 48, data.length)
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
    def wtag(i: Int, t: String): Unit = wtagAt(b, i, t)
    def wle16(i: Int, v: Int): Unit = wle16At(b, i, v)
    def wle32(i: Int, v: Int): Unit = wle32At(b, i, v)
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
