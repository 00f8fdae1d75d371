package graft.operators

/** Zero-dependency FLAC decode (round 18) — the first entropy-coded
  * audio codec on the real-decode path. Unlike MP3/AAC (whose synthesis
  * filterbank needs a 512-tap window table that cannot be transcribed
  * offline), FLAC is fully specified by small closed formulas — rice
  * codes, four fixed polynomial predictors, in-stream quantized LPC
  * coefficients — and it is LOSSLESS, so the closed-form oracle
  * discipline holds bit-for-bit: decode(encode(x)) == x exactly.
  *
  *  - Stream layer: `fLaC` magic, metadata blocks (STREAMINFO parsed —
  *    sample rate / channels / bits / total samples; others skipped by
  *    declared length).
  *  - Frame layer: 14-bit sync + blocking strategy, the block-size /
  *    sample-rate / sample-size code tables, UTF-8-style coded frame
  *    number, CRC-8 (poly 0x07) over the header and CRC-16 (poly
  *    0x8005) over the whole frame — BOTH verified; a mismatch refuses
  *    the clip (corrupt media is data, not an error).
  *  - Subframes: CONSTANT, VERBATIM, FIXED orders 0–4 (the binomial
  *    predictors), LPC orders 1–32 (4-bit precision, 5-bit shift,
  *    in-stream signed coefficients, 64-bit accumulator), wasted-bits
  *    unary prefix, and the +1-bit side channel under the three stereo
  *    decorrelations (left/side, right/side, mid/side — the libFLAC
  *    integer spelling `mid = (mid<<1)|(side&1); L=(mid+side)>>1`).
  *  - Residuals: both rice methods (4-bit and 5-bit parameters),
  *    partition orders 0–15, the escape code (raw n-bit residuals),
  *    zigzag decode.
  *
  * The encoder (fixtures + round-trip tests) writes real streams with
  * selectable subframe SPELLINGS — verbatim, fixed 0–4, and an LPC
  * spelling whose quantized coefficients replicate a fixed predictor —
  * so one PCM signal encoded through structurally different bitstreams
  * must decode identically (the JPEG SOF13-vs-SOF5 discipline), plus
  * all three stereo decorrelations against independent channels.
  *
  * Reference capability: multimodal audio features over binary columns
  * (BASELINE.md north star); FLAC is the lossless half of a real crawl's
  * audio mix.
  */
object FlacCodec {
  import AudioCodec.PcmClip

  private val MaxSamples = 1 << 26 // in step with AudioCodec

  private final class Corrupt extends RuntimeException(null, null, false, false)
  private def corrupt(): Nothing = throw new Corrupt

  // ------------------------------------------------------------- crc
  /** CRC-8, polynomial x^8 + x^2 + x + 1 (0x07), init 0 — the FLAC
    * frame-header checksum. */
  private[operators] def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= b(i) & 0xff
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff else (crc << 1) & 0xff
        k += 1
      }
      i += 1
    }
    crc
  }

  /** CRC-16, polynomial x^16 + x^15 + x^2 + 1 (0x8005), init 0 — the
    * FLAC whole-frame checksum. */
  private[operators] def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (b(i) & 0xff) << 8
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
              else (crc << 1) & 0xffff
        k += 1
      }
      i += 1
    }
    crc
  }

  // ------------------------------------------------------------- bit io
  /** MSB-first bit reader (FLAC is big-endian at the bit level). */
  private final class Br(b: Array[Byte], startByte: Int, endByte: Int) {
    var pos: Long = startByte.toLong * 8
    val limit: Long = endByte.toLong * 8
    def bytePos: Int = { if ((pos & 7) != 0) corrupt(); (pos >> 3).toInt }
    def align(): Unit = pos = (pos + 7) & ~7L
    def bit(): Int = {
      if (pos >= limit) corrupt()
      val v = (b((pos >> 3).toInt) >> (7 - (pos & 7).toInt)) & 1
      pos += 1
      v
    }
    def bits(n: Int): Int = { // n ≤ 31, unsigned
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def bitsLong(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def signed(n: Int): Int = { // two's complement, n ≤ 33 (side channel)
      if (n == 0) return 0
      var v = bitsLong(n)
      if ((v & (1L << (n - 1))) != 0) v -= (1L << n)
      // a 33-bit intermediate that exceeds Int is unrepresentable in the
      // Int sample lane → refuse (only reachable from 32-bit stereo)
      if (v < Int.MinValue || v > Int.MaxValue) corrupt()
      v.toInt
    }
    def unary(): Int = { // zeros terminated by a 1
      var q = 0
      while (bit() == 0) { q += 1; if (q > (1 << 24)) corrupt() }
      q
    }
  }

  // ------------------------------------------------------------- decode

  def decode(b: Array[Byte]): Option[PcmClip] = {
    try decodeImpl(b)
    catch {
      case _: Corrupt => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }
  }

  private def be(b: Array[Byte], i: Int, n: Int): Long = {
    var v = 0L
    var k = 0
    while (k < n) { v = (v << 8) | (b(i + k) & 0xff); k += 1 }
    v
  }

  private def decodeImpl(b: Array[Byte]): Option[PcmClip] = {
    if (b == null || b.length < 42) return None
    if (!(b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C')) return None
    // metadata blocks; STREAMINFO must come first (spec)
    var i = 4
    var last = false
    var sampleRate = 0
    var channels = 0
    var bits = 0
    var totalSamples = 0L
    var sawInfo = false
    while (!last) {
      if (i + 4 > b.length) return None
      val hdr = b(i) & 0xff
      last = (hdr & 0x80) != 0
      val btype = hdr & 0x7f
      val len = be(b, i + 1, 3).toInt
      if (i + 4 + len.toLong > b.length) return None
      if (btype == 0) { // STREAMINFO
        if (len < 34 || sawInfo) return None
        val o = i + 4
        // min/max block size (16+16), min/max frame size (24+24) skipped
        val packed = be(b, o + 10, 8) // rate(20) ch-1(3) bps-1(5) total(36)
        sampleRate = (packed >>> 44).toInt
        channels = ((packed >>> 41) & 7).toInt + 1
        bits = ((packed >>> 36) & 31).toInt + 1
        totalSamples = packed & ((1L << 36) - 1)
        sawInfo = true
      } else if (btype == 127) return None
      i += 4 + len
    }
    if (!sawInfo || sampleRate < 1 || channels < 1) return None
    if (totalSamples > MaxSamples / channels) return None
    val out = new java.util.ArrayList[Array[Int]]() // per-frame interleaved
    var decoded = 0L
    while (i < b.length && (totalSamples == 0 || decoded < totalSamples)) {
      val (frame, next) = decodeFrame(b, i, sampleRate, channels, bits)
      out.add(frame)
      decoded += frame.length / channels
      if (decoded > MaxSamples / channels) return None
      i = next
    }
    if (totalSamples != 0 && decoded != totalSamples) return None
    if (decoded == 0) return None
    val all = new Array[Int](decoded.toInt * channels)
    var o = 0
    out.forEach { f => System.arraycopy(f, 0, all, o, f.length); o += f.length }
    Some(PcmClip(sampleRate, channels, bits, all, encoding = "flac"))
  }

  private val BlockSizes = Array(-1, 192, 576, 1152, 2304, 4608, -8, -16,
    256, 512, 1024, 2048, 4096, 8192, 16384, 32768)
  private val SampleRates = Array(0, 88200, 176400, 192000, 8000, 16000,
    22050, 24000, 32000, 44100, 48000, 96000, -8, -16, -160, -1)
  private val SampleSizes = Array(0, 8, 12, -1, 16, 20, 24, 32)

  /** Decode one frame starting at byte `at`; returns (interleaved
    * samples, next byte offset). Verifies CRC-8 and CRC-16. */
  private def decodeFrame(b: Array[Byte], at: Int, siRate: Int,
      siChannels: Int, siBits: Int): (Array[Int], Int) = {
    val r = new Br(b, at, b.length)
    if (r.bits(14) != 0x3ffe) corrupt() // sync
    if (r.bit() != 0) corrupt() // reserved
    r.bit() // blocking strategy (0 fixed / 1 variable): both accepted
    val bsCode = r.bits(4)
    val srCode = r.bits(4)
    val chAssign = r.bits(4)
    val ssCode = r.bits(3)
    if (r.bit() != 0) corrupt() // reserved
    // UTF-8-style coded frame/sample number (value unused; ordering is
    // implicit in byte order here)
    val lead = r.bits(8)
    var follow =
      if (lead < 0x80) 0
      else if (lead >= 0xfe) 6
      else if (lead >= 0xfc) 5
      else if (lead >= 0xf8) 4
      else if (lead >= 0xf0) 3
      else if (lead >= 0xe0) 2
      else if (lead >= 0xc0) 1
      else corrupt() // continuation byte as lead
    while (follow > 0) {
      if ((r.bits(8) & 0xc0) != 0x80) corrupt()
      follow -= 1
    }
    val blockSize = bsCode match {
      case 0 => corrupt()
      case 6 => r.bits(8) + 1
      case 7 => r.bits(16) + 1
      case c => BlockSizes(c)
    }
    srCode match { // rate itself comes from STREAMINFO when code = 0
      case 12 => r.bits(8)
      case 13 | 14 => r.bits(16)
      case 15 => corrupt()
      case _ => ()
    }
    val bits = ssCode match {
      case 0 => siBits
      case 3 => corrupt()
      case c => SampleSizes(c)
    }
    val channels = if (chAssign < 8) chAssign + 1
                   else if (chAssign <= 10) 2
                   else corrupt()
    if (channels != siChannels) corrupt()
    val crc8End = r.bytePos
    if (r.bits(8) != crc8(b, at, crc8End)) corrupt()
    if (blockSize < 1 || blockSize.toLong * channels > MaxSamples) corrupt()

    val chans = new Array[Array[Int]](channels)
    var c = 0
    while (c < channels) {
      val extra = chAssign match {
        case 8 => if (c == 1) 1 else 0 // left/side: side is ch 1
        case 9 => if (c == 0) 1 else 0 // right/side: side is ch 0
        case 10 => if (c == 1) 1 else 0 // mid/side: side is ch 1
        case _ => 0
      }
      chans(c) = decodeSubframe(r, blockSize, bits + extra)
      c += 1
    }
    r.align()
    val crc16End = r.bytePos
    if (r.bits(16) != crc16(b, at, crc16End)) corrupt()

    // undo stereo decorrelation
    chAssign match {
      case 8 => // left/side: right = left - side
        var k = 0
        while (k < blockSize) { chans(1)(k) = chans(0)(k) - chans(1)(k); k += 1 }
      case 9 => // right/side: left = right + side
        var k = 0
        while (k < blockSize) {
          val side = chans(0)(k)
          chans(0)(k) = chans(1)(k) + side
          k += 1
        }
      case 10 => // mid/side, the libFLAC integer spelling
        var k = 0
        while (k < blockSize) {
          val side = chans(1)(k)
          var mid = chans(0)(k) << 1
          mid |= (side & 1)
          chans(0)(k) = (mid + side) >> 1
          chans(1)(k) = (mid - side) >> 1
          k += 1
        }
      case _ => ()
    }
    val inter = new Array[Int](blockSize * channels)
    var k = 0
    while (k < blockSize) {
      var cc = 0
      while (cc < channels) { inter(k * channels + cc) = chans(cc)(k); cc += 1 }
      k += 1
    }
    (inter, (r.pos >> 3).toInt)
  }

  private def decodeSubframe(r: Br, n: Int, bps: Int): Array[Int] = {
    if (r.bit() != 0) corrupt() // zero pad bit
    val typ = r.bits(6)
    var wasted = 0
    if (r.bit() == 1) wasted = 1 + r.unary()
    val eb = bps - wasted
    if (eb < 1 || eb > 33) corrupt()
    val out = new Array[Int](n)
    if (typ == 0) { // CONSTANT
      val v = r.signed(eb)
      java.util.Arrays.fill(out, v)
    } else if (typ == 1) { // VERBATIM
      var k = 0
      while (k < n) { out(k) = r.signed(eb); k += 1 }
    } else if ((typ & 0x38) == 0x08 && (typ & 7) <= 4) { // FIXED 0..4
      val order = typ & 7
      if (order > n) corrupt()
      var k = 0
      while (k < order) { out(k) = r.signed(eb); k += 1 }
      decodeResidual(r, n, order, out)
      k = order
      while (k < n) {
        val p: Long = order match {
          case 0 => 0L
          case 1 => out(k - 1).toLong
          case 2 => 2L * out(k - 1) - out(k - 2)
          case 3 => 3L * out(k - 1) - 3L * out(k - 2) + out(k - 3)
          case _ => 4L * out(k - 1) - 6L * out(k - 2) + 4L * out(k - 3) - out(k - 4)
        }
        val v = p + out(k)
        if (v < Int.MinValue || v > Int.MaxValue) corrupt()
        out(k) = v.toInt
        k += 1
      }
    } else if ((typ & 0x20) != 0) { // LPC, order 1..32
      val order = (typ & 0x1f) + 1
      if (order > n) corrupt()
      var k = 0
      while (k < order) { out(k) = r.signed(eb); k += 1 }
      val precision = r.bits(4) + 1
      if (precision > 15) corrupt() // 4-bit field 1111 is invalid
      val shift = r.signed(5)
      if (shift < 0) corrupt() // negative shifts are not used
      val coef = new Array[Int](order)
      k = 0
      while (k < order) { coef(k) = r.signed(precision); k += 1 }
      decodeResidual(r, n, order, out)
      k = order
      while (k < n) {
        var acc = 0L
        var j = 0
        while (j < order) { acc += coef(j).toLong * out(k - 1 - j); j += 1 }
        val v = (acc >> shift) + out(k)
        if (v < Int.MinValue || v > Int.MaxValue) corrupt()
        out(k) = v.toInt
        k += 1
      }
    } else corrupt() // reserved subframe types
    if (wasted > 0) {
      var k = 0
      while (k < n) { out(k) = out(k) << wasted; k += 1 }
    }
    out
  }

  /** Rice-coded residual into out(order until n): 2-bit method, 4-bit
    * partition order, per-partition parameter (escape = raw n-bit). */
  private def decodeResidual(r: Br, n: Int, order: Int, out: Array[Int]): Unit = {
    val method = r.bits(2)
    if (method > 1) corrupt()
    val pBits = if (method == 0) 4 else 5
    val escape = (1 << pBits) - 1
    val po = r.bits(4)
    if ((n >> po) << po != n) corrupt() // block size must divide evenly
    val partSize = n >> po
    var k = order
    var part = 0
    while (part < (1 << po)) {
      val count = if (part == 0) partSize - order else partSize
      if (count < 0) corrupt()
      val param = r.bits(pBits)
      if (param == escape) {
        val raw = r.bits(5)
        var j = 0
        while (j < count) { out(k) = if (raw == 0) 0 else r.signed(raw); k += 1; j += 1 }
      } else {
        var j = 0
        while (j < count) {
          val q = r.unary()
          if (q.toLong << param > Int.MaxValue) corrupt()
          val v = (q << param) | (if (param == 0) 0 else r.bits(param))
          out(k) = (v >>> 1) ^ -(v & 1) // zigzag
          k += 1; j += 1
        }
      }
      part += 1
    }
    if (k != n) corrupt()
  }

  // ------------------------------------------------------------- encode

  private final class Bw {
    private val buf = new java.io.ByteArrayOutputStream()
    private var acc = 0L
    private var nb = 0
    def put(v: Long, n: Int): Unit = { // MSB-first
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >> i) & 1)
        nb += 1
        if (nb == 8) { buf.write((acc & 0xff).toInt); acc = 0; nb = 0 }
        i -= 1
      }
    }
    def putSigned(v: Int, n: Int): Unit = put(v.toLong & ((1L << n) - 1), n)
    def alignZero(): Unit = if (nb > 0) put(0, 8 - nb)
    def toBytes: Array[Byte] = { require(nb == 0); buf.toByteArray }
  }

  /** Subframe spellings the encoder can be forced into (dual-spelling
    * agreement tests): "auto" picks constant-else-fixed2; "verbatim";
    * "fixed0".."fixed4"; "lpc2" writes an LPC subframe whose quantized
    * coefficients (2, −1, shift 0) replicate fixed order 2 through the
    * structurally different LPC bitstream path. */
  def encodeFlac(sampleRate: Int, channels: Int, bits: Int,
      samples: Array[Int], blockSize: Int = 1024,
      spelling: String = "auto", stereo: String = "independent"): Array[Byte] = {
    require(sampleRate >= 1 && sampleRate < (1 << 20) && channels >= 1 &&
      channels <= 8 && bits >= 4 && bits <= 32 &&
      samples.length % channels == 0 && blockSize >= 16 && blockSize <= 65535)
    require(stereo == "independent" || channels == 2, "decorrelation needs stereo")
    val nFrames = samples.length / channels
    require(nFrames > 0)
    val lim = 1L << (bits - 1)
    samples.foreach(v => require(v >= -lim && v < lim, s"sample $v exceeds $bits bits"))

    val out = new java.io.ByteArrayOutputStream()
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    // STREAMINFO, last-metadata flag set
    val si = new Bw
    si.put(blockSize, 16); si.put(blockSize, 16) // min/max block size
    si.put(0, 24); si.put(0, 24) // min/max frame size unknown
    si.put(sampleRate, 20); si.put(channels - 1, 3); si.put(bits - 1, 5)
    si.put(nFrames.toLong, 36)
    si.put(0, 128) // MD5 unknown
    val siBytes = si.toBytes
    out.write(0x80); out.write(0); out.write(0); out.write(siBytes.length)
    out.write(siBytes, 0, siBytes.length)

    var frameNo = 0
    var off = 0
    while (off < nFrames) {
      val bs = math.min(blockSize, nFrames - off)
      val w = new Bw
      w.put(0x3ffe, 14); w.put(0, 1); w.put(0, 1) // sync, reserved, fixed blocking
      w.put(7, 4) // block size: 16-bit value follows header
      w.put(0, 4) // sample rate: from STREAMINFO
      val chAssign = stereo match {
        case "independent" => channels - 1
        case "ls" => 8
        case "rs" => 9
        case "ms" => 10
        case other => throw new IllegalArgumentException(other)
      }
      w.put(chAssign, 4)
      val ssCode = bits match {
        case 8 => 1
        case 12 => 2
        case 16 => 4
        case 20 => 5
        case 24 => 6
        case 32 => 7
        case _ => 0 // from STREAMINFO
      }
      w.put(ssCode, 3); w.put(0, 1)
      // UTF-8 coded frame number
      if (frameNo < 0x80) w.put(frameNo, 8)
      else { // two-byte form covers every fixture (< 2048 frames)
        require(frameNo < 0x800)
        w.put(0xc0 | (frameNo >> 6), 8); w.put(0x80 | (frameNo & 0x3f), 8)
      }
      w.put(bs - 1, 16)
      val headBytes = w.toBytes // aligned: 4 + utf8 + 2 bytes
      w.put(crc8(headBytes, 0, headBytes.length), 8)

      // channel planes under the chosen decorrelation
      val planes = new Array[Array[Int]](channels)
      val planeBits = new Array[Int](channels)
      if (stereo == "independent") {
        var c = 0
        while (c < channels) {
          val p = new Array[Int](bs)
          var k = 0
          while (k < bs) { p(k) = samples((off + k) * channels + c); k += 1 }
          planes(c) = p; planeBits(c) = bits
          c += 1
        }
      } else {
        val l = new Array[Int](bs)
        val rr = new Array[Int](bs)
        var k = 0
        while (k < bs) {
          l(k) = samples((off + k) * 2)
          rr(k) = samples((off + k) * 2 + 1)
          k += 1
        }
        stereo match {
          case "ls" =>
            planes(0) = l
            planes(1) = Array.tabulate(bs)(k => l(k) - rr(k))
            planeBits(0) = bits; planeBits(1) = bits + 1
          case "rs" =>
            planes(0) = Array.tabulate(bs)(k => l(k) - rr(k))
            planes(1) = rr
            planeBits(0) = bits + 1; planeBits(1) = bits
          case _ => // ms
            planes(0) = Array.tabulate(bs)(k => (l(k) + rr(k)) >> 1)
            planes(1) = Array.tabulate(bs)(k => l(k) - rr(k))
            planeBits(0) = bits; planeBits(1) = bits + 1
        }
      }
      var c = 0
      while (c < channels) {
        writeSubframe(w, planes(c), planeBits(c), spelling)
        c += 1
      }
      w.alignZero()
      val bodyBytes = w.toBytes
      w.put(crc16(bodyBytes, 0, bodyBytes.length), 16)
      val frameBytes = w.toBytes
      out.write(frameBytes, 0, frameBytes.length)
      frameNo += 1
      off += bs
    }
    out.toByteArray
  }

  private def writeSubframe(w: Bw, p: Array[Int], bps: Int,
      spelling: String): Unit = {
    val n = p.length
    val constant = p.forall(_ == p(0))
    val sp = if (spelling == "auto") {
      if (constant) "constant" else "fixed2"
    } else spelling
    w.put(0, 1) // pad
    sp match {
      case "constant" =>
        w.put(0, 6); w.put(0, 1) // type, no wasted bits
        w.putSigned(p(0), bps)
      case "verbatim" =>
        w.put(1, 6); w.put(0, 1)
        p.foreach(v => w.putSigned(v, bps))
      case s if s.startsWith("fixed") =>
        val order = s.drop(5).toInt
        require(order >= 0 && order <= 4 && order <= n)
        w.put(0x08 | order, 6); w.put(0, 1)
        var k = 0
        while (k < order) { w.putSigned(p(k), bps); k += 1 }
        writeResidual(w, fixedResidual(p, order), bps)
      case "lpc2" =>
        require(n >= 2)
        // order-2 LPC with coeffs (2, −1), precision 5, shift 0 — the
        // same arithmetic as fixed order 2 through the LPC wire format
        w.put(0x20 | (2 - 1), 6); w.put(0, 1)
        w.putSigned(p(0), bps); w.putSigned(p(1), bps)
        w.put(5 - 1, 4) // precision
        w.putSigned(0, 5) // shift
        w.putSigned(2, 5); w.putSigned(-1, 5)
        writeResidual(w, fixedResidual(p, 2), bps)
      case other => throw new IllegalArgumentException(other)
    }
  }

  private def fixedResidual(p: Array[Int], order: Int): Array[Int] = {
    val n = p.length
    val res = new Array[Int](n - order)
    var k = order
    while (k < n) {
      val pred: Long = order match {
        case 0 => 0L
        case 1 => p(k - 1).toLong
        case 2 => 2L * p(k - 1) - p(k - 2)
        case 3 => 3L * p(k - 1) - 3L * p(k - 2) + p(k - 3)
        case _ => 4L * p(k - 1) - 6L * p(k - 2) + 4L * p(k - 3) - p(k - 4)
      }
      val e = p(k) - pred
      require(e >= Int.MinValue && e <= Int.MaxValue)
      res(k - order) = e.toInt
      k += 1
    }
    res
  }

  /** Single-partition rice residual (method 0), parameter chosen by
    * exhaustive size minimization; falls back to the escape code when
    * residuals exceed what rice can carry cheaply. */
  private def writeResidual(w: Bw, res: Array[Int], bps: Int): Unit = {
    w.put(0, 2) // method 0: 4-bit params
    w.put(0, 4) // partition order 0
    val zz = res.map(v => (v << 1) ^ (v >> 31)) // zigzag, matches decode
    var best = -1
    var bestBits = Long.MaxValue
    var param = 0
    while (param <= 14) {
      var total = 0L
      var i = 0
      while (i < zz.length && total < bestBits) {
        total += (zz(i) >>> param) + 1 + param
        i += 1
      }
      if (total < bestBits) { bestBits = total; best = param }
      param += 1
    }
    // Escape if rice would explode (enormous quotients). The rice
    // escape's width field is 5 bits, so the widest legal raw residual
    // is 31 bits — put(32, 5) would truncate to 0 and desync the
    // stream. 31-bit signed covers every residual this encoder can
    // produce (fixed predictors over ≤24-bit samples).
    val rawBits = 31
    require(rawBits <= 31, "rice escape width field is 5 bits")
    if (bestBits > zz.length.toLong * (rawBits + 2)) {
      w.put(15, 4); w.put(rawBits, 5)
      res.foreach(v => w.putSigned(v, rawBits))
    } else {
      w.put(best, 4)
      zz.foreach { v =>
        val q = v >>> best
        var i = 0
        while (i < q) { w.put(0, 1); i += 1 }
        w.put(1, 1)
        if (best > 0) w.put(v & ((1 << best) - 1), best)
      }
    }
  }
}
