package graft.operators

/** From-scratch WebP LOSSLESS (VP8L) decode — no codec library. VP8L is
  * a Huffman+LZ77-class format (the same family as DEFLATE/GIF, not the
  * DCT family), so the full pixel layer is implementable from the public
  * "WebP Lossless Bitstream Specification":
  *
  *  - LSB-first bit reader over the `VP8L` chunk of the RIFF/WEBP
  *    container; 14-bit dimensions, version 0.
  *  - Entropy layer: canonical prefix codes (DEFLATE bit order), both
  *    "simple" (1–2 symbol) and normal (code-length-coded, with the
  *    kCodeLengthCodeOrder permutation, repeat codes 16/17/18, and the
  *    optional max-symbol cutoff); meta-prefix image selecting per-block
  *    code groups; color cache (1–11 bits, 0x1e35a7bd multiplicative
  *    hash); LZ77 backward references with the 24/40-entry prefix coding
  *    and the 120-entry 2D distance neighborhood map.
  *  - All four transforms, inverted in reverse read order: PREDICTOR
  *    (14 modes, spec edge rules), COLOR (ColorTransformDelta fixed-point
  *    deltas), SUBTRACT_GREEN, and COLOR_INDEXING (delta-coded palette +
  *    sub-byte pixel packing), each sub-image decoded recursively as an
  *    entropy-coded image.
  *
  * Lossy WebP (`VP8 ` chunks — boolean-arithmetic-coded DCT) routes to
  * the from-scratch intra keyframe decoder in [[Vp8Codec]] (round 18);
  * `VP8X` extended STILL images decode through whichever stream they
  * carry. Animated WebP is a VIDEO, not a still: this entry point
  * refuses it, and [[VideoCodec.decodeSampled]] composites its ANMF
  * frames (round 18) using [[decodeVp8lArgb]] / [[decodeAlph]] below.
  * Anything malformed decodes to None, never an exception.
  *
  * The encoder (fixtures + round-trip tests) writes literal-coded VP8L:
  * complete 8-bit prefix codes for G/R/B described through the
  * code-length machinery (so the decoder's normal-code path is what the
  * fixtures exercise), a simple 1-symbol alpha/distance code, and
  * optionally the SUBTRACT_GREEN transform. Lossless → exact pixel
  * round-trip, so closed-form oracles hold bit-for-bit.
  *
  * Reference capability: multimodal feature extraction over binary
  * columns (BASELINE.md north star).
  */
object WebpCodec {
  import PixelCodec.PixelImage

  private val MaxPixels = 1 << 26

  private final class Corrupt extends RuntimeException(null, null, false, false)
  private def corrupt(): Nothing = throw new Corrupt

  // ------------------------------------------------------------- bit io

  private final class BitReader(b: Array[Byte], start: Int, end: Int) {
    private var pos = start.toLong * 8
    private val limit = end.toLong * 8
    def read(n: Int): Int = { // LSB-first, n ≤ 24
      if (pos + n > limit) corrupt()
      var v = 0
      var i = 0
      while (i < n) {
        val p = pos + i
        v |= (((b((p >> 3).toInt) >> (p & 7).toInt) & 1) << i)
        i += 1
      }
      pos += n
      v
    }
  }

  // --------------------------------------------------------- huffman

  /** Canonical prefix decoder, DEFLATE bit order: walk MSB-first code
    * bits pulled one at a time from the LSB-first stream. A code with a
    * single symbol consumes zero bits (the VP8L simple-code degenerate
    * case and its normal-code equivalent). */
  private final class Huff(lengths: Array[Int], symbols: Array[Int]) {
    // built from (length, symbol) pairs sorted by (length, symbol)
    val mincode = new Array[Int](16)
    val maxcode = new Array[Int](16)
    val valptr = new Array[Int](16)
    val single: Int = if (symbols.length == 1) symbols(0) else -1
    locally {
      java.util.Arrays.fill(maxcode, -1)
      if (single < 0) {
        var code = 0
        var k = 0
        var l = 1
        while (l <= 15) {
          var n = 0
          while (k + n < lengths.length && lengths(k + n) == l) n += 1
          if (n > 0) {
            valptr(l) = k
            mincode(l) = code
            code += n; k += n
            maxcode(l) = code - 1
          }
          code <<= 1
          l += 1
        }
        // the code must be complete (Kraft sum exactly 1): an
        // over/under-subscribed description is a corrupt stream
        if (k != lengths.length || code != (1 << 16)) corrupt()
      }
    }
    def decode(r: BitReader): Int = {
      if (single >= 0) return single
      var code = r.read(1)
      var l = 1
      while (maxcode(l) < code || maxcode(l) == -1) {
        l += 1
        if (l > 15) corrupt()
        code = (code << 1) | r.read(1)
      }
      symbols(valptr(l) + code - mincode(l))
    }
  }

  private object Huff {
    /** From a per-symbol length array (0 = absent). */
    def fromLengths(lens: Array[Int]): Huff = {
      var n = 0
      var i = 0
      while (i < lens.length) { if (lens(i) > 0) n += 1; i += 1 }
      if (n == 0) corrupt()
      val pairs = new Array[Long](n)
      var k = 0
      i = 0
      while (i < lens.length) {
        if (lens(i) > 0) {
          if (lens(i) > 15) corrupt()
          pairs(k) = lens(i).toLong << 32 | i; k += 1
        }
        i += 1
      }
      java.util.Arrays.sort(pairs)
      new Huff(pairs.map(p => (p >> 32).toInt), pairs.map(_.toInt))
    }
    def singleSymbol(sym: Int): Huff = new Huff(Array(0), Array(sym))
  }

  private val CodeLengthOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** One prefix code, "simple" or code-length-coded (spec §6.2). */
  private def readCode(r: BitReader, alphabetSize: Int): Huff = {
    if (r.read(1) == 1) { // simple: 1 or 2 symbols
      val numSymbols = r.read(1) + 1
      val firstWide = r.read(1) // 0 → 1-bit first symbol, 1 → 8-bit
      val s0 = r.read(if (firstWide == 1) 8 else 1)
      if (numSymbols == 1) {
        if (s0 >= alphabetSize) corrupt()
        Huff.singleSymbol(s0)
      } else {
        val s1 = r.read(8)
        if (s0 >= alphabetSize || s1 >= alphabetSize || s0 == s1) corrupt()
        val lens = new Array[Int](alphabetSize)
        lens(s0) = 1; lens(s1) = 1
        Huff.fromLengths(lens)
      }
    } else { // normal: code lengths coded with the CL code
      val numCl = r.read(4) + 4
      if (numCl > CodeLengthOrder.length) corrupt()
      val clLens = new Array[Int](19)
      var i = 0
      while (i < numCl) { clLens(CodeLengthOrder(i)) = r.read(3); i += 1 }
      val cl = Huff.fromLengths(clLens)
      val maxSymbol =
        if (r.read(1) == 1) {
          val nbits = 2 + 2 * r.read(3)
          val m = 2 + r.read(nbits)
          if (m > alphabetSize) corrupt()
          m
        } else alphabetSize
      val lens = new Array[Int](alphabetSize)
      var sym = 0
      var prev = 8 // spec: repeats of a nonzero length default to 8
      var read = 0
      while (sym < alphabetSize && read < maxSymbol) {
        val c = cl.decode(r)
        read += 1
        c match {
          case l if l < 16 =>
            lens(sym) = l; sym += 1
            if (l != 0) prev = l
          case 16 =>
            val rep = 3 + r.read(2)
            if (sym + rep > alphabetSize) corrupt()
            var j = 0
            while (j < rep) { lens(sym) = prev; sym += 1; j += 1 }
          case 17 =>
            sym += 3 + r.read(3)
            if (sym > alphabetSize) corrupt()
          case _ =>
            sym += 11 + r.read(7)
            if (sym > alphabetSize) corrupt()
        }
      }
      Huff.fromLengths(lens)
    }
  }

  // ------------------------------------------------------- lz77 tables

  /** 2D distance neighborhood for distance codes 1..120 (spec §5.2.2):
    * dist = dy·width + dx, floored at 1. */
  private val DistMap: Array[Int] = { // packed (dx+8) | dy<<8
    val raw = Array(
      (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
      (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
      (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
      (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
      (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
      (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
      (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
      (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
      (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
      (0, 7), (7, 0), (1, 7), (-1, 7), (4, 6), (-4, 6), (6, 4), (-6, 4),
      (7, 1), (-7, 1), (2, 7), (-2, 7), (7, 2), (-7, 2), (3, 7), (-3, 7),
      (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5), (8, 0), (4, 7),
      (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6), (-6, 6), (2, 8),
      (-2, 8), (7, 5), (-7, 5), (5, 7), (-5, 7), (8, 3), (5, 8), (-5, 8),
      (8, 4), (6, 7), (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7),
      (8, 6), (8, 7))
    raw.map { case (dx, dy) => (dx + 8) | (dy << 8) }
  }

  /** LZ77 length/distance prefix coding (spec §5.2.1). */
  private def prefixValue(r: BitReader, code: Int): Int =
    if (code < 4) code + 1
    else {
      val extra = (code - 2) >> 1
      val offset = (2 + (code & 1)) << extra
      offset + r.read(extra) + 1
    }

  // ----------------------------------------------------------- decode

  private def subSampleSize(size: Int, bits: Int): Int =
    (size + (1 << bits) - 1) >> bits

  /** Decoded entropy image + geometry of one transform, kept for the
    * inverse pass. */
  private final case class Transform(kind: Int, bits: Int,
      data: Array[Int], // sub-image pixels (predictor/color/palette)
      imgW: Int, imgH: Int) // geometry the transform applies at

  def decode(b: Array[Byte]): Option[PixelImage] = {
    try decodeImpl(b)
    catch {
      case _: Corrupt => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }
  }

  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
  private def tag(b: Array[Byte], i: Int, t: String): Boolean =
    b(i) == t.charAt(0) && b(i + 1) == t.charAt(1) &&
      b(i + 2) == t.charAt(2) && b(i + 3) == t.charAt(3)

  /** True when the still-image decode path for these bytes is the lossy
    * 'VP8 ' keyframe decoder ([[Vp8Codec]]) — whose two large default
    * probability tables are self-consistent rather than offline-verified
    * (see the HONESTY NOTE there). Callers surface this as the distinct
    * decoder label `webp-vp8-unverified-probs` so a pipeline consumer
    * can filter or discount lossy-VP8 rows instead of trusting silently
    * possibly-nonconformant pixels. Header walk only; never throws. */
  def isLossyVp8Still(b: Array[Byte]): Boolean = try {
    if (b == null || b.length < 30) return false
    if (!tag(b, 0, "RIFF") || !tag(b, 8, "WEBP")) return false
    var i = 12
    while (i + 8 <= b.length) {
      val size = le32(b, i + 4)
      if (size < 0 || i + 8 + size.toLong > b.length) return false
      if (tag(b, i, "VP8L")) return false
      if (tag(b, i, "VP8 ")) return true
      i += 8 + size + (size & 1)
    }
    false
  } catch { case _: Exception => false }

  private def decodeImpl(b: Array[Byte]): Option[PixelImage] = {
    if (b == null || b.length < 30) return None
    if (!tag(b, 0, "RIFF") || !tag(b, 8, "WEBP")) return None
    // chunk walk: VP8L → lossless path below; 'VP8 ' → the lossy VP8
    // keyframe decoder ([[Vp8Codec]]). A 'VP8X' header chunk is walked
    // past, so extended STILL images decode through whichever stream
    // they carry (their ALPH plane, if any, is ignored — PixelImage is
    // RGB); animations (frames nested inside ANMF) stay refused.
    var i = 12
    var off = -1
    var len = 0
    while (off < 0 && i + 8 <= b.length) {
      val size = le32(b, i + 4)
      if (size < 0 || i + 8 + size.toLong > b.length) return None
      if (tag(b, i, "VP8L")) { off = i + 8; len = size }
      else if (tag(b, i, "VP8 ")) return Vp8Codec.decodeFrame(b, i + 8, size)
      else i += 8 + size + (size & 1)
    }
    if (off < 0) return None
    decodeVp8lArgb(b, off, len).map { case (w, h, argb) =>
      val out = new Array[Byte](w * h * 3)
      var k = 0
      while (k < w * h) {
        out(k * 3) = ((argb(k) >> 16) & 0xff).toByte
        out(k * 3 + 1) = ((argb(k) >> 8) & 0xff).toByte
        out(k * 3 + 2) = (argb(k) & 0xff).toByte
        k += 1
      }
      PixelImage(w, h, out)
    }
  }

  /** Decode a complete VP8L chunk payload (signature byte + 28-bit
    * header + image-stream) to (width, height, ARGB pixels) — the
    * alpha-preserving entry the animated-WebP compositor needs
    * ([[VideoCodec]] ANMF frames blend by their own alpha). None on
    * anything malformed. */
  private[operators] def decodeVp8lArgb(b: Array[Byte], off: Int,
      len: Int): Option[(Int, Int, Array[Int])] = {
    try {
      if (len < 5 || (b(off) & 0xff) != 0x2f) return None // VP8L signature
      val r = new BitReader(b, off + 1, off + len)
      val w = r.read(14) + 1
      val h = r.read(14) + 1
      r.read(1) // alpha hint
      if (r.read(3) != 0) return None // version
      if (w.toLong * h > MaxPixels) return None
      Some((w, h, decodeVp8lStream(r, w, h)))
    } catch {
      case _: Corrupt => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }
  }

  /** One VP8L image-stream of KNOWN dimensions: optional transforms +
    * entropy-coded image + inverse transforms. Shared by the full VP8L
    * chunk (explicit 14-bit dims) and the ALPH chunk's lossless tier
    * (implicit dims — the container spec's "image-stream of implicit
    * dimension"). Throws [[Corrupt]] on malformed input. */
  private def decodeVp8lStream(r: BitReader, w: Int, h: Int): Array[Int] = {
    // transforms (level 0 only), read order recorded for inverse
    val transforms = new scala.collection.mutable.ArrayBuffer[Transform]()
    var curW = w // COLOR_INDEXING packs pixels and narrows the coded image
    var seen = 0
    while (r.read(1) == 1) {
      val kind = r.read(2)
      if ((seen & (1 << kind)) != 0) corrupt() // each transform at most once
      seen |= 1 << kind
      kind match {
        case 0 | 1 => // PREDICTOR / COLOR: block-mode sub-image
          val bits = r.read(3) + 2
          val sw = subSampleSize(curW, bits)
          val sh = subSampleSize(h, bits)
          transforms += Transform(kind, bits,
            decodeEntropyImage(r, sw, sh), curW, h)
        case 2 => // SUBTRACT_GREEN: no payload
          transforms += Transform(2, 0, null, curW, h)
        case _ => // COLOR_INDEXING: delta-coded palette + pixel packing
          val paletteSize = r.read(8) + 1
          val pal = decodeEntropyImage(r, paletteSize, 1)
          var k = 1
          while (k < paletteSize) { // entries are stored as deltas
            pal(k) = addPixels(pal(k), pal(k - 1)); k += 1
          }
          val widthBits =
            if (paletteSize <= 2) 3
            else if (paletteSize <= 4) 2
            else if (paletteSize <= 16) 1
            else 0
          transforms += Transform(3, widthBits, pal, curW, h)
          curW = subSampleSize(curW, widthBits)
      }
    }

    var argb = decodeEntropyImage(r, curW, h, allowMeta = true)

    // inverse transforms, reverse read order
    var t = transforms.length - 1
    var aw = curW
    while (t >= 0) {
      val tr = transforms(t)
      tr.kind match {
        case 0 => inversePredictor(argb, tr.imgW, tr.imgH, tr.data, tr.bits)
        case 1 => inverseColorTransform(argb, tr.imgW, tr.imgH, tr.data, tr.bits)
        case 2 =>
          var k = 0
          while (k < argb.length) {
            val p = argb(k)
            val g = (p >> 8) & 0xff
            val nr = (((p >> 16) & 0xff) + g) & 0xff
            val nb = ((p & 0xff) + g) & 0xff
            argb(k) = (p & 0xff00ff00) | (nr << 16) | nb
            k += 1
          }
        case _ =>
          argb = inverseColorIndexing(argb, aw, tr.imgW, tr.imgH,
            tr.data, tr.bits)
          aw = tr.imgW
      }
      t -= 1
    }
    if (aw != w) corrupt()
    argb
  }

  /** Decode an ALPH chunk payload into a w·h alpha plane (container
    * spec: 1 header byte — 2 reserved + 2 pre-processing + 2 filtering
    * + 2 compression bits — then either raw bytes or a headerless VP8L
    * image-stream whose GREEN channel carries the alpha values, then
    * the inverse of the per-pixel prediction filter). Pre-processing
    * (level reduction) is an encoder-side lossy step with no decoder
    * inverse. None on anything malformed. */
  private[operators] def decodeAlph(b: Array[Byte], off: Int, len: Int,
      w: Int, h: Int): Option[Array[Byte]] = {
    try {
      if (len < 1 || w <= 0 || h <= 0 || w.toLong * h > MaxPixels) return None
      val hdr = b(off) & 0xff
      if ((hdr >> 6) != 0) return None // reserved bits
      val filter = (hdr >> 2) & 3
      val comp = hdr & 3
      val n = w * h
      val alpha = new Array[Byte](n)
      if (comp == 0) { // raw
        if (len - 1 < n) return None
        System.arraycopy(b, off + 1, alpha, 0, n)
      } else if (comp == 1) { // lossless: headerless image-stream, green channel
        val r = new BitReader(b, off + 1, off + len)
        val argb = decodeVp8lStream(r, w, h)
        var i = 0
        while (i < n) { alpha(i) = ((argb(i) >> 8) & 0xff).toByte; i += 1 }
      } else return None
      // inverse prediction filter: stored value is (actual - pred) mod 256.
      // Edge rule (container spec): (0,0) predicts from 0; the rest of the
      // top row predicts from the left; the rest of the left column
      // predicts from above; interior per the filter method.
      if (filter != 0) {
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val pred =
              if (x == 0 && y == 0) 0
              else if (y == 0) alpha(x - 1) & 0xff
              else if (x == 0) alpha((y - 1) * w) & 0xff
              else filter match {
                case 1 => alpha(y * w + x - 1) & 0xff // horizontal: L
                case 2 => alpha((y - 1) * w + x) & 0xff // vertical: T
                case _ => // gradient: clip(L + T - TL)
                  val v = (alpha(y * w + x - 1) & 0xff) +
                    (alpha((y - 1) * w + x) & 0xff) -
                    (alpha((y - 1) * w + x - 1) & 0xff)
                  if (v < 0) 0 else if (v > 255) 255 else v
              }
            alpha(y * w + x) = (((alpha(y * w + x) & 0xff) + pred) & 0xff).toByte
            x += 1
          }
          y += 1
        }
      }
      Some(alpha)
    } catch {
      case _: Corrupt => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }
  }

  /** Decode one entropy-coded ARGB image (spec §5): the main image
    * (allowMeta) or a transform/meta/palette sub-image. */
  private def decodeEntropyImage(r: BitReader, w: Int, h: Int,
      allowMeta: Boolean = false): Array[Int] = {
    if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) corrupt()
    val cacheBits = if (r.read(1) == 1) {
      val cb = r.read(4)
      if (cb < 1 || cb > 11) corrupt()
      cb
    } else 0
    val cache = if (cacheBits > 0) new Array[Int](1 << cacheBits) else null

    var metaImg: Array[Int] = null
    var metaBits = 0
    var numGroups = 1
    if (allowMeta && r.read(1) == 1) {
      metaBits = r.read(3) + 2
      metaImg = decodeEntropyImage(r, subSampleSize(w, metaBits),
        subSampleSize(h, metaBits))
      var m = 0
      var k = 0
      while (k < metaImg.length) {
        val g = (metaImg(k) >> 8) & 0xffff
        if (g > m) m = g
        k += 1
      }
      numGroups = m + 1
      if (numGroups > 256) corrupt() // sanity bound for fixtures
    }
    val greenAlpha = 256 + 24 + (if (cacheBits > 0) 1 << cacheBits else 0)
    val groups = Array.fill(numGroups) {
      Array(readCode(r, greenAlpha), readCode(r, 256), readCode(r, 256),
        readCode(r, 256), readCode(r, 40))
    }

    val out = new Array[Int](w * h)
    val metaW = if (metaImg != null) subSampleSize(w, metaBits) else 0
    var pos = 0
    while (pos < out.length) {
      val x = pos % w
      val y = pos / w
      val grp =
        if (metaImg == null) groups(0)
        else {
          val gi = (metaImg((y >> metaBits) * metaW + (x >> metaBits)) >> 8) & 0xffff
          groups(gi)
        }
      val s = grp(0).decode(r)
      if (s < 256) { // literal: G, R, B, A
        val red = grp(1).decode(r)
        val blue = grp(2).decode(r)
        val alpha = grp(3).decode(r)
        val px = (alpha << 24) | (red << 16) | (s << 8) | blue
        out(pos) = px
        if (cache != null)
          cache((0x1e35a7bd * px) >>> (32 - cacheBits)) = px
        pos += 1
      } else if (s < 256 + 24) { // LZ77 backreference
        val length = prefixValue(r, s - 256)
        val distCode = prefixValue(r, grp(4).decode(r))
        val dist0 =
          if (distCode > 120) distCode - 120
          else {
            val m = DistMap(distCode - 1)
            val dx = (m & 0xff) - 8
            val dy = m >> 8
            val d = dy * w + dx
            if (d < 1) 1 else d
          }
        if (dist0 > pos || pos + length > out.length) corrupt()
        var j = 0
        while (j < length) {
          out(pos) = out(pos - dist0)
          if (cache != null)
            cache((0x1e35a7bd * out(pos)) >>> (32 - cacheBits)) = out(pos)
          pos += 1
          j += 1
        }
      } else { // color-cache reference
        if (cache == null) corrupt()
        val idx = s - 256 - 24
        if (idx >= cache.length) corrupt()
        out(pos) = cache(idx)
        pos += 1
      }
    }
    out
  }

  // ------------------------------------------------- inverse transforms

  private def addPixels(a: Int, b: Int): Int = {
    val aa = (((a >>> 24) + (b >>> 24)) & 0xff) << 24
    val rr = ((((a >> 16) & 0xff) + ((b >> 16) & 0xff)) & 0xff) << 16
    val gg = ((((a >> 8) & 0xff) + ((b >> 8) & 0xff)) & 0xff) << 8
    val bb = ((a & 0xff) + (b & 0xff)) & 0xff
    aa | rr | gg | bb
  }

  private def average2(a: Int, b: Int): Int =
    (((a ^ b) & 0xfefefefe) >>> 1) + (a & b) // per-channel (a+b)/2

  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  private def clampAddSubtractFull(a: Int, b: Int, c: Int): Int = {
    def ch(sh: Int): Int =
      clamp255(((a >>> sh) & 0xff) + ((b >>> sh) & 0xff) - ((c >>> sh) & 0xff))
    (ch(24) << 24) | (ch(16) << 16) | (ch(8) << 8) | ch(0)
  }

  private def clampAddSubtractHalf(ave: Int, c: Int): Int = {
    def ch(sh: Int): Int = {
      val a = (ave >>> sh) & 0xff
      clamp255(a + (a - ((c >>> sh) & 0xff)) / 2)
    }
    (ch(24) << 24) | (ch(16) << 16) | (ch(8) << 8) | ch(0)
  }

  private def select(l: Int, t: Int, tl: Int): Int = {
    def ch(p: Int, sh: Int): Int = (p >>> sh) & 0xff
    var pl = 0
    var pt = 0
    var sh = 0
    while (sh < 32) {
      val pred = ch(l, sh) + ch(t, sh) - ch(tl, sh)
      pl += math.abs(pred - ch(l, sh))
      pt += math.abs(pred - ch(t, sh))
      sh += 8
    }
    if (pl < pt) l else t
  }

  private def inversePredictor(px: Array[Int], w: Int, h: Int,
      modes: Array[Int], bits: Int): Unit = {
    val mw = subSampleSize(w, bits)
    var pos = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val pred =
          if (x == 0 && y == 0) 0xff000000
          else if (y == 0) px(pos - 1) // first row: L
          else if (x == 0) px(pos - w) // first column: T
          else {
            val mode = (modes((y >> bits) * mw + (x >> bits)) >> 8) & 0xff
            val l = px(pos - 1)
            val t = px(pos - w)
            val tl = px(pos - w - 1)
            val tr = px(pos - w + 1) // x=w-1 → current row's first pixel
            mode match {
              case 0 => 0xff000000
              case 1 => l
              case 2 => t
              case 3 => tr
              case 4 => tl
              case 5 => average2(average2(l, tr), t)
              case 6 => average2(l, tl)
              case 7 => average2(l, t)
              case 8 => average2(tl, t)
              case 9 => average2(t, tr)
              case 10 => average2(average2(l, tl), average2(t, tr))
              case 11 => select(l, t, tl)
              case 12 => clampAddSubtractFull(l, t, tl)
              case 13 => clampAddSubtractHalf(average2(l, t), tl)
              case _ => corrupt()
            }
          }
        px(pos) = addPixels(px(pos), pred)
        pos += 1
        x += 1
      }
      y += 1
    }
  }

  private def colorTransformDelta(t: Int, c: Int): Int =
    (t.toByte.toInt * c.toByte.toInt) >> 5

  private def inverseColorTransform(px: Array[Int], w: Int, h: Int,
      elems: Array[Int], bits: Int): Unit = {
    val mw = subSampleSize(w, bits)
    var pos = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val cte = elems((y >> bits) * mw + (x >> bits))
        val g2r = cte & 0xff // blue channel of the element
        val g2b = (cte >> 8) & 0xff
        val r2b = (cte >> 16) & 0xff
        val p = px(pos)
        val g = (p >> 8) & 0xff
        var red = (p >> 16) & 0xff
        var blue = p & 0xff
        red = (red + colorTransformDelta(g2r, g)) & 0xff
        blue = (blue + colorTransformDelta(g2b, g)) & 0xff
        blue = (blue + colorTransformDelta(r2b, red)) & 0xff
        px(pos) = (p & 0xff00ff00) | (red << 16) | blue
        pos += 1
        x += 1
      }
      y += 1
    }
  }

  private def inverseColorIndexing(packed: Array[Int], packedW: Int,
      w: Int, h: Int, palette: Array[Int], widthBits: Int): Array[Int] = {
    val out = new Array[Int](w * h)
    val perByte = 1 << widthBits // pixels packed per green byte
    val idxBits = 8 >> widthBits
    val idxMask = (1 << idxBits) - 1
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val pk = packed(y * packedW + x / perByte)
        val g = (pk >> 8) & 0xff
        val idx = (g >> (idxBits * (x % perByte))) & idxMask
        if (idx >= palette.length) corrupt()
        out(y * w + x) = palette(idx)
        x += 1
      }
      y += 1
    }
    out
  }

  // ----------------------------------------------------------- encode

  private[operators] final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream()
    private var acc = 0L
    private var n = 0
    def writeBits(v: Int, bits: Int): Unit = { // LSB-first value write
      acc |= (v.toLong & ((1L << bits) - 1)) << n
      n += bits
      while (n >= 8) { buf.write((acc & 0xff).toInt); acc >>= 8; n -= 8 }
    }
    def writeCode(code: Int, len: Int): Unit = { // MSB-first code bits
      var i = len - 1
      while (i >= 0) { writeBits((code >> i) & 1, 1); i -= 1 }
    }
    def toBytes: Array[Byte] = {
      if (n > 0) { buf.write((acc & 0xff).toInt) }
      buf.toByteArray
    }
  }

  /** Emit the normal-code description of "all 256 symbols at length 8"
    * (a complete code: 256·2⁻⁸ = 1) through the code-length machinery,
    * so decoding exercises the CL-code + repeat-16/18 paths. The
    * description covers the FULL alphabet (trailing zeros via code 18):
    * the max-symbol field counts CL TOKENS read, not output symbols
    * (spec decode loop), so the clean way to terminate is to assign
    * every alphabet slot. */
  private[operators] def writeByteWideCode(w: BitWriter, alphabetSize: Int): Unit = {
    w.writeBits(0, 1) // not simple
    val needZeroFill = alphabetSize > 256
    if (needZeroFill) {
      // CL code {8→len1, 16→len2, 18→len2} (Kraft ½+¼+¼ = 1); canonical:
      // 8 → '0', 16 → '10', 18 → '11'. Order positions: 18@1, 16@8, 8@11.
      w.writeBits(12 - 4, 4)
      Array(0, 2, 0, 0, 0, 0, 0, 0, 2, 0, 0, 1).foreach(l => w.writeBits(l, 3))
    } else {
      // CL code {8→len1, 16→len1} (Kraft 1); canonical: 8 → '0', 16 → '1'
      w.writeBits(12 - 4, 4)
      Array(0, 0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 1).foreach(l => w.writeBits(l, 3))
    }
    w.writeBits(0, 1) // no token-count cutoff: the alphabet is covered fully
    val (c8, l8) = if (needZeroFill) (0, 1) else (0, 1)
    val (c16, l16) = if (needZeroFill) (2, 2) else (1, 1)
    w.writeCode(c8, l8) // literal length 8 for symbol 0
    var remaining = 255 // symbols 1..255 via repeat-16 (copies prev length)
    while (remaining > 0) {
      val rep = if (remaining - 6 >= 3 || remaining <= 6) math.min(6, remaining)
        else remaining - 3 // never strand a remainder < 3
      w.writeCode(c16, l16); w.writeBits(rep - 3, 2)
      remaining -= rep
    }
    if (needZeroFill) { // zero-fill symbols 256..alphabetSize-1 via code 18
      var zeros = alphabetSize - 256
      require(zeros >= 11 && zeros <= 138, s"zero-fill $zeros out of 18-range")
      w.writeCode(3, 2) // CL symbol 18 → '11'
      w.writeBits(zeros - 11, 7)
    }
  }

  private[operators] def writeSingleSymbolCode(w: BitWriter, sym: Int): Unit = {
    w.writeBits(1, 1) // simple
    w.writeBits(0, 1) // one symbol
    if (sym < 2) { w.writeBits(0, 1); w.writeBits(sym, 1) }
    else { w.writeBits(1, 1); w.writeBits(sym, 8) }
  }

  /** Real lossless WebP bytes: literal-coded VP8L (one code group, G/R/B
    * as byte-wide normal codes, alpha/distance as simple 1-symbol codes),
    * optionally through the SUBTRACT_GREEN transform. */
  def encodeWebpLossless(width: Int, height: Int,
      px: (Int, Int) => (Int, Int, Int), subtractGreen: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0 && width <= 0x4000 && height <= 0x4000 &&
      width.toLong * height <= MaxPixels)
    val w = new BitWriter
    w.writeBits(width - 1, 14)
    w.writeBits(height - 1, 14)
    w.writeBits(0, 1) // no alpha hint
    w.writeBits(0, 3) // version
    if (subtractGreen) { w.writeBits(1, 1); w.writeBits(2, 2) }
    w.writeBits(0, 1) // no more transforms
    w.writeBits(0, 1) // no color cache
    w.writeBits(0, 1) // no meta-prefix image
    writeByteWideCode(w, 256 + 24) // green
    writeByteWideCode(w, 256) // red
    writeByteWideCode(w, 256) // blue
    writeSingleSymbolCode(w, 255) // alpha: always opaque, zero bits/pixel
    writeSingleSymbolCode(w, 0) // distance: unused (no LZ77 emitted)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val (r, g, b) = px(x, y)
        val gg = g & 0xff
        val rr = if (subtractGreen) (r - gg) & 0xff else r & 0xff
        val bb = if (subtractGreen) (b - gg) & 0xff else b & 0xff
        w.writeCode(gg, 8)
        w.writeCode(rr, 8)
        w.writeCode(bb, 8)
        x += 1
      }
      y += 1
    }
    wrapVp8l(w.toBytes)
  }

  /** Raw VP8L chunk bytes (signature + 28-bit header + literal-coded
    * stream) for an ARGB image — the alpha-capable sibling of
    * [[encodeWebpLossless]]. Animated-WebP fixtures nest these inside
    * ANMF chunks, where per-pixel alpha drives real blend compositing.
    * `argb(x, y)` returns a packed 0xAARRGGBB pixel. */
  private[operators] def encodeVp8lChunk(width: Int, height: Int,
      argb: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0 && width <= 0x4000 && height <= 0x4000 &&
      width.toLong * height <= MaxPixels)
    val w = new BitWriter
    w.writeBits(width - 1, 14)
    w.writeBits(height - 1, 14)
    w.writeBits(1, 1) // alpha hint
    w.writeBits(0, 3) // version
    w.writeBits(0, 1) // no transforms
    w.writeBits(0, 1) // no color cache
    w.writeBits(0, 1) // no meta-prefix image
    writeByteWideCode(w, 256 + 24) // green
    writeByteWideCode(w, 256) // red
    writeByteWideCode(w, 256) // blue
    writeByteWideCode(w, 256) // alpha
    writeSingleSymbolCode(w, 0) // distance: unused (no LZ77 emitted)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val p = argb(x, y)
        w.writeCode((p >> 8) & 0xff, 8) // literal order: G, R, B, A
        w.writeCode((p >> 16) & 0xff, 8)
        w.writeCode(p & 0xff, 8)
        w.writeCode((p >>> 24) & 0xff, 8)
        x += 1
      }
      y += 1
    }
    0x2f.toByte +: w.toBytes
  }

  /** ALPH chunk payload for fixtures: forward-filters the alpha plane
    * (same edge rules as [[decodeAlph]]'s inverse), then stores it raw
    * (compression 0) or as a headerless VP8L image-stream carrying the
    * residuals in the green channel (compression 1). */
  private[operators] def encodeAlphChunk(width: Int, height: Int,
      alpha: (Int, Int) => Int, filter: Int = 0,
      lossless: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0 && filter >= 0 && filter <= 3)
    val plane = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { plane(y * width + x) = alpha(x, y) & 0xff; x += 1 }
      y += 1
    }
    val resid = new Array[Int](width * height)
    y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val pred =
          if (filter == 0) 0
          else if (x == 0 && y == 0) 0
          else if (y == 0) plane(x - 1)
          else if (x == 0) plane((y - 1) * width)
          else filter match {
            case 1 => plane(y * width + x - 1)
            case 2 => plane((y - 1) * width + x)
            case _ =>
              val v = plane(y * width + x - 1) + plane((y - 1) * width + x) -
                plane((y - 1) * width + x - 1)
              if (v < 0) 0 else if (v > 255) 255 else v
          }
        resid(y * width + x) = (plane(y * width + x) - pred) & 0xff
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write((filter << 2) | (if (lossless) 1 else 0))
    if (!lossless) resid.foreach(out.write)
    else { // headerless image-stream: residuals in green, R/B/A zero-bit
      val w = new BitWriter
      w.writeBits(0, 1) // no transforms
      w.writeBits(0, 1) // no color cache
      w.writeBits(0, 1) // no meta-prefix image
      writeByteWideCode(w, 256 + 24) // green carries the residuals
      writeSingleSymbolCode(w, 0) // red
      writeSingleSymbolCode(w, 0) // blue
      writeSingleSymbolCode(w, 0) // alpha
      writeSingleSymbolCode(w, 0) // distance
      resid.foreach(v => w.writeCode(v, 8))
      val bs = w.toBytes // single call: toBytes flushes the partial byte
      out.write(bs, 0, bs.length)
    }
    out.toByteArray
  }

  /** RIFF/WEBP container around a raw VP8L payload (signature added). */
  private[operators] def wrapVp8l(payload: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def wtag(t: String): Unit = t.foreach(c => out.write(c))
    def wle32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    val chunkLen = 1 + payload.length
    wtag("RIFF"); wle32(4 + 8 + chunkLen + (chunkLen & 1)); wtag("WEBP")
    wtag("VP8L"); wle32(chunkLen)
    out.write(0x2f)
    out.write(payload)
    if ((chunkLen & 1) == 1) out.write(0) // RIFF word alignment
    out.toByteArray
  }
}
