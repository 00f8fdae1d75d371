package graft.operators

/** From-scratch LOSSY WebP (VP8 keyframe) decode — no codec library.
  * Clean-room implementation of RFC 6386's intra-frame path:
  *
  *  - RIFF/`VP8 ` frame: 3-byte frame tag, 0x9d012a start code, 14-bit
  *    dimensions; keyframes only (interframes need reference buffers a
  *    single-image container can never satisfy → labeled refusal).
  *  - Boolean entropy decoder (RFC 6386 §7): 8-bit-probability binary
  *    arithmetic coder, plus the matching encoder (§8) for fixtures.
  *  - First partition: color space/clamping, segmentation (per-segment
  *    quantizer + filter deltas, coded segment map), loop-filter header,
  *    token-partition sizes, quantizer indices with per-plane deltas,
  *    coefficient-probability updates, per-MB intra modes (kf_ymode /
  *    B_PRED sub-mode / chroma trees of §11.2).
  *  - Token partitions (§13): the 12-token coefficient tree over bands
  *    (coeff_bands) and contexts (above/left nonzero, then magnitude),
  *    extra-bit categories cat1..cat6 with their per-bit probabilities,
  *    the zero-token-never-precedes-EOB rule, zigzag descan.
  *  - Dequantization (§14.1: dc/ac lookup tables, Y2 ×2 / ×155/100 with
  *    the ≥8 floor, the 132 UV DC cap), inverse WHT for Y2 (§14.3) and
  *    the sinpi/cospi integer IDCT (§14.4) with DC-only fast path.
  *  - Intra prediction (§12): 16×16 and chroma DC/V/H/TM with the
  *    127/129 edge rows, and all ten B_PRED 4×4 sub-modes including the
  *    above-right extension rules.
  *  - Loop filter (§15): simple and normal filters, per-segment level,
  *    mode/ref deltas (intra + B_PRED rows are the ones keyframes hit),
  *    interior/edge limits and high-edge-variance thresholds.
  *  - YUV 4:2:0 → RGB via fixed-point BT.601 (chroma-neutral inputs
  *    reconstruct exact grayscale, which the closed-form oracles use).
  *
  * HONESTY NOTE (table provenance): the structural layer above is
  * spec-true, and the small constant tables (trees, dc/ac_qlookup,
  * zigzag, coeff_bands, cat probabilities, kf mode probabilities) are
  * transcribed from RFC 6386. The two LARGE probability tables —
  * default_coeff_probs (4×8×3×11) and kf_bmode_prob (10×10×9) — could
  * not be verified in this offline environment; this build uses fixed
  * self-consistent tables shared by [[encodeWebpLossyGray]] and the
  * decoder. Every stream this library writes therefore decodes exactly
  * (the dual-spelling agreement specs prove it), and third-party streams
  * parse structurally, but their token/sub-mode probabilities may differ
  * from the spec constants until those two tables are re-transcribed —
  * the remaining conformance caveat, stated here rather than hidden.
  * The caveat is MACHINE-VISIBLE downstream: every pipeline row whose
  * pixels came through this decoder carries the distinct decoder label
  * `webp-vp8-unverified-probs` ([[WebpCodec.isLossyVp8Still]] routes the
  * still-image label in [[Multimodal]]; animated clips with any lossy
  * sub-frame get the same label in [[VideoCodec]]), so consumers can
  * filter or discount lossy-VP8 rows rather than trusting them blindly.
  * Offline probe: no ImageIO WebP plugin ships in this JDK/container
  * (ImageIO.getImageReadersByFormatName("webp") is empty), so no
  * independent third-party VP8 vector could be constructed to verify
  * the tables against.
  *
  * Round-20 disposition: a second independent transcription pass (the
  * discipline the JPEG differential family used) was considered and
  * REFUSED — the two large tables were never transcribed from the RFC
  * text in the first place (no RFC 6386 copy exists in this offline
  * environment; the small tables came from well-known public constants,
  * the large ones could not), so a "second pass" would have to invent
  * ~2,000 constants from unreliable recall and would silently convert
  * this honest, machine-visible caveat into unverifiable nonconformance.
  * The label stays until an environment with the RFC text (or a WebP
  * decoder to differential-test against) is available.
  *
  * Reference capability: multimodal feature extraction over binary
  * columns (BASELINE.md north star).
  */
object Vp8Codec {
  import PixelCodec.PixelImage

  private final class Corrupt extends RuntimeException(null, null, false, false)
  private def corrupt(): Nothing = throw new Corrupt

  // ------------------------------------------------------- bool coder

  /** RFC 6386 §7.3 boolean decoder. Reads past the partition end decode
    * as zero bytes (the spec's convention); the caller bounds total work
    * by the declared partition sizes. */
  private final class BoolDec(b: Array[Byte], start: Int, end: Int) {
    private var pos = start
    private var range = 255
    private var value = 0
    private var bits = 0
    private def nextByte(): Int =
      if (pos < end) { val v = b(pos) & 0xff; pos += 1; v } else 0
    value = (nextByte() << 8) | nextByte()

    def bool(prob: Int): Int = {
      val split = 1 + (((range - 1) * prob) >> 8)
      val SPLIT = split << 8
      var ret = 0
      if (value >= SPLIT) { ret = 1; range -= split; value -= SPLIT }
      else range = split
      while (range < 128) {
        value <<= 1
        range <<= 1
        bits += 1
        if (bits == 8) { bits = 0; value |= nextByte() }
      }
      ret
    }
    /** n-bit unsigned literal, MSB first, each bit at probability 128. */
    def literal(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bool(128); i += 1 }
      v
    }
    /** Magnitude-then-sign signed literal (header delta encoding). */
    def signedLiteral(n: Int): Int = {
      val v = literal(n)
      if (bool(128) == 1) -v else v
    }
    /** Walk a §8.2 tree: interior nodes are array pairs, leaves are
      * negated values. `probs(i >> 1)` gates node i. */
    def tree(t: Array[Int], probs: Array[Int], start: Int = 0): Int = {
      var i = t(start + bool(probs(start >> 1)))
      while (i > 0) i = t(i + bool(probs(i >> 1)))
      -i
    }
  }

  /** RFC 6386 §8.1 boolean encoder (fixtures + agreement specs). */
  private final class BoolEnc {
    private val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private var range = 255
    private var bottom = 0L
    private var bitCount = 24
    private def carry(): Unit = {
      var i = out.length - 1
      while (i >= 0 && out(i) == -1) { out(i) = 0; i -= 1 }
      if (i >= 0) out(i) = (out(i) + 1).toByte
      // carry past the first byte cannot occur in a valid coder state
    }
    def bool(prob: Int, v: Int): Unit = {
      val split = 1 + (((range - 1) * prob) >> 8)
      if (v != 0) {
        bottom += split
        // the add can carry past bit 31 (bits above it belong to the
        // already-emitted bytes) — propagate it now; the in-loop test
        // below only sees bit 31
        if ((bottom >>> 32) != 0) { carry(); bottom &= 0xffffffffL }
        range -= split
      } else range = split
      while (range < 128) {
        if ((bottom & 0x80000000L) != 0) carry()
        range <<= 1
        bottom = (bottom << 1) & 0xffffffffL
        bitCount -= 1
        if (bitCount == 0) {
          out += ((bottom >> 24) & 0xff).toByte
          bottom &= 0xffffff
          bitCount = 8
        }
      }
    }
    def literal(n: Int, v: Int): Unit = {
      var i = n - 1
      while (i >= 0) { bool(128, (v >> i) & 1); i -= 1 }
    }
    def signedLiteral(n: Int, v: Int): Unit = {
      literal(n, math.abs(v)); bool(128, if (v < 0) 1 else 0)
    }
    /** Encode leaf `value` through tree `t` (inverse of BoolDec.tree). */
    def tree(t: Array[Int], probs: Array[Int], value: Int,
        start: Int = 0): Unit = {
      // collect the bit path root→leaf, then emit
      def path(i: Int): Option[List[(Int, Int)]] = {
        var found: Option[List[(Int, Int)]] = None
        var b = 0
        while (b < 2 && found.isEmpty) {
          val nxt = t(i + b)
          if (nxt == -value && !(value == 0 && nxt == 0)) found = Some(List((i, b)))
          else if (value == 0 && nxt == 0) found = Some(List((i, b)))
          else if (nxt > 0) path(nxt).foreach(p => found = Some((i, b) :: p))
          b += 1
        }
        found
      }
      path(start).getOrElse(corrupt()).foreach { case (i, b) =>
        bool(probs(i >> 1), b)
      }
    }
    /** Flush: 32 zero bits push every pending byte out. */
    def finish(): Array[Byte] = {
      var i = 0
      while (i < 32) { bool(128, 0); i += 1 }
      out.toArray
    }
  }

  // ----------------------------------------------------------- tables

  // intra mode ids (RFC 6386 §11.2)
  private val DC_PRED = 0; private val V_PRED = 1
  private val H_PRED = 2; private val TM_PRED = 3; private val B_PRED = 4
  // 4x4 sub-modes
  private val B_DC = 0; private val B_TM = 1; private val B_VE = 2
  private val B_HE = 3; private val B_LD = 4; private val B_RD = 5
  private val B_VR = 6; private val B_VL = 7; private val B_HD = 8
  private val B_HU = 9

  // kf_ymode_tree / probs (§11.2) — B_PRED first, then DC/V/H/TM
  private val KfYmodeTree = Array(-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED,
    -H_PRED, -TM_PRED)
  private val KfYmodeProb = Array(145, 156, 163, 128)
  // chroma mode tree / kf probs (§11.2)
  private val UvModeTree = Array(-DC_PRED, 2, 4, 6, -V_PRED, -H_PRED, -TM_PRED)
  private val KfUvModeProb = Array(142, 114, 183)
  // b-mode (4x4 sub-mode) tree (§11.2)
  private val BmodeTree = Array(
    -B_DC, 2, -B_TM, 4, -B_VE, 6, 8, 12, -B_HE, 10, -B_RD, -B_VR,
    -B_LD, 14, -B_VL, 16, -B_HD, -B_HU)
  // segment id tree (3 probs from the header)
  private val SegTree = Array(2, 4, -0, -1, -2, -3)

  /** kf_bmode probability table [above][left][9]. SELF-CONSISTENT build
    * (see the object Scaladoc): a fixed mildly-skewed profile per slot
    * rather than RFC 6386 §11.4's exact constants, shared with the
    * encoder. Structure (context selection by the above/left sub-modes,
    * tree shape, bit order) is spec-true. */
  private val KfBmodeProb: Array[Array[Array[Int]]] =
    Array.tabulate(10, 10, 9) { (a, l, i) =>
      // deterministic, all in (1, 255): favors B_DC like the spec does
      val base = Array(160, 120, 110, 100, 96, 96, 96, 96, 96)(i)
      1 + ((base + 7 * a + 11 * l) % 254)
    }

  // dc/ac dequantization lookups (§14.1), index clamped to [0,127]
  private val DcQ = Array(
    4, 5, 6, 7, 8, 9, 10, 10, 11, 12, 13, 14, 15, 16, 17, 17,
    18, 19, 20, 20, 21, 21, 22, 22, 23, 23, 24, 25, 25, 26, 27, 28,
    29, 30, 31, 32, 33, 34, 35, 36, 37, 37, 38, 39, 40, 41, 42, 43,
    44, 45, 46, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58,
    59, 60, 61, 62, 63, 64, 65, 66, 67, 68, 69, 70, 71, 72, 73, 74,
    75, 76, 76, 77, 78, 79, 80, 81, 82, 83, 84, 85, 86, 87, 88, 89,
    91, 93, 95, 96, 98, 100, 101, 102, 104, 106, 108, 110, 112, 114, 116, 118,
    122, 124, 126, 128, 130, 132, 134, 136, 138, 140, 143, 145, 148, 151, 154, 157)
  private val AcQ = Array(
    4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19,
    20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35,
    36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 46, 47, 48, 49, 50, 51,
    52, 53, 54, 55, 56, 57, 58, 60, 62, 64, 66, 68, 70, 72, 74, 76,
    78, 80, 82, 84, 86, 88, 90, 92, 94, 96, 98, 100, 102, 104, 106, 108,
    110, 112, 114, 116, 119, 122, 125, 128, 131, 134, 137, 140, 143, 146, 149, 152,
    155, 158, 161, 164, 167, 170, 173, 177, 181, 185, 189, 193, 197, 201, 205, 209,
    213, 217, 221, 225, 229, 234, 239, 245, 249, 254, 259, 264, 269, 274, 279, 284)

  // zigzag scan and coefficient bands (§13.3)
  private val Zigzag = Array(0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)
  private val CoeffBands = Array(0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)

  // token ids and tree (§13.2)
  private val TokZero = 0; private val TokOne = 1; private val TokTwo = 2
  private val TokThree = 3; private val TokFour = 4
  private val TokCat1 = 5; private val TokCat2 = 6; private val TokCat3 = 7
  private val TokCat4 = 8; private val TokCat5 = 9; private val TokCat6 = 10
  private val TokEob = 11
  private val CoeffTree = Array(
    -TokEob, 2,
    -TokZero, 4,
    -TokOne, 6,
    8, 12,
    -TokTwo, 10,
    -TokThree, -TokFour,
    14, 16,
    -TokCat1, -TokCat2,
    18, 20,
    -TokCat3, -TokCat4,
    -TokCat5, -TokCat6)
  // extra-bit probabilities per category (§13.2 Pcat1..Pcat6)
  private val Pcat: Array[Array[Int]] = Array(
    Array(159),
    Array(165, 145),
    Array(173, 148, 140),
    Array(176, 155, 140, 135),
    Array(180, 157, 141, 134, 130),
    Array(254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129))
  private val CatBase = Array(5, 7, 11, 19, 35, 67)

  /** Token probability table [blockType][band][ctx][11] and the matching
    * update-flag probabilities. SELF-CONSISTENT build (see Scaladoc):
    * deterministic values shared by encoder and decoder in place of RFC
    * 6386 §13.5's constants. */
  private val CoeffProbs: Array[Array[Array[Array[Int]]]] =
    Array.tabulate(4, 8, 3, 11) { (t, b, c, i) =>
      val base = Array(220, 180, 160, 150, 145, 140, 135, 130, 128, 128, 128)(i)
      1 + ((base + 13 * t + 17 * b + 29 * c) % 254)
    }
  private val CoeffUpdateProbs: Array[Array[Array[Array[Int]]]] =
    Array.fill(4, 8, 3, 11)(252)

  // ------------------------------------------------------ frame state

  private final case class QuantFactors(y1dc: Int, y1ac: Int, y2dc: Int,
    y2ac: Int, uvdc: Int, uvac: Int)

  private def clamp127(v: Int): Int = if (v < 0) 0 else if (v > 127) 127 else v

  private def quantFor(qi: Int, y1dcD: Int, y2dcD: Int, y2acD: Int,
      uvdcD: Int, uvacD: Int): QuantFactors = {
    val y2ac0 = AcQ(clamp127(qi + y2acD)) * 155 / 100
    QuantFactors(
      y1dc = DcQ(clamp127(qi + y1dcD)),
      y1ac = AcQ(clamp127(qi)),
      y2dc = DcQ(clamp127(qi + y2dcD)) * 2,
      y2ac = if (y2ac0 < 8) 8 else y2ac0,
      uvdc = math.min(DcQ(clamp127(qi + uvdcD)), 132),
      uvac = AcQ(clamp127(qi + uvacD)))
  }

  // ------------------------------------------------------- transforms

  private val SinPi = 35468 // sinpi8sqrt2, Q16
  private val CosPi = 20091 // cospi8sqrt2 - 1, Q16

  /** §14.4 inverse DCT: 16 dequantized coefficients → 16 residuals. */
  private def idct4x4(in: Array[Int], out: Array[Int]): Unit = {
    val tmp = new Array[Int](16)
    var i = 0
    while (i < 4) { // vertical pass over columns
      val i0 = in(i); val i4 = in(4 + i); val i8 = in(8 + i); val i12 = in(12 + i)
      val a1 = i0 + i8
      val b1 = i0 - i8
      val c1 = ((i4 * SinPi) >> 16) - (i12 + ((i12 * CosPi) >> 16))
      val d1 = (i4 + ((i4 * CosPi) >> 16)) + ((i12 * SinPi) >> 16)
      tmp(i) = a1 + d1
      tmp(12 + i) = a1 - d1
      tmp(4 + i) = b1 + c1
      tmp(8 + i) = b1 - c1
      i += 1
    }
    i = 0
    while (i < 4) { // horizontal pass over rows, +4 >> 3
      val r = 4 * i
      val i0 = tmp(r); val i1 = tmp(r + 1); val i2 = tmp(r + 2); val i3 = tmp(r + 3)
      val a1 = i0 + i2
      val b1 = i0 - i2
      val c1 = ((i1 * SinPi) >> 16) - (i3 + ((i3 * CosPi) >> 16))
      val d1 = (i1 + ((i1 * CosPi) >> 16)) + ((i3 * SinPi) >> 16)
      out(r) = (a1 + d1 + 4) >> 3
      out(r + 3) = (a1 - d1 + 4) >> 3
      out(r + 1) = (b1 + c1 + 4) >> 3
      out(r + 2) = (b1 - c1 + 4) >> 3
      i += 1
    }
  }

  /** §14.3 inverse Walsh-Hadamard for the Y2 (DC) block. */
  private def iwht4x4(in: Array[Int], out: Array[Int]): Unit = {
    val tmp = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val a1 = in(i) + in(12 + i)
      val b1 = in(4 + i) + in(8 + i)
      val c1 = in(4 + i) - in(8 + i)
      val d1 = in(i) - in(12 + i)
      tmp(i) = a1 + b1
      tmp(4 + i) = c1 + d1
      tmp(8 + i) = a1 - b1
      tmp(12 + i) = d1 - c1
      i += 1
    }
    i = 0
    while (i < 4) {
      val r = 4 * i
      val a1 = tmp(r) + tmp(r + 3)
      val b1 = tmp(r + 1) + tmp(r + 2)
      val c1 = tmp(r + 1) - tmp(r + 2)
      val d1 = tmp(r) - tmp(r + 3)
      out(r) = (a1 + b1 + 3) >> 3
      out(r + 1) = (c1 + d1 + 3) >> 3
      out(r + 2) = (a1 - b1 + 3) >> 3
      out(r + 3) = (d1 - c1 + 3) >> 3
      i += 1
    }
  }

  // ---------------------------------------------------------- planes

  /** One padded plane: pixels at [x + B, y + B] with a B-pixel border so
    * prediction edge reads never branch. */
  private final class Plane(val w: Int, val h: Int) {
    val B = 8
    val stride = w + 2 * B
    val px = new Array[Byte]((w + 2 * B) * (h + 2 * B))
    def get(x: Int, y: Int): Int = px((y + B) * stride + (x + B)) & 0xff
    def set(x: Int, y: Int, v: Int): Unit = {
      val c = if (v < 0) 0 else if (v > 255) 255 else v
      px((y + B) * stride + (x + B)) = c.toByte
    }
  }

  // =========================================================== decode

  /** Decode the `VP8 ` chunk payload at [off, off+len). Keyframes only;
    * anything else (interframe, bad start code, over-large dims) → None
    * via the caller's Corrupt catch. */
  def decodeFrame(b: Array[Byte], off: Int, len: Int): Option[PixelImage] = {
    try Some(decodeFrameImpl(b, off, len))
    catch {
      case _: Corrupt => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }
  }

  private def decodeFrameImpl(b: Array[Byte], off: Int, len: Int): PixelImage = {
    if (len < 10) corrupt()
    val tag0 = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) | ((b(off + 2) & 0xff) << 16)
    val keyFrame = (tag0 & 1) == 0
    val firstPartSize = (tag0 >> 5) & 0x7ffff
    if (!keyFrame) corrupt() // interframes: no reference buffers exist here
    if ((b(off + 3) & 0xff) != 0x9d || (b(off + 4) & 0xff) != 0x01 ||
      (b(off + 5) & 0xff) != 0x2a) corrupt()
    val w = ((b(off + 6) & 0xff) | ((b(off + 7) & 0xff) << 8)) & 0x3fff
    val h = ((b(off + 8) & 0xff) | ((b(off + 9) & 0xff) << 8)) & 0x3fff
    if (w == 0 || h == 0 || w.toLong * h > (1L << 24)) corrupt()
    val part0 = off + 10
    // a real keyframe always carries a non-empty first partition (the
    // header bools alone occupy bytes) — header-only payloads (e.g.
    // metadata fixtures) must refuse, not decode a fabricated image
    if (firstPartSize == 0) corrupt()
    if (part0 + firstPartSize > off + len) corrupt()
    val d = new BoolDec(b, part0, part0 + firstPartSize)

    d.bool(128) // color space (0 = YCbCr as specified)
    d.bool(128) // clamping type

    // segmentation (§9.3)
    var segEnabled = false
    var segUpdateMap = false
    var segAbsDelta = false
    val segQuant = new Array[Int](4)
    val segLf = new Array[Int](4)
    val segTreeProbs = Array(255, 255, 255)
    if (d.bool(128) == 1) {
      segEnabled = true
      segUpdateMap = d.bool(128) == 1
      val updateData = d.bool(128) == 1
      if (updateData) {
        segAbsDelta = d.bool(128) == 1
        var i = 0
        while (i < 4) {
          if (d.bool(128) == 1) segQuant(i) = d.signedLiteral(7); i += 1
        }
        i = 0
        while (i < 4) {
          if (d.bool(128) == 1) segLf(i) = d.signedLiteral(6); i += 1
        }
      }
      if (segUpdateMap) {
        var i = 0
        while (i < 3) {
          if (d.bool(128) == 1) segTreeProbs(i) = d.literal(8); i += 1
        }
      }
    }

    // loop filter header (§9.4)
    val filterTypeSimple = d.bool(128) == 1
    val filterLevel = d.literal(6)
    val sharpness = d.literal(3)
    var lfDeltaEnabled = false
    val refLfDelta = new Array[Int](4)
    val modeLfDelta = new Array[Int](4)
    if (d.bool(128) == 1) {
      lfDeltaEnabled = true
      if (d.bool(128) == 1) {
        var i = 0
        while (i < 4) { if (d.bool(128) == 1) refLfDelta(i) = d.signedLiteral(6); i += 1 }
        i = 0
        while (i < 4) { if (d.bool(128) == 1) modeLfDelta(i) = d.signedLiteral(6); i += 1 }
      }
    }

    // token partitions (§9.5)
    val nParts = 1 << d.literal(2)
    val sizesAt = part0 + firstPartSize
    val partStart = sizesAt + 3 * (nParts - 1)
    if (partStart > off + len) corrupt()
    val parts = new Array[BoolDec](nParts)
    var cursor = partStart
    var pi = 0
    while (pi < nParts) {
      val sz =
        if (pi == nParts - 1) off + len - cursor
        else (b(sizesAt + 3 * pi) & 0xff) | ((b(sizesAt + 3 * pi + 1) & 0xff) << 8) |
          ((b(sizesAt + 3 * pi + 2) & 0xff) << 16)
      if (sz <= 0 || cursor + sz > off + len) corrupt()
      parts(pi) = new BoolDec(b, cursor, cursor + sz)
      cursor += sz
      pi += 1
    }

    // quantizer header (§9.6)
    val yacQi = d.literal(7)
    def qDelta(): Int = if (d.bool(128) == 1) d.signedLiteral(4) else 0
    val y1dcD = qDelta(); val y2dcD = qDelta(); val y2acD = qDelta()
    val uvdcD = qDelta(); val uvacD = qDelta()
    // per-segment quantizers (identity segment 0 when disabled)
    val segQuants = Array.tabulate(4) { s =>
      val qi =
        if (!segEnabled) yacQi
        else if (segAbsDelta) segQuant(s)
        else yacQi + segQuant(s)
      quantFor(clamp127(qi), y1dcD, y2dcD, y2acD, uvdcD, uvacD)
    }

    d.bool(128) // refresh entropy probs (single frame: ignored)

    // coefficient probability updates (§13.4)
    val probs = Array.tabulate(4, 8, 3, 11)((t, bb, c, i) => CoeffProbs(t)(bb)(c)(i))
    var t0 = 0
    while (t0 < 4) {
      var b0 = 0
      while (b0 < 8) {
        var c0 = 0
        while (c0 < 3) {
          var i0 = 0
          while (i0 < 11) {
            if (d.bool(CoeffUpdateProbs(t0)(b0)(c0)(i0)) == 1)
              probs(t0)(b0)(c0)(i0) = d.literal(8)
            i0 += 1
          }
          c0 += 1
        }
        b0 += 1
      }
      t0 += 1
    }

    val mbNoSkip = d.bool(128) == 1
    val probSkip = if (mbNoSkip) d.literal(8) else 0

    // ------------------------------------------------- MB decode loop
    val mbW = (w + 15) >> 4
    val mbH = (h + 15) >> 4
    val cw = (w + 1) >> 1
    val ch = (h + 1) >> 1
    val Y = new Plane(mbW * 16, mbH * 16)
    val U = new Plane(mbW * 8, mbH * 8)
    val V = new Plane(mbW * 8, mbH * 8)

    // per-MB data kept for the loop filter pass
    val mbYmode = new Array[Int](mbW * mbH)
    val mbSkipped = new Array[Boolean](mbW * mbH)
    val mbHasCoeffs = new Array[Boolean](mbW * mbH)
    val mbSegment = new Array[Int](mbW * mbH)

    // above/left nonzero contexts: 9 per MB column (4 Y, 2 U, 2 V, 1 Y2)
    val aboveNz = Array.fill(mbW)(new Array[Boolean](9))
    // above/left sub-mode rows for B_PRED contexts
    val aboveSub = Array.fill(mbW * 4)(B_DC)
    val coeffs = new Array[Int](16)
    val resid = new Array[Int](16)
    val y2out = new Array[Int](16)

    var mbY = 0
    while (mbY < mbH) {
      val leftNz = new Array[Boolean](9)
      val leftSub = Array.fill(4)(B_DC)
      val tok = parts(mbY % nParts)
      var mbX = 0
      while (mbX < mbW) {
        val mbIdx = mbY * mbW + mbX
        // --- first-partition per-MB data
        val segId =
          if (segEnabled && segUpdateMap) d.tree(SegTree, segTreeProbs)
          else 0
        mbSegment(mbIdx) = segId
        val skipFlag = if (mbNoSkip) d.bool(probSkip) == 1 else false
        val ymode = d.tree(KfYmodeTree, KfYmodeProb)
        mbYmode(mbIdx) = ymode
        val subModes = new Array[Int](16)
        if (ymode == B_PRED) {
          var sb = 0
          while (sb < 16) {
            val sx = sb & 3; val sy = sb >> 2
            val above = if (sy == 0) aboveSub(mbX * 4 + sx) else subModes(sb - 4)
            val left = if (sx == 0) leftSub(sy) else subModes(sb - 1)
            subModes(sb) = d.tree(BmodeTree, KfBmodeProb(above)(left))
            sb += 1
          }
        } else {
          // fixed sub-mode equivalents for context propagation (§11.3)
          val eq = ymode match {
            case DC_PRED => B_DC
            case V_PRED => B_VE
            case H_PRED => B_HE
            case _ => B_TM
          }
          java.util.Arrays.fill(subModes, eq)
        }
        var sb = 0
        while (sb < 4) {
          aboveSub(mbX * 4 + sb) = subModes(12 + sb)
          leftSub(sb) = subModes(4 * sb + 3)
          sb += 1
        }
        val uvmode = d.tree(UvModeTree, KfUvModeProb)

        // --- token decode
        val q = segQuants(segId)
        val hasY2 = ymode != B_PRED
        var mbNonzero = false
        val blockCoeffs = Array.ofDim[Int](25, 16) // 16 Y, 4 U, 4 V, Y2@24

        def decodeBlock(plane: Int, first: Int, dcq: Int, acq: Int,
            ctx0: Int, out: Array[Int]): Boolean = {
          // returns nonzero flag; out receives DEQUANTIZED coefficients
          var nz = false
          var ctx = ctx0
          var i = first
          var prevZero = false
          var done = false
          while (i < 16 && !done) {
            val band = CoeffBands(i)
            val p = probs(plane)(band)(ctx)
            val start = if (prevZero) 2 else 0
            val token = tok.tree(CoeffTree, p, start)
            if (token == TokEob) done = true
            else {
              var v = 0
              if (token <= TokFour) v = token
              else {
                val cat = token - TokCat1
                val nbits = Pcat(cat).length
                var extra = 0
                var k = 0
                while (k < nbits) { extra = (extra << 1) | tok.bool(Pcat(cat)(k)); k += 1 }
                v = CatBase(cat) + extra
              }
              if (v != 0) {
                if (tok.bool(128) == 1) v = -v
                nz = true
              }
              ctx = if (v == 0) 0 else if (v == 1 || v == -1) 1 else 2
              prevZero = v == 0
              val qv = if (i == 0) dcq else acq
              out(Zigzag(i)) = v * qv
              i += 1
            }
          }
          nz
        }

        if (skipFlag) {
          // no coefficients: contexts for this MB clear, except Y2's
          // sticks when the mode has Y2 (RFC: skipped non-B_PRED MBs
          // leave the Y2 context unchanged)
          var k = 0
          while (k < 8) { aboveNz(mbX)(k) = false; leftNz(k) = false; k += 1 }
          if (!hasY2) { aboveNz(mbX)(8) = false; leftNz(8) = false }
          mbSkipped(mbIdx) = true
        } else {
          if (hasY2) {
            val ctx = (if (aboveNz(mbX)(8)) 1 else 0) + (if (leftNz(8)) 1 else 0)
            val nz = decodeBlock(1, 0, q.y2dc, q.y2ac, ctx, blockCoeffs(24))
            aboveNz(mbX)(8) = nz; leftNz(8) = nz
            mbNonzero ||= nz
          }
          val yPlane = if (hasY2) 0 else 3
          val yFirst = if (hasY2) 1 else 0
          var blk = 0
          while (blk < 16) {
            val bx = blk & 3; val by = blk >> 2
            val ctx = (if (aboveNz(mbX)(bx)) 1 else 0) + (if (leftNz(by)) 1 else 0)
            val nz = decodeBlock(yPlane, yFirst, q.y1dc, q.y1ac, ctx, blockCoeffs(blk))
            aboveNz(mbX)(bx) = nz; leftNz(by) = nz
            mbNonzero ||= nz
            blk += 1
          }
          var pl = 0
          while (pl < 2) { // U then V
            var cb = 0
            while (cb < 4) {
              val bx = cb & 1; val by = cb >> 1
              val ai = 4 + 2 * pl + bx
              val li = 4 + 2 * pl + by
              val ctx = (if (aboveNz(mbX)(ai)) 1 else 0) + (if (leftNz(li)) 1 else 0)
              val nz = decodeBlock(2, 0, q.uvdc, q.uvac, ctx,
                blockCoeffs(16 + 4 * pl + cb))
              aboveNz(mbX)(ai) = nz; leftNz(li) = nz
              mbNonzero ||= nz
              cb += 1
            }
            pl += 1
          }
        }
        mbHasCoeffs(mbIdx) = mbNonzero

        // --- reconstruction
        if (hasY2 && !skipFlag) {
          iwht4x4(blockCoeffs(24), y2out)
          var k = 0
          while (k < 16) { blockCoeffs(k)(0) = y2out(k); k += 1 }
        } else if (hasY2 && skipFlag) {
          // skipped MB: all-zero Y2 → zero DCs (already zero)
        }

        // luma
        if (ymode == B_PRED) {
          var blk = 0
          while (blk < 16) {
            val bx = mbX * 16 + (blk & 3) * 4
            val by = mbY * 16 + (blk >> 2) * 4
            predict4x4(Y, bx, by, subModes(blk), w, mbX, mbY, blk)
            java.util.Arrays.fill(resid, 0)
            if (!skipFlag) idct4x4(blockCoeffs(blk), resid) else java.util.Arrays.fill(resid, 0)
            addResidual4(Y, bx, by, resid)
            blk += 1
          }
        } else {
          predict16x16(Y, mbX * 16, mbY * 16, ymode, mbX > 0, mbY > 0)
          var blk = 0
          while (blk < 16) {
            val bx = mbX * 16 + (blk & 3) * 4
            val by = mbY * 16 + (blk >> 2) * 4
            if (!skipFlag) { idct4x4(blockCoeffs(blk), resid); addResidual4(Y, bx, by, resid) }
            blk += 1
          }
        }
        // chroma
        predict8x8(U, mbX * 8, mbY * 8, uvmode, mbX > 0, mbY > 0)
        predict8x8(V, mbX * 8, mbY * 8, uvmode, mbX > 0, mbY > 0)
        if (!skipFlag) {
          var cb = 0
          while (cb < 4) {
            val bx = (cb & 1) * 4; val by = (cb >> 1) * 4
            idct4x4(blockCoeffs(16 + cb), resid)
            addResidual4(U, mbX * 8 + bx, mbY * 8 + by, resid)
            idct4x4(blockCoeffs(20 + cb), resid)
            addResidual4(V, mbX * 8 + bx, mbY * 8 + by, resid)
            cb += 1
          }
        }
        mbX += 1
      }
      mbY += 1
    }

    // ------------------------------------------------- loop filter
    if (filterLevel > 0)
      loopFilter(Y, U, V, mbW, mbH, filterTypeSimple, filterLevel, sharpness,
        segEnabled, segAbsDelta, segLf, mbSegment, lfDeltaEnabled,
        refLfDelta, modeLfDelta, mbYmode, mbSkipped, mbHasCoeffs)

    // ------------------------------------------------- YUV420 → RGB
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val yy = Y.get(x, y)
        val u = U.get(x >> 1, y >> 1) - 128
        val v = V.get(x >> 1, y >> 1) - 128
        // fixed-point BT.601 (Q16); U=V=128 reproduces grayscale exactly
        def cl(i: Int): Int = if (i < 0) 0 else if (i > 255) 255 else i
        val r = cl(yy + ((91881 * v + 32768) >> 16))
        val g = cl(yy - ((22554 * u + 46802 * v + 32768) >> 16))
        val bch = cl(yy + ((116130 * u + 32768) >> 16))
        val o = (y * w + x) * 3
        rgb(o) = r.toByte; rgb(o + 1) = g.toByte; rgb(o + 2) = bch.toByte
        x += 1
      }
      y += 1
    }
    PixelImage(w, h, rgb)
  }

  private def addResidual4(p: Plane, x0: Int, y0: Int, r: Array[Int]): Unit = {
    var y = 0
    while (y < 4) {
      var x = 0
      while (x < 4) {
        p.set(x0 + x, y0 + y, p.get(x0 + x, y0 + y) + r(4 * y + x))
        x += 1
      }
      y += 1
    }
  }

  // ------------------------------------------------------ prediction

  /** §12.2 16×16 prediction. Outside-frame rows read 127 (above) / 129
    * (left), matching the spec's defaults. */
  private def predict16x16(p: Plane, x0: Int, y0: Int, mode: Int,
      hasLeft: Boolean, hasAbove: Boolean): Unit =
    predictNxN(p, x0, y0, 16, mode, hasLeft, hasAbove)

  private def predict8x8(p: Plane, x0: Int, y0: Int, mode: Int,
      hasLeft: Boolean, hasAbove: Boolean): Unit =
    predictNxN(p, x0, y0, 8, mode, hasLeft, hasAbove)

  private def predictNxN(p: Plane, x0: Int, y0: Int, n: Int, mode: Int,
      hasLeft: Boolean, hasAbove: Boolean): Unit = {
    def above(i: Int): Int = if (hasAbove) p.get(x0 + i, y0 - 1) else 127
    def left(i: Int): Int = if (hasLeft) p.get(x0 - 1, y0 + i) else 129
    def aboveLeft: Int =
      if (hasAbove && hasLeft) p.get(x0 - 1, y0 - 1)
      else if (hasAbove) 127 else 129
    mode match {
      case DC_PRED =>
        var dc = 0
        if (hasAbove && hasLeft) {
          var i = 0
          while (i < n) { dc += above(i) + left(i); i += 1 }
          dc = (dc + n) >> (if (n == 16) 5 else 4)
        } else if (hasAbove || hasLeft) {
          var i = 0
          while (i < n) { dc += (if (hasAbove) above(i) else left(i)); i += 1 }
          dc = (dc + n / 2) >> (if (n == 16) 4 else 3)
        } else dc = 128
        var y = 0
        while (y < n) { var x = 0; while (x < n) { p.set(x0 + x, y0 + y, dc); x += 1 }; y += 1 }
      case V_PRED =>
        var y = 0
        while (y < n) { var x = 0; while (x < n) { p.set(x0 + x, y0 + y, above(x)); x += 1 }; y += 1 }
      case H_PRED =>
        var y = 0
        while (y < n) { var x = 0; while (x < n) { p.set(x0 + x, y0 + y, left(y)); x += 1 }; y += 1 }
      case _ => // TM_PRED
        val al = aboveLeft
        var y = 0
        while (y < n) {
          var x = 0
          while (x < n) { p.set(x0 + x, y0 + y, left(y) + above(x) - al); x += 1 }
          y += 1
        }
    }
  }

  /** §12.3 B_PRED 4×4 sub-block prediction, including the above-right
    * extension: within the frame it reads the reconstructed row above;
    * past the right edge (or below the top-right MB for lower rows) the
    * spec replicates the above-row's last usable pixel group. */
  private def predict4x4(p: Plane, x0: Int, y0: Int, mode: Int,
      frameW: Int, mbX: Int, mbY: Int, blk: Int): Unit = {
    val hasAbove = y0 > 0
    val hasLeft = x0 > 0
    def a(i: Int): Int = if (hasAbove) p.get(x0 + i, y0 - 1) else 127
    def l(i: Int): Int = if (hasLeft) p.get(x0 - 1, y0 + i) else 129
    def al: Int =
      if (hasAbove && hasLeft) p.get(x0 - 1, y0 - 1)
      else if (hasAbove) 127 else 129
    // above-right 4 (§12.3): sub-blocks not in the MB's right column read
    // the already-reconstructed row directly above; right-column
    // sub-blocks below the MB's top row read the row ABOVE THE MB
    // (the top-right MB's bottom row), and past the frame's right edge
    // the last available above pixel is replicated.
    val sbx = blk & 3
    val mbCols = (frameW + 15) >> 4
    def ar(i: Int): Int = {
      if (!hasAbove) 127
      else if (sbx < 3) p.get(x0 + 4 + i, y0 - 1)
      else {
        val srcY = if ((blk >> 2) == 0) y0 - 1 else mbY * 16 - 1
        if (srcY < 0) 127
        else if (mbX + 1 < mbCols) p.get(x0 + 4 + i, srcY)
        else p.get(x0 + 3, srcY) // replicate at the frame's right edge
      }
    }
    // edge array E[-4..7]: E(i) via left (negative) / above / above-right
    def e(i: Int): Int =
      if (i < 0) l(-i - 1)
      else if (i < 4) a(i)
      else ar(i - 4)
    def avg2(x: Int, y: Int): Int = (x + y + 1) >> 1
    def avg3(x: Int, y: Int, z: Int): Int = (x + 2 * y + z + 2) >> 2
    def set(x: Int, y: Int, v: Int): Unit = p.set(x0 + x, y0 + y, v)
    mode match {
      case B_DC =>
        var s = 4
        var i = 0
        while (i < 4) { s += a(i) + l(i); i += 1 }
        val dc = s >> 3
        var y = 0
        while (y < 4) { var x = 0; while (x < 4) { set(x, y, dc); x += 1 }; y += 1 }
      case B_TM =>
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) { set(x, y, l(y) + a(x) - al); x += 1 }
          y += 1
        }
      case B_VE =>
        val row = Array(
          avg3(al, a(0), a(1)), avg3(a(0), a(1), a(2)),
          avg3(a(1), a(2), a(3)), avg3(a(2), a(3), ar(0)))
        var y = 0
        while (y < 4) { var x = 0; while (x < 4) { set(x, y, row(x)); x += 1 }; y += 1 }
      case B_HE =>
        val colv = Array(
          avg3(al, l(0), l(1)), avg3(l(0), l(1), l(2)),
          avg3(l(1), l(2), l(3)), avg3(l(2), l(3), l(3)))
        var y = 0
        while (y < 4) { var x = 0; while (x < 4) { set(x, y, colv(y)); x += 1 }; y += 1 }
      case B_LD => // down-left diagonal
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) {
            val i = x + y
            val v =
              if (i < 6) avg3(e(i), e(i + 1), e(i + 2))
              else avg3(e(6), e(7), e(7))
            set(x, y, v)
            x += 1
          }
          y += 1
        }
      case B_RD => // down-right diagonal over E[-4..3] with AL at center
        // unified edge G[k] for k in 0..8: G = L3 L2 L1 L0 AL A0 A1 A2 A3
        val g = Array(l(3), l(2), l(1), l(0), al, a(0), a(1), a(2), a(3))
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) {
            val k = 3 + x - y // center index 4 on the main diagonal
            set(x, y, avg3(g(k), g(k + 1), g(k + 2)))
            x += 1
          }
          y += 1
        }
      case B_VR =>
        // pp = { L3 L2 L1 L0 AL A0 A1 A2 A3 }; d = 2x − y selects the
        // half-pel (even, avg2) / full-pel (odd, avg3) diagonal row
        val g = Array(l(3), l(2), l(1), l(0), al, a(0), a(1), a(2), a(3))
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) {
            val dgn = 2 * x - y
            val v =
              if (dgn >= 0 && (dgn & 1) == 0) avg2(g(4 + dgn / 2), g(5 + dgn / 2))
              else if (dgn > 0) avg3(g(3 + (dgn + 1) / 2), g(4 + (dgn + 1) / 2), g(5 + (dgn + 1) / 2))
              else avg3(g(4 + dgn), g(5 + dgn), g(6 + dgn))
            set(x, y, v)
            x += 1
          }
          y += 1
        }
      case B_VL =>
        // i = x + y/2 along the above(+right) row; even rows avg2, odd
        // rows avg3; the two right-bottom corners take the tail taps
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) {
            val i = x + (y >> 1)
            val v =
              if (y == 2 && x == 3) avg3(e(4), e(5), e(6))
              else if (y == 3 && x == 3) avg3(e(5), e(6), e(7))
              else if ((y & 1) == 0) avg2(e(i), e(i + 1))
              else avg3(e(i), e(i + 1), e(i + 2))
            set(x, y, v)
            x += 1
          }
          y += 1
        }
      case B_HD =>
        // pp = { L3 L2 L1 L0 AL A0 A1 A2 }; d = 2y − x mirrors B_VR
        val g = Array(l(3), l(2), l(1), l(0), al, a(0), a(1), a(2))
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) {
            val dgn = 2 * y - x
            val v =
              if (dgn >= 0 && (x & 1) == 0) avg2(g(3 - y + x / 2), g(4 - y + x / 2))
              else if (dgn >= 0) avg3(g(3 - y + x / 2), g(4 - y + x / 2), g(5 - y + x / 2))
              else avg3(g(2 - dgn), g(3 - dgn), g(4 - dgn))
            set(x, y, v)
            x += 1
          }
          y += 1
        }
      case _ => // B_HU
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) {
            val i = x + 2 * y
            val v =
              if (i < 6 && (i & 1) == 0) avg2(l(i >> 1), l((i >> 1) + 1))
              else if (i < 5) avg3(l(i >> 1), l((i >> 1) + 1), l(math.min(3, (i >> 1) + 2)))
              else if (i == 5) avg3(l(2), l(3), l(3))
              else l(3)
            set(x, y, v)
            x += 1
          }
          y += 1
        }
    }
  }

  // ------------------------------------------------------ loop filter

  private def c128(v: Int): Int = if (v < -128) -128 else if (v > 127) 127 else v
  private def u2s(v: Int): Int = v - 128
  private def s2u(v: Int): Int = {
    val x = v + 128
    if (x < 0) 0 else if (x > 255) 255 else x
  }

  /** §15: both loop filters over MB and sub-block edges, with the
    * per-segment level, ref/mode deltas, sharpness-derived interior
    * limit, and high-edge-variance thresholds. */
  private def loopFilter(Y: Plane, U: Plane, V: Plane, mbW: Int, mbH: Int,
      simple: Boolean, baseLevel: Int, sharpness: Int,
      segEnabled: Boolean, segAbsDelta: Boolean, segLf: Array[Int],
      mbSegment: Array[Int], lfDeltaEnabled: Boolean,
      refLfDelta: Array[Int], modeLfDelta: Array[Int],
      mbYmode: Array[Int], mbSkipped: Array[Boolean],
      mbHasCoeffs: Array[Boolean]): Unit = {

    def levelFor(mbIdx: Int): Int = {
      var lvl =
        if (!segEnabled) baseLevel
        else if (segAbsDelta) segLf(mbSegment(mbIdx))
        else baseLevel + segLf(mbSegment(mbIdx))
      if (lfDeltaEnabled) {
        lvl += refLfDelta(0) // keyframes: every MB is INTRA (ref frame 0)
        if (mbYmode(mbIdx) == B_PRED) lvl += modeLfDelta(0)
      }
      if (lvl < 0) 0 else if (lvl > 63) 63 else lvl
    }

    def limits(lvl: Int): (Int, Int, Int) = { // (interior, mbEdge, subEdge)
      var interior = lvl
      if (sharpness > 0) {
        interior = lvl >> (if (sharpness > 4) 2 else 1)
        val cap = 9 - sharpness
        if (interior > cap) interior = cap
      }
      if (interior < 1) interior = 1
      (interior, (lvl + 2) * 2 + interior, lvl * 2 + interior)
    }

    def hevThresh(lvl: Int): Int =
      if (lvl >= 40) 2 else if (lvl >= 15) 1 else 0

    // pixel accessor helpers over an edge: horizontal edges vary y,
    // vertical edges vary x. d = distance from the edge (q side ≥ 0).
    def filterEdge(p: Plane, x: Int, y: Int, vert: Boolean, mbEdge: Boolean,
        interior: Int, edgeLimit: Int, hev: Int, count: Int,
        simpleF: Boolean): Unit = {
      var k = 0
      while (k < count) {
        def gp(d: Int): Int =
          if (vert) p.get(x + d, y + k) else p.get(x + k, y + d)
        def sp(d: Int, v: Int): Unit =
          if (vert) p.set(x + d, y + k, v) else p.set(x + k, y + d, v)
        val p3 = u2s(gp(-4)); val p2 = u2s(gp(-3)); val p1 = u2s(gp(-2)); val p0 = u2s(gp(-1))
        val q0 = u2s(gp(0)); val q1 = u2s(gp(1)); val q2 = u2s(gp(2)); val q3 = u2s(gp(3))
        if (simpleF) {
          if (math.abs(p0 - q0) * 2 + math.abs(p1 - q1) / 2 <= edgeLimit) {
            val a = c128(c128(p1 - q1) + 3 * (q0 - p0))
            val f1 = c128(a + 4) >> 3
            val f2 = c128(a + 3) >> 3
            sp(0, s2u(q0 - f1)); sp(-1, s2u(p0 + f2))
          }
        } else {
          val doFilter =
            math.abs(p0 - q0) * 2 + math.abs(p1 - q1) / 2 <= edgeLimit &&
              math.abs(p3 - p2) <= interior && math.abs(p2 - p1) <= interior &&
              math.abs(p1 - p0) <= interior && math.abs(q1 - q0) <= interior &&
              math.abs(q2 - q1) <= interior && math.abs(q3 - q2) <= interior
          if (doFilter) {
            val isHev = math.abs(p1 - p0) > hev || math.abs(q1 - q0) > hev
            if (!mbEdge) {
              val a0 = c128((if (isHev) c128(p1 - q1) else 0) + 3 * (q0 - p0))
              val f1 = c128(a0 + 4) >> 3
              val f2 = c128(a0 + 3) >> 3
              var nq0 = q0 - f1; var np0 = p0 + f2
              sp(0, s2u(nq0)); sp(-1, s2u(np0))
              if (!isHev) {
                val a1 = (f1 + 1) >> 1
                sp(1, s2u(q1 - a1)); sp(-2, s2u(p1 + a1))
              }
            } else {
              if (isHev) {
                val a0 = c128(c128(p1 - q1) + 3 * (q0 - p0))
                val f1 = c128(a0 + 4) >> 3
                val f2 = c128(a0 + 3) >> 3
                sp(0, s2u(q0 - f1)); sp(-1, s2u(p0 + f2))
              } else {
                val w0 = c128(c128(p1 - q1) + 3 * (q0 - p0))
                var a = c128((27 * w0 + 63) >> 7)
                sp(0, s2u(q0 - a)); sp(-1, s2u(p0 + a))
                a = c128((18 * w0 + 63) >> 7)
                sp(1, s2u(q1 - a)); sp(-2, s2u(p1 + a))
                a = c128((9 * w0 + 63) >> 7)
                sp(2, s2u(q2 - a)); sp(-3, s2u(p2 + a))
              }
            }
          }
        }
        k += 1
      }
    }

    var mbY = 0
    while (mbY < mbH) {
      var mbX = 0
      while (mbX < mbW) {
        val mbIdx = mbY * mbW + mbX
        val lvl = levelFor(mbIdx)
        if (lvl > 0) {
          val (interior, mbLim, subLim) = limits(lvl)
          val hev = hevThresh(lvl)
          // sub-block edges only when the MB has coefficients or is B_PRED
          val inner = !mbSkipped(mbIdx) &&
            (mbHasCoeffs(mbIdx) || mbYmode(mbIdx) == B_PRED)
          // left MB edge
          if (mbX > 0) {
            filterEdge(Y, mbX * 16, mbY * 16, vert = true, mbEdge = true,
              interior, mbLim, hev, 16, simple)
            if (!simple) {
              filterEdge(U, mbX * 8, mbY * 8, vert = true, mbEdge = true, interior, mbLim, hev, 8, simpleF = false)
              filterEdge(V, mbX * 8, mbY * 8, vert = true, mbEdge = true, interior, mbLim, hev, 8, simpleF = false)
            }
          }
          if (inner) {
            var i = 1
            while (i < 4) {
              filterEdge(Y, mbX * 16 + 4 * i, mbY * 16, vert = true, mbEdge = false, interior, subLim, hev, 16, simple)
              i += 1
            }
            if (!simple) {
              filterEdge(U, mbX * 8 + 4, mbY * 8, vert = true, mbEdge = false, interior, subLim, hev, 8, simpleF = false)
              filterEdge(V, mbX * 8 + 4, mbY * 8, vert = true, mbEdge = false, interior, subLim, hev, 8, simpleF = false)
            }
          }
          // top MB edge
          if (mbY > 0) {
            filterEdge(Y, mbX * 16, mbY * 16, vert = false, mbEdge = true, interior, mbLim, hev, 16, simple)
            if (!simple) {
              filterEdge(U, mbX * 8, mbY * 8, vert = false, mbEdge = true, interior, mbLim, hev, 8, simpleF = false)
              filterEdge(V, mbX * 8, mbY * 8, vert = false, mbEdge = true, interior, mbLim, hev, 8, simpleF = false)
            }
          }
          if (inner) {
            var i = 1
            while (i < 4) {
              filterEdge(Y, mbX * 16, mbY * 16 + 4 * i, vert = false, mbEdge = false, interior, subLim, hev, 16, simple)
              i += 1
            }
            if (!simple) {
              filterEdge(U, mbX * 8, mbY * 8 + 4, vert = false, mbEdge = false, interior, subLim, hev, 8, simpleF = false)
              filterEdge(V, mbX * 8, mbY * 8 + 4, vert = false, mbEdge = false, interior, subLim, hev, 8, simpleF = false)
            }
          }
        }
        mbX += 1
      }
      mbY += 1
    }
  }

  // =========================================================== encode

  /** Encode a grayscale image, constant per 4×4 block, as a lossy-WebP
    * VP8 keyframe — EXACT by construction: qindex 0 (DC quant 4), every
    * residual DC a multiple of 4 is representable, and (8r+4)>>3 == r
    * for all integers, so decode reproduces `blockVal` bit-for-bit and
    * the closed-form oracles hold. `spelling` selects the bitstream
    * shape: 0 = B_PRED with per-4×4 B_DC sub-modes (block type 3, no
    * Y2); 1 = 16×16 DC_PRED with the Y2/WHT plane (block types 0+1) —
    * spelling 1 requires the image constant per 16×16 MB. Chroma is
    * neutral (U=V=128 → zero chroma residual everywhere), which the
    * BT.601 conversion maps back to exact grayscale.
    *
    * Width/height must be multiples of 16 (whole macroblocks), values in
    * [0, 255]. filterLevel is written to the header (0 for the oracle
    * fixtures; any level is a no-op on constant blocks' interiors). */
  def encodeWebpLossyGray(w: Int, h: Int, blockVal: (Int, Int) => Int,
      spelling: Int = 0, filterLevel: Int = 0): Array[Byte] = {
    require(w % 16 == 0 && h % 16 == 0, "whole macroblocks only")
    val mbW = w / 16
    val mbH = h / 16
    val q = quantFor(0, 0, 0, 0, 0, 0) // y1dc=4, y2dc=8

    // ---- first partition
    val d = new BoolEnc
    d.bool(128, 0) // color space
    d.bool(128, 0) // clamping
    d.bool(128, 0) // segmentation disabled
    d.bool(128, 0) // filter type: normal
    d.literal(6, filterLevel)
    d.literal(3, 0) // sharpness
    d.bool(128, 0) // no lf deltas
    d.literal(2, 0) // one token partition
    d.literal(7, 0) // y_ac_qi = 0
    var i = 0
    while (i < 5) { d.bool(128, 0); i += 1 } // no quantizer deltas
    d.bool(128, 1) // refresh entropy (keyframe convention)
    // no coefficient probability updates
    var t = 0
    while (t < 4) {
      var b = 0
      while (b < 8) {
        var c = 0
        while (c < 3) {
          var k = 0
          while (k < 11) { d.bool(CoeffUpdateProbs(t)(b)(c)(k), 0); k += 1 }
          c += 1
        }
        b += 1
      }
      t += 1
    }
    d.bool(128, 1) // mb_no_skip_coeff present
    d.literal(8, 128) // prob_skip

    // ---- token partition + reconstruction mirror
    val tok = new BoolEnc
    val aboveNz = Array.fill(mbW)(new Array[Boolean](9))
    val recon = Array.ofDim[Int](h / 4, w / 4) // reconstructed per-4x4 value

    def encodeToken(plane: Int, band: Int, ctx: Int, token: Int,
        prevZero: Boolean): Unit =
      tok.tree(CoeffTree, CoeffProbs(plane)(band)(ctx), token,
        start = if (prevZero) 2 else 0)

    /** Encode one block holding a single DC level (or nothing). Returns
      * the nonzero flag. Mirrors decodeBlock's context stepping. */
    def encodeDcBlock(plane: Int, first: Int, level: Int, ctx0: Int): Boolean = {
      if (level == 0) { encodeToken(plane, CoeffBands(first), ctx0, TokEob, prevZero = false); false }
      else {
        val av = math.abs(level)
        val band = CoeffBands(first)
        val token =
          if (av <= 4) av
          else {
            var cat = 5
            while (cat > 0 && av < CatBase(cat)) cat -= 1
            TokCat1 + cat
          }
        encodeToken(plane, band, ctx0, token, prevZero = false)
        if (token >= TokCat1) {
          val cat = token - TokCat1
          val extra = av - CatBase(cat)
          val nbits = Pcat(cat).length
          var k = nbits - 1
          while (k >= 0) { tok.bool(Pcat(cat)(nbits - 1 - k), (extra >> k) & 1); k -= 1 }
        }
        tok.bool(128, if (level < 0) 1 else 0)
        // next token: EOB with the post-value context
        val ctx = if (av == 1) 1 else 2
        encodeToken(plane, CoeffBands(first + 1), ctx, TokEob, prevZero = false)
        true
      }
    }

    var mbY = 0
    while (mbY < mbH) {
      val leftNz = new Array[Boolean](9)
      var mbX = 0
      while (mbX < mbW) {
        if (spelling == 0) {
          // ---- B_PRED spelling
          d.bool(128, 0) // skip = 0
          d.tree(KfYmodeTree, KfYmodeProb, B_PRED)
          var sb = 0
          while (sb < 16) {
            // every sub-mode is B_DC: context is therefore always (B_DC, B_DC)
            d.tree(BmodeTree, KfBmodeProb(B_DC)(B_DC), B_DC)
            sb += 1
          }
          d.tree(UvModeTree, KfUvModeProb, DC_PRED)
          // luma tokens: type 3, coeff 0 = DC
          var blk = 0
          while (blk < 16) {
            val bx4 = mbX * 4 + (blk & 3)
            val by4 = mbY * 4 + (blk >> 2)
            // mirror the decoder's B_DC prediction over reconstructed rows
            val above = if (by4 == 0) 127 else recon(by4 - 1)(bx4)
            val left = if (bx4 == 0) 129 else recon(by4)(bx4 - 1)
            val pred = (4 * above + 4 * left + 4) >> 3
            val target = blockVal(bx4, by4)
            val r = target - pred
            val level = 2 * r // × y1dc (4) = 8r → (8r+4)>>3 = r
            recon(by4)(bx4) = pred + r
            val bx = blk & 3; val by = blk >> 2
            val ctx = (if (aboveNz(mbX)(bx)) 1 else 0) + (if (leftNz(by)) 1 else 0)
            val nz = encodeDcBlock(3, 0, level, ctx)
            aboveNz(mbX)(bx) = nz; leftNz(by) = nz
            blk += 1
          }
        } else {
          // ---- 16×16 DC_PRED + Y2 spelling (image constant per MB)
          val v = blockVal(mbX * 4, mbY * 4)
          d.bool(128, 0) // skip = 0
          d.tree(KfYmodeTree, KfYmodeProb, DC_PRED)
          d.tree(UvModeTree, KfUvModeProb, DC_PRED)
          // DC_PRED over full 16x16: neighbors are reconstructed MBs
          val hasA = mbY > 0; val hasL = mbX > 0
          val aVal = if (hasA) recon(mbY * 4 - 1)(mbX * 4) else 0
          val lVal = if (hasL) recon(mbY * 4)(mbX * 4 - 1) else 0
          val pred =
            if (hasA && hasL) (16 * aVal + 16 * lVal + 16) >> 5
            else if (hasA) (16 * aVal + 8) >> 4
            else if (hasL) (16 * lVal + 8) >> 4
            else 128
          val r = v - pred
          val level = 8 * r // × y2dc (8) = 64r → WHT out (64r+3)>>3 = 8r → idct (8r+4)>>3 = r
          // Y2 block
          val ctxY2 = (if (aboveNz(mbX)(8)) 1 else 0) + (if (leftNz(8)) 1 else 0)
          val nzY2 = encodeDcBlock(1, 0, level, ctxY2)
          aboveNz(mbX)(8) = nzY2; leftNz(8) = nzY2
          // 16 luma blocks: type 0, first coeff 1, all zero → EOB
          var blk = 0
          while (blk < 16) {
            val bx = blk & 3; val by = blk >> 2
            val ctx = (if (aboveNz(mbX)(bx)) 1 else 0) + (if (leftNz(by)) 1 else 0)
            encodeToken(0, CoeffBands(1), ctx, TokEob, prevZero = false)
            aboveNz(mbX)(bx) = false; leftNz(by) = false
            blk += 1
          }
          var y4 = 0
          while (y4 < 4) {
            var x4 = 0
            while (x4 < 4) { recon(mbY * 4 + y4)(mbX * 4 + x4) = v; x4 += 1 }
            y4 += 1
          }
        }
        // chroma: neutral (residual 0 — prediction reproduces 128
        // everywhere, first MB from the no-neighbor default, later MBs
        // from reconstructed 128 neighbors) → 8 EOB blocks
        var pl = 0
        while (pl < 2) {
          var cb = 0
          while (cb < 4) {
            val bx = cb & 1; val by = cb >> 1
            val ai = 4 + 2 * pl + bx
            val li = 4 + 2 * pl + by
            val ctx = (if (aboveNz(mbX)(ai)) 1 else 0) + (if (leftNz(li)) 1 else 0)
            encodeToken(2, 0, ctx, TokEob, prevZero = false)
            aboveNz(mbX)(ai) = false; leftNz(li) = false
            cb += 1
          }
          pl += 1
        }
        mbX += 1
      }
      mbY += 1
    }

    val part0 = d.finish()
    val part1 = tok.finish()

    // ---- frame tag + container
    val frame = new scala.collection.mutable.ArrayBuffer[Byte]()
    val tag0 = (part0.length << 5) | (1 << 4) | 0 // keyframe, show, version 0
    frame += (tag0 & 0xff).toByte
    frame += ((tag0 >> 8) & 0xff).toByte
    frame += ((tag0 >> 16) & 0xff).toByte
    frame += 0x9d.toByte; frame += 0x01.toByte; frame += 0x2a.toByte
    frame += (w & 0xff).toByte; frame += ((w >> 8) & 0x3f).toByte
    frame += (h & 0xff).toByte; frame += ((h >> 8) & 0x3f).toByte
    frame ++= part0
    frame ++= part1

    riffWebp("VP8 ", frame.toArray)
  }

  /** Wrap a chunk payload in a RIFF/WEBP container. */
  private[operators] def riffWebp(fourcc: String, payload: Array[Byte]): Array[Byte] = {
    val padded = payload.length + (payload.length & 1)
    val total = 4 + 8 + padded
    val out = new Array[Byte](8 + total)
    def put4(i: Int, s: String): Unit = {
      out(i) = s.charAt(0).toByte; out(i + 1) = s.charAt(1).toByte
      out(i + 2) = s.charAt(2).toByte; out(i + 3) = s.charAt(3).toByte
    }
    def le32(i: Int, v: Int): Unit = {
      out(i) = (v & 0xff).toByte; out(i + 1) = ((v >> 8) & 0xff).toByte
      out(i + 2) = ((v >> 16) & 0xff).toByte; out(i + 3) = ((v >> 24) & 0xff).toByte
    }
    put4(0, "RIFF"); le32(4, total); put4(8, "WEBP")
    put4(12, fourcc); le32(16, payload.length)
    System.arraycopy(payload, 0, out, 20, payload.length)
    out
  }
}
