package graft.operators

/** From-scratch JPEG (ITU-T T.81) codec — no codec library.
  *
  * Decoder: baseline/extended sequential AND progressive DCT, 8-bit
  * precision. The full pixel path is implemented from the public spec:
  * marker/segment walk (SOI/APPn/COM/DQT/DHT/DRI/SOF0/SOF1/SOF2/SOS),
  * canonical Huffman decode (T.81 F.16: mincode/maxcode/valptr), DC
  * prediction + EXTEND sign recovery (F.12), AC run-length with
  * ZRL/EOB, zigzag→natural reorder, dequantization, double-precision
  * separable IDCT (A.3.3), byte-stuffing (FF 00) and restart-marker
  * handling, chroma upsampling by sample replication for any h/v in
  * 1..4 (covers 4:4:4, 4:2:2, 4:4:0, 4:2:0), and JFIF YCbCr→RGB
  * (single-component scans decode as grayscale). Progressive frames
  * (Annex G) accumulate coefficients across the scan script — DC
  * first/refinement, per-band AC first/refinement with EOB-run coding
  * and successive-approximation correction bits — and reconstruct at
  * EOI. ARITHMETIC-coded frames decode for real since round 16 — both
  * sequential (SOF9: the QM coder [[QmCoder]] plus the F.2.4 DC/AC
  * statistical model, DAC conditioning parsed with spec defaults) and
  * PROGRESSIVE (SOF10: the G.2 scan-script models — DC first/refine,
  * AC first/refine with previous-stage EOB gating), both
  * ImageIO-cross-checked. HIERARCHICAL sequences (Annex J) decode for
  * real too since round 16: DHP declares the final geometry, a
  * non-differential base frame seeds the reference plane, EXP doubles
  * it with the J.1.1.2 bilinear ((a+b+1)>>1, edge-replicated) filter,
  * and DIFFERENTIAL frames add their un-level-shifted signed
  * corrections. Since round 17 EVERY 8-bit frame type of T.81 Table
  * B.1 decodes for real: the differential family spans all six
  * spellings (SOF5/SOF6 Huffman sequential/progressive DCT,
  * SOF13/SOF14 arithmetic, SOF7/SOF15 differential LOSSLESS — the
  * exact-refinement stages), and standalone LOSSLESS comes in both
  * entropies (SOF3 Huffman, SOF11 ARITHMETIC via the Annex H.1
  * (left, above) difference-class conditioning through the QM coder).
  * 12-bit sample precision covers every non-differential DCT carrier
  * (SOF1/SOF2/SOF9/SOF10 — round 18 closed the family), and lossless
  * runs the full 8..16 range and 1/3 components in BOTH entropies.
  * Lossless restart intervals decode in BOTH entropies at ARBITRARY
  * sample positions (round 19 — the interval counts MCUs per T.81 H.1;
  * the interval's first sample takes the default prediction and the
  * remainder of that line the 1-D predictor, with the row-aligned form
  * a special case the agreement specs pin bit-for-bit), INCLUDING
  * restarts inside differential-lossless (SOF7/SOF15) refinement scans
  * — no labeled JPEG restart refusal remains. Malformed/unsupported
  * payloads return None → the labeled stub path:
  * corrupt media in a 100 TB crawl is data, not an error.
  *
  * Encoder (fixtures + round-trip tests): baseline sequential, quant
  * tables all-ones, grayscale or 4:4:4 YCbCr, double-precision FDCT.
  * Huffman tables are generated, not Annex-K: all 12 DC categories at
  * code length 4 and all 162 (run,size) AC symbols at length 8 — a
  * valid canonical table any conformant decoder (ours, ImageIO's)
  * accepts; the only cost is compression ratio, irrelevant for
  * fixtures. With all-ones quant tables an image whose 8×8 blocks are
  * each CONSTANT round-trips bit-exactly through ANY conformant
  * decoder: a constant block's FDCT is DC-only (AC terms are
  * mathematically zero) and the DC value 8·(v−128) is an exact
  * integer, so there is no quantization or IDCT rounding anywhere —
  * which is what lets q47's JPEG rows keep a closed-form DuckDB
  * oracle while exercising the real entropy/transform path
  * (multi-block images also exercise cross-block DC prediction).
  *
  * Reference capability: multimodal feature extraction over binary
  * columns (BASELINE.md north star).
  */
object JpegCodec {
  import PixelCodec.PixelImage

  private val MaxPixels = 1 << 26 // keep in step with PixelCodec

  /** Corrupt/unsupported stream sentinel — cheap, stackless. */
  private final class Corrupt extends RuntimeException(null, null, false, false)
  private def corrupt(): Nothing = throw new Corrupt

  /** Zigzag scan position → natural (row-major) index, T.81 fig. A.6. */
  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  private val CosT = Array.tabulate(8, 8)((x, u) =>
    math.cos((2 * x + 1) * u * math.Pi / 16))
  private val Cn = Array.tabulate(8)(u => if (u == 0) 1.0 / math.sqrt(2.0) else 1.0)

  // ------------------------------------------------------------- decode

  /** Canonical Huffman table in T.81 F.16 DECODE form. */
  private final class HuffTable(bits: Array[Int], val huffval: Array[Byte]) {
    val mincode = new Array[Int](17)
    val maxcode = new Array[Int](17) // -1 = no codes of this length
    val valptr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l) > 0) {
          valptr(l) = k
          mincode(l) = code
          code += bits(l); k += bits(l)
          maxcode(l) = code - 1
        } else maxcode(l) = -1
        code <<= 1
        l += 1
      }
      if (k != huffval.length) corrupt()
    }
  }

  /** Entropy-segment bit reader: MSB-first, FF00 byte-stuffing; any
    * other marker ends the segment (reading past it is corrupt). */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var cnt = 0

    def nextBit(): Int = {
      if (cnt == 0) {
        if (pos >= b.length) corrupt()
        var v = b(pos) & 0xff; pos += 1
        if (v == 0xff) {
          if (pos >= b.length) corrupt()
          if ((b(pos) & 0xff) == 0) pos += 1 // stuffed data FF
          else corrupt() // real marker inside entropy data
        }
        acc = v; cnt = 8
      }
      cnt -= 1
      (acc >> cnt) & 1
    }

    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | nextBit(); i += 1 }
      v
    }

    def decode(t: HuffTable): Int = { // T.81 F.16
      var code = nextBit()
      var l = 1
      while (t.maxcode(l) < code || t.maxcode(l) == -1) {
        l += 1
        if (l > 16) corrupt()
        code = (code << 1) | nextBit()
      }
      t.huffval(t.valptr(l) + code - t.mincode(l)) & 0xff
    }

    /** Byte-align and consume an RSTn marker (T.81 §B.2.1.2). */
    def restart(): Unit = {
      cnt = 0
      if (pos + 1 >= b.length || (b(pos) & 0xff) != 0xff) corrupt()
      val m = b(pos + 1) & 0xff
      if (m < 0xd0 || m > 0xd7) corrupt()
      pos += 2
    }
  }

  private def extend(v: Int, s: Int): Int = // T.81 F.12
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  private final class Component(val id: Int, val h: Int, val v: Int, val tq: Int) {
    var dcTable: HuffTable = null
    var acTable: HuffTable = null
    var dcSel = 0 // DC entropy-table/conditioning-table id from SOS
    var acSel = 0 // AC id
    var pred = 0
    var plane: Array[Byte] = null // pw × ph samples
    var pw = 0
    var ph = 0
    // progressive state: coefficient buffer in natural order, one 64-entry
    // block per (bw × bh) MCU-padded grid slot; nbw/nbh is the
    // NON-interleaved grid (ceil(componentSize/8)) single-component scans
    // traverse (T.81 A.2.2)
    var coefs: Array[Int] = null
    var bw = 0
    var bh = 0
    var nbw = 0
    var nbh = 0
  }

  def decode(b: Array[Byte]): Option[PixelImage] = {
    if (b == null || b.length < 4 ||
        (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    try decodeImpl(b)
    catch {
      case _: Corrupt => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
      // the QM coder reports malformed restart-marker structure this
      // way (missing or non-RSTn marker at a DRI boundary in an
      // arithmetic scan) — corrupt media is data, not an error
      case _: IllegalStateException => None
    }
  }

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  private def decodeImpl(b: Array[Byte]): Option[PixelImage] = {
    val qt = new Array[Array[Int]](4) // zigzag order, as stored in DQT
    val dcTables = new Array[HuffTable](4)
    val acTables = new Array[HuffTable](4)
    var comps: Array[Component] = null
    var width = 0
    var height = 0
    var restartInterval = 0
    var progressive = false
    var arithCoded = false // SOF9/SOF10: arithmetic entropy
    var lossless = false // SOF3: predictive lossless
    var precision = 8 // sample precision P (see the SOF handler's gate)
    var progScans = 0 // progressive scans successfully processed
    // hierarchical mode (T.81 Annex J): DHP declares the final
    // geometry, frames accumulate into a reference plane, EXP doubles
    // it between frames, SOF5 frames ADD signed corrections
    var hier = false
    var hierW = 0
    var hierH = 0
    var hierRef: Array[Int] = null // reference plane, refW × refH
    var refW = 0
    var refH = 0
    var differential = false
    // DAC conditioning (T.81 B.2.4.3): DC bounds L/U and AC Kx per
    // table id; spec defaults when no DAC segment appears
    val dcL = Array.fill(4)(0)
    val dcU = Array.fill(4)(1)
    val acK = Array.fill(4)(5)
    // a DIFFERENTIAL PROGRESSIVE frame (SOF6/SOF14) in a hierarchical
    // sequence accumulates coefficients across its scan script like any
    // progressive frame; it FINALIZES (raw IDCT + add to the reference)
    // when the next frame header / EXP / EOI arrives — these carry the
    // pending frame between markers
    var hierProgPending = false
    var hierProgComp: Component = null
    var hierProgW = 0
    var hierProgH = 0
    def finalizeHierProg(): Unit = if (hierProgPending) {
      val c = hierProgComp
      val q = qt(c.tq)
      if (q == null) corrupt()
      val dq = new Array[Int](64)
      val pix = new Array[Int](64)
      var by = 0
      while (by < c.bh) {
        var bx = 0
        while (bx < c.bw) {
          val base = (by * c.bw + bx) * 64
          var k = 0
          while (k < 64) {
            val n = ZigZag(k)
            dq(n) = c.coefs(base + n) * q(k)
            k += 1
          }
          idctRaw(dq, pix)
          landHierBlock(hierRef, refW, hierProgW, hierProgH,
            bx * 8, by * 8, pix, diff = true)
          bx += 1
        }
        by += 1
      }
      hierProgPending = false
      hierProgComp = null
      c.coefs = null
      comps = null
      progressive = false
      differential = false
    }

    var i = 2
    while (i + 1 < b.length) { // EOI can be the final two bytes
      if ((b(i) & 0xff) != 0xff) corrupt()
      while (i + 1 < b.length && (b(i + 1) & 0xff) == 0xff) i += 1 // fill bytes
      if (i + 1 >= b.length) corrupt()
      val m = b(i + 1) & 0xff
      if (m == 0xd9) { // EOI: progressive/hierarchical reconstruct here
        finalizeHierProg()
        return if (progressive && progScans > 0)
          Some(finishProgressive(comps, width, height, qt, precision))
        else if (hier && hierRef != null && refW == hierW && refH == hierH)
          Some(grayImage(hierRef, hierW, hierH))
        else None
      }
      if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) { i += 2 }
      else {
        if (i + 4 > b.length) corrupt()
        val len = be16(b, i + 2)
        if (len < 2 || i + 2 + len > b.length) corrupt()
        val seg = i + 4 // first payload byte
        val segEnd = i + 2 + len
        m match {
          case 0xdb => // DQT: one or more tables
            var p = seg
            while (p < segEnd) {
              val pq = (b(p) & 0xff) >> 4
              val tq = b(p) & 0x0f
              if (pq > 1 || tq > 3) corrupt()
              val t = new Array[Int](64)
              p += 1
              var k = 0
              while (k < 64) {
                t(k) = if (pq == 0) b(p) & 0xff else be16(b, p)
                p += 1 + pq
                k += 1
              }
              qt(tq) = t
            }
          case 0xc4 => // DHT: one or more tables
            var p = seg
            while (p < segEnd) {
              val tc = (b(p) & 0xff) >> 4
              val th = b(p) & 0x0f
              if (tc > 1 || th > 3) corrupt()
              val bits = new Array[Int](17)
              var total = 0
              var l = 1
              while (l <= 16) { bits(l) = b(p + l) & 0xff; total += bits(l); l += 1 }
              if (total > 256 || p + 17 + total > segEnd) corrupt()
              val vals = java.util.Arrays.copyOfRange(b, p + 17, p + 17 + total)
              val t = new HuffTable(bits, vals)
              if (tc == 0) dcTables(th) = t else acTables(th) = t
              p += 17 + total
            }
          case 0xdd => // DRI
            restartInterval = be16(b, seg)
          case 0xcc => // DAC: arithmetic conditioning (Tc/Tb, Cs) pairs
            var p = seg
            while (p + 1 < segEnd) {
              val tc = (b(p) & 0xff) >> 4
              val tb = b(p) & 0x0f
              val cs = b(p + 1) & 0xff
              if (tb > 3) corrupt()
              if (tc == 0) { // DC: Cs packs U (high nibble) over L (low)
                dcL(tb) = cs & 0x0f
                dcU(tb) = cs >> 4
                if (dcL(tb) > dcU(tb)) corrupt()
              } else if (tc == 1) { // AC: Cs is Kx (1..63)
                if (cs < 1 || cs > 63) corrupt()
                acK(tb) = cs
              } else corrupt()
              p += 2
            }
          case 0xc0 | 0xc1 | 0xc2 | 0xc9 | 0xca | 0xc3 | 0xcb | 0xc5 |
               0xc6 | 0xcd | 0xce | 0xc7 | 0xcf =>
            // Every 8-bit frame type of T.81 Table B.1 decodes for real:
            // SOF0/1 sequential + SOF2 progressive (Huffman), SOF9/SOF10
            // their arithmetic spellings, SOF3 lossless (Huffman) +
            // SOF11 lossless ARITHMETIC (Annex H.1 conditioning through
            // the QM coder), and the DIFFERENTIAL family inside
            // hierarchical sequences — SOF5/SOF6 Huffman sequential/
            // progressive DCT, SOF13/SOF14 their arithmetic spellings,
            // SOF7/SOF15 differential LOSSLESS (Huffman/arithmetic), the
            // exact-refinement final stages
            finalizeHierProg() // a new frame header ends a pending one
            // sample precision: 8 everywhere; 12-bit DCT planes scale
            // to 8-bit output by >> 4, lossless P>8 by >> (P−8)
            precision = b(seg) & 0xff
            if (precision != 8) {
              // 12-bit for every non-differential DCT carrier T.81 B.1
              // defines (SOF1 ext. sequential, SOF2 progressive, SOF9/
              // SOF10 their arithmetic spellings — round 18 closed the
              // family); 8..16 for lossless, Huffman AND arithmetic
              val ok = !hier &&
                ((precision == 12 &&
                  (m == 0xc1 || m == 0xc2 || m == 0xc9 || m == 0xca)) ||
                  (precision > 8 && precision <= 16 &&
                    (m == 0xc3 || m == 0xcb)))
              if (!ok) return None
            }
            progressive = m == 0xc2 || m == 0xca || m == 0xc6 || m == 0xce
            arithCoded = m == 0xc9 || m == 0xca || m == 0xcb ||
              m == 0xcd || m == 0xce || m == 0xcf
            lossless = m == 0xc3 || m == 0xcb || m == 0xc7 || m == 0xcf
            differential = m == 0xc5 || m == 0xc6 || m == 0xcd ||
              m == 0xce || m == 0xc7 || m == 0xcf
            if (differential && !hier) return None // J.1: needs a DHP sequence
            height = be16(b, seg + 1)
            width = be16(b, seg + 3)
            val nf = b(seg + 5) & 0xff
            if (width <= 0 || height <= 0 || (nf != 1 && nf != 3)) return None
            if (width.toLong * height > MaxPixels) return None
            comps = Array.tabulate(nf) { c =>
              val p = seg + 6 + c * 3
              val hv = b(p + 1) & 0xff
              val comp = new Component(b(p) & 0xff, hv >> 4, hv & 0x0f, b(p + 2) & 0x0f)
              if (comp.h < 1 || comp.h > 4 || comp.v < 1 || comp.v > 4) corrupt()
              comp
            }
          case 0xde => // DHP: hierarchical sequence header (T.81 B.3.2)
            if ((b(seg) & 0xff) != 8) return None
            hierH = be16(b, seg + 1)
            hierW = be16(b, seg + 3)
            val nf = b(seg + 5) & 0xff
            if (hierW <= 0 || hierH <= 0) return None
            if (nf != 1) return None // grayscale hierarchical scope
            if (hierW.toLong * hierH > MaxPixels) return None
            hier = true
          case 0xdf => // EXP: double the reference before the next frame
            finalizeHierProg() // EXP ends any pending progressive frame
            if (!hier || hierRef == null) corrupt()
            val eh = (b(seg) & 0xff) >> 4
            val ev = b(seg) & 0x0f
            if (eh > 1 || ev > 1) corrupt()
            // bound the TARGET size before allocating anything — a
            // crafted EXP on a MaxPixels-sized reference must refuse,
            // not transiently allocate 4× it first
            if ((refW.toLong << eh) * (refH.toLong << ev) > MaxPixels)
              corrupt()
            if (eh == 1) {
              hierRef = expandH(hierRef, refW, refH)
              refW *= 2
            }
            if (ev == 1) {
              hierRef = expandV(hierRef, refW, refH)
              refH *= 2
            }
          case 0xda => // SOS → entropy-coded data follows
            if (comps == null) corrupt()
            val ns = b(seg) & 0xff
            if (ns < 1 || ns > comps.length) corrupt()
            var p = seg + 1
            val scanComps = new Array[Component](ns)
            var c = 0
            while (c < ns) {
              val cs = b(p) & 0xff
              val comp = comps.find(_.id == cs).getOrElse(corrupt())
              val tt = b(p + 1) & 0xff
              comp.dcSel = tt >> 4
              comp.acSel = tt & 0x0f
              comp.dcTable = dcTables(tt >> 4)
              comp.acTable = acTables(tt & 0x0f)
              if (!lossless && qt(comp.tq) == null) corrupt() // SOF3 has no DQT
              scanComps(c) = comp
              p += 2
              c += 1
            }
            val ss = b(p) & 0xff
            val se = b(p + 1) & 0xff
            val ah = (b(p + 2) & 0xff) >> 4
            val al = b(p + 2) & 0x0f
            if (hier) {
              // hierarchical scope: sequential AND progressive DCT
              // frames (Huffman OR arithmetic) plus the differential
              // LOSSLESS refinement stages (SOF7 Huffman / SOF15
              // arithmetic), grayscale 1×1 (the pyramid shape the
              // encoder writes); non-differential lossless and
              // non-differential progressive frames inside a DHP
              // sequence → labeled stub (no base-frame spelling we can
              // cross-check emits them)
              if ((progressive || lossless) && !differential) return None
              if (comps.length != 1 || ns != 1 ||
                  comps(0).h != 1 || comps(0).v != 1) return None
              val c0 = comps(0)
              if (!arithCoded && c0.dcTable == null &&
                  !(progressive && ah != 0)) corrupt()
              if (!arithCoded && !lossless && !progressive &&
                  c0.acTable == null) corrupt()
              // (the scan-component loop above already verified qt for
              // non-lossless frames)
              if (differential) {
                // frame geometry must match the (possibly EXPanded)
                // reference — a mismatch would mis-register corrections
                if (hierRef == null || width != refW || height != refH)
                  return None
              } else {
                hierRef = new Array[Int](width * height)
                refW = width
                refH = height
              }
              if (progressive) {
                // SOF6/SOF14: the frame's scans accumulate like SOF2/
                // SOF10; finalizeHierProg lands the raw-IDCT corrections
                // when the frame ends (next SOF/EXP/EOI)
                if (ss > 0 && !arithCoded && c0.acTable == null) corrupt()
                if (c0.coefs == null) allocProgressive(comps, width, height)
                hierProgPending = true
                hierProgComp = c0
                hierProgW = width
                hierProgH = height
                i =
                  if (arithCoded)
                    processProgressiveArithScan(b, segEnd, comps, scanComps,
                      ss, se, ah, al, restartInterval, width, height,
                      dcL, dcU, acK)
                  else processProgressiveScan(b, segEnd, comps, scanComps,
                    ss, se, ah, al, restartInterval, width, height)
                // frame stays pending: differential/comps survive into
                // the next scan of the same frame
              } else {
                i =
                  if (lossless) {
                    // H.2: differential lossless codes the differences
                    // directly — no prediction (Ss = 0); point-transform
                    // and restart-interval variants are out of scope
                    if (ss != 0 || al != 0) return None
                    if (arithCoded)
                      decodeDiffLosslessArithScan(b, segEnd, width, height,
                        restartInterval, hierRef, refW,
                        dcL(c0.dcSel), dcU(c0.dcSel))
                    else decodeDiffLosslessScan(b, segEnd, c0, width, height,
                      restartInterval, hierRef, refW)
                  } else if (arithCoded)
                    decodeArithScan(b, segEnd, comps, width, height, qt,
                      restartInterval, dcL, dcU, acK, hierRef, refW,
                      differential)
                  else decodeHierScan(b, segEnd, c0, width, height, qt,
                    restartInterval, hierRef, refW, differential)
                differential = false
                comps = null // next frame brings its own SOF
              }
            } else if (lossless) {
              // SOF3 (Huffman) / SOF11 (arithmetic): 1×1 sampling, Ss
              // selects the predictor, Al is the point transform. BOTH
              // spellings decode 3-COMPONENT interleaved scans (lossless
              // carries NO implied color transform — T.81 is
              // colorspace-blind here — so frame component order maps
              // directly to R,G,B, the convention of every lossless RGB
              // producer absent an Adobe APP14), the full 8..16
              // precision range, and row-aligned RESTART INTERVALS in
              // BOTH entropies (arithmetic since round 18).
              if (ns != comps.length ||
                  comps.exists(c => c.h != 1 || c.v != 1)) return None
              if (comps.length != 1 && comps.length != 3) return None
              if (arithCoded) {
                // round 18: SOF11 gained 3-component interleaved scans
                // and the full 8..16 precision range, matching SOF3
                decodeLosslessArithScan(b, segEnd, scanComps, width, height,
                  ss, al, restartInterval, dcL, dcU, precision)
                return Some(
                  if (comps.length == 1) toRgb(comps, width, height)
                  else losslessRgb(comps, width, height))
              }
              decodeLosslessScan(b, segEnd, scanComps, width, height,
                ss, al, restartInterval, precision)
              return Some(
                if (comps.length == 1) toRgb(comps, width, height)
                else losslessRgb(comps, width, height))
            } else if (arithCoded && !progressive) {
              if (ns != comps.length) return None // interleaved only, like SOF0
              decodeArithScan(b, segEnd, comps, width, height, qt,
                restartInterval, dcL, dcU, acK, precision = precision)
              return Some(toRgb(comps, width, height))
            } else if (!progressive) {
              if (ns != comps.length) return None // non-interleaved sequential: out of scope
              scanComps.foreach(sc =>
                if (sc.dcTable == null || sc.acTable == null) corrupt())
              decodeScan(b, segEnd, comps, width, height, qt, restartInterval,
                precision)
              return Some(toRgb(comps, width, height))
            } else {
              if (comps(0).coefs == null) allocProgressive(comps, width, height)
              i =
                if (arithCoded)
                  processProgressiveArithScan(b, segEnd, comps, scanComps,
                    ss, se, ah, al, restartInterval, width, height,
                    dcL, dcU, acK)
                else processProgressiveScan(b, segEnd, comps, scanComps,
                  ss, se, ah, al, restartInterval, width, height,
                  maxDc = if (precision == 12) 16 else 15)
              progScans += 1
            }
          case _ => // APPn / COM / anything else with a length field
        }
        // progressive and hierarchical SOS set `i` past the entropy
        // data themselves; everything else resumes at the segment end
        if (!(m == 0xda && (progressive || hier))) i = segEnd
      }
    }
    None
  }

  /** Decode one sequential-Huffman block into `coef` (natural order,
    * dequantized): DC category + EXTENDed diff against the running
    * predictor, AC run/size with ZRL/EOB — shared by [[decodeScan]]
    * and the hierarchical [[decodeHierScan]]. */
  private def decodeHuffBlock(r: BitReader, c: Component, q: Array[Int],
      coef: Array[Int], maxDc: Int = 15): Unit = {
    java.util.Arrays.fill(coef, 0)
    val s = r.decode(c.dcTable)
    if (s > maxDc) corrupt()
    c.pred += extend(r.receive(s), s)
    coef(0) = c.pred * q(0)
    var k = 1
    var done = false
    while (!done && k < 64) {
      val rs = r.decode(c.acTable)
      val run = rs >> 4
      val size = rs & 0x0f
      if (size == 0) {
        if (run == 15) k += 16 else done = true
      } else {
        k += run
        if (k > 63) corrupt()
        coef(ZigZag(k)) = extend(r.receive(size), size) * q(k)
        k += 1
      }
    }
  }

  /** One DIFFERENTIAL LOSSLESS scan (SOF7, T.81 H.2 inside an Annex-J
    * sequence): per sample, a DC-table category + EXTENDed difference
    * coded directly (no spatial prediction — that is the reference
    * plane's job), added to the reference modulo 2^16 with the low 8
    * bits kept (the spec's modulo arithmetic at P = 8). This is the
    * EXACT-refinement final stage: ref + diff reproduces arbitrary
    * images bit-for-bit. Returns the position after the entropy data. */
  private def decodeDiffLosslessScan(b: Array[Byte], start: Int,
      c: Component, width: Int, height: Int, ri: Int,
      ref: Array[Int], refW: Int): Int = {
    val r = new BitReader(b, start)
    // restart intervals (round 19 — the last JPEG refusal closed): a
    // differential scan has no prediction chain, so the restart is
    // purely the entropy reset at any MCU position (H.2 via F.1.4)
    var mcu = 0L
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        if (ri > 0 && mcu > 0 && mcu % ri == 0) r.restart()
        val s = r.decode(c.dcTable)
        if (s > 16) corrupt()
        val diff =
          if (s == 0) 0
          else if (s == 16) 32768 // T.81 lossless special category
          else extend(r.receive(s), s)
        val o = y * refW + x
        ref(o) = ((ref(o) + diff) & 0xffff) & 0xff
        mcu += 1
        x += 1
      }
      y += 1
    }
    r.pos
  }

  // ------------------------------ lossless ARITHMETIC (SOF11 / SOF15)

  /** T.81 H.1.1 five-way classification of a neighbor's prediction
    * difference under the DC conditioning bounds (L, U): 0 zero/near-
    * zero, 1 +small, 2 −small, 3 +large, 4 −large. Uses the same
    * magnitude-category convention as the DC model's context update
    * (`m` = the power-of-two floor of |D|−1). */
  private def losslessDiffClass(d: Int, l: Int, u: Int): Int = {
    if (d == 0) return 0
    val m = Integer.highestOneBit(math.abs(d) - 1) // 0 for |d| == 1
    if (m < ((1 << l) >> 1)) 0
    else if (m <= ((1 << u) >> 1)) { if (d > 0) 1 else 2 }
    else { if (d > 0) 3 else 4 }
  }

  /** One prediction difference through the Annex H.1 statistical model:
    * 25 combined (left, above) context classes, each owning its
    * S0/SS/SP/SN decision bins, with TWO X/M magnitude ladders selected
    * by whether the ABOVE class is large — H.1's conditioning shape.
    * Bin numbering is this codec's own fixed convention, exactly
    * mirrored by [[encodeLosslessDiffArith]]: no independently-decoding
    * implementation of SOF11/SOF15 exists to pin bit-level numbering
    * against (ImageIO rejects the frame types outright), so conformance
    * is bit-exact round-trip plus cross-frame-type pixel agreement with
    * the Huffman lossless spellings (SOF3/SOF7), which JpegCodecSpec
    * pins. Stats area: 25×4 decision bins (0–99) + ladder A at 100 +
    * ladder B at 130 (each 15 X bins with M bins trailing by 14). */
  private def decodeLosslessDiffArith(dec: QmCoder.Decoder,
      st: QmCoder.Stats, ca: Int, cb: Int): Int = {
    val ctx = (ca * 5 + cb) * 4
    if (dec.decode(st, ctx) == 0) return 0
    val sign = dec.decode(st, ctx + 1)
    var m = dec.decode(st, ctx + 2 + sign)
    var xst = ctx + 2 + sign
    if (m != 0) {
      xst = if (cb >= 3) 130 else 100
      while (dec.decode(st, xst) != 0) {
        m <<= 1
        if (m == 0x8000) corrupt()
        xst += 1
      }
    }
    var v = m
    var mm = m
    val mb = xst + 14
    while ({ mm >>= 1; mm != 0 }) if (dec.decode(st, mb) != 0) v |= mm
    v += 1
    if (sign != 0) -v else v
  }

  /** Encoding mirror of [[decodeLosslessDiffArith]]. `diff` must lie in
    * [−32768, 32767] (the signed-16 window of the mod-2^16 arithmetic —
    * encoders fold `(sample − pred) & 0xffff` through a short cast). */
  private def encodeLosslessDiffArith(enc: QmCoder.Encoder,
      st: QmCoder.Stats, ca: Int, cb: Int, diff: Int): Unit = {
    val ctx = (ca * 5 + cb) * 4
    if (diff == 0) { enc.encode(st, ctx, 0); return }
    enc.encode(st, ctx, 1)
    val sign = if (diff < 0) 1 else 0
    enc.encode(st, ctx + 1, sign)
    val v = math.abs(diff) - 1
    if (v == 0) { enc.encode(st, ctx + 2 + sign, 0); return }
    enc.encode(st, ctx + 2 + sign, 1)
    var m = 1
    var xst = if (cb >= 3) 130 else 100
    while (2 * m <= v) { enc.encode(st, xst, 1); m <<= 1; xst += 1 }
    enc.encode(st, xst, 0)
    var mm = m
    val mb = xst + 14
    while ({ mm >>= 1; mm != 0 })
      enc.encode(st, mb, if ((v & mm) != 0) 1 else 0)
  }

  /** LOSSLESS scan with ARITHMETIC entropy coding (SOF11, Annexes H.1 +
    * D): the same seven predictors / defaults / mod-2^16 arithmetic /
    * P>8 handling as [[decodeLosslessScan]] — including 3-COMPONENT
    * interleaved scans (round 18; component order maps to R,G,B like
    * the Huffman spelling) — entropy through the QM coder conditioned
    * on the (left, above) difference classes. Statistics areas are per
    * DC table destination (T.81's conditioning-table binding), so two
    * components sharing a destination share adaptation state. Returns
    * the position after the entropy data. */
  private def decodeLosslessArithScan(b: Array[Byte], start: Int,
      scanComps: Array[Component], width: Int, height: Int, predSel: Int,
      pt: Int, ri: Int, dcL: Array[Int], dcU: Array[Int],
      prec: Int = 8): Int = {
    if (predSel < 1 || predSel > 7 || pt > 7) corrupt()
    val nc = scanComps.length
    scanComps.foreach { c =>
      c.pw = width
      c.ph = height
      c.plane = new Array[Byte](width * height)
    }
    // Restart intervals (round 19 — generalized to ARBITRARY sample
    // positions, the decodeLosslessScan reading): the restart resets
    // the QM coder, its statistics areas, and prediction exactly as at
    // the start of the scan (T.81 H.1 + F.1.4.1); the interval's first
    // (partial) line uses the 1-D predictor with zeroed conditioning at
    // the restart column, agreeing bit-for-bit with the SOF3 Huffman
    // spelling's interval semantics (the agreement specs pin it).
    val statsBySel = scanComps.map(_.dcSel).distinct
      .map(s => s -> new QmCoder.Stats(160)).toMap
    var dec = new QmCoder.Decoder(b, start, b.length)
    val defaultPred = 1 << (prec - 1 - pt)
    val down = prec - 8
    val prev = Array.ofDim[Int](nc, width)
    val cur = Array.ofDim[Int](nc, width)
    val dPrev = Array.ofDim[Int](nc, width)
    val dCur = Array.ofDim[Int](nc, width)
    var riX = 0
    var riY = 0
    var mcu = 0L
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        if (ri > 0 && mcu > 0 && mcu % ri == 0) {
          dec = new QmCoder.Decoder(b, dec.posAfterRestart(), b.length)
          statsBySel.values.foreach(_.reset())
          riX = x
          riY = y
        }
        val firstLine = y == riY
        var ci = 0
        while (ci < nc) {
          val c = scanComps(ci)
          val l = dcL(c.dcSel)
          val u = dcU(c.dcSel)
          val ca =
            if (x == 0 || (firstLine && x == riX)) 0
            else losslessDiffClass(dCur(ci)(x - 1), l, u)
          val cb = if (firstLine) 0 else losslessDiffClass(dPrev(ci)(x), l, u)
          val d = decodeLosslessDiffArith(dec, statsBySel(c.dcSel), ca, cb)
          val cl = cur(ci)
          val pl = prev(ci)
          val pred =
            if (firstLine && x == riX) defaultPred
            else if (firstLine) cl(x - 1)
            else if (x == 0) pl(0)
            else {
              val a = cl(x - 1)
              val bb = pl(x)
              val cc = pl(x - 1)
              predSel match {
                case 1 => a
                case 2 => bb
                case 3 => cc
                case 4 => a + bb - cc
                case 5 => a + ((bb - cc) >> 1)
                case 6 => bb + ((a - cc) >> 1)
                case _ => (a + bb) >> 1
              }
            }
          cl(x) = (pred + d) & 0xffff
          dCur(ci)(x) = d
          ci += 1
        }
        mcu += 1
        x += 1
      }
      var ci = 0
      while (ci < nc) {
        val c = scanComps(ci)
        val cl = cur(ci)
        var i2 = 0
        while (i2 < width) {
          c.plane(y * width + i2) =
            ((((cl(i2) << pt) & 0xffff) >> down) & 0xff).toByte
          i2 += 1
        }
        System.arraycopy(cl, 0, prev(ci), 0, width)
        System.arraycopy(dCur(ci), 0, dPrev(ci), 0, width)
        ci += 1
      }
      y += 1
    }
    dec.endPos
  }

  /** DIFFERENTIAL LOSSLESS scan with ARITHMETIC coding (SOF15, H.2 +
    * H.1 inside an Annex-J sequence): per-sample differences — no
    * spatial prediction — added to the reference mod 2^16, conditioned
    * like [[decodeLosslessArithScan]]. */
  private def decodeDiffLosslessArithScan(b: Array[Byte], start: Int,
      width: Int, height: Int, ri: Int, ref: Array[Int], refW: Int,
      l: Int, u: Int): Int = {
    val st = new QmCoder.Stats(160)
    var dec = new QmCoder.Decoder(b, start, b.length)
    val dPrev = new Array[Int](width)
    val dCur = new Array[Int](width)
    // restarts at arbitrary MCU positions (round 19): QM coder and
    // statistics reset, conditioning zeroed at the restart column and
    // for the interval's (partial) first line — the decodeLossless-
    // ArithScan reading, mirrored by the encoder
    var riX = 0
    var riY = 0
    var mcu = 0L
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        if (ri > 0 && mcu > 0 && mcu % ri == 0) {
          dec = new QmCoder.Decoder(b, dec.posAfterRestart(), b.length)
          st.reset()
          riX = x
          riY = y
        }
        val firstLine = y == riY
        val ca =
          if (x == 0 || (firstLine && x == riX)) 0
          else losslessDiffClass(dCur(x - 1), l, u)
        val cb = if (firstLine) 0 else losslessDiffClass(dPrev(x), l, u)
        val d = decodeLosslessDiffArith(dec, st, ca, cb)
        val o = y * refW + x
        ref(o) = ((ref(o) + d) & 0xffff) & 0xff
        dCur(x) = d
        mcu += 1
        x += 1
      }
      System.arraycopy(dCur, 0, dPrev, 0, width)
      y += 1
    }
    dec.endPos
  }

  /** Land one raw-IDCT 8×8 block in the hierarchical reference plane
    * at (ox, oy), clipped to the frame geometry: level-shifted
    * overwrite for non-differential frames, clamped ADD of the signed
    * corrections for differential ones — shared by [[decodeHierScan]]
    * and [[decodeArithScan]]'s hierarchical branch. */
  private def landHierBlock(ref: Array[Int], refW: Int, width: Int,
      height: Int, ox: Int, oy: Int, pix: Array[Int],
      diff: Boolean): Unit = {
    var y = 0
    while (y < 8) {
      val py = oy + y
      if (py < height) {
        var x = 0
        while (x < 8) {
          val px = ox + x
          if (px < width) {
            val o = py * refW + px
            val v =
              if (diff) ref(o) + pix(y * 8 + x)
              else pix(y * 8 + x) + 128
            ref(o) = if (v < 0) 0 else if (v > 255) 255 else v
          }
          x += 1
        }
      }
      y += 1
    }
  }

  // ----------------------------------------------- progressive (SOF2)

  private def allocProgressive(comps: Array[Component], width: Int,
      height: Int): Unit = {
    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
    val mcusX = (width + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (height + 8 * vmax - 1) / (8 * vmax)
    for (c <- comps) {
      c.bw = mcusX * c.h
      c.bh = mcusY * c.v
      val compW = (width * c.h + hmax - 1) / hmax
      val compH = (height * c.v + vmax - 1) / vmax
      c.nbw = (compW + 7) / 8
      c.nbh = (compH + 7) / 8
      if (c.bw.toLong * c.bh * 64 > 8L * MaxPixels) corrupt()
      c.coefs = new Array[Int](c.bw * c.bh * 64)
    }
  }

  /** One progressive scan (T.81 Annex G): DC first/refine (interleaved
    * MCU order for multi-component scans, the component's own block grid
    * for single-component ones), AC first/refine with EOB-run coding
    * and successive-approximation correction bits. Returns the byte
    * position after the scan's entropy data. */
  private def processProgressiveScan(b: Array[Byte], start: Int,
      frameComps: Array[Component], scanComps: Array[Component],
      ss: Int, se: Int, ah: Int, al: Int, ri: Int,
      width: Int, height: Int, maxDc: Int = 15): Int = {
    if (se > 63 || ss > se || al > 13) corrupt()
    if (ss == 0 && se != 0) corrupt() // DC scans cover exactly band 0
    if (ss > 0 && scanComps.length != 1) corrupt() // AC scans: one component
    val r = new BitReader(b, start)
    scanComps.foreach(_.pred = 0)
    var eobrun = 0
    if (ss == 0 && scanComps.length > 1) {
      // interleaved DC scan over the MCU grid
      scanComps.foreach(c => if (ah == 0 && c.dcTable == null) corrupt())
      val hmax = frameComps.map(_.h).max
      val vmax = frameComps.map(_.v).max
      val mcusX = (width + 8 * hmax - 1) / (8 * hmax)
      val mcusY = (height + 8 * vmax - 1) / (8 * vmax)
      var mcu = 0
      val n = mcusX * mcusY
      while (mcu < n) {
        if (ri > 0 && mcu > 0 && mcu % ri == 0) {
          r.restart()
          scanComps.foreach(_.pred = 0)
        }
        val my = mcu / mcusX
        val mx = mcu % mcusX
        for (c <- scanComps) {
          var by = 0
          while (by < c.v) {
            var bx = 0
            while (bx < c.h) {
              decodeDcProg(r, c,
                ((my * c.v + by) * c.bw + (mx * c.h + bx)) * 64, ah, al,
                maxDc)
              bx += 1
            }
            by += 1
          }
        }
        mcu += 1
      }
    } else {
      // single-component scan: the component's own block grid (MCU = 1
      // block, T.81 A.2.2); covers DC and AC bands
      val c = scanComps(0)
      if (ss == 0 && ah == 0 && c.dcTable == null) corrupt()
      if (ss > 0 && c.acTable == null) corrupt()
      var blk = 0
      val n = c.nbw * c.nbh
      while (blk < n) {
        if (ri > 0 && blk > 0 && blk % ri == 0) {
          r.restart()
          c.pred = 0
          eobrun = 0
        }
        val base = ((blk / c.nbw) * c.bw + (blk % c.nbw)) * 64
        if (ss == 0) decodeDcProg(r, c, base, ah, al, maxDc)
        else eobrun =
          if (ah == 0) acFirst(r, c, base, ss, se, al, eobrun)
          else acRefine(r, c, base, ss, se, al, eobrun)
        blk += 1
      }
    }
    r.pos
  }

  private def decodeDcProg(r: BitReader, c: Component, base: Int,
      ah: Int, al: Int, maxDc: Int = 15): Unit =
    if (ah == 0) { // first pass: baseline DC diff, scaled by 2^Al
      val s = r.decode(c.dcTable)
      if (s > maxDc) corrupt()
      c.pred += extend(r.receive(s), s)
      c.coefs(base) = c.pred << al
    } else { // refinement: one appended magnitude bit
      if (r.nextBit() == 1) c.coefs(base) |= 1 << al
    }

  /** AC first pass (G.1.2.2): run/size symbols with EOBn run coding. */
  private def acFirst(r: BitReader, c: Component, base: Int,
      ss: Int, se: Int, al: Int, eobrun: Int): Int = {
    if (eobrun > 0) return eobrun - 1
    var k = ss
    while (k <= se) {
      val rs = r.decode(c.acTable)
      val run = rs >> 4
      val s = rs & 0x0f
      if (s != 0) {
        k += run
        if (k > 63) corrupt()
        c.coefs(base + ZigZag(k)) = extend(r.receive(s), s) << al
        k += 1
      } else {
        if (run != 15) {
          var e = (1 << run) - 1
          if (run > 0) e += r.receive(run)
          return e
        }
        k += 16 // ZRL
      }
    }
    0
  }

  /** AC refinement pass (G.1.2.3): correction bits for known-nonzero
    * coefficients, ±2^Al for newly nonzero ones, EOB-run aware. */
  private def acRefine(r: BitReader, c: Component, base: Int,
      ss: Int, se: Int, al: Int, eobrunIn: Int): Int = {
    val p1 = 1 << al
    val m1 = -1 << al
    var eobrun = eobrunIn
    var k = ss
    if (eobrun == 0) {
      var ended = false
      while (k <= se && !ended) {
        val rs = r.decode(c.acTable)
        var run = rs >> 4
        val s = rs & 0x0f
        var newval = 0
        if (s != 0) {
          if (s != 1) corrupt() // refinement writes magnitude-1 coefs only
          newval = if (r.nextBit() == 1) p1 else m1
        } else if (run != 15) {
          eobrun = 1 << run
          if (run > 0) eobrun += r.receive(run)
          ended = true
        } // run == 15 → ZRL: skip 16 zero-history coefficients below
        if (!ended) {
          // advance over nonzero-history coefficients (appending their
          // correction bits) and `run` still-zero ones
          var stop = false
          while (!stop && k <= se) {
            val z = base + ZigZag(k)
            val cur = c.coefs(z)
            if (cur != 0) {
              if (r.nextBit() == 1 && (cur & p1) == 0)
                c.coefs(z) = cur + (if (cur >= 0) p1 else m1)
              k += 1
            } else if (run == 0) stop = true // newval lands here
            else {
              run -= 1
              k += 1
            }
          }
          if (newval != 0 && k <= se) c.coefs(base + ZigZag(k)) = newval
          k += 1
        }
      }
    }
    if (eobrun > 0) { // rest of the band: correction bits only
      while (k <= se) {
        val z = base + ZigZag(k)
        val cur = c.coefs(z)
        if (cur != 0 && r.nextBit() == 1 && (cur & p1) == 0)
          c.coefs(z) = cur + (if (cur >= 0) p1 else m1)
        k += 1
      }
      eobrun -= 1
    }
    eobrun
  }

  /** Dequantize + IDCT every accumulated block, then color-convert. */
  private def finishProgressive(comps: Array[Component], width: Int,
      height: Int, qt: Array[Array[Int]], precision: Int = 8): PixelImage = {
    val dq = new Array[Int](64)
    val pix = new Array[Int](64)
    for (c <- comps) {
      val q = qt(c.tq)
      if (q == null) corrupt()
      c.pw = c.bw * 8
      c.ph = c.bh * 8
      c.plane = new Array[Byte](c.pw * c.ph)
      var by = 0
      while (by < c.bh) {
        var bx = 0
        while (bx < c.bw) {
          val base = (by * c.bw + bx) * 64
          var k = 0
          while (k < 64) {
            val n = ZigZag(k)
            dq(n) = c.coefs(base + n) * q(k)
            k += 1
          }
          idct(dq, pix, level = 1 << (precision - 1),
            max = (1 << precision) - 1, down = precision - 8)
          var y = 0
          while (y < 8) {
            var x = 0
            val rowOff = (by * 8 + y) * c.pw + bx * 8
            while (x < 8) {
              c.plane(rowOff + x) = pix(y * 8 + x).toByte
              x += 1
            }
            y += 1
          }
          bx += 1
        }
        by += 1
      }
    }
    toRgb(comps, width, height)
  }

  /** Interleaved baseline scan: all MCUs, restart-interval aware.
    * `precision` 12 (SOF1 extended) level-shifts by 2048, clamps to
    * 0..4095, and scales the stored plane to 8-bit by >> 4 — the DC
    * categories widen to 16 (T.81 Table F.6). */
  private def decodeScan(b: Array[Byte], start: Int, comps: Array[Component],
      width: Int, height: Int, qt: Array[Array[Int]], ri: Int,
      precision: Int = 8): Unit = {
    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
    val mcusX = (width + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (height + 8 * vmax - 1) / (8 * vmax)
    for (c <- comps) {
      c.pw = mcusX * c.h * 8
      c.ph = mcusY * c.v * 8
      if (c.pw.toLong * c.ph > 4L * MaxPixels) corrupt()
      c.plane = new Array[Byte](c.pw * c.ph)
      c.pred = 0
    }
    val r = new BitReader(b, start)
    val coef = new Array[Int](64)
    val pix = new Array[Int](64)
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (ri > 0 && mcu > 0 && mcu % ri == 0) {
        r.restart()
        comps.foreach(_.pred = 0)
      }
      val my = mcu / mcusX
      val mx = mcu % mcusX
      for (c <- comps) {
        val q = qt(c.tq)
        var by = 0
        while (by < c.v) {
          var bx = 0
          while (bx < c.h) {
            decodeHuffBlock(r, c, q, coef,
              maxDc = if (precision == 12) 16 else 15)
            idct(coef, pix, level = 1 << (precision - 1),
              max = (1 << precision) - 1, down = precision - 8)
            // place the 8×8 block into the component plane
            val ox = (mx * c.h + bx) * 8
            val oy = (my * c.v + by) * 8
            var y = 0
            while (y < 8) {
              var x = 0
              val rowOff = (oy + y) * c.pw + ox
              while (x < 8) {
                c.plane(rowOff + x) = pix(y * 8 + x).toByte
                x += 1
              }
              y += 1
            }
            bx += 1
          }
          by += 1
        }
      }
      mcu += 1
    }
  }

  /** One PROGRESSIVE scan with ARITHMETIC entropy coding (SOF10, T.81
    * §G.2): same coefficient-accumulation discipline as the Huffman
    * progressive path ([[processProgressiveScan]]), with the QM coder
    * driving the four scan kinds —
    *  - DC first: the sequential DC model on point-transformed values
    *    (prediction in the `>> Al` domain, result `<< Al`);
    *  - DC refinement: ONE equiprobable decision per block (the
    *    appended magnitude bit);
    *  - AC first: the sequential AC decision tree over [Ss, Se], values
    *    `<< Al` (no cross-block EOB runs — arithmetic EOB is a per-
    *    position decision, unlike Huffman's EOBn);
    *  - AC refinement: per position, an EOB decision only beyond the
    *    previous stage's end-of-block index; correction bits for
    *    known-nonzero coefficients in the position's third bin; newly
    *    significant coefficients via the run bin + equiprobable sign.
    * Statistics areas reset per scan and at restart markers (F.1.4.1).
    * Returns the byte position after the scan's entropy data. */
  private def processProgressiveArithScan(b: Array[Byte], start: Int,
      frameComps: Array[Component], scanComps: Array[Component],
      ss: Int, se: Int, ah: Int, al: Int, ri: Int,
      width: Int, height: Int,
      dcL: Array[Int], dcU: Array[Int], acK: Array[Int]): Int = {
    if (se > 63 || ss > se || al > 13) corrupt()
    if (ss == 0 && se != 0) corrupt()
    if (ss > 0 && scanComps.length != 1) corrupt()
    val dcStats = Array.fill(4)(new QmCoder.Stats(64))
    val acStats = Array.fill(4)(new QmCoder.Stats(256))
    val dcCtx = new Array[Int](scanComps.length)
    var dec = new QmCoder.Decoder(b, start, b.length)

    def restartReset(): Unit = {
      dec = new QmCoder.Decoder(b, dec.posAfterRestart(), b.length)
      dcStats.foreach(_.reset())
      acStats.foreach(_.reset())
      java.util.Arrays.fill(dcCtx, 0)
      scanComps.foreach(_.pred = 0)
    }

    def decodeDcFirst(c: Component, ci: Int, base: Int): Unit = {
      val st = dcStats(c.dcSel)
      val ctx = dcCtx(ci)
      if (dec.decode(st, ctx) != 0) {
        val sign = dec.decode(st, ctx + 1)
        var m = dec.decode(st, ctx + 2 + sign)
        var xst = ctx + 2 + sign
        if (m != 0) {
          xst = 20
          while (dec.decode(st, xst) != 0) {
            m <<= 1
            if (m == 0x8000) corrupt()
            xst += 1
          }
        }
        dcCtx(ci) =
          if (m < ((1 << dcL(c.dcSel)) >> 1)) 0
          else if (m > ((1 << dcU(c.dcSel)) >> 1)) 12 + sign * 4
          else 4 + sign * 4
        var v = m
        var mm = m
        val mb = xst + 14
        while ({ mm >>= 1; mm != 0 }) if (dec.decode(st, mb) != 0) v |= mm
        v += 1
        c.pred += (if (sign != 0) -v else v)
      } else dcCtx(ci) = 0
      c.coefs(base) = c.pred << al
    }

    def decodeAcFirstBlock(c: Component, base: Int): Unit = {
      val ast = acStats(c.acSel)
      var k = ss
      var done = false
      while (!done && k <= se) {
        var s3 = 3 * (k - 1)
        if (dec.decode(ast, s3) != 0) done = true // EOB
        else {
          while (dec.decode(ast, s3 + 1) == 0) {
            s3 += 3
            k += 1
            if (k > se) corrupt()
          }
          val sign = dec.decodeFixed()
          var st2 = s3 + 2
          var m = dec.decode(ast, st2)
          if (m != 0 && dec.decode(ast, st2) != 0) {
            m = 2
            st2 = if (k <= acK(c.acSel)) 189 else 217
            while (dec.decode(ast, st2) != 0) {
              m <<= 1
              if (m == 0x8000) corrupt()
              st2 += 1
            }
          }
          var v = m
          var mm = m
          val mb = st2 + 14
          while ({ mm >>= 1; mm != 0 }) if (dec.decode(ast, mb) != 0) v |= mm
          v += 1
          c.coefs(base + ZigZag(k)) = (if (sign != 0) -v else v) << al
          k += 1
        }
      }
    }

    def decodeAcRefineBlock(c: Component, base: Int): Unit = {
      val ast = acStats(c.acSel)
      val p1 = 1 << al
      val m1 = -p1
      // previous-stage end-of-block: last position with nonzero history
      var kex = se
      while (kex >= 1 && c.coefs(base + ZigZag(kex)) == 0) kex -= 1
      var k = ss
      var ended = false
      while (!ended && k <= se) {
        var s3 = 3 * (k - 1)
        if (k > kex && dec.decode(ast, s3) != 0) ended = true // EOB
        else {
          var placed = false
          while (!placed) {
            val z = base + ZigZag(k)
            val cur = c.coefs(z)
            if (cur != 0) { // correction bit for a known coefficient
              if (dec.decode(ast, s3 + 2) != 0)
                c.coefs(z) = cur + (if (cur < 0) m1 else p1)
              placed = true
            } else if (dec.decode(ast, s3 + 1) != 0) { // newly significant
              c.coefs(z) = if (dec.decodeFixed() != 0) m1 else p1
              placed = true
            } else {
              s3 += 3
              k += 1
              if (k > se) corrupt()
            }
          }
          k += 1
        }
      }
    }

    if (ss == 0 && scanComps.length > 1) {
      // interleaved DC scan over the MCU grid
      val hmax = frameComps.map(_.h).max
      val vmax = frameComps.map(_.v).max
      val mcusX = (width + 8 * hmax - 1) / (8 * hmax)
      val mcusY = (height + 8 * vmax - 1) / (8 * vmax)
      scanComps.foreach(_.pred = 0)
      var mcu = 0
      val n = mcusX * mcusY
      while (mcu < n) {
        if (ri > 0 && mcu > 0 && mcu % ri == 0) restartReset()
        val my = mcu / mcusX
        val mx = mcu % mcusX
        var ci = 0
        while (ci < scanComps.length) {
          val c = scanComps(ci)
          var by = 0
          while (by < c.v) {
            var bx = 0
            while (bx < c.h) {
              val base = ((my * c.v + by) * c.bw + (mx * c.h + bx)) * 64
              if (ah == 0) decodeDcFirst(c, ci, base)
              else if (dec.decodeFixed() != 0) c.coefs(base) |= 1 << al
              bx += 1
            }
            by += 1
          }
          ci += 1
        }
        mcu += 1
      }
    } else {
      // single-component scan over the component's own block grid
      val c = scanComps(0)
      c.pred = 0
      var blk = 0
      val n = c.nbw * c.nbh
      while (blk < n) {
        if (ri > 0 && blk > 0 && blk % ri == 0) restartReset()
        val base = ((blk / c.nbw) * c.bw + (blk % c.nbw)) * 64
        if (ss == 0) {
          if (ah == 0) decodeDcFirst(c, 0, base)
          else if (dec.decodeFixed() != 0) c.coefs(base) |= 1 << al
        } else {
          if (ah == 0) decodeAcFirstBlock(c, base)
          else decodeAcRefineBlock(c, base)
        }
        blk += 1
      }
    }
    dec.endPos
  }

  /** Interleaved sequential scan with ARITHMETIC entropy coding (SOF9,
    * T.81 §F.2.4): a [[QmCoder.Decoder]] drives the spec's DC/AC
    * statistical model — per-table adaptive statistics areas (64 DC /
    * 256 AC bins), DC conditioned on the previous diff's magnitude
    * class (DAC bounds L/U), AC as an EOB/run/magnitude decision tree
    * per zigzag position with the fixed equiprobable sign state and the
    * Kx low/high-spectral split for large magnitudes. Restart markers
    * re-initialize the QM decoder and reset every statistics bin,
    * context, and DC predictor (F.1.4.1). Coefficient layout, dequant,
    * IDCT, and plane placement are shared with the Huffman path —
    * identical quantized coefficients MUST produce identical pixels,
    * which is what the JpegCodecSpec cross-check pins. */
  /** Sequential arithmetic scan (F.2.4). When `hierRef` is non-null
    * this is a HIERARCHICAL frame: spatial output lands in the shared
    * reference plane (level-shifted overwrite, or — `diff`, SOF13 —
    * un-level-shifted signed corrections added to it), and the return
    * value is the position of the terminating marker so the Annex-J
    * marker walk can continue to the next frame. */
  private def decodeArithScan(b: Array[Byte], start: Int,
      comps: Array[Component], width: Int, height: Int,
      qt: Array[Array[Int]], ri: Int,
      dcL: Array[Int], dcU: Array[Int], acK: Array[Int],
      hierRef: Array[Int] = null, refW: Int = 0,
      diff: Boolean = false, precision: Int = 8): Int = {
    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
    val mcusX = (width + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (height + 8 * vmax - 1) / (8 * vmax)
    for (c <- comps) {
      c.pw = mcusX * c.h * 8
      c.ph = mcusY * c.v * 8
      if (c.pw.toLong * c.ph > 4L * MaxPixels) corrupt()
      // hierarchical frames land in the shared reference plane — a
      // per-component plane would be dead weight (up to 4·MaxPixels)
      if (hierRef == null) c.plane = new Array[Byte](c.pw * c.ph)
      c.pred = 0
    }
    val dcStats = Array.fill(4)(new QmCoder.Stats(64))
    val acStats = Array.fill(4)(new QmCoder.Stats(256))
    val dcCtx = new Array[Int](comps.length)
    var dec = new QmCoder.Decoder(b, start, b.length)
    val coef = new Array[Int](64)
    val pix = new Array[Int](64)
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (ri > 0 && mcu > 0 && mcu % ri == 0) {
        dec = new QmCoder.Decoder(b, dec.posAfterRestart(), b.length)
        dcStats.foreach(_.reset())
        acStats.foreach(_.reset())
        java.util.Arrays.fill(dcCtx, 0)
        comps.foreach(_.pred = 0)
      }
      val my = mcu / mcusX
      val mx = mcu % mcusX
      var ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        val q = qt(c.tq)
        var by = 0
        while (by < c.v) {
          var bx = 0
          while (bx < c.h) {
            java.util.Arrays.fill(coef, 0)
            // ---- DC (F.2.4.1), conditioned on the previous diff class
            val st = dcStats(c.dcSel)
            val ctx = dcCtx(ci)
            if (dec.decode(st, ctx) != 0) {
              val sign = dec.decode(st, ctx + 1)
              var m = dec.decode(st, ctx + 2 + sign)
              var xst = ctx + 2 + sign
              if (m != 0) {
                xst = 20 // X1 bin (Table F.4)
                while (dec.decode(st, xst) != 0) {
                  m <<= 1
                  if (m == 0x8000) corrupt()
                  xst += 1
                }
              }
              // conditioning class for this component's NEXT block,
              // from the magnitude CATEGORY (F.1.4.4.1.2)
              dcCtx(ci) =
                if (m < ((1 << dcL(c.dcSel)) >> 1)) 0
                else if (m > ((1 << dcU(c.dcSel)) >> 1)) 12 + sign * 4
                else 4 + sign * 4
              var v = m
              var mm = m
              val mb = xst + 14 // magnitude-bit bins trail the X bins
              while ({ mm >>= 1; mm != 0 })
                if (dec.decode(st, mb) != 0) v |= mm
              v += 1
              c.pred += (if (sign != 0) -v else v)
            } else dcCtx(ci) = 0
            coef(0) = c.pred * q(0)
            // ---- AC (F.2.4.2): 3 bins per zigzag position (EOB, run,
            // magnitude), sign equiprobable, Kx splits the big-magnitude
            // category bins into low/high spectral bands
            val ast = acStats(c.acSel)
            var k = 1
            while (k <= 63) {
              var s3 = 3 * (k - 1)
              if (dec.decode(ast, s3) != 0) k = 64 // EOB
              else {
                while (dec.decode(ast, s3 + 1) == 0) {
                  s3 += 3
                  k += 1
                  if (k > 63) corrupt()
                }
                val sign = dec.decodeFixed()
                var st2 = s3 + 2
                var m = dec.decode(ast, st2)
                if (m != 0 && dec.decode(ast, st2) != 0) {
                  m = 2
                  st2 = if (k <= acK(c.acSel)) 189 else 217
                  while (dec.decode(ast, st2) != 0) {
                    m <<= 1
                    if (m == 0x8000) corrupt()
                    st2 += 1
                  }
                }
                var v = m
                var mm = m
                val mb = st2 + 14
                while ({ mm >>= 1; mm != 0 })
                  if (dec.decode(ast, mb) != 0) v |= mm
                v += 1
                coef(ZigZag(k)) = (if (sign != 0) -v else v) * q(k)
                k += 1
              }
            }
            val ox = (mx * c.h + bx) * 8
            val oy = (my * c.v + by) * 8
            if (hierRef == null) {
              idct(coef, pix, level = 1 << (precision - 1),
                max = (1 << precision) - 1, down = precision - 8)
              var y = 0
              while (y < 8) {
                var x = 0
                val rowOff = (oy + y) * c.pw + ox
                while (x < 8) {
                  c.plane(rowOff + x) = pix(y * 8 + x).toByte
                  x += 1
                }
                y += 1
              }
            } else {
              // hierarchical target: raw IDCT, reference-plane landing
              idctRaw(coef, pix)
              landHierBlock(hierRef, refW, width, height, ox, oy, pix, diff)
            }
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }
    dec.endPos
  }

  /** LOSSLESS scan (SOF3, T.81 Annex H): no DCT, no quantization — each
    * sample is a Huffman-coded (category + EXTEND, SSSS 16 → 32768)
    * prediction DIFFERENCE against one of the seven spatial predictors
    * selected by the scan header's Ss field, modulo 2^16. Prediction
    * defaults per H.1.2.1: 2^(P−1−Pt) for the very first sample, the
    * left neighbor across the first line, the sample above at the start
    * of each later line. Reconstruction is bit-exact by construction.
    * Restart-interval lossless streams take the stub path (rare; the
    * predictor re-initialization contract isn't exercised by anything
    * we can cross-check). */
  private def decodeLosslessScan(b: Array[Byte], start: Int,
      scanComps: Array[Component], width: Int, height: Int,
      predSel: Int, pt: Int, ri: Int, prec: Int = 8): Unit = {
    if (predSel < 1 || predSel > 7 || pt > 7) corrupt()
    val nc = scanComps.length
    scanComps.foreach { c =>
      if (c.dcTable == null) corrupt()
      c.pw = width
      c.ph = height
      c.plane = new Array[Byte](width * height)
    }
    // Restart intervals (T.81 H.1): Ri counts MCUs (one sample per scan
    // component here) and may start ANYWHERE in a line — round 19
    // generalizes the round-18 row-aligned form to arbitrary sample
    // positions. At an interval start the entropy coder resets, the
    // interval's first sample takes the default prediction, and the
    // REMAINDER OF THAT LINE uses the 1-D predictor (H.1.1: "the
    // one-dimensional predictor is used for the first line of samples
    // at the start of the scan and at the beginning of each restart
    // interval"); following lines resume the selected predictor, their
    // above references crossing the interval boundary where x precedes
    // the restart column — the self-consistent reading, pinned by the
    // encoder/decoder agreement specs and by bit-identity with the
    // row-aligned path on aligned geometries.
    val r = new BitReader(b, start)
    val defaultPred = 1 << (prec - 1 - pt) // 2^(P−1−Pt)
    // P > 8: reconstruction runs at full precision (mod 2^16, exact);
    // only the stored 8-bit plane scales down
    val down = prec - 8
    // per-component previous/current reconstructed lines (interleaved
    // MCUs advance all components in lockstep at 1×1 sampling)
    val prev = Array.ofDim[Int](nc, width)
    val cur = Array.ofDim[Int](nc, width)
    var riX = 0 // position of the current interval's first sample
    var riY = 0
    var mcu = 0L
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        if (ri > 0 && mcu > 0 && mcu % ri == 0) {
          r.restart() // byte-align + consume RSTn
          riX = x
          riY = y
        }
        val firstLine = y == riY
        var ci = 0
        while (ci < nc) {
          val c = scanComps(ci)
          val s = r.decode(c.dcTable)
          if (s > 16) corrupt()
          val diff =
            if (s == 0) 0
            else if (s == 16) 32768 // T.81 lossless special category
            else extend(r.receive(s), s)
          val cl = cur(ci)
          val pl = prev(ci)
          val pred =
            if (firstLine && x == riX) defaultPred
            else if (firstLine) cl(x - 1) // interval first line: predictor 1
            else if (x == 0) pl(0) // line start: predictor 2 (above)
            else {
              val a = cl(x - 1)
              val bb = pl(x)
              val cc = pl(x - 1)
              predSel match {
                case 1 => a
                case 2 => bb
                case 3 => cc
                case 4 => a + bb - cc
                case 5 => a + ((bb - cc) >> 1)
                case 6 => bb + ((a - cc) >> 1)
                case _ => (a + bb) >> 1
              }
            }
          cl(x) = (pred + diff) & 0xffff
          ci += 1
        }
        mcu += 1
        x += 1
      }
      var ci = 0
      while (ci < nc) {
        val c = scanComps(ci)
        val cl = cur(ci)
        var i2 = 0
        while (i2 < width) {
          c.plane(y * width + i2) =
            ((((cl(i2) << pt) & 0xffff) >> down) & 0xff).toByte
          i2 += 1
        }
        System.arraycopy(cl, 0, prev(ci), 0, width)
        ci += 1
      }
      y += 1
    }
  }

  /** Double-precision separable IDCT (T.81 A.3.3) WITHOUT the level
    * shift: raw signed spatial values — what a hierarchical
    * DIFFERENTIAL frame's corrections are (J.1: no level shift on the
    * difference signal). `coef` natural order, `out` row-major. */
  private def idctRaw(coef: Array[Int], out: Array[Int]): Unit = {
    val tmp = new Array[Double](64)
    var u = 0
    while (u < 8) { // horizontal pass: frequency v → spatial x
      var x = 0
      while (x < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) { s += Cn(v) * coef(u * 8 + v) * CosT(x)(v); v += 1 }
        tmp(u * 8 + x) = s
        x += 1
      }
      u += 1
    }
    var y = 0
    while (y < 8) { // vertical pass: frequency u → spatial y
      var x = 0
      while (x < 8) {
        var s = 0.0
        var uu = 0
        while (uu < 8) { s += Cn(uu) * tmp(uu * 8 + x) * CosT(y)(uu); uu += 1 }
        out(y * 8 + x) = math.round(s / 4.0).toInt
        x += 1
      }
      y += 1
    }
  }

  /** [[idctRaw]] + the level shift (+2^(P−1)), clamped to 0..2^P−1 and
    * scaled down to 8 bits — the non-differential spelling every other
    * frame type uses; defaults are the 8-bit identity scaling. */
  private def idct(coef: Array[Int], out: Array[Int], level: Int = 128,
      max: Int = 255, down: Int = 0): Unit = {
    idctRaw(coef, out)
    var i = 0
    while (i < 64) {
      val v = out(i) + level
      out(i) = (if (v < 0) 0 else if (v > max) max else v) >> down
      i += 1
    }
  }

  /** Gray reference plane → PixelImage (hierarchical output). */
  private def grayImage(ref: Array[Int], w: Int, h: Int): PixelImage = {
    val out = new Array[Byte](w * h * 3)
    var i = 0
    while (i < w * h) {
      val v = ref(i).toByte
      out(i * 3) = v; out(i * 3 + 1) = v; out(i * 3 + 2) = v
      i += 1
    }
    PixelImage(w, h, out)
  }

  /** T.81 J.1.1.2 horizontal 2× expansion: even outputs copy, odd
    * outputs interpolate (a+b+1)>>1 with edge replication. */
  private def expandH(ref: Array[Int], w: Int, h: Int): Array[Int] = {
    val nw = w * 2
    val out = new Array[Int](nw * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val a = ref(y * w + x)
        val c = ref(y * w + math.min(x + 1, w - 1))
        out(y * nw + 2 * x) = a
        out(y * nw + 2 * x + 1) = (a + c + 1) >> 1
        x += 1
      }
      y += 1
    }
    out
  }

  /** T.81 J.1.1.2 vertical 2× expansion, same rule per column. */
  private def expandV(ref: Array[Int], w: Int, h: Int): Array[Int] = {
    val out = new Array[Int](w * h * 2)
    var y = 0
    while (y < h) {
      val next = math.min(y + 1, h - 1)
      var x = 0
      while (x < w) {
        val a = ref(y * w + x)
        val c = ref(next * w + x)
        out(2 * y * w + x) = a
        out((2 * y + 1) * w + x) = (a + c + 1) >> 1
        x += 1
      }
      y += 1
    }
    out
  }

  /** One sequential Huffman scan of a HIERARCHICAL frame (T.81 Annex
    * J), single gray 1×1 component: entropy decode per 8×8 block like
    * [[decodeScan]], but the spatial output lands in the shared
    * reference plane — non-differential frames level-shift (+128) and
    * overwrite, DIFFERENTIAL frames (SOF5) add the raw signed
    * corrections to the reference, clamping once after the add.
    * Returns the byte position after the entropy data (the marker walk
    * continues: more frames follow until EOI). */
  private def decodeHierScan(b: Array[Byte], start: Int, c: Component,
      width: Int, height: Int, qt: Array[Array[Int]], ri: Int,
      ref: Array[Int], refW: Int, diff: Boolean): Int = {
    val q = qt(c.tq)
    val r = new BitReader(b, start)
    val coef = new Array[Int](64)
    val pix = new Array[Int](64)
    c.pred = 0
    val mcusX = (width + 7) / 8
    val mcusY = (height + 7) / 8
    var mcu = 0
    val n = mcusX * mcusY
    while (mcu < n) {
      if (ri > 0 && mcu > 0 && mcu % ri == 0) {
        r.restart()
        c.pred = 0
      }
      decodeHuffBlock(r, c, q, coef)
      idctRaw(coef, pix)
      landHierBlock(ref, refW, width, height,
        (mcu % mcusX) * 8, (mcu / mcusX) * 8, pix, diff)
      mcu += 1
    }
    r.pos
  }

  /** Component planes → interleaved RGB: replication upsampling for
    * subsampled chroma, JFIF YCbCr→RGB (3 comps) or gray fan-out (1). */
  /** 3-component LOSSLESS assembly: planes map directly to R,G,B — the
    * exact-reconstruction mode must not round-trip through YCbCr (T.81
    * defines no color transform; JFIF's YCbCr convention is a DCT-JPEG
    * ecosystem contract that lossless RGB producers don't follow). */
  private def losslessRgb(comps: Array[Component], width: Int,
      height: Int): PixelImage = {
    val n = width * height
    val out = new Array[Byte](n * 3)
    var i = 0
    var p = 0
    while (i < n) {
      out(p) = comps(0).plane(i)
      out(p + 1) = comps(1).plane(i)
      out(p + 2) = comps(2).plane(i)
      i += 1
      p += 3
    }
    PixelImage(width, height, out)
  }

  private def toRgb(comps: Array[Component], width: Int, height: Int): PixelImage = {
    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
    val out = new Array[Byte](width * height * 3)
    def sample(c: Component, x: Int, y: Int): Int =
      c.plane((y * c.v / vmax) * c.pw + (x * c.h / hmax)) & 0xff
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val o = (y * width + x) * 3
        if (comps.length == 1) {
          val g = sample(comps(0), x, y).toByte
          out(o) = g; out(o + 1) = g; out(o + 2) = g
        } else {
          val yy = sample(comps(0), x, y)
          val cb = sample(comps(1), x, y) - 128
          val cr = sample(comps(2), x, y) - 128
          def clamp(d: Double): Byte = {
            val v = math.round(d).toInt
            (if (v < 0) 0 else if (v > 255) 255 else v).toByte
          }
          out(o) = clamp(yy + 1.402 * cr)
          out(o + 1) = clamp(yy - 0.344136 * cb - 0.714136 * cr)
          out(o + 2) = clamp(yy + 1.772 * cb)
        }
        x += 1
      }
      y += 1
    }
    PixelImage(width, height, out)
  }

  // ------------------------------------------------------------- encode

  /** Generated canonical Huffman spec: `lens(sym)` / `codes(sym)`. */
  private final class EncTable(val bits: Array[Int], val vals: Array[Int]) {
    val lens = new Array[Int](256)
    val codes = new Array[Int](256)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        var n = 0
        while (n < bits(l)) {
          lens(vals(k)) = l; codes(vals(k)) = code
          code += 1; k += 1; n += 1
        }
        code <<= 1
        l += 1
      }
    }
  }

  // all 12 DC size categories at code length 4 (12 ≤ 2^4, no all-ones
  // code since 11 < 15) — any conformant decoder accepts this DHT
  private val EncDc = {
    val bits = new Array[Int](17); bits(4) = 12
    new EncTable(bits, Array.tabulate(12)(identity))
  }
  // extended-precision DC categories 0..16 at code length 5 (17 ≤ 2^5,
  // no all-ones code since 16 < 31) — for 12-bit DCT (Table F.6) and
  // P>8 lossless difference coding
  private val EncDcWide = {
    val bits = new Array[Int](17); bits(5) = 17
    new EncTable(bits, Array.tabulate(17)(identity))
  }
  // all 162 baseline AC symbols at code length 8: (run 0..15, size 1..10)
  // + EOB (0x00) + ZRL (0xF0); 161 < 255 so no all-ones code
  private val EncAc = {
    val bits = new Array[Int](17); bits(8) = 162
    val vals = (0x00 +: 0xf0 +: (for {
      run <- 0 to 15; size <- 1 to 10
    } yield (run << 4) | size)).toArray
    new EncTable(bits, vals)
  }

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var n = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        n += 1
        if (n == 8) {
          out.write(acc & 0xff)
          if ((acc & 0xff) == 0xff) out.write(0) // byte stuffing
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    def finish(): Unit = if (n > 0) put(0xff, 8 - n) // pad with 1-bits
  }

  private def sizeCat(v: Int): Int = 32 - Integer.numberOfLeadingZeros(math.abs(v))

  /** FDCT + quantize (all-ones table) one level-shifted 8×8 block. */
  private def fdctQuant(s: Array[Double], coef: Array[Int]): Unit = {
    val tmp = new Array[Double](64)
    var u = 0
    while (u < 8) { // vertical pass: spatial y → frequency u
      var x = 0
      while (x < 8) {
        var t = 0.0
        var y = 0
        while (y < 8) { t += s(y * 8 + x) * CosT(y)(u); y += 1 }
        tmp(u * 8 + x) = t
        x += 1
      }
      u += 1
    }
    var uu = 0
    while (uu < 8) {
      var v = 0
      while (v < 8) {
        var t = 0.0
        var x = 0
        while (x < 8) { t += tmp(uu * 8 + x) * CosT(x)(v); x += 1 }
        coef(uu * 8 + v) = math.round(0.25 * Cn(uu) * Cn(v) * t).toInt
        v += 1
      }
      uu += 1
    }
  }

  private def encodeBlock(w: BitWriter, coef: Array[Int], pred: Int,
      dcTable: EncTable = EncDc): Int = {
    val diff = coef(0) - pred
    val s = sizeCat(diff)
    w.put(dcTable.codes(s), dcTable.lens(s))
    if (s > 0) w.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
    var k = 1
    var run = 0
    while (k < 64) {
      val v = coef(ZigZag(k))
      if (v == 0) run += 1
      else {
        while (run > 15) { w.put(EncAc.codes(0xf0), 8); run -= 16 }
        val sz = sizeCat(v)
        val sym = (run << 4) | sz
        w.put(EncAc.codes(sym), EncAc.lens(sym))
        w.put(if (v < 0) v + (1 << sz) - 1 else v, sz)
        run = 0
      }
      k += 1
    }
    if (run > 0) w.put(EncAc.codes(0x00), 8) // EOB
    coef(0)
  }

  /** Real sequential JPEG bytes: grayscale (1 component) when `gray`,
    * else YCbCr 4:4:4. Quant tables all-ones; edge blocks pad by edge
    * replication. Block-constant inputs round-trip bit-exactly (see
    * object doc); arbitrary inputs round-trip within IDCT/quantization
    * rounding like any quality-100 JPEG.
    *
    * `arith = true` emits SOF9 — the SAME quantized coefficients coded
    * with the QM arithmetic coder ([[QmCoder.Encoder]] + the T.81
    * F.1.4 DC/AC statistical model, default DAC conditioning L=0 U=1
    * Kx=5) instead of Huffman: the two spellings of one image MUST
    * decode to identical pixels, the cross-check JpegCodecSpec pins. */
  def encodeJpeg(width: Int, height: Int, px: (Int, Int) => (Int, Int, Int),
      gray: Boolean = false, arith: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0 && width <= 0xffff && height <= 0xffff &&
      width.toLong * height <= MaxPixels)
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def wbe16(v: Int): Unit = { w8(v >> 8); w8(v) }
    def marker(m: Int): Unit = { w8(0xff); w8(m) }
    marker(0xd8) // SOI
    marker(0xe0); wbe16(16) // APP0 / JFIF
    out.write("JFIF".getBytes("US-ASCII")); w8(0)
    w8(1); w8(1); w8(0); wbe16(1); wbe16(1); w8(0); w8(0)
    marker(0xdb); wbe16(2 + 1 + 64) // DQT table 0: all ones, 8-bit
    w8(0)
    var k = 0
    while (k < 64) { w8(1); k += 1 }
    val nf = if (gray) 1 else 3
    marker(if (arith) 0xc9 else 0xc0); wbe16(8 + 3 * nf) // SOF9 / SOF0
    w8(8); wbe16(height); wbe16(width); w8(nf)
    var c = 0
    while (c < nf) { w8(c + 1); w8(0x11); w8(0); c += 1 } // 1×1 sampling, qt 0
    if (arith) {
      // DAC: spell the (default) conditioning explicitly — DC table 0
      // L=0/U=1, AC table 0 Kx=5
      marker(0xcc); wbe16(2 + 4)
      w8(0x00); w8(0x10) // Tc=0 Tb=0, Cs = U<<4 | L
      w8(0x10); w8(5) // Tc=1 Tb=0, Cs = Kx
    } else {
      def dht(tc: Int, t: EncTable): Unit = {
        marker(0xc4); wbe16(2 + 17 + t.vals.length)
        w8(tc << 4)
        var l = 1
        while (l <= 16) { w8(t.bits(l)); l += 1 }
        t.vals.foreach(w8)
      }
      dht(0, EncDc)
      dht(1, EncAc)
    }
    marker(0xda); wbe16(6 + 2 * nf) // SOS
    w8(nf)
    c = 0
    while (c < nf) { w8(c + 1); w8(0x00); c += 1 } // DC table 0, AC table 0
    w8(0); w8(63); w8(0) // Ss, Se, AhAl

    // planes: gray → BT.601 integer luma of (r,g,b); color → JFIF YCbCr
    val planes = Array.fill(nf)(new Array[Double](width * height))
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val (r, g, b) = px(x, y)
        val o = y * width + x
        if (gray)
          planes(0)(o) = ((299 * (r & 0xff) + 587 * (g & 0xff) +
            114 * (b & 0xff)) / 1000).toDouble - 128.0
        else {
          planes(0)(o) = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
          planes(1)(o) = -0.168736 * r - 0.331264 * g + 0.5 * b
          planes(2)(o) = 0.5 * r - 0.418688 * g - 0.081312 * b
        }
        x += 1
      }
      y += 1
    }
    val block = new Array[Double](64)
    val coef = new Array[Int](64)
    val preds = new Array[Int](nf)
    // Huffman state
    val w = if (arith) null else new BitWriter(out)
    // arithmetic state: one shared conditioning table (id 0), per-
    // component DC context, mirroring decodeArithScan exactly
    val enc = if (arith) new QmCoder.Encoder(out) else null
    val dcSt = if (arith) new QmCoder.Stats(64) else null
    val acSt = if (arith) new QmCoder.Stats(256) else null
    val dcCtxs = new Array[Int](nf)
    val mcusX = (width + 7) / 8
    val mcusY = (height + 7) / 8
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        c = 0
        while (c < nf) {
          var by = 0
          while (by < 8) {
            var bx = 0
            while (bx < 8) {
              val sx = math.min(mx * 8 + bx, width - 1) // edge replication
              val sy = math.min(my * 8 + by, height - 1)
              block(by * 8 + bx) = planes(c)(sy * width + sx)
              bx += 1
            }
            by += 1
          }
          fdctQuant(block, coef)
          if (arith) {
            encodeBlockArith(enc, dcSt, acSt, coef, preds, dcCtxs, c)
            preds(c) = coef(0)
          } else preds(c) = encodeBlock(w, coef, preds(c))
          c += 1
        }
        mx += 1
      }
      my += 1
    }
    if (arith) enc.finish() else w.finish()
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Real 12-BIT extended-sequential JPEG bytes (SOF1, P=12 — the only
    * 12-bit DCT carrier T.81 B.1 defines; the shape medical DICOM
    * producers emit): grayscale, all-ones quant, wide DC categories
    * (0..16, [[EncDcWide]]). Block-constant 12-bit inputs round-trip
    * bit-exactly at full precision (DC-only blocks), so the decoder's
    * 8-bit output is EXACTLY `v >> 4` — the closed-form contract
    * JpegCodecSpec and the q47 rotation grade. `gray12` returns
    * 0..4095. */
  def encodeJpeg12(width: Int, height: Int,
      gray12: (Int, Int) => Int, spelling: Int = 0): Array[Byte] = {
    require(width > 0 && height > 0 && width <= 0xffff && height <= 0xffff &&
      width.toLong * height <= MaxPixels && spelling >= 0 && spelling <= 2)
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def wbe16(v: Int): Unit = { w8(v >> 8); w8(v) }
    def marker(m: Int): Unit = { w8(0xff); w8(m) }
    marker(0xd8)
    marker(0xdb); wbe16(2 + 1 + 64) // DQT table 0: all ones, 8-bit Pq
    w8(0)
    var k = 0
    while (k < 64) { w8(1); k += 1 }
    // spelling 0 = SOF1 (extended sequential Huffman), 1 = SOF9
    // (sequential ARITHMETIC — round 18), 2 = SOF2 (PROGRESSIVE
    // Huffman, spectral selection only — round 18): one 12-bit image,
    // three entropy structures, identical decoded pixels
    marker(spelling match { case 0 => 0xc1; case 1 => 0xc9; case _ => 0xc2 })
    wbe16(8 + 3)
    w8(12); wbe16(height); wbe16(width); w8(1)
    w8(1); w8(0x11); w8(0)
    def dht(tc: Int, t: EncTable): Unit = {
      marker(0xc4); wbe16(2 + 17 + t.vals.length)
      w8(tc << 4)
      var l = 1
      while (l <= 16) { w8(t.bits(l)); l += 1 }
      t.vals.foreach(w8)
    }
    if (spelling == 1) {
      marker(0xcc); wbe16(2 + 4) // DAC, default conditioning spelled out
      w8(0x00); w8(0x10)
      w8(0x10); w8(5)
    } else {
      dht(0, EncDcWide)
      dht(1, EncAc)
    }
    // quantized coefficients per block, raster order
    val mcusX = (width + 7) / 8
    val mcusY = (height + 7) / 8
    val blocks = Array.fill(mcusX * mcusY)(new Array[Int](64))
    val block = new Array[Double](64)
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        var by = 0
        while (by < 8) {
          var bx = 0
          while (bx < 8) {
            val sx = math.min(mx * 8 + bx, width - 1) // edge replication
            val sy = math.min(my * 8 + by, height - 1)
            block(by * 8 + bx) = (gray12(sx, sy) & 0xfff).toDouble - 2048.0
            bx += 1
          }
          by += 1
        }
        fdctQuant(block, blocks(my * mcusX + mx))
        mx += 1
      }
      my += 1
    }
    val nBlocks = mcusX * mcusY
    if (spelling == 2) {
      // DC scan (Ss=0, Se=0, Ah=Al=0) — wide categories
      marker(0xda); wbe16(8)
      w8(1); w8(1); w8(0x00)
      w8(0); w8(0); w8(0)
      val w = new BitWriter(out)
      var pred = 0
      var blk = 0
      while (blk < nBlocks) {
        val diff = blocks(blk)(0) - pred
        pred = blocks(blk)(0)
        val s = sizeCat(diff)
        w.put(EncDcWide.codes(s), EncDcWide.lens(s))
        if (s > 0) w.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
        blk += 1
      }
      w.finish()
      // AC scan (Ss=1, Se=63): every block is one EOB run of 1 (the
      // fixtures are DC-only; a nonzero AC would need run/size symbols)
      blocks.foreach(bk =>
        require((1 to 63).forall(kk => bk(ZigZag(kk)) == 0),
          "progressive 12-bit spelling carries DC-only fixtures"))
      marker(0xda); wbe16(8)
      w8(1); w8(1); w8(0x00)
      w8(1); w8(63); w8(0)
      val w2 = new BitWriter(out)
      var blk2 = 0
      while (blk2 < nBlocks) {
        w2.put(EncAc.codes(0x00), EncAc.lens(0x00)) // EOBRUN = 1
        blk2 += 1
      }
      w2.finish()
    } else {
      marker(0xda); wbe16(8) // SOS
      w8(1); w8(1); w8(0x00)
      w8(0); w8(63); w8(0)
      if (spelling == 1) {
        val enc = new QmCoder.Encoder(out)
        val dcSt = new QmCoder.Stats(64)
        val acSt = new QmCoder.Stats(256)
        val preds = new Array[Int](1)
        val dcCtxs = new Array[Int](1)
        var blk = 0
        while (blk < nBlocks) {
          encodeBlockArith(enc, dcSt, acSt, blocks(blk), preds, dcCtxs, 0)
          preds(0) = blocks(blk)(0)
          blk += 1
        }
        enc.finish()
      } else {
        val w = new BitWriter(out)
        var pred = 0
        var blk = 0
        while (blk < nBlocks) {
          pred = encodeBlock(w, blocks(blk), pred, dcTable = EncDcWide)
          blk += 1
        }
        w.finish()
      }
    }
    marker(0xd9)
    out.toByteArray
  }

  /** Real HIERARCHICAL JPEG bytes (T.81 Annex J): SOI, DHP declaring
    * the final 2·halfW × 2·halfH geometry, a non-differential SOF0
    * base frame at half resolution, EXP(1,1), and a DIFFERENTIAL SOF5
    * frame whose per-8×8-block CONSTANT corrections `delta(bx, by)`
    * ride the same all-ones-quant DC-only exactness as every other
    * fixture frame — so the decoded image is EXACTLY
    * bilinear-upsample(half) + delta, and a closed-form oracle holds.
    * Grayscale; `halfGray` should be constant per 8×8 block for the
    * base frame to round-trip bit-exactly (the same contract as
    * [[encodeJpeg]]). Half dims must be multiples of 8.
    *
    * `arith = true` writes the SAME pyramid with arithmetic entropy
    * coding — SOF9 base + SOF13 differential through the QM coder —
    * and the two spellings MUST decode to identical pixels
    * (JpegCodecSpec pins it), mirroring the SOF0/SOF9 cross-check. */
  def encodeJpegHier(halfW: Int, halfH: Int, halfGray: (Int, Int) => Int,
      delta: (Int, Int) => Int, arith: Boolean = false,
      progressiveDiff: Boolean = false): Array[Byte] = {
    require(halfW > 0 && halfH > 0 && halfW % 8 == 0 && halfH % 8 == 0 &&
      4L * halfW * halfH <= MaxPixels && 2 * halfW <= 0xffff &&
      2 * halfH <= 0xffff)
    val out = new java.io.ByteArrayOutputStream()
    hierPreambleAndBase(out, halfW, halfH, halfGray, arith)
    // expand the reference both ways, then the differential frame:
    // block-constant signed corrections, NO level shift (Annex J)
    hierExpSegment(out)
    val block = new Array[Double](64)
    val fill = (mx: Int, my: Int) => {
      val d = delta(mx, my)
      require(d >= -255 && d <= 255, s"delta($mx,$my)=$d out of range")
      var i = 0
      while (i < 64) { block(i) = d.toDouble; i += 1 }
    }
    // the differential stage in four spellings: sequential SOF5/SOF13 or
    // — `progressiveDiff` — PROGRESSIVE SOF6/SOF14, the same corrections
    // as a two-scan spectral-selection script; all four must decode to
    // identical pixels (JpegCodecSpec pins the quartet)
    if (progressiveDiff)
      hierProgDiffFrame(out, if (arith) 0xce else 0xc6, 2 * halfW, 2 * halfH,
        arith, block, fill)
    else
      hierDctFrame(out, if (arith) 0xcd else 0xc5, 2 * halfW, 2 * halfH,
        arith, block, fill)
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** Differential PROGRESSIVE stage (SOF6 Huffman / SOF14 arithmetic) of
    * a hierarchical fixture: the corrections' quantized coefficients
    * transmitted as a spectral-selection scan script — DC band first,
    * then the AC band (all-EOB for the block-constant fixtures; Huffman
    * spells it as per-block EOB1 symbols, arithmetic as per-block EOB
    * decisions). */
  private def hierProgDiffFrame(out: java.io.ByteArrayOutputStream,
      sofM: Int, w2: Int, h2: Int, arith: Boolean, block: Array[Double],
      fill: (Int, Int) => Unit): Unit = {
    def w8(v: Int): Unit = out.write(v & 0xff)
    hierFrameHeader(out, sofM, w2, h2)
    val bw = w2 / 8
    val bh = h2 / 8
    // quantize every block once; the scans then read the coefficients
    val coef = new Array[Int](64)
    val dcs = new Array[Int](bw * bh)
    var my = 0
    while (my < bh) {
      var mx = 0
      while (mx < bw) {
        fill(mx, my)
        fdctQuant(block, coef)
        var k = 1
        while (k < 64) {
          require(coef(k) == 0,
            "progressive differential fixture blocks must be DC-only")
          k += 1
        }
        dcs(my * bw + mx) = coef(0)
        mx += 1
      }
      my += 1
    }
    def sos(ss: Int, se: Int): Unit = {
      w8(0xff); w8(0xda); w8(0); w8(8)
      w8(1); w8(1); w8(0x00)
      w8(ss); w8(se); w8(0)
    }
    // --- scan 1: the DC band
    sos(0, 0)
    if (arith) {
      val enc = new QmCoder.Encoder(out)
      val dcSt = new QmCoder.Stats(64)
      val dcCtxs = new Array[Int](1)
      var pred = 0
      var blk = 0
      while (blk < dcs.length) {
        encodeDcDiffArith(enc, dcSt, dcCtxs, 0, dcs(blk) - pred)
        pred = dcs(blk)
        blk += 1
      }
      enc.finish()
    } else {
      val w = new BitWriter(out)
      var pred = 0
      var blk = 0
      while (blk < dcs.length) {
        val diff = dcs(blk) - pred
        val s = sizeCat(diff)
        w.put(EncDc.codes(s), EncDc.lens(s))
        if (s > 0) w.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
        pred = dcs(blk)
        blk += 1
      }
      w.finish()
    }
    // --- scan 2: the AC band, all blocks empty
    sos(1, 63)
    if (arith) {
      val enc = new QmCoder.Encoder(out)
      val acSt = new QmCoder.Stats(256)
      var blk = 0
      while (blk < dcs.length) {
        enc.encode(acSt, 0, 1) // EOB decision at k = Ss
        blk += 1
      }
      enc.finish()
    } else {
      val w = new BitWriter(out)
      var blk = 0
      while (blk < dcs.length) {
        w.put(EncAc.codes(0x00), 8) // EOB1 (run-length 1)
        blk += 1
      }
      w.finish()
    }
  }

  /** Real hierarchical bytes with a LOSSLESS refinement stage (T.81
    * Annex J + H.2): a block-constant SOF0 base frame (exact by the
    * all-ones-quant argument), EXP(1,1), then a DIFFERENTIAL LOSSLESS
    * SOF7 frame coding `fullGray − upsample(halfGray)` sample-exactly —
    * so the decoded image reproduces an ARBITRARY `fullGray`
    * bit-for-bit: the lossy-base + lossless-diff shape hierarchical
    * JPEG exists for. `halfGray` must be constant per 8×8 block (the
    * exact-base contract); `fullGray` is unconstrained. */
  def encodeJpegHierLossless(halfW: Int, halfH: Int,
      halfGray: (Int, Int) => Int, fullGray: (Int, Int) => Int,
      arith: Boolean = false, restartMcus: Int = 0): Array[Byte] = {
    require(halfW > 0 && halfH > 0 && halfW % 8 == 0 && halfH % 8 == 0 &&
      4L * halfW * halfH <= MaxPixels && 2 * halfW <= 0xffff &&
      2 * halfH <= 0xffff && restartMcus >= 0 && restartMcus <= 0xffff)
    val out = new java.io.ByteArrayOutputStream()
    hierPreambleAndBase(out, halfW, halfH, halfGray, arith)
    // the reference the decoder will hold: exact base, bilinear-doubled
    val half = Array.tabulate(halfH * halfW)(o =>
      halfGray(o % halfW, o / halfW) & 0xff)
    val up = expandV(expandH(half, halfW, halfH), 2 * halfW, halfH)
    hierExpSegment(out)
    // SOF7 (Huffman) / SOF15 (arithmetic): the differences, coded
    // per-sample with Ss = 0 — the same pixels through both entropy
    // spellings, the SOF13-vs-SOF5 cross-check pattern
    hierFrameHeader(out, if (arith) 0xcf else 0xc7, 2 * halfW, 2 * halfH)
    val ri = restartMcus
    if (ri > 0) { // DRI for the refinement scan (round 19)
      out.write(0xff); out.write(0xdd); out.write(0); out.write(4)
      out.write((ri >> 8) & 0xff); out.write(ri & 0xff)
    }
    out.write(0xff); out.write(0xda); out.write(0); out.write(8)
    out.write(1); out.write(1); out.write(0x00)
    out.write(0); out.write(0); out.write(0) // Ss = 0 (no prediction)
    val fw = 2 * halfW
    val fh = 2 * halfH
    var rst = 0
    if (arith) {
      val st = new QmCoder.Stats(160)
      var enc = new QmCoder.Encoder(out)
      val dPrev = new Array[Int](fw)
      val dCur = new Array[Int](fw)
      var riX = 0
      var riY = 0
      var mcu = 0L
      var y = 0
      while (y < fh) {
        var x = 0
        while (x < fw) {
          if (ri > 0 && mcu > 0 && mcu % ri == 0) {
            enc.finish()
            out.write(0xff); out.write(0xd0 + (rst & 7)); rst += 1
            enc = new QmCoder.Encoder(out)
            st.reset()
            riX = x
            riY = y
          }
          val firstLine = y == riY
          val diff = (fullGray(x, y) & 0xff) - up(y * fw + x)
          val ca =
            if (x == 0 || (firstLine && x == riX)) 0
            else losslessDiffClass(dCur(x - 1), 0, 1)
          val cb = if (firstLine) 0 else losslessDiffClass(dPrev(x), 0, 1)
          encodeLosslessDiffArith(enc, st, ca, cb, diff)
          dCur(x) = diff
          mcu += 1
          x += 1
        }
        System.arraycopy(dCur, 0, dPrev, 0, fw)
        y += 1
      }
      enc.finish()
    } else {
      var w = new BitWriter(out)
      var mcu = 0L
      var y = 0
      while (y < fh) {
        var x = 0
        while (x < fw) {
          if (ri > 0 && mcu > 0 && mcu % ri == 0) {
            w.finish()
            out.write(0xff); out.write(0xd0 + (rst & 7)); rst += 1
            w = new BitWriter(out)
          }
          val diff = (fullGray(x, y) & 0xff) - up(y * fw + x)
          val s = sizeCat(diff)
          w.put(EncDc.codes(s), EncDc.lens(s))
          if (s > 0) w.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
          mcu += 1
          x += 1
        }
        y += 1
      }
      w.finish()
    }
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** Shared hierarchical-fixture preamble: SOI + DHP (final geometry) +
    * all-ones DQT + entropy tables (DAC or DHT) + the non-differential
    * base frame at half resolution — common to [[encodeJpegHier]] and
    * [[encodeJpegHierLossless]]. */
  private def hierPreambleAndBase(out: java.io.ByteArrayOutputStream,
      halfW: Int, halfH: Int, halfGray: (Int, Int) => Int,
      arith: Boolean): Unit = {
    def w8(v: Int): Unit = out.write(v & 0xff)
    def wbe16(v: Int): Unit = { w8(v >> 8); w8(v) }
    def marker(m: Int): Unit = { w8(0xff); w8(m) }
    marker(0xd8) // SOI
    hierFrameHeader(out, 0xde, 2 * halfW, 2 * halfH) // DHP: final geometry
    marker(0xdb); wbe16(2 + 1 + 64) // DQT 0: all ones
    w8(0)
    var k = 0
    while (k < 64) { w8(1); k += 1 }
    if (arith) {
      // DAC: the (default) conditioning, like encodeJpeg's SOF9 path
      marker(0xcc); wbe16(2 + 4)
      w8(0x00); w8(0x10) // Tc=0 Tb=0, Cs = U<<4 | L
      w8(0x10); w8(5) // Tc=1 Tb=0, Cs = Kx
    } else {
      def dht(tc: Int, t: EncTable): Unit = {
        marker(0xc4); wbe16(2 + 17 + t.vals.length)
        w8(tc << 4)
        var l = 1
        while (l <= 16) { w8(t.bits(l)); l += 1 }
        t.vals.foreach(w8)
      }
      dht(0, EncDc)
      dht(1, EncAc)
    }
    // base frame: non-differential SOF0/SOF9 at half resolution
    val block = new Array[Double](64)
    hierDctFrame(out, if (arith) 0xc9 else 0xc0, halfW, halfH, arith,
      block, (mx, my) => {
        var i = 0
        while (i < 64) {
          block(i) = (halfGray(mx * 8 + i % 8, my * 8 + i / 8) & 0xff) - 128.0
          i += 1
        }
      })
  }

  private def hierExpSegment(out: java.io.ByteArrayOutputStream): Unit = {
    out.write(0xff); out.write(0xdf); out.write(0); out.write(3)
    out.write(0x11) // EXP: Eh=1, Ev=1
  }

  private def hierFrameHeader(out: java.io.ByteArrayOutputStream, m: Int,
      w2: Int, h2: Int): Unit = {
    def w8(v: Int): Unit = out.write(v & 0xff)
    w8(0xff); w8(m); w8(0); w8(8 + 3)
    w8(8); w8(h2 >> 8); w8(h2); w8(w2 >> 8); w8(w2); w8(1)
    w8(1); w8(0x11); w8(0) // component 1, 1×1, qt 0
  }

  /** One DCT frame of a hierarchical fixture: frame header + SOS +
    * every 8×8 block of `fill` through the selected entropy coder. */
  private def hierDctFrame(out: java.io.ByteArrayOutputStream, sofM: Int,
      w2: Int, h2: Int, arith: Boolean, block: Array[Double],
      fill: (Int, Int) => Unit): Unit = {
    def w8(v: Int): Unit = out.write(v & 0xff)
    hierFrameHeader(out, sofM, w2, h2)
    w8(0xff); w8(0xda); w8(0); w8(8) // SOS
    w8(1); w8(1); w8(0x00) // one component, DC/AC tables 0
    w8(0); w8(63); w8(0)
    val coef = new Array[Int](64)
    val preds = new Array[Int](1)
    val dcCtxs = new Array[Int](1)
    val w = if (arith) null else new BitWriter(out)
    val enc = if (arith) new QmCoder.Encoder(out) else null
    val dcSt = if (arith) new QmCoder.Stats(64) else null
    val acSt = if (arith) new QmCoder.Stats(256) else null
    var my = 0
    while (my < h2 / 8) {
      var mx = 0
      while (mx < w2 / 8) {
        fill(mx, my)
        fdctQuant(block, coef)
        if (arith) {
          encodeBlockArith(enc, dcSt, acSt, coef, preds, dcCtxs, 0)
          preds(0) = coef(0)
        } else preds(0) = encodeBlock(w, coef, preds(0))
        mx += 1
      }
      my += 1
    }
    if (arith) enc.finish() else w.finish()
  }

  /** Real LOSSLESS JPEG bytes (SOF3, T.81 Annex H): grayscale 8-bit,
    * spatial `predictor` 1–7 (scan header Ss), point transform 0, no
    * DQT (lossless has no quantization). Bit-exact round-trip for ANY
    * input — the only JPEG spelling whose decode reproduces arbitrary
    * pixels exactly, which is what lets q47's lossless slot carry the
    * full per-pixel gradient closed form like the PNG/BMP slots. */
  def encodeJpegLossless(width: Int, height: Int, gray: (Int, Int) => Int,
      predictor: Int = 4, restartRows: Int = 0,
      precision: Int = 8, restartMcus: Int = 0): Array[Byte] =
    encodeLosslessCore(width, height, 1,
      (_, x, y) => gray(x, y), predictor, restartRows, precision,
      restartMcus)

  /** Real 3-COMPONENT lossless JPEG bytes (SOF3, interleaved R,G,B at
    * 1×1 — the colorspace-blind exact mode; no JFIF marker on purpose,
    * a JFIF signature would promise YCbCr). `rgb` returns 0xRRGGBB. */
  def encodeJpegLosslessRgb(width: Int, height: Int,
      rgb: (Int, Int) => Int, predictor: Int = 4,
      restartRows: Int = 0): Array[Byte] =
    encodeLosslessCore(width, height, 3,
      (c, x, y) => (rgb(x, y) >> (16 - 8 * c)) & 0xff, predictor, restartRows)

  /** Shared SOF3 encoder: `nc` interleaved 1×1 components off
    * `sample(comp, x, y)`, optional restart intervals — `restartRows`
    * rows per interval (row-aligned, DRI Ri = restartRows·width MCUs)
    * or, round 19, `restartMcus` for an interval starting at ARBITRARY
    * sample positions. Prediction resets per T.81 H.1 — the interval's
    * first sample takes the default, the remainder of that line uses
    * predictor 1. */
  private def encodeLosslessCore(width: Int, height: Int, nc: Int,
      sample: (Int, Int, Int) => Int, predictor: Int,
      restartRows: Int, precision: Int = 8,
      restartMcus: Int = 0): Array[Byte] = {
    val ri =
      if (restartMcus > 0) restartMcus else restartRows * width
    require(width > 0 && height > 0 && width <= 0xffff && height <= 0xffff &&
      width.toLong * height <= MaxPixels && predictor >= 1 && predictor <= 7 &&
      restartRows >= 0 && restartMcus >= 0 && ri <= 0xffff &&
      precision >= 8 && precision <= 16 && (nc == 1 || precision == 8))
    // P > 8 widens sample values, difference coding (mod 2^16 with the
    // s=16 special category), and the DC category table (EncDcWide)
    val mask = (1 << precision) - 1
    val dc = if (precision > 8) EncDcWide else EncDc
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def wbe16(v: Int): Unit = { w8(v >> 8); w8(v) }
    def marker(m: Int): Unit = { w8(0xff); w8(m) }
    marker(0xd8)
    if (nc == 1) { // JFIF only for grayscale (see encodeJpegLosslessRgb)
      marker(0xe0); wbe16(16)
      out.write("JFIF".getBytes("US-ASCII")); w8(0)
      w8(1); w8(1); w8(0); wbe16(1); wbe16(1); w8(0); w8(0)
    }
    marker(0xc3); wbe16(8 + 3 * nc) // SOF3
    w8(precision); wbe16(height); wbe16(width); w8(nc)
    var c = 0
    while (c < nc) { w8(c + 1); w8(0x11); w8(0); c += 1 }
    marker(0xc4); wbe16(2 + 17 + dc.vals.length) // DHT, DC class
    w8(0x00)
    var l = 1
    while (l <= 16) { w8(dc.bits(l)); l += 1 }
    dc.vals.foreach(w8)
    if (ri > 0) {
      marker(0xdd); wbe16(4); wbe16(ri) // DRI, Ri in MCUs
    }
    marker(0xda); wbe16(6 + 2 * nc) // SOS
    w8(nc)
    c = 0
    while (c < nc) { w8(c + 1); w8(0x00); c += 1 }
    w8(predictor); w8(0); w8(0) // Ss = predictor, Se = 0, Ah/Al = 0
    var w = new BitWriter(out)
    val prev = Array.ofDim[Int](nc, width)
    val cur = Array.ofDim[Int](nc, width)
    var rst = 0
    var riX = 0
    var riY = 0
    var mcu = 0L
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        if (ri > 0 && mcu > 0 && mcu % ri == 0) {
          w.finish()
          marker(0xd0 + (rst & 7))
          rst += 1
          w = new BitWriter(out)
          riX = x
          riY = y
        }
        val firstLine = y == riY
        var ci = 0
        while (ci < nc) {
          val v = sample(ci, x, y) & mask
          val cl = cur(ci)
          val pl = prev(ci)
          val pred =
            if (firstLine && x == riX) 1 << (precision - 1) // 2^(P−1)
            else if (firstLine) cl(x - 1)
            else if (x == 0) pl(0)
            else {
              val a = cl(x - 1)
              val bb = pl(x)
              val cc = pl(x - 1)
              predictor match {
                case 1 => a
                case 2 => bb
                case 3 => cc
                case 4 => a + bb - cc
                case 5 => a + ((bb - cc) >> 1)
                case 6 => bb + ((a - cc) >> 1)
                case _ => (a + bb) >> 1
              }
            }
          // difference mod 2^16 mapped signed (T.81 H.1.2.2): −32768
          // takes the s=16 special category with NO extra bits
          val diff = ((v - pred) << 16) >> 16
          if (diff == -32768) w.put(dc.codes(16), dc.lens(16))
          else {
            val s = sizeCat(diff)
            w.put(dc.codes(s), dc.lens(s))
            if (s > 0) w.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
          }
          cl(x) = v
          ci += 1
        }
        mcu += 1
        x += 1
      }
      c = 0
      while (c < nc) {
        System.arraycopy(cur(c), 0, prev(c), 0, width)
        c += 1
      }
      y += 1
    }
    w.finish()
    marker(0xd9)
    out.toByteArray
  }

  /** Real LOSSLESS ARITHMETIC JPEG bytes (SOF11, Annexes H.1 + D):
    * the same predictor/mod-2^16 pipeline as [[encodeJpegLossless]],
    * entropy through the QM coder under the H.1 (left, above)
    * difference-class conditioning — bit-exact round-trip for ANY
    * input, the arithmetic spelling of the only exact JPEG mode. */
  def encodeJpegLosslessArith(width: Int, height: Int,
      gray: (Int, Int) => Int, predictor: Int = 4,
      precision: Int = 8, restartRows: Int = 0,
      restartMcus: Int = 0): Array[Byte] =
    encodeJpegLosslessArithImpl(width, height, 1,
      (_, x, y) => gray(x, y), predictor, precision, restartRows,
      restartMcus)

  /** 3-component interleaved arithmetic lossless (SOF11 RGB — round 18):
    * same component conventions as [[encodeJpegLosslessRgb]], entropy
    * through per-DC-destination QM statistics (components declare
    * distinct DAC destinations 0/1/2). `rgb` returns 0xRRGGBB. */
  def encodeJpegLosslessArithRgb(width: Int, height: Int,
      rgb: (Int, Int) => Int, predictor: Int = 4,
      restartRows: Int = 0): Array[Byte] =
    encodeJpegLosslessArithImpl(width, height, 3,
      (c, x, y) => (rgb(x, y) >> (16 - 8 * c)) & 0xff, predictor, 8,
      restartRows)

  private def encodeJpegLosslessArithImpl(width: Int, height: Int, nc: Int,
      sample: (Int, Int, Int) => Int, predictor: Int,
      precision: Int, restartRows: Int = 0,
      restartMcus: Int = 0): Array[Byte] = {
    val ri =
      if (restartMcus > 0) restartMcus else restartRows * width
    require(width > 0 && height > 0 && width <= 0xffff && height <= 0xffff &&
      width.toLong * height <= MaxPixels && predictor >= 1 && predictor <= 7 &&
      restartRows >= 0 && restartMcus >= 0 && ri <= 0xffff &&
      precision >= 8 && precision <= 16 && (nc == 1 || precision == 8))
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def wbe16(v: Int): Unit = { w8(v >> 8); w8(v) }
    def marker(m: Int): Unit = { w8(0xff); w8(m) }
    val mask = (1 << precision) - 1
    marker(0xd8)
    marker(0xe0); wbe16(16)
    out.write("JFIF".getBytes("US-ASCII")); w8(0)
    w8(1); w8(1); w8(0); wbe16(1); wbe16(1); w8(0); w8(0)
    marker(0xcb); wbe16(8 + 3 * nc) // SOF11
    w8(precision); wbe16(height); wbe16(width); w8(nc)
    var c = 0
    while (c < nc) { w8(c + 1); w8(0x11); w8(0); c += 1 }
    marker(0xcc); wbe16(2 + 2 * nc) // DAC: per-component DC destination
    c = 0
    while (c < nc) { w8(c); w8(0x10); c += 1 } // default L=0 U=1 each
    if (ri > 0) {
      marker(0xdd); wbe16(4); wbe16(ri) // DRI, Ri in MCUs
    }
    marker(0xda); wbe16(6 + 2 * nc) // SOS
    w8(nc)
    c = 0
    while (c < nc) { w8(c + 1); w8(c << 4); c += 1 } // dcSel = c
    w8(predictor); w8(0); w8(0) // Ss = predictor, Se = 0, Ah/Al = 0
    val st = Array.fill(nc)(new QmCoder.Stats(160))
    var enc = new QmCoder.Encoder(out)
    val defaultPred = 1 << (precision - 1)
    val prev = Array.ofDim[Int](nc, width)
    val cur = Array.ofDim[Int](nc, width)
    val dPrev = Array.ofDim[Int](nc, width)
    val dCur = Array.ofDim[Int](nc, width)
    var rst = 0
    var riX = 0
    var riY = 0
    var mcu = 0L
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        if (ri > 0 && mcu > 0 && mcu % ri == 0) {
          // flush the QM segment, emit RSTn, reset state
          enc.finish()
          marker(0xd0 + (rst & 7))
          rst += 1
          enc = new QmCoder.Encoder(out)
          st.foreach(_.reset())
          riX = x
          riY = y
        }
        val firstLine = y == riY
        var ci = 0
        while (ci < nc) {
          val v = sample(ci, x, y) & mask
          val cl = cur(ci)
          val pl = prev(ci)
          val pred =
            if (firstLine && x == riX) defaultPred // 2^(P−1)
            else if (firstLine) cl(x - 1)
            else if (x == 0) pl(0)
            else {
              val a = cl(x - 1)
              val bb = pl(x)
              val cc = pl(x - 1)
              predictor match {
                case 1 => a
                case 2 => bb
                case 3 => cc
                case 4 => a + bb - cc
                case 5 => a + ((bb - cc) >> 1)
                case 6 => bb + ((a - cc) >> 1)
                case _ => (a + bb) >> 1
              }
            }
          val diff = (((v - pred) & 0xffff) << 16) >> 16 // signed-16 window
          val ca =
            if (x == 0 || (firstLine && x == riX)) 0
            else losslessDiffClass(dCur(ci)(x - 1), 0, 1)
          val cb = if (firstLine) 0 else losslessDiffClass(dPrev(ci)(x), 0, 1)
          encodeLosslessDiffArith(enc, st(ci), ca, cb, diff)
          cl(x) = v
          dCur(ci)(x) = diff
          ci += 1
        }
        mcu += 1
        x += 1
      }
      var ci = 0
      while (ci < nc) {
        System.arraycopy(cur(ci), 0, prev(ci), 0, width)
        System.arraycopy(dCur(ci), 0, dPrev(ci), 0, width)
        ci += 1
      }
      y += 1
    }
    enc.finish()
    marker(0xd9)
    out.toByteArray
  }

  /** Real PROGRESSIVE arithmetic JPEG bytes (SOF10): the standard
    * four-kind scan script — interleaved DC first (Al=1), per-component
    * AC first over the full band (Al=1), DC refinement (Ah=1, one
    * equiprobable bit per block), per-component AC refinement — each
    * scan its own QM entropy segment with fresh statistics. Point
    * transforms follow G.1.2.1: DC is an arithmetic right shift (floor;
    * the refinement ORs the true bit back — two's complement makes the
    * pair exact), AC is division truncating toward zero (the refinement
    * ADDS toward larger magnitude). Same quantized coefficients as the
    * other spellings, so decoded pixels must be bit-identical to the
    * SOF0/SOF9 decode of the same image — the cross-check the spec
    * pins, alongside ImageIO's independent SOF10 decode. */
  def encodeJpegProgArith(width: Int, height: Int,
      px: (Int, Int) => (Int, Int, Int), gray: Boolean = false,
      gray12: (Int, Int) => Int = null): Array[Byte] = {
    require(width > 0 && height > 0 && width <= 0xffff && height <= 0xffff &&
      width.toLong * height <= MaxPixels)
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def wbe16(v: Int): Unit = { w8(v >> 8); w8(v) }
    def marker(m: Int): Unit = { w8(0xff); w8(m) }
    marker(0xd8)
    marker(0xe0); wbe16(16)
    out.write("JFIF".getBytes("US-ASCII")); w8(0)
    w8(1); w8(1); w8(0); wbe16(1); wbe16(1); w8(0); w8(0)
    marker(0xdb); wbe16(2 + 1 + 64)
    w8(0)
    var k = 0
    while (k < 64) { w8(1); k += 1 }
    // gray12 non-null: 12-BIT progressive arithmetic (round 18) — the
    // same scan script at P = 12 (level shift 2048)
    val nf = if (gray || gray12 != null) 1 else 3
    marker(0xca); wbe16(8 + 3 * nf) // SOF10
    w8(if (gray12 != null) 12 else 8); wbe16(height); wbe16(width); w8(nf)
    var c = 0
    while (c < nf) { w8(c + 1); w8(0x11); w8(0); c += 1 }
    marker(0xcc); wbe16(2 + 4) // DAC, spec defaults spelled out
    w8(0x00); w8(0x10)
    w8(0x10); w8(5)

    // planes → per-block quantized coefficients, MCU raster order
    val planes = Array.fill(nf)(new Array[Double](width * height))
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val o = y * width + x
        if (gray12 != null)
          planes(0)(o) = (gray12(x, y) & 0xfff).toDouble - 2048.0
        else {
          val (r, g, b) = px(x, y)
          if (gray)
            planes(0)(o) = ((299 * (r & 0xff) + 587 * (g & 0xff) +
              114 * (b & 0xff)) / 1000).toDouble - 128.0
          else {
            planes(0)(o) = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
            planes(1)(o) = -0.168736 * r - 0.331264 * g + 0.5 * b
            planes(2)(o) = 0.5 * r - 0.418688 * g - 0.081312 * b
          }
        }
        x += 1
      }
      y += 1
    }
    val mcusX = (width + 7) / 8
    val mcusY = (height + 7) / 8
    val blocks = Array.fill(nf, mcusX * mcusY)(new Array[Int](64))
    val blockBuf = new Array[Double](64)
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        c = 0
        while (c < nf) {
          var by = 0
          while (by < 8) {
            var bx = 0
            while (bx < 8) {
              val sx = math.min(mx * 8 + bx, width - 1)
              val sy = math.min(my * 8 + by, height - 1)
              blockBuf(by * 8 + bx) = planes(c)(sy * width + sx)
              bx += 1
            }
            by += 1
          }
          fdctQuant(blockBuf, blocks(c)(my * mcusX + mx))
          c += 1
        }
        mx += 1
      }
      my += 1
    }

    def sos(compIds: Seq[Int], ss: Int, se: Int, ah: Int, al: Int): Unit = {
      marker(0xda); wbe16(6 + 2 * compIds.length)
      w8(compIds.length)
      compIds.foreach { id => w8(id); w8(0x00) }
      w8(ss); w8(se); w8((ah << 4) | al)
    }
    val nBlocks = mcusX * mcusY

    // --- scan 1: DC first, interleaved, Al = 1 (values floor-shifted)
    sos((1 to nf), 0, 0, 0, 1)
    locally {
      val enc = new QmCoder.Encoder(out)
      val dcSt = new QmCoder.Stats(64)
      val dcCtxs = new Array[Int](nf)
      val preds = new Array[Int](nf)
      var blk = 0
      while (blk < nBlocks) {
        c = 0
        while (c < nf) {
          val v = blocks(c)(blk)(0) >> 1
          encodeDcDiffArith(enc, dcSt, dcCtxs, c, v - preds(c))
          preds(c) = v
          c += 1
        }
        blk += 1
      }
      enc.finish()
    }
    // --- scans 2..: AC first per component, Al = 1 (truncating divide)
    c = 0
    while (c < nf) {
      sos(Seq(c + 1), 1, 63, 0, 1)
      val enc = new QmCoder.Encoder(out)
      val acSt = new QmCoder.Stats(256)
      var blk = 0
      while (blk < nBlocks) {
        val coefs = blocks(c)(blk)
        encodeAcTree(enc, acSt, kk => coefs(ZigZag(kk)) / 2, 1, 63)
        blk += 1
      }
      enc.finish()
      c += 1
    }
    // --- DC refinement: the true bit 0, equiprobable
    sos((1 to nf), 0, 0, 1, 0)
    locally {
      val enc = new QmCoder.Encoder(out)
      var blk = 0
      while (blk < nBlocks) {
        c = 0
        while (c < nf) {
          enc.encodeFixed(blocks(c)(blk)(0) & 1)
          c += 1
        }
        blk += 1
      }
      enc.finish()
    }
    // --- AC refinement per component, Ah = 1, Al = 0
    c = 0
    while (c < nf) {
      sos(Seq(c + 1), 1, 63, 1, 0)
      val enc = new QmCoder.Encoder(out)
      val acSt = new QmCoder.Stats(256)
      var blk = 0
      while (blk < nBlocks) {
        encodeAcRefineBlock(enc, acSt, blocks(c)(blk), al = 0)
        blk += 1
      }
      enc.finish()
      c += 1
    }
    marker(0xd9)
    out.toByteArray
  }

  /** DC diff through the F.1.4 conditioning model (shared by the
    * sequential block encoder and the progressive DC-first scan). */
  private def encodeDcDiffArith(enc: QmCoder.Encoder, dcSt: QmCoder.Stats,
      dcCtxs: Array[Int], ci: Int, diff: Int): Unit = {
    val ctx = dcCtxs(ci)
    if (diff == 0) {
      enc.encode(dcSt, ctx, 0)
      dcCtxs(ci) = 0
    } else {
      enc.encode(dcSt, ctx, 1)
      val sign = if (diff < 0) 1 else 0
      enc.encode(dcSt, ctx + 1, sign)
      val v = math.abs(diff) - 1
      var m = 0
      if (v == 0) enc.encode(dcSt, ctx + 2 + sign, 0)
      else {
        enc.encode(dcSt, ctx + 2 + sign, 1)
        m = 1
        var xst = 20
        while (2 * m <= v) { enc.encode(dcSt, xst, 1); m <<= 1; xst += 1 }
        enc.encode(dcSt, xst, 0)
        var mm = m
        val mb = xst + 14
        while ({ mm >>= 1; mm != 0 })
          enc.encode(dcSt, mb, if ((v & mm) != 0) 1 else 0)
      }
      dcCtxs(ci) = // default L=0 / U=1 classification
        if (m < ((1 << 0) >> 1)) 0
        else if (m > ((1 << 1) >> 1)) 12 + sign * 4
        else 4 + sign * 4
    }
  }

  /** One block of the G.2 AC successive-approximation refinement scan:
    * EOB decisions only beyond the previous stage's end-of-block,
    * correction bits for already-significant coefficients, run bin +
    * equiprobable sign for newly significant ones. */
  private def encodeAcRefineBlock(enc: QmCoder.Encoder, acSt: QmCoder.Stats,
      coefs: Array[Int], al: Int): Unit = {
    val ah = al + 1
    var ke = 63
    while (ke >= 1 && (math.abs(coefs(ZigZag(ke))) >> al) == 0) ke -= 1
    var kex = 63
    while (kex >= 1 && (math.abs(coefs(ZigZag(kex))) >> ah) == 0) kex -= 1
    var k = 1
    var ended = false
    while (!ended && k <= 63) {
      var s3 = 3 * (k - 1)
      if (k > kex && k > ke) { enc.encode(acSt, s3, 1); ended = true } // EOB
      else {
        if (k > kex) enc.encode(acSt, s3, 0)
        var placed = false
        while (!placed) {
          val cv = coefs(ZigZag(k))
          val magNow = math.abs(cv) >> al
          if ((math.abs(cv) >> ah) != 0) { // known coefficient: its Al bit
            enc.encode(acSt, s3 + 2, magNow & 1)
            placed = true
          } else if (magNow != 0) { // newly significant (magnitude is 1)
            enc.encode(acSt, s3 + 1, 1)
            enc.encodeFixed(if (cv < 0) 1 else 0)
            placed = true
          } else {
            enc.encode(acSt, s3 + 1, 0)
            s3 += 3
            k += 1
          }
        }
        k += 1
      }
    }
  }

  /** One block through the T.81 F.1.4 arithmetic statistical model —
    * the exact encoding mirror of [[decodeArithScan]]'s per-block walk
    * (default conditioning L=0, U=1, Kx=5, the DAC values the header
    * spells). */
  private def encodeBlockArith(enc: QmCoder.Encoder, dcSt: QmCoder.Stats,
      acSt: QmCoder.Stats, coef: Array[Int], preds: Array[Int],
      dcCtxs: Array[Int], ci: Int): Unit = {
    // ---- DC diff through the conditioning model
    encodeDcDiffArith(enc, dcSt, dcCtxs, ci, coef(0) - preds(ci))
    // ---- AC run/EOB tree over the full band
    encodeAcTree(enc, acSt, k => coef(ZigZag(k)), 1, 63)
  }

  /** The F.1.4 AC decision tree over band [kFrom, kTo] of `get`
    * (zigzag-position-indexed values): shared by the sequential block
    * encoder and the progressive AC-first scans. */
  private def encodeAcTree(enc: QmCoder.Encoder, acSt: QmCoder.Stats,
      get: Int => Int, kFrom: Int, kTo: Int): Unit = {
    var kend = kTo
    while (kend >= kFrom && get(kend) == 0) kend -= 1
    var k = kFrom
    while (k <= kTo) {
      var s3 = 3 * (k - 1)
      if (k > kend) { enc.encode(acSt, s3, 1); k = kTo + 1 } // EOB
      else {
        enc.encode(acSt, s3, 0)
        while (get(k) == 0) {
          enc.encode(acSt, s3 + 1, 0)
          s3 += 3
          k += 1
        }
        enc.encode(acSt, s3 + 1, 1)
        val cv = get(k)
        val sign = if (cv < 0) 1 else 0
        enc.encodeFixed(sign)
        val v = math.abs(cv) - 1
        var st2 = s3 + 2
        if (v == 0) enc.encode(acSt, st2, 0)
        else {
          enc.encode(acSt, st2, 1)
          var m = 1
          if (v < 2) enc.encode(acSt, st2, 0) // magnitude 2
          else {
            enc.encode(acSt, st2, 1)
            m = 2
            st2 = if (k <= 5) 189 else 217 // default Kx = 5
            while (2 * m <= v) { enc.encode(acSt, st2, 1); m <<= 1; st2 += 1 }
            enc.encode(acSt, st2, 0)
          }
          var mm = m
          val mb = st2 + 14
          while ({ mm >>= 1; mm != 0 })
            enc.encode(acSt, mb, if ((v & mm) != 0) 1 else 0)
        }
        k += 1
      }
    }
  }
}
