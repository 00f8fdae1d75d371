package graft.operators

/** Zero-dependency baseline TIFF 6.0 decode (round 18) — the
  * scanned-document workhorse of real crawls, and a fully-specified
  * format: IFD tag walk, strip assembly, PackBits RLE, and the TIFF
  * flavor of LZW (MSB-first bit packing, 9-bit initial codes, EARLY
  * code-width change at 2^n − 1, Clear/EOI), plus the horizontal-
  * differencing predictor.
  *
  *  - Container: `II`*42 little-endian or `MM`*42 big-endian; the FIRST
  *    IFD only (multi-page files decode their first page). Entry types
  *    BYTE/SHORT/LONG read endian-aware, inline or by offset.
  *    Planar configuration 2 (separate component planes, per-plane
  *    strip sequences, plane-stride predictor) decodes for the RGB
  *    shape since round 19 — ImageIO-cross-checked.
  *  - Shapes: grayscale 1/4/8/16-bit (photometric 0 WhiteIsZero —
  *    inverted — and 1 BlackIsZero; 16-bit keeps the high byte,
  *    endian-aware), PALETTE 4/8-bit (ColorMap SHORTs, high byte), RGB
  *    8/8/8 and RGBA 8888 (alpha dropped — PixelImage is RGB).
  *  - Compression: 1 none, 5 LZW (+ predictor 2 on 8-bit samples),
  *    32773 PackBits, and — round 19 — the COMPLETE CCITT fax family:
  *    2 Modified Huffman (1D, byte-aligned rows), 3 Group 3 / T.4
  *    (EOL-separated 1D and, under T4Options bit 0, alternating 1D/2D),
  *    4 GROUP 4 (T.6 2D MMR, strips coded independently). The
  *    uncompressed-mode extensions (T4Options/T6Options bit 1) → None.
  *    CCITT tables cross-checked both directions against
  *    javax.imageio's independent codec. JPEG-in-TIFF → None.
  *  - Strips: RowsPerStrip honored (default: whole image), per-strip
  *    byte counts checked; every strip decompresses independently.
  *
  * The encoder (fixtures + round-trip tests) writes both endians, real
  * strip splits, all three compressions — its LZW is a REAL
  * string-table encoder (hash-chained prefixes, early change, Clear at
  * table-full) so the decoder's dictionary growth paths are exercised —
  * and the horizontal predictor. Lossless, so closed-form oracles hold
  * bit-for-bit; javax.imageio ships an independent TIFF reader (Java 9+)
  * the spec suite cross-checks against.
  *
  * Reference capability: multimodal feature extraction over binary
  * columns (BASELINE.md north star).
  */
object TiffCodec {
  import PixelCodec.PixelImage

  private val MaxPixels = 1 << 26

  private final class Corrupt extends RuntimeException(null, null, false, false)
  private def corrupt(): Nothing = throw new Corrupt

  def decode(b: Array[Byte]): Option[PixelImage] = {
    try decodeImpl(b)
    catch {
      case _: Corrupt => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }
  }

  private def decodeImpl(b: Array[Byte]): Option[PixelImage] = {
    if (b == null || b.length < 16) return None
    val le =
      if (b(0) == 'I' && b(1) == 'I') true
      else if (b(0) == 'M' && b(1) == 'M') false
      else return None
    def u16(i: Int): Int =
      if (le) (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
      else ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
    def u32(i: Int): Long =
      if (le) (u16(i) | (u16(i + 2).toLong << 16)) & 0xffffffffL
      else ((u16(i).toLong << 16) | u16(i + 2)) & 0xffffffffL
    if (u16(2) != 42) return None
    val ifd = u32(4)
    if (ifd < 8 || ifd + 2 > b.length) return None
    val n = u16(ifd.toInt)
    if (n < 1 || ifd + 2 + 12L * n + 4 > b.length) return None

    // tag → (type, count, value-or-offset position)
    var width = 0
    var height = 0
    var bits: Array[Int] = Array(1) // BitsPerSample default 1
    var spp = 1
    var compression = 1
    var photometric = -1
    var rowsPerStrip = Long.MaxValue
    var predictor = 1
    var planar = 1
    var stripOffsets: Array[Long] = null
    var stripCounts: Array[Long] = null
    var colorMap: Array[Int] = null
    var extraSamples = 0
    var t4Options = 0L
    var t6Options = 0L
    var jpegTables: Array[Byte] = null

    def typeSize(t: Int): Int = t match {
      case 1 | 2 | 6 | 7 => 1 // BYTE/ASCII/SBYTE/UNDEFINED
      case 3 | 8 => 2 // SHORT/SSHORT
      case 4 | 9 | 11 => 4 // LONG/SLONG/FLOAT
      case 5 | 10 | 12 => 8 // RATIONAL/SRATIONAL/DOUBLE
      case _ => corrupt()
    }
    /** Read entry values as Longs (BYTE/SHORT/LONG only). */
    def values(typ: Int, count: Int, at: Int): Array[Long] = {
      if (typ != 1 && typ != 3 && typ != 4) corrupt()
      val sz = typeSize(typ)
      val total = sz.toLong * count
      val base = if (total <= 4) at else {
        val off = u32(at)
        if (off + total > b.length) corrupt()
        off.toInt
      }
      Array.tabulate(count) { k =>
        typ match {
          case 1 => (b(base + k) & 0xff).toLong
          case 3 => u16(base + 2 * k).toLong
          case _ => u32(base + 4 * k)
        }
      }
    }

    var e = 0
    while (e < n) {
      val at = ifd.toInt + 2 + 12 * e
      val tag = u16(at)
      val typ = u16(at + 2)
      val countL = u32(at + 4)
      if (countL > (1 << 24)) corrupt()
      val count = countL.toInt
      val vat = at + 8
      tag match {
        case 256 => width = values(typ, count, vat)(0).toInt
        case 257 => height = values(typ, count, vat)(0).toInt
        case 258 => bits = values(typ, count, vat).map(_.toInt)
        case 259 => compression = values(typ, count, vat)(0).toInt
        case 262 => photometric = values(typ, count, vat)(0).toInt
        case 273 => stripOffsets = values(typ, count, vat)
        case 277 => spp = values(typ, count, vat)(0).toInt
        case 278 => rowsPerStrip = values(typ, count, vat)(0)
        case 279 => stripCounts = values(typ, count, vat)
        case 284 => planar = values(typ, count, vat)(0).toInt
        case 317 => predictor = values(typ, count, vat)(0).toInt
        case 292 => t4Options = values(typ, count, vat)(0)
        case 293 => t6Options = values(typ, count, vat)(0)
        case 347 => // JPEGTables: shared DQT/DHT for abbreviated strips
          if (count < 0 || count > (1 << 20) || typ != 7 && typ != 1)
            corrupt()
          val base = if (count <= 4) vat else {
            val o = u32(vat)
            if (o + count > b.length) corrupt()
            o.toInt
          }
          jpegTables = java.util.Arrays.copyOfRange(b, base, base + count)
        case 320 => colorMap = values(typ, count, vat).map(_.toInt)
        case 338 => extraSamples = count // RGBA: alpha dropped below
        case _ => () // resolution, descriptions, … — irrelevant to pixels
      }
      e += 1
    }

    if (width <= 0 || height <= 0 || width.toLong * height > MaxPixels) return None
    if (stripOffsets == null || stripCounts == null ||
        stripOffsets.length != stripCounts.length || stripOffsets.isEmpty)
      return None
    // planar configuration 2 (separate component planes — round 19):
    // supported for the RGB 8-bit shape below; with one sample per
    // pixel the two configurations are byte-identical, so spp==1 files
    // declaring planar 2 decode through the chunky path
    if (planar != 1 && planar != 2) return None
    if (predictor != 1 && predictor != 2) return None
    if (spp != bits.length) return None
    val bps = bits(0)
    if (bits.exists(_ != bps)) return None

    // supported shape matrix
    val shape = (photometric, spp - extraSamples, bps) match {
      case (0 | 1, 1, 1 | 4 | 8 | 16) if spp == 1 => "gray"
      case (3, 1, 4 | 8) if spp == 1 && colorMap != null => "palette"
      case (2, 3, 8) => "rgb"
      // new-style JPEG-in-TIFF carries YCbCr (photometric 6) strips;
      // the embedded T.81 decode outputs RGB directly
      case (6, 3, 8) if compression == 7 => "rgb"
      case _ => return None
    }
    if (shape == "palette" && colorMap.length < 3 * (1 << bps)) return None
    if (predictor == 2 && (bps != 8 || compression != 5)) return None
    // CCITT fax family (compressions 2 MH / 3 T.4 / 4 T.6): bilevel
    // only; the uncompressed-mode extensions (T4Options bit 1,
    // T6Options bit 1) are out of scope — labeled stub
    if ((compression == 2 || compression == 3 || compression == 4) &&
        (shape != "gray" || bps != 1)) return None
    if (compression == 4 && t6Options != 0L) return None
    if (compression == 3 && (t4Options & ~1L) != 0L) return None

    val rps = if (rowsPerStrip < 1 || rowsPerStrip > height) height
              else rowsPerStrip.toInt
    val expectStrips = (height + rps - 1) / rps

    // ---------- planar configuration 2: per-component strip sequences
    if (planar == 2 && spp > 1) {
      // RGB 8-bit only (the shape the spec's planar examples use); the
      // strip list is all of plane 0's strips, then plane 1's, plane 2's
      if (shape != "rgb") return None
      if (stripOffsets.length < 3 * expectStrips) return None
      val rowBytesP = width // 8-bit, one sample per pixel per plane
      val out = new Array[Byte](width * height * 3)
      var c = 0
      while (c < 3) {
        var stripRow = 0
        var s = 0
        while (s < expectStrips) {
          val idx = c * expectStrips + s
          val rows = math.min(rps, height - stripRow)
          val off = stripOffsets(idx)
          val cnt = stripCounts(idx)
          if (off < 0 || cnt < 0 || off + cnt > b.length) return None
          val raw = compression match {
            case 1 =>
              if (cnt < rowBytesP.toLong * rows) return None
              java.util.Arrays.copyOfRange(b, off.toInt,
                (off + rowBytesP.toLong * rows).toInt)
            case 5 => lzwDecode(b, off.toInt, (off + cnt).toInt, rowBytesP * rows)
            case 32773 => packBitsDecode(b, off.toInt, (off + cnt).toInt,
              rowBytesP * rows)
            case _ => return None
          }
          if (predictor == 2) { // per plane the delta stride is ONE sample
            var r = 0
            while (r < rows) {
              var i = 1
              while (i < rowBytesP) {
                raw(r * rowBytesP + i) =
                  ((raw(r * rowBytesP + i) + raw(r * rowBytesP + i - 1)) & 0xff).toByte
                i += 1
              }
              r += 1
            }
          }
          var r = 0
          while (r < rows) {
            var x = 0
            while (x < width) {
              out(((stripRow + r) * width + x) * 3 + c) = raw(r * rowBytesP + x)
              x += 1
            }
            r += 1
          }
          stripRow += rows
          s += 1
        }
        c += 1
      }
      return Some(PixelImage(width, height, out))
    }

    if (stripOffsets.length < expectStrips) return None
    val rowBytes = ((width.toLong * spp * bps + 7) / 8).toInt

    val out = new Array[Byte](width * height * 3)
    var stripRow = 0
    var s = 0
    while (s < expectStrips) {
      val rows = math.min(rps, height - stripRow)
      val off = stripOffsets(s)
      val cnt = stripCounts(s)
      if (off < 0 || cnt < 0 || off + cnt > b.length) return None
      val raw = compression match {
        case 1 =>
          if (cnt < rowBytes.toLong * rows) return None
          java.util.Arrays.copyOfRange(b, off.toInt, (off + rowBytes.toLong * rows).toInt)
        case 2 =>
          val d = mhDecode(b, off.toInt, (off + cnt).toInt, width, rows)
          if (d == null) return None
          d
        case 3 =>
          val d = g3Decode(b, off.toInt, (off + cnt).toInt, width, rows,
            (t4Options & 1L) != 0L)
          if (d == null) return None
          d
        case 4 =>
          val d = g4Decode(b, off.toInt, (off + cnt).toInt, width, rows)
          if (d == null) return None
          d
        case 5 => lzwDecode(b, off.toInt, (off + cnt).toInt, rowBytes * rows)
        case 7 =>
          // new-style JPEG-in-TIFF: each strip is a T.81 stream, either
          // complete or abbreviated against the shared JPEGTables tag
          val strip = java.util.Arrays.copyOfRange(b, off.toInt, (off + cnt).toInt)
          if (strip.length < 4 || (strip(0) & 0xff) != 0xff ||
              (strip(1) & 0xff) != 0xd8) return None
          val stream =
            if (jpegTables != null && jpegTables.length > 4) {
              // SOI + tables body (sans its SOI/EOI) + strip body
              val o = new java.io.ByteArrayOutputStream(
                jpegTables.length + strip.length)
              o.write(0xff); o.write(0xd8)
              o.write(jpegTables, 2, jpegTables.length - 4)
              o.write(strip, 2, strip.length - 2)
              o.toByteArray
            } else strip
          val img = JpegCodec.decode(stream) match {
            case Some(i) => i
            case None => return None
          }
          if (img.width != width || img.height != rows) return None
          if (shape == "rgb") img.rgb
          else { // gray: the decoder replicates luma across channels
            val g = new Array[Byte](width * rows)
            var i = 0
            while (i < g.length) { g(i) = img.rgb(3 * i); i += 1 }
            g
          }
        case 32773 => packBitsDecode(b, off.toInt, (off + cnt).toInt, rowBytes * rows)
        case _ => return None // old-style JPEG (compression 6): labeled stub
      }
      if (predictor == 2) { // horizontal differencing, per row per channel
        var r = 0
        while (r < rows) {
          var i = spp
          val base = r * rowBytes
          while (i < rowBytes) {
            raw(base + i) = ((raw(base + i) + raw(base + i - spp)) & 0xff).toByte
            i += 1
          }
          r += 1
        }
      }
      // assemble rows into RGB
      var r = 0
      while (r < rows) {
        val y = stripRow + r
        val rowBase = r * rowBytes
        var x = 0
        while (x < width) {
          val o = (y * width + x) * 3
          shape match {
            case "rgb" =>
              val p = rowBase + x * spp
              out(o) = raw(p); out(o + 1) = raw(p + 1); out(o + 2) = raw(p + 2)
            case "palette" =>
              val idx =
                if (bps == 8) raw(rowBase + x) & 0xff
                else (raw(rowBase + (x >> 1)) >> (4 * (1 - (x & 1)))) & 0x0f
              // ColorMap: all reds, then greens, then blues — 16-bit SHORTs
              out(o) = (colorMap(idx) >> 8).toByte
              out(o + 1) = (colorMap((1 << bps) + idx) >> 8).toByte
              out(o + 2) = (colorMap(2 * (1 << bps) + idx) >> 8).toByte
            case _ =>
              var v = bps match {
                case 1 => ((raw(rowBase + (x >> 3)) >> (7 - (x & 7))) & 1) * 255
                case 4 =>
                  val nib = (raw(rowBase + (x >> 1)) >> (4 * (1 - (x & 1)))) & 0x0f
                  nib * 17 // expand to full 8-bit range
                case 8 => raw(rowBase + x) & 0xff
                case _ => // 16-bit: high byte, file byte order
                  if (le) raw(rowBase + 2 * x + 1) & 0xff
                  else raw(rowBase + 2 * x) & 0xff
              }
              if (photometric == 0) v = 255 - v // WhiteIsZero
              out(o) = v.toByte; out(o + 1) = v.toByte; out(o + 2) = v.toByte
          }
          x += 1
        }
        r += 1
      }
      stripRow += rows
      s += 1
    }
    Some(PixelImage(width, height, out))
  }

  // ------------------------------------------------------------ packbits

  private def packBitsDecode(b: Array[Byte], from: Int, until: Int,
      expect: Int): Array[Byte] = {
    val out = new Array[Byte](expect)
    var i = from
    var o = 0
    while (o < expect) {
      if (i >= until) corrupt()
      val nj = b(i)
      i += 1
      if (nj >= 0) { // literal run of n+1
        val len = nj + 1
        if (i + len > until || o + len > expect) corrupt()
        System.arraycopy(b, i, out, o, len)
        i += len; o += len
      } else if (nj != -128) { // repeat next byte 1-n times
        val len = 1 - nj
        if (i >= until || o + len > expect) corrupt()
        java.util.Arrays.fill(out, o, o + len, b(i))
        i += 1; o += len
      } // -128: no-op
    }
    out
  }

  // ----------------------------------------------------------- tiff lzw

  /** TIFF LZW (spec §13): MSB-first code packing, initial width 9,
    * Clear=256 / EOI=257, table entries from 258, and the EARLY code-
    * width change — width grows when the next code to be ASSIGNED is
    * 2^w − 1 (one code earlier than GIF). */
  private[operators] def lzwDecode(b: Array[Byte], from: Int, until: Int,
      expect: Int): Array[Byte] = {
    val out = new Array[Byte](expect)
    var o = 0
    var bitPos = from.toLong * 8
    val bitEnd = until.toLong * 8
    def read(w: Int): Int = {
      if (bitPos + w > bitEnd) corrupt()
      var v = 0
      var k = 0
      while (k < w) {
        v = (v << 1) | ((b((bitPos >> 3).toInt) >> (7 - (bitPos & 7).toInt)) & 1)
        bitPos += 1; k += 1
      }
      v
    }
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4096)
    var next = 258
    var width = 9
    var prev = -1
    while (o < expect) {
      val code = read(width)
      if (code == 257) corrupt() // EOI before the strip filled
      if (code == 256) { // clear
        next = 258; width = 9; prev = -1
      } else {
        if (code > next || (code == next && prev < 0)) corrupt()
        if (prev < 0 && code >= 258) corrupt() // first code must be a root
        // KwKwK (code == next): the string is prev-string + first(prev)
        val expandCode = if (code == next) prev else code
        var sp = 0
        var c = expandCode
        while (c >= 258) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
        if (c >= 256) corrupt() // a chain must bottom out at a root byte
        val first = c.toByte
        stack(sp) = first; sp += 1
        if (o + sp + (if (code == next) 1 else 0) > expect) corrupt()
        while (sp > 0) { sp -= 1; out(o) = stack(sp); o += 1 }
        if (code == next) { out(o) = first; o += 1 }
        if (prev >= 0 && next < 4096) { // encoders Clear before overflow
          prefix(next) = prev; suffix(next) = first; next += 1
        }
        prev = code
        // THE early change (interop-pinned against ImageIO's encoder):
        // the decoder's table lags the encoder's by one entry (the first
        // code after Clear adds none), so while the encoder widens at
        // the natural next == 2^w, the decoder widens at 2^w − 1 — the
        // "one code early" the TIFF spec is famous for
        if (next == 511 && width == 9) width = 10
        else if (next == 1023 && width == 10) width = 11
        else if (next == 2047 && width == 11) width = 12
      }
    }
    out
  }

  // ------------------------------------------------------------- encode

  /** Real TIFF bytes for fixtures + round-trip tests: RGB 8/8/8 chunky,
    * both endians, real strip splits, compression "none" / "packbits" /
    * "lzw" (a true string-table encoder), optional horizontal predictor
    * under LZW. */
  def encodeTiffRgb(width: Int, height: Int, px: (Int, Int) => (Int, Int, Int),
      compression: String = "none", bigEndian: Boolean = false,
      rowsPerStrip: Int = 0, predictor: Boolean = false,
      planar2: Boolean = false): Array[Byte] = {
    val spp = 3
    val raster = Array.tabulate(height, width * 3) { (y, i) =>
      val (r, g, b) = px(i / 3, y)
      (i % 3 match { case 0 => r case 1 => g case _ => b }).toByte
    }
    encodeCore(width, height, spp, 8, 2, raster, compression, bigEndian,
      rowsPerStrip, predictor, null, planar2)
  }

  /** Grayscale 8-bit; photometric 1 (BlackIsZero) or 0 (WhiteIsZero —
    * stored inverted, decoders must re-invert). */
  def encodeTiffGray(width: Int, height: Int, gray: (Int, Int) => Int,
      compression: String = "none", bigEndian: Boolean = false,
      rowsPerStrip: Int = 0, whiteIsZero: Boolean = false): Array[Byte] = {
    val raster = Array.tabulate(height, width) { (y, x) =>
      val v = gray(x, y) & 0xff
      (if (whiteIsZero) 255 - v else v).toByte
    }
    encodeCore(width, height, 1, 8, if (whiteIsZero) 0 else 1, raster,
      compression, bigEndian, rowsPerStrip, predictor = false, null)
  }

  /** 8-bit palette (photometric 3): `palette(i)` = 0xRRGGBB, indices
    * from `idx(x, y)`. */
  def encodeTiffPalette(width: Int, height: Int, palette: Array[Int],
      idx: (Int, Int) => Int, compression: String = "none",
      bigEndian: Boolean = false): Array[Byte] = {
    require(palette.nonEmpty && palette.length <= 256)
    val raster = Array.tabulate(height, width) { (y, x) =>
      val i = idx(x, y)
      require(i >= 0 && i < palette.length)
      i.toByte
    }
    encodeCore(width, height, 1, 8, 3, raster, compression, bigEndian, 0,
      predictor = false, palette)
  }

  private def encodeCore(width: Int, height: Int, spp: Int, bps: Int,
      photometric: Int, raster: Array[Array[Byte]], compression: String,
      bigEndian: Boolean, rowsPerStrip: Int, predictor: Boolean,
      palette: Array[Int], planar2: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0 && width.toLong * height <= MaxPixels)
    require(!planar2 || spp == 3, "planar configuration 2 is the RGB shape")
    val comp = compression match {
      case "none" => 1
      case "lzw" => 5
      case "packbits" => 32773
      case other => throw new IllegalArgumentException(other)
    }
    require(!predictor || comp == 5, "predictor rides LZW")
    val rps = if (rowsPerStrip < 1) height else math.min(rowsPerStrip, height)
    val perPlane = (height + rps - 1) / rps
    // planar 2: the strip list is plane 0's strips, then 1's, then 2's
    val nStrips = if (planar2) 3 * perPlane else perPlane

    def compress(plain: Array[Byte]): Array[Byte] = comp match {
      case 1 => plain
      case 5 => lzwEncode(plain)
      case _ => packBitsEncode(plain)
    }

    val strips =
      if (!planar2) Array.tabulate(perPlane) { s =>
        val rowBytes = width * spp
        val rows = math.min(rps, height - s * rps)
        val plain = new Array[Byte](rows * rowBytes)
        var r = 0
        while (r < rows) {
          System.arraycopy(raster(s * rps + r), 0, plain, r * rowBytes, rowBytes)
          if (predictor) { // horizontal differencing, back to front
            var i = rowBytes - 1
            while (i >= spp) {
              plain(r * rowBytes + i) =
                ((plain(r * rowBytes + i) - plain(r * rowBytes + i - spp)) & 0xff).toByte
              i -= 1
            }
          }
          r += 1
        }
        compress(plain)
      }
      else Array.tabulate(nStrips) { idx =>
        val c = idx / perPlane
        val s = idx % perPlane
        val rows = math.min(rps, height - s * rps)
        val plain = new Array[Byte](rows * width)
        var r = 0
        while (r < rows) {
          var x = 0
          while (x < width) {
            plain(r * width + x) = raster(s * rps + r)(x * spp + c)
            x += 1
          }
          if (predictor) { // per plane the delta stride is ONE sample
            var i = width - 1
            while (i >= 1) {
              plain(r * width + i) =
                ((plain(r * width + i) - plain(r * width + i - 1)) & 0xff).toByte
              i -= 1
            }
          }
          r += 1
        }
        compress(plain)
      }

    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit =
      if (bigEndian) { w8(v >> 8); w8(v) } else { w8(v); w8(v >> 8) }
    def w32(v: Int): Unit =
      if (bigEndian) { w8(v >> 24); w8(v >> 16); w8(v >> 8); w8(v) }
      else { w8(v); w8(v >> 8); w8(v >> 16); w8(v >> 24) }

    w8(if (bigEndian) 'M' else 'I'); w8(if (bigEndian) 'M' else 'I')
    w16(42); w32(8) // IFD right after the header

    // entries: width, length, bits, compression, photometric, strips,
    // spp, rowsPerStrip, counts, planar [, predictor] [, colormap]. (The
    // RGB BitsPerSample ARRAY lives out-of-line but is still ONE entry.)
    val nEntries = 10 + (if (predictor) 1 else 0) + (if (palette != null) 1 else 0)
    // layout after IFD: [bits array if spp=3] [colormap] [strip offsets]
    // [strip counts] [strip data...]
    val ifdSize = 2 + nEntries * 12 + 4
    var cursor = 8 + ifdSize
    val bitsOff = cursor
    if (spp == 3) cursor += 6
    val mapOff = cursor
    if (palette != null) cursor += 2 * 3 * 256
    val offsOff = cursor
    val needOffArrays = nStrips > 1
    if (needOffArrays) cursor += 4 * nStrips
    val cntsOff = cursor
    if (needOffArrays) cursor += 4 * nStrips
    val dataOff = cursor
    val stripOffsets = new Array[Int](nStrips)
    var acc = dataOff
    var s = 0
    while (s < nStrips) {
      stripOffsets(s) = acc
      acc += strips(s).length
      s += 1
    }

    def entry(tag: Int, typ: Int, count: Int, value: Int): Unit = {
      w16(tag); w16(typ); w32(count)
      if (typ == 3 && count == 1) { w16(value); w16(0) } else w32(value)
    }
    w16(nEntries)
    entry(256, 3, 1, width)
    entry(257, 3, 1, height)
    if (spp == 3) entry(258, 3, 3, bitsOff) else entry(258, 3, 1, bps)
    entry(259, 3, 1, comp)
    entry(262, 3, 1, photometric)
    entry(273, 4, nStrips, if (needOffArrays) offsOff else stripOffsets(0))
    entry(277, 3, 1, spp)
    entry(278, 3, 1, rps)
    entry(279, 4, nStrips, if (needOffArrays) cntsOff else strips(0).length)
    entry(284, 3, 1, if (planar2) 2 else 1) // planar configuration
    if (predictor) entry(317, 3, 1, 2)
    if (palette != null) entry(320, 3, 3 * 256, mapOff)
    w32(0) // no next IFD

    if (spp == 3) { w16(8); w16(8); w16(8) }
    if (palette != null) {
      // all reds, greens, blues as 16-bit (v*257 maps 8→16 bit exactly)
      for (c <- 0 until 3; i <- 0 until 256) {
        val v = if (i < palette.length) (palette(i) >> (16 - 8 * c)) & 0xff else 0
        w16(v * 257)
      }
    }
    if (needOffArrays) {
      stripOffsets.foreach(w32)
      strips.foreach(st => w32(st.length))
    }
    strips.foreach(st => out.write(st, 0, st.length))
    out.toByteArray
  }

  private def packBitsEncode(p: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < p.length) {
      // find run length at i
      var run = 1
      while (i + run < p.length && run < 128 && p(i + run) == p(i)) run += 1
      if (run >= 2) {
        out.write(1 - run) // -(run-1)
        out.write(p(i))
        i += run
      } else {
        // literal until next run of ≥3 (or 128 cap)
        var lit = 1
        while (i + lit < p.length && lit < 128 &&
            !(i + lit + 2 < p.length && p(i + lit) == p(i + lit + 1) &&
              p(i + lit) == p(i + lit + 2))) lit += 1
        out.write(lit - 1)
        out.write(p, i, lit)
        i += lit
      }
    }
    out.toByteArray
  }

  /** Real TIFF-LZW encoder: hash-map string table, early width change,
    * Clear when the table fills. */
  private[operators] def lzwEncode(p: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0L
    var nb = 0
    var width = 9
    def put(code: Int): Unit = {
      acc = (acc << width) | code
      nb += width
      while (nb >= 8) { out.write(((acc >> (nb - 8)) & 0xff).toInt); nb -= 8 }
    }
    val table = new java.util.HashMap[Long, Integer]()
    var next = 258
    put(256) // leading Clear (spec requires)
    var prev = -1
    var i = 0
    while (i < p.length) {
      val c = p(i) & 0xff
      if (prev < 0) prev = c
      else {
        val key = prev.toLong << 8 | c
        val hit = table.get(key)
        if (hit != null) prev = hit.intValue()
        else {
          put(prev)
          table.put(key, Integer.valueOf(next))
          next += 1
          // the ENCODER widens at the natural 2^w (the decoder, lagging
          // one entry, is where the early change shows)
          if (next == 512 && width == 9) width = 10
          else if (next == 1024 && width == 10) width = 11
          else if (next == 2048 && width == 11) width = 12
          else if (next == 4094) { // table nearly full: Clear, reset
            put(256); table.clear(); next = 258; width = 9
          }
          prev = c
        }
      }
      i += 1
    }
    if (prev >= 0) put(prev)
    put(257) // EOI
    if (nb > 0) out.write(((acc << (8 - nb)) & 0xff).toInt)
    out.toByteArray
  }

  // ------------------------------------------------ CCITT Group 4 (T.6)
  // The scanned-document compression (round 19). 2D MMR coding only —
  // every line codes against the one above (an imaginary all-white line
  // first), no EOLs, k = ∞ — so the whole machinery is the T.4/T.6 mode
  // codes (V0/VR/VL/P/H) plus the public modified-Huffman run-length
  // tables for horizontal mode. Tables transcribed from ITU-T T.4
  // Tables 2/3 (terminating + make-up, white and black) and the shared
  // extended make-ups; the spec suite cross-checks BOTH directions
  // against javax.imageio's independent CCITT T.6 TIFF codec, so a
  // mis-transcribed code can't survive. Output bit 1 = BLACK (the fax
  // convention; photometric 0 WhiteIsZero re-inverts in the gray path).

  /** (len << 16) | code, indexed by run 0..63. */
  private val WhiteTerm: Array[Int] = {
    val lens = Array(
      8, 6, 4, 4, 4, 4, 4, 4, 5, 5, 5, 5, 6, 6, 6, 6,
      6, 6, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 8, 8, 8,
      8, 8, 8, 8, 8, 8, 8, 8, 8, 8, 8, 8, 8, 8, 8, 8,
      8, 8, 8, 8, 8, 8, 8, 8, 8, 8, 8, 8, 8, 8, 8, 8)
    val codes = Array(
      0x35, 0x07, 0x07, 0x08, 0x0B, 0x0C, 0x0E, 0x0F,
      0x13, 0x14, 0x07, 0x08, 0x08, 0x03, 0x34, 0x35,
      0x2A, 0x2B, 0x27, 0x0C, 0x08, 0x17, 0x03, 0x04,
      0x28, 0x2B, 0x13, 0x24, 0x18, 0x02, 0x03, 0x1A,
      0x1B, 0x12, 0x13, 0x14, 0x15, 0x16, 0x17, 0x28,
      0x29, 0x2A, 0x2B, 0x2C, 0x2D, 0x04, 0x05, 0x0A,
      0x0B, 0x52, 0x53, 0x54, 0x55, 0x24, 0x25, 0x58,
      0x59, 0x5A, 0x5B, 0x4A, 0x4B, 0x32, 0x33, 0x34)
    Array.tabulate(64)(i => (lens(i) << 16) | codes(i))
  }

  /** Make-up codes for runs 64·k, k = 1..27 (64..1728). */
  private val WhiteMakeup: Array[Int] = {
    val lens = Array(5, 5, 6, 7, 8, 8, 8, 8, 8, 8, 9, 9, 9, 9, 9, 9, 9,
      9, 9, 9, 9, 9, 9, 9, 9, 6, 9)
    val codes = Array(0x1B, 0x12, 0x17, 0x37, 0x36, 0x37, 0x64, 0x65,
      0x68, 0x67, 0xCC, 0xCD, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8,
      0xD9, 0xDA, 0xDB, 0x98, 0x99, 0x9A, 0x18, 0x9B)
    Array.tabulate(27)(i => (lens(i) << 16) | codes(i))
  }

  private val BlackTerm: Array[Int] = {
    val lens = Array(
      10, 3, 2, 2, 3, 4, 4, 5, 6, 6, 7, 7, 7, 8, 8, 9,
      10, 10, 10, 11, 11, 11, 11, 11, 11, 11, 12, 12, 12, 12, 12, 12,
      12, 12, 12, 12, 12, 12, 12, 12, 12, 12, 12, 12, 12, 12, 12, 12,
      12, 12, 12, 12, 12, 12, 12, 12, 12, 12, 12, 12, 12, 12, 12, 12)
    val codes = Array(
      0x37, 0x02, 0x03, 0x02, 0x03, 0x03, 0x02, 0x03,
      0x05, 0x04, 0x04, 0x05, 0x07, 0x04, 0x07, 0x18,
      0x17, 0x18, 0x08, 0x67, 0x68, 0x6C, 0x37, 0x28,
      0x17, 0x18, 0xCA, 0xCB, 0xCC, 0xCD, 0x68, 0x69,
      0x6A, 0x6B, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7,
      0x6C, 0x6D, 0xDA, 0xDB, 0x54, 0x55, 0x56, 0x57,
      0x64, 0x65, 0x52, 0x53, 0x24, 0x37, 0x38, 0x27,
      0x28, 0x58, 0x59, 0x2B, 0x2C, 0x5A, 0x66, 0x67)
    Array.tabulate(64)(i => (lens(i) << 16) | codes(i))
  }

  private val BlackMakeup: Array[Int] = {
    val lens = Array(10, 12, 12, 12, 12, 12, 12, 13, 13, 13, 13, 13, 13,
      13, 13, 13, 13, 13, 13, 13, 13, 13, 13, 13, 13, 13, 13)
    val codes = Array(0x0F, 0xC8, 0xC9, 0x5B, 0x33, 0x34, 0x35, 0x6C,
      0x6D, 0x4A, 0x4B, 0x4C, 0x4D, 0x72, 0x73, 0x74, 0x75, 0x76, 0x77,
      0x52, 0x53, 0x54, 0x55, 0x5A, 0x5B, 0x64, 0x65)
    Array.tabulate(27)(i => (lens(i) << 16) | codes(i))
  }

  /** Extended make-ups 1792..2560 (shared by both colours). */
  private val SharedMakeup: Array[Int] = {
    val lens = Array(11, 11, 11, 12, 12, 12, 12, 12, 12, 12, 12, 12, 12)
    val codes = Array(0x08, 0x0C, 0x0D, 0x12, 0x13, 0x14, 0x15, 0x16,
      0x17, 0x1C, 0x1D, 0x1E, 0x1F)
    Array.tabulate(13)(i => (lens(i) << 16) | codes(i))
  }

  /** (len<<16|code) → run, per colour. */
  private def buildRunDecode(term: Array[Int], makeup: Array[Int])
      : java.util.HashMap[Integer, Integer] = {
    val m = new java.util.HashMap[Integer, Integer]()
    var i = 0
    while (i < term.length) { m.put(term(i), i); i += 1 }
    i = 0
    while (i < makeup.length) { m.put(makeup(i), 64 * (i + 1)); i += 1 }
    i = 0
    while (i < SharedMakeup.length) {
      m.put(SharedMakeup(i), 1792 + 64 * i); i += 1
    }
    m
  }
  private val WhiteRunDecode = buildRunDecode(WhiteTerm, WhiteMakeup)
  private val BlackRunDecode = buildRunDecode(BlackTerm, BlackMakeup)

  private final class BitRd(b: Array[Byte], var pos: Int, end: Int) {
    private var bit = 0
    def read(): Int = {
      if (pos >= end) corrupt()
      val v = (b(pos) >> (7 - bit)) & 1
      bit += 1
      if (bit == 8) { bit = 0; pos += 1 }
      v
    }
    /** Skip to the next byte boundary (compression-2 row starts). */
    def align(): Unit = if (bit != 0) { bit = 0; pos += 1 }
    def mark: Long = (pos.toLong << 3) | bit
    def reset(m: Long): Unit = { pos = (m >> 3).toInt; bit = (m & 7).toInt }
  }

  private def readRun(rd: BitRd, white: Boolean): Int = {
    val table = if (white) WhiteRunDecode else BlackRunDecode
    var total = 0
    var go = true
    while (go) {
      var code = 0
      var len = 0
      var run = -1
      while (run < 0) {
        code = (code << 1) | rd.read()
        len += 1
        if (len > 13) corrupt()
        val hit = table.get(Integer.valueOf((len << 16) | code))
        if (hit != null) run = hit.intValue()
      }
      total += run
      if (run < 64) go = false // make-ups chain; a terminating code ends
      if (total > (1 << 24)) corrupt()
    }
    total
  }

  private val ModeEofb = 100

  /** Mode code: 0 = V0, ±1..±3 = VR/VL, 4 = H, 5 = P, ModeEofb. */
  private def readMode(rd: BitRd): Int = {
    if (rd.read() == 1) return 0 // 1       V0
    if (rd.read() == 1) return if (rd.read() == 1) 1 else -1 // 011/010
    if (rd.read() == 1) return 4 // 001     H
    if (rd.read() == 1) return 5 // 0001    P
    if (rd.read() == 1) // 00001x
      return if (rd.read() == 1) 2 else -2 // 000011/000010
    if (rd.read() == 1) // 000001x
      return if (rd.read() == 1) 3 else -3 // 0000011/0000010
    ModeEofb // 0000000…: EOFB / extension territory — end of strip
  }

  /** T.6 decode of one strip: `rows` lines of `width` pixels → packed
    * 1-bit rows, bit 1 = black. Null on any malformed stream. */
  /** One 2D-coded line against `ref` (shared by T.6 and T.4 2D rows):
    * returns the line's changing elements. */
  private def decode2dRow(rd: BitRd, ref: Array[Int],
      width: Int): Array[Int] = {
    val cur = new Array[Int](width + 2)
    var curLen = 0
    var a0 = -1
    var white = true
    var guard = 0
    while (a0 < width) {
      guard += 1
      if (guard > 2 * width + 8) corrupt()
      // b1: first reference change > a0 of opposite colour to a0's
      // (even indices are white→black transitions — rows start white)
      var i = if (white) 0 else 1
      while (i < ref.length && ref(i) <= a0) i += 2
      val b1 = if (i < ref.length) ref(i) else width
      val b2 = if (i + 1 < ref.length) ref(i + 1) else width
      readMode(rd) match {
        case 5 => // pass: skip both reference changes
          if (b2 <= a0) corrupt()
          a0 = b2
        case 4 => // horizontal: two MH runs, colour preserved
          val a0p = math.max(a0, 0)
          val r1 = readRun(rd, white)
          val r2 = readRun(rd, !white)
          val a1 = a0p + r1
          val a2 = a1 + r2
          if (a2 > width || a1 < a0p) corrupt()
          cur(curLen) = a1; cur(curLen + 1) = a2; curLen += 2
          a0 = a2
        case ModeEofb => corrupt() // mid-image EOL/EOFB: truncated line
        case v => // vertical: a1 = b1 + v, colour flips
          val a1 = b1 + v
          if (a1 < 0 || a1 > width || a1 <= a0) corrupt()
          cur(curLen) = a1; curLen += 1
          a0 = a1
          white = !white
      }
    }
    java.util.Arrays.copyOf(cur, curLen)
  }

  /** One 1D modified-Huffman line (T.4 §4.1): alternating white/black
    * runs from an initial white run (possibly zero-length), summing
    * exactly to `width`; returns the changing elements. */
  private def decodeMhRow(rd: BitRd, width: Int): Array[Int] = {
    val cur = new Array[Int](width + 2)
    var curLen = 0
    var pos = 0
    var white = true
    var guard = 0
    while (pos < width) {
      guard += 1
      if (guard > 2 * width + 8) corrupt() // zero-run flood
      pos += readRun(rd, white)
      if (pos > width) corrupt()
      if (pos < width) { cur(curLen) = pos; curLen += 1 }
      white = !white
    }
    java.util.Arrays.copyOf(cur, curLen)
  }

  /** Paint [cur(2k), cur(2k+1)) black into packed row `r`. */
  private def paintRow(out: Array[Byte], r: Int, rowBytes: Int,
      cur: Array[Int], width: Int): Unit = {
    var k = 0
    while (k < cur.length) {
      val start = cur(k)
      val end = if (k + 1 < cur.length) cur(k + 1) else width
      var x = start
      while (x < end) {
        out(r * rowBytes + (x >> 3)) =
          (out(r * rowBytes + (x >> 3)) | (0x80 >> (x & 7))).toByte
        x += 1
      }
      k += 2
    }
  }

  private[operators] def g4Decode(b: Array[Byte], from: Int, until: Int,
      width: Int, rows: Int): Array[Byte] = {
    if (from < 0 || until > b.length || from >= until) return null
    val rowBytes = (width + 7) / 8
    val out = new Array[Byte](rowBytes * rows)
    val rd = new BitRd(b, from, until)
    try {
      var ref = new Array[Int](0) // imaginary all-white line above
      var r = 0
      while (r < rows) {
        val cur = decode2dRow(rd, ref, width)
        paintRow(out, r, rowBytes, cur, width)
        ref = cur
        r += 1
      }
      out
    } catch { case _: Corrupt => null }
  }

  /** CCITT "Modified Huffman" (TIFF compression 2, a.k.a. CCITT RLE):
    * each line coded 1-D, each line starting on a BYTE boundary. */
  private[operators] def mhDecode(b: Array[Byte], from: Int, until: Int,
      width: Int, rows: Int): Array[Byte] = {
    if (from < 0 || until > b.length || from >= until) return null
    val rowBytes = (width + 7) / 8
    val out = new Array[Byte](rowBytes * rows)
    val rd = new BitRd(b, from, until)
    try {
      var r = 0
      while (r < rows) {
        rd.align()
        paintRow(out, r, rowBytes, decodeMhRow(rd, width), width)
        r += 1
      }
      out
    } catch { case _: Corrupt => null }
  }

  /** Consume an EOL (≥11 zeros then a 1) if one sits at the current
    * position, tolerating fill bits; -1 = none, else the post-EOL mode
    * bit for 2D streams (1 = next line 1D, 0 = 2D) or 1 for 1D. */
  private def tryEol(rd: BitRd, twoD: Boolean): Int = {
    val m = rd.mark
    try {
      var zeros = 0
      var bit = rd.read()
      while (bit == 0) { zeros += 1; bit = rd.read() }
      if (zeros < 11) { rd.reset(m); -1 }
      else if (twoD) rd.read()
      else 1
    } catch { case _: Corrupt => rd.reset(m); -1 }
  }

  /** CCITT Group 3 / T.4 (TIFF compression 3): EOL-separated lines;
    * plain 1D, or — when `twoD` (T4Options bit 0) — each EOL carries a
    * mode bit selecting 1D or 2D coding for the next line. Leading EOL
    * optional, fill bits tolerated (the EOL scan eats them). */
  private[operators] def g3Decode(b: Array[Byte], from: Int, until: Int,
      width: Int, rows: Int, twoD: Boolean): Array[Byte] = {
    if (from < 0 || until > b.length || from >= until) return null
    val rowBytes = (width + 7) / 8
    val out = new Array[Byte](rowBytes * rows)
    val rd = new BitRd(b, from, until)
    try {
      var ref = new Array[Int](0)
      var r = 0
      while (r < rows) {
        val mode = tryEol(rd, twoD)
        val oneD = if (mode >= 0) mode == 1
                   else !twoD || r == 0 // no EOL: 1D unless mid-2D-stream
        if (mode < 0 && twoD && r > 0) corrupt() // 2D lines need their EOL
        val cur = if (oneD) decodeMhRow(rd, width)
                  else decode2dRow(rd, ref, width)
        paintRow(out, r, rowBytes, cur, width)
        ref = cur
        r += 1
      }
      out
    } catch { case _: Corrupt => null }
  }

  private final class BitWr {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var nb = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        nb += 1
        if (nb == 8) { out.write(acc & 0xff); acc = 0; nb = 0 }
        i -= 1
      }
    }
    def bytes(): Array[Byte] = {
      if (nb > 0) { out.write((acc << (8 - nb)) & 0xff); acc = 0; nb = 0 }
      out.toByteArray
    }
    /** Pad to the next byte boundary (compression-2 row starts). */
    def align(): Unit =
      if (nb > 0) { out.write((acc << (8 - nb)) & 0xff); acc = 0; nb = 0 }
  }

  private def writeRun(w: BitWr, runIn: Int, white: Boolean): Unit = {
    var run = runIn
    val term = if (white) WhiteTerm else BlackTerm
    val makeup = if (white) WhiteMakeup else BlackMakeup
    while (run >= 2624) { // repeated max make-up for very long runs
      val c = SharedMakeup(12) // 2560
      w.put(c & 0xffff, c >> 16)
      run -= 2560
    }
    if (run >= 1792) {
      val c = SharedMakeup((run - 1792) / 64)
      w.put(c & 0xffff, c >> 16)
      run -= 64 * ((run - 1792) / 64) + 1792
    } else if (run >= 64) {
      val c = makeup(run / 64 - 1)
      w.put(c & 0xffff, c >> 16)
      run -= 64 * (run / 64)
    }
    val c = term(run)
    w.put(c & 0xffff, c >> 16)
  }

  /** T.6 encode of one strip of boolean rows (true = black). */
  /** Changing elements of one boolean row. */
  private def rowChanges(row: Array[Boolean], width: Int): Array[Int] = {
    val cur = new Array[Int](width + 2)
    var curLen = 0
    var x = 0
    var prev = false
    while (x < width) {
      if (row(x) != prev) { cur(curLen) = x; curLen += 1; prev = row(x) }
      x += 1
    }
    java.util.Arrays.copyOf(cur, curLen)
  }

  /** Emit one 2D-coded line (T.6 / T.4 2D) against `ref`. */
  private def encode2dRow(w: BitWr, ref: Array[Int], cur: Array[Int],
      width: Int): Unit = {
    var a0 = -1
    var white = true
    var ai = 0 // index of first cur change > a0
    while (a0 < width) {
      while (ai < cur.length && cur(ai) <= a0) ai += 1
      val a1 = if (ai < cur.length) cur(ai) else width
      val a2 = if (ai + 1 < cur.length) cur(ai + 1) else width
      var i = if (white) 0 else 1
      while (i < ref.length && ref(i) <= a0) i += 2
      val b1 = if (i < ref.length) ref(i) else width
      val b2 = if (i + 1 < ref.length) ref(i + 1) else width
      if (b2 < a1) { // pass
        w.put(1, 4) // 0001
        a0 = b2
      } else if (math.abs(a1 - b1) <= 3) { // vertical
        a1 - b1 match {
          case 0 => w.put(1, 1)
          case 1 => w.put(3, 3) // 011
          case 2 => w.put(3, 6) // 000011
          case 3 => w.put(3, 7) // 0000011
          case -1 => w.put(2, 3) // 010
          case -2 => w.put(2, 6) // 000010
          case _ => w.put(2, 7) // 0000010
        }
        a0 = a1
        white = !white
      } else { // horizontal
        w.put(1, 3) // 001
        val a0p = math.max(a0, 0)
        writeRun(w, a1 - a0p, white)
        writeRun(w, a2 - a1, !white)
        a0 = a2
      }
    }
  }

  /** Emit one 1D modified-Huffman line from its changing elements. */
  private def encodeMhRow(w: BitWr, cur: Array[Int], width: Int): Unit = {
    var pos = 0
    var white = true
    var k = 0
    while (pos < width) {
      val next = if (k < cur.length) cur(k) else width
      writeRun(w, next - pos, white)
      pos = next
      white = !white
      k += 1
    }
  }

  private[operators] def g4Encode(rows: Array[Array[Boolean]],
      width: Int): Array[Byte] = {
    val w = new BitWr
    var ref = new Array[Int](0)
    rows.foreach { row =>
      val cur = rowChanges(row, width)
      encode2dRow(w, ref, cur, width)
      ref = cur
    }
    // EOFB: two T.4 EOLs (000000000001 twice)
    w.put(1, 12); w.put(1, 12)
    w.bytes()
  }

  /** Compression-2 (Modified Huffman) strip: 1D lines, byte-aligned. */
  private[operators] def mhEncode(rows: Array[Array[Boolean]],
      width: Int): Array[Byte] = {
    val w = new BitWr
    rows.foreach { row =>
      w.align()
      encodeMhRow(w, rowChanges(row, width), width)
    }
    w.bytes()
  }

  /** Compression-3 (T.4) strip: EOL before every line; in 2D mode the
    * EOL carries the mode bit and rows alternate 1D / 2D (k = 2 — every
    * other line re-anchors, the standard error-confinement choice). */
  private[operators] def g3Encode(rows: Array[Array[Boolean]],
      width: Int, twoD: Boolean): Array[Byte] = {
    val w = new BitWr
    var ref = new Array[Int](0)
    var r = 0
    while (r < rows.length) {
      val cur = rowChanges(rows(r), width)
      val oneD = !twoD || r % 2 == 0
      w.put(1, 12) // EOL
      if (twoD) w.put(if (oneD) 1 else 0, 1)
      if (oneD) encodeMhRow(w, cur, width)
      else encode2dRow(w, ref, cur, width)
      ref = cur
      r += 1
    }
    w.bytes()
  }

  /** Bilevel TIFF, CCITT Group 4 (compression 4), photometric 0
    * (WhiteIsZero — the fax convention: `black(x, y)` = true encodes a
    * black pixel). Strips code independently, per the TIFF contract. */
  def encodeTiffG4(width: Int, height: Int, black: (Int, Int) => Boolean,
      bigEndian: Boolean = false, rowsPerStrip: Int = 0): Array[Byte] =
    encodeTiffFax(width, height, black, 4, twoD = false, bigEndian,
      rowsPerStrip)

  /** Bilevel TIFF, CCITT Modified Huffman (compression 2, "CCITT RLE"):
    * 1D lines, byte-aligned rows. */
  def encodeTiffMh(width: Int, height: Int, black: (Int, Int) => Boolean,
      bigEndian: Boolean = false, rowsPerStrip: Int = 0): Array[Byte] =
    encodeTiffFax(width, height, black, 2, twoD = false, bigEndian,
      rowsPerStrip)

  /** Bilevel TIFF, CCITT Group 3 / T.4 (compression 3): EOL-separated
    * 1D lines, or alternating 1D/2D when `twoD` (T4Options bit 0). */
  def encodeTiffG3(width: Int, height: Int, black: (Int, Int) => Boolean,
      twoD: Boolean = false, bigEndian: Boolean = false,
      rowsPerStrip: Int = 0): Array[Byte] =
    encodeTiffFax(width, height, black, 3, twoD, bigEndian, rowsPerStrip)

  /** Split a complete T.81 stream into (JPEGTables blob, abbreviated
    * stream): DQT/DHT segments move into `SOI <tables> EOI`, everything
    * else (APP0, SOF, the SOS-to-EOI entropy tail) stays. */
  private def splitJpegTables(s: Array[Byte]): (Array[Byte], Array[Byte]) = {
    val tables = new java.io.ByteArrayOutputStream()
    val rest = new java.io.ByteArrayOutputStream()
    tables.write(0xff); tables.write(0xd8)
    rest.write(0xff); rest.write(0xd8)
    var i = 2
    var go = true
    while (go) {
      require(i + 4 <= s.length && (s(i) & 0xff) == 0xff, "marker walk")
      val m = s(i + 1) & 0xff
      if (m == 0xda) { // SOS: the rest is entropy data + EOI, verbatim
        rest.write(s, i, s.length - i)
        go = false
      } else {
        val tot = 2 + (((s(i + 2) & 0xff) << 8) | (s(i + 3) & 0xff))
        if (m == 0xdb || m == 0xc4) tables.write(s, i, tot)
        else rest.write(s, i, tot)
        i += tot
      }
    }
    tables.write(0xff); tables.write(0xd9)
    (tables.toByteArray, rest.toByteArray)
  }

  /** Grayscale new-style JPEG-in-TIFF (compression 7): per-strip T.81
    * baseline streams — complete, or abbreviated with the shared
    * DQT/DHT in the JPEGTables tag when `tablesTag`. Content constant
    * per 8×8 block round-trips bit-exactly (DC-only, all-ones quant —
    * the q47 JPEG-slot discipline). */
  def encodeTiffJpegGray(width: Int, height: Int, gray: (Int, Int) => Int,
      rowsPerStrip: Int = 0, tablesTag: Boolean = false,
      bigEndian: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0 && width.toLong * height <= MaxPixels)
    val rps = if (rowsPerStrip < 1) height else math.min(rowsPerStrip, height)
    val nStrips = (height + rps - 1) / rps
    val full = Array.tabulate(nStrips) { s =>
      val rows = math.min(rps, height - s * rps)
      JpegCodec.encodeJpeg(width, rows, (x, y) => {
        val v = gray(x, s * rps + y)
        (v, v, v)
      }, gray = true)
    }
    val (tablesBlob, strips) =
      if (!tablesTag) (null, full)
      else {
        val split = full.map(splitJpegTables)
        (split(0)._1, split.map(_._2))
      }

    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit =
      if (bigEndian) { w8(v >> 8); w8(v) } else { w8(v); w8(v >> 8) }
    def w32(v: Int): Unit =
      if (bigEndian) { w8(v >> 24); w8(v >> 16); w8(v >> 8); w8(v) }
      else { w8(v); w8(v >> 8); w8(v >> 16); w8(v >> 24) }
    w8(if (bigEndian) 'M' else 'I'); w8(if (bigEndian) 'M' else 'I')
    w16(42); w32(8)
    val nEntries = if (tablesTag) 11 else 10
    val ifdSize = 2 + nEntries * 12 + 4
    var cursor = 8 + ifdSize
    val needArrays = nStrips > 1
    val offsOff = cursor
    if (needArrays) cursor += 4 * nStrips
    val cntsOff = cursor
    if (needArrays) cursor += 4 * nStrips
    val tablesOff = cursor
    if (tablesTag) cursor += tablesBlob.length
    val stripOffsets = new Array[Int](nStrips)
    var acc = cursor
    var s = 0
    while (s < nStrips) { stripOffsets(s) = acc; acc += strips(s).length; s += 1 }
    def entry(tag: Int, typ: Int, count: Int, value: Int): Unit = {
      w16(tag); w16(typ); w32(count)
      if (typ == 3 && count == 1) { w16(value); w16(0) } else w32(value)
    }
    w16(nEntries)
    entry(256, 3, 1, width)
    entry(257, 3, 1, height)
    entry(258, 3, 1, 8)
    entry(259, 3, 1, 7) // new-style JPEG
    entry(262, 3, 1, 1) // BlackIsZero grayscale
    entry(273, 4, nStrips, if (needArrays) offsOff else stripOffsets(0))
    entry(277, 3, 1, 1)
    entry(278, 3, 1, rps)
    entry(279, 4, nStrips, if (needArrays) cntsOff else strips(0).length)
    entry(284, 3, 1, 1)
    if (tablesTag) entry(347, 7, tablesBlob.length, tablesOff)
    w32(0)
    if (needArrays) {
      stripOffsets.foreach(w32)
      strips.foreach(st => w32(st.length))
    }
    if (tablesTag) out.write(tablesBlob, 0, tablesBlob.length)
    strips.foreach(st => out.write(st, 0, st.length))
    out.toByteArray
  }

  private def encodeTiffFax(width: Int, height: Int,
      black: (Int, Int) => Boolean, comp: Int, twoD: Boolean,
      bigEndian: Boolean, rowsPerStrip: Int): Array[Byte] = {
    require(width > 0 && height > 0 && width.toLong * height <= MaxPixels)
    val rps = if (rowsPerStrip < 1) height else math.min(rowsPerStrip, height)
    val nStrips = (height + rps - 1) / rps
    val strips = Array.tabulate(nStrips) { s =>
      val rows = math.min(rps, height - s * rps)
      val bools = Array.tabulate(rows, width)((r, x) => black(x, s * rps + r))
      comp match {
        case 2 => mhEncode(bools, width)
        case 3 => g3Encode(bools, width, twoD)
        case _ => g4Encode(bools, width)
      }
    }

    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit =
      if (bigEndian) { w8(v >> 8); w8(v) } else { w8(v); w8(v >> 8) }
    def w32(v: Int): Unit =
      if (bigEndian) { w8(v >> 24); w8(v >> 16); w8(v >> 8); w8(v) }
      else { w8(v); w8(v >> 8); w8(v >> 16); w8(v >> 24) }
    w8(if (bigEndian) 'M' else 'I'); w8(if (bigEndian) 'M' else 'I')
    w16(42); w32(8)
    // compression 2 carries no options tag; 3 carries T4Options, 4
    // carries T6Options
    val nEntries = if (comp == 2) 10 else 11
    val ifdSize = 2 + nEntries * 12 + 4
    var cursor = 8 + ifdSize
    val needArrays = nStrips > 1
    val offsOff = cursor
    if (needArrays) cursor += 4 * nStrips
    val cntsOff = cursor
    if (needArrays) cursor += 4 * nStrips
    val stripOffsets = new Array[Int](nStrips)
    var acc = cursor
    var s = 0
    while (s < nStrips) { stripOffsets(s) = acc; acc += strips(s).length; s += 1 }
    def entry(tag: Int, typ: Int, count: Int, value: Int): Unit = {
      w16(tag); w16(typ); w32(count)
      if (typ == 3 && count == 1) { w16(value); w16(0) } else w32(value)
    }
    w16(nEntries)
    entry(256, 3, 1, width)
    entry(257, 3, 1, height)
    entry(258, 3, 1, 1)
    entry(259, 3, 1, comp) // 2 MH / 3 T.4 / 4 T.6
    entry(262, 3, 1, 0) // WhiteIsZero
    entry(273, 4, nStrips, if (needArrays) offsOff else stripOffsets(0))
    entry(277, 3, 1, 1)
    entry(278, 3, 1, rps)
    entry(279, 4, nStrips, if (needArrays) cntsOff else strips(0).length)
    entry(284, 3, 1, 1)
    if (comp == 3) entry(292, 4, 1, if (twoD) 1 else 0) // T4Options
    else if (comp == 4) entry(293, 4, 1, 0) // T6Options: no extensions
    w32(0)
    if (needArrays) {
      stripOffsets.foreach(w32)
      strips.foreach(st => w32(st.length))
    }
    strips.foreach(st => out.write(st, 0, st.length))
    out.toByteArray
  }
}
