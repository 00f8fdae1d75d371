package graft.operators

/** Zero-dependency pixel decode for the formats whose pixel layer is
  * pure byte/bit arithmetic + DEFLATE — no codec library required:
  *
  *  - BMP: uncompressed 24bpp BI_RGB (BITMAPINFOHEADER or later), both
  *    bottom-up (positive biHeight) and top-down (negative) row orders,
  *    4-byte-aligned row stride, BGR byte order (MS BMP spec); plus
  *    8bpp paletted — uncompressed AND BI_RLE8 run-length (round 16:
  *    encoded runs, absolute mode, end-of-line/bitmap, cursor deltas —
  *    the same engine the AVI `MRLE` video codec rides).
  *  - PNG: all five color types — grayscale (1/2/4/8/16-bit), truecolor
  *    (8/16), palette (1/2/4/8, PLTE), gray+alpha and RGBA (8/16) — in
  *    both non-interlaced and Adam7-interlaced layouts. IDAT chunks are
  *    concatenated, inflated with `java.util.zip.Inflater` (zlib
  *    stream, exactly what the PNG spec mandates), and every row
  *    filter — None/Sub/Up/Average/Paeth (PNG spec §9) — is
  *    reconstructed per pass. Alpha is dropped on output; 16-bit
  *    samples downscale to their high byte.
  *  - GIF: 87a/89a, global/local color tables, extension blocks skipped,
  *    full-frame images (animation frames/tiles out of scope), LZW pixel
  *    stream decoded from scratch (variable 3..12-bit codes, LSB-first,
  *    clear/end, KwKwK case, 4096-entry dictionary), interlace
  *    de-woven. Palette lookup is exact, so GIF features are exact.
  *
  * JPEG (baseline AND progressive) and lossless WebP decode for real
  * too — the T.81 DCT+Huffman codec is implemented from scratch in
  * [[JpegCodec]] and the VP8L prefix-code/transform layer in
  * [[WebpCodec]] (this object dispatches to both). Only genuinely
  * codec-bound payloads (lossy-VP8 WebP) fall back to
  * [[Multimodal.StubCodec]], labeled per-row via `decoder`.
  *
  * Anything malformed decodes to None, never an exception — corrupt media
  * in a 100 TB crawl is data, not an error.
  *
  * The encoders exist for fixtures and round-trip tests: they write REAL
  * pixel payloads (PNG gets correct CRC32s and a genuine zlib stream, so
  * the fixture files are valid images), which is what makes the decoder
  * tests meaningful.
  *
  * Reference capability: multimodal feature extraction over binary
  * columns (BASELINE.md north star; the reference carries media through
  * Snowflake stages as opaque binary + metadata).
  */
object PixelCodec {

  /** Decoded image: RGB interleaved, row-major, top-down, 3 bytes/px. */
  final case class PixelImage(width: Int, height: Int, rgb: Array[Byte])

  /** Exact + summary features off real pixels. Sums are exact longs
    * (oracle-checkable bit-for-bit); means derive from them; the luma
    * histogram buckets ITU-R BT.601 luma into `bins` equal ranges. */
  final case class PixelFeatures(width: Int, height: Int,
      sumR: Long, sumG: Long, sumB: Long, lumaHist: Array[Long])

  /** Max pixels we will allocate for (guards a hostile header claiming
    * 65535×65535 against a 100-byte payload before any allocation). */
  private val MaxPixels = 1 << 26 // 64 Mpx ≈ 192 MB RGB

  // ------------------------------------------------------------- decode

  def decode(b: Array[Byte]): Option[PixelImage] = {
    if (b == null || b.length < 13) None
    else if (b(0) == 'B' && b(1) == 'M') decodeBmp(b)
    else if ((b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G')
      decodePng(b)
    else if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
        (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      decodeGif(b)
    else if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8)
      JpegCodec.decode(b)
    else if (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b.length > 11 && b(8) == 'W' && b(9) == 'E' && b(10) == 'B' && b(11) == 'P')
      WebpCodec.decode(b) // VP8L lossless decodes; VP8 lossy → None (stub)
    else if ((b(0) == 'I' && b(1) == 'I' && b(2) == 42 && b(3) == 0) ||
        (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && b(3) == 42))
      TiffCodec.decode(b) // round 18: baseline TIFF (none/PackBits/LZW)
    else if (b(0) == 'P' && b(1) >= '1' && b(1) <= '6')
      decodePnm(b) // round 18: netpbm P1–P6
    else None
  }

  /** Netpbm P1–P6 (round 18): the classic ML-dataset interchange
    * formats. ASCII (P1 bitmap / P2 graymap / P3 pixmap) and binary
    * (P4/P5/P6) variants; `#` comments anywhere in the header; maxval
    * up to 65535 (two-byte big-endian samples, scaled to 8 bits by
    * round(v·255/maxval) — identity at maxval 255); PBM semantics
    * honored (1 = black). Anything malformed → None. */
  private def decodePnm(b: Array[Byte]): Option[PixelImage] = {
    try {
      val kind = b(1) - '0'
      var i = 2
      def token(): Long = { // next decimal token, skipping space + comments
        var v = -1L
        var done = false
        while (!done) {
          if (i >= b.length) { done = true }
          else {
            val c = b(i) & 0xff
            if (c == '#' && v < 0) { // comment to end of line
              while (i < b.length && b(i) != '\n') i += 1
            } else if (c >= '0' && c <= '9') {
              v = (if (v < 0) 0 else v) * 10 + (c - '0')
              if (v > 0xffffffffL) return -1L
              i += 1
            } else if (c == ' ' || c == '\t' || c == '\r' || c == '\n') {
              if (v >= 0) done = true else i += 1
            } else return -1L
          }
        }
        v
      }
      val w = token().toInt
      val h = token().toInt
      if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) return None
      val maxval =
        if (kind == 1 || kind == 4) 1
        else {
          val m = token().toInt
          if (m < 1 || m > 65535) return None
          m
        }
      // exactly ONE whitespace byte separates header and binary raster
      if (kind >= 4) { if (i >= b.length) return None else i += 1 }
      val out = new Array[Byte](w * h * 3)
      def scale(v: Int): Byte =
        (if (maxval == 255) v
         else ((v * 255 + maxval / 2) / maxval)).toByte
      var k = 0
      kind match {
        case 1 => // ASCII bitmap: 1 = black; digits may run together
          while (k < w * h) {
            while (i < b.length && (b(i) != '0' && b(i) != '1')) {
              if (b(i) == '#') { while (i < b.length && b(i) != '\n') i += 1 }
              else i += 1
            }
            if (i >= b.length) return None
            val v: Byte = if (b(i) == '1') 0 else -1 // black / white(255)
            out(k * 3) = v; out(k * 3 + 1) = v; out(k * 3 + 2) = v
            i += 1; k += 1
          }
        case 2 | 3 =>
          val per = if (kind == 2) 1 else 3
          while (k < w * h * per) {
            val v = token()
            if (v < 0 || v > maxval) return None
            val s = scale(v.toInt)
            if (per == 1) {
              out(k * 3) = s; out(k * 3 + 1) = s; out(k * 3 + 2) = s
            } else out(k) = s
            k += 1
          }
        case 4 => // packed bitmap, rows byte-aligned, MSB first, 1 = black
          val rowBytes = (w + 7) / 8
          if (i + rowBytes.toLong * h > b.length) return None
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val bit = (b(i + y * rowBytes + (x >> 3)) >> (7 - (x & 7))) & 1
              val v: Byte = if (bit == 1) 0 else -1
              val o = (y * w + x) * 3
              out(o) = v; out(o + 1) = v; out(o + 2) = v
              x += 1
            }
            y += 1
          }
        case _ => // P5 / P6 binary
          val per = if (kind == 5) 1 else 3
          val bytesPer = if (maxval > 255) 2 else 1
          if (i + w.toLong * h * per * bytesPer > b.length) return None
          while (k < w * h * per) {
            val v =
              if (bytesPer == 1) b(i) & 0xff
              else ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
            if (v > maxval) return None
            val s = scale(v)
            if (per == 1) {
              out(k * 3) = s; out(k * 3 + 1) = s; out(k * 3 + 2) = s
            } else out(k) = s
            i += bytesPer; k += 1
          }
      }
      Some(PixelImage(w, h, out))
    } catch {
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }
  }

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  /** 24bpp BI_RGB, 8bpp paletted BI_RGB, and 8bpp BI_RLE8 run-length
    * (round 16 — the compressed BMP coding, shared with the AVI `MRLE`
    * video codec); other depths/compressions → None (stub path). */
  private def decodeBmp(b: Array[Byte]): Option[PixelImage] = {
    if (b.length < 54) return None
    val pixelOff = le32(b, 10)
    val dibSize = le32(b, 14)
    if (dibSize < 40) return None
    val w = le32(b, 18)
    val hRaw = le32(b, 22)
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    val planes = le16(b, 26)
    val bpp = le16(b, 28)
    val compression = le32(b, 30)
    if (w <= 0 || h <= 0 || hRaw == Int.MinValue || planes != 1) return None
    if (w.toLong * h > MaxPixels) return None
    if (bpp == 8 && (compression == 0 || compression == 1)) {
      if (compression == 1 && topDown) return None // RLE is bottom-up only
      // palette: biClrUsed RGBQUADs (0 → 256) right after the DIB header
      val clrUsed0 = le32(b, 46)
      val nColors = if (clrUsed0 == 0) 256 else clrUsed0
      if (nColors < 1 || nColors > 256) return None
      // Long arithmetic: a hostile biSize near Int.MaxValue must fail
      // the bounds check, not wrap negative and pass it
      if (14L + dibSize + 4L * nColors > b.length) return None
      val palOff = 14 + dibSize
      val idx = new Array[Byte](w * h) // display-space palette indices
      if (compression == 0) {
        val stride = (w + 3) / 4 * 4
        if (pixelOff < 54 ||
            pixelOff.toLong + stride.toLong * h > b.length) return None
        var y = 0
        while (y < h) {
          val srcRow = if (topDown) y else h - 1 - y
          System.arraycopy(b, pixelOff + srcRow * stride, idx, y * w, w)
          y += 1
        }
      } else if (pixelOff < 0 || pixelOff > b.length ||
          !rle8DecodeInto(b, pixelOff, b.length, w, h, idx)) return None
      val out = new Array[Byte](w * h * 3)
      var p = 0
      while (p < w * h) {
        val ci = idx(p) & 0xff
        if (ci >= nColors) return None
        out(p * 3) = b(palOff + ci * 4 + 2) // RGBQUAD is BGRX
        out(p * 3 + 1) = b(palOff + ci * 4 + 1)
        out(p * 3 + 2) = b(palOff + ci * 4)
        p += 1
      }
      return Some(PixelImage(w, h, out))
    }
    if (bpp != 24 || compression != 0) return None
    val stride = ((w * 3 + 3) / 4) * 4
    if (pixelOff < 54 || pixelOff.toLong + stride.toLong * h > b.length) return None
    val out = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val srcRow = if (topDown) y else h - 1 - y
      var x = 0
      var src = pixelOff + srcRow * stride
      var dst = y * w * 3
      while (x < w) {
        out(dst) = b(src + 2) // R (file order is BGR)
        out(dst + 1) = b(src + 1) // G
        out(dst + 2) = b(src) // B
        x += 1; src += 3; dst += 3
      }
      y += 1
    }
    Some(PixelImage(w, h, out))
  }

  /** Microsoft RLE8 run-length decode (the BMP BI_RLE8 / AVI `MRLE`
    * coding) into a display-space (top row first) palette-index raster.
    * The stream works in BMP space — the cursor starts at the BOTTOM
    * row; (n>0, v) paints a run, escape 00 00 ends the line, 00 01 ends
    * the bitmap, 00 02 dx dy moves the cursor right/up, 00 n≥3 copies n
    * literal indices (word-aligned). Pixels the stream never touches
    * keep whatever `idx` already holds — zeros for a standalone BMP,
    * the PREVIOUS frame for an AVI delta frame, which is exactly how
    * MRLE inter-frame compression works. Returns false (→ None
    * upstream) on any cursor/bounds/truncation violation. */
  private[operators] def rle8DecodeInto(b: Array[Byte], off0: Int, end: Int,
      w: Int, h: Int, idx: Array[Byte]): Boolean = {
    var x = 0
    var y = 0 // BMP space: 0 = bottom row
    var i = off0
    while (i + 2 <= end) {
      val n = b(i) & 0xff
      val v = b(i + 1) & 0xff
      i += 2
      if (n > 0) { // encoded run
        if (y >= h || x + n > w) return false
        var k = (h - 1 - y) * w + x
        val stop = k + n
        while (k < stop) { idx(k) = v.toByte; k += 1 }
        x += n
      } else v match {
        case 0 => x = 0; y += 1 // end of line
        case 1 => return true // end of bitmap
        case 2 => // delta: cursor jump, skipped pixels untouched
          if (i + 2 > end) return false
          x += b(i) & 0xff
          y += b(i + 1) & 0xff
          i += 2
          if (x > w || y > h) return false
        case cnt => // absolute mode: cnt literal indices, word-aligned
          if (y >= h || x + cnt > w) return false
          if (i + cnt + (cnt & 1) > end) return false
          var k = 0
          while (k < cnt) {
            idx((h - 1 - y) * w + x + k) = b(i + k)
            k += 1
          }
          i += cnt + (cnt & 1)
          x += cnt
      }
    }
    false // ran off the stream without an end-of-bitmap marker
  }

  /** Adam7 pass origins/steps: (x0, y0, xStep, yStep) per pass. */
  private val Adam7 = Array(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  /** All five color types (gray / RGB / palette / gray+alpha / RGBA),
    * bit depths 1/2/4/8/16 where the spec allows them, Adam7 interlace.
    * 16-bit samples downscale to their high byte (what ImageIO's 8-bit
    * view shows); alpha is dropped; palette indices resolve via PLTE. */
  private def decodePng(b: Array[Byte]): Option[PixelImage] = {
    if (b.length < 33) return None
    // IHDR is mandated first: length 13, type at 12
    if (be32(b, 8) != 13 || b(12) != 'I' || b(13) != 'H' ||
        b(14) != 'D' || b(15) != 'R') return None
    val w = be32(b, 16)
    val h = be32(b, 20)
    val depth = b(24) & 0xff
    val colorType = b(25) & 0xff
    val interlace = b(28) & 0xff
    if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) return None
    if (interlace > 1) return None
    val channels = colorType match {
      case 0 => 1 // grayscale
      case 2 => 3 // truecolor
      case 3 => 1 // palette indices
      case 4 => 2 // gray + alpha
      case 6 => 4 // RGBA
      case _ => return None
    }
    val depthOk = colorType match {
      case 0 => Set(1, 2, 4, 8, 16)(depth)
      case 3 => Set(1, 2, 4, 8)(depth)
      case _ => depth == 8 || depth == 16
    }
    if (!depthOk) return None

    // walk chunks: concatenate IDAT, capture PLTE for palette images
    val idat = new java.io.ByteArrayOutputStream()
    var palette: Array[Byte] = null
    var i = 8 + 8 + 13 + 4 // past IHDR
    var sawEnd = false
    while (!sawEnd && i + 8 <= b.length) {
      val len = be32(b, i)
      if (len < 0 || i + 8 + len.toLong + 4 > b.length) return None
      val typ = new String(b, i + 4, 4, "US-ASCII")
      if (typ == "IDAT") idat.write(b, i + 8, len)
      else if (typ == "PLTE") {
        if (len % 3 != 0 || len > 768) return None
        palette = java.util.Arrays.copyOfRange(b, i + 8, i + 8 + len)
      } else if (typ == "IEND") sawEnd = true
      i += 8 + len + 4
    }
    if (idat.size() == 0) return None
    if (colorType == 3 && palette == null) return None

    val bitsPerPx = channels * depth
    def rowBytesFor(pixels: Int): Int = (pixels * bitsPerPx + 7) / 8
    // filtering operates on BYTES with bpp = the filter stride (≥1 byte)
    val fbpp = math.max(1, bitsPerPx / 8)

    // total inflated size across passes (one pass unless Adam7)
    val passes: Array[(Int, Int, Int, Int)] =
      if (interlace == 0) Array((0, 0, 1, 1)) else Adam7
    def passDims(p: (Int, Int, Int, Int)): (Int, Int) = {
      val (x0, y0, xs, ys) = p
      (if (w > x0) (w - x0 + xs - 1) / xs else 0,
        if (h > y0) (h - y0 + ys - 1) / ys else 0)
    }
    val rawLen = passes.map { p =>
      val (pw, ph) = passDims(p)
      if (pw == 0 || ph == 0) 0L else (1L + rowBytesFor(pw)) * ph
    }.sum
    if (rawLen <= 0 || rawLen > 64L * MaxPixels) return None
    val raw = new Array[Byte](rawLen.toInt)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var off = 0
      while (off < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, off, raw.length - off)
        if (n == 0 && inf.needsInput()) return None // truncated stream
        off += n
      }
      if (off < raw.length) return None
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inf.end()

    val out = new Array[Byte](w * h * 3)
    var rawOff = 0
    for (p <- passes) {
      val (x0, y0, xs, ys) = p
      val (pw, ph) = passDims(p)
      if (pw > 0 && ph > 0) {
        val rowBytes = rowBytesFor(pw)
        val line = new Array[Int](rowBytes) // reconstructed bytes, this row
        val prior = new Array[Int](rowBytes)
        java.util.Arrays.fill(prior, 0)
        var y = 0
        while (y < ph) {
          val f = raw(rawOff) & 0xff
          var x = 0
          while (x < rowBytes) {
            val v = raw(rawOff + 1 + x) & 0xff
            val a = if (x >= fbpp) line(x - fbpp) else 0
            val up = prior(x)
            val c = if (x >= fbpp) prior(x - fbpp) else 0
            val recon = f match {
              case 0 => v
              case 1 => v + a
              case 2 => v + up
              case 3 => v + ((a + up) >> 1)
              case 4 => // Paeth predictor
                val pr = a + up - c
                val pa = math.abs(pr - a); val pb = math.abs(pr - up)
                val pc = math.abs(pr - c)
                v + (if (pa <= pb && pa <= pc) a else if (pb <= pc) up else c)
              case _ => return None // unknown filter type
            }
            line(x) = recon & 0xff
            x += 1
          }
          // emit this pass-row's pixels into the full-resolution output
          var px = 0
          while (px < pw) {
            val ox = x0 + px * xs
            val oy = y0 + y * ys
            val o = (oy * w + ox) * 3
            if (depth >= 8) {
              val step = depth / 8 // bytes per sample; take the high byte
              val base = px * channels * step
              colorType match {
                case 0 =>
                  val g = line(base).toByte
                  out(o) = g; out(o + 1) = g; out(o + 2) = g
                case 2 =>
                  out(o) = line(base).toByte
                  out(o + 1) = line(base + step).toByte
                  out(o + 2) = line(base + 2 * step).toByte
                case 3 =>
                  val idx = line(base)
                  if (idx * 3 + 2 >= palette.length) return None
                  out(o) = palette(idx * 3)
                  out(o + 1) = palette(idx * 3 + 1)
                  out(o + 2) = palette(idx * 3 + 2)
                case 4 =>
                  val g = line(base).toByte
                  out(o) = g; out(o + 1) = g; out(o + 2) = g
                case _ =>
                  out(o) = line(base).toByte
                  out(o + 1) = line(base + step).toByte
                  out(o + 2) = line(base + 2 * step).toByte
              }
            } else { // sub-byte depths: gray (type 0) or palette (type 3)
              val bitPos = px * depth
              val sample = (line(bitPos >> 3) >> (8 - depth - (bitPos & 7))) &
                ((1 << depth) - 1)
              if (colorType == 3) {
                if (sample * 3 + 2 >= palette.length) return None
                out(o) = palette(sample * 3)
                out(o + 1) = palette(sample * 3 + 1)
                out(o + 2) = palette(sample * 3 + 2)
              } else { // gray: scale to full 0..255 range (spec: replicate)
                val g = (sample * 255 / ((1 << depth) - 1)).toByte
                out(o) = g; out(o + 1) = g; out(o + 2) = g
              }
            }
            px += 1
          }
          System.arraycopy(line, 0, prior, 0, rowBytes)
          rawOff += 1 + rowBytes
          y += 1
        }
      }
    }
    Some(PixelImage(w, h, out))
  }

  /** GIF87a/89a: logical screen descriptor + global/local color table,
    * extensions skipped by their sub-block lengths, first full-frame
    * image decoded via GIF-variant LZW (variable 3..12-bit codes,
    * LSB-first packing, clear/end codes, 4096-entry dictionary cap —
    * GIF89a spec appendix F). Interlaced images are de-interlaced by the
    * standard 4-pass row map. Palette indices map to exact RGB, so GIF
    * joins BMP/PNG on the REAL-decode path (LZW is pure bit arithmetic —
    * no codec library). */
  private def decodeGif(b: Array[Byte]): Option[PixelImage] = {
    val w = le16(b, 6); val h = le16(b, 8)
    if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) return None
    val packed = b(10) & 0xff
    var i = 13
    val gct: Array[Byte] =
      if ((packed & 0x80) != 0) {
        val size = 3 * (1 << ((packed & 7) + 1))
        if (i + size > b.length) return None
        val t = java.util.Arrays.copyOfRange(b, i, i + size); i += size; t
      } else null
    while (i < b.length) {
      (b(i) & 0xff) match {
        case 0x21 => // extension: label + sub-blocks until a 0 terminator
          i += 2
          while (i < b.length && (b(i) & 0xff) != 0) i += 1 + (b(i) & 0xff)
          i += 1
        case 0x2c => // image descriptor
          if (i + 10 > b.length) return None
          val left = le16(b, i + 1); val top = le16(b, i + 3)
          val iw = le16(b, i + 5); val ih = le16(b, i + 7)
          val p2 = b(i + 9) & 0xff
          if (left != 0 || top != 0 || iw != w || ih != h) return None // frames/tiles out of scope
          val interlaced = (p2 & 0x40) != 0
          i += 10
          val palette: Array[Byte] =
            if ((p2 & 0x80) != 0) {
              val size = 3 * (1 << ((p2 & 7) + 1))
              if (i + size > b.length) return None
              val t = java.util.Arrays.copyOfRange(b, i, i + size); i += size; t
            } else gct
          if (palette == null) return None
          if (i >= b.length) return None
          val minCodeSize = b(i) & 0xff; i += 1
          if (minCodeSize < 2 || minCodeSize > 11) return None
          // concatenate the data sub-blocks
          val data = new java.io.ByteArrayOutputStream()
          while (i < b.length && (b(i) & 0xff) != 0) {
            val len = b(i) & 0xff
            if (i + 1 + len > b.length) return None
            data.write(b, i + 1, len); i += 1 + len
          }
          val indices = lzwDecode(data.toByteArray, minCodeSize, w * h)
            .getOrElse(return None)
          val out = new Array[Byte](w * h * 3)
          val nColors = palette.length / 3
          var y = 0
          var src = 0
          while (y < h) {
            val destRow = if (interlaced) deinterlaceRow(y, h) else y
            var x = 0
            while (x < w) {
              val idx = indices(src)
              if (idx >= nColors) return None
              val o = (destRow * w + x) * 3
              out(o) = palette(idx * 3)
              out(o + 1) = palette(idx * 3 + 1)
              out(o + 2) = palette(idx * 3 + 2)
              x += 1; src += 1
            }
            y += 1
          }
          return Some(PixelImage(w, h, out))
        case 0x3b => return None // trailer before any image data
        case _ => return None // lost block alignment
      }
    }
    None
  }

  /** Interlace pass order: rows 0,8,16… then 4,12…, 2,6,10…, 1,3,5… */
  private[operators] def deinterlaceRow(seq: Int, h: Int): Int = {
    val p1 = (h + 7) / 8
    val p2 = (h + 3) / 8
    val p3 = (h + 1) / 4
    if (seq < p1) seq * 8
    else if (seq < p1 + p2) 4 + (seq - p1) * 8
    else if (seq < p1 + p2 + p3) 2 + (seq - p1 - p2) * 4
    else 1 + (seq - p1 - p2 - p3) * 2
  }

  /** GIF-variant LZW: returns exactly `expected` indices or None. */
  private[operators] def lzwDecode(data: Array[Byte], minCodeSize: Int,
      expected: Int): Option[Array[Int]] = {
    val clear = 1 << minCodeSize
    val end = clear + 1
    val MaxDict = 4096
    val prefix = new Array[Int](MaxDict)
    val suffix = new Array[Int](MaxDict)
    val stack = new Array[Int](MaxDict)
    val out = new Array[Int](expected)
    var outLen = 0
    var dictSize = end + 1
    var codeSize = minCodeSize + 1
    var prev = -1
    var bitPos = 0
    val totalBits = data.length * 8

    def emit(code: Int): Boolean = { // expand a code onto out; false = corrupt
      var c = code
      var sp = 0
      while (c >= clear) { // walk the prefix chain (literals are < clear)
        if (sp >= MaxDict || c >= dictSize) return false
        stack(sp) = suffix(c); sp += 1; c = prefix(c)
      }
      if (outLen + sp + 1 > expected) return false
      out(outLen) = c; outLen += 1
      while (sp > 0) { sp -= 1; out(outLen) = stack(sp); outLen += 1 }
      true
    }
    def firstChar(code: Int): Int = {
      var c = code
      while (c >= clear) c = prefix(c)
      c
    }

    while (outLen < expected) {
      if (bitPos + codeSize > totalBits) return None // truncated stream
      // LSB-first variable-width read
      var code = 0
      var j = 0
      while (j < codeSize) {
        val bit = (data((bitPos + j) >> 3) >> ((bitPos + j) & 7)) & 1
        code |= bit << j
        j += 1
      }
      bitPos += codeSize
      if (code == clear) {
        dictSize = end + 1; codeSize = minCodeSize + 1; prev = -1
      } else if (code == end) {
        return if (outLen == expected) Some(out) else None
      } else if (prev == -1) {
        if (code >= clear) return None // first code must be a literal
        out(outLen) = code; outLen += 1
        prev = code
      } else {
        if (code > dictSize) return None
        if (code == dictSize) { // the KwKwK case: prev's expansion + its first char
          if (dictSize < MaxDict) {
            prefix(dictSize) = prev; suffix(dictSize) = firstChar(prev)
            dictSize += 1
          } else return None
          if (!emit(code)) return None
        } else {
          if (!emit(code)) return None
          if (dictSize < MaxDict) {
            prefix(dictSize) = prev; suffix(dictSize) = firstChar(code)
            dictSize += 1
          }
        }
        if (dictSize == (1 << codeSize) && codeSize < 12) codeSize += 1
        prev = code
      }
    }
    Some(out)
  }

  // ----------------------------------------------------------- features

  /** Exact channel sums + BT.601 luma histogram over decoded pixels. */
  def features(img: PixelImage, bins: Int = 4): PixelFeatures = {
    var sr = 0L; var sg = 0L; var sb = 0L
    val hist = new Array[Long](bins)
    var i = 0
    val n = img.width * img.height
    while (i < n) {
      val r = img.rgb(i * 3) & 0xff
      val g = img.rgb(i * 3 + 1) & 0xff
      val b = img.rgb(i * 3 + 2) & 0xff
      sr += r; sg += g; sb += b
      // BT.601 integer luma, then bucket 0..255 into `bins` equal ranges
      val luma = (299 * r + 587 * g + 114 * b) / 1000
      hist((luma * bins) / 256) += 1
      i += 1
    }
    PixelFeatures(img.width, img.height, sr, sg, sb, hist)
  }

  /** Exact 2× box downscale: each output channel is the truncating
    * integer mean of its 2×2 source block (odd edges average the 1–2
    * available pixels). Output dims are ceil(w/2) × ceil(h/2). Integer
    * arithmetic only, so resized-image features stay oracle-exact. */
  def resizeBox2(img: PixelImage): PixelImage = {
    val ow = (img.width + 1) / 2
    val oh = (img.height + 1) / 2
    val out = new Array[Byte](ow * oh * 3)
    var oy = 0
    while (oy < oh) {
      var ox = 0
      while (ox < ow) {
        var c = 0
        while (c < 3) {
          var sum = 0
          var n = 0
          var dy = 0
          while (dy < 2) {
            var dx = 0
            while (dx < 2) {
              val sx = ox * 2 + dx
              val sy = oy * 2 + dy
              if (sx < img.width && sy < img.height) {
                sum += img.rgb((sy * img.width + sx) * 3 + c) & 0xff
                n += 1
              }
              dx += 1
            }
            dy += 1
          }
          out((oy * ow + ox) * 3 + c) = (sum / n).toByte
          c += 1
        }
        ox += 1
      }
      oy += 1
    }
    PixelImage(ow, oh, out)
  }

  // ------------------------------------------------------------- encode

  /** Real netpbm bytes (fixtures + tests): P1/P2/P3 ASCII or P4/P5/P6
    * binary, with a header comment so decoders must really skip them.
    * Gray kinds (P2/P5) take the red channel; bitmap kinds (P1/P4) are
    * black where red < 128. maxval > 255 emits two-byte big-endian
    * samples (value v·maxval/255 keeps the round-trip scaling exact
    * when maxval = 257·255 = 65535: v·257 → high byte v). */
  def encodePnm(width: Int, height: Int, kind: Int,
      px: (Int, Int) => (Int, Int, Int), maxval: Int = 255): Array[Byte] = {
    require(kind >= 1 && kind <= 6 && width > 0 && height > 0 &&
      width.toLong * height <= MaxPixels)
    require(maxval >= 1 && maxval <= 65535)
    val out = new java.io.ByteArrayOutputStream()
    def ws(s: String): Unit = s.foreach(c => out.write(c))
    ws(s"P$kind\n# graft fixture\n$width $height\n")
    if (kind != 1 && kind != 4) ws(s"$maxval\n")
    def sample(v8: Int): Int =
      if (maxval == 255) v8 else v8 * maxval / 255
    kind match {
      case 1 =>
        for (y <- 0 until height) {
          ws((0 until width).map { x =>
            if ((px(x, y)._1 & 0xff) < 128) "1" else "0"
          }.mkString(" "))
          ws("\n")
        }
      case 2 | 3 =>
        for (y <- 0 until height) {
          ws((0 until width).flatMap { x =>
            val (r, g, b) = px(x, y)
            if (kind == 2) Seq(sample(r & 0xff))
            else Seq(sample(r & 0xff), sample(g & 0xff), sample(b & 0xff))
          }.mkString(" "))
          ws("\n")
        }
      case 4 =>
        for (y <- 0 until height) {
          var acc = 0
          var nb = 0
          for (x <- 0 until width) {
            acc = (acc << 1) | (if ((px(x, y)._1 & 0xff) < 128) 1 else 0)
            nb += 1
            if (nb == 8) { out.write(acc); acc = 0; nb = 0 }
          }
          if (nb > 0) out.write(acc << (8 - nb)) // rows byte-aligned
        }
      case _ =>
        for (y <- 0 until height; x <- 0 until width) {
          val (r, g, b) = px(x, y)
          val vals = if (kind == 5) Seq(r) else Seq(r, g, b)
          vals.foreach { v =>
            val s = sample(v & 0xff)
            if (maxval > 255) { out.write(s >> 8); out.write(s & 0xff) }
            else out.write(s)
          }
        }
    }
    out.toByteArray
  }

  /** Real 24bpp BMP bytes with pixel payload; `topDown` writes the
    * negative-height layout. `px(x, y)` returns (r, g, b). */
  def encodeBmp(width: Int, height: Int,
      px: (Int, Int) => (Int, Int, Int), topDown: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0 && width.toLong * height <= MaxPixels)
    val stride = ((width * 3 + 3) / 4) * 4
    val size = 54 + stride * height
    val b = new Array[Byte](size)
    def wle16(i: Int, v: Int): Unit = { b(i) = v.toByte; b(i + 1) = (v >> 8).toByte }
    def wle32(i: Int, v: Int): Unit = {
      b(i) = v.toByte; b(i + 1) = (v >> 8).toByte
      b(i + 2) = (v >> 16).toByte; b(i + 3) = (v >> 24).toByte
    }
    b(0) = 'B'; b(1) = 'M'
    wle32(2, size); wle32(10, 54); wle32(14, 40)
    wle32(18, width); wle32(22, if (topDown) -height else height)
    wle16(26, 1); wle16(28, 24)
    wle32(30, 0); wle32(34, stride * height)
    wle32(38, 2835); wle32(42, 2835)
    var y = 0
    while (y < height) {
      val fileRow = if (topDown) y else height - 1 - y
      var x = 0
      while (x < width) {
        val (r, g, bl) = px(x, y)
        val off = 54 + fileRow * stride + x * 3
        b(off) = bl.toByte; b(off + 1) = g.toByte; b(off + 2) = r.toByte
        x += 1
      }
      y += 1
    }
    b
  }

  /** Emit one row of encoded runs (capped at 255) — the core wire
    * coding shared by [[rle8Encode]] and the AVI MRLE frame writer. */
  private[operators] def rle8EncodeRuns(out: java.io.ByteArrayOutputStream,
      width: Int, v: Int => Int): Unit = {
    var x = 0
    while (x < width) {
      val c = v(x) & 0xff
      var n = 1
      while (n < 255 && x + n < width && (v(x + n) & 0xff) == c) n += 1
      out.write(n); out.write(c)
      x += n
    }
  }

  /** RLE8-compress one display-space index raster, row-major top-first,
    * into the BMP/MRLE wire coding: bottom-up rows of encoded runs
    * (capped at 255), 00 00 after every line, 00 01 at the end. Shared
    * by the BI_RLE8 BMP fixture writer and the AVI `MRLE` encoder. */
  private[operators] def rle8Encode(w: Int, h: Int,
      idx: (Int, Int) => Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var row = h - 1 // display row; emitted bottom-up
    while (row >= 0) {
      val r = row
      rle8EncodeRuns(out, w, x => idx(x, r))
      out.write(0); out.write(if (row == 0) 1 else 0) // EOL / final EOB
      row -= 1
    }
    out.toByteArray
  }

  /** Real BI_RLE8 BMP bytes (fixtures + round-trip tests): 8bpp
    * paletted, compression 1, the palette as RGBQUADs, pixel indices
    * run-length coded by [[rle8Encode]]. `palette(i)` = 0xRRGGBB. */
  def encodeBmpRle8(width: Int, height: Int, palette: Array[Int],
      idx: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0 && width.toLong * height <= MaxPixels)
    require(palette.nonEmpty && palette.length <= 256)
    val data = rle8Encode(width, height, idx)
    val palBytes = palette.length * 4
    val off = 14 + 40 + palBytes
    val b = new Array[Byte](off + data.length)
    def wle16(i: Int, v: Int): Unit = { b(i) = v.toByte; b(i + 1) = (v >> 8).toByte }
    def wle32(i: Int, v: Int): Unit = {
      b(i) = v.toByte; b(i + 1) = (v >> 8).toByte
      b(i + 2) = (v >> 16).toByte; b(i + 3) = (v >> 24).toByte
    }
    b(0) = 'B'; b(1) = 'M'
    wle32(2, b.length); wle32(10, off)
    wle32(14, 40); wle32(18, width); wle32(22, height)
    wle16(26, 1); wle16(28, 8)
    wle32(30, 1); wle32(34, data.length) // BI_RLE8
    wle32(38, 2835); wle32(42, 2835)
    wle32(46, palette.length); wle32(50, 0) // biClrUsed / biClrImportant
    for (i <- palette.indices) {
      b(54 + i * 4) = palette(i).toByte // B
      b(54 + i * 4 + 1) = (palette(i) >> 8).toByte // G
      b(54 + i * 4 + 2) = (palette(i) >> 16).toByte // R
    }
    System.arraycopy(data, 0, b, off, data.length)
    b
  }

  /** Real GIF89a bytes with an actual LZW-coded pixel stream: a global
    * color table built from the image's distinct colors (≤ 256 required)
    * and the spec-compliant "uncompressed LZW" coding — every index is
    * emitted as a literal code, with a CLEAR code inserted before the
    * dictionary would force a code-width increase (the GIF spec allows
    * CLEAR anywhere, so ANY conformant decoder — including ours and
    * ImageIO's — reads it; the trick only costs compression ratio). */
  def encodeGif(width: Int, height: Int,
      px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width > 0 && height > 0 && width.toLong * height <= MaxPixels)
    val paletteIx = new java.util.LinkedHashMap[Int, Int]()
    val indices = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val (r, g, b) = px(x, y)
        val key = ((r & 0xff) << 16) | ((g & 0xff) << 8) | (b & 0xff)
        var ix = paletteIx.getOrDefault(key, -1)
        if (ix < 0) { ix = paletteIx.size(); paletteIx.put(key, ix) }
        indices(y * width + x) = ix
        x += 1
      }
      y += 1
    }
    require(paletteIx.size() <= 256, s"GIF fixture needs ≤256 colors, got ${paletteIx.size()}")
    // table size = 2^(field+1) ≥ max(2, #colors)
    var bits = 1
    while ((1 << bits) < paletteIx.size()) bits += 1
    val tableSize = 1 << bits
    val minCodeSize = math.max(2, bits)

    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def wle16(v: Int): Unit = { w8(v); w8(v >> 8) }
    out.write("GIF89a".getBytes("US-ASCII"))
    wle16(width); wle16(height)
    w8(0x80 | 0x70 | (bits - 1)); w8(0); w8(0) // GCT present, colorRes 7
    val it = paletteIx.keySet().iterator()
    var written = 0
    while (it.hasNext) {
      val c = it.next()
      w8(c >> 16); w8(c >> 8); w8(c); written += 1
    }
    while (written < tableSize) { w8(0); w8(0); w8(0); written += 1 }
    w8(0x2c); wle16(0); wle16(0); wle16(width); wle16(height); w8(0)
    w8(minCodeSize)

    // LZW literal stream with width-capping CLEARs, LSB-first bit packing
    val clear = 1 << minCodeSize
    val end = clear + 1
    val codeSize = minCodeSize + 1
    // after a CLEAR the first literal adds no dict entry and each later
    // one adds one: dictSize = 2^m+1+k after k literals, and decoders
    // widen the code at dictSize == 2^(m+1), i.e. k = 2^m-1 — so at most
    // 2^m-2 literals may sit between CLEARs for the width to stay fixed
    val literalsPerClear = (1 << minCodeSize) - 2
    val bitBuf = new java.io.ByteArrayOutputStream()
    var acc = 0L; var accBits = 0
    def putCode(c: Int): Unit = {
      acc |= c.toLong << accBits; accBits += codeSize
      while (accBits >= 8) { bitBuf.write((acc & 0xff).toInt); acc >>= 8; accBits -= 8 }
    }
    putCode(clear)
    var n = 0
    var sinceClear = 0
    while (n < indices.length) {
      if (sinceClear == literalsPerClear) { putCode(clear); sinceClear = 0 }
      putCode(indices(n)); sinceClear += 1; n += 1
    }
    putCode(end)
    if (accBits > 0) bitBuf.write((acc & 0xff).toInt)
    val data = bitBuf.toByteArray
    var off = 0
    while (off < data.length) {
      val len = math.min(255, data.length - off)
      w8(len); out.write(data, off, len); off += len
    }
    w8(0) // block terminator
    w8(0x3b) // trailer
    out.toByteArray
  }

  /** Real PNG bytes: correct chunk CRC32s, genuine zlib IDAT. Row filter
    * types cycle through all five (y % 5) so a decoder that skips filter
    * reconstruction cannot round-trip these. `withAlpha` writes color
    * type 6 with a deterministic alpha channel (dropped on decode);
    * `interlaced` writes the Adam7 seven-pass layout (each pass filtered
    * independently, as the spec requires). */
  def encodePng(width: Int, height: Int,
      px: (Int, Int) => (Int, Int, Int), withAlpha: Boolean = false,
      interlaced: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0 && width.toLong * height <= MaxPixels)
    val bpp = if (withAlpha) 4 else 3
    // raw scanlines with per-row filters applied (encoder side of §9),
    // one stretch per pass (one pass unless Adam7)
    val passes: Array[(Int, Int, Int, Int)] =
      if (interlaced) Adam7 else Array((0, 0, 1, 1))
    val rawBuf = new java.io.ByteArrayOutputStream()
    for (p <- passes) {
      val (x0, y0, xs, ys) = p
      val pw = if (width > x0) (width - x0 + xs - 1) / xs else 0
      val ph = if (height > y0) (height - y0 + ys - 1) / ys else 0
      if (pw > 0 && ph > 0) {
        val cur = new Array[Int](pw * bpp)
        val prior = new Array[Int](pw * bpp)
        java.util.Arrays.fill(prior, 0)
        var y = 0
        while (y < ph) {
          var i = 0
          while (i < pw) {
            val (r, g, b) = px(x0 + i * xs, y0 + y * ys)
            cur(i * bpp) = r & 0xff; cur(i * bpp + 1) = g & 0xff
            cur(i * bpp + 2) = b & 0xff
            if (withAlpha) cur(i * bpp + 3) = (255 - ((i + y) % 7)) & 0xff
            i += 1
          }
          val f = y % 5
          rawBuf.write(f)
          i = 0
          while (i < pw * bpp) {
            val a = if (i >= bpp) cur(i - bpp) else 0
            val up = prior(i)
            val c = if (i >= bpp) prior(i - bpp) else 0
            val filtered = f match {
              case 0 => cur(i)
              case 1 => cur(i) - a
              case 2 => cur(i) - up
              case 3 => cur(i) - ((a + up) >> 1)
              case 4 =>
                val pr = a + up - c
                val pa = math.abs(pr - a); val pb = math.abs(pr - up)
                val pc = math.abs(pr - c)
                cur(i) - (if (pa <= pb && pa <= pc) a else if (pb <= pc) up else c)
            }
            rawBuf.write(filtered & 0xff)
            i += 1
          }
          System.arraycopy(cur, 0, prior, 0, cur.length)
          y += 1
        }
      }
    }
    val raw = rawBuf.toByteArray
    // zlib-deflate the scanlines (PNG mandates the zlib wrapper, which is
    // java.util.zip.Deflater's default mode)
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val zipped = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) zipped.write(buf, 0, deflater.deflate(buf))
    deflater.end()

    val out = new java.io.ByteArrayOutputStream()
    def wbe32(v: Int): Unit = {
      out.write(v >> 24); out.write(v >> 16); out.write(v >> 8); out.write(v)
    }
    def chunk(typ: String, data: Array[Byte]): Unit = {
      wbe32(data.length)
      val t = typ.getBytes("US-ASCII")
      out.write(t)
      out.write(data)
      val crc = new java.util.zip.CRC32()
      crc.update(t); crc.update(data)
      wbe32(crc.getValue.toInt)
    }
    out.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    val ihdr = new Array[Byte](13)
    ihdr(0) = (width >> 24).toByte; ihdr(1) = (width >> 16).toByte
    ihdr(2) = (width >> 8).toByte; ihdr(3) = width.toByte
    ihdr(4) = (height >> 24).toByte; ihdr(5) = (height >> 16).toByte
    ihdr(6) = (height >> 8).toByte; ihdr(7) = height.toByte
    ihdr(8) = 8 // bit depth
    ihdr(9) = (if (withAlpha) 6 else 2).toByte // color type
    ihdr(12) = (if (interlaced) 1 else 0).toByte // Adam7 flag
    chunk("IHDR", ihdr)
    chunk("IDAT", zipped.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }
}
