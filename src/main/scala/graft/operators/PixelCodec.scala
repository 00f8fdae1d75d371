package graft.operators

/** Zero-dependency pixel decode for the two formats whose pixel layer is
  * pure byte arithmetic + DEFLATE — no codec library required:
  *
  *  - BMP: uncompressed 24bpp BI_RGB (BITMAPINFOHEADER or later), both
  *    bottom-up (positive biHeight) and top-down (negative) row orders,
  *    4-byte-aligned row stride, BGR byte order (MS BMP spec).
  *  - PNG: 8-bit-depth truecolor (color type 2) and truecolor+alpha
  *    (type 6), non-interlaced. IDAT chunks are concatenated, inflated
  *    with `java.util.zip.Inflater` (zlib stream, exactly what the PNG
  *    spec mandates), and every row filter — None/Sub/Up/Average/Paeth
  *    (PNG spec §9) — is reconstructed. Alpha is dropped on output.
  *
  * JPEG/WebP/GIF pixel layers need entropy decoders (Huffman/VP8/LZW)
  * that are out of scope without a codec library; those formats fall back
  * to [[Multimodal.StubCodec]], labeled per-row via the `decoder` column.
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
    if (b == null || b.length < 8) None
    else if (b(0) == 'B' && b(1) == 'M') decodeBmp(b)
    else if ((b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G')
      decodePng(b)
    else None
  }

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  /** 24bpp BI_RGB only; other depths/compressions → None (stub path). */
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
    if (w <= 0 || h <= 0 || hRaw == Int.MinValue || planes != 1 ||
        bpp != 24 || compression != 0) return None
    if (w.toLong * h > MaxPixels) return None
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

  /** 8-bit color type 2 (RGB) / 6 (RGBA), non-interlaced. */
  private def decodePng(b: Array[Byte]): Option[PixelImage] = {
    if (b.length < 33) return None
    // IHDR is mandated first: length 13, type at 12
    if (be32(b, 8) != 13 || b(12) != 'I' || b(13) != 'H' ||
        b(14) != 'D' || b(15) != 'R') return None
    val w = be32(b, 16)
    val h = be32(b, 20)
    val bitDepth = b(24) & 0xff
    val colorType = b(25) & 0xff
    val interlace = b(28) & 0xff
    if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) return None
    if (bitDepth != 8 || (colorType != 2 && colorType != 6) || interlace != 0)
      return None
    val bpp = if (colorType == 6) 4 else 3

    // walk chunks, concatenating IDAT payloads
    val idat = new java.io.ByteArrayOutputStream()
    var i = 8 + 8 + 13 + 4 // past IHDR
    var sawEnd = false
    while (!sawEnd && i + 8 <= b.length) {
      val len = be32(b, i)
      if (len < 0 || i + 8 + len.toLong + 4 > b.length) return None
      val typ = new String(b, i + 4, 4, "US-ASCII")
      if (typ == "IDAT") idat.write(b, i + 8, len)
      else if (typ == "IEND") sawEnd = true
      i += 8 + len + 4
    }
    if (idat.size() == 0) return None

    // inflate the zlib stream to filtered scanlines
    val rowBytes = 1 + w * bpp
    val raw = new Array[Byte](rowBytes * h)
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

    // unfilter (PNG spec §9: a = left, b = above, c = upper-left; all
    // arithmetic on the RECONSTRUCTED bytes of this and the prior row)
    val line = new Array[Int](w * bpp) // reconstructed current row
    val prior = new Array[Int](w * bpp)
    val out = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val f = raw(y * rowBytes) & 0xff
      var x = 0
      while (x < w * bpp) {
        val v = raw(y * rowBytes + 1 + x) & 0xff
        val a = if (x >= bpp) line(x - bpp) else 0
        val up = prior(x)
        val c = if (x >= bpp) prior(x - bpp) else 0
        val recon = f match {
          case 0 => v
          case 1 => v + a
          case 2 => v + up
          case 3 => v + ((a + up) >> 1)
          case 4 => // Paeth predictor
            val p = a + up - c
            val pa = math.abs(p - a); val pb = math.abs(p - up)
            val pc = math.abs(p - c)
            v + (if (pa <= pb && pa <= pc) a else if (pb <= pc) up else c)
          case _ => return None // unknown filter type
        }
        line(x) = recon & 0xff
        x += 1
      }
      var px = 0
      while (px < w) {
        out((y * w + px) * 3) = line(px * bpp).toByte
        out((y * w + px) * 3 + 1) = line(px * bpp + 1).toByte
        out((y * w + px) * 3 + 2) = line(px * bpp + 2).toByte
        px += 1
      }
      System.arraycopy(line, 0, prior, 0, line.length)
      y += 1
    }
    Some(PixelImage(w, h, out))
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

  // ------------------------------------------------------------- encode

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

  /** Real PNG bytes: correct chunk CRC32s, genuine zlib IDAT. Row filter
    * types cycle through all five (y % 5) so a decoder that skips filter
    * reconstruction cannot round-trip these. `withAlpha` writes color
    * type 6 with a deterministic alpha channel (dropped on decode). */
  def encodePng(width: Int, height: Int,
      px: (Int, Int) => (Int, Int, Int), withAlpha: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0 && width.toLong * height <= MaxPixels)
    val bpp = if (withAlpha) 4 else 3
    // raw scanlines with per-row filters applied (encoder side of §9)
    val raw = new Array[Byte]((1 + width * bpp) * height)
    val cur = new Array[Int](width * bpp)
    val prior = new Array[Int](width * bpp)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val (r, g, b) = px(x, y)
        cur(x * bpp) = r & 0xff; cur(x * bpp + 1) = g & 0xff
        cur(x * bpp + 2) = b & 0xff
        if (withAlpha) cur(x * bpp + 3) = (255 - ((x + y) % 7)) & 0xff
        x += 1
      }
      val f = y % 5
      raw(y * (1 + width * bpp)) = f.toByte
      var i = 0
      while (i < width * bpp) {
        val a = if (i >= bpp) cur(i - bpp) else 0
        val up = prior(i)
        val c = if (i >= bpp) prior(i - bpp) else 0
        val filtered = f match {
          case 0 => cur(i)
          case 1 => cur(i) - a
          case 2 => cur(i) - up
          case 3 => cur(i) - ((a + up) >> 1)
          case 4 =>
            val p = a + up - c
            val pa = math.abs(p - a); val pb = math.abs(p - up)
            val pc = math.abs(p - c)
            cur(i) - (if (pa <= pb && pa <= pc) a else if (pb <= pc) up else c)
        }
        raw(y * (1 + width * bpp) + 1 + i) = filtered.toByte
        i += 1
      }
      System.arraycopy(cur, 0, prior, 0, cur.length)
      y += 1
    }
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
    chunk("IHDR", ihdr)
    chunk("IDAT", zipped.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }
}
