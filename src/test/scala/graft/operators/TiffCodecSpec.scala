package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Baseline TIFF decode/encode: lossless round trips across endian ×
  * compression × strip split × predictor × photometric, independent
  * cross-checks against the JDK's ImageIO TIFF plugin (both directions
  * — our bytes through ImageIO, ImageIO's bytes through our decoder),
  * and hostile-payload refusals. */
class TiffCodecSpec extends AnyFunSuite {
  import PixelCodec.PixelImage

  private def grad(x: Int, y: Int): (Int, Int, Int) =
    (10 + 3 * x + 5 * y, 20 + 5 * x + 2 * y, 30 + 2 * x + 7 * y)

  private def assertImage(img: PixelImage, w: Int, h: Int,
      px: (Int, Int) => (Int, Int, Int), tagMsg: String): Unit = {
    assert(img.width == w && img.height == h, tagMsg)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      assert((img.rgb(o) & 0xff, img.rgb(o + 1) & 0xff, img.rgb(o + 2) & 0xff)
        == px(x, y), s"$tagMsg ($x,$y)")
    }
  }

  test("RGB round-trips across endian x compression x strip split x predictor") {
    val (w, h) = (19, 13)
    for {
      be <- Seq(false, true)
      comp <- Seq("none", "packbits", "lzw")
      rps <- Seq(0, 1, 5)
      pred <- Seq(false, true)
      if !pred || comp == "lzw"
    } {
      val bytes = TiffCodec.encodeTiffRgb(w, h, grad, comp, be, rps, pred)
      val img = PixelCodec.decode(bytes)
        .getOrElse(fail(s"None: be=$be comp=$comp rps=$rps pred=$pred"))
      assertImage(img, w, h, grad, s"be=$be comp=$comp rps=$rps pred=$pred")
    }
  }

  test("grayscale decodes under both photometric interpretations") {
    val (w, h) = (11, 7)
    def g(x: Int, y: Int): Int = 15 + 9 * x + 13 * y
    for (white <- Seq(false, true); comp <- Seq("none", "packbits", "lzw")) {
      val bytes = TiffCodec.encodeTiffGray(w, h, g, comp,
        bigEndian = white, whiteIsZero = white)
      val img = PixelCodec.decode(bytes).getOrElse(fail(s"None white=$white"))
      assertImage(img, w, h, (x, y) => { val v = g(x, y); (v, v, v) },
        s"white=$white comp=$comp")
    }
  }

  test("palette images map ColorMap high bytes") {
    val (w, h) = (9, 6)
    val pal = Array.tabulate(32)(i => (i * 8 << 16) | (255 - i * 7 << 8) | (i * 5))
    def idx(x: Int, y: Int): Int = (x + y * 3) % 32
    for (comp <- Seq("none", "lzw")) {
      val bytes = TiffCodec.encodeTiffPalette(w, h, pal, idx, comp)
      val img = PixelCodec.decode(bytes).getOrElse(fail(s"None comp=$comp"))
      assertImage(img, w, h, (x, y) => {
        val c = pal(idx(x, y))
        ((c >> 16) & 0xff, (c >> 8) & 0xff, c & 0xff)
      }, s"palette comp=$comp")
    }
  }

  test("LZW dictionary growth: a large image forces 10/11/12-bit codes, table Clear, and round-trips") {
    // 200x160 banded pixels: compressible (long repeats) yet varied
    // enough to push the table past every width boundary and through
    // the table-full Clear
    val (w, h) = (200, 160)
    def px(x: Int, y: Int): (Int, Int, Int) = {
      val v = ((x / 5) * 3 + (y / 2) * 11) % 240
      (v, (v + 40) % 240, (v * 2 + y % 7) % 240)
    }
    val bytes = TiffCodec.encodeTiffRgb(w, h, px, "lzw")
    val img = PixelCodec.decode(bytes).getOrElse(fail("None"))
    assertImage(img, w, h, px, "lzw-big")
    // LZW actually compressed this banded content
    assert(bytes.length < w * h * 3,
      s"expected compression, got ${bytes.length} vs ${w * h * 3}")
  }

  test("ImageIO independently decodes our TIFF bytes (all compressions)") {
    val (w, h) = (16, 10)
    for (comp <- Seq("none", "packbits", "lzw"); be <- Seq(false, true)) {
      val bytes = TiffCodec.encodeTiffRgb(w, h, grad, comp, be, rowsPerStrip = 4)
      val ref = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(ref != null, s"ImageIO rejected comp=$comp be=$be")
      assert(ref.getWidth == w && ref.getHeight == h)
      for (y <- 0 until h; x <- 0 until w) {
        val argb = ref.getRGB(x, y)
        assert((((argb >> 16) & 0xff), ((argb >> 8) & 0xff), (argb & 0xff))
          == grad(x, y), s"ImageIO comp=$comp be=$be ($x,$y)")
      }
    }
  }

  test("our decoder reads ImageIO-written TIFF bytes (incl. 16-bit gray)") {
    val (w, h) = (14, 9)
    // 8-bit RGB through the JDK writer
    val bi = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = grad(x, y)
      bi.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(bi, "tiff", baos), "JDK TIFF writer missing")
    val img = PixelCodec.decode(baos.toByteArray)
      .getOrElse(fail("our decoder rejected ImageIO RGB output"))
    assertImage(img, w, h, grad, "imageio-rgb")
    // 16-bit grayscale through the JDK writer: we keep the high byte
    val g16 = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      g16.getRaster.setSample(x, y, 0, ((40 + 7 * x + 9 * y) << 8) | 0x5a)
    val baos16 = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(g16, "tiff", baos16))
    val img16 = PixelCodec.decode(baos16.toByteArray)
      .getOrElse(fail("our decoder rejected ImageIO 16-bit gray output"))
    assertImage(img16, w, h, (x, y) => {
      val v = 40 + 7 * x + 9 * y // ≤ 203: fits the 16-bit high byte
      (v, v, v)
    }, "imageio-gray16")
  }

  test("our decoder reads ImageIO-LZW-compressed bytes (boundary pinned from the other side)") {
    // large enough to cross the 511 and 1023 early-change boundaries in
    // an INDEPENDENT encoder's output
    val (w, h) = (80, 50)
    def px(x: Int, y: Int): (Int, Int, Int) =
      ((x * 7 + y * 13) % 251, (x * 11 + y * 3) % 241, (x * 5 + y * 17) % 239)
    val bi = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = px(x, y)
      bi.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("tiff").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionType("LZW")
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(bi, null, null), param)
    ios.close(); writer.dispose()
    val img = PixelCodec.decode(baos.toByteArray)
      .getOrElse(fail("our decoder rejected ImageIO LZW output"))
    assertImage(img, w, h, px, "imageio-lzw")
  }

  test("planar configuration 2: separate RGB planes round-trip and ImageIO agrees") {
    def px(x: Int, y: Int): (Int, Int, Int) = (40 + 3 * x, 50 + 5 * y, 60 + x + y)
    for ((comp, pred, rows, be) <- Seq(("none", false, 0, false),
        ("packbits", false, 2, true), ("lzw", false, 3, false),
        ("lzw", true, 0, true))) {
      val bytes = TiffCodec.encodeTiffRgb(7, 5, px, comp, bigEndian = be,
        rowsPerStrip = rows, predictor = pred, planar2 = true)
      val img = TiffCodec.decode(bytes)
        .getOrElse(fail(s"planar $comp pred=$pred rows=$rows: None"))
      assert(img.width == 7 && img.height == 5)
      for (y <- 0 until 5; x <- 0 until 7) {
        val (r, g, b) = px(x, y)
        val o = (y * 7 + x) * 3
        assert((img.rgb(o) & 0xff, img.rgb(o + 1) & 0xff,
          img.rgb(o + 2) & 0xff) == ((r, g, b)),
          s"planar $comp pred=$pred ($x,$y)")
      }
      // independent read: the JDK TIFF plugin understands planar 2
      val back = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(back != null && back.getWidth == 7 && back.getHeight == 5,
        s"imageio planar $comp")
      for (y <- 0 until 5; x <- 0 until 7) {
        val (r, g, b) = px(x, y)
        val rgb = back.getRGB(x, y)
        assert((rgb >> 16 & 0xff, rgb >> 8 & 0xff, rgb & 0xff) == ((r, g, b)),
          s"imageio planar $comp ($x,$y)")
      }
    }
  }

  test("JPEG-in-TIFF (compression 7): complete and JPEGTables-abbreviated strips") {
    // block-constant grayscale is DC-only under all-ones quant — the
    // embedded T.81 streams round-trip bit-exactly (q47's discipline)
    def g(x: Int, y: Int): Int = 40 + 7 * (x / 8) + 11 * (y / 8)
    for ((rows, tables, be) <- Seq((0, false, false), (8, false, true),
        (8, true, false), (16, true, true))) {
      val bytes = TiffCodec.encodeTiffJpegGray(24, 16, g,
        rowsPerStrip = rows, tablesTag = tables, bigEndian = be)
      val img = TiffCodec.decode(bytes)
        .getOrElse(fail(s"jpeg-in-tiff rows=$rows tables=$tables: None"))
      assert(img.width == 24 && img.height == 16)
      for (y <- 0 until 16; x <- 0 until 24)
        assert((img.rgb((y * 24 + x) * 3) & 0xff) == g(x, y),
          s"rows=$rows tables=$tables ($x,$y)")
      // independent read: the JDK TIFF plugin decodes JPEG-in-TIFF
      val back = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(back != null && back.getWidth == 24 && back.getHeight == 16,
        s"imageio rows=$rows tables=$tables")
      // raw raster sample, not getRGB — ImageIO color-manages gray
      // through an ICC transfer curve that would distort the values
      for (y <- 0 until 16; x <- 0 until 24)
        assert(back.getRaster.getSample(x, y, 0) == g(x, y),
          s"imageio rows=$rows tables=$tables ($x,$y)")
    }
  }

  test("ImageIO-written JPEG-in-TIFF decodes through our embedded T.81 decoder") {
    import javax.imageio._
    // a CONSTANT image survives JPEG quantization exactly at any quality
    val img = new java.awt.image.BufferedImage(20, 12,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 12; x <- 0 until 20) img.setRGB(x, y, 0x5a5a5a)
    val wr = ImageIO.getImageWritersByFormatName("tiff").next()
    val p = wr.getDefaultWriteParam
    p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionType("JPEG")
    val bos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    wr.setOutput(ios)
    wr.write(null, new IIOImage(img, null, null), p)
    ios.close()
    val out = TiffCodec.decode(bos.toByteArray)
      .getOrElse(fail("imageio jpeg-in-tiff: None"))
    assert(out.width == 20 && out.height == 12)
    for (y <- 0 until 12; x <- 0 until 20) {
      val o = (y * 20 + x) * 3
      // constant gray through YCbCr: allow ±1 rounding per channel
      for (c <- 0 to 2)
        assert(math.abs((out.rgb(o + c) & 0xff) - 0x5a) <= 1,
          s"imageio->ours ($x,$y) c=$c got ${out.rgb(o + c) & 0xff}")
    }
  }

  test("hostile payloads refuse: truncation, bad magic, absurd geometry, planar, CCITT") {
    val ok = TiffCodec.encodeTiffRgb(8, 5, grad, "lzw")
    assert(PixelCodec.decode(ok).isDefined)
    for (cut <- Seq(ok.length - 1, ok.length / 2, 12, 5))
      assert(TiffCodec.decode(ok.take(cut)).isEmpty, s"cut=$cut")
    val badMagic = ok.clone(); badMagic(2) = 43
    assert(TiffCodec.decode(badMagic).isEmpty)
    // compression CCITT (2) on an RGB 8-bit shape: fax codings are
    // bilevel-only, so the mismatch refuses (the bilevel decode itself
    // is real since round 19 — CcittG4Spec). Patch tag 259's SHORT value:
    def patchShortTag(b: Array[Byte], tag: Int, v: Int): Array[Byte] = {
      val out = b.clone()
      val n = (out(8) & 0xff) | ((out(9) & 0xff) << 8)
      var found = false
      for (e <- 0 until n if !found) {
        val at = 10 + 12 * e
        if (((out(at) & 0xff) | ((out(at + 1) & 0xff) << 8)) == tag) {
          out(at + 8) = (v & 0xff).toByte
          out(at + 9) = ((v >> 8) & 0xff).toByte
          found = true
        }
      }
      assert(found, s"tag $tag not found")
      out
    }
    assert(TiffCodec.decode(patchShortTag(ok, 259, 2)).isEmpty, "CCITT")
    // planar tag flipped to 2 over CHUNKY strip data: the strip list is
    // one strip, not one per plane — the mismatch refuses (real planar-2
    // files decode since round 19, see the planar round-trip test)
    assert(TiffCodec.decode(patchShortTag(ok, 284, 2)).isEmpty, "planar 2")
    assert(TiffCodec.decode(patchShortTag(ok, 256, 0)).isEmpty, "zero width")
    // LZW garbage: flip bytes inside the strip data (dictionary walk must
    // refuse, never loop or throw)
    val mangled = ok.clone()
    for (i <- ok.length - 12 until ok.length - 4) mangled(i) = 0x55
    assert(TiffCodec.decode(mangled).isEmpty || TiffCodec.decode(mangled).isDefined)
  }

  test("image_meta parses real TIFF bytes from both endians") {
    for (be <- Seq(false, true)) {
      val bytes = TiffCodec.encodeTiffRgb(33, 21, grad, "lzw", be)
      assert(graft.functions.ImageMeta.parse(bytes) == (("tiff", 33, 21)),
        s"be=$be")
    }
  }

  test("multimodal labels TIFF rows as tiff") {
    val bytes = TiffCodec.encodeTiffRgb(6, 4, grad, "packbits")
    val img = PixelCodec.decode(bytes).get
    assert(img.width == 6)
    // the label branch keys off the leading byte
    assert(bytes(0) == 'I' || bytes(0) == 'M')
  }
}
