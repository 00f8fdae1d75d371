package graft.operators

import graft.SparkFunSuite
import graft.operators.PixelCodec._

/** Round-trip + adversarial coverage for the zero-dependency pixel codec,
  * including an INDEPENDENT cross-check: the JDK's own ImageIO readers
  * (java.desktop ships PNG and BMP decoders) decode our encoder's bytes
  * and must see the same pixels our decoder reconstructs — so encoder and
  * decoder cannot share a compensating bug.
  */
class PixelCodecSpec extends SparkFunSuite {

  private def grad(x: Int, y: Int): (Int, Int, Int) =
    (10 + 3 * x + 5 * y, 20 + 5 * x + 2 * y, 30 + 2 * x + 7 * y)

  private def expectedRgb(w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = grad(x, y)
      out((y * w + x) * 3) = r.toByte
      out((y * w + x) * 3 + 1) = g.toByte
      out((y * w + x) * 3 + 2) = b.toByte
    }
    out
  }

  private def imageIoRgb(bytes: Array[Byte]): Array[Byte] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO could not decode the fixture bytes")
    val out = new Array[Byte](img.getWidth * img.getHeight * 3)
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
      val argb = img.getRGB(x, y)
      val i = (y * img.getWidth + x) * 3
      out(i) = ((argb >> 16) & 0xff).toByte
      out(i + 1) = ((argb >> 8) & 0xff).toByte
      out(i + 2) = (argb & 0xff).toByte
    }
    out
  }

  test("BMP bottom-up round-trips exactly (incl. stride padding widths)") {
    // widths 3..6 cover all four stride paddings (9→12, 12, 15→16, 18→20)
    for (w <- 3 to 6) {
      val bytes = encodeBmp(w, 5, grad)
      val img = decode(bytes).get
      assert(img.width == w && img.height == 5)
      assert(img.rgb.sameElements(expectedRgb(w, 5)), s"pixel mismatch at w=$w")
      assert(imageIoRgb(bytes).sameElements(img.rgb),
        s"ImageIO disagrees with PixelCodec at w=$w")
    }
  }

  test("BMP top-down decodes to the same pixels as bottom-up") {
    val up = decode(encodeBmp(5, 4, grad)).get
    val down = decode(encodeBmp(5, 4, grad, topDown = true)).get
    assert(up.rgb.sameElements(down.rgb))
  }

  test("PNG RGB round-trips exactly through all five row filters") {
    // height 7 > 5 → filter types 0..4 all appear (encoder cycles y % 5)
    val bytes = encodePng(6, 7, grad)
    val img = decode(bytes).get
    assert(img.width == 6 && img.height == 7)
    assert(img.rgb.sameElements(expectedRgb(6, 7)))
    assert(imageIoRgb(bytes).sameElements(img.rgb),
      "ImageIO disagrees with PixelCodec on the PNG bytes")
  }

  test("PNG RGBA decodes with alpha dropped") {
    val bytes = encodePng(4, 6, grad, withAlpha = true)
    val img = decode(bytes).get
    assert(img.rgb.sameElements(expectedRgb(4, 6)))
    assert(imageIoRgb(bytes).sameElements(img.rgb))
  }

  test("PNG Adam7 interlace round-trips exactly, and ImageIO agrees") {
    // dims straddling the pass grid (not multiples of 8) exercise the
    // empty-pass and partial-pass arithmetic; filters cycle per pass
    for ((w, h) <- Seq((11, 9), (8, 8), (3, 2), (1, 1), (16, 5))) {
      val bytes = encodePng(w, h, grad, interlaced = true)
      val img = decode(bytes)
      assert(img.isDefined, s"interlaced decode failed at ${w}x$h")
      assert(img.get.rgb.sameElements(expectedRgb(w, h)),
        s"Adam7 pixel mismatch at ${w}x$h")
      assert(imageIoRgb(bytes).sameElements(img.get.rgb),
        s"ImageIO disagrees on the interlaced bytes at ${w}x$h")
    }
  }

  test("PNG grayscale / palette / 16-bit variants decode like ImageIO") {
    import java.awt.image.BufferedImage
    def write(img: BufferedImage): Array[Byte] = {
      val buf = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", buf))
      buf.toByteArray
    }
    // 8-bit grayscale (color type 0): raster read avoids the
    // linear-gray→sRGB getRGB conversion
    val gray = new BufferedImage(9, 7, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 7; x <- 0 until 9)
      gray.getRaster.setSample(x, y, 0, (x * 29 + y * 57) % 256)
    val gImg = decode(write(gray))
    assert(gImg.isDefined, "gray PNG rejected")
    for (y <- 0 until 7; x <- 0 until 9) {
      val want = gray.getRaster.getSample(x, y, 0)
      assert((gImg.get.rgb((y * 9 + x) * 3) & 0xff) == want, s"gray ($x,$y)")
      assert((gImg.get.rgb((y * 9 + x) * 3 + 1) & 0xff) == want)
    }
    // palette (color type 3, PLTE): TYPE_BYTE_INDEXED writes indexed PNG
    val pal = new BufferedImage(8, 6, BufferedImage.TYPE_BYTE_INDEXED)
    for (y <- 0 until 6; x <- 0 until 8) {
      val (r, g, b) = grad(x, y)
      pal.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val pBytes = write(pal)
    val pImg = decode(pBytes)
    assert(pImg.isDefined, "palette PNG rejected")
    assert(imageIoRgb(pBytes).sameElements(pImg.get.rgb),
      "palette decode disagrees with ImageIO on the same bytes")
    // 16-bit grayscale: our decode keeps the high byte
    val g16 = new BufferedImage(6, 5, BufferedImage.TYPE_USHORT_GRAY)
    for (y <- 0 until 5; x <- 0 until 6)
      g16.getRaster.setSample(x, y, 0, (x * 9157 + y * 12891) % 65536)
    val g16Img = decode(write(g16))
    assert(g16Img.isDefined, "16-bit gray PNG rejected")
    for (y <- 0 until 5; x <- 0 until 6) {
      val want = g16.getRaster.getSample(x, y, 0) >> 8
      assert((g16Img.get.rgb((y * 6 + x) * 3) & 0xff) == want, s"g16 ($x,$y)")
    }
    // 1-bit (TYPE_BYTE_BINARY): sub-byte depth with bit-packed scanlines
    val bw = new BufferedImage(10, 4, BufferedImage.TYPE_BYTE_BINARY)
    for (y <- 0 until 4; x <- 0 until 10)
      bw.setRGB(x, y, if ((x + y) % 3 == 0) 0xffffff else 0)
    val bwBytes = write(bw)
    val bwImg = decode(bwBytes)
    assert(bwImg.isDefined, "1-bit PNG rejected")
    assert(imageIoRgb(bwBytes).sameElements(bwImg.get.rgb),
      "1-bit decode disagrees with ImageIO on the same bytes")
  }

  test("1x1 and single-row/column edge shapes round-trip") {
    for ((w, h) <- Seq((1, 1), (1, 5), (5, 1))) {
      assert(decode(encodeBmp(w, h, grad)).get.rgb.sameElements(expectedRgb(w, h)))
      assert(decode(encodePng(w, h, grad)).get.rgb.sameElements(expectedRgb(w, h)))
    }
  }

  test("GIF round-trips exactly, and ImageIO agrees") {
    for ((w, h) <- Seq((4, 3), (6, 7), (1, 1), (5, 1), (1, 5))) {
      val bytes = encodeGif(w, h, grad)
      val img = decode(bytes).get
      assert(img.width == w && img.height == h)
      assert(img.rgb.sameElements(expectedRgb(w, h)), s"pixel mismatch at ${w}x$h")
      assert(imageIoRgb(bytes).sameElements(img.rgb),
        s"ImageIO disagrees with PixelCodec on the GIF bytes at ${w}x$h")
    }
    // few-color image exercises the tiny-palette/min-code-size path
    val twoColor = decode(encodeGif(8, 8, (x, y) =>
      if ((x + y) % 2 == 0) (255, 0, 0) else (0, 0, 255))).get
    assert((0 until 64).forall { i =>
      val r = twoColor.rgb(i * 3) & 0xff
      r == 255 || r == 0
    })
  }

  test("GIF: real compressed LZW from ImageIO's own writer decodes identically") {
    // our encoder uses the uncompressed-LZW trick; ImageIO writes REAL
    // growing-dictionary LZW — feeding its output through our decoder
    // proves the full variable-width/KwKwK path, not just literals
    val img = new java.awt.image.BufferedImage(23, 17,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 17; x <- 0 until 23) {
      val (r, g, b) = grad(x % 12, y % 9) // repeated tiles → LZW matches
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val buf = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "gif", buf))
    val ours = decode(buf.toByteArray)
    assert(ours.isDefined, "our decoder rejected an ImageIO-written GIF")
    assert(ours.get.width == 23 && ours.get.height == 17)
    // GIF is lossless for <=256-color images: pixels must match exactly
    val ref = imageIoRgb(buf.toByteArray)
    assert(ours.get.rgb.sameElements(ref),
      "our LZW decode disagrees with ImageIO on ImageIO's own bytes")
  }

  test("malformed payloads decode to None, never throw") {
    val png = encodePng(4, 4, grad)
    val bmp = encodeBmp(4, 4, grad)
    assert(decode(null) == None)
    assert(decode(Array[Byte](1, 2, 3)) == None)
    assert(decode(bmp.take(30)) == None) // truncated header
    assert(decode(bmp.take(60)) == None) // header ok, pixels missing
    assert(decode(png.take(40)) == None) // truncated mid-IHDR-chunk
    // corrupt the zlib stream: IDAT payload bytes flipped
    val corrupt = png.clone()
    val idat = {
      var i = 8; var at = -1
      while (at < 0 && i + 8 < corrupt.length) {
        if (corrupt(i + 4) == 'I' && corrupt(i + 5) == 'D' &&
            corrupt(i + 6) == 'A' && corrupt(i + 7) == 'T') at = i
        else i += 1
      }
      at
    }
    for (j <- idat + 8 until math.min(idat + 16, corrupt.length))
      corrupt(j) = (~corrupt(j)).toByte
    assert(decode(corrupt) == None)
    // the q66 header-only fixtures (no pixel payload) must hit the stub
    assert(decode(graft.functions.ImageMeta.encode("bmp", 8, 8)) == None)
    assert(decode(graft.functions.ImageMeta.encode("png", 8, 8)) == None)
    assert(decode(graft.functions.ImageMeta.encode("jpeg", 8, 8)) == None)
    assert(decode(graft.functions.ImageMeta.encode("gif", 8, 8)) == None)
    // truncated GIF: cut inside the LZW sub-blocks
    val gif = encodeGif(6, 6, grad)
    assert(decode(gif.take(gif.length - 8)) == None)
    assert(decode(gif.take(20)) == None)
    // hostile header: claims 65535x65535, carries 0 pixel bytes
    val hostile = bmp.clone()
    hostile(18) = -1; hostile(19) = -1; hostile(22) = -1; hostile(23) = -1
    assert(decode(hostile) == None)
  }

  // ---------------------------------------------------- BI_RLE8 BMP

  private val rlePalette: Array[Int] =
    Array.tabulate(256)(i => (i << 16) | ((i * 3 % 256) << 8) | (i * 7 % 256))

  test("BI_RLE8 BMP round-trips exactly, and ImageIO agrees") {
    // runs of varying lengths per row — exercises run splitting at 255
    // via a 300-wide row — plus single-pixel runs
    val w = 300
    val h = 5
    val idx = (x: Int, y: Int) => if (x < 256) (x / (y + 1)) % 256 else y * 40 + 7
    val bytes = PixelCodec.encodeBmpRle8(w, h, rlePalette, idx)
    val img = decode(bytes).get
    assert(img.width == w && img.height == h)
    for (y <- 0 until h; x <- 0 until w) {
      val ci = idx(x, y)
      val o = (y * w + x) * 3
      assert((img.rgb(o) & 0xff) == ((rlePalette(ci) >> 16) & 0xff))
      assert((img.rgb(o + 1) & 0xff) == ((rlePalette(ci) >> 8) & 0xff))
      assert((img.rgb(o + 2) & 0xff) == (rlePalette(ci) & 0xff))
    }
    assert(img.rgb.sameElements(imageIoRgb(bytes)),
      "ImageIO disagrees on the RLE8 stream")
  }

  test("uncompressed 8bpp paletted BMP decodes; ImageIO agrees") {
    // hand-built: 5 wide (stride pads to 8), 3 high, bottom-up
    val w = 5
    val h = 3
    val stride = 8
    val b = new Array[Byte](54 + 16 * 4 + stride * h)
    def wle16(i: Int, v: Int): Unit = { b(i) = v.toByte; b(i + 1) = (v >> 8).toByte }
    def wle32(i: Int, v: Int): Unit = {
      b(i) = v.toByte; b(i + 1) = (v >> 8).toByte
      b(i + 2) = (v >> 16).toByte; b(i + 3) = (v >> 24).toByte
    }
    b(0) = 'B'; b(1) = 'M'; wle32(2, b.length); wle32(10, 54 + 64)
    wle32(14, 40); wle32(18, w); wle32(22, h)
    wle16(26, 1); wle16(28, 8); wle32(30, 0); wle32(46, 16)
    for (i <- 0 until 16) {
      b(54 + i * 4) = (i * 5).toByte; b(54 + i * 4 + 1) = (i * 9).toByte
      b(54 + i * 4 + 2) = (i * 13).toByte
    }
    for (y <- 0 until h; x <- 0 until w)
      b(54 + 64 + (h - 1 - y) * stride + x) = ((x + y * 4) % 16).toByte
    val img = decode(b).get
    assert(img.width == w && img.height == h)
    for (y <- 0 until h; x <- 0 until w) {
      val ci = (x + y * 4) % 16
      val o = (y * w + x) * 3
      assert((img.rgb(o) & 0xff) == (ci * 13 & 0xff) &&
        (img.rgb(o + 1) & 0xff) == (ci * 9 & 0xff) &&
        (img.rgb(o + 2) & 0xff) == (ci * 5 & 0xff))
    }
    assert(img.rgb.sameElements(imageIoRgb(b)))
  }

  test("RLE8 absolute mode and cursor deltas decode; ImageIO agrees") {
    // hand-built stream over a 6×3 canvas: run, absolute block,
    // delta-skip (untouched pixels stay palette 0), EOLs, EOB
    val data = Array[Int](
      3, 5, // bottom row: 3 px of color 5
      0, 3, 1, 2, 3, 0, // absolute: 3 literals + the odd-count pad byte
      0, 0, // EOL
      0, 2, 2, 1, // delta: right 2, up 1 → skips row 1 entirely
      4, 9, // top row, x=2..5: 4 px of color 9
      0, 1 // EOB
    ).map(_.toByte)
    val pal = Array.tabulate(16)(i => (i * 11 << 16) | (i * 7 << 8) | i * 3)
    val head = PixelCodec.encodeBmpRle8(6, 3, pal, (_, _) => 0)
    // splice our stream in place of the generated one
    val off = 14 + 40 + pal.length * 4
    val bytes = java.util.Arrays.copyOf(head, off + data.length)
    bytes(34) = data.length.toByte // biSizeImage
    System.arraycopy(data, 0, bytes, off, data.length)
    val img = decode(bytes).get
    // expected index canvas (display space, top row first)
    val expect = Array(
      Array(0, 0, 9, 9, 9, 9), // top (BMP y=2)
      Array(0, 0, 0, 0, 0, 0), // skipped by the delta
      Array(5, 5, 5, 1, 2, 3)) // bottom (BMP y=0): run then absolute
    for (y <- 0 until 3; x <- 0 until 6) {
      val ci = expect(y)(x)
      assert((img.rgb((y * 6 + x) * 3) & 0xff) == ((pal(ci) >> 16) & 0xff),
        s"index mismatch at ($x,$y)")
    }
    assert(img.rgb.sameElements(imageIoRgb(bytes)),
      "ImageIO disagrees on absolute/delta modes")
  }

  test("hostile RLE8 streams decode to None, never throw") {
    val pal = Array.tabulate(4)(i => i * 0x111111)
    val good = PixelCodec.encodeBmpRle8(4, 2, pal, (x, y) => (x + y) % 4)
    // truncated: no end-of-bitmap
    assert(decode(good.take(good.length - 2)) == None)
    // run overflows the row
    val off = 14 + 40 + pal.length * 4
    val overrun = good.clone(); overrun(off) = 200.toByte
    assert(decode(overrun) == None)
    // delta jumps past the canvas
    val wild = java.util.Arrays.copyOf(good, off + 6)
    wild(off) = 0; wild(off + 1) = 2; wild(off + 2) = 250.toByte
    wild(off + 3) = 250.toByte; wild(off + 4) = 0; wild(off + 5) = 1
    assert(decode(wild) == None)
    // palette index out of biClrUsed range
    val badIx = good.clone(); badIx(off + 1) = 9 // only 4 colors
    assert(decode(badIx) == None)
    // hostile bfOffBits: negative via le32 wrap on an 8bpp uncompressed
    // BMP — must refuse, not throw (the decode-to-None contract)
    val pal16 = Array.tabulate(16)(i => i * 0x101010)
    val flat = PixelCodec.encodeBmpRle8(4, 2, pal16, (x, y) => (x + y) % 16)
    flat(30) = 0 // biCompression BI_RLE8 → BI_RGB (8bpp uncompressed)
    val negOff = flat.clone()
    negOff(10) = 0; negOff(11) = -1; negOff(12) = -1; negOff(13) = -1
    assert(decode(negOff) == None)
    // hostile biSize near Int.MaxValue: the palette bounds check must
    // not wrap negative and pass
    val hugeDib = good.clone()
    hugeDib(14) = -1; hugeDib(15) = -1; hugeDib(16) = -1; hugeDib(17) = 0x7f
    assert(decode(hugeDib) == None)
    // RLE8 with top-down height is refused (spec: bottom-up only)
    val topDown = good.clone()
    val hNeg = -2
    topDown(22) = hNeg.toByte; topDown(23) = (hNeg >> 8).toByte
    topDown(24) = (hNeg >> 16).toByte; topDown(25) = (hNeg >> 24).toByte
    assert(decode(topDown) == None)
  }

  test("features: exact channel sums and luma histogram") {
    val img = decode(encodePng(3, 2, grad)).get
    val f = features(img, bins = 4)
    // reference computation straight off the generator definition
    var sr = 0L; var sg = 0L; var sb = 0L
    val hist = new Array[Long](4)
    for (y <- 0 until 2; x <- 0 until 3) {
      val (r, g, b) = grad(x, y)
      sr += r; sg += g; sb += b
      hist(((299 * r + 587 * g + 114 * b) / 1000) * 4 / 256) += 1
    }
    assert(f.sumR == sr && f.sumG == sg && f.sumB == sb)
    assert(f.lumaHist.sameElements(hist))
    assert(f.lumaHist.sum == 6) // every pixel lands in exactly one bin
  }

  test("netpbm: P6/P3/P5/P2 round-trip; P1/P4 bitmaps; 16-bit and maxval scaling; comments skipped") {
    def px(x: Int, y: Int): (Int, Int, Int) =
      (10 + 3 * x + 5 * y, 20 + 5 * x + 2 * y, 30 + 2 * x + 7 * y)
    val (w, h) = (9, 6)
    // dual-spelling agreement: the ASCII and binary pixmaps decode
    // identically, bit for bit — and 16-bit samples keep the high byte
    val p6 = PixelCodec.decode(PixelCodec.encodePnm(w, h, 6, px)).get
    val p3 = PixelCodec.decode(PixelCodec.encodePnm(w, h, 3, px)).get
    val p6wide = PixelCodec.decode(
      PixelCodec.encodePnm(w, h, 6, px, maxval = 65535)).get
    assert(p6.rgb.toSeq == p3.rgb.toSeq)
    assert(p6.rgb.toSeq == p6wide.rgb.toSeq)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      val (r, g, b) = px(x, y)
      assert((p6.rgb(o) & 0xff, p6.rgb(o + 1) & 0xff, p6.rgb(o + 2) & 0xff)
        == ((r, g, b)), s"($x,$y)")
    }
    // graymaps: P5 binary == P2 ASCII, red channel replicated
    val p5 = PixelCodec.decode(PixelCodec.encodePnm(w, h, 5, px)).get
    val p2 = PixelCodec.decode(PixelCodec.encodePnm(w, h, 2, px)).get
    assert(p5.rgb.toSeq == p2.rgb.toSeq)
    assert((p5.rgb(3) & 0xff) == (p5.rgb(4) & 0xff))
    // bitmaps: P4 packed == P1 ASCII; 1 = black, rows byte-aligned
    def bw(x: Int, y: Int): (Int, Int, Int) =
      if ((x + y) % 3 == 0) (0, 0, 0) else (255, 255, 255)
    val p4 = PixelCodec.decode(PixelCodec.encodePnm(11, 5, 4, bw)).get
    val p1 = PixelCodec.decode(PixelCodec.encodePnm(11, 5, 1, bw)).get
    assert(p4.rgb.toSeq == p1.rgb.toSeq)
    for (y <- 0 until 5; x <- 0 until 11)
      assert((p4.rgb((y * 11 + x) * 3) & 0xff) ==
        (if ((x + y) % 3 == 0) 0 else 255), s"P4 ($x,$y)")
    // refusals: truncated raster, absurd header, sample over maxval
    val ok = PixelCodec.encodePnm(w, h, 6, px)
    assert(PixelCodec.decode(ok.take(ok.length - 5)).isEmpty)
    assert(PixelCodec.decode("P6\n0 5\n255\n".getBytes("US-ASCII")).isEmpty)
    assert(PixelCodec.decode("P2\n2 1\n100\n5 101\n".getBytes("US-ASCII")).isEmpty)
    assert(PixelCodec.decode("P9\n2 1\n255\n".getBytes("US-ASCII")).isEmpty)
  }
}
