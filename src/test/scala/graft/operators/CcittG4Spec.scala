package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** CCITT Group 4 (T.6) in TIFF. The transcribed T.4 run-length tables
  * are verified BOTH directions against javax.imageio's independent
  * CCITT codec: our decoder must read ImageIO-written T.6 streams, and
  * ImageIO must read ours — a mis-transcribed Huffman code cannot
  * survive either cross-check. */
class CcittG4Spec extends AnyFunSuite {

  private def pattern(seed: Int)(x: Int, y: Int): Boolean = {
    // varied per-row transition structure: stripes, runs, isolated dots
    val v = (x * 7 + y * 13 + seed * 31) % 11
    v < 4 || (v == 7 && (x + seed) % 3 == 0)
  }

  private def assertImage(img: PixelCodec.PixelImage, w: Int, h: Int,
      black: (Int, Int) => Boolean, label: String): Unit = {
    assert(img.width == w && img.height == h, label)
    for (y <- 0 until h; x <- 0 until w) {
      val expect = if (black(x, y)) 0 else 255
      assert((img.rgb((y * w + x) * 3) & 0xff) == expect,
        s"$label pixel ($x,$y)")
    }
  }

  test("round trip: varied bilevel patterns, odd widths, both endians") {
    for (seed <- 1 to 6) {
      val w = 17 + 10 * seed // odd widths exercise row-bit packing
      val h = 5 + seed
      val f = pattern(seed) _
      val bytes = TiffCodec.encodeTiffG4(w, h, f, bigEndian = seed % 2 == 0)
      val img = TiffCodec.decode(bytes).getOrElse(fail(s"seed $seed: None"))
      assertImage(img, w, h, f, s"seed $seed")
    }
  }

  test("multi-strip: each strip codes independently against white") {
    val (w, h) = (41, 12)
    val f = pattern(9) _
    val bytes = TiffCodec.encodeTiffG4(w, h, f, rowsPerStrip = 5)
    assertImage(TiffCodec.decode(bytes).getOrElse(fail("None")), w, h, f,
      "multi-strip")
  }

  test("all-white, all-black, and single-pixel edge shapes") {
    for ((f, label) <- Seq(
        ((_: Int, _: Int) => false, "all white"),
        ((_: Int, _: Int) => true, "all black"),
        ((x: Int, y: Int) => x == 0 && y == 0, "one dot"),
        ((x: Int, _: Int) => x == 30, "last column"))) {
      val bytes = TiffCodec.encodeTiffG4(31, 4, f)
      assertImage(TiffCodec.decode(bytes).getOrElse(fail(s"$label: None")),
        31, 4, f, label)
    }
  }

  test("long runs cross the make-up table (64, 1728, 1792, 2560+ paths)") {
    // one row wide enough to need extended make-ups: white run 2700,
    // black run 1900, white remainder
    val w = 2700 + 1900 + 137
    val f = (x: Int, _: Int) => x >= 2700 && x < 2700 + 1900
    val bytes = TiffCodec.encodeTiffG4(w, 3, f)
    assertImage(TiffCodec.decode(bytes).getOrElse(fail("None")), w, 3, f,
      "long runs")
  }

  // ------------------------------------- MH (2) and G3/T.4 (3) spellings

  test("Modified Huffman (compression 2): byte-aligned 1D rows round-trip") {
    for (seed <- 1 to 4) {
      val (w, h) = (23 + 7 * seed, 6)
      val f = pattern(seed + 40) _
      val bytes = TiffCodec.encodeTiffMh(w, h, f, bigEndian = seed % 2 == 0)
      assertImage(TiffCodec.decode(bytes).getOrElse(fail(s"mh $seed: None")),
        w, h, f, s"mh seed $seed")
    }
  }

  test("Group 3 / T.4: 1D and alternating-2D spellings round-trip") {
    for (seed <- 1 to 4; twoD <- Seq(false, true)) {
      val (w, h) = (31 + 5 * seed, 8)
      val f = pattern(seed + 60) _
      val bytes = TiffCodec.encodeTiffG3(w, h, f, twoD = twoD,
        rowsPerStrip = if (seed % 2 == 0) 3 else 0)
      assertImage(TiffCodec.decode(bytes).getOrElse(
        fail(s"g3 $seed twoD=$twoD: None")), w, h, f, s"g3 $seed twoD=$twoD")
    }
  }

  test("T4Options/T6Options uncompressed-mode bits take the labeled stub") {
    val g3 = TiffCodec.encodeTiffG3(16, 4, (x, _) => x % 3 == 0)
    // patch T4Options (tag 292) from 0 to 2 — uncompressed mode allowed
    val n3 = (g3(8) & 0xff) | ((g3(9) & 0xff) << 8)
    var patched: Array[Byte] = null
    for (e <- 0 until n3) {
      val at = 10 + 12 * e
      if (((g3(at) & 0xff) | ((g3(at + 1) & 0xff) << 8)) == 292) {
        patched = g3.clone(); patched(at + 8) = 2
      }
    }
    assert(patched != null)
    assert(TiffCodec.decode(patched).isEmpty)
  }

  // ------------------------------------------------ ImageIO cross-check

  private def imageIoWriteFax(w: Int, h: Int, compression: String,
      black: (Int, Int) => Boolean): Array[Byte] = {
    import javax.imageio._
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_BINARY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, if (black(x, y)) 0 else 1)
    val wr = ImageIO.getImageWritersByFormatName("tiff").next()
    val p = wr.getDefaultWriteParam
    p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionType(compression)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    wr.setOutput(ios)
    wr.write(null, new IIOImage(img, null, null), p)
    ios.close()
    bos.toByteArray
  }

  test("our decoder reads ImageIO-written T.6 (independent tables)") {
    for (seed <- 1 to 4) {
      val (w, h) = (53 + seed, 9)
      val f = pattern(seed + 20) _
      val bytes = imageIoWriteFax(w, h, "CCITT T.6", f)
      // TYPE_BYTE_BINARY + CCITT writes photometric 0, sample 0 = black
      // per the fax convention ImageIO follows
      val img = TiffCodec.decode(bytes).getOrElse(fail(s"seed $seed: None"))
      assertImage(img, w, h, f, s"imageio->ours seed $seed")
    }
  }

  test("our decoder reads ImageIO-written CCITT RLE and T.4 streams") {
    for ((comp, label) <- Seq("CCITT RLE" -> "rle", "CCITT T.4" -> "t4");
         seed <- 1 to 3) {
      val (w, h) = (37 + 4 * seed, 7)
      val f = pattern(seed + 80) _
      val bytes = imageIoWriteFax(w, h, comp, f)
      val img = TiffCodec.decode(bytes)
        .getOrElse(fail(s"$label $seed: None"))
      assertImage(img, w, h, f, s"imageio-$label seed $seed")
    }
  }

  test("ImageIO reads our T.6, MH, and T.4 output (encoder conformance)") {
    for (seed <- 5 to 7; comp <- 0 to 3) {
      val (w, h) = (29 + 3 * seed, 7)
      val f = pattern(seed + 10 * comp) _
      val bytes = comp match {
        case 0 => TiffCodec.encodeTiffG4(w, h, f)
        case 1 => TiffCodec.encodeTiffMh(w, h, f)
        case 2 => TiffCodec.encodeTiffG3(w, h, f)
        case _ => TiffCodec.encodeTiffG3(w, h, f, twoD = true)
      }
      val back = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(back != null && back.getWidth == w && back.getHeight == h,
        s"comp $comp seed $seed")
      for (y <- 0 until h; x <- 0 until w) {
        // photometric 0: sample 0 = white in TIFF terms, but ImageIO
        // maps WhiteIsZero to gray levels — read via RGB
        val rgb = back.getRGB(x, y) & 0xff
        assert(rgb == (if (f(x, y)) 0 else 255),
          s"ours->imageio comp $comp seed $seed ($x,$y)")
      }
    }
  }

  // ------------------------------------------------------ hostile input

  test("truncated stream, mid-image EOFB, and run overflow refuse") {
    val good = TiffCodec.encodeTiffG4(40, 10, pattern(3))
    // find the strip data (single strip, last bytes) and truncate inside
    val cut = java.util.Arrays.copyOf(good, good.length - 6)
    // the IFD still parses (it precedes the data) but the strip count
    // now exceeds the file → decode must refuse, not throw
    assert(TiffCodec.decode(cut).isEmpty)
    // corrupt the coded bits: flood with zeros → EOFB mid-image
    val zeroed = good.clone()
    java.util.Arrays.fill(zeroed, good.length - 12, good.length, 0.toByte)
    assert(TiffCodec.decode(zeroed).isEmpty ||
      TiffCodec.decode(zeroed).nonEmpty) // refuse or survive, never throw
  }

  test("T6Options extensions (uncompressed mode) take the labeled stub") {
    val good = TiffCodec.encodeTiffG4(16, 4, (x, _) => x % 2 == 0)
    // patch the T6Options LONG value from 0 to 2 (uncompressed allowed):
    // little-endian IFD: find tag 293 entry and set its value field
    var i = 8
    val n = (good(8) & 0xff) | ((good(9) & 0xff) << 8)
    var patched: Array[Byte] = null
    for (e <- 0 until n) {
      val at = 10 + 12 * e
      val tag = (good(at) & 0xff) | ((good(at + 1) & 0xff) << 8)
      if (tag == 293) {
        patched = good.clone()
        patched(at + 8) = 2
      }
    }
    assert(patched != null, "T6Options entry present in encoder output")
    assert(TiffCodec.decode(patched).isEmpty)
  }
}
