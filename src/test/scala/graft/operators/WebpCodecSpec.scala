package graft.operators

import graft.SparkFunSuite

/** Coverage for the from-scratch VP8L (lossless WebP) codec. The JDK has
  * no WebP reader, so the cross-check discipline differs from the other
  * formats: the encoder exercises only the literal/normal-code path, and
  * every OTHER decoder path — simple codes, zero-bit codes, LZ77 with
  * the 2D distance map, the color cache, and the transforms — is
  * exercised by HAND-CRAFTED bit streams written in this spec directly
  * from the published bitstream specification, with expected pixels
  * computed by hand (not by the code under test).
  */
class WebpCodecSpec extends SparkFunSuite {
  import WebpCodec._

  private def grad(x: Int, y: Int): (Int, Int, Int) =
    (10 + 3 * x + 5 * y, 20 + 5 * x + 2 * y, 30 + 2 * x + 7 * y)

  private def rgbAt(img: PixelCodec.PixelImage, x: Int, y: Int): (Int, Int, Int) = {
    val o = (y * img.width + x) * 3
    (img.rgb(o) & 0xff, img.rgb(o + 1) & 0xff, img.rgb(o + 2) & 0xff)
  }

  private def header(w: BitWriter, width: Int, height: Int): Unit = {
    w.writeBits(width - 1, 14)
    w.writeBits(height - 1, 14)
    w.writeBits(0, 1) // alpha hint
    w.writeBits(0, 3) // version
  }

  /** Normal-code description giving EXACTLY two symbols length 1 (a
    * complete code; canonical: lower symbol → '0', higher → '1'), spelled
    * out one code-length token per alphabet slot through a CL code with
    * lengths {0→1, 1→2, 18→2}. Works for any alphabet size / symbol
    * positions — the shape simple codes can't reach (symbols ≥ 256). */
  private def writeTwoSymbolCode(w: BitWriter, alphabetSize: Int,
      a: Int, b: Int): Unit = {
    w.writeBits(0, 1) // not simple
    w.writeBits(0, 4) // num_code_lengths = 4 (order: 17, 18, 0, 1)
    Seq(0, 2, 1, 2).foreach(l => w.writeBits(l, 3))
    w.writeBits(0, 1) // no token-count cutoff
    // canonical CL: 0 → '0', 1 → '10', 18 → '11'
    for (sym <- 0 until alphabetSize) {
      if (sym == a || sym == b) w.writeCode(2, 2) // length 1
      else w.writeCode(0, 1) // length 0
    }
  }

  test("literal-coded images round-trip exactly (both subtract-green modes)") {
    for ((w, h) <- Seq((1, 1), (4, 3), (7, 5), (16, 2));
         sg <- Seq(false, true)) {
      val bytes = encodeWebpLossless(w, h, grad, subtractGreen = sg)
      val img = PixelCodec.decode(bytes)
      assert(img.isDefined, s"decode failed at ${w}x$h sg=$sg")
      assert(img.get.width == w && img.get.height == h)
      for (y <- 0 until h; x <- 0 until w)
        assert(rgbAt(img.get, x, y) == grad(x, y),
          s"pixel ($x,$y) mismatch at ${w}x$h sg=$sg")
    }
  }

  test("hand-crafted LZ77 backreference through the 2D distance map") {
    // 4x2: four literals, then green symbol 259 = length-prefix 3 →
    // length 4; distance tree is a zero-bit single-symbol code for
    // prefix 0 → distance code 1 → map entry (0,1) → dist = width →
    // the second row copies the first
    val w = new BitWriter
    header(w, 4, 2)
    w.writeBits(0, 1) // no transforms
    w.writeBits(0, 1) // no color cache
    w.writeBits(0, 1) // no meta image
    writeTwoSymbolCode(w, 256 + 24, 42, 259) // green: literal 42 + len-code 3
    writeSingleSymbolCode(w, 10) // red
    writeSingleSymbolCode(w, 20) // blue
    writeSingleSymbolCode(w, 255) // alpha
    writeSingleSymbolCode(w, 0) // distance prefix 0 → code 1
    for (_ <- 0 until 4) w.writeCode(0, 1) // green literal 42 ×4 (r/b/a free)
    w.writeCode(1, 1) // symbol 259: copy length 4, distance via 0-bit code
    val img = WebpCodec.decode(wrapVp8l(w.toBytes))
    assert(img.isDefined, "LZ77 stream rejected")
    for (y <- 0 to 1; x <- 0 to 3)
      assert(rgbAt(img.get, x, y) == ((10, 42, 20)),
        s"LZ77 copy wrong at ($x,$y)")
  }

  test("hand-crafted color-cache reference reproduces the cached pixel") {
    // 4x1: one literal (ARGB ff0a2a14), then three cache references
    val p = 0xff0a2a14 // (a=255, r=10, g=42, b=20)
    val cacheBits = 4
    val idx = (0x1e35a7bd * p) >>> (32 - cacheBits)
    val w = new BitWriter
    header(w, 4, 1)
    w.writeBits(0, 1) // no transforms
    w.writeBits(1, 1); w.writeBits(cacheBits, 4) // color cache
    w.writeBits(0, 1) // no meta image
    writeTwoSymbolCode(w, 256 + 24 + 16, 42, 256 + 24 + idx)
    writeSingleSymbolCode(w, 10) // red
    writeSingleSymbolCode(w, 20) // blue
    writeSingleSymbolCode(w, 255) // alpha
    writeSingleSymbolCode(w, 0) // distance (unused)
    w.writeCode(0, 1) // literal
    for (_ <- 0 until 3) w.writeCode(1, 1) // cache hits
    val img = WebpCodec.decode(wrapVp8l(w.toBytes))
    assert(img.isDefined, "color-cache stream rejected")
    for (x <- 0 to 3) assert(rgbAt(img.get, x, 0) == ((10, 42, 20)))
  }

  test("hand-crafted PREDICTOR transform: T/L modes and mod-256 accumulation") {
    // 4x4, predictor sub-image 1x1 with mode 2 (T). Residual greens on
    // row 0 accumulate via the L edge rule; rows 1-3 are zero residuals
    // so each column repeats its row-0 value via T. Alpha residual 0 +
    // 0xff000000 seed keeps alpha at 255 everywhere.
    val w = new BitWriter
    header(w, 4, 4)
    w.writeBits(1, 1); w.writeBits(0, 2) // transform: PREDICTOR
    w.writeBits(0, 3) // size_bits = 2 → 1x1 sub-image for 4x4
    // sub-image (1 pixel): no cache; all five codes single-symbol so the
    // pixel costs zero bits; mode lives in the green channel
    w.writeBits(0, 1)
    writeSingleSymbolCode(w, 2) // green = predictor mode 2 (T)
    writeSingleSymbolCode(w, 0); writeSingleSymbolCode(w, 0)
    writeSingleSymbolCode(w, 0); writeSingleSymbolCode(w, 0)
    w.writeBits(0, 1) // no more transforms
    // main image: greens via the byte-wide code, everything else 0-bit
    w.writeBits(0, 1) // no cache
    w.writeBits(0, 1) // no meta
    writeByteWideCode(w, 256 + 24) // green residuals
    writeSingleSymbolCode(w, 0) // red residual 0
    writeSingleSymbolCode(w, 0) // blue residual 0
    writeSingleSymbolCode(w, 0) // alpha residual 0
    writeSingleSymbolCode(w, 0) // distance
    val row0 = Seq(7, 3, 200, 250)
    row0.foreach(g => w.writeCode(g, 8))
    for (_ <- 0 until 12) w.writeCode(0, 8) // rows 1-3: zero residuals
    val img = WebpCodec.decode(wrapVp8l(w.toBytes))
    assert(img.isDefined, "predictor stream rejected")
    // row-0 greens accumulate left-to-right mod 256: 7, 10, 210, 204
    val expect = Seq(7, 10, 210, 204)
    for (y <- 0 to 3; x <- 0 to 3)
      assert(rgbAt(img.get, x, y) == ((0, expect(x), 0)),
        s"predictor result wrong at ($x,$y)")
  }

  test("hand-crafted COLOR transform applies the fixed-point deltas") {
    // 1x1 image, color-transform sub-image 1x1 with
    // green_to_red=2 (blue ch), green_to_blue=3 (green ch), red_to_blue=1
    // (red ch); pixel residual (a=ff, r=10, g=64, b=20):
    //   red  = 10 + (2·64 >> 5)            = 14
    //   blue = 20 + (3·64 >> 5) + (1·14 >> 5) = 26
    val w = new BitWriter
    header(w, 1, 1)
    w.writeBits(1, 1); w.writeBits(1, 2) // transform: COLOR
    w.writeBits(0, 3) // size_bits = 2
    w.writeBits(0, 1) // sub-image: no cache
    writeSingleSymbolCode(w, 3) // green ch = green_to_blue
    writeSingleSymbolCode(w, 1) // red ch = red_to_blue
    writeSingleSymbolCode(w, 2) // blue ch = green_to_red
    writeSingleSymbolCode(w, 0) // alpha
    writeSingleSymbolCode(w, 0) // distance
    w.writeBits(0, 1) // no more transforms
    w.writeBits(0, 1); w.writeBits(0, 1) // main: no cache, no meta
    writeSingleSymbolCode(w, 64) // green
    writeSingleSymbolCode(w, 10) // red
    writeSingleSymbolCode(w, 20) // blue
    writeSingleSymbolCode(w, 255) // alpha
    writeSingleSymbolCode(w, 0) // distance
    val img = WebpCodec.decode(wrapVp8l(w.toBytes))
    assert(img.isDefined, "color-transform stream rejected")
    assert(rgbAt(img.get, 0, 0) == ((14, 64, 26)))
  }

  test("hand-crafted COLOR_INDEXING: delta-coded palette + sub-byte packing") {
    // 4x1 image, 3-color palette → widthBits 2 → 4 indices per green
    // byte → packed width 1. Indices [0,1,2,1] pack to green 100.
    // Palette entries are delta-coded: raw entries p0, p1-p0, p2-p1.
    val pal = Seq((10, 20, 30), (40, 25, 90), (200, 180, 17))
    val w = new BitWriter
    header(w, 4, 1)
    w.writeBits(1, 1); w.writeBits(3, 2) // transform: COLOR_INDEXING
    w.writeBits(3 - 1, 8) // palette size 3
    // palette sub-image (3x1): greens/reds/blues via byte-wide codes
    w.writeBits(0, 1) // no cache
    writeByteWideCode(w, 256 + 24)
    writeByteWideCode(w, 256)
    writeByteWideCode(w, 256)
    writeSingleSymbolCode(w, 255) // alpha
    writeSingleSymbolCode(w, 0) // distance
    var prev = (0, 0, 0)
    for (c <- pal) {
      w.writeCode((c._2 - prev._2) & 0xff, 8) // green delta
      w.writeCode((c._1 - prev._1) & 0xff, 8) // red delta
      w.writeCode((c._3 - prev._3) & 0xff, 8) // blue delta
      prev = c
    }
    w.writeBits(0, 1) // no more transforms
    // main packed image (1x1): single-symbol codes, green byte = 100
    w.writeBits(0, 1); w.writeBits(0, 1)
    writeSingleSymbolCode(w, 100) // 0 | 1<<2 | 2<<4 | 1<<6
    writeSingleSymbolCode(w, 0)
    writeSingleSymbolCode(w, 0)
    writeSingleSymbolCode(w, 255)
    writeSingleSymbolCode(w, 0)
    val img = WebpCodec.decode(wrapVp8l(w.toBytes))
    assert(img.isDefined, "palette stream rejected")
    val want = Seq(pal(0), pal(1), pal(2), pal(1))
    for (x <- 0 to 3)
      assert(rgbAt(img.get, x, 0) == want(x), s"palette pixel $x")
  }

  test("image_meta header parse agrees with our VP8L container writer") {
    // the metadata parser and the pixel codec are independent byte
    // walkers — they must see the same geometry in the same bytes
    val bytes = encodeWebpLossless(9, 7, grad)
    assert(graft.functions.ImageMeta.parse(bytes) == (("webp", 9, 7)))
    assert(graft.functions.ImageMeta.parse(
      encodeWebpLossless(1, 1, grad)) == (("webp", 1, 1)))
  }

  test("features dispatch: Multimodal labels lossless WebP rows 'webp'") {
    import spark.implicits._
    val rows = Seq(
      (1L, encodeWebpLossless(4, 3, grad)),
      // header-only VP8 payload (frame tag declares an EMPTY first
      // partition): since round 18 real lossy streams decode (Vp8Codec),
      // but a header with no coded data must still refuse to the stub row
      (2L, graft.functions.ImageMeta.encode("webp", 8, 8)))
      .toDF("doc_id", "content")
    val out = Multimodal.extractFeatures(rows).orderBy("doc_id").collect()
    assert(out(0).getString(3) == "webp")
    var sr = 0L
    for (y <- 0 until 3; x <- 0 until 4) sr += grad(x, y)._1
    assert(out(0).getLong(6) == sr)
    assert(out(1).getString(3) == "stub",
      "header-only VP8 payload must refuse to the stub path")
  }

  test("malformed and lossy payloads decode to None, never throw") {
    val good = encodeWebpLossless(4, 3, grad)
    assert(WebpCodec.decode(null) == None)
    assert(WebpCodec.decode(good.take(20)) == None) // truncated chunk
    assert(WebpCodec.decode(good.take(good.length - 3)) == None) // truncated stream
    assert(WebpCodec.decode(graft.functions.ImageMeta.encode("webp", 8, 8)) == None)
    val badSig = good.clone()
    badSig(20) = 0x2e // not the VP8L signature
    assert(WebpCodec.decode(badSig) == None)
    // over-subscribed CL description (three length-1 codes) → rejected
    val w = new BitWriter
    header(w, 2, 1)
    w.writeBits(0, 1); w.writeBits(0, 1); w.writeBits(0, 1)
    w.writeBits(0, 1) // green: normal code
    w.writeBits(12 - 4, 4)
    Array(1, 0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 1).foreach(l => w.writeBits(l, 3))
    assert(WebpCodec.decode(wrapVp8l(w.toBytes)) == None)
  }
}
