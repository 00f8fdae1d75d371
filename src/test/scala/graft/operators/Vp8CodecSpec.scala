package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Lossy WebP (VP8 intra keyframe) decode. The cross-check discipline is
  * the JPEG SOF13-vs-SOF5 one: the SAME pixels encoded through two
  * structurally different bitstream spellings (B_PRED per-4×4 sub-modes
  * with block-type-3 tokens vs 16×16 DC_PRED with the Y2/WHT plane and
  * block-type-0/1 tokens) must decode identically — plus closed-form
  * exactness (DC-only residuals are bit-exact through quant 4 / 8) and
  * corrupt-byte refusals. */
class Vp8CodecSpec extends AnyFunSuite {

  private def gray(id: Long, wMb: Int, hMb: Int): (Int, Int) => Int = {
    val base = (id % 97).toInt
    (bx4: Int, by4: Int) => base + 7 * bx4 + 11 * by4
  }

  private def decodeRgb(b: Array[Byte]): PixelCodec.PixelImage =
    WebpCodec.decode(b).getOrElse(fail("decode returned None"))

  test("B_PRED spelling round-trips a per-4x4-block-constant gradient bit-exactly") {
    for (id <- Seq(0L, 3L, 17L)) {
      val (w, h) = (32, 16)
      val f = gray(id, w / 16, h / 16)
      val bytes = Vp8Codec.encodeWebpLossyGray(w, h, f, spelling = 0)
      val img = decodeRgb(bytes)
      assert(img.width == w && img.height == h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val expect = f(x / 4, y / 4)
          val o = (y * w + x) * 3
          assert((img.rgb(o) & 0xff) == expect, s"R at ($x,$y) id=$id")
          assert((img.rgb(o + 1) & 0xff) == expect, s"G at ($x,$y) id=$id")
          assert((img.rgb(o + 2) & 0xff) == expect, s"B at ($x,$y) id=$id")
          x += 1
        }
        y += 1
      }
    }
  }

  test("random per-4x4-block images round-trip exactly across seeds (bool-coder stress)") {
    // large random residuals swing the arithmetic coder through its
    // carry/renormalization paths far harder than the gradient fixtures
    for (seed <- 1 to 8) {
      val rnd = new scala.util.Random(seed)
      val (w, h) = (64, 32)
      val vals = Array.fill(h / 4, w / 4)(rnd.nextInt(256))
      val f = (bx4: Int, by4: Int) => vals(by4)(bx4)
      val img = decodeRgb(Vp8Codec.encodeWebpLossyGray(w, h, f))
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          assert((img.rgb((y * w + x) * 3) & 0xff) == f(x / 4, y / 4),
            s"seed=$seed ($x,$y)")
          x += 1
        }
        y += 1
      }
    }
  }

  test("spelling agreement: B_PRED vs 16x16+Y2 decode the same per-MB-constant image identically") {
    val (w, h) = (48, 32)
    // constant per 16x16 MB so both spellings can express it
    val f = (bx4: Int, by4: Int) => 40 + 23 * (bx4 / 4) + 31 * (by4 / 4)
    val a = Vp8Codec.encodeWebpLossyGray(w, h, f, spelling = 0)
    val b = Vp8Codec.encodeWebpLossyGray(w, h, f, spelling = 1)
    // genuinely different bitstreams...
    assert(!java.util.Arrays.equals(a, b))
    val ia = decodeRgb(a)
    val ib = decodeRgb(b)
    // ...same pixels, and both exact
    assert(java.util.Arrays.equals(ia.rgb, ib.rgb))
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        assert((ia.rgb((y * w + x) * 3) & 0xff) == f(x / 4, y / 4))
        x += 1
      }
      y += 1
    }
  }

  test("loop filter plumbing: any level is a no-op on a constant image (flat edges never filter)") {
    val f = (_: Int, _: Int) => 77
    for (lvl <- Seq(0, 10, 40, 63)) {
      val img = decodeRgb(Vp8Codec.encodeWebpLossyGray(16, 16, f, filterLevel = lvl))
      assert(img.rgb.forall(b => (b & 0xff) == 77), s"level $lvl")
    }
  }

  test("corrupt and unsupported payloads refuse with None, never throw") {
    val good = Vp8Codec.encodeWebpLossyGray(16, 16, (_, _) => 50)
    // truncation at every prefix length must be a clean refusal or a
    // successful decode of a still-complete stream — never an exception
    for (cut <- Seq(5, 12, 20, 25, good.length - 3))
      WebpCodec.decode(good.take(cut)) // must not throw
    assert(WebpCodec.decode(good.take(25)).isEmpty)
    // bad start code
    val badStart = good.clone()
    badStart(20 + 3) = 0x00 // 0x9d → 0x00 inside the VP8 payload
    assert(WebpCodec.decode(badStart).isEmpty)
    // interframe tag (frame_type bit set) → labeled refusal
    val inter = good.clone()
    inter(20) = (inter(20) | 1).toByte
    assert(WebpCodec.decode(inter).isEmpty)
    // garbage
    assert(WebpCodec.decode(Array.fill[Byte](64)(0x41)).isEmpty)
  }

  test("VP8X extended container: still image with a leading VP8X chunk decodes") {
    val f = (bx4: Int, by4: Int) => 30 + 5 * bx4 + 3 * by4
    val plain = Vp8Codec.encodeWebpLossyGray(16, 16, f)
    // rebuild: RIFF/WEBP [ VP8X(10 bytes) VP8 ... ]
    val vp8Payload = plain.drop(20) // the VP8 chunk payload
    val vp8x = new Array[Byte](10) // canvas fields; walker skips them
    val inner = new java.io.ByteArrayOutputStream()
    def chunk(tag: String, payload: Array[Byte]): Unit = {
      inner.write(tag.getBytes("ASCII"))
      val n = payload.length
      inner.write(Array[Byte]((n & 0xff).toByte, ((n >> 8) & 0xff).toByte,
        ((n >> 16) & 0xff).toByte, ((n >> 24) & 0xff).toByte))
      inner.write(payload)
      if ((n & 1) == 1) inner.write(0)
    }
    chunk("VP8X", vp8x)
    chunk("VP8 ", vp8Payload)
    val body = inner.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes("ASCII"))
    val total = body.length + 4
    out.write(Array[Byte]((total & 0xff).toByte, ((total >> 8) & 0xff).toByte,
      ((total >> 16) & 0xff).toByte, ((total >> 24) & 0xff).toByte))
    out.write("WEBP".getBytes("ASCII"))
    out.write(body)
    val img = decodeRgb(out.toByteArray)
    assert(img.width == 16 && img.height == 16)
    assert((img.rgb(0) & 0xff) == f(0, 0))
  }

  test("PixelCodec dispatch and feature extraction see lossy WebP as a real decode") {
    val f = (bx4: Int, by4: Int) => 60 + bx4 + by4
    val bytes = Vp8Codec.encodeWebpLossyGray(32, 32, f)
    val img = PixelCodec.decode(bytes).getOrElse(fail("PixelCodec dispatch failed"))
    val feats = PixelCodec.features(img, 4)
    // closed form: sum over 4x4 blocks of 16 * value, all channels equal
    var expect = 0L
    for (by <- 0 until 8; bx <- 0 until 8) expect += 16L * f(bx, by)
    assert(feats.sumR == expect)
    assert(feats.sumG == expect)
    assert(feats.sumB == expect)
  }
}
