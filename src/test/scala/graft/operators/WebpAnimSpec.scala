package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Animated WebP (VP8X/ANIM/ANMF) frame sampling + compositing.
  * Discipline matches the composited-GIF suite: exact pixel assertions
  * against independently-computed expectations (lossless VP8L frames →
  * bit-exact), the container spec's blend formula recomputed in the
  * test, per-flag disposal/blend behavior, the lossy-VP8 and ALPH
  * spellings, and corrupt-byte refusals. */
class WebpAnimSpec extends AnyFunSuite {
  import VideoCodec.WebpFrame

  private def opaque(r: Int, g: Int, b: Int): Int =
    0xff000000 | ((r & 0xff) << 16) | ((g & 0xff) << 8) | (b & 0xff)

  private def base(x: Int, y: Int): Int =
    opaque(10 + 3 * x + 5 * y, 20 + 5 * x + 2 * y, 30 + 2 * x + 7 * y)

  private def rgbAt(img: PixelCodec.PixelImage, x: Int, y: Int): (Int, Int, Int) = {
    val o = (y * img.width + x) * 3
    (img.rgb(o) & 0xff, img.rgb(o + 1) & 0xff, img.rgb(o + 2) & 0xff)
  }

  test("full-canvas opaque frames round-trip bit-exactly; stride samples 0,2,4") {
    val (w, h) = (10, 6)
    val frames = (0 until 5).map { f =>
      WebpFrame(0, 0, w, h, argb = (x, y) => base(x + f, y))
    }
    val bytes = VideoCodec.encodeWebpAnim(w, h, frames)
    val clip = VideoCodec.decodeSampled(bytes, 2).getOrElse(fail("decode None"))
    assert(clip.container == "webp")
    assert(clip.width == w && clip.height == h && clip.totalFrames == 5)
    assert(clip.sampledIdx.toSeq == Seq(0, 2, 4))
    clip.sampledIdx.zip(clip.frames).foreach { case (f, img) =>
      for (y <- 0 until h; x <- 0 until w) {
        val p = base(x + f, y)
        assert(rgbAt(img, x, y) ==
          (((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)), s"f=$f ($x,$y)")
      }
    }
  }

  test("opaque overlays accumulate on the canvas (alpha-blend of a=255 = overwrite)") {
    val (w, h) = (12, 4)
    val frames = WebpFrame(0, 0, w, h, argb = (x, y) => base(x, y)) +:
      (1 until 4).map { j =>
        WebpFrame(2 * (j - 1), 2, 1, 1, argb = (_, _) => opaque(200, 210, 220))
      }
    val clip = VideoCodec.decodeSampled(
      VideoCodec.encodeWebpAnim(w, h, frames), 1).getOrElse(fail("decode None"))
    assert(clip.totalFrames == 4)
    clip.sampledIdx.zip(clip.frames).foreach { case (f, img) =>
      for (y <- 0 until h; x <- 0 until w) {
        val painted = y == 2 && x % 2 == 0 && x / 2 < f // overlays 1..f so far
        val p = if (painted) opaque(200, 210, 220) else base(x, y)
        assert(rgbAt(img, x, y) ==
          (((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)), s"f=$f ($x,$y)")
      }
    }
  }

  test("fully transparent pixels leave the canvas untouched under alpha-blend, clear it under no-blend") {
    val (w, h) = (4, 2)
    val bg = opaque(1, 2, 3)
    // overlay: left pixel transparent, right pixel opaque white
    def overlay(x: Int, y: Int): Int = if (x == 0) 0 else opaque(255, 255, 255)
    for (blend <- Seq(true, false)) {
      val frames = Seq(
        WebpFrame(0, 0, w, h, argb = (x, y) => base(x, y)),
        WebpFrame(0, 0, 2, 1, blend = blend, argb = overlay))
      val clip = VideoCodec.decodeSampled(
        VideoCodec.encodeWebpAnim(w, h, frames, bgArgb = bg), 1)
        .getOrElse(fail("decode None"))
      val img = clip.frames(1)
      // (0,0): transparent frame pixel. Blend → canvas (base) shows;
      // no-blend → canvas pixel BECOMES transparent → flattens to bg.
      val expect0 = if (blend) base(0, 0) else bg
      assert(rgbAt(img, 0, 0) ==
        (((expect0 >> 16) & 0xff, (expect0 >> 8) & 0xff, expect0 & 0xff)))
      assert(rgbAt(img, 1, 0) == ((255, 255, 255)))
      assert(rgbAt(img, 2, 0) == (((base(2, 0) >> 16) & 0xff,
        (base(2, 0) >> 8) & 0xff, base(2, 0) & 0xff)))
    }
  }

  test("fractional alpha blends by the spec formula (integer spelling recomputed here)") {
    val (w, h) = (2, 2)
    val under = opaque(40, 80, 120)
    val overA = 128
    val over = (overA << 24) | (200 << 16) | (100 << 8) | 60
    val frames = Seq(
      WebpFrame(0, 0, w, h, argb = (_, _) => under),
      WebpFrame(0, 0, w, h, argb = (_, _) => over))
    val clip = VideoCodec.decodeSampled(
      VideoCodec.encodeWebpAnim(w, h, frames), 1).getOrElse(fail("decode None"))
    val img = clip.frames(1)
    // independent spelling: aC=255 → a·255 = 255·aF + 255·(255−aF) = 255²;
    // ch = round((f·aF·255 + c·255·(255−aF)) / 255²)
    def expect(f: Int, c: Int): Int = {
      val a255 = 255L * 255L
      ((f.toLong * overA * 255 + c.toLong * 255 * (255 - overA) + a255 / 2) / a255).toInt
    }
    assert(rgbAt(img, 0, 0) == ((expect(200, 40), expect(100, 80), expect(60, 120))))
  }

  test("dispose-to-background fills the frame rect AFTER display") {
    val (w, h) = (6, 4)
    val bg = opaque(9, 8, 7)
    val frames = Seq(
      WebpFrame(0, 0, w, h, argb = (x, y) => base(x, y)),
      WebpFrame(2, 2, 2, 1, disposeBg = true, argb = (_, _) => opaque(250, 0, 0)),
      WebpFrame(0, 0, 1, 1, argb = (_, _) => opaque(0, 250, 0)))
    val clip = VideoCodec.decodeSampled(
      VideoCodec.encodeWebpAnim(w, h, frames, bgArgb = bg), 1)
      .getOrElse(fail("decode None"))
    // frame 1 snapshot: the red overlay IS displayed
    assert(rgbAt(clip.frames(1), 2, 2) == ((250, 0, 0)))
    assert(rgbAt(clip.frames(1), 3, 2) == ((250, 0, 0)))
    // frame 2 snapshot: the disposed rect shows the background color
    assert(rgbAt(clip.frames(2), 2, 2) == ((9, 8, 7)))
    assert(rgbAt(clip.frames(2), 3, 2) == ((9, 8, 7)))
    assert(rgbAt(clip.frames(2), 0, 0) == ((0, 250, 0)))
    // untouched canvas elsewhere
    assert(rgbAt(clip.frames(2), 4, 3) == (((base(4, 3) >> 16) & 0xff,
      (base(4, 3) >> 8) & 0xff, base(4, 3) & 0xff)))
  }

  private def innerChunk(container: Array[Byte], fourcc: String): Array[Byte] = {
    // extract the first `fourcc` chunk's payload from a RIFF/WEBP container
    var i = 12
    while (i + 8 <= container.length) {
      val size = (container(i + 4) & 0xff) | ((container(i + 5) & 0xff) << 8) |
        ((container(i + 6) & 0xff) << 16) | ((container(i + 7) & 0xff) << 24)
      if (container.slice(i, i + 4).map(_.toChar).mkString == fourcc)
        return java.util.Arrays.copyOfRange(container, i + 8, i + 8 + size)
      i += 8 + size + (size & 1)
    }
    fail(s"no $fourcc chunk")
  }

  test("a lossy VP8 sub-frame decodes inside ANMF exactly as it does standalone") {
    val (w, h) = (32, 16)
    val standalone = Vp8Codec.encodeWebpLossyGray(w, h,
      (bx, by) => 40 + 7 * bx + 11 * by)
    val expected = WebpCodec.decode(standalone).getOrElse(fail("standalone None"))
    val anim = VideoCodec.encodeWebpAnim(w, h, Seq(
      WebpFrame(0, 0, w, h, raw = Seq(("VP8 ", innerChunk(standalone, "VP8 "))))))
    val clip = VideoCodec.decodeSampled(anim, 1).getOrElse(fail("anim None"))
    assert(clip.frames(0).rgb.toSeq == expected.rgb.toSeq)
    // lossy sub-frame ⇒ the clip carries the unverified-probs caveat label
    assert(clip.container == "webp-vp8-unverified-probs")
  }

  test("an ALPH chunk modulates a lossy VP8 sub-frame's blending") {
    val (w, h) = (16, 16)
    val standalone = Vp8Codec.encodeWebpLossyGray(w, h, (_, _) => 200)
    val vp8 = innerChunk(standalone, "VP8 ")
    // alpha: left half transparent, right half opaque
    val alph = WebpCodec.encodeAlphChunk(w, h, (x, _) => if (x < 8) 0 else 255)
    val frames = Seq(
      WebpFrame(0, 0, w, h, argb = (x, y) => base(x, y)),
      WebpFrame(0, 0, w, h, raw = Seq(("ALPH", alph), ("VP8 ", vp8))))
    val clip = VideoCodec.decodeSampled(
      VideoCodec.encodeWebpAnim(w, h, frames), 1).getOrElse(fail("decode None"))
    val img = clip.frames(1)
    assert(rgbAt(img, 3, 5) == (((base(3, 5) >> 16) & 0xff,
      (base(3, 5) >> 8) & 0xff, base(3, 5) & 0xff))) // transparent half
    assert(rgbAt(img, 12, 5) == ((200, 200, 200))) // opaque half
  }

  test("decodeAlph round-trips every filter in both raw and lossless tiers") {
    val (w, h) = (9, 5)
    def plane(x: Int, y: Int): Int = (37 + 11 * x + 23 * y + x * y) % 256
    for (filter <- 0 to 3; lossless <- Seq(false, true)) {
      val chunk = WebpCodec.encodeAlphChunk(w, h, plane, filter, lossless)
      val got = WebpCodec.decodeAlph(chunk, 0, chunk.length, w, h)
        .getOrElse(fail(s"decodeAlph None filter=$filter lossless=$lossless"))
      for (y <- 0 until h; x <- 0 until w)
        assert((got(y * w + x) & 0xff) == plane(x, y),
          s"($x,$y) filter=$filter lossless=$lossless")
    }
  }

  test("refusals: truncation, out-of-canvas frames, missing ANIM, still VP8X, unknown nested chunk") {
    val ok = VideoCodec.encodeWebpAnim(8, 4,
      Seq(WebpFrame(0, 0, 8, 4, argb = (x, y) => base(x, y))))
    assert(VideoCodec.decodeSampled(ok, 1).isDefined)
    // truncation anywhere inside the ANMF → None, never a throw
    for (cut <- Seq(ok.length - 1, ok.length - 20, 40, 25))
      assert(VideoCodec.decodeSampled(ok.take(cut), 1).isEmpty, s"cut=$cut")
    // a frame rect exceeding the canvas
    val tooBig = VideoCodec.encodeWebpAnim(8, 4,
      Seq(WebpFrame(2, 2, 6, 2, argb = (x, y) => base(x, y))))
    // corrupt the stored canvas geometry: shrink VP8X width
    tooBig(24) = 3 // canvas width-1 := 3 → width 4 < frame extents
    assert(VideoCodec.decodeSampled(tooBig, 1).isEmpty)
    // ANMF before any ANIM chunk: excise the ANIM chunk (14 bytes)
    val animOff = 12 + 8 + 10 // after VP8X chunk
    val noAnim = ok.take(animOff) ++ ok.drop(animOff + 14)
    // fix the RIFF size
    val total = noAnim.length - 8
    noAnim(4) = (total & 0xff).toByte; noAnim(5) = ((total >> 8) & 0xff).toByte
    noAnim(6) = ((total >> 16) & 0xff).toByte; noAnim(7) = ((total >> 24) & 0xff).toByte
    assert(VideoCodec.decodeSampled(noAnim, 1).isEmpty)
    // VP8X without the animation flag is a STILL image → not a video
    val still = ok.clone()
    still(20) = (still(20) & ~0x02).toByte
    assert(VideoCodec.decodeSampled(still, 1).isEmpty)
    // an unknown chunk as ANMF frame data
    val junk = VideoCodec.encodeWebpAnim(8, 4,
      Seq(WebpFrame(0, 0, 8, 4, raw = Seq(("JUNK", Array[Byte](1, 2, 3, 4))))))
    assert(VideoCodec.decodeSampled(junk, 1).isEmpty)
    // animations stay refused on the STILL-image surface
    assert(WebpCodec.decode(ok).isEmpty)
    assert(PixelCodec.decode(ok).isEmpty)
  }
}
