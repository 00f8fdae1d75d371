package graft.operators

import graft.SparkFunSuite

/** Round-trip + adversarial coverage for the zero-dependency AVI/DIB
  * video codec. There is no JDK AVI reader to cross-check against, but
  * each DIB frame raster is byte-identical to a BMP pixel array — so
  * every frame is cross-checked against the ImageIO-anchored BMP path
  * (PixelCodec.encodeBmp of the same generator → ImageIO decode), which
  * ties the AVI row/stride/BGR arithmetic to an independent decoder.
  */
class VideoCodecSpec extends SparkFunSuite {

  private def px(f: Int, x: Int, y: Int): (Int, Int, Int) =
    (10 + 9 * f + 3 * x + 5 * y, 20 + 6 * f + 5 * x + 2 * y,
      30 + 4 * f + 2 * x + 7 * y)

  private def imageIoBmpRgb(w: Int, h: Int, f: Int): Array[Byte] = {
    val bmp = PixelCodec.encodeBmp(w, h, (x, y) => px(f, x, y))
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bmp))
    assert(img != null)
    val out = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val argb = img.getRGB(x, y)
      val i = (y * w + x) * 3
      out(i) = ((argb >> 16) & 0xff).toByte
      out(i + 1) = ((argb >> 8) & 0xff).toByte
      out(i + 2) = (argb & 0xff).toByte
    }
    out
  }

  test("all frames round-trip exactly at stride 1; ImageIO-anchored BMP agrees") {
    // width 5 → DIB rows pad 15 → 16 bytes (stride arithmetic exercised)
    val bytes = VideoCodec.encodeAvi(5, 4, 5, px)
    val clip = VideoCodec.decodeSampled(bytes, 1).get
    assert(clip.width == 5 && clip.height == 4 && clip.totalFrames == 5)
    assert(clip.sampledIdx.sameElements(0 until 5))
    for (f <- 0 until 5)
      assert(clip.frames(f).rgb.sameElements(imageIoBmpRgb(5, 4, f)),
        s"frame $f diverges from the ImageIO-anchored BMP raster")
  }

  test("sampling materializes exactly every stride-th frame, in order") {
    val bytes = VideoCodec.encodeAvi(4, 3, 7, px)
    val s2 = VideoCodec.decodeSampled(bytes, 2).get
    assert(s2.totalFrames == 7)
    assert(s2.sampledIdx.sameElements(Array(0, 2, 4, 6)))
    // each sampled frame is the RIGHT frame, not an off-by-one neighbor
    for ((idx, i) <- s2.sampledIdx.zipWithIndex)
      assert(s2.frames(i).rgb.sameElements(imageIoBmpRgb(4, 3, idx)),
        s"sampled position $i should hold frame $idx")
    val s10 = VideoCodec.decodeSampled(bytes, 10).get
    assert(s10.sampledIdx.sameElements(Array(0)) && s10.frames.length == 1)
  }

  test("the walk skips idx1 and survives injected JUNK/odd-size chunks") {
    val plain = VideoCodec.encodeAvi(4, 3, 3, px)
    // splice a 5-byte JUNK chunk (odd → pad) right after 'AVI '
    val out = new java.io.ByteArrayOutputStream()
    out.write(plain, 0, 12)
    out.write("JUNK".getBytes("US-ASCII"))
    out.write(Array[Byte](5, 0, 0, 0))
    out.write(Array[Byte](1, 2, 3, 4, 5, 0)) // 5 payload + 1 pad
    out.write(plain, 12, plain.length - 12)
    val clip = VideoCodec.decodeSampled(out.toByteArray, 1)
    assert(clip.isDefined, "walk lost alignment at an odd-size JUNK chunk")
    assert(clip.get.totalFrames == 3)
    assert(clip.get.frames(2).rgb.sameElements(imageIoBmpRgb(4, 3, 2)))
  }

  test("animated GIF samples frames exactly; ImageIO's frame reader agrees") {
    val bytes = VideoCodec.encodeGifAnim(6, 4, 5, px)
    val clip = VideoCodec.decodeSampled(bytes, 2).get
    assert(clip.container == "gif")
    assert(clip.totalFrames == 5 && clip.sampledIdx.sameElements(Array(0, 2, 4)))
    // independent cross-check: ImageIO's GIF reader pulls frame k directly
    val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    reader.setInput(javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes)))
    assert(reader.getNumImages(true) == 5)
    for ((fi, pos) <- clip.sampledIdx.zipWithIndex) {
      val ref = reader.read(fi)
      for (y <- 0 until 4; x <- 0 until 6) {
        val argb = ref.getRGB(x, y)
        val o = (y * 6 + x) * 3
        assert((clip.frames(pos).rgb(o) & 0xff) == ((argb >> 16) & 0xff) &&
          (clip.frames(pos).rgb(o + 1) & 0xff) == ((argb >> 8) & 0xff) &&
          (clip.frames(pos).rgb(o + 2) & 0xff) == (argb & 0xff),
          s"frame $fi pixel ($x,$y) disagrees with ImageIO")
      }
    }
    reader.dispose()
    // skipped frames cost no LZW work but still count toward total
    val s5 = VideoCodec.decodeSampled(bytes, 5).get
    assert(s5.totalFrames == 5 && s5.frames.length == 1)
  }

  test("single-frame GIFs decode as 1-frame clips; flipped-transparency bit composites") {
    // flipping the transparency bit on an otherwise-standalone GIF now
    // routes it through the COMPOSITED tier (round 16) instead of the
    // stub: transparent index 0 pixels show the background (black — no
    // global table), everything else decodes normally
    val anim = VideoCodec.encodeGifAnim(4, 3, 2, px)
    val gceAt = {
      var i = 13; var at = -1
      while (at < 0 && i + 1 < anim.length) {
        if ((anim(i) & 0xff) == 0x21 && (anim(i + 1) & 0xff) == 0xf9) at = i
        else i += 1
      }
      at
    }
    assert(gceAt > 0)
    val transparent = anim.clone()
    transparent(gceAt + 3) = (transparent(gceAt + 3) | 1).toByte
    val composited = VideoCodec.decodeSampled(transparent, 1).get
    assert(composited.totalFrames == 2)
    val plain = VideoCodec.decodeSampled(anim, 1).get
    // frame 0: identical except palette-index-0 pixels, which are black
    val f0 = composited.frames(0).rgb
    val p0 = plain.frames(0).rgb
    var holes = 0
    for (i <- f0.indices by 3) {
      val isHole = f0(i) == 0 && f0(i + 1) == 0 && f0(i + 2) == 0 &&
        !(p0(i) == 0 && p0(i + 1) == 0 && p0(i + 2) == 0)
      if (isHole) holes += 1
      else assert(f0(i) == p0(i) && f0(i + 1) == p0(i + 1) && f0(i + 2) == p0(i + 2))
    }
    assert(holes >= 1, "no transparent hole rendered — index 0 must exist in a 4x3 gradient")
    // a plain single-frame GIF is a 1-frame video (and a still image)
    val still = PixelCodec.encodeGif(4, 3, (x, y) => px(0, x, y))
    val clip = VideoCodec.decodeSampled(still, 1).get
    assert(clip.totalFrames == 1 && clip.container == "gif")
    assert(clip.frames(0).rgb.sameElements(
      PixelCodec.decode(still).get.rgb))
  }

  private def rgbAt(f: graft.operators.PixelCodec.PixelImage, x: Int, y: Int): (Int, Int, Int) = {
    val o = (y * f.width + x) * 3
    ((f.rgb(o) & 0xff), (f.rgb(o + 1) & 0xff), (f.rgb(o + 2) & 0xff))
  }

  test("composited GIF: partial frames accumulate on the canvas (disposal 1)") {
    import VideoCodec.GifFrame
    // frame 0: full 8x6 canvas of solid base color; frames 1..3: a 2x2
    // rect marching right along the top, disposal 1 (leave) — frame k
    // shows ALL rects 1..k
    val base = (10, 20, 30)
    val rect = (200, 100, 50)
    val frames = GifFrame(0, 0, 8, 6, 1, (_, _) => base) +:
      (1 to 3).map(k => GifFrame(2 * (k - 1), 0, 2, 2, 1, (_, _) => rect))
    val bytes = VideoCodec.encodeGifAnimComposited(8, 6, frames)
    val clip = VideoCodec.decodeSampled(bytes, 1).get
    assert(clip.totalFrames == 4 && clip.container == "gif")
    // frame 3 (index 3): rects at x∈[0,6) y∈[0,2) all painted; below them base
    val last = clip.frames(3)
    for (x <- 0 until 6) assert(rgbAt(last, x, 0) == rect, s"x=$x")
    assert(rgbAt(last, 6, 0) == base)
    assert(rgbAt(last, 0, 3) == base)
    // frame 1 shows only the FIRST rect
    val f1 = clip.frames(1)
    assert(rgbAt(f1, 0, 0) == rect && rgbAt(f1, 2, 0) == base)
    // sampling at stride 3 still reflects full history (frames 0 and 3)
    val s3 = VideoCodec.decodeSampled(bytes, 3).get
    assert(s3.sampledIdx.sameElements(Array(0, 3)))
    assert(s3.frames(1).rgb.sameElements(last.rgb))
  }

  test("composited GIF: disposal 2 restores the region to the background color") {
    import VideoCodec.GifFrame
    val bgc = (7, 14, 21)
    val base = (100, 110, 120)
    val flash = (250, 10, 10)
    val frames = Seq(
      GifFrame(0, 0, 6, 4, 1, (_, _) => base),
      GifFrame(1, 1, 2, 2, 2, (_, _) => flash), // disposal 2: restore bg AFTER display
      GifFrame(4, 0, 1, 1, 1, (_, _) => flash))
    val bytes = VideoCodec.encodeGifAnimComposited(6, 4, frames,
      bgIndexColor = Some(bgc))
    val clip = VideoCodec.decodeSampled(bytes, 1).get
    // while displayed (frame 1), the flash rect is visible over base
    assert(rgbAt(clip.frames(1), 1, 1) == flash)
    assert(rgbAt(clip.frames(1), 0, 0) == base)
    // frame 2: the flashed region was restored to the BACKGROUND color
    // (not to base — disposal 2 is restore-to-background, not undo)
    assert(rgbAt(clip.frames(2), 1, 1) == bgc)
    assert(rgbAt(clip.frames(2), 0, 0) == base)
    assert(rgbAt(clip.frames(2), 4, 0) == flash)
  }

  test("composited GIF: disposal 3 restores the pre-frame canvas") {
    import VideoCodec.GifFrame
    val base = (60, 70, 80)
    val flash = (240, 240, 0)
    val frames = Seq(
      GifFrame(0, 0, 5, 5, 1, (_, _) => base),
      GifFrame(0, 0, 5, 5, 3, (_, _) => flash), // full-canvas flash, then undo
      GifFrame(0, 0, 1, 1, 1, (_, _) => flash))
    val bytes = VideoCodec.encodeGifAnimComposited(5, 5, frames)
    val clip = VideoCodec.decodeSampled(bytes, 1).get
    assert(rgbAt(clip.frames(1), 2, 2) == flash) // displayed
    assert(rgbAt(clip.frames(2), 2, 2) == base) // restored, then 1px painted
    assert(rgbAt(clip.frames(2), 0, 0) == flash)
  }

  test("composited GIF: transparent pixels leave the canvas showing through") {
    import VideoCodec.GifFrame
    val base = (0, 128, 0)
    val ring = (200, 0, 200)
    val hole = (1, 2, 3) // sentinel, not otherwise used
    val frames = Seq(
      GifFrame(0, 0, 6, 6, 1, (_, _) => base),
      // 3x3 overlay whose center pixel is transparent
      GifFrame(1, 1, 3, 3, 1,
        (x, y) => if (x == 1 && y == 1) hole else ring,
        transparentColor = Some(hole)))
    val bytes = VideoCodec.encodeGifAnimComposited(6, 6, frames)
    val clip = VideoCodec.decodeSampled(bytes, 1).get
    assert(rgbAt(clip.frames(1), 1, 1) == ring)
    assert(rgbAt(clip.frames(1), 2, 2) == base, "transparent center must show the canvas")
    assert(rgbAt(clip.frames(1), 3, 3) == ring)
  }

  test("compressed, truncated, and hostile payloads decode to None, never throw") {
    val good = VideoCodec.encodeAvi(4, 3, 3, px)
    assert(VideoCodec.decodeSampled(null, 1) == None)
    assert(VideoCodec.decodeSampled("MOOV nope".getBytes("US-ASCII"), 1) == None)
    assert(VideoCodec.decodeSampled(good.take(40), 1) == None) // no movi
    assert(VideoCodec.decodeSampled(good.take(good.length - 20), 1) == None)
    assert(VideoCodec.decodeSampled(good, 0) == None) // bad stride
    // a 'dc' chunk whose size ≠ the DIB raster = compressed → stub path
    val compressed = good.clone()
    val moviAt = {
      var i = 12; var at = -1
      while (at < 0 && i + 12 < compressed.length) {
        if (compressed(i) == 'L' && compressed(i + 8) == 'm' &&
            compressed(i + 9) == 'o' && compressed(i + 10) == 'v') at = i
        else i += 1
      }
      at
    }
    assert(moviAt > 0)
    compressed(moviAt + 16) = (compressed(moviAt + 16) - 1).toByte // shrink frame 0
    assert(VideoCodec.decodeSampled(compressed, 1) == None)
    // hostile strf: claims 30000x30000 frames over a tiny payload
    val hostile = good.clone()
    val strfAt = {
      var i = 12; var at = -1
      while (at < 0 && i + 4 < hostile.length) {
        if (hostile(i) == 's' && hostile(i + 1) == 't' && hostile(i + 2) == 'r' &&
            hostile(i + 3) == 'f') at = i
        else i += 1
      }
      at
    }
    hostile(strfAt + 12) = 0x30; hostile(strfAt + 13) = 0x75 // biWidth 30000
    hostile(strfAt + 16) = 0x30; hostile(strfAt + 17) = 0x75 // biHeight 30000
    assert(VideoCodec.decodeSampled(hostile, 1) == None)
  }

  // ------------------------------------------------------- Motion-JPEG

  /** Block-constant grayscale: each 8×8 JPEG block is constant, so the
    * all-ones-quant encoder round-trips bit-exactly (JpegCodec object
    * doc) and frame pixels have a closed form. */
  private def mjPx(f: Int, x: Int, y: Int): (Int, Int, Int) = {
    val v = 10 + 9 * f + 11 * (x / 8)
    (v, v, v)
  }

  test("MJPEG: block-constant frames round-trip exactly; ImageIO agrees per frame") {
    val bytes = VideoCodec.encodeAviMjpeg(16, 8, 5, mjPx, gray = true)
    val clip = VideoCodec.decodeSampled(bytes, 1).get
    assert(clip.container == "mjpg")
    assert(clip.width == 16 && clip.height == 8 && clip.totalFrames == 5)
    assert(clip.sampledIdx.sameElements(0 until 5))
    for (f <- 0 until 5) {
      // closed form: exact block-constant values
      for (y <- 0 until 8; x <- 0 until 16) {
        val (v, _, _) = mjPx(f, x, y)
        val o = (y * 16 + x) * 3
        assert((clip.frames(f).rgb(o) & 0xff) == v, s"frame $f pixel ($x,$y)")
      }
      // independent anchor: ImageIO decodes the same JPEG payload to
      // the same pixels — ties the AVI chunk wiring to a foreign codec
      val payload = JpegCodec.encodeJpeg(16, 8,
        (x, y) => mjPx(f, x, y), gray = true)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      assert(img != null)
      // raster samples, not getRGB: getRGB on TYPE_BYTE_GRAY applies a
      // linear-gray→sRGB conversion (same pitfall JpegCodecSpec pins)
      for (y <- 0 until 8; x <- 0 until 16)
        assert(img.getRaster.getSample(x, y, 0) ==
          (clip.frames(f).rgb((y * 16 + x) * 3) & 0xff))
    }
  }

  test("MJPEG: stride-k sampling decodes only the sampled key frames") {
    val bytes = VideoCodec.encodeAviMjpeg(16, 8, 7, mjPx, gray = true)
    val s2 = VideoCodec.decodeSampled(bytes, 2).get
    assert(s2.totalFrames == 7)
    assert(s2.sampledIdx.sameElements(Array(0, 2, 4, 6)))
    for ((idx, i) <- s2.sampledIdx.zipWithIndex) {
      val (v0, _, _) = mjPx(idx, 0, 0)
      assert((s2.frames(i).rgb(0) & 0xff) == v0,
        s"sampled position $i should hold frame $idx")
    }
    // acceptance is STRIDE-INDEPENDENT for structural damage: every
    // chunk passes the cheap size+SOI check, so a broken SOI on a
    // non-sampled frame refuses at every stride (it used to slip through
    // when the stride skipped it — ADVICE r16)
    def patchFrame1(f: (Array[Byte], Int) => Unit): Array[Byte] = {
      val c = bytes.clone()
      var i = 12
      var frameNo = 0
      var patched = false
      while (!patched && i + 8 <= c.length) {
        if (c(i) == '0' && c(i + 1) == '0' && c(i + 2) == 'd' &&
            c(i + 3) == 'c') {
          if (frameNo == 1) { f(c, i); patched = true } // skipped at stride 2
          frameNo += 1
          val sz = (c(i + 4) & 0xff) | ((c(i + 5) & 0xff) << 8) |
            ((c(i + 6) & 0xff) << 16) | ((c(i + 7) & 0xff) << 24)
          i += 8 + sz + (sz & 1)
        } else i += 1
      }
      assert(patched)
      c
    }
    val noSoi = patchFrame1((c, i) => c(i + 9) = 0) // break the SOI marker
    assert(VideoCodec.decodeSampled(noSoi, 2) == None)
    assert(VideoCodec.decodeSampled(noSoi, 1) == None)
    // …while DEEP corruption (valid SOI, broken segment structure) is
    // only seen by the full decode of SAMPLED frames — skipping really
    // skips the entropy/parse work
    val deep = patchFrame1((c, i) => java.util.Arrays.fill(c, i + 10, i + 24, 0.toByte))
    assert(VideoCodec.decodeSampled(deep, 2).isDefined)
    assert(VideoCodec.decodeSampled(deep, 1) == None) // sampled → real decode → refused
  }

  test("MJPEG: color frames agree with the JPEG codec's own decode") {
    val cpx = (f: Int, x: Int, y: Int) =>
      (40 + 9 * f + 3 * x, 60 + 5 * y, 80 + 2 * x + 2 * y)
    val bytes = VideoCodec.encodeAviMjpeg(10, 6, 3, cpx)
    val clip = VideoCodec.decodeSampled(bytes, 1).get
    assert(clip.container == "mjpg" && clip.totalFrames == 3)
    for (f <- 0 until 3) {
      val direct = JpegCodec.decode(
        JpegCodec.encodeJpeg(10, 6, (x, y) => cpx(f, x, y))).get
      assert(clip.frames(f).rgb.sameElements(direct.rgb),
        s"frame $f diverges from the direct JPEG decode")
    }
  }

  test("composited GIF: a GCE truncated exactly at its transparent-index byte refuses") {
    // [valid composited frames][0x21 0xF9 0x00 0x3B 0x00 0x00] — the
    // pre-scan reads only through b(i+3) (whose 0x3B has the
    // transparency bit set, routing to the composited tier) and the
    // stray 0x3B doubles as a trailer for it; the composited decoder
    // must then bounds-check through b(i+6) before reading the
    // transparent index, not crash on the truncated extension
    import VideoCodec.GifFrame
    val base = VideoCodec.encodeGifAnimComposited(4, 3,
      Seq(GifFrame(0, 0, 4, 3, 1, (x, y) => (10 + x, 20 + y, 30)),
        GifFrame(1, 1, 1, 1, 1, (_, _) => (200, 100, 50))))
    val crafted = base.dropRight(1) ++
      Array[Byte](0x21, 0xf9.toByte, 0x00, 0x3b, 0x00, 0x00)
    assert(VideoCodec.decodeSampled(crafted, 1) == None)
  }

  // ---------------------------------------------------- Microsoft RLE

  private val mrlePal: Array[Int] =
    Array.tabulate(64)(i => (4 * i << 16) | ((3 * i) << 8) | (2 * i))

  test("MRLE: key frame + delta frames composite on the index canvas") {
    import VideoCodec.MrleFrame
    // frame 0 paints the full 10×6 canvas; frame j ≥ 1 paints a 2×2
    // block of color 32+j at a distinct spot, rest shows through
    val base = (x: Int, y: Int) => (x + y * 2) % 32
    val frames = MrleFrame(0, 0, 10, 6, base) +:
      (1 until 5).map(j => MrleFrame(2 * (j - 1), 2, 2, 2, (_, _) => 32 + j))
    val bytes = VideoCodec.encodeAviMrle(10, 6, frames, mrlePal)
    val clip = VideoCodec.decodeSampled(bytes, 1).get
    assert(clip.container == "mrle")
    assert(clip.width == 10 && clip.height == 6 && clip.totalFrames == 5)
    // frame f shows the base canvas with overlays 1..f applied
    for (f <- 0 until 5; y <- 0 until 6; x <- 0 until 10) {
      val overlay = (1 to f).reverse.find(j =>
        x >= 2 * (j - 1) && x < 2 * (j - 1) + 2 && y >= 2 && y < 4)
      val ci = overlay.map(32 + _).getOrElse(base(x, y))
      val o = (y * 10 + x) * 3
      assert((clip.frames(f).rgb(o) & 0xff) == ((mrlePal(ci) >> 16) & 0xff),
        s"frame $f pixel ($x,$y)")
    }
    // stride 2 still composites every frame, then samples 0,2,4
    val s2 = VideoCodec.decodeSampled(bytes, 2).get
    assert(s2.sampledIdx.sameElements(Array(0, 2, 4)))
    val f4 = clip.frames(4).rgb
    assert(s2.frames(2).rgb.sameElements(f4), "stride-2 frame 4 must equal stride-1's")
  }

  test("MRLE: untouched pixels show the zero-initialized canvas through frame 0") {
    import VideoCodec.MrleFrame
    // the very first frame is itself partial: everything outside its
    // rect stays palette index 0 (the defined initial canvas)
    val bytes = VideoCodec.encodeAviMrle(8, 4,
      Seq(MrleFrame(3, 1, 2, 2, (_, _) => 9)), mrlePal)
    val clip = VideoCodec.decodeSampled(bytes, 1).get
    for (y <- 0 until 4; x <- 0 until 8) {
      val inRect = x >= 3 && x < 5 && y >= 1 && y < 3
      val ci = if (inRect) 9 else 0
      assert((clip.frames(0).rgb((y * 8 + x) * 3) & 0xff) ==
        ((mrlePal(ci) >> 16) & 0xff), s"pixel ($x,$y)")
    }
  }

  test("MRLE: corrupt streams and hostile palette indexes refuse, never throw") {
    import VideoCodec.MrleFrame
    val good = VideoCodec.encodeAviMrle(8, 4,
      Seq(MrleFrame(0, 0, 8, 4, (x, y) => (x + y) % 16)), mrlePal)
    // find the frame chunk and stomp its run count to overflow the row
    var i = 12
    var at = -1
    while (at < 0 && i + 8 <= good.length) {
      if (good(i) == '0' && good(i + 1) == '0' && good(i + 2) == 'd' &&
          good(i + 3) == 'c') at = i
      else i += 1
    }
    assert(at > 0)
    val overrun = good.clone(); overrun(at + 8) = 200.toByte
    assert(VideoCodec.decodeSampled(overrun, 1) == None)
    // palette index beyond biClrUsed (64 colors) → refused at snapshot
    val badIx = good.clone(); badIx(at + 9) = 70.toByte
    assert(VideoCodec.decodeSampled(badIx, 1) == None)
    // truncation mid-frame: the movi LIST overruns the buffer
    assert(VideoCodec.decodeSampled(good.take(at + 30), 1) == None)
  }

  test("MJPEG: geometry mismatch and corrupt payloads refuse, never throw") {
    // strf says 16×8 but the frames are 8×8 → None
    val wrongGeom = {
      val good = VideoCodec.encodeAviMjpeg(8, 8, 2, mjPx, gray = true)
      var i = 12
      var at = -1
      while (at < 0 && i + 4 < good.length) {
        if (good(i) == 's' && good(i + 1) == 't' && good(i + 2) == 'r' &&
            good(i + 3) == 'f') at = i
        else i += 1
      }
      good(at + 12) = 16 // biWidth 8 → 16
      good
    }
    assert(VideoCodec.decodeSampled(wrongGeom, 1) == None)
    // truncated container
    val bytes = VideoCodec.encodeAviMjpeg(16, 8, 3, mjPx, gray = true)
    assert(VideoCodec.decodeSampled(bytes.take(bytes.length - 30), 1) == None)
  }
}
