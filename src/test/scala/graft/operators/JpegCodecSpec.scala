package graft.operators

import graft.SparkFunSuite
import graft.operators.PixelCodec._

/** Round-trip + adversarial coverage for the from-scratch baseline JPEG
  * codec, with the same INDEPENDENT cross-check discipline as
  * PixelCodecSpec: the JDK's own ImageIO JPEG reader/writer (java.desktop)
  * must agree with our decoder — on our encoder's bytes (exactly, for
  * DC-only block-constant images; within IDCT-rounding tolerance
  * otherwise) and on ImageIO's OWN encoded bytes (which exercise the
  * standard Annex-K Huffman tables, real quant tables, and 4:2:0 chroma
  * subsampling — none of which our fixture encoder emits).
  */
class JpegCodecSpec extends SparkFunSuite {

  /** Per-8×8-block-constant grayscale gradient (the q47 fixture shape):
    * with all-ones quant tables every block is DC-only → bit-exact. */
  private def blockGray(base: Int)(x: Int, y: Int): (Int, Int, Int) = {
    val v = base + 7 * (x / 8) + 11 * (y / 8)
    (v, v, v)
  }

  private def imageIoRgb(bytes: Array[Byte]): Array[Byte] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO could not decode the JPEG bytes")
    val gray = img.getColorModel.getNumComponents == 1
    val out = new Array[Byte](img.getWidth * img.getHeight * 3)
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
      val i = (y * img.getWidth + x) * 3
      if (gray) {
        // getRGB on TYPE_BYTE_GRAY converts linear-gray→sRGB (a gamma
        // curve, not the JPEG sample values) — read the raw raster
        val v = img.getRaster.getSample(x, y, 0).toByte
        out(i) = v; out(i + 1) = v; out(i + 2) = v
      } else {
        val argb = img.getRGB(x, y)
        out(i) = ((argb >> 16) & 0xff).toByte
        out(i + 1) = ((argb >> 8) & 0xff).toByte
        out(i + 2) = (argb & 0xff).toByte
      }
    }
    out
  }

  private def maxAbsDiff(a: Array[Byte], b: Array[Byte]): Int = {
    assert(a.length == b.length, s"pixel buffers differ: ${a.length} vs ${b.length}")
    a.indices.foldLeft(0)((m, i) => math.max(m, math.abs((a(i) & 0xff) - (b(i) & 0xff))))
  }

  test("block-constant grayscale round-trips bit-exactly (multi-MCU DC chain)") {
    // 3×2 MCUs: exercises cross-block DC-diff prediction and MCU raster
    // order; every value is exact, so ImageIO must agree exactly too
    for (base <- Seq(0, 40, 96)) {
      val bytes = JpegCodec.encodeJpeg(24, 16, blockGray(base), gray = true)
      val img = decode(bytes).get
      assert(img.width == 24 && img.height == 16)
      for (y <- 0 until 16; x <- 0 until 24) {
        val want = base + 7 * (x / 8) + 11 * (y / 8)
        val got = img.rgb((y * 24 + x) * 3) & 0xff
        assert(got == want, s"base=$base pixel ($x,$y): got $got want $want")
        assert((img.rgb((y * 24 + x) * 3 + 1) & 0xff) == want)
        assert((img.rgb((y * 24 + x) * 3 + 2) & 0xff) == want)
      }
      assert(imageIoRgb(bytes).sameElements(img.rgb),
        s"ImageIO disagrees with JpegCodec on DC-only bytes (base=$base)")
    }
  }

  test("non-multiple-of-8 shapes round-trip exactly when blocks stay constant") {
    // 10×6 → one 2×1-MCU row with edge replication; constant image is
    // still DC-only after padding, so decode is exact at every shape
    for ((w, h) <- Seq((10, 6), (1, 1), (8, 3), (3, 8), (17, 9))) {
      val bytes = JpegCodec.encodeJpeg(w, h, (_, _) => (77, 77, 77), gray = true)
      val img = decode(bytes).get
      assert(img.width == w && img.height == h)
      assert(img.rgb.forall(b => (b & 0xff) == 77), s"non-constant at ${w}x$h")
      assert(imageIoRgb(bytes).sameElements(img.rgb))
    }
  }

  test("arbitrary grayscale: our decode within quantization rounding; ImageIO agrees") {
    val rnd = new scala.util.Random(47)
    val w = 19; val h = 13
    val px = Array.fill(h, w)(rnd.nextInt(256))
    val bytes = JpegCodec.encodeJpeg(w, h,
      (x, y) => (px(y)(x), px(y)(x), px(y)(x)), gray = true)
    val img = decode(bytes).get
    // all-ones quant: only coefficient rounding (±0.5 each) survives —
    // worst-case spatial accumulation is a few levels
    var worst = 0
    for (y <- 0 until h; x <- 0 until w)
      worst = math.max(worst,
        math.abs((img.rgb((y * w + x) * 3) & 0xff) - px(y)(x)))
    assert(worst <= 5, s"quality-100 round-trip drifted by $worst levels")
    // ImageIO decodes the SAME coefficients: only IDCT rounding can differ
    assert(maxAbsDiff(imageIoRgb(bytes), img.rgb) <= 2,
      "ImageIO and JpegCodec disagree beyond IDCT rounding on identical bytes")
  }

  test("color 4:4:4: block-constant round-trip within color-convert rounding") {
    val bytes = JpegCodec.encodeJpeg(16, 16, (x, y) =>
      if (x < 8 && y < 8) (200, 30, 60)
      else if (x >= 8 && y < 8) (10, 180, 90)
      else (50, 60, 220))
    val img = decode(bytes).get
    for (y <- 0 until 16; x <- 0 until 16) {
      val want = if (x < 8 && y < 8) (200, 30, 60)
        else if (x >= 8 && y < 8) (10, 180, 90) else (50, 60, 220)
      val o = (y * 16 + x) * 3
      // RGB→YCbCr→RGB double-rounds: ±2 per channel is the honest bound
      assert(math.abs((img.rgb(o) & 0xff) - want._1) <= 2)
      assert(math.abs((img.rgb(o + 1) & 0xff) - want._2) <= 2)
      assert(math.abs((img.rgb(o + 2) & 0xff) - want._3) <= 2)
    }
    assert(maxAbsDiff(imageIoRgb(bytes), img.rgb) <= 2)
  }

  test("ImageIO-encoded grayscale decodes like ImageIO reads it back") {
    // standard Annex-K Huffman + real quant tables — none of which our
    // encoder writes, so this proves the general decode path
    val rnd = new scala.util.Random(66)
    val img = new java.awt.image.BufferedImage(21, 14,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 14; x <- 0 until 21)
      // raster write: setRGB on TYPE_BYTE_GRAY would gamma-convert
      img.getRaster.setSample(x, y, 0, rnd.nextInt(256))
    val buf = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", buf))
    val ours = decode(buf.toByteArray)
    assert(ours.isDefined, "our decoder rejected an ImageIO-written grayscale JPEG")
    assert(ours.get.width == 21 && ours.get.height == 14)
    assert(maxAbsDiff(imageIoRgb(buf.toByteArray), ours.get.rgb) <= 2,
      "grayscale decode diverges from ImageIO beyond IDCT rounding")
  }

  test("ImageIO-encoded color (4:2:0 subsampling) decodes within upsampling tolerance") {
    // smooth gradient: libjpeg-style triangular upsampling vs our sample
    // replication differ by at most ~the local chroma slope; the Y plane
    // and overall structure must match closely
    val img = new java.awt.image.BufferedImage(24, 18,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 18; x <- 0 until 24)
      img.setRGB(x, y, ((40 + 3 * x) << 16) | ((60 + 2 * y) << 8) | (80 + x + y))
    val buf = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", buf))
    val ours = decode(buf.toByteArray)
    assert(ours.isDefined, "our decoder rejected an ImageIO-written color JPEG")
    assert(ours.get.width == 24 && ours.get.height == 18)
    val ref = imageIoRgb(buf.toByteArray)
    assert(maxAbsDiff(ref, ours.get.rgb) <= 12,
      "4:2:0 decode diverges from ImageIO beyond upsampling-filter tolerance")
    val mean = ours.get.rgb.indices.map(i =>
      math.abs((ref(i) & 0xff) - (ours.get.rgb(i) & 0xff))).sum.toDouble /
      ours.get.rgb.length
    assert(mean <= 2.0, f"mean channel divergence $mean%.2f > 2.0")
  }

  private def imageIoProgressive(img: java.awt.image.BufferedImage): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val buf = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(buf)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    ios.close(); writer.dispose()
    buf.toByteArray
  }

  test("progressive grayscale (SOF2) decodes like ImageIO reads it back") {
    // ImageIO's progressive writer emits the full Annex-G scan script:
    // interleaved DC first + refinement, per-band AC first + refinement
    // passes with EOB runs — all exercised here against its own reader
    val rnd = new scala.util.Random(99)
    val img = new java.awt.image.BufferedImage(21, 14,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 14; x <- 0 until 21)
      img.getRaster.setSample(x, y, 0, rnd.nextInt(256))
    val bytes = imageIoProgressive(img)
    val ours = decode(bytes)
    assert(ours.isDefined, "our decoder rejected an ImageIO progressive JPEG")
    assert(ours.get.width == 21 && ours.get.height == 14)
    assert(maxAbsDiff(imageIoRgb(bytes), ours.get.rgb) <= 2,
      "progressive decode diverges from ImageIO beyond IDCT rounding")
  }

  test("progressive color (4:2:0) decodes within upsampling tolerance") {
    val img = new java.awt.image.BufferedImage(24, 18,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 18; x <- 0 until 24)
      img.setRGB(x, y, ((40 + 3 * x) << 16) | ((60 + 2 * y) << 8) | (80 + x + y))
    val bytes = imageIoProgressive(img)
    val ours = decode(bytes)
    assert(ours.isDefined, "our decoder rejected an ImageIO progressive color JPEG")
    val ref = imageIoRgb(bytes)
    assert(maxAbsDiff(ref, ours.get.rgb) <= 12,
      "progressive 4:2:0 decode diverges beyond upsampling-filter tolerance")
    val mean = ours.get.rgb.indices.map(i =>
      math.abs((ref(i) & 0xff) - (ours.get.rgb(i) & 0xff))).sum.toDouble /
      ours.get.rgb.length
    assert(mean <= 2.0, f"mean channel divergence $mean%.2f > 2.0")
  }

  // ------------------------------------------------- hierarchical (J)

  /** Independent reference: bilinear 2× upsample (J.1.1.2 — even
    * copies, odd (a+b+1)>>1, edge replicate) + per-block delta,
    * computed with none of the codec's machinery. */
  private def hierExpected(hw: Int, hh: Int, half: (Int, Int) => Int,
      delta: (Int, Int) => Int): Array[Int] = {
    val w2 = hw * 2
    val hstep = Array.tabulate(hh, w2) { (y, x) =>
      if (x % 2 == 0) half(x / 2, y)
      else (half(x / 2, y) + half(math.min(x / 2 + 1, hw - 1), y) + 1) >> 1
    }
    Array.tabulate(hh * 2 * w2) { o =>
      val y = o / w2
      val x = o % w2
      val up =
        if (y % 2 == 0) hstep(y / 2)(x)
        else (hstep(y / 2)(x) + hstep(math.min(y / 2 + 1, hh - 1))(x) + 1) >> 1
      val v = up + delta(x / 8, y / 8)
      if (v < 0) 0 else if (v > 255) 255 else v
    }
  }

  test("hierarchical (DHP/EXP/SOF5): upsample + signed corrections, pixel-exact") {
    // half-res constant per 8×8 tile (exercises vertical AND horizontal
    // interpolation seams), full-res checkerboard corrections incl.
    // NEGATIVE deltas (no level shift on the difference signal)
    val (hw, hh) = (16, 16)
    val half = (x: Int, y: Int) => 60 + 7 * (x / 8) + 11 * (y / 8)
    val delta = (bx: Int, by: Int) => if ((bx + by) % 2 == 0) -7 else 5
    val bytes = JpegCodec.encodeJpegHier(hw, hh, half, delta)
    val img = decode(bytes).get
    assert(img.width == 32 && img.height == 32)
    val want = hierExpected(hw, hh, half, delta)
    for (y <- 0 until 32; x <- 0 until 32) {
      val got = img.rgb((y * 32 + x) * 3) & 0xff
      assert(got == want(y * 32 + x), s"pixel ($x,$y): $got vs ${want(y * 32 + x)}")
    }
  }

  test("hierarchical ARITHMETIC (SOF9 base + SOF13 diff) decodes identically to Huffman") {
    val (hw, hh) = (16, 8)
    val half = (x: Int, y: Int) => 90 + 7 * (x / 8) + 11 * (y / 8)
    val delta = (bx: Int, by: Int) => 4 * ((bx + by) % 3) - 4 // -4/0/4
    val huff = decode(JpegCodec.encodeJpegHier(hw, hh, half, delta)).get
    val bytes = JpegCodec.encodeJpegHier(hw, hh, half, delta, arith = true)
    // really the arithmetic spelling: SOF13 present, no DHT
    def hasMarker(m: Int): Boolean =
      bytes.sliding(2).exists(p => (p(0) & 0xff) == 0xff && (p(1) & 0xff) == m)
    assert(hasMarker(0xc9) && hasMarker(0xcd) && !hasMarker(0xc4))
    val arith = decode(bytes).get
    assert(arith.width == huff.width && arith.height == huff.height)
    assert(arith.rgb.sameElements(huff.rgb),
      "arithmetic and Huffman hierarchical pyramids must decode identically")
    // and both match the independent upsample+delta reference
    val want = hierExpected(hw, hh, half, delta)
    for (o <- want.indices)
      assert((arith.rgb(o * 3) & 0xff) == want(o), s"pixel $o")
  }

  test("hierarchical LOSSLESS refinement (SOF7): ARBITRARY images round-trip bit-exactly") {
    // random full-res pixels — the lossy base is just an approximation,
    // the differential-lossless stage must recover every pixel exactly
    val rnd = new scala.util.Random(7)
    val full = Array.fill(32 * 32)(rnd.nextInt(256))
    val fullF = (x: Int, y: Int) => full(y * 32 + x)
    // block-constant base: the top-left full-res sample of each tile
    val halfF = (x: Int, y: Int) => full((y / 8) * 16 * 32 + (x / 8) * 16)
    val bytes = JpegCodec.encodeJpegHierLossless(16, 16, halfF, fullF)
    val img = decode(bytes).get
    assert(img.width == 32 && img.height == 32)
    for (y <- 0 until 32; x <- 0 until 32)
      assert((img.rgb((y * 32 + x) * 3) & 0xff) == full(y * 32 + x),
        s"pixel ($x,$y)")
    // degenerate: full == upsample(half) → all-zero differences
    val flat = JpegCodec.encodeJpegHierLossless(8, 8, (_, _) => 99, (_, _) => 99)
    assert(decode(flat).get.rgb.forall(v => (v & 0xff) == 99))
    // a SOF7 scan claiming a PREDICTOR (Ss ≠ 0) is refused: the
    // reference plane is the prediction in differential lossless
    val patched = {
      val c = bytes.clone()
      // second SOS: find the last FF DA, set its Ss byte (offset +7)
      var at = -1
      var j = 2
      while (j + 1 < c.length) {
        if ((c(j) & 0xff) == 0xff && (c(j + 1) & 0xff) == 0xda) at = j
        j += 1
      }
      assert(at > 0)
      c(at + 7) = 1 // Ss byte: FF DA len2 ns comp-id comp-tables Ss
      c
    }
    assert(decode(patched) == None)
  }

  test("hierarchical: constant base + zero delta reconstructs the constant") {
    val bytes = JpegCodec.encodeJpegHier(8, 8, (_, _) => 77, (_, _) => 0)
    val img = decode(bytes).get
    assert(img.width == 16 && img.height == 16)
    assert(img.rgb.forall(v => (v & 0xff) == 77))
  }

  test("hierarchical: malformed sequences refuse, never throw") {
    val good = JpegCodec.encodeJpegHier(8, 8, (_, _) => 50, (_, _) => 3)
    // truncation inside the differential frame's entropy data
    assert(decode(good.take(good.length - 10)) == None)
    // a DIFFERENTIAL frame with no DHP sequence: strip the DHP and
    // turn the base frame's SOF0 marker into SOF5 — the differential
    // frame type outside a hierarchical sequence must refuse
    val noDhp = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(good, 0, 2) // SOI
      out.write(good, 15, good.length - 15) // skip the 13-byte DHP
      val b = out.toByteArray
      var j = 2
      var at = -1
      while (at < 0 && j + 1 < b.length) {
        if ((b(j) & 0xff) == 0xff && (b(j + 1) & 0xff) == 0xc0) at = j
        else j += 1
      }
      assert(at > 0)
      b(at + 1) = 0xc5.toByte
      b
    }
    assert(decode(noDhp) == None)
    // EXP with no reference frame yet: DHP then EXP immediately
    val expFirst = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(Array[Byte](0xff.toByte, 0xd8.toByte), 0, 2)
      // DHP 16×16 gray
      out.write(Array[Byte](0xff.toByte, 0xde.toByte, 0, 11, 8, 0, 16, 0, 16,
        1, 1, 0x11, 0), 0, 13)
      out.write(Array[Byte](0xff.toByte, 0xdf.toByte, 0, 3, 0x11), 0, 5)
      out.write(Array[Byte](0xff.toByte, 0xd9.toByte), 0, 2)
      out.toByteArray
    }
    assert(decode(expFirst) == None)
    // geometry mismatch: EXP only doubles horizontally but the SOF5
    // frame declares the full doubled geometry → refused
    val mismatched = {
      val idx = {
        var at = -1
        var j = 2
        while (at < 0 && j + 4 < good.length) {
          if ((good(j) & 0xff) == 0xff && (good(j + 1) & 0xff) == 0xdf) at = j
          else j += 1
        }
        at
      }
      assert(idx > 0)
      val c = good.clone()
      c(idx + 4) = 0x10 // Eh=1, Ev=0
      c
    }
    assert(decode(mismatched) == None)
  }

  test("truncated and corrupt JPEG payloads decode to None, never throw") {
    val good = JpegCodec.encodeJpeg(24, 16, blockGray(40), gray = true)
    assert(decode(good.take(good.length / 2)) == None) // truncated entropy data
    assert(decode(good.take(20)) == None) // truncated in the header walk
    assert(JpegCodec.decode(Array[Byte](0xff.toByte, 0xd8.toByte)) == None)
    // truncated progressive: cut mid-scan → None, not a partial misdecode
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 16; x <- 0 until 16)
      img.getRaster.setSample(x, y, 0, (x * 16 + y) % 256)
    val prog = imageIoProgressive(img)
    assert(decode(prog.take(prog.length / 2)) == None)
    // flip bytes inside the entropy segment: must be None or a valid-size
    // image, never a throw
    val corrupt = good.clone()
    for (j <- good.length - 30 until good.length - 10)
      corrupt(j) = (~corrupt(j)).toByte
    decode(corrupt) match {
      case Some(i) => assert(i.width == 24 && i.height == 16)
      case None => // fine: corruption detected
    }
    // an ARITHMETIC stream with a DRI segment spliced in declares
    // restart intervals its entropy data doesn't contain — the QM
    // coder reports the missing RSTn as an IllegalStateException,
    // which must surface as None, not escape and kill the task
    val arith = JpegCodec.encodeJpeg(24, 16, blockGray(40), gray = true,
      arith = true)
    var sosAt = -1
    var j = 2
    while (sosAt < 0 && j + 1 < arith.length) {
      if ((arith(j) & 0xff) == 0xff && (arith(j + 1) & 0xff) == 0xda) sosAt = j
      else j += 1
    }
    assert(sosAt > 0)
    val withDri = new java.io.ByteArrayOutputStream()
    withDri.write(arith, 0, sosAt)
    withDri.write(Array[Byte](0xff.toByte, 0xdd.toByte, 0, 4, 0, 1), 0, 6)
    withDri.write(arith, sosAt, arith.length - sosAt)
    assert(decode(withDri.toByteArray) == None)
  }

  test("arithmetic (SOF9): block-constant grayscale round-trips bit-exactly") {
    for (base <- Seq(0, 40, 96)) {
      val bytes = JpegCodec.encodeJpeg(24, 16, blockGray(base), gray = true,
        arith = true)
      val img = decode(bytes).get
      assert(img.width == 24 && img.height == 16)
      for (y <- 0 until 16; x <- 0 until 24) {
        val want = base + 7 * (x / 8) + 11 * (y / 8)
        val got = img.rgb((y * 24 + x) * 3) & 0xff
        assert(got == want, s"($x,$y): $got != $want (base $base)")
      }
      // INDEPENDENT conformance: the JDK's ImageIO JPEG reader decodes
      // SOF9 — its pixels must equal the closed form bit-for-bit, which
      // pins our QM coder's interval orientation, byte alignment, Table
      // D.3 transcription, and the whole DC/AC statistical model against
      // an implementation we didn't write (encoder-side proof; ImageIO
      // cannot ENCODE arithmetic, so the decoder side rides the
      // Huffman-spelling equality test below)
      val io = imageIoRgb(bytes)
      assert(java.util.Arrays.equals(io, img.rgb),
        s"ImageIO disagrees with our SOF9 decode (base $base)")
    }
  }

  test("arithmetic (SOF9): arbitrary gray + color decode IDENTICALLY to the Huffman spelling") {
    // same pixels through both entropy spellings: quantized coefficients
    // and the whole downstream pipeline are shared, so the decoded pixel
    // buffers must be BIT-IDENTICAL — a single wrong arithmetic decision
    // desynchronizes the QM decoder and scrambles everything after it
    val rnd = new scala.util.Random(123)
    for (trial <- 1 to 6) {
      val w = 8 + rnd.nextInt(40)
      val h = 8 + rnd.nextInt(24)
      val px0 = Array.tabulate(h, w)((_, _) =>
        (rnd.nextInt(256), rnd.nextInt(256), rnd.nextInt(256)))
      // mix of smooth gradients (long zero runs, small magnitudes) and
      // pure noise (large magnitudes, every category bin)
      def px(x: Int, y: Int): (Int, Int, Int) =
        if (trial % 2 == 0) px0(y)(x)
        else ((x * 3 + y * 5) % 256, (x * 7 + y * 2) % 256, (x + y * 11) % 256)
      for (gray <- Seq(true, false)) {
        val hj = decode(JpegCodec.encodeJpeg(w, h, px, gray = gray)).get
        val aj = decode(JpegCodec.encodeJpeg(w, h, px, gray = gray,
          arith = true)).get
        assert(aj.width == hj.width && aj.height == hj.height)
        assert(java.util.Arrays.equals(aj.rgb, hj.rgb),
          s"trial $trial gray=$gray ${w}x$h: arith pixels != huffman pixels")
      }
    }
  }

  test("arithmetic (SOF9): ImageIO agrees on arbitrary gray and color streams") {
    // arbitrary content drives every model path (all magnitude
    // categories, runs, EOBs, both signs, DC context transitions) —
    // ImageIO's independent arithmetic decoder must agree with ours on
    // the same bytes to within IDCT/color-convert rounding, same
    // tolerances as the Huffman cross-checks above
    val rnd = new scala.util.Random(911)
    val w = 21; val h = 14
    val px = Array.fill(h, w)((rnd.nextInt(256), rnd.nextInt(256), rnd.nextInt(256)))
    val gbytes = JpegCodec.encodeJpeg(w, h,
      (x, y) => { val v = px(y)(x)._1; (v, v, v) }, gray = true, arith = true)
    assert(maxAbsDiff(imageIoRgb(gbytes), decode(gbytes).get.rgb) <= 2,
      "gray SOF9: ImageIO and JpegCodec disagree beyond IDCT rounding")
    val cbytes = JpegCodec.encodeJpeg(w, h, (x, y) => px(y)(x), arith = true)
    assert(maxAbsDiff(imageIoRgb(cbytes), decode(cbytes).get.rgb) <= 3,
      "color SOF9: ImageIO and JpegCodec disagree beyond convert rounding")
  }

  test("progressive arithmetic (SOF10): decodes IDENTICALLY to the sequential spellings") {
    // the four-kind scan script (DC first/refine, AC first/refine)
    // accumulates the SAME quantized coefficients the sequential
    // spellings code in one pass — decoded pixels must be bit-identical;
    // any error in a point transform (DC floor-shift+OR vs AC
    // truncate+add), the refinement EOB gating, or a context offset
    // scrambles the stream from that decision on
    val rnd = new scala.util.Random(77)
    for (trial <- 1 to 4) {
      val w = 8 + rnd.nextInt(33)
      val h = 8 + rnd.nextInt(17)
      val px0 = Array.tabulate(h, w)((_, _) =>
        (rnd.nextInt(256), rnd.nextInt(256), rnd.nextInt(256)))
      def px(x: Int, y: Int): (Int, Int, Int) =
        if (trial % 2 == 0) px0(y)(x)
        else ((x * 5 + y * 3) % 256, (x * 2 + y * 7) % 256, (x * 11 + y) % 256)
      for (gray <- Seq(true, false)) {
        val seqBytes = JpegCodec.encodeJpeg(w, h, px, gray = gray)
        val prog = JpegCodec.encodeJpegProgArith(w, h, px, gray = gray)
        val sj = decode(seqBytes).get
        val pj = decode(prog).get
        assert(pj.width == sj.width && pj.height == sj.height)
        assert(java.util.Arrays.equals(pj.rgb, sj.rgb),
          s"trial $trial gray=$gray ${w}x$h: SOF10 pixels != sequential pixels")
      }
    }
  }

  test("progressive arithmetic (SOF10): block-constant exact; ImageIO agrees") {
    val bytes = JpegCodec.encodeJpegProgArith(24, 16, blockGray(40), gray = true)
    val img = decode(bytes).get
    for (y <- 0 until 16; x <- 0 until 24) {
      val want = 40 + 7 * (x / 8) + 11 * (y / 8)
      assert((img.rgb((y * 24 + x) * 3) & 0xff) == want, s"($x,$y)")
    }
    // INDEPENDENT conformance: the JDK reader decodes SOF10 (probed) —
    // bit-for-bit on the DC-only fixture, IDCT-rounding tolerance on
    // arbitrary content, pinning the whole progressive scan script and
    // both point transforms against an implementation we didn't write
    assert(java.util.Arrays.equals(imageIoRgb(bytes), img.rgb),
      "ImageIO disagrees with our SOF10 decode on the DC-only fixture")
    val rnd = new scala.util.Random(31337)
    val w = 20; val h = 12
    val px = Array.fill(h, w)((rnd.nextInt(256), rnd.nextInt(256), rnd.nextInt(256)))
    val g = JpegCodec.encodeJpegProgArith(w, h,
      (x, y) => { val v = px(y)(x)._1; (v, v, v) }, gray = true)
    assert(maxAbsDiff(imageIoRgb(g), decode(g).get.rgb) <= 2,
      "gray SOF10: ImageIO and JpegCodec disagree beyond IDCT rounding")
    val cb = JpegCodec.encodeJpegProgArith(w, h, (x, y) => px(y)(x))
    assert(maxAbsDiff(imageIoRgb(cb), decode(cb).get.rgb) <= 3,
      "color SOF10: ImageIO and JpegCodec disagree beyond convert rounding")
  }

  test("arithmetic (SOF9): adaptive coder beats our fixed-table Huffman on size") {
    // not a gate on ratio — just evidence the statistics actually adapt
    // (a broken estimation state machine still round-trips but bloats)
    val huff = JpegCodec.encodeJpeg(64, 64, blockGray(30), gray = true)
    val ari = JpegCodec.encodeJpeg(64, 64, blockGray(30), gray = true,
      arith = true)
    assert(ari.length < huff.length,
      s"arith ${ari.length} B not smaller than huffman ${huff.length} B")
  }

  test("arithmetic (SOF9): truncated/corrupt payloads never throw") {
    val good = JpegCodec.encodeJpeg(24, 16, blockGray(40), gray = true,
      arith = true)
    // truncation inside the entropy segment: the QM decoder zero-fills
    // (F.2.2.5) — result is a well-formed image or None, never a throw
    for (cut <- Seq(20, good.length / 2, good.length - 3)) {
      JpegCodec.decode(good.take(cut)) match {
        case Some(i) => assert(i.width == 24 && i.height == 16)
        case None =>
      }
    }
    val corrupt = good.clone()
    for (j <- good.length - 20 until good.length - 5)
      corrupt(j) = (~corrupt(j)).toByte
    JpegCodec.decode(corrupt) match {
      case Some(i) => assert(i.width == 24 && i.height == 16)
      case None =>
    }
  }

  test("lossless (SOF3): ARBITRARY grayscale round-trips bit-exactly under all 7 predictors") {
    // the only JPEG spelling with exact reconstruction of arbitrary
    // pixels: no DCT, no quantization — every predictor path and the
    // category+EXTEND difference coding must be exactly invertible
    val rnd = new scala.util.Random(555)
    for (predictor <- 1 to 7) {
      val w = 5 + rnd.nextInt(30)
      val h = 3 + rnd.nextInt(20)
      val px = Array.fill(h, w)(rnd.nextInt(256))
      val bytes = JpegCodec.encodeJpegLossless(w, h, (x, y) => px(y)(x), predictor)
      val img = decode(bytes).get
      assert(img.width == w && img.height == h)
      for (y <- 0 until h; x <- 0 until w)
        assert((img.rgb((y * w + x) * 3) & 0xff) == px(y)(x),
          s"predictor $predictor ($x,$y)")
      // grayscale fan-out: all three channels identical
      for (i <- 0 until w * h)
        assert(img.rgb(i * 3) == img.rgb(i * 3 + 1) &&
          img.rgb(i * 3) == img.rgb(i * 3 + 2))
    }
    // worst-case content for the difference coder: alternating rails
    val rails = JpegCodec.encodeJpegLossless(16, 4,
      (x, y) => if ((x + y) % 2 == 0) 0 else 255, predictor = 4)
    val rimg = decode(rails).get
    for (y <- 0 until 4; x <- 0 until 16)
      assert((rimg.rgb((y * 16 + x) * 3) & 0xff) ==
        (if ((x + y) % 2 == 0) 0 else 255))
    // truncated lossless payloads never throw
    val cut = rails.take(rails.length / 2)
    JpegCodec.decode(cut) match { case _ => () }
  }

  test("lossless 3-component RGB (SOF3 interleaved): arbitrary pixels bit-exact, no color transform") {
    val rnd = new scala.util.Random(557)
    for (predictor <- Seq(1, 4, 7)) {
      val w = 5 + rnd.nextInt(25)
      val h = 3 + rnd.nextInt(15)
      val px = Array.fill(h, w)(rnd.nextInt(1 << 24))
      val bytes = JpegCodec.encodeJpegLosslessRgb(w, h,
        (x, y) => px(y)(x), predictor)
      val img = decode(bytes).get
      assert(img.width == w && img.height == h)
      for (y <- 0 until h; x <- 0 until w) {
        val o = (y * w + x) * 3
        val v = px(y)(x)
        assert((img.rgb(o) & 0xff) == ((v >> 16) & 0xff), s"R ($x,$y) p$predictor")
        assert((img.rgb(o + 1) & 0xff) == ((v >> 8) & 0xff), s"G ($x,$y)")
        assert((img.rgb(o + 2) & 0xff) == (v & 0xff), s"B ($x,$y)")
      }
      // interleave consistency: each channel of the 3-component stream
      // decodes identically to a SINGLE-component stream of that plane —
      // the per-component predictor state never crosses channels
      for (c <- 0 until 3) {
        val gray = decode(JpegCodec.encodeJpegLossless(w, h,
          (x, y) => (px(y)(x) >> (16 - 8 * c)) & 0xff, predictor)).get
        for (i <- 0 until w * h)
          assert(img.rgb(i * 3 + c) == gray.rgb(i * 3), s"chan $c px $i")
      }
    }
  }

  test("lossless restart intervals (row-aligned DRI): bit-exact; inconsistent DRI refuses") {
    val rnd = new scala.util.Random(558)
    val w = 17
    val h = 11
    val px = Array.fill(h, w)(rnd.nextInt(256))
    for (rows <- Seq(1, 2, 4)) {
      val bytes = JpegCodec.encodeJpegLossless(w, h, (x, y) => px(y)(x),
        predictor = 4, restartRows = rows)
      // the stream really carries DRI + RST markers
      assert(bytes.sliding(2).exists(s =>
        (s(0) & 0xff) == 0xff && (s(1) & 0xff) == 0xdd))
      val img = decode(bytes).get
      for (y <- 0 until h; x <- 0 until w)
        assert((img.rgb((y * w + x) * 3) & 0xff) == px(y)(x),
          s"restartRows=$rows ($x,$y)")
      // spelling agreement: the restarted stream and the plain stream
      // reconstruct the same image
      val plain = decode(JpegCodec.encodeJpegLossless(w, h,
        (x, y) => px(y)(x), predictor = 4)).get
      assert(img.rgb.sameElements(plain.rgb))
    }
    // 3-component + restarts compose
    val cpx = Array.fill(h, w)(rnd.nextInt(1 << 24))
    val cimg = decode(JpegCodec.encodeJpegLosslessRgb(w, h,
      (x, y) => cpx(y)(x), predictor = 4, restartRows = 3)).get
    for (y <- 0 until h; x <- 0 until w)
      assert((cimg.rgb((y * w + x) * 3 + 2) & 0xff) == (cpx(y)(x) & 0xff))
    // a DRI that contradicts where the RST markers actually sit (stream
    // coded at Ri = w, header rewritten to w-1) cannot resync — the
    // decoder refuses, never guesses
    val good = JpegCodec.encodeJpegLossless(w, h, (x, y) => px(y)(x),
      predictor = 4, restartRows = 1)
    val badDri = good.clone()
    val driAt = (0 until badDri.length - 1).find(i =>
      (badDri(i) & 0xff) == 0xff && (badDri(i + 1) & 0xff) == 0xdd).get
    badDri(driAt + 4) = ((w - 1) >> 8).toByte
    badDri(driAt + 5) = ((w - 1) & 0xff).toByte
    assert(JpegCodec.decode(badDri).isEmpty)
  }

  test("MID-ROW lossless restart intervals (round 19): bit-exact in both entropies, all predictors") {
    val rnd = new scala.util.Random(561)
    val w = 17
    val h = 11
    val px = Array.fill(h, w)(rnd.nextInt(256))
    val plain = decode(JpegCodec.encodeJpegLossless(w, h,
      (x, y) => px(y)(x), predictor = 4)).get
    // intervals that start anywhere in a line — including one shorter
    // than a row (multiple restarts per line) and a non-divisor of w
    for (ri <- Seq(5, 7, w - 1, w + 3)) {
      val huff = decode(JpegCodec.encodeJpegLossless(w, h,
        (x, y) => px(y)(x), predictor = 4, restartMcus = ri)).get
      assert(huff.rgb.sameElements(plain.rgb), s"huffman restartMcus=$ri")
      val arith = decode(JpegCodec.encodeJpegLosslessArith(w, h,
        (x, y) => px(y)(x), predictor = 4, restartMcus = ri)).get
      assert(arith.rgb.sameElements(plain.rgb), s"arith restartMcus=$ri")
    }
    // every predictor survives a mid-row reset (the interval's partial
    // first line forces the 1-D fallback mid-row)
    for (pred <- 1 to 7) {
      val img = decode(JpegCodec.encodeJpegLossless(w, h,
        (x, y) => px(y)(x), predictor = pred, restartMcus = 7)).get
      val ref = decode(JpegCodec.encodeJpegLossless(w, h,
        (x, y) => px(y)(x), predictor = pred)).get
      assert(img.rgb.sameElements(ref.rgb), s"predictor $pred")
      val aimg = decode(JpegCodec.encodeJpegLosslessArith(w, h,
        (x, y) => px(y)(x), predictor = pred, restartMcus = 7)).get
      assert(aimg.rgb.sameElements(ref.rgb), s"arith predictor $pred")
    }
    // a row-aligned interval spelled in MCUs is byte-identical to the
    // restartRows spelling — the round-18 path is the aligned special
    // case of the generalized machinery, not a separate code path
    assert(JpegCodec.encodeJpegLossless(w, h, (x, y) => px(y)(x),
      predictor = 4, restartMcus = 2 * w).sameElements(
      JpegCodec.encodeJpegLossless(w, h, (x, y) => px(y)(x),
        predictor = 4, restartRows = 2)))
    assert(JpegCodec.encodeJpegLosslessArith(w, h, (x, y) => px(y)(x),
      predictor = 4, restartMcus = 2 * w).sameElements(
      JpegCodec.encodeJpegLosslessArith(w, h, (x, y) => px(y)(x),
        predictor = 4, restartRows = 2)))
    // 16-bit precision composes with mid-row restarts
    val px16 = Array.fill(h, w)(rnd.nextInt(1 << 16))
    val img16 = decode(JpegCodec.encodeJpegLossless(w, h,
      (x, y) => px16(y)(x), predictor = 7, precision = 16,
      restartMcus = w + 5)).get
    for (y <- 0 until h; x <- 0 until w)
      assert((img16.rgb((y * w + x) * 3) & 0xff) == (px16(y)(x) >> 8),
        s"P16 mid-row ($x,$y)")
  }

  test("hierarchical LOSSLESS refinement (SOF7/SOF15) with restart intervals is bit-exact") {
    // the LAST labeled JPEG restart refusal: restarts inside the
    // differential-lossless stage, both entropies, mid-row intervals
    val rnd = new scala.util.Random(562)
    val (hw, hh) = (8, 8)
    val fullPx = Array.fill(2 * hh, 2 * hw)(rnd.nextInt(256))
    val halfF = (x: Int, y: Int) => 50 + x + 2 * y
    val fullF = (x: Int, y: Int) => fullPx(y)(x)
    val plain = decode(JpegCodec.encodeJpegHierLossless(hw, hh,
      halfF, fullF)).get
    for (ri <- Seq(7, 16, 2 * hw - 3); arith <- Seq(false, true)) {
      val img = decode(JpegCodec.encodeJpegHierLossless(hw, hh,
        halfF, fullF, arith = arith, restartMcus = ri))
        .getOrElse(fail(s"hier ri=$ri arith=$arith: None"))
      assert(img.rgb.sameElements(plain.rgb), s"hier ri=$ri arith=$arith")
      // the refinement recovers the arbitrary full-res image exactly
      for (y <- 0 until 2 * hh; x <- 0 until 2 * hw)
        assert((img.rgb((y * 2 * hw + x) * 3) & 0xff) == fullPx(y)(x),
          s"ri=$ri arith=$arith ($x,$y)")
    }
  }

  test("ARITHMETIC lossless restart intervals (round 18): bit-exact, four-way spelling agreement") {
    val rnd = new scala.util.Random(560)
    val w = 17
    val h = 11
    val px = Array.fill(h, w)(rnd.nextInt(256))
    val plain = decode(JpegCodec.encodeJpegLosslessArith(w, h,
      (x, y) => px(y)(x), predictor = 4)).get
    for (rows <- Seq(1, 2, 4)) {
      val bytes = JpegCodec.encodeJpegLosslessArith(w, h, (x, y) => px(y)(x),
        predictor = 4, restartRows = rows)
      // the stream really carries DRI + RST markers
      assert(bytes.sliding(2).exists(s =>
        (s(0) & 0xff) == 0xff && (s(1) & 0xff) == 0xdd))
      assert(bytes.sliding(2).exists(s =>
        (s(0) & 0xff) == 0xff && (s(1) & 0xff) >= 0xd0 && (s(1) & 0xff) <= 0xd7))
      val img = decode(bytes).get
      for (y <- 0 until h; x <- 0 until w)
        assert((img.rgb((y * w + x) * 3) & 0xff) == px(y)(x),
          s"restartRows=$rows ($x,$y)")
      // FOUR-way spelling agreement on one image: SOF11+DRI ==
      // SOF11 plain == SOF3+DRI == SOF3 plain
      assert(img.rgb.sameElements(plain.rgb))
      val huff = decode(JpegCodec.encodeJpegLossless(w, h,
        (x, y) => px(y)(x), predictor = 4, restartRows = rows)).get
      assert(img.rgb.sameElements(huff.rgb))
    }
    // 3-component interleaved + arithmetic restarts compose (per-DC-
    // destination statistics reset together at the marker)
    val cpx = Array.fill(h, w)(rnd.nextInt(1 << 24))
    val cimg = decode(JpegCodec.encodeJpegLosslessArithRgb(w, h,
      (x, y) => cpx(y)(x), predictor = 4, restartRows = 3)).get
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      assert((cimg.rgb(o) & 0xff) == ((cpx(y)(x) >> 16) & 0xff), s"R ($x,$y)")
      assert((cimg.rgb(o + 2) & 0xff) == (cpx(y)(x) & 0xff), s"B ($x,$y)")
    }
    // 16-bit precision + restarts: full-precision reconstruction is
    // exact mod 2^16; the stored plane is the top byte
    val px16 = Array.fill(h, w)(rnd.nextInt(1 << 16))
    val img16 = decode(JpegCodec.encodeJpegLosslessArith(w, h,
      (x, y) => px16(y)(x), predictor = 7, precision = 16,
      restartRows = 2)).get
    for (y <- 0 until h; x <- 0 until w)
      assert((img16.rgb((y * w + x) * 3) & 0xff) == (px16(y)(x) >> 8),
        s"P16 ($x,$y)")
    // a missing restart marker (RST byte corrupted) refuses, not garbage
    val good = JpegCodec.encodeJpegLosslessArith(w, h, (x, y) => px(y)(x),
      predictor = 4, restartRows = 1)
    val noRst = good.clone()
    val rstAt = (2 until noRst.length - 1).find(i =>
      (noRst(i) & 0xff) == 0xff && (noRst(i + 1) & 0xff) >= 0xd0 &&
        (noRst(i + 1) & 0xff) <= 0xd7).get
    noRst(rstAt + 1) = 0x3f // no longer a marker
    assert(JpegCodec.decode(noRst).isEmpty)
  }

  test("12-bit extended sequential (SOF1): block-constant content decodes to exactly v >> 4") {
    val rnd = new scala.util.Random(559)
    // 3×2 MCUs, per-block-constant 12-bit values (all-ones quant →
    // DC-only → exact at FULL precision; the 8-bit plane is v >> 4)
    val bw = 3; val bh = 2
    val v12 = Array.fill(bh, bw)(rnd.nextInt(4096))
    val bytes = JpegCodec.encodeJpeg12(8 * bw, 8 * bh,
      (x, y) => v12(y / 8)(x / 8))
    val img = decode(bytes).get
    assert(img.width == 24 && img.height == 16)
    for (y <- 0 until 16; x <- 0 until 24) {
      val expect = v12(y / 8)(x / 8) >> 4
      assert((img.rgb((y * 24 + x) * 3) & 0xff) == expect, s"($x,$y)")
    }
    // DC-difference categories really exceed the 8-bit range: a black →
    // white block step forces a wide category through EncDcWide
    val hop = decode(JpegCodec.encodeJpeg12(16, 8,
      (x, _) => if (x < 8) 0 else 4095)).get
    assert((hop.rgb(0) & 0xff) == 0 && (hop.rgb(15 * 3) & 0xff) == 255)
    // 12-bit under BASELINE (SOF0) refuses — T.81 B.1 pins baseline to
    // P=8; the extended/progressive/arithmetic carriers accept it
    val asSof0 = bytes.clone()
    val sofAt = (0 until asSof0.length - 1).find(i =>
      (asSof0(i) & 0xff) == 0xff && (asSof0(i + 1) & 0xff) == 0xc1).get
    asSof0(sofAt + 1) = 0xc0.toByte
    assert(JpegCodec.decode(asSof0).isEmpty)
  }

  test("12-bit DCT family closed: SOF1/SOF9/SOF2/SOF10 spellings decode identically") {
    val rnd = new scala.util.Random(561)
    val bw = 3; val bh = 2
    val v12 = Array.fill(bh, bw)(rnd.nextInt(4096))
    val f = (x: Int, y: Int) => v12(y / 8)(x / 8)
    val huff = JpegCodec.encodeJpeg12(8 * bw, 8 * bh, f) // SOF1
    val arith = JpegCodec.encodeJpeg12(8 * bw, 8 * bh, f, spelling = 1) // SOF9
    val prog = JpegCodec.encodeJpeg12(8 * bw, 8 * bh, f, spelling = 2) // SOF2
    val progArith = JpegCodec.encodeJpegProgArith(8 * bw, 8 * bh,
      null, gray12 = f) // SOF10
    // four genuinely different bitstreams...
    val all = Seq(huff, arith, prog, progArith)
    for (i <- all.indices; j <- all.indices if i < j)
      assert(!java.util.Arrays.equals(all(i), all(j)))
    // ...one image: every spelling decodes to exactly v >> 4
    val imgs = all.map(b => decode(b).getOrElse(fail("decode failed")))
    for (img <- imgs) {
      assert(img.width == 24 && img.height == 16)
      for (y <- 0 until 16; x <- 0 until 24)
        assert((img.rgb((y * 24 + x) * 3) & 0xff) == (f(x, y) >> 4), s"($x,$y)")
    }
  }

  test("arithmetic lossless at 12/16-bit precision agrees with the Huffman spelling exactly") {
    val rnd = new scala.util.Random(562)
    for (prec <- Seq(12, 16); predictor <- Seq(1, 4, 7)) {
      val w = 5 + rnd.nextInt(12)
      val h = 3 + rnd.nextInt(8)
      val px = Array.fill(h, w)(rnd.nextInt(1 << prec))
      val ar = JpegCodec.encodeJpegLosslessArith(w, h, (x, y) => px(y)(x),
        predictor, precision = prec)
      val hu = JpegCodec.encodeJpegLossless(w, h, (x, y) => px(y)(x),
        predictor, precision = prec)
      val ia = decode(ar).getOrElse(fail(s"SOF11 P=$prec failed"))
      val ih = decode(hu).getOrElse(fail(s"SOF3 P=$prec failed"))
      assert(java.util.Arrays.equals(ia.rgb, ih.rgb), s"P=$prec pred=$predictor")
      // both exact: the 8-bit plane is v >> (P-8)
      for (y <- 0 until h; x <- 0 until w)
        assert((ia.rgb((y * w + x) * 3) & 0xff) == (px(y)(x) >> (prec - 8)))
    }
  }

  test("arithmetic lossless 3-component RGB (SOF11) agrees with SOF3 RGB exactly") {
    val rnd = new scala.util.Random(563)
    for (predictor <- Seq(1, 4, 7)) {
      val w = 5 + rnd.nextInt(12)
      val h = 3 + rnd.nextInt(8)
      val px = Array.fill(h, w)(rnd.nextInt(1 << 24))
      val ar = JpegCodec.encodeJpegLosslessArithRgb(w, h, (x, y) => px(y)(x),
        predictor)
      val hu = JpegCodec.encodeJpegLosslessRgb(w, h, (x, y) => px(y)(x),
        predictor)
      val ia = decode(ar).getOrElse(fail("SOF11 RGB failed"))
      val ih = decode(hu).getOrElse(fail("SOF3 RGB failed"))
      assert(java.util.Arrays.equals(ia.rgb, ih.rgb), s"pred=$predictor")
      for (y <- 0 until h; x <- 0 until w) {
        val o = (y * w + x) * 3
        assert((ia.rgb(o) & 0xff) == ((px(y)(x) >> 16) & 0xff))
        assert((ia.rgb(o + 1) & 0xff) == ((px(y)(x) >> 8) & 0xff))
        assert((ia.rgb(o + 2) & 0xff) == (px(y)(x) & 0xff))
      }
    }
  }

  test("lossless at 12/16-bit precision: arbitrary pixels reconstruct exactly (8-bit plane = v >> (P-8))") {
    val rnd = new scala.util.Random(560)
    for (prec <- Seq(12, 16); predictor <- Seq(1, 4, 7)) {
      val w = 5 + rnd.nextInt(20)
      val h = 3 + rnd.nextInt(12)
      val px = Array.fill(h, w)(rnd.nextInt(1 << prec))
      val bytes = JpegCodec.encodeJpegLossless(w, h, (x, y) => px(y)(x),
        predictor, precision = prec)
      val img = decode(bytes).get
      assert(img.width == w && img.height == h)
      // full-precision reconstruction is exact or prediction errors
      // cascade: every output byte must equal the top 8 bits
      for (y <- 0 until h; x <- 0 until w)
        assert((img.rgb((y * w + x) * 3) & 0xff) == (px(y)(x) >> (prec - 8)),
          s"P=$prec predictor $predictor ($x,$y)")
    }
    // width agreement: a 16-bit stream of v*256 decodes identically to
    // the plain 8-bit stream of v
    val w = 12; val h = 7
    val v8 = Array.fill(h, w)(rnd.nextInt(256))
    val from8 = decode(JpegCodec.encodeJpegLossless(w, h,
      (x, y) => v8(y)(x), predictor = 4)).get
    val from16 = decode(JpegCodec.encodeJpegLossless(w, h,
      (x, y) => v8(y)(x) * 256, predictor = 4, precision = 16)).get
    assert(from8.rgb.sameElements(from16.rgb))
    // the s=16 special category (difference exactly -32768 mod 2^16)
    // round-trips: alternating 0 / 32768 rails at P=16
    val rails = decode(JpegCodec.encodeJpegLossless(8, 2,
      (x, _) => if (x % 2 == 0) 0 else 32768, predictor = 1,
      precision = 16)).get
    for (x <- 0 until 8)
      assert((rails.rgb(x * 3) & 0xff) == (if (x % 2 == 0) 0 else 128))
  }

  test("lossless ARITHMETIC (SOF11): arbitrary pixels bit-exact, all 7 predictors; agrees with SOF3") {
    val rnd = new scala.util.Random(556)
    for (predictor <- 1 to 7) {
      val w = 5 + rnd.nextInt(30)
      val h = 3 + rnd.nextInt(20)
      val px = Array.fill(h, w)(rnd.nextInt(256))
      val bytes = JpegCodec.encodeJpegLosslessArith(w, h, (x, y) => px(y)(x), predictor)
      // really the arithmetic spelling: SOF11, DAC, no DHT
      def hasMarker(m: Int): Boolean =
        bytes.sliding(2).exists(p => (p(0) & 0xff) == 0xff && (p(1) & 0xff) == m)
      assert(hasMarker(0xcb) && hasMarker(0xcc) && !hasMarker(0xc4))
      val img = decode(bytes).get
      assert(img.width == w && img.height == h)
      for (y <- 0 until h; x <- 0 until w)
        assert((img.rgb((y * w + x) * 3) & 0xff) == px(y)(x),
          s"predictor $predictor ($x,$y)")
      // cross-frame-type agreement: the Huffman spelling of the same
      // image decodes to identical pixels
      val huff = decode(JpegCodec.encodeJpegLossless(w, h,
        (x, y) => px(y)(x), predictor)).get
      assert(img.rgb.sameElements(huff.rgb),
        s"SOF11 vs SOF3 disagreed under predictor $predictor")
    }
    // rails content + truncation robustness
    val rails = JpegCodec.encodeJpegLosslessArith(16, 4,
      (x, y) => if ((x + y) % 2 == 0) 0 else 255)
    val rimg = decode(rails).get
    for (y <- 0 until 4; x <- 0 until 16)
      assert((rimg.rgb((y * 16 + x) * 3) & 0xff) ==
        (if ((x + y) % 2 == 0) 0 else 255))
    JpegCodec.decode(rails.take(rails.length / 2)) match { case _ => () }
  }

  test("hierarchical lossless ARITHMETIC refinement (SOF15) reproduces arbitrary images; agrees with SOF7") {
    val rnd = new scala.util.Random(15)
    val full = Array.fill(32 * 32)(rnd.nextInt(256))
    val fullF = (x: Int, y: Int) => full(y * 32 + x)
    val halfF = (x: Int, y: Int) => full((y / 8) * 16 * 32 + (x / 8) * 16)
    val bytes = JpegCodec.encodeJpegHierLossless(16, 16, halfF, fullF,
      arith = true)
    def hasMarker(m: Int): Boolean =
      bytes.sliding(2).exists(p => (p(0) & 0xff) == 0xff && (p(1) & 0xff) == m)
    // arithmetic pyramid: SOF9 base + SOF15 refinement, no DHT anywhere
    assert(hasMarker(0xc9) && hasMarker(0xcf) && !hasMarker(0xc4))
    val img = decode(bytes).get
    assert(img.width == 32 && img.height == 32)
    for (y <- 0 until 32; x <- 0 until 32)
      assert((img.rgb((y * 32 + x) * 3) & 0xff) == full(y * 32 + x),
        s"pixel ($x,$y)")
    // the Huffman spelling (SOF0 base + SOF7) must agree exactly — both
    // reproduce `full` bit-for-bit by construction
    val huff = decode(JpegCodec.encodeJpegHierLossless(16, 16, halfF, fullF)).get
    assert(img.rgb.sameElements(huff.rgb))
    // truncation inside the arithmetic refinement never throws
    JpegCodec.decode(bytes.take(bytes.length - 12)) match { case _ => () }
  }

  test("differential PROGRESSIVE (SOF6/SOF14) decode identically to the sequential spellings") {
    val (hw, hh) = (16, 16)
    val half = (x: Int, y: Int) => 60 + 7 * (x / 8) + 11 * (y / 8)
    val delta = (bx: Int, by: Int) => if ((bx + by) % 2 == 0) -7 else 5
    val seq = decode(JpegCodec.encodeJpegHier(hw, hh, half, delta)).get
    val want = hierExpected(hw, hh, half, delta)

    // SOF6: Huffman progressive differential stage
    val p6 = JpegCodec.encodeJpegHier(hw, hh, half, delta,
      progressiveDiff = true)
    def marker(bytes: Array[Byte], m: Int): Boolean =
      bytes.sliding(2).exists(p => (p(0) & 0xff) == 0xff && (p(1) & 0xff) == m)
    assert(marker(p6, 0xc6) && !marker(p6, 0xc5))
    val i6 = decode(p6).get
    assert(i6.rgb.sameElements(seq.rgb),
      "SOF6 progressive differential diverged from the SOF5 sequential spelling")
    for (o <- want.indices)
      assert((i6.rgb(o * 3) & 0xff) == want(o), s"SOF6 pixel $o")

    // SOF14: arithmetic progressive differential stage
    val p14 = JpegCodec.encodeJpegHier(hw, hh, half, delta,
      arith = true, progressiveDiff = true)
    assert(marker(p14, 0xce) && marker(p14, 0xc9) && !marker(p14, 0xc4))
    val i14 = decode(p14).get
    assert(i14.rgb.sameElements(seq.rgb),
      "SOF14 arithmetic progressive differential diverged")

    // truncation inside either progressive stage refuses, never throws
    assert(decode(p6.take(p6.length - 8)) == None)
    assert(decode(p14.take(p14.length - 8)) == None)
  }

  test("features off decoded JPEG pixels are exact for DC-only fixtures") {
    val bytes = JpegCodec.encodeJpeg(16, 8, blockGray(50), gray = true)
    val f = features(decode(bytes).get, bins = 4)
    // blocks (bx,by) ∈ {0,1}×{0}: values 50 and 57, 64 pixels each
    assert(f.sumR == 64L * (50 + 57) && f.sumG == f.sumR && f.sumB == f.sumR)
    assert(f.lumaHist.sum == 128)
  }
}
