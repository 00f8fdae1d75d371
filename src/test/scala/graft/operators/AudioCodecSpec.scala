package graft.operators

import graft.SparkFunSuite

/** Round-trip + adversarial coverage for the zero-dependency WAV/PCM
  * codec, cross-checked against the JDK's own javax.sound.sampled WAV
  * reader/writer (java.desktop) — same discipline as PixelCodecSpec:
  * encoder and decoder cannot share a compensating bug because ImageIO's
  * sibling API independently reads our bytes and writes bytes we read.
  */
class AudioCodecSpec extends SparkFunSuite {

  private def ramp(n: Int, ch: Int): Array[Int] =
    Array.tabulate(n * ch)(k => -500 + 7 * (k % ch) + 13 * (k / ch))

  /** Interleaved 16-bit samples as javax.sound reads them. */
  private def javaSoundSamples(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val fmt = in.getFormat
    assert(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian)
    val raw = in.readAllBytes()
    val samples = Array.tabulate(raw.length / 2)(i =>
      ((raw(2 * i) & 0xff) | (raw(2 * i + 1) << 8)).toShort.toInt)
    (fmt.getSampleRate.toInt, fmt.getChannels, samples)
  }

  test("16-bit mono and stereo round-trip exactly; javax.sound agrees") {
    for (ch <- 1 to 2) {
      val samples = ramp(120, ch)
      val bytes = AudioCodec.encodeWav(10000, ch, samples)
      val clip = AudioCodec.decode(bytes).get
      assert(clip.sampleRate == 10000 && clip.channels == ch)
      assert(clip.bitsPerSample == 16 && clip.frames == 120)
      assert(clip.samples.sameElements(samples))
      val (jr, jc, js) = javaSoundSamples(bytes)
      assert(jr == 10000 && jc == ch)
      assert(js.sameElements(samples), s"javax.sound disagrees at ch=$ch")
    }
  }

  test("javax.sound-written 8-bit unsigned WAV decodes to centered samples") {
    // 8-bit WAV stores unsigned bytes; our decoder centers them at 0
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false)
    val raw = Array.tabulate[Byte](64)(i => (i * 4).toByte) // 0,4,…,252
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, raw.length)
    val buf = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, buf)
    val clip = AudioCodec.decode(buf.toByteArray).get
    assert(clip.bitsPerSample == 8 && clip.sampleRate == 8000 && clip.channels == 1)
    assert(clip.samples.sameElements(raw.map(b => (b & 0xff) - 128)))
  }

  test("WAVE_FORMAT_EXTENSIBLE wrapping PCM decodes like plain PCM") {
    val plain = AudioCodec.encodeWav(8000, 2, ramp(50, 2))
    // rebuild with a 40-byte EXTENSIBLE fmt chunk around the same data
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def wle16(v: Int): Unit = { w8(v); w8(v >> 8) }
    def wle32(v: Int): Unit = { w8(v); w8(v >> 8); w8(v >> 16); w8(v >> 24) }
    def wtag(t: String): Unit = t.foreach(c => w8(c))
    val dataLen = plain.length - 44
    wtag("RIFF"); wle32(4 + 48 + 8 + dataLen); wtag("WAVE")
    wtag("fmt "); wle32(40)
    wle16(0xfffe); wle16(2); wle32(8000) // EXTENSIBLE, stereo
    wle32(8000 * 4); wle16(4); wle16(16)
    wle16(22); wle16(16); wle32(0x3) // cbSize, valid bits, channel mask
    wle16(1); wle16(0) // SubFormat: PCM GUID (first word = 0x0001)
    out.write(Array.fill[Byte](12)(0)) // rest of the GUID
    wtag("data"); wle32(dataLen)
    out.write(plain, 44, dataLen)
    val clip = AudioCodec.decode(out.toByteArray).get
    assert(clip.channels == 2 && clip.samples.sameElements(ramp(50, 2)))
  }

  test("chunk walk skips unknown chunks and honors word alignment") {
    val plain = AudioCodec.encodeWav(8000, 1, ramp(10, 1))
    val out = new java.io.ByteArrayOutputStream()
    out.write(plain, 0, 12) // RIFF….WAVE
    // odd-sized junk chunk BEFORE fmt: the walk must pad to even
    out.write("LIST".getBytes("US-ASCII"))
    out.write(Array[Byte](3, 0, 0, 0)) // size 3 (odd)
    out.write(Array[Byte](9, 9, 9, 0)) // 3 payload + 1 pad
    out.write(plain, 12, plain.length - 12)
    val bytes = out.toByteArray
    // fix the RIFF size (not that our walk validates it against b.length)
    val clip = AudioCodec.decode(bytes)
    assert(clip.isDefined, "chunk walk lost alignment at an odd-size chunk")
    assert(clip.get.samples.sameElements(ramp(10, 1)))
  }

  test("javax.sound-written 24-bit PCM decodes with exact sign extension") {
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      8000f, 24, 1, 3, 8000f, false)
    // 24-bit LE frames, including negative values near the rails
    val vals = Array(0, 1, -1, 8388607, -8388608, 123456, -654321, 42)
    val raw = new Array[Byte](vals.length * 3)
    for ((v, i) <- vals.zipWithIndex) {
      raw(i * 3) = v.toByte
      raw(i * 3 + 1) = (v >> 8).toByte
      raw(i * 3 + 2) = (v >> 16).toByte
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, vals.length)
    val buf = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, buf)
    val clip = AudioCodec.decode(buf.toByteArray).get
    assert(clip.bitsPerSample == 24 && clip.channels == 1)
    assert(clip.samples.sameElements(vals),
      s"24-bit decode mismatch: ${clip.samples.toSeq} vs ${vals.toSeq}")
  }

  test("IEEE-float WAV (wFormatTag 3) decodes via the deterministic 24-bit mapping") {
    // lattice floats k/8388607 map back to exactly k
    val ks = Array(-8388608, -8388607, -4194303, -1, 0, 1, 2, 999999, 8388607)
    val fs = ks.map(k => (k.toDouble / 8388607.0).toFloat)
    val clip = AudioCodec.decode(AudioCodec.encodeWavFloat(16000, 1, fs)).get
    assert(clip.float && clip.bitsPerSample == 32 && clip.channels == 1)
    // float32 has 24 significand bits, so |k| ≤ 2^23 lattice points are
    // represented exactly and rint recovers k bit-for-bit (-8388608
    // clamps up from the float below -1.0)
    assert(clip.samples.sameElements(ks), clip.samples.mkString(","))
    // NaN → 0; out-of-range clamps to the rail
    val weird = AudioCodec.decode(AudioCodec.encodeWavFloat(16000, 1,
      Array(Float.NaN, 1.5f, -2f, Float.PositiveInfinity))).get
    assert(weird.samples.sameElements(Array(0, 8388607, -8388608, 8388607)))
    // stereo interleave preserved
    val st = AudioCodec.decode(AudioCodec.encodeWavFloat(8000, 2,
      Array(0.5f, -0.5f, 0.25f, -0.25f))).get
    assert(st.channels == 2 && st.frames == 2)
    assert(st.samples(0) > 0 && st.samples(1) < 0 &&
      st.samples(0) == -st.samples(1))
    // the feature path stays exact-integer over the mapped samples
    val f = AudioCodec.features(clip)
    assert(f.sumByChannel(0) == ks.map(_.toLong).sum && f.peakAbs == 8388608)
  }

  test("javax.sound reads our float WAV; EXTENSIBLE-wrapped float decodes") {
    val fs = Array.tabulate(32)(i => ((i - 16) / 20.0).toFloat)
    val bytes = AudioCodec.encodeWavFloat(22050, 1, fs)
    // independent read: the JDK's WAV parser agrees on the format geometry
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val fmt = in.getFormat
    assert(fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_FLOAT)
    assert(fmt.getSampleRate.toInt == 22050 && fmt.getChannels == 1 &&
      fmt.getSampleSizeInBits == 32)
    val raw = in.readAllBytes()
    assert(raw.length == fs.length * 4)
    // and the payload bytes are bit-identical to what we encoded
    (0 until fs.length).foreach { i =>
      val bits = (raw(4 * i) & 0xff) | ((raw(4 * i + 1) & 0xff) << 8) |
        ((raw(4 * i + 2) & 0xff) << 16) | ((raw(4 * i + 3) & 0xff) << 24)
      assert(java.lang.Float.intBitsToFloat(bits) == fs(i))
    }
    // EXTENSIBLE (0xFFFE) wrapping the float subformat decodes too
    val ext = {
      val out = new java.io.ByteArrayOutputStream()
      def w8(v: Int): Unit = out.write(v & 0xff)
      def wle16(v: Int): Unit = { w8(v); w8(v >> 8) }
      def wle32(v: Int): Unit = { w8(v); w8(v >> 8); w8(v >> 16); w8(v >> 24) }
      def wtag(t: String): Unit = t.foreach(c => w8(c))
      val dataLen = fs.length * 4
      wtag("RIFF"); wle32(4 + (8 + 40) + (8 + dataLen)); wtag("WAVE")
      wtag("fmt "); wle32(40)
      wle16(0xfffe); wle16(1); wle32(22050)
      wle32(22050 * 4); wle16(4); wle16(32)
      wle16(22); wle16(32); wle32(0x4) // cbSize, validBits, channel mask
      wle16(3); wle16(0) // SubFormat GUID head: IEEE float
      wle32(0x00100000); wle32(0xaa000080); wle32(0x719b3800)
      wtag("data"); wle32(dataLen)
      fs.foreach(f => wle32(java.lang.Float.floatToIntBits(f)))
      out.toByteArray
    }
    val eclip = AudioCodec.decode(ext).get
    assert(eclip.float && eclip.samples.sameElements(
      AudioCodec.decode(bytes).get.samples))
  }

  test("float64 WAV decodes through the same deterministic 24-bit mapping") {
    // lattice doubles k/8388607 map back to exactly k (a double holds
    // every |k| <= 2^23 exactly, same as float32's significand range)
    val ks = Array(-8388608, -8388607, -12345, -1, 0, 1, 777, 8388607)
    val ds = ks.map(_.toDouble / 8388607.0)
    val clip = AudioCodec.decode(AudioCodec.encodeWavFloat64(16000, 1, ds)).get
    assert(clip.float && clip.bitsPerSample == 64 && clip.channels == 1)
    assert(clip.samples.sameElements(ks.map(k => math.max(k, -8388608))))
    // NaN → 0; out-of-range clamps; infinities clamp
    val weird = AudioCodec.decode(AudioCodec.encodeWavFloat64(16000, 1,
      Array(Double.NaN, 1.5, -2.0, Double.PositiveInfinity))).get
    assert(weird.samples.sameElements(Array(0, 8388607, -8388608, 8388607)))
    // a float32 stream and a float64 stream of the SAME values decode to
    // the same integers (width-independent feature contract)
    val fs = Array.tabulate(32)(i => ((i - 16) / 20.0).toFloat)
    val from32 = AudioCodec.decode(AudioCodec.encodeWavFloat(22050, 1, fs)).get
    val from64 = AudioCodec.decode(AudioCodec.encodeWavFloat64(22050, 1,
      fs.map(_.toDouble))).get
    assert(from32.samples.sameElements(from64.samples))
    // javax.sound agrees on the container geometry (PCM_FLOAT, 64-bit)
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(
        AudioCodec.encodeWavFloat64(22050, 2, Array(0.25, -0.25, 0.5, -0.5))))
    val fmt = in.getFormat
    assert(fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_FLOAT)
    assert(fmt.getSampleSizeInBits == 64 && fmt.getChannels == 2)
  }

  test("G.711 mu-law and A-law decode to the standard expansion; JDK codec agrees on all 256 codes") {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    def compandedWav(fmtTag: Int, codes: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def w8(v: Int): Unit = out.write(v & 0xff)
      def wle16(v: Int): Unit = { w8(v); w8(v >> 8) }
      def wle32(v: Int): Unit = { w8(v); w8(v >> 8); w8(v >> 16); w8(v >> 24) }
      def wtag(t: String): Unit = t.foreach(c => w8(c))
      wtag("RIFF"); wle32(4 + (8 + 16) + (8 + codes.length)); wtag("WAVE")
      wtag("fmt "); wle32(16)
      wle16(fmtTag); wle16(1); wle32(8000)
      wle32(8000); wle16(1); wle16(8)
      wtag("data"); wle32(codes.length)
      out.write(codes)
      out.toByteArray
    }
    val codes = Array.tabulate[Byte](256)(_.toByte) // every code point
    for ((enc, fmtTag, jenc) <- Seq(
        ("ulaw", 7, AudioFormat.Encoding.ULAW),
        ("alaw", 6, AudioFormat.Encoding.ALAW))) {
      val bytes = compandedWav(fmtTag, codes)
      val clip = AudioCodec.decode(bytes).get
      assert(clip.encoding == enc && clip.frames == 256 && clip.channels == 1)
      // independent expansion: the JDK's own G.711 codec converts the
      // same stream to 16-bit linear — must agree on ALL 256 code points
      val src = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      assert(src.getFormat.getEncoding == jenc, s"$enc tag not recognized")
      val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        8000f, 16, 1, 2, 8000f, false)
      val conv = AudioSystem.getAudioInputStream(target, src)
      val raw = conv.readAllBytes()
      val js = Array.tabulate(raw.length / 2)(i =>
        ((raw(2 * i) & 0xff) | (raw(2 * i + 1) << 8)).toShort.toInt)
      assert(js.length == 256, s"$enc: JDK emitted ${js.length} samples")
      (0 until 256).foreach { i =>
        assert(clip.samples(i) == js(i),
          s"$enc code $i: ours ${clip.samples(i)} vs JDK ${js(i)}")
      }
    }
  }

  test("features: exact per-channel sums, sums-of-squares, peak") {
    val n = 120
    val clip = AudioCodec.decode(AudioCodec.encodeWav(8000, 2, ramp(n, 2))).get
    val f = AudioCodec.features(clip)
    for (c <- 0 to 1) {
      val a = -500 + 7 * c
      val s1 = n.toLong * (n - 1) / 2
      val s2 = (n - 1).toLong * n * (2 * n - 1) / 6
      assert(f.sumByChannel(c) == n.toLong * a + 13 * s1, s"sum ch$c")
      assert(f.sumSqByChannel(c) ==
        n.toLong * a * a + 26L * a * s1 + 169 * s2, s"sumsq ch$c")
    }
    assert(f.peakAbs == math.max(500, 7 + 13 * (n - 1) - 500))
  }

  test("malformed and non-PCM payloads decode to None, never throw") {
    val good = AudioCodec.encodeWav(8000, 1, ramp(20, 1))
    assert(AudioCodec.decode(null) == None)
    assert(AudioCodec.decode("ID3 not audio".getBytes("US-ASCII")) == None)
    assert(AudioCodec.decode(good.take(40)) == None) // truncated header
    assert(AudioCodec.decode(good.take(50)) == None) // data chunk overruns
    val nonPcm = good.clone()
    nonPcm(20) = 85 // wFormatTag = 0x0055 (MP3) → stub path
    assert(AudioCodec.decode(nonPcm) == None)
    val hostile = good.clone() // data size claims 2 GB
    hostile(40) = -1; hostile(41) = -1; hostile(42) = -1; hostile(43) = 0x7f
    assert(AudioCodec.decode(hostile) == None)
  }

  // ------------------------------------------------------- IMA ADPCM
  // No JDK ADPCM reader exists (javax.sound stops at G.711), so the
  // anchors are: the step table's structural invariants, the exact
  // constant-block closed form, and the decode↔encode inverse identity
  // over arbitrary nibble streams — encoder and decoder share only the
  // reconstruction arithmetic the identity is ABOUT.

  test("ADPCM step table: 89 entries, 7→32767, strictly monotone, ~1.1 growth") {
    val t = AudioCodec.AdpcmStep
    assert(t.length == 89)
    assert(t.head == 7 && t.last == 32767)
    for (i <- 1 until t.length) {
      assert(t(i) > t(i - 1), s"not monotone at $i")
      val ratio = t(i).toDouble / t(i - 1)
      assert(ratio > 1.03 && ratio < 1.16, s"growth $ratio off-profile at $i")
    }
    assert(AudioCodec.AdpcmIndexAdj.sameElements(Array(-1, -1, -1, -1, 2, 4, 6, 8)))
  }

  test("ADPCM: blockwise-constant input reconstructs EXACTLY (all-zero nibbles)") {
    // block j holds constant v_j; the encoder writes v_j verbatim into
    // the block header and, at step index 0 (step 7, 7>>3 = 0), every
    // zero nibble reconstructs +0 — so decode is bit-exact
    val spb = 17 // blockAlign 12, mono
    val nb = 5
    val samples = Array.tabulate(nb * spb)(k => -300 + 21 * (k / spb))
    val bytes = AudioCodec.encodeWavAdpcm(8000, 1, samples, blockAlign = 12)
    val clip = AudioCodec.decode(bytes).get
    assert(clip.encoding == "adpcm" && clip.bitsPerSample == 4)
    assert(clip.sampleRate == 8000 && clip.channels == 1)
    assert(clip.frames == nb * spb)
    assert(clip.samples.sameElements(samples))
    // and the code area really is all-zero nibbles at index 0
    for (blk <- 0 until nb; o <- 4 until 12)
      assert(bytes(48 + blk * 12 + o) == 0, s"nonzero nibble blk $blk byte $o")
  }

  test("ADPCM: stereo blocks keep per-channel state and interleave exactly") {
    val spb = 9 // blockAlign 16, stereo: dataArea 8 = one 4-byte group each
    val nb = 4
    val samples = Array.tabulate(nb * spb * 2) { i =>
      val blk = i / (spb * 2)
      if (i % 2 == 0) -200 + 30 * blk else 150 - 25 * blk
    }
    val bytes = AudioCodec.encodeWavAdpcm(20000, 2, samples, blockAlign = 16)
    val clip = AudioCodec.decode(bytes).get
    assert(clip.channels == 2 && clip.frames == nb * spb)
    assert(clip.samples.sameElements(samples))
  }

  test("ADPCM: decode→encode→decode is the identity on arbitrary nibble streams") {
    // seed a raw one-block stream with pseudo-random nibbles from a
    // mid-table state; the quantizer must map each reconstructed step
    // back to a nibble with the same magnitude class, so the re-encoded
    // stream reconstructs the identical samples
    val rnd = new scala.util.Random(41)
    var tested = 0
    for (trial <- 0 until 30) {
      val idx0 = 10 + rnd.nextInt(40)
      val pred0 = rnd.nextInt(2000) - 1000
      val blockAlign = 12
      val data = new Array[Byte](blockAlign)
      data(0) = pred0.toByte; data(1) = (pred0 >> 8).toByte
      data(2) = idx0.toByte
      for (o <- 4 until blockAlign) data(o) = rnd.nextInt(256).toByte
      val bytes = AudioCodec.wrapWavAdpcm(8000, 1, blockAlign, 17, data)
      val y = AudioCodec.decode(bytes).get
      assert(y.frames == 17)
      // the identity's scope is non-clamping streams: once the int16
      // clamp engages, the reconstruction is no longer a quantizer
      // level and no encoder could emit the same nibble
      if (y.samples.forall(s => s < 32767 && s > -32768)) {
        tested += 1
        val re = AudioCodec.encodeWavAdpcm(8000, 1, y.samples, blockAlign,
          initialIndex = idx0)
        val z = AudioCodec.decode(re).get
        assert(z.samples.sameElements(y.samples), s"identity broken, trial $trial")
      }
    }
    assert(tested >= 15, s"only $tested non-clamping trials — seed drift?")
  }

  test("ADPCM: a slow ramp tracks within the small-step error bound") {
    val spb = 505 // blockAlign 256, mono
    val samples = Array.tabulate(spb)(i => -3000 + 12 * i)
    val bytes = AudioCodec.encodeWavAdpcm(8000, 1, samples, blockAlign = 256)
    val clip = AudioCodec.decode(bytes).get
    assert(clip.frames == spb)
    val maxErr = clip.samples.zip(samples).map { case (a, b) => math.abs(a - b) }.max
    // slope 12/sample keeps the adaptive step small; generous bound
    assert(maxErr <= 64, s"ramp drifted by $maxErr")
  }

  test("ADPCM: hostile/mismatched payloads decode to None, never throw") {
    val spb = 17
    val good = AudioCodec.encodeWavAdpcm(8000, 1,
      Array.fill(spb * 2)(100), blockAlign = 12)
    // hostile step index (> 88) in block 0's header
    val badIdx = good.clone(); badIdx(48 + 2) = 90.toByte
    assert(AudioCodec.decode(badIdx) == None)
    // samplesPerBlock disagrees with the block geometry
    val badSpb = good.clone(); badSpb(38) = 16.toByte
    assert(AudioCodec.decode(badSpb) == None)
    // fmt chunk without the extension words (size 16) → refused
    val noExt = AudioCodec.encodeWav(8000, 1, Array.fill(20)(5))
    noExt(20) = 0x11 // flip the tag on a 16-byte fmt
    assert(AudioCodec.decode(noExt) == None)
    // truncation to less than one block → None; a trailing partial
    // block decodes the complete blocks only (whole-frames policy)
    assert(AudioCodec.decode(good.take(48 + 11)) == None)
    val partial = AudioCodec.wrapWavAdpcm(8000, 1, 12, 17,
      java.util.Arrays.copyOfRange(good, 48, 48 + 12 + 5))
    assert(AudioCodec.decode(partial).get.frames == 17)
  }

  // ---------------------------------------------------------- MS-ADPCM

  test("MS-ADPCM tables: 16-entry symmetric adaptation, 7 registered coefficient pairs") {
    assert(AudioCodec.MsAdaptTable.length == 16)
    // the table is symmetric in the nibble's magnitude (±k adapt alike)
    for (i <- 1 until 16)
      assert(AudioCodec.MsAdaptTable(i) == AudioCodec.MsAdaptTable((16 - i) % 16))
    assert(AudioCodec.MsAdaptTable.min == 230 && AudioCodec.MsAdaptTable.max == 768)
    assert(AudioCodec.MsCoef1.length == 7 && AudioCodec.MsCoef2.length == 7)
    assert(AudioCodec.MsCoef1(0) == 256 && AudioCodec.MsCoef2(0) == 0)
  }

  test("MS-ADPCM: blockwise-constant input reconstructs EXACTLY (seed samples + zero nibbles)") {
    val nb = 3
    val spb = 12 // blockAlign 12, mono
    val samples = Array.tabulate(nb * spb)(k => -321 + 21 * (k / spb))
    val bytes = AudioCodec.encodeWavMsAdpcm(8000, 1, samples, blockAlign = 12)
    val clip = AudioCodec.decode(bytes).get
    assert(clip.encoding == "msadpcm")
    assert(clip.frames == nb * spb)
    assert(clip.samples.sameElements(samples))
  }

  test("MS-ADPCM: stereo blocks keep per-channel state and interleave exactly") {
    val spb = 8 // blockAlign 20, stereo
    val nb = 2
    val samples = Array.tabulate(nb * spb * 2) { k =>
      val c = k % 2
      val blkv = 100 + 37 * (k / (spb * 2))
      if (c == 0) blkv else -blkv
    }
    val bytes = AudioCodec.encodeWavMsAdpcm(8000, 2, samples, blockAlign = 20)
    val clip = AudioCodec.decode(bytes).get
    assert(clip.channels == 2 && clip.frames == nb * spb)
    assert(clip.samples.sameElements(samples))
  }

  test("MS-ADPCM: decode→encode→decode is the identity on arbitrary nibble streams") {
    val rnd = new scala.util.Random(43)
    var tested = 0
    for (trial <- 0 until 30) {
      val blockAlign = 12 // mono: spb 12, 5 code bytes
      val delta0 = 16 + rnd.nextInt(80)
      val s1 = rnd.nextInt(2000) - 1000
      val s2 = rnd.nextInt(2000) - 1000
      val data = new Array[Byte](blockAlign)
      data(0) = 0 // bPredictor 0 (the set the encoder emits)
      data(1) = delta0.toByte; data(2) = (delta0 >> 8).toByte
      data(3) = s1.toByte; data(4) = (s1 >> 8).toByte
      data(5) = s2.toByte; data(6) = (s2 >> 8).toByte
      for (o <- 7 until blockAlign) data(o) = rnd.nextInt(256).toByte
      val bytes = AudioCodec.wrapWavMsAdpcm(8000, 1, blockAlign, 12, data)
      val y = AudioCodec.decode(bytes).get
      assert(y.frames == 12)
      // identity scope: non-clamping streams (a clamped sample is not a
      // quantizer level, so no encoder could emit the same nibble)
      if (y.samples.forall(s => s < 32767 && s > -32768)) {
        tested += 1
        val re = AudioCodec.encodeWavMsAdpcm(8000, 1, y.samples, blockAlign,
          initialDelta = delta0)
        val z = AudioCodec.decode(re).get
        assert(z.samples.sameElements(y.samples), s"identity broken, trial $trial")
      }
    }
    assert(tested >= 15, s"only $tested non-clamping trials — seed drift?")
  }

  test("MS-ADPCM: a slow ramp tracks within the per-step delta bound") {
    val spb = 12
    val nb = 4
    val samples = Array.tabulate(nb * spb)(k => 3 * k)
    val bytes = AudioCodec.encodeWavMsAdpcm(8000, 1, samples, blockAlign = 12)
    val clip = AudioCodec.decode(bytes).get
    val maxErr = clip.samples.zip(samples).map { case (a, b) => math.abs(a - b) }.max
    assert(maxErr <= 64, s"ramp drifted by $maxErr")
  }

  test("MS-ADPCM: hostile/mismatched payloads decode to None, never throw") {
    val spb = 12
    val good = AudioCodec.encodeWavMsAdpcm(8000, 1,
      Array.fill(spb)(100), blockAlign = 12)
    // hostile predictor index (≥ wNumCoef)
    val badPred = good.clone()
    badPred(78) = 9 // first data byte = bPredictor
    assert(AudioCodec.decode(badPred) == None)
    // geometry mismatch: declared spb disagrees with blockAlign
    val data = java.util.Arrays.copyOfRange(good, 78, 78 + 12)
    assert(AudioCodec.decode(
      AudioCodec.wrapWavMsAdpcm(8000, 1, 12, 17, data)) == None)
    // a non-standard coefficient table must refuse, not mis-reconstruct
    val badCoef = good.clone()
    badCoef(42) = 1 // MsCoef1(0): 256 → 257
    assert(AudioCodec.decode(badCoef) == None)
    // truncation below one block
    assert(AudioCodec.decode(good.take(78 + 11)) == None)
  }
}
