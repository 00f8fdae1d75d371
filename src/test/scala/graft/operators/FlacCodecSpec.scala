package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** FLAC decode/encode. Lossless ⇒ the round trip must be bit-exact for
  * every subframe spelling, stereo decorrelation, bit depth, and block
  * split; one signal through structurally different bitstream spellings
  * (verbatim vs fixed-N vs the LPC replica of fixed-2) must decode
  * identically; CRC-8/CRC-16 tampering and hostile headers refuse. */
class FlacCodecSpec extends AnyFunSuite {

  private def ramp(n: Int, ch: Int): Array[Int] =
    Array.tabulate(n * ch)(k => -500 + 7 * (k % ch) + 13 * (k / ch))

  private def noisy(n: Int, ch: Int, seed: Int, amp: Int): Array[Int] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(n * ch)(rnd.nextInt(2 * amp + 1) - amp)
  }

  test("round trip is bit-exact across spellings, depths, and block splits") {
    for {
      spelling <- Seq("auto", "verbatim", "fixed0", "fixed1", "fixed2",
        "fixed3", "fixed4", "lpc2")
      bits <- Seq(8, 16, 24)
      n <- Seq(100, 1024, 1500)
    } {
      val amp = (1 << (bits - 2)) - 1
      val pcm = noisy(n, 1, seed = bits * 1000 + n, amp = math.min(amp, 4000))
      val bytes = FlacCodec.encodeFlac(8000, 1, bits, pcm, blockSize = 256,
        spelling = spelling)
      val clip = AudioCodec.decode(bytes)
        .getOrElse(fail(s"decode None: $spelling/$bits/$n"))
      assert(clip.encoding == "flac" && clip.sampleRate == 8000 &&
        clip.channels == 1 && clip.bitsPerSample == bits)
      assert(clip.samples.toSeq == pcm.toSeq, s"$spelling/$bits/$n")
    }
  }

  test("one signal through different spellings decodes identically (dual-spelling agreement)") {
    val pcm = ramp(400, 1)
    val decoded = Seq("verbatim", "fixed1", "fixed2", "fixed3", "lpc2").map { sp =>
      AudioCodec.decode(FlacCodec.encodeFlac(16000, 1, 16, pcm, 128, sp))
        .getOrElse(fail(s"None for $sp")).samples.toSeq
    }
    decoded.sliding(2).foreach { case Seq(a, b) => assert(a == b) }
    assert(decoded.head == pcm.toSeq)
  }

  test("all three stereo decorrelations round-trip independent channels exactly") {
    val pcm = noisy(600, 2, seed = 7, amp = 6000)
    for (mode <- Seq("independent", "ls", "rs", "ms")) {
      val clip = AudioCodec.decode(FlacCodec.encodeFlac(44100, 2, 16, pcm,
        blockSize = 200, spelling = "fixed2", stereo = mode))
        .getOrElse(fail(s"None for $mode"))
      assert(clip.channels == 2)
      assert(clip.samples.toSeq == pcm.toSeq, mode)
    }
  }

  test("constant channels take the CONSTANT subframe and still round-trip") {
    val pcm = Array.fill(500)(-12345)
    val bytes = FlacCodec.encodeFlac(8000, 1, 16, pcm, blockSize = 250)
    val clip = AudioCodec.decode(bytes).getOrElse(fail("None"))
    assert(clip.samples.forall(_ == -12345) && clip.frames == 500)
    // the constant spelling is tiny: two frames ≈ headers only
    assert(bytes.length < 120, s"constant stream unexpectedly large: ${bytes.length}")
  }

  test("odd tail frame (total not a multiple of blockSize) decodes exactly") {
    val pcm = ramp(777, 1)
    val clip = AudioCodec.decode(
      FlacCodec.encodeFlac(8000, 1, 16, pcm, blockSize = 256))
      .getOrElse(fail("None"))
    assert(clip.frames == 777 && clip.samples.toSeq == pcm.toSeq)
  }

  test("CRC tampering refuses: header byte, body byte, and truncation") {
    val pcm = ramp(300, 1)
    val ok = FlacCodec.encodeFlac(8000, 1, 16, pcm, blockSize = 128)
    assert(AudioCodec.decode(ok).isDefined)
    // find the first frame (after fLaC + 4-byte block header + 34 streaminfo)
    val frameStart = 4 + 4 + 34
    assert((ok(frameStart) & 0xff) == 0xff) // sync byte sanity
    val hdrTamper = ok.clone()
    hdrTamper(frameStart + 2) = (hdrTamper(frameStart + 2) ^ 0x10).toByte
    assert(AudioCodec.decode(hdrTamper).isEmpty, "CRC-8 must catch header damage")
    val bodyTamper = ok.clone()
    bodyTamper(frameStart + 12) = (bodyTamper(frameStart + 12) ^ 0x01).toByte
    assert(AudioCodec.decode(bodyTamper).isEmpty, "CRC-16 must catch body damage")
    for (cut <- Seq(ok.length - 1, ok.length / 2, 20, 5))
      assert(AudioCodec.decode(ok.take(cut)).isEmpty, s"cut=$cut")
  }

  test("hostile headers refuse: bad magic, missing STREAMINFO, absurd totals") {
    assert(AudioCodec.decode("fLaX then garbage".getBytes("US-ASCII")).isEmpty)
    // valid magic, one empty PADDING block marked last, no streaminfo
    val noInfo = Array[Byte]('f', 'L', 'a', 'C', 0x81.toByte, 0, 0, 0) ++
      Array.fill[Byte](40)(0)
    assert(AudioCodec.decode(noInfo).isEmpty)
    // streaminfo claiming 2^35 samples against a 100-byte payload
    val big = FlacCodec.encodeFlac(8000, 1, 16, ramp(50, 1), blockSize = 50).clone()
    // total-samples field: last 4.5 bytes of the packed 8-byte word at
    // offset 8 (fLaC) + 10 → set a huge value
    big(8 + 13) = 0x7f; big(8 + 14) = 0x7f.toByte
    assert(AudioCodec.decode(big).isEmpty)
  }

  test("CRC building blocks match their standard test vectors") {
    // CRC-8/0x07 of "123456789" = 0xF4; CRC-16/BUYPASS (0x8005, init 0,
    // no reflection) of the same string = 0xFEE8 — published check values
    val m = "123456789".getBytes("US-ASCII")
    assert(FlacCodec.crc8(m, 0, m.length) == 0xf4)
    assert(FlacCodec.crc16(m, 0, m.length) == 0xfee8)
  }

  test("features over a FLAC clip match the same WAV clip's features") {
    val pcm = ramp(250, 2)
    val flac = AudioCodec.decode(FlacCodec.encodeFlac(20000, 2, 16, pcm))
      .getOrElse(fail("flac None"))
    val wav = AudioCodec.decode(AudioCodec.encodeWav(20000, 2, pcm))
      .getOrElse(fail("wav None"))
    val ff = AudioCodec.features(flac)
    val wf = AudioCodec.features(wav)
    assert(ff.sumByChannel.toSeq == wf.sumByChannel.toSeq)
    assert(ff.sumSqByChannel.toSeq == wf.sumSqByChannel.toSeq)
    assert(ff.peakAbs == wf.peakAbs)
  }
}
