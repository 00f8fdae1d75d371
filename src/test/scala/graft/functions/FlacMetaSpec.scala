package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** flac_meta: the metadata-block walk. Fixtures are REAL FLAC streams
  * from the full encoder with comment/padding blocks spliced in — and
  * every fixture must still decode sample-exactly through FlacCodec
  * (metadata inspection and audio decode never disagree on a file).
  */
class FlacMetaSpec extends AnyFunSuite {

  private def sine(n: Int): Array[Int] =
    Array.tabulate(n)(i => (math.sin(i * 0.1) * 1000).toInt)

  test("STREAMINFO fields and exact duration") {
    val flac = graft.operators.FlacCodec.encodeFlac(
      44100, 1, 16, sine(4410))
    val m = FlacMeta.parse(flac)
    assert(m != null)
    assert(m.sampleRate == 44100 && m.channels == 1 && m.bits == 16)
    assert(m.totalSamples == 4410)
    assert(m.durationMs == 100)
    assert(m.title == null && m.artist == null)
  }

  test("VORBIS_COMMENT tags extract; file still decodes through FlacCodec") {
    val base = graft.operators.FlacCodec.encodeFlac(
      8000, 2, 16, sine(1600))
    for (pad <- Seq(0, 64)) {
      val tagged = FlacMeta.withComments(base, "Song", "Band",
        padding = pad, lastIsPadding = pad > 0)
      val m = FlacMeta.parse(tagged)
      assert(m != null && m.title == "Song" && m.artist == "Band", s"pad=$pad")
      assert(m.totalSamples == 800 && m.durationMs == 100, s"pad=$pad")
      // the decoder is oblivious to the spliced blocks
      val clip = graft.operators.FlacCodec.decode(tagged)
      assert(clip.isDefined && clip.get.frames == 800, s"pad=$pad")
    }
  }

  test("unknown total_samples (0) yields no duration guess") {
    val flac = graft.operators.FlacCodec.encodeFlac(48000, 1, 16, sine(480))
    // zero the 36-bit total-samples field inside STREAMINFO
    val packedOff = 8 + 10 // header(4) + blockhdr(4) + 10 bytes in
    val b = flac.clone()
    b(packedOff + 3) = (b(packedOff + 3) & 0xf0).toByte
    b(packedOff + 4) = 0; b(packedOff + 5) = 0
    b(packedOff + 6) = 0; b(packedOff + 7) = 0
    val m = FlacMeta.parse(b)
    assert(m != null && m.totalSamples == 0 && m.durationMs == -1)
  }

  test("non-FLAC, truncated, and invalid-block payloads refuse to NULL") {
    assert(FlacMeta.parse(null) == null)
    assert(FlacMeta.parse("OggS not flac".getBytes) == null)
    val flac = graft.operators.FlacCodec.encodeFlac(8000, 1, 16, sine(100))
    assert(FlacMeta.parse(java.util.Arrays.copyOf(flac, 20)) == null)
    // block type 127 is invalid per spec
    val tagged = FlacMeta.withComments(flac, "T", "A")
    val bad = tagged.clone()
    val cmtHdr = 8 + 34 // after STREAMINFO (34 bytes)
    bad(cmtHdr) = 0x7f.toByte
    assert(FlacMeta.parse(bad) == null)
  }
}
