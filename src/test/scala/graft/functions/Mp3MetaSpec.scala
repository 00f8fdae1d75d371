package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** mp3_meta: frame-header walk over MPEG audio. The encoder writes real
  * headers (zeroed payloads — the honest-stub contract), the parser
  * must recover version/layer/rate/channels and an EXACT frame-counted
  * duration through every rotation, and refusals are pinned. */
class Mp3MetaSpec extends AnyFunSuite {

  test("CBR MPEG1 Layer III stereo: exact frame count and duration") {
    val b = Mp3Meta.encode("1", 3, 44100, Seq(128), frames = 38)
    val m = Mp3Meta.parse(b)
    assert(m.version == "1" && m.layer == 3)
    assert(m.sampleRate == 44100 && m.channels == 2)
    assert(m.bitrateKbps == 128 && m.frames == 38L)
    assert(m.durationMs == 38L * 1152 * 1000 / 44100)
    assert(!m.vbr)
  }

  test("MPEG2 and MPEG2.5 Layer III use 576 samples per frame") {
    val m2 = Mp3Meta.parse(Mp3Meta.encode("2", 3, 24000, Seq(64), 20))
    assert(m2.version == "2" && m2.durationMs == 20L * 576 * 1000 / 24000)
    val m25 = Mp3Meta.parse(Mp3Meta.encode("2.5", 3, 8000, Seq(32), 12,
      mono = true))
    assert(m25.version == "2.5" && m25.channels == 1)
    assert(m25.durationMs == 12L * 576 * 1000 / 8000)
  }

  test("Layer II and Layer I frame arithmetic") {
    val l2 = Mp3Meta.parse(Mp3Meta.encode("1", 2, 48000, Seq(192), 15))
    assert(l2.layer == 2 && l2.frames == 15L)
    assert(l2.durationMs == 15L * 1152 * 1000 / 48000)
    val l1 = Mp3Meta.parse(Mp3Meta.encode("1", 1, 32000, Seq(224), 9))
    assert(l1.layer == 1 && l1.frames == 9L)
    assert(l1.durationMs == 9L * 384 * 1000 / 32000)
  }

  test("VBR: alternating bitrates + Xing tag -> vbr flag, floor-average") {
    val b = Mp3Meta.encode("1", 3, 44100, Seq(64, 128), frames = 11,
      xing = true)
    val m = Mp3Meta.parse(b)
    assert(m.vbr)
    assert(m.frames == 11L)
    assert(m.bitrateKbps == (6L * 64 + 5L * 128) / 11) // 6 of 64, 5 of 128
  }

  test("Xing tag alone (CBR bitrates) still marks vbr") {
    val m = Mp3Meta.parse(Mp3Meta.encode("1", 3, 44100, Seq(128), 8,
      xing = true))
    assert(m.vbr && m.bitrateKbps == 128)
  }

  test("ID3v2 prefix is skipped via its synchsafe size") {
    val m = Mp3Meta.parse(Mp3Meta.encode("2", 3, 16000, Seq(48), 7,
      id3Size = 500))
    assert(m != null && m.frames == 7L && m.sampleRate == 16000)
  }

  test("trailing junk stops the walk at the honest prefix") {
    val clean = Mp3Meta.encode("1", 3, 44100, Seq(128), 5)
    val withJunk = clean ++ "not a frame header at all".getBytes("US-ASCII")
    val m = Mp3Meta.parse(withJunk)
    assert(m != null && m.frames == 5L)
  }

  test("refusals: junk, empty, ID3-only, reserved version bits") {
    assert(Mp3Meta.parse(null) == null)
    assert(Mp3Meta.parse(Array.emptyByteArray) == null)
    assert(Mp3Meta.parse("OggS vorbis, not mpeg".getBytes) == null)
    // ID3 header whose size swallows the whole payload
    val id3Only = Mp3Meta.encode("1", 3, 44100, Seq(128), 1, id3Size = 16)
      .take(26)
    assert(Mp3Meta.parse(id3Only) == null)
    // sync followed by the reserved version pattern (bits 01)
    assert(Mp3Meta.parse(Array[Byte](0xff.toByte, 0xea.toByte, 0x90.toByte,
      0x00)) == null)
  }

  test("a mid-stream sync that declares a different shape is not a frame") {
    val clean = Mp3Meta.encode("1", 3, 44100, Seq(128), 4)
    // append a VALID header of a different sample rate: the walk must
    // not count it (it disagrees with the stream's shape)
    val alien = Mp3Meta.encode("1", 3, 32000, Seq(128), 1)
    val m = Mp3Meta.parse(clean ++ alien)
    assert(m != null && m.frames == 4L && m.sampleRate == 44100)
  }
}
