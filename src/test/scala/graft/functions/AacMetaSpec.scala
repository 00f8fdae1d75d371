package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** aac_meta: the ADTS frame-header walk. Round-trip discipline: the
  * fixture encoder writes REAL ADTS streams (CRC and no-CRC headers,
  * MPEG-2 and MPEG-4 version bits, multi-raw-data-block frames, VBR
  * frame-size rotations) and the walk must recover exact frame counts
  * and durations. Refusals and truncations are pinned.
  */
class AacMetaSpec extends AnyFunSuite {

  test("CBR LC stream: exact frames, duration, bitrate") {
    val b = AacMeta.encode("LC", 44100, 2, frameSizes = Seq(250), frames = 20)
    val m = AacMeta.parse(b)
    assert(m != null)
    assert(m.version == "MPEG-4")
    assert(m.profile == "LC")
    assert(m.sampleRate == 44100)
    assert(m.channels == 2)
    assert(m.frames == 20)
    // 20 frames x 1024 samples at 44100 Hz
    assert(m.durationMs == 20L * 1024 * 1000 / 44100)
    // bytes = 20 x 257 (7-byte header + 250); bits x sr / samples / 1000
    assert(m.bitrateKbps == (20L * 257 * 8 * 44100 / (20L * 1024) / 1000).toInt)
  }

  test("CRC headers (protection_absent=0) walk identically") {
    val plain = AacMeta.parse(
      AacMeta.encode("LC", 48000, 2, Seq(100), frames = 10))
    val crc = AacMeta.parse(
      AacMeta.encode("LC", 48000, 2, Seq(100), frames = 10, crc = true))
    assert(plain != null && crc != null)
    assert(crc.frames == 10 && crc.durationMs == plain.durationMs)
    // the 2 extra CRC bytes per frame raise the average bitrate
    assert(crc.bitrateKbps >= plain.bitrateKbps)
  }

  test("MPEG-2 version bit and all four profiles") {
    for ((p, i) <- Seq("Main", "LC", "SSR", "LTP").zipWithIndex) {
      val m = AacMeta.parse(
        AacMeta.encode(p, 22050, 1, Seq(64 + i), frames = 5, mpeg2 = true))
      assert(m != null && m.profile == p && m.version == "MPEG-2",
        s"profile $p")
    }
  }

  test("multi-raw-data-block frames multiply samples per frame") {
    val m = AacMeta.parse(
      AacMeta.encode("LC", 24000, 2, Seq(300), frames = 6, rawDataBlocks = 3))
    assert(m != null && m.frames == 6)
    assert(m.durationMs == 6L * 3 * 1024 * 1000 / 24000)
  }

  test("VBR frame-size rotation averages exactly") {
    val sizes = Seq(100, 200, 400)
    val m = AacMeta.parse(
      AacMeta.encode("LC", 16000, 1, sizes, frames = 9))
    assert(m != null && m.frames == 9)
    val bytes = sizes.map(_ + 7).sum * 3L
    assert(m.bitrateKbps == (bytes * 8 * 16000 / (9L * 1024) / 1000).toInt)
  }

  test("a false sync that declares a different shape ends the walk") {
    val good = AacMeta.encode("LC", 44100, 2, Seq(50), frames = 8)
    val other = AacMeta.encode("Main", 48000, 1, Seq(50), frames = 4)
    val m = AacMeta.parse(good ++ other)
    assert(m != null && m.frames == 8) // stops at the shape change
  }

  test("truncation keeps the honestly-walked prefix") {
    val b = AacMeta.encode("LC", 44100, 2, Seq(200), frames = 10)
    val cut = java.util.Arrays.copyOf(b, b.length - 100)
    val m = AacMeta.parse(cut)
    assert(m != null && m.frames == 9)
  }

  test("non-AAC payloads refuse to NULL") {
    assert(AacMeta.parse(null) == null)
    assert(AacMeta.parse(Array.emptyByteArray) == null)
    assert(AacMeta.parse("RIFF not adts audio here".getBytes) == null)
    // an MP3 frame header is NOT a valid ADTS header (layer bits)
    val mp3 = Mp3Meta.encode("1", 3, 44100, Seq(128), frames = 3)
    assert(AacMeta.parse(mp3) == null)
    // channel configuration 0 (program config element) refuses
    val b = AacMeta.encode("LC", 44100, 1, Seq(50), frames = 2)
    b(2) = (b(2) & 0xfe).toByte // clear channel high bit
    b(3) = (b(3) & 0x3f).toByte // clear channel low bits → 0
    assert(AacMeta.parse(b) == null)
  }
}
