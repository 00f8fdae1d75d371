package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** mkv_meta: the EBML walk for Matroska/WebM. Fixture discipline:
  * real EBML headers, sized and unknown-size Segments, 4- and 8-byte
  * float spellings, default and explicit timestamp scales — all
  * recovering the same metadata; cluster payloads are junk the walk
  * must skip by size, never enter.
  */
class MkvMetaSpec extends AnyFunSuite {

  test("webm with VP9 video + Opus audio: full metadata") {
    val b = MkvMeta.encode("webm", durationMs = 12345, title = "A Clip",
      videoCodec = "V_VP9", width = 1920, height = 1080,
      audioCodec = "A_OPUS", sampleRate = 48000, channels = 2)
    val m = MkvMeta.parse(b)
    assert(m != null)
    assert(m.doctype == "webm")
    assert(m.durationMs == 12345)
    assert(m.title == "A Clip")
    assert(m.tracks == 2)
    assert(m.videoCodec == "V_VP9" && m.width == 1920 && m.height == 1080)
    assert(m.audioCodec == "A_OPUS" && m.sampleRate == 48000 && m.channels == 2)
  }

  test("spelling rotations recover identical metadata") {
    val base = MkvMeta.parse(MkvMeta.encode("matroska", 60000,
      videoCodec = "V_MPEG4/ISO/AVC", width = 1280, height = 720))
    for ((unk, wide, expl) <- Seq((true, false, true), (false, true, false),
        (true, true, true))) {
      val m = MkvMeta.parse(MkvMeta.encode("matroska", 60000,
        videoCodec = "V_MPEG4/ISO/AVC", width = 1280, height = 720,
        unknownSegmentSize = unk, wideFloats = wide, explicitScale = expl))
      assert(m != null, s"($unk,$wide,$expl)")
      assert(m.durationMs == base.durationMs &&
        m.width == base.width && m.height == base.height,
        s"($unk,$wide,$expl)")
    }
  }

  test("non-default timestamp scale converts duration correctly") {
    // scale 100,000 ns → duration units are 0.1 ms each
    val b = MkvMeta.encode("matroska", durationMs = 5000,
      audioCodec = "A_FLAC", sampleRate = 44100, channels = 1,
      scaleNs = 100000L)
    val m = MkvMeta.parse(b)
    assert(m != null && m.durationMs == 5000)
    assert(m.channels == 1) // spec-default channels element omitted
  }

  test("audio-only and video-only layouts leave the other side null-ish") {
    val a = MkvMeta.parse(MkvMeta.encode("webm", 1000,
      audioCodec = "A_VORBIS", sampleRate = 22050, channels = 2))
    assert(a != null && a.tracks == 1 && a.videoCodec == null && a.width == 0)
    val v = MkvMeta.parse(MkvMeta.encode("webm", 1000,
      videoCodec = "V_VP8", width = 640, height = 360))
    assert(v != null && v.tracks == 1 && v.audioCodec == null &&
      v.sampleRate == 0)
  }

  test("clusters are skipped by size: junk payloads cannot derail the walk") {
    val b = MkvMeta.encode("webm", 777, videoCodec = "V_AV1",
      width = 320, height = 240, clusters = 5)
    val m = MkvMeta.parse(b)
    assert(m != null && m.durationMs == 777 && m.videoCodec == "V_AV1")
  }

  test("truncation and malformed sizes keep the honest prefix or refuse") {
    val good = MkvMeta.encode("webm", 8000, title = "T",
      videoCodec = "V_VP9", width = 100, height = 50)
    // cut inside the clusters: metadata (earlier elements) survives
    val cut = java.util.Arrays.copyOf(good, good.length - 30)
    val m = MkvMeta.parse(cut)
    assert(m != null && m.title == "T" && m.width == 100)
    // cut inside the EBML header: no DocType → NULL
    assert(MkvMeta.parse(java.util.Arrays.copyOf(good, 8)) == null)
  }

  test("non-EBML and non-Matroska payloads refuse to NULL") {
    assert(MkvMeta.parse(null) == null)
    assert(MkvMeta.parse(Array.emptyByteArray) == null)
    assert(MkvMeta.parse("RIFF....WEBPVP8 ".getBytes) == null)
    assert(MkvMeta.parse(
      OggMeta.encode("opus", 48000, 2, samples = 1000)) == null)
    // a valid EBML header with a foreign DocType is not ours
    val foreign = MkvMeta.encode("foo-format", 1000)
    assert(MkvMeta.parse(foreign) == null)
  }
}
