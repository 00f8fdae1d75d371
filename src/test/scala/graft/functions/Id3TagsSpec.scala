package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** id3_tags: ID3v2.2/2.3/2.4 text frames and the ID3v1 tail. The
  * fixture encoder writes real tag blocks in every encoding and the
  * unsynchronised spelling; all must decode to the same strings.
  */
class Id3TagsSpec extends AnyFunSuite {

  test("v2.3 ISO-8859-1 frames decode; version reported") {
    val b = Id3Tags.encodeV2(3, title = "Café Song", artist = "Aïda",
      album = "Début")
    val t = Id3Tags.parse(b)
    assert(t != null && t.version == "2.3")
    assert(t.title == "Café Song" && t.artist == "Aïda" && t.album == "Début")
  }

  test("all four text encodings agree (v2.4 for 2/3)") {
    // latin-1-representable text: every encoding must round-trip it
    for (enc <- 0 to 3) {
      val major = if (enc >= 2) 4 else 3
      val t = Id3Tags.parse(Id3Tags.encodeV2(major,
        title = "Naïve résumé", artist = "Ärtist", enc = enc))
      assert(t != null, s"enc=$enc")
      assert(t.title == "Naïve résumé", s"enc=$enc")
      assert(t.artist == "Ärtist", s"enc=$enc")
      assert(t.album == null, s"enc=$enc")
    }
    // beyond-latin-1 text rides the unicode encodings
    for (enc <- 1 to 3) {
      val major = if (enc >= 2) 4 else 3
      val t = Id3Tags.parse(Id3Tags.encodeV2(major,
        title = "Naïve — résumé ✓", enc = enc))
      assert(t.title == "Naïve — résumé ✓", s"enc=$enc")
    }
  }

  test("v2.2 three-char frames (TT2/TP1/TAL)") {
    val t = Id3Tags.parse(Id3Tags.encodeV2(2, title = "Old",
      artist = "Tagger", album = "Nineties"))
    assert(t != null && t.version == "2.2")
    assert(t.title == "Old" && t.artist == "Tagger" && t.album == "Nineties")
  }

  test("v2.3 global unsynchronisation round-trips") {
    // UTF-16 BOM FE FF produces an FF byte → unsync inserts 00 after it
    val plain = Id3Tags.encodeV2(3, title = "Unsync ÿ test", enc = 1)
    val unsync = Id3Tags.encodeV2(3, title = "Unsync ÿ test", enc = 1,
      unsync = true)
    assert(!java.util.Arrays.equals(plain, unsync)) // spelling differs
    assert(Id3Tags.parse(plain).title == "Unsync ÿ test")
    assert(Id3Tags.parse(unsync).title == "Unsync ÿ test")
  }

  test("v1 tail fallback; v2 wins when both present") {
    val audio = Mp3Meta.encode("1", 3, 44100, Seq(128), frames = 4)
    val v1only = audio ++ Id3Tags.encodeV1("T1", "A1", "L1")
    val t1 = Id3Tags.parse(v1only)
    assert(t1 != null && t1.version == "1")
    assert(t1.title == "T1" && t1.artist == "A1" && t1.album == "L1")
    val both = Id3Tags.encodeV2(4, title = "T2") ++ v1only
    val t2 = Id3Tags.parse(both)
    assert(t2.version == "2.4" && t2.title == "T2" && t2.artist == null)
    // and mp3_meta still walks the frames behind the v2 tag
    val m = Mp3Meta.parse(both)
    assert(m != null && m.frames == 4)
  }

  test("missing fields are null; no tag at all is NULL") {
    val t = Id3Tags.parse(Id3Tags.encodeV2(3, artist = "OnlyArtist"))
    assert(t != null && t.title == null && t.artist == "OnlyArtist")
    assert(Id3Tags.parse(null) == null)
    assert(Id3Tags.parse(Array.emptyByteArray) == null)
    assert(Id3Tags.parse(
      Mp3Meta.encode("1", 3, 44100, Seq(128), frames = 2)) == null)
    assert(Id3Tags.parse("IDX junk that is not a tag".getBytes) == null)
  }

  test("truncated and hostile tags degrade, never throw") {
    val good = Id3Tags.encodeV2(3, title = "Full Title", artist = "Art")
    // cut inside the artist frame: title (earlier frame) survives
    val cut = java.util.Arrays.copyOf(good, good.length - 12)
    val t = Id3Tags.parse(cut)
    assert(t != null && t.title == "Full Title")
    // declared frame size beyond the body ends the walk cleanly
    val bad = good.clone()
    bad(14) = 0x7f // blow up TIT2's size field
    val t2 = Id3Tags.parse(bad)
    assert(t2 != null && t2.title == null)
  }

  test("v2.3 frame size near Int.MaxValue cannot wrap the bounds math") {
    // plain-be32 v2.3 sizes go up to 0x7fffffff: p+hdrLen+fsize wraps
    // negative for 0x7ffffffc and would pass the > body.length guard,
    // sending copyOfRange a negative end — must refuse, never throw
    val body = "TIT2".getBytes("US-ASCII") ++
      Array[Byte](0x7f, 0xff.toByte, 0xff.toByte, 0xfc.toByte, 0, 0) ++
      Array[Byte](0, 'X', 'Y', 'Z')
    def synchsafe(v: Int): Array[Byte] = Array[Byte](
      ((v >> 21) & 0x7f).toByte, ((v >> 14) & 0x7f).toByte,
      ((v >> 7) & 0x7f).toByte, (v & 0x7f).toByte)
    val tag = "ID3".getBytes("US-ASCII") ++ Array[Byte](3, 0, 0) ++
      synchsafe(body.length) ++ body
    val t = Id3Tags.parse(tag)
    assert(t == null || t.title == null) // refused cleanly
  }
}
