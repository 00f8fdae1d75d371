package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** sniff_text: the bytes→text detection cascade. Every step is pinned
  * with payloads only that step can claim, plus the binary refusal
  * and the hostile/edge shapes (overlong UTF-8, meta label noise).
  */
class CharsetSniffSpec extends AnyFunSuite {

  private val UTF8 = java.nio.charset.StandardCharsets.UTF_8

  test("BOMs win: UTF-8 / UTF-16LE / UTF-16BE / UTF-32") {
    val t = "héllo wörld ✓"
    val cases = Seq(
      ("utf-8", Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++
        t.getBytes(UTF8)),
      ("utf-16be", Array[Byte](0xfe.toByte, 0xff.toByte) ++
        t.getBytes(java.nio.charset.StandardCharsets.UTF_16BE)),
      ("utf-16le", Array[Byte](0xff.toByte, 0xfe.toByte) ++
        t.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)),
      ("utf-32le", Array[Byte](0xff.toByte, 0xfe.toByte, 0, 0) ++
        t.getBytes(java.nio.charset.Charset.forName("UTF-32LE"))),
      ("utf-32be", Array[Byte](0, 0, 0xfe.toByte, 0xff.toByte) ++
        t.getBytes(java.nio.charset.Charset.forName("UTF-32BE"))))
    for ((cs, bytes) <- cases) {
      val s = CharsetSniff.sniff(bytes)
      assert(s != null, cs)
      assert(s.charset == cs && s.source == "bom", cs)
      assert(s.text == t, cs)
    }
  }

  test("meta prescan: quoted, bare, http-equiv, aliases, case") {
    val body = "café naïve"
    val shapes = Seq(
      s"""<html><head><meta charset="windows-1252"></head>$body""",
      s"""<html><head><META CHARSET='Windows-1252'></head>$body""",
      s"""<meta http-equiv="Content-Type" content="text/html; charset=windows-1252">$body""",
      s"""<meta charset=latin1>$body""") // WHATWG alias → 1252
    for (html <- shapes) {
      val s = CharsetSniff.sniff(
        html.getBytes(java.nio.charset.Charset.forName("windows-1252")))
      assert(s != null && s.source == "meta", html.take(40))
      assert(s.charset == "windows-1252", html.take(40))
      assert(s.text.endsWith(body), html.take(40))
    }
  }

  test("meta shift_jis resolves through the JDK registry") {
    val text = "<meta charset=shift_jis>こんにちは"
    val s = CharsetSniff.sniff(
      text.getBytes(java.nio.charset.Charset.forName("Shift_JIS")))
    assert(s != null && s.source == "meta" && s.charset == "shift_jis")
    assert(s.text.endsWith("こんにちは"))
  }

  test("a UTF-16 meta label cannot be right: WHATWG maps it to UTF-8") {
    val html = "<meta charset=utf-16>plain ascii body"
    val s = CharsetSniff.sniff(html.getBytes(UTF8))
    assert(s != null && s.charset == "utf-8" && s.source == "meta")
  }

  test("strict UTF-8 validation: valid multi-byte vs overlong vs ascii") {
    val valid = CharsetSniff.sniff("日本語 text — mixed ✓".getBytes(UTF8))
    assert(valid.charset == "utf-8" && valid.source == "utf8-valid")
    val ascii = CharsetSniff.sniff("plain old ascii.".getBytes(UTF8))
    assert(ascii.charset == "ascii" && ascii.source == "ascii")
    // overlong '/' (C0 AF) is NOT valid UTF-8 → windows-1252 fallback
    val overlong = CharsetSniff.sniff(
      "abc".getBytes(UTF8) ++ Array[Byte](0xc0.toByte, 0xaf.toByte))
    assert(overlong.charset == "windows-1252" && overlong.source == "fallback")
    // CESU-style surrogate half (ED A0 80) rejected
    val surrogate = CharsetSniff.sniff(
      Array[Byte](0xed.toByte, 0xa0.toByte, 0x80.toByte))
    assert(surrogate.source == "fallback")
  }

  test("windows-1252 fallback decodes high bytes") {
    // "café" in 1252 with no meta/BOM and an invalid-UTF-8 byte layout
    val bytes = Array[Byte]('c', 'a', 'f', 0xe9.toByte, ' ', 0x93.toByte,
      'q', 0x94.toByte)
    val s = CharsetSniff.sniff(bytes)
    assert(s.charset == "windows-1252" && s.source == "fallback")
    assert(s.text == "café “q”") // 93/94 are curly quotes in 1252
  }

  test("binary payloads (NUL bytes) refuse to NULL") {
    assert(CharsetSniff.sniff(null) == null)
    assert(CharsetSniff.sniff(Array[Byte](1, 2, 0, 4)) == null)
    val pngish = Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10, 0, 0)
    assert(CharsetSniff.sniff(pngish) == null)
    // but an empty payload is empty text, not binary
    val empty = CharsetSniff.sniff(Array.emptyByteArray)
    assert(empty != null && empty.text == "")
  }

  test("hostile meta labels fall through the cascade, never throw") {
    for (label <- Seq("not-a-charset-at-all", "x-user-defined", "", "=\"'")) {
      val html = s"<meta charset=$label>body text here"
      val s = CharsetSniff.sniff(html.getBytes(UTF8))
      assert(s != null && s.source == "ascii", label)
    }
    // "charset" appearing in running text (no '=') is ignored
    val prose = CharsetSniff.sniff(
      "we discuss charset detection at length".getBytes(UTF8))
    assert(prose.source == "ascii")
  }

  test("charset tokens outside a <meta> tag are ignored (WHATWG prescan)") {
    // script text must not force the decode...
    val js = """<script>document.charset="shift_jis";</script>""" +
      """<meta charset="windows-1252">café"""
    val s = CharsetSniff.sniff(js.getBytes(
      java.nio.charset.Charset.forName("windows-1252")))
    assert(s != null && s.source == "meta" && s.charset == "windows-1252")
    // ...and neither must visible head text mentioning charset=
    val text = "<title>how charset=shift_jis works</title>plain ascii body"
    val t = CharsetSniff.sniff(text.getBytes(UTF8))
    assert(t != null && t.source == "ascii")
    // a real meta later in the prescan window still wins
    val late = "<p>set charset=koi8-r maybe?</p><meta charset=utf-8>ok"
    val l = CharsetSniff.sniff(late.getBytes(UTF8))
    assert(l != null && l.source == "meta" && l.charset == "utf-8")
    // a '>' inside a QUOTED attribute value does not end the meta tag:
    // the charset after it must still be honored
    val quoted = """<meta data-x="a>b" charset="windows-1252">café"""
    val q = CharsetSniff.sniff(quoted.getBytes(
      java.nio.charset.Charset.forName("windows-1252")))
    assert(q != null && q.source == "meta" && q.charset == "windows-1252")
  }
}
