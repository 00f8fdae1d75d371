package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** eml_text: RFC 5322/2045 extraction. Every MIME spelling the
  * fixture encoder writes must recover the same body text; headers
  * pin encoded-words (B and Q), folding, and date parsing.
  */
class EmlTextSpec extends AnyFunSuite {

  private val date = "Tue, 3 Jun 2008 11:05:30 +0200"
  private val dateMs = 1212483930000L
  private val body = "The quarterly numbers look good — détails to follow."

  test("plain 7bit utf-8 message") {
    val m = EmlText.parse(EmlText.encodeEml(
      "Quarterly update", "Alice <alice@example.com>", date, body))
    assert(m != null)
    assert(m.subject == "Quarterly update")
    assert(m.from == "Alice <alice@example.com>")
    assert(m.dateMs == dateMs)
    assert(m.text == body)
  }

  test("every body spelling extracts the same text") {
    for (kind <- Seq("plain", "qp", "b64", "alt", "mixed", "nested")) {
      val m = EmlText.parse(EmlText.encodeEml(
        "s", "f@x", date, body, bodyKind = kind))
      assert(m != null, kind)
      assert(m.text == body, kind)
    }
  }

  test("quoted-printable soft line breaks and =XX escapes") {
    val long = ("word " * 40).trim + " fin-ée" // forces soft breaks
    val m = EmlText.parse(EmlText.encodeEml("s", "f@x", date, long,
      bodyKind = "qp"))
    assert(m.text == long)
  }

  test("RFC 2047 encoded-words: B, Q, folding, adjacent-word joins") {
    val subj = "Résumé —ναι ok"
    for (enc <- Seq("b", "q")) {
      val m = EmlText.parse(EmlText.encodeEml(subj, "f@x", date, body,
        subjectEnc = enc))
      assert(m.subject == subj, enc)
    }
    // folded plain subject unfolds to one space
    val folded = EmlText.parse(EmlText.encodeEml(
      "a subject long enough to fold somewhere", "f@x", date, body,
      foldSubject = true))
    assert(folded.subject == "a subject long enough to fold somewhere")
    // adjacent encoded-words: whitespace between them is transparent
    val adj = EmlText.decodeWords(
      EmlText.encodeWordB("Hello ") + " " + EmlText.encodeWordB("World"))
    assert(adj == "Hello World")
  }

  test("multipart/alternative prefers the last (html) part") {
    val m = EmlText.parse(EmlText.encodeEml("s", "f@x", date,
      "rich & <bold> text", bodyKind = "alt"))
    // html entity round-trip through HtmlText
    assert(m.text == "rich & <bold> text")
  }

  test("attachments contribute nothing; unparseable dates are null") {
    val m = EmlText.parse(EmlText.encodeEml("s", "f@x",
      "not a date at all", body, bodyKind = "mixed"))
    assert(m.text == body)
    assert(m.dateMs == -1)
  }

  test("non-mail payloads refuse to NULL") {
    assert(EmlText.parse(null) == null)
    assert(EmlText.parse(Array.emptyByteArray) == null)
    assert(EmlText.parse("just some text\nwith lines\n".getBytes) == null)
    // a colon alone does not make mail: no defining header present
    assert(EmlText.parse("note: remember the milk\n\nbody".getBytes) == null)
    // but a minimal From + body IS mail
    val minimal = EmlText.parse("From: a@b\n\nhello world body".getBytes)
    assert(minimal != null && minimal.text == "hello world body")
    assert(minimal.subject == null)
  }

  test("hostile shapes degrade: missing boundary, truncated multipart") {
    val good = EmlText.encodeEml("s", "f@x", date, body, bodyKind = "mixed")
    val s = new String(good, java.nio.charset.StandardCharsets.ISO_8859_1)
    // drop the closing delimiter: the unterminated part drops, no throw
    val cut = s.substring(0, s.lastIndexOf("------=_graft_mix_51ac--"))
    val m = EmlText.parse(
      cut.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    assert(m != null) // text may shrink; never an exception
    // boundary param stripped → no parts → empty text, headers intact
    val noBoundary = s.replace("; boundary=\"----=_graft_mix_51ac\"", "")
    val m2 = EmlText.parse(
      noBoundary.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    assert(m2 != null && m2.text == "" && m2.subject == "s")
  }
}
