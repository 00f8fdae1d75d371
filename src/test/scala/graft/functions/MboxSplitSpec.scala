package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** mbox_split: RFC 4155 mailbox framing. The composition contract is
  * the point: every split message must extract through eml_text
  * exactly as it would standalone — From-stuffing round-trips, and
  * "From " in running text does not split.
  */
class MboxSplitSpec extends AnyFunSuite {

  private val date = "Tue, 3 Jun 2008 11:05:30 +0200"

  private def eml(subject: String, body: String): Array[Byte] =
    EmlText.encodeEml(subject, "a@b", date, body)

  test("three messages split; each extracts through eml_text") {
    val msgs = Seq(
      ("a@b Mon Jan  1 10:00:00 2024", eml("first", "body one here")),
      ("c@d Mon Jan  1 11:00:00 2024", eml("second", "body two here")),
      ("e@f Mon Jan  1 12:00:00 2024", eml("third", "body three here")))
    val parts = MboxSplit.split(MboxSplit.encodeMbox(msgs))
    assert(parts != null && parts.size == 3)
    parts.zip(msgs).foreach { case ((env, raw), (expEnv, _)) =>
      assert(env == expEnv)
    }
    val texts = parts.map(p => EmlText.parse(p._2))
    assert(texts.map(_.subject) == Seq("first", "second", "third"))
    assert(texts.map(_.text) ==
      Seq("body one here", "body two here", "body three here"))
  }

  test("From-stuffing round-trips; mid-paragraph From does not split") {
    val tricky = "a line\nFrom here it looks like an envelope\n" +
      ">From an already-quoted line\nend"
    val msgs = Seq(
      ("x@y Mon Jan  1 10:00:00 2024", eml("s1", tricky)),
      ("z@w Mon Jan  1 11:00:00 2024", eml("s2", "plain")))
    val mbox = MboxSplit.encodeMbox(msgs)
    val parts = MboxSplit.split(mbox)
    assert(parts.size == 2) // the stuffed From lines did not split
    val m1 = EmlText.parse(parts(0)._2)
    // whitespace-collapsed, but the stuffed lines round-trip verbatim
    assert(m1.text.contains("From here it looks like an envelope"))
    assert(m1.text.contains(">From an already-quoted line"))
  }

  test("a bare From-line start after a NON-blank line is content") {
    // hand mbox where a body line starts with "From " but the
    // preceding line is not blank → one message, not two
    val raw = "From a@b Mon Jan  1 10:00:00 2024\n" +
      "Subject: s\n\nline one\nFrom line in flow\nmore\n"
    val parts = MboxSplit.split(
      raw.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    assert(parts.size == 1)
    assert(new String(parts(0)._2).contains("From line in flow"))
  }

  test("non-mbox payloads refuse to NULL") {
    assert(MboxSplit.split(null) == null)
    assert(MboxSplit.split(Array.emptyByteArray) == null)
    // a bare RFC 5322 message is eml_text's job, not mbox
    assert(MboxSplit.split(eml("s", "b")) == null)
    assert(MboxSplit.split("random text".getBytes) == null)
  }
}
