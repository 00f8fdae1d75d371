package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** html_to_text extraction semantics — raw-text elements, comments,
  * quoted attributes, character references, whitespace collapse, and
  * the codegen path through a real Spark projection. */
class HtmlTextSpec extends graft.SparkFunSuite {

  private def x(html: String): String = HtmlText.extract(html)

  test("tags drop, text survives, whitespace collapses") {
    assert(x("<p>hello <b>world</b></p>") == "hello world")
    assert(x("  <div>\n\ta   b\r\n</div>  ") == "a b")
    assert(x("plain text, no markup") == "plain text, no markup")
    assert(x("") == "")
    assert(x("<p></p><br/>") == "")
  }

  test("script and style content is dropped even with > and fake closers inside") {
    assert(x("""<script>if (1 > 0) { var s = "</div>"; }</script>after""") == "after")
    assert(x("""<style>p > span { color: red; }</style>after""") == "after")
    assert(x("""<SCRIPT>x</SCRIPT>y""") == "y") // case-insensitive
    // <scripty> is NOT a script element
    assert(x("""<scripty>text</scripty>""") == "text")
    // unterminated script drops the tail, never throws
    assert(x("""keep<script>var x = 1;""") == "keep")
  }

  test("comments, doctype, and processing instructions drop") {
    assert(x("a<!-- <p>not text</p> -->b") == "a b")
    assert(x("<!DOCTYPE html><p>t</p>") == "t")
    assert(x("<?xml version=\"1.0\"?>t") == "t")
    assert(x("a<!-- unterminated") == "a")
  }

  test("quoted attribute values may contain >") {
    assert(x("""<a href="u" title="a>b">link</a>""") == "link")
    assert(x("""<a title='a>b'>link</a>""") == "link")
  }

  test("character references: named, decimal, hex, nbsp, unknown verbatim") {
    assert(x("a &amp; b") == "a & b")
    assert(x("&lt;tag&gt; &quot;q&quot; &apos;a&apos;") == "<tag> \"q\" 'a'")
    assert(x("x&nbsp;y") == "x y")
    assert(x("&#65;&#x42;&#x63;") == "ABc")
    assert(x("AT&T and R&D; &bogus; &#xZZ; &#1114112;") ==
      "AT&T and R&D; &bogus; &#xZZ; &#1114112;")
    // a reference with no semicolon within 10 chars stays verbatim
    assert(x("a & b and a &amp b") == "a & b and a &amp b")
  }

  test("expression evaluates through codegen inside a projection, NULL in NULL out") {
    import spark.implicits._
    graft.functions.Registry.install(spark)
    // parquet round trip: a local relation would be constant-folded
    // before any codegen stage exists
    val dir = scratch("htmltext")
    Seq((1L, "<p>hello <b>w</b></p>"), (2L, null.asInstanceOf[String]))
      .toDF("id", "html").write.parquet(dir)
    val df = spark.read.parquet(dir)
      .selectExpr("id", "html_to_text(html) AS t")
      .orderBy("id")
    val rows = df.collect()
    assert(rows(0).getString(1) == "hello w")
    assert(rows(1).isNullAt(1))
    // whole-stage codegen actually compiled the projection (formatted
    // mode marks compiled operators with a codegen id)
    val explained = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(explained.contains("[codegen id :"), explained)
  }
}
