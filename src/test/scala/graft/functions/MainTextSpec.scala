package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** main_text: boilerplate removal. The keep rule (≥25 chars, link
  * density ≤ 1/3, no nav/header/footer/aside/form ancestry) is a
  * stated contract — these cases pin each clause and its edges.
  */
class MainTextSpec extends AnyFunSuite {

  private val para =
    "This is a long enough paragraph of real article content to keep."

  test("nav/header/footer/aside/form subtrees drop wholesale") {
    val html =
      s"""<html><body>
         |<header><h1>Site name and a long tagline over the fold</h1></header>
         |<nav><ul><li>Home</li><li>About pages and other sections</li></ul></nav>
         |<p>$para</p>
         |<aside>A long related-articles sidebar with plenty of text.</aside>
         |<form>Please enter your very long email address to subscribe.</form>
         |<footer>Copyright and a long legal disclaimer paragraph here.</footer>
         |</body></html>""".stripMargin
    assert(MainText.extract(html) == para)
  }

  test("link-dense blocks die; a long paragraph with one link survives") {
    val menu = """<ul><li><a href="/a">First menu entry here</a></li>
                 |<li><a href="/b">Second menu entry text</a></li>
                 |<li><a href="/c">Third menu entry label</a></li></ul>""".stripMargin
    val withLink = s"""<p>The story continues with a reference to
                      |<a href="/x">one inline link</a> and then much more
                      |running text that dominates the block easily.</p>""".stripMargin
    val out = MainText.extract(menu + withLink)
    assert(!out.contains("menu entry"))
    assert(out.startsWith("The story continues"))
    assert(out.contains("one inline link")) // anchor TEXT kept, block-level
  }

  test("short blocks drop; 25 chars is the boundary") {
    val exactly24 = "x" * 24
    val exactly25 = "y" * 25
    val out = MainText.extract(s"<p>$exactly24</p><p>$exactly25</p>")
    assert(out == exactly25)
  }

  test("density boundary: exactly 1/3 keeps, above drops") {
    // text = 20 k's + boundary space + 10 linked l's = 31 chars,
    // 10 link chars → 30 ≤ 31 → keep (separator spaces are neutral)
    val keep = "<p>" + ("k" * 20) + "<a>" + ("l" * 10) + "</a></p>"
    assert(MainText.extract(keep) == ("k" * 20) + " " + ("l" * 10))
    // 19 k's + space + 11 linked = 31 chars, 11 linked → 33 > 31 → drop
    val drop = "<p>" + ("k" * 19) + "<a>" + ("l" * 11) + "</a></p>"
    assert(MainText.extract(drop) == "")
  }

  test("nested and stray drop tags clamp; content after recovers") {
    val html =
      s"""<nav>outer <nav>inner menu</nav> still nav</nav><p>$para</p>
         |</footer></nav><p>$para</p>""".stripMargin
    assert(MainText.extract(html) == s"$para $para")
  }

  test("script/style/comments never leak into blocks") {
    val html =
      s"""<p>$para</p><script>var x = "a long fake paragraph in js";</script>
         |<style>.c { content: "long fake css paragraph content"; }</style>
         |<!-- a long comment that is not content at all --><p>$para</p>""".stripMargin
    assert(MainText.extract(html) == s"$para $para")
  }

  test("entities decode inside kept blocks") {
    val out = MainText.extract(
      "<p>Fish &amp; chips &lt;for&gt; twenty&nbsp;three people tonight</p>")
    assert(out == "Fish & chips <for> twenty three people tonight")
  }

  test("html_to_text keeps what main_text drops (the two contracts differ)") {
    val html = s"<nav>Menu entries listed here at length</nav><p>$para</p>"
    val everything = HtmlText.extract(html)
    assert(everything.contains("Menu entries"))
    assert(MainText.extract(html) == para)
  }
}
