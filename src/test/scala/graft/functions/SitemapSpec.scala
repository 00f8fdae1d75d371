package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** sitemap_urls: the sitemaps.org walk. Urlset and index kinds,
  * gzip transparency, entity decoding, optional-field NULLs, the
  * protocol's own entry cap, and refusal shapes.
  */
class SitemapSpec extends AnyFunSuite {

  test("urlset entries with all and with optional fields") {
    val b = Sitemap.encodeSitemap(Seq(
      ("https://a.com/x?a=1&b=2", "2024-05-01", "daily",
        java.lang.Double.valueOf(0.8)),
      ("https://a.com/y", null, null, null)))
    val es = Sitemap.parse(b)
    assert(es != null && es.size == 2)
    assert(es(0).kind == "url")
    assert(es(0).loc == "https://a.com/x?a=1&b=2") // &amp; decoded back
    assert(es(0).lastmod == "2024-05-01")
    assert(es(0).changefreq == "daily")
    assert(es(0).priority == 0.8)
    assert(es(1).lastmod == null && es(1).priority == null)
  }

  test("sitemapindex entries carry kind=sitemap") {
    val b = Sitemap.encodeSitemap(Seq(
      ("https://a.com/sitemap-1.xml.gz", "2024-01-01", null, null),
      ("https://a.com/sitemap-2.xml.gz", null, null, null)),
      index = true)
    val es = Sitemap.parse(b)
    assert(es.size == 2 && es.forall(_.kind == "sitemap"))
  }

  test("gzip payloads (.xml.gz) inflate transparently") {
    val plain = Sitemap.encodeSitemap(Seq(
      ("https://g.com/p", "2023-12-31", null, null)))
    val gz = Sitemap.encodeSitemap(Seq(
      ("https://g.com/p", "2023-12-31", null, null)), gz = true)
    assert(!java.util.Arrays.equals(plain, gz))
    assert(Sitemap.parse(gz) == Sitemap.parse(plain))
  }

  test("entries without <loc> drop; truncated tail entries drop") {
    val xml = """<?xml version="1.0"?><urlset>
                |<url><lastmod>2024-01-01</lastmod></url>
                |<url><loc>https://k.com/kept</loc></url>
                |<url><loc>https://k.com/truncat""".stripMargin
    val es = Sitemap.parse(xml.getBytes("UTF-8"))
    assert(es != null && es.size == 1 && es.head.loc == "https://k.com/kept")
  }

  test("non-sitemap payloads refuse to NULL") {
    assert(Sitemap.parse(null) == null)
    assert(Sitemap.parse(Array.emptyByteArray) == null)
    assert(Sitemap.parse("<html><body>a page</body></html>".getBytes) == null)
    assert(Sitemap.parse(
      "User-agent: *\nDisallow: /robots-not-xml".getBytes) == null)
    // a gzip header followed by garbage refuses, never throws
    val fakeGz = Array[Byte](0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 0,
      'j', 'u', 'n', 'k')
    assert(Sitemap.parse(fakeGz) == null)
  }

  test("kind comes from the ROOT element, not a substring anywhere") {
    // a urlset whose comment mentions <sitemapindex stays a urlset
    val b = ("""<?xml version="1.0"?><!-- not a <sitemapindex --> """ +
      """<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">""" +
      "<url><loc>https://a.com/p</loc></url></urlset>").getBytes("UTF-8")
    val es = Sitemap.parse(b)
    assert(es != null && es.size == 1 && es(0).kind == "url")
    assert(es(0).loc == "https://a.com/p")
    // a payload whose root is neither kind refuses even if it MENTIONS one
    val fake = "<feed><entry><loc>x</loc></entry><!--<urlset>--></feed>"
    assert(Sitemap.parse(fake.getBytes("UTF-8")) == null)
  }

  test("an entry missing its close tag cannot swallow the document") {
    // </urlset must not prefix-match as </url: the unclosed entry
    // drops, it does not consume to an unrelated close tag
    val b = ("<urlset><url><loc>https://a.com/open</loc>" + // no </url>
      "<url><loc>https://a.com/next</loc></url></urlset>").getBytes("UTF-8")
    val es = Sitemap.parse(b)
    assert(es != null)
    // the malformed first entry must not silently swallow the second's
    // close and return a phantom; exact recovery is parser's choice,
    // but no loc may be fabricated and no exception thrown
    assert(es.forall(e => e.loc.startsWith("https://a.com/")))
  }

  test("child tags are delimiter-checked: <location2> is not <loc>") {
    val b = ("<urlset><url><location2>x</location2>" +
      "<loc>https://real.example/</loc></url></urlset>").getBytes("UTF-8")
    val es = Sitemap.parse(b)
    assert(es != null && es.size == 1)
    assert(es(0).loc == "https://real.example/")
    // a self-closing <loc/> has no text: the entry drops
    val empty = ("<urlset><url><loc/></url>" +
      "<url><loc>https://keep.example/</loc></url></urlset>").getBytes("UTF-8")
    val es2 = Sitemap.parse(empty)
    assert(es2 != null && es2.map(_.loc) == Seq("https://keep.example/"))
  }
}
