package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** robots_allowed: RFC 9309 evaluation. Group selection, specificity,
  * tie-breaks, wildcards/anchors, and hostile-input permissiveness.
  */
class RobotsTxtSpec extends AnyFunSuite {

  private def ok(robots: String, agent: String, path: String) =
    RobotsTxt.allowed(robots, agent, path)

  test("basic disallow with the * group") {
    val r = """User-agent: *
              |Disallow: /private/
              |Allow: /private/ok.html""".stripMargin
    assert(!ok(r, "anybot", "/private/secret.html"))
    assert(ok(r, "anybot", "/public/page.html"))
    // longest match wins: the Allow pattern is more specific
    assert(ok(r, "anybot", "/private/ok.html"))
  }

  test("specific agent group beats *; longest agent token wins") {
    val r = """User-agent: *
              |Disallow: /
              |
              |User-agent: crawler
              |Disallow: /a/
              |
              |User-agent: crawler-news
              |Disallow:""".stripMargin
    assert(!ok(r, "otherbot", "/x")) // * group: everything disallowed
    assert(!ok(r, "crawler/1.0", "/a/page"))
    assert(ok(r, "crawler/1.0", "/b/page"))
    // "crawler-news" (12 chars) beats "crawler" (7): empty Disallow =
    // no rules = everything allowed for that agent
    assert(ok(r, "crawler-news/2.0", "/a/page"))
  }

  test("consecutive User-agent lines share one group") {
    val r = """User-agent: abot
              |User-agent: bbot
              |Disallow: /both/""".stripMargin
    assert(!ok(r, "abot", "/both/x"))
    assert(!ok(r, "bbot", "/both/x"))
    assert(ok(r, "cbot", "/both/x")) // no * group → allowed
  }

  test("wildcards and end anchors") {
    val r = """User-agent: *
              |Disallow: /*.pdf$
              |Disallow: /tmp*/
              |Allow: /tmp-keep/""".stripMargin
    assert(!ok(r, "b", "/docs/file.pdf"))
    assert(ok(r, "b", "/docs/file.pdf?x=1")) // anchored: query tail escapes
    assert(!ok(r, "b", "/tmp123/x"))
    assert(ok(r, "b", "/tmp-keep/x")) // longer allow wins
    assert(ok(r, "b", "/tmpfile")) // /tmp*/ needs the slash
  }

  test("allow wins exact-length ties (RFC 9309 §2.2.2)") {
    val r = """User-agent: *
              |Disallow: /page
              |Allow: /page""".stripMargin
    assert(ok(r, "b", "/page/x"))
  }

  test("comments, case-insensitive keys, junk lines degrade permissively") {
    val r = """# a comment line
              |USER-AGENT: * # trailing comment
              |DisAllow: /x/
              |garbage without structure
              |Crawl-delay: 10
              |Sitemap: https://example.com/sitemap.xml""".stripMargin
    assert(!ok(r, "b", "/x/1"))
    assert(ok(r, "b", "/y/1"))
    assert(ok("total garbage\nno structure at all", "b", "/anything"))
    assert(ok("", "b", "/anything"))
    assert(ok(null, "b", "/anything"))
  }

  test("rules before any User-agent line are ignored (RFC grammar)") {
    val r = """Disallow: /
              |User-agent: *
              |Disallow: /only/""".stripMargin
    assert(ok(r, "b", "/elsewhere"))
    assert(!ok(r, "b", "/only/x"))
  }

  test("hostile wildcard patterns stay linear, no regex blowup") {
    val r = "User-agent: *\nDisallow: /" + ("*a" * 30) + "$"
    val path = "/" + ("a" * 200) + "b"
    // must terminate promptly and give a verdict
    val t0 = System.nanoTime()
    val v = ok(r, "b", path)
    assert((System.nanoTime() - t0) < 2e9, "matcher too slow")
    assert(!v || v) // verdict is a boolean either way
  }
}
