package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** url_parts: RFC 3986 decomposition + crawl normalizations. Pinned:
  * case folding, IDN punycode, userinfo strip, default-port drop,
  * dot-segment removal, IPv6 literals, and the refusal shapes.
  */
class UrlPartsSpec extends AnyFunSuite {

  test("basic decomposition with all parts") {
    val p = UrlParts.parse("https://example.com:8443/a/b?x=1&y=2#frag")
    assert(p != null)
    assert(p.scheme == "https" && p.host == "example.com" && p.port == 8443)
    assert(p.path == "/a/b" && p.query == "x=1&y=2" && p.fragment == "frag")
  }

  test("scheme and host fold to lowercase; explicit default port drops") {
    val p = UrlParts.parse("HTTPS://WWW.Example.COM:443/Path")
    assert(p.scheme == "https" && p.host == "www.example.com")
    assert(p.port == -1) // 443 is the https default
    assert(p.path == "/Path") // path case is semantic, untouched
    assert(UrlParts.parse("http://a.com:80/").port == -1)
    assert(UrlParts.parse("http://a.com:8080/").port == 8080)
    assert(UrlParts.parse("ftp://f.net:21/pub/").port == -1)
  }

  test("IDN hosts normalize to punycode") {
    val p = UrlParts.parse("http://münchen.example.de/straße")
    assert(p != null)
    assert(p.host == "xn--mnchen-3ya.example.de")
    assert(p.path == "/straße") // the PATH stays verbatim
    // already-ASCII hosts are untouched
    assert(UrlParts.parse("http://plain.com/").host == "plain.com")
  }

  test("userinfo strips; dot-segments resolve; empty path becomes /") {
    assert(UrlParts.parse("http://user:pw@site.org/x").host == "site.org")
    assert(UrlParts.parse("http://a.com/a/./b/c/../d").path == "/a/b/d")
    assert(UrlParts.parse("http://a.com/a/..").path == "/")
    assert(UrlParts.parse("http://a.com").path == "/")
    assert(UrlParts.parse("http://a.com/dir/").path == "/dir/")
  }

  test("IPv6 literals keep brackets; ports parse after them") {
    val p = UrlParts.parse("http://[2001:DB8::1]:8443/v6")
    assert(p != null && p.host == "[2001:db8::1]" && p.port == 8443)
    assert(UrlParts.parse("http://[2001:db8::2]/x").port == -1)
  }

  test("query order is never touched; absent parts are null") {
    val p = UrlParts.parse("http://a.com/p?b=2&a=1")
    assert(p.query == "b=2&a=1")
    assert(p.fragment == null)
    val q = UrlParts.parse("http://a.com/p#only-frag")
    assert(q.query == null && q.fragment == "only-frag")
  }

  test("unkeyable inputs refuse to NULL") {
    assert(UrlParts.parse(null) == null)
    assert(UrlParts.parse("") == null)
    assert(UrlParts.parse("/relative/path/only") == null)
    assert(UrlParts.parse("not a url at all") == null)
    assert(UrlParts.parse("mailto:a@b.com") == null) // no ://
    assert(UrlParts.parse("http://") == null) // empty host
    assert(UrlParts.parse("http://host:notaport/") == null)
    assert(UrlParts.parse("http://host:99999/") == null)
    assert(UrlParts.parse("http://[unclosed/") == null)
  }
}
