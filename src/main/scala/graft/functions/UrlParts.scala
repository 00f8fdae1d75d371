package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** url_parts(url string) → struct<scheme, host, port, path, query,
  * fragment> — RFC 3986 decomposition with the normalizations a crawl
  * pipeline applies before URLs become JOIN/GROUP keys (host-level
  * dedup, per-site quotas, sitemap joins). Hand-rolled: hostile crawl
  * URLs must label-refuse, not throw, and `java.net.URI` throws.
  *
  * Normalizations (the Common Crawl canonicalization subset that is
  * loss-free):
  *
  *  - scheme and host lowercase;
  *  - internationalized hostnames → punycode via the JDK's IDN
  *    (RFC 3490), so `münchen.example` keys equal `xn--mnchen-3ya
  *    .example`;
  *  - userinfo stripped from the authority (credentials are not a
  *    grouping key);
  *  - default ports dropped (http 80, https 443, ftp 21, ws 80,
  *    wss 443) — explicit `:80` and absent agree;
  *  - path dot-segments resolved per RFC 3986 §5.2.4 (`a/./b/../c`
  *    → `a/c`), empty path → `/` for http(s);
  *  - query and fragment carried verbatim (never reordered — query
  *    order can be semantic), absent → NULL.
  *
  * Anything without a `scheme://` structure (relative refs, junk,
  * data: blobs, empty hosts) → NULL: a URL that cannot key a host
  * group is data, not an error. Per-row scalar, zero shuffle.
  */
case class UrlPartsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = UrlParts.schema
  override def prettyName: String = "url_parts"
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a string url, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    UrlParts.parseRow(input.asInstanceOf[UTF8String].toString)

  override def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.UrlParts.parseRow($c.toString());
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UrlParts {

  val schema: StructType = StructType(Seq(
    StructField("scheme", StringType),
    StructField("host", StringType),
    StructField("port", IntegerType),
    StructField("path", StringType),
    StructField("query", StringType),
    StructField("fragment", StringType)))

  final case class Parts(scheme: String, host: String, port: Int,
      path: String, query: String, fragment: String)

  def parseRow(url: String): InternalRow = {
    val p = parse(url)
    if (p == null) null
    else new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](UTF8String.fromString(p.scheme), UTF8String.fromString(p.host),
        if (p.port <= 0) null else p.port,
        UTF8String.fromString(p.path),
        if (p.query == null) null else UTF8String.fromString(p.query),
        if (p.fragment == null) null else UTF8String.fromString(p.fragment)))
  }

  private val DefaultPorts = Map(
    "http" -> 80, "https" -> 443, "ftp" -> 21, "ws" -> 80, "wss" -> 443)

  /** RFC 3986 §5.2.4 remove_dot_segments. */
  private def removeDotSegments(path: String): String = {
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    var absolute = path.startsWith("/")
    path.split("/", -1).foreach {
      case "." | "" => () // empty segments from split; re-added below
      case ".." => if (out.nonEmpty) out.remove(out.size - 1)
      case seg => out += seg
    }
    val trailingSlash = path.endsWith("/") || path.endsWith("/.") ||
      path.endsWith("/..")
    val joined = out.mkString("/")
    (if (absolute) "/" else "") + joined +
      (if (trailingSlash && joined.nonEmpty) "/" else if (trailingSlash) "" else "")
  }

  /** Decomposed + normalized parts, or null for unkeyable inputs. */
  def parse(url: String): Parts = {
    if (url == null) return null
    val s = url.trim
    // scheme: ALPHA *(ALPHA / DIGIT / + / - / .) ":"
    var i = 0
    if (s.isEmpty || !s.charAt(0).isLetter) return null
    while (i < s.length && (s.charAt(i).isLetterOrDigit ||
        "+-.".indexOf(s.charAt(i)) >= 0)) i += 1
    if (i == 0 || i + 2 >= s.length || s.charAt(i) != ':' ||
        s.charAt(i + 1) != '/' || s.charAt(i + 2) != '/') return null
    val scheme = s.substring(0, i).toLowerCase(java.util.Locale.ROOT)
    var p = i + 3
    // authority ends at '/', '?', '#', or EOS
    var authEnd = p
    while (authEnd < s.length && "/?#".indexOf(s.charAt(authEnd)) < 0)
      authEnd += 1
    var auth = s.substring(p, authEnd)
    // strip userinfo
    val at = auth.lastIndexOf('@')
    if (at >= 0) auth = auth.substring(at + 1)
    if (auth.isEmpty) return null
    // split host / port ([v6]:port supported structurally)
    var host: String = null
    var portStr: String = null
    if (auth.charAt(0) == '[') {
      val close = auth.indexOf(']')
      if (close < 0) return null
      host = auth.substring(0, close + 1).toLowerCase(java.util.Locale.ROOT)
      if (close + 1 < auth.length) {
        if (auth.charAt(close + 1) != ':') return null
        portStr = auth.substring(close + 2)
      }
    } else {
      val colon = auth.lastIndexOf(':')
      if (colon >= 0) { host = auth.substring(0, colon); portStr = auth.substring(colon + 1) }
      else host = auth
      if (host.isEmpty) return null
      host = host.toLowerCase(java.util.Locale.ROOT)
      // IDN → punycode; already-ASCII hosts pass through unchanged
      try host = java.net.IDN.toASCII(host)
      catch { case _: IllegalArgumentException => return null }
      host = host.toLowerCase(java.util.Locale.ROOT)
    }
    var port = -1
    if (portStr != null) {
      if (portStr.isEmpty || !portStr.forall(_.isDigit) ||
          portStr.length > 5) return null
      port = portStr.toInt
      if (port > 65535) return null
      if (DefaultPorts.get(scheme).contains(port)) port = -1 // default drops
    }
    // path / query / fragment
    var rest = s.substring(authEnd)
    var fragment: String = null
    val hashAt = rest.indexOf('#')
    if (hashAt >= 0) { fragment = rest.substring(hashAt + 1); rest = rest.substring(0, hashAt) }
    var query: String = null
    val qAt = rest.indexOf('?')
    if (qAt >= 0) { query = rest.substring(qAt + 1); rest = rest.substring(0, qAt) }
    var path = removeDotSegments(rest)
    if (path.isEmpty && (scheme == "http" || scheme == "https")) path = "/"
    Parts(scheme, host, port, path, query, fragment)
  }
}
