package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** sitemap_urls(content binary) → array<struct<kind, loc, lastmod,
  * changefreq, priority>> — the sitemaps.org protocol, the discovery
  * side of the crawl-governance trio beside [[RobotsTxt]] (what may
  * be fetched) and [[UrlParts]] (how it keys): a pipeline joins
  * sitemap freshness (`lastmod`) against capture timestamps to
  * prioritize recrawls and to audit coverage.
  *
  *  - both document kinds: `<urlset><url>…` entries (kind "url") and
  *    `<sitemapindex><sitemap>…` entries (kind "sitemap" — index
  *    files point at child sitemaps);
  *  - per entry: `<loc>` (required — entries without one are
  *    dropped), `<lastmod>`, `<changefreq>`, `<priority>` (double);
  *  - gzip payloads (the .xml.gz convention) inflate transparently
  *    under a 64 MB bomb cap;
  *  - the XML walk is a namespace-agnostic local-name tag scanner
  *    with entity decoding (the five XML predefined + numeric) —
  *    sitemap files are machine-generated and flat, a full XML
  *    parser buys nothing here;
  *  - entries cap at 50,000 (the protocol's own per-file limit);
  *    payloads with neither root element → NULL.
  *
  * The fan-out composes with Catalyst's explode, exactly like
  * [[MboxSplit]]. Per-row inside the scan projection. */
case class SitemapUrlsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(Sitemap.entryType)
  override def prettyName: String = "sitemap_urls"
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects binary content, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    Sitemap.parseRow(input.asInstanceOf[Array[Byte]])

  override def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.Sitemap.parseRow($c);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Sitemap {

  val entryType: StructType = StructType(Seq(
    StructField("kind", StringType),
    StructField("loc", StringType),
    StructField("lastmod", StringType),
    StructField("changefreq", StringType),
    StructField("priority", DoubleType)))

  final case class Entry(kind: String, loc: String, lastmod: String,
      changefreq: String, priority: java.lang.Double)

  private val MaxEntries = 50000
  private val MaxInflated = 64L << 20

  def parseRow(b: Array[Byte]): ArrayData = {
    val es = parse(b)
    if (es == null) null
    else new GenericArrayData(es.map { e =>
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](UTF8String.fromString(e.kind), UTF8String.fromString(e.loc),
          if (e.lastmod == null) null else UTF8String.fromString(e.lastmod),
          if (e.changefreq == null) null else UTF8String.fromString(e.changefreq),
          e.priority))
    }.toArray[Any])
  }

  private def gunzip(b: Array[Byte]): Array[Byte] =
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(b))
      val out = new java.io.ByteArrayOutputStream(b.length * 4)
      val buf = new Array[Byte](16384)
      var n = in.read(buf)
      var total = 0L
      while (n > 0) {
        total += n
        if (total > MaxInflated) return null // bomb cap
        out.write(buf, 0, n)
        n = in.read(buf)
      }
      out.toByteArray
    } catch { case _: java.io.IOException => null }

  private def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi < 0 || semi - i > 10) { out.append(c); i += 1 }
        else {
          val name = s.substring(i + 1, semi)
          val decoded: Int = name match {
            case "amp" => '&'
            case "lt" => '<'
            case "gt" => '>'
            case "quot" => '"'
            case "apos" => '\''
            case _ if name.startsWith("#") =>
              try {
                val cp =
                  if (name.length > 1 && (name.charAt(1) | 0x20) == 'x')
                    Integer.parseInt(name.substring(2), 16)
                  else Integer.parseInt(name.substring(1))
                if (cp >= 0x20 && cp <= 0xffff) cp else -1
              } catch { case _: NumberFormatException => -1 }
            case _ => -1
          }
          if (decoded < 0) { out.append(c); i += 1 }
          else { out.append(decoded.toChar); i = semi + 1 }
        }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** Name of the document's root element — the first real tag after
    * any XML declaration, comments, and DOCTYPE — with a proper
    * delimiter check so `<urlsetfoo>` is not read as `urlset`. */
  private def rootTag(s: String): String = {
    var i = 0
    while (i < s.length) {
      val lt = s.indexOf('<', i)
      if (lt < 0) return null
      if (s.startsWith("<?", lt)) {
        val e = s.indexOf("?>", lt); if (e < 0) return null; i = e + 2
      } else if (s.startsWith("<!--", lt)) {
        val e = s.indexOf("-->", lt); if (e < 0) return null; i = e + 3
      } else if (s.startsWith("<!", lt)) {
        val e = s.indexOf('>', lt); if (e < 0) return null; i = e + 1
      } else {
        var j = lt + 1
        while (j < s.length && s.charAt(j) != '>' && s.charAt(j) != '/' &&
            !s.charAt(j).isWhitespace) j += 1
        return s.substring(lt + 1, j)
      }
    }
    null
  }

  /** Entries, or null when the payload is not a sitemap document. */
  def parse(b0: Array[Byte]): Seq[Entry] = {
    if (b0 == null || b0.length < 10) return null
    val b =
      if ((b0(0) & 0xff) == 0x1f && (b0(1) & 0xff) == 0x8b) gunzip(b0)
      else b0
    if (b == null) return null
    val s = new String(b, java.nio.charset.StandardCharsets.UTF_8)
    // Kind comes from the ROOT element, not a substring anywhere in the
    // payload — a urlset merely mentioning "<sitemapindex" in a comment
    // or escaped text must not be misclassified.
    val root = rootTag(s)
    val isIndex = root == "sitemapindex"
    if (!isIndex && root != "urlset") return null
    val (entryTag, kind) = if (isIndex) ("sitemap", "sitemap") else ("url", "url")
    val out = Vector.newBuilder[Entry]
    var count = 0

    // Close tag with a real delimiter after the name, so scanning for
    // "</url" cannot prefix-match "</urlset".
    def closeOf(tag: String, from: Int): Int = {
      var k = s.indexOf("</" + tag, from)
      while (k >= 0) {
        val a = k + 2 + tag.length
        if (a < s.length &&
            (s.charAt(a) == '>' || s.charAt(a).isWhitespace)) return k
        k = s.indexOf("</" + tag, k + 1)
      }
      -1
    }

    // same delimiter discipline as the entry scan: "<loc" must not
    // match "<location2>", and "</loc" must not close on it either
    def childText(block: String, tag: String): String = {
      var open = block.indexOf("<" + tag)
      while (open >= 0) {
        val after = open + 1 + tag.length
        if (after < block.length && (block.charAt(after) == '>' ||
            block.charAt(after).isWhitespace || block.charAt(after) == '/')) {
          val gt = block.indexOf('>', open)
          if (gt < 0) return null
          if (block.charAt(gt - 1) == '/') return null // self-closing: empty
          var close = block.indexOf("</" + tag, gt + 1)
          while (close >= 0) {
            val a = close + 2 + tag.length
            if (a < block.length && (block.charAt(a) == '>' ||
                block.charAt(a).isWhitespace))
              return decodeEntities(block.substring(gt + 1, close).trim)
            close = block.indexOf("</" + tag, close + 1)
          }
          return null
        }
        open = block.indexOf("<" + tag, open + 1)
      }
      null
    }

    var at = s.indexOf("<" + entryTag)
    while (at >= 0 && count < MaxEntries) {
      // require a delimiter after the tag name (not <urlsetfoo>)
      val after = at + 1 + entryTag.length
      val delimOk = after < s.length &&
        (s.charAt(after) == '>' || s.charAt(after).isWhitespace ||
          s.charAt(after) == '/')
      if (!delimOk) at = s.indexOf("<" + entryTag, at + 1)
      else {
        val end = closeOf(entryTag, at)
        if (end < 0) at = -1 // truncated tail entry drops
        else {
          val block = s.substring(at, end)
          val loc = childText(block, "loc")
          if (loc != null && loc.nonEmpty) {
            val priority: java.lang.Double =
              childText(block, "priority") match {
                case null => null
                case p => try java.lang.Double.valueOf(p)
                  catch { case _: NumberFormatException => null }
              }
            out += Entry(kind, loc, childText(block, "lastmod"),
              childText(block, "changefreq"), priority)
            count += 1
          }
          at = s.indexOf("<" + entryTag, end)
        }
      }
    }
    out.result()
  }

  // ------------------------------------------------- fixture encoder

  /** A REAL sitemap (or index when `index = true`); `gz` wraps it in
    * gzip — the .xml.gz convention. Locs are entity-escaped. */
  def encodeSitemap(entries: Seq[(String, String, String, java.lang.Double)],
      index: Boolean = false, gz: Boolean = false): Array[Byte] = {
    val root = if (index) "sitemapindex" else "urlset"
    val entry = if (index) "sitemap" else "url"
    val sb = new java.lang.StringBuilder(512)
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
    sb.append(s"""<$root xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n""")
    entries.foreach { case (loc, lastmod, changefreq, priority) =>
      sb.append(s"  <$entry>\n")
      val escLoc = loc.replace("&", "&amp;").replace("<", "&lt;")
      sb.append(s"    <loc>$escLoc</loc>\n")
      if (lastmod != null) sb.append(s"    <lastmod>$lastmod</lastmod>\n")
      if (changefreq != null)
        sb.append(s"    <changefreq>$changefreq</changefreq>\n")
      if (priority != null) sb.append(s"    <priority>$priority</priority>\n")
      sb.append(s"  </$entry>\n")
    }
    sb.append(s"</$root>\n")
    val xml = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    if (!gz) xml
    else {
      val out = new java.io.ByteArrayOutputStream(xml.length / 2 + 64)
      val g = new java.util.zip.GZIPOutputStream(out)
      g.write(xml); g.close()
      out.toByteArray
    }
  }
}
