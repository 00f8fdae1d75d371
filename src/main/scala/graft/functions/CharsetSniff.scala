package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** sniff_text(content binary) → struct<charset, source, text> — the
  * bytes→text front door of a crawl pipeline: WARC response bodies
  * arrive as bytes in whatever encoding the origin served, and every
  * downstream text operator ([[HtmlText]], language-ID, quality
  * scoring) needs Unicode. This is the detection cascade real
  * WET-extraction pipelines run, each step labeled in `source` so
  * curation can weight confidence:
  *
  *  1. `bom` — UTF-8 / UTF-16LE / UTF-16BE / UTF-32LE / UTF-32BE byte
  *     order marks (consumed, not emitted into the text);
  *  2. `meta` — the WHATWG-style prescan of the first 1024 bytes for
  *     `<meta charset=...>` / `<meta http-equiv Content-Type
  *     content="...; charset=...">`, case-insensitive, quoted or bare;
  *     the label resolves through the JDK charset registry (aliases
  *     included — "latin1", "shift_jis", "gbk", …), x-user-defined
  *     and unresolvable labels fall through the cascade;
  *  3. `utf8-valid` — a strict full-payload UTF-8 validation scan
  *     (overlongs, surrogates, and >U+10FFFF rejected) that saw at
  *     least one multi-byte sequence; pure 7-bit payloads are
  *     `ascii`;
  *  4. `fallback` — windows-1252, the de-facto web default.
  *
  * BINARY payloads refuse: a NUL byte in the first 1024 bytes → NULL
  * row (images mislabeled as text are data, not text). Per-row inside
  * the scan projection, zero shuffle at any scale.
  */
case class SniffTextExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = CharsetSniff.schema
  override def prettyName: String = "sniff_text"
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects binary content, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    CharsetSniff.parseRow(input.asInstanceOf[Array[Byte]])

  override def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.CharsetSniff.parseRow($c);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharsetSniff {

  val schema: StructType = StructType(Seq(
    StructField("charset", StringType),
    StructField("source", StringType),
    StructField("text", StringType)))

  final case class Sniffed(charset: String, source: String, text: String)

  def parseRow(b: Array[Byte]): InternalRow = {
    val s = sniff(b)
    if (s == null) null
    else new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](UTF8String.fromString(s.charset),
        UTF8String.fromString(s.source), UTF8String.fromString(s.text)))
  }

  /** Strict UTF-8 validation; returns 1 = pure ASCII, 2 = valid with
    * multi-byte sequences, 0 = invalid. */
  private def utf8Class(b: Array[Byte]): Int = {
    var i = 0
    var multi = false
    while (i < b.length) {
      val c = b(i) & 0xff
      if (c < 0x80) i += 1
      else {
        multi = true
        val (len, lo) =
          if (c >= 0xc2 && c <= 0xdf) (2, 0x80)
          else if (c == 0xe0) (3, 0xa0) // no overlongs
          else if (c >= 0xe1 && c <= 0xec) (3, 0x80)
          else if (c == 0xed) (3, 0x80) // surrogates checked below
          else if (c >= 0xee && c <= 0xef) (3, 0x80)
          else if (c == 0xf0) (4, 0x90)
          else if (c >= 0xf1 && c <= 0xf3) (4, 0x80)
          else if (c == 0xf4) (4, 0x80) // ≤ U+10FFFF checked below
          else return 0
        if (i.toLong + len > b.length) return 0
        var j = 1
        while (j < len) {
          val cc = b(i + j) & 0xff
          val hiCap =
            if (j == 1 && c == 0xed) 0x9f // no surrogates
            else if (j == 1 && c == 0xf4) 0x8f // no > U+10FFFF
            else 0xbf
          val loCap = if (j == 1) lo else 0x80
          if (cc < loCap || cc > hiCap) return 0
          j += 1
        }
        i += len
      }
    }
    if (multi) 2 else 1
  }

  /** WHATWG-style meta prescan over the first 1024 bytes: walk `<meta`
    * tags (delimiter-checked) and honor "charset" tokens only INSIDE
    * one — script text like `document.charset="shift_jis"` or visible
    * head content must not force the decode. Returns the label or
    * null. */
  private def metaCharset(b: Array[Byte]): String = {
    val n = math.min(b.length, 1024)
    val s = new String(b, 0, n,
      java.nio.charset.StandardCharsets.ISO_8859_1)
      .toLowerCase(java.util.Locale.ROOT)
    var from = 0
    while (from >= 0 && from < s.length) {
      val tag = s.indexOf("<meta", from)
      if (tag < 0) return null
      val after = tag + 5
      if (after < s.length &&
          (s.charAt(after).isWhitespace || s.charAt(after) == '/')) {
        val got = charsetToken(s, after, tagEnd(s, after))
        if (got != null) return got
      }
      from = after
    }
    null
  }

  /** Index of the tag-closing '>' from `from`, quote-aware: a '>'
    * inside a quoted attribute value (`data-x="a>b"`) does not end the
    * tag. Unterminated tag → end of the prescan window. */
  private def tagEnd(s: String, from: Int): Int = {
    var i = from
    var quote = 0.toChar
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') quote = c
      else if (c == '>') return i
      i += 1
    }
    s.length
  }

  /** `charset = [quote] label` token parse within [start, limit) — the
    * attribute span of one meta tag. */
  private def charsetToken(s: String, start: Int, limit: Int): String = {
    var from = start
    while (from >= 0 && from < limit) {
      val at = s.indexOf("charset", from)
      if (at < 0 || at >= limit) return null
      var p = at + "charset".length
      while (p < limit && s.charAt(p).isWhitespace) p += 1
      if (p < limit && s.charAt(p) == '=') {
        p += 1
        while (p < limit && s.charAt(p).isWhitespace) p += 1
        if (p < limit) {
          val quote = s.charAt(p)
          if (quote == '"' || quote == '\'') {
            val end = s.indexOf(quote, p + 1)
            if (end > p + 1 && end <= limit)
              return s.substring(p + 1, end).trim
          } else {
            var e = p
            while (e < limit && !s.charAt(e).isWhitespace &&
                s.charAt(e) != ';' && s.charAt(e) != '"' &&
                s.charAt(e) != '\'' && s.charAt(e) != '>' &&
                s.charAt(e) != '/') e += 1
            if (e > p) return s.substring(p, e)
          }
        }
      }
      from = at + 1
    }
    null
  }

  private[functions] def resolve(label: String): java.nio.charset.Charset = {
    if (label == null || label.isEmpty) return null
    // the WHATWG mappings browsers apply before the registry
    val norm = label match {
      case "utf8" => "utf-8"
      case "latin1" | "iso-8859-1" | "us-ascii" | "ascii" => "windows-1252"
      // a meta tag readable by an ASCII prescan cannot be UTF-16/32:
      // WHATWG maps these labels to UTF-8
      case "utf-16" | "utf-16le" | "utf-16be" | "utf16" => "utf-8"
      case "x-user-defined" => return null // no JDK equivalent: fall through
      case other => other
    }
    try java.nio.charset.Charset.forName(norm)
    catch { case _: Exception => null }
  }

  private[functions] def decode(b: Array[Byte], from: Int,
      cs: java.nio.charset.Charset): String =
    try {
      val dec = cs.newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPLACE)
      dec.decode(java.nio.ByteBuffer.wrap(b, from, b.length - from)).toString
    } catch { case scala.util.control.NonFatal(_) => null }

  /** The detection cascade, or null for binary payloads. */
  def sniff(b: Array[Byte]): Sniffed = {
    if (b == null) return null
    if (b.length == 0) return Sniffed("ascii", "ascii", "")
    // binary gate: a NUL in the first 1024 bytes — UNLESS it is part
    // of a UTF-16/32 BOM'd payload where NULs are code-unit padding
    val bom: (String, Int) =
      if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xfe &&
          b(2) == 0 && b(3) == 0) ("utf-32le", 4)
      else if (b.length >= 4 && b(0) == 0 && b(1) == 0 &&
          (b(2) & 0xff) == 0xfe && (b(3) & 0xff) == 0xff) ("utf-32be", 4)
      else if (b.length >= 3 && (b(0) & 0xff) == 0xef &&
          (b(1) & 0xff) == 0xbb && (b(2) & 0xff) == 0xbf) ("utf-8", 3)
      else if (b.length >= 2 && (b(0) & 0xff) == 0xfe &&
          (b(1) & 0xff) == 0xff) ("utf-16be", 2)
      else if (b.length >= 2 && (b(0) & 0xff) == 0xff &&
          (b(1) & 0xff) == 0xfe) ("utf-16le", 2)
      else (null, 0)
    if (bom._1 != null) {
      // straight to the registry: the WHATWG utf-16→utf-8 remap in
      // resolve() is a META-label rule and must not touch BOMs
      val cs = java.nio.charset.Charset.forName(bom._1)
      val text = decode(b, bom._2, cs)
      if (text == null) return null
      return Sniffed(bom._1, "bom", text)
    }
    val scanLen = math.min(b.length, 1024)
    var i = 0
    while (i < scanLen) {
      if (b(i) == 0) return null // binary content, not text
      i += 1
    }
    val metaLabel = metaCharset(b)
    if (metaLabel != null) {
      val cs = resolve(metaLabel)
      if (cs != null) {
        val text = decode(b, 0, cs)
        if (text != null)
          return Sniffed(cs.name().toLowerCase(java.util.Locale.ROOT),
            "meta", text)
      }
    }
    utf8Class(b) match {
      case 2 => Sniffed("utf-8", "utf8-valid",
        new String(b, java.nio.charset.StandardCharsets.UTF_8))
      case 1 => Sniffed("ascii", "ascii",
        new String(b, java.nio.charset.StandardCharsets.US_ASCII))
      case _ =>
        val text = decode(b, 0,
          java.nio.charset.Charset.forName("windows-1252"))
        if (text == null) null else Sniffed("windows-1252", "fallback", text)
    }
  }
}
