package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** docx_text(content binary) -> string — text extraction from Office
  * Open XML word documents (ISO/IEC 29500), the office-document slice
  * of a real crawl. Zero new dependencies:
  *
  *  - Container: a ZIP archive read with the JDK's `ZipInputStream`;
  *    the document body lives in the `word/document.xml` entry
  *    (64 MB decompressed cap against zip bombs).
  *  - WordprocessingML walk: text lives in `<w:t>` elements (runs
  *    concatenate WITHOUT separators — a word may span runs); paragraph
  *    ends (`</w:p>`), explicit breaks (`<w:br/>`), and tabs (`<w:tab/>`)
  *    contribute whitespace separators. Everything else is markup and
  *    drops. XML character references decode (the five predefined
  *    entities + numeric forms, shared with [[HtmlText]]).
  *  - Output whitespace collapses to single spaces and is trimmed —
  *    the same normalization contract as `html_to_text`, so downstream
  *    curation treats both sources identically.
  *
  * Not a DOCX / not a ZIP / no document.xml / malformed ZIP → NULL,
  * never an exception: corrupt attachments in a 100 TB crawl are data.
  * Per-row inside the scan projection (static-invoke codegen), zero
  * shuffle.
  */
case class DocxTextExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "docx_text"
  override def nullable: Boolean = true // non-docx bytes yield NULL

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects binary content, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    OfficeText.docxTextU(input.asInstanceOf[Array[Byte]])

  override def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.OfficeText.docxTextU($c);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** epub_text(content binary) -> string — the ebook slice of a crawl;
  * see [[OfficeText.epubText]] for the extraction contract. */
case class EpubTextExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "epub_text"
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects binary content, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    OfficeText.epubTextU(input.asInstanceOf[Array[Byte]])

  override def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.OfficeText.epubTextU($c);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object OfficeText {

  private val MaxXmlBytes = 64 << 20

  def docxTextU(b: Array[Byte]): UTF8String = {
    val s = docxText(b)
    if (s == null) null else UTF8String.fromString(s)
  }

  /** Extracted text, or null when the payload isn't a readable DOCX. */
  def docxText(b: Array[Byte]): String = {
    if (b == null || b.length < 4) return null
    // ZIP local-file-header magic "PK\3\4"
    if (!(b(0) == 'P' && b(1) == 'K' && b(2) == 3 && b(3) == 4)) return null
    try {
      val zin = new java.util.zip.ZipInputStream(
        new java.io.ByteArrayInputStream(b))
      var entry = zin.getNextEntry
      while (entry != null) {
        if (entry.getName == "word/document.xml") {
          val out = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          var n = zin.read(buf)
          while (n >= 0 && out.size <= MaxXmlBytes) {
            out.write(buf, 0, n)
            n = zin.read(buf)
          }
          if (out.size > MaxXmlBytes) return null // zip bomb: refuse
          return extractWml(new String(out.toByteArray,
            java.nio.charset.StandardCharsets.UTF_8))
        }
        entry = zin.getNextEntry
      }
      null // a ZIP, but not a word document
    } catch {
      case _: java.io.IOException => null
      case _: IllegalArgumentException => null // malformed entry names
    }
  }

  /** WordprocessingML text walk: w:t content with XML entity decode,
    * w:p / w:br / w:tab separators, whitespace collapse + trim. */
  private def extractWml(xml: String): String = {
    val n = xml.length
    val out = new java.lang.StringBuilder(n / 4)
    var pendingSpace = false
    def emit(c: Char): Unit = {
      if (c == ' ' || c == '\t' || c == '\r' || c == '\n') pendingSpace = true
      else {
        if (pendingSpace && out.length > 0) out.append(' ')
        pendingSpace = false
        out.append(c)
      }
    }
    var i = 0
    var inText = false
    while (i < n) {
      val c = xml.charAt(i)
      if (c == '<') {
        // classify the tag, then skip to its '>'
        val close = xml.indexOf('>', i + 1)
        if (close < 0) return out.toString // truncated markup: keep prefix
        val body = xml.substring(i + 1, close)
        // Exact-name tag match: `name`, `name attr…`, or self-closing
        // `name/`. A prefix test alone would let </w:proofErr> or
        // <w:pPr> (both between runs in real Word output) masquerade
        // as a paragraph break and split words across runs.
        def isTag(name: String): Boolean =
          body == name || body.startsWith(name + " ") ||
            body.startsWith(name + "/")
        if (inText && isTag("/w:t")) inText = false
        else if (!inText && isTag("w:t"))
          inText = true // <w:t> or <w:t xml:space="preserve">
        else if (isTag("/w:p") || isTag("w:br") || isTag("w:tab") ||
            isTag("w:cr"))
          pendingSpace = true
        i = close + 1
      } else if (inText) {
        if (c == '&') {
          val semi = xml.indexOf(';', i + 1)
          if (semi > i && semi - i <= 10) {
            val decoded = xml.substring(i + 1, semi) match {
              case "amp" => "&"
              case "lt" => "<"
              case "gt" => ">"
              case "quot" => "\""
              case "apos" => "'"
              case ref if ref.startsWith("#") =>
                try {
                  val cp =
                    if (ref.length > 1 && (ref.charAt(1) | 0x20) == 'x')
                      Integer.parseInt(ref.substring(2), 16)
                    else Integer.parseInt(ref.substring(1))
                  if (cp >= 0x20 && cp <= 0x10ffff &&
                      !(cp >= 0xd800 && cp <= 0xdfff))
                    new String(Character.toChars(cp))
                  else null
                } catch { case _: Exception => null }
              case _ => null
            }
            if (decoded != null) {
              decoded.foreach(emit)
              i = semi + 1
            } else { // not a reference: keep the ampersand
              emit('&')
              i += 1
            }
          } else {
            emit('&')
            i += 1
          }
        } else {
          emit(c)
          i += 1
        }
      } else i += 1
    }
    out.toString
  }

  /** Extracted EPUB text, or null when the payload isn't an EPUB.
    * Detection is the spec's own: a ZIP whose `mimetype` entry reads
    * `application/epub+zip` (EPUB OCF requires it first and stored).
    * Every `.xhtml`/`.html` entry is extracted with the SAME state
    * machine as `html_to_text` ([[HtmlText.extract]]) and chapters
    * join with single spaces in ZIP order — the deterministic
    * approximation of spine order a crawl extractor uses when it
    * doesn't parse the OPF package document. */
  def epubText(b: Array[Byte]): String = {
    if (b == null || b.length < 4) return null
    if (!(b(0) == 'P' && b(1) == 'K' && b(2) == 3 && b(3) == 4)) return null
    try {
      val zin = new java.util.zip.ZipInputStream(
        new java.io.ByteArrayInputStream(b))
      var entry = zin.getNextEntry
      var isEpub = false
      val parts = Seq.newBuilder[String]
      var total = 0L
      while (entry != null) {
        val name = entry.getName
        if (name == "mimetype" || name.endsWith(".xhtml") ||
            name.endsWith(".html")) {
          val out = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          var n = zin.read(buf)
          while (n >= 0 && total <= MaxXmlBytes) {
            out.write(buf, 0, n)
            total += n
            n = zin.read(buf)
          }
          if (total > MaxXmlBytes) return null // bomb: refuse
          val content = new String(out.toByteArray,
            java.nio.charset.StandardCharsets.UTF_8)
          if (name == "mimetype") {
            if (content.trim != "application/epub+zip") return null
            isEpub = true
          } else parts += HtmlText.extract(content)
        }
        entry = zin.getNextEntry
      }
      if (!isEpub) return null
      val text = parts.result().filter(_.nonEmpty).mkString(" ")
      if (text.isEmpty) null else text
    } catch {
      case _: java.io.IOException => null
      case _: IllegalArgumentException => null
    }
  }

  def epubTextU(b: Array[Byte]): UTF8String = {
    val s = epubText(b)
    if (s == null) null else UTF8String.fromString(s)
  }

  // ------------------------------------------------------------- encode

  /** Real DOCX bytes for fixtures + tests: a ZIP with [Content_Types],
    * rels, and a word/document.xml whose paragraphs each split into TWO
    * runs mid-text (extraction must concatenate runs without
    * separators); XML specials in the text are escaped on write. */
  def encodeDocx(paragraphs: Seq[String]): Array[Byte] = {
    def esc(s: String): String = s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case c => c.toString
    }
    val body = paragraphs.map { p =>
      val mid = p.length / 2
      val (a, bb) = p.splitAt(mid)
      s"<w:p><w:r><w:t xml:space=\"preserve\">${esc(a)}</w:t></w:r>" +
        s"<w:r><w:t xml:space=\"preserve\">${esc(bb)}</w:t></w:r></w:p>"
    }.mkString
    val doc =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">""" +
        s"<w:body>$body</w:body></w:document>"
    val types =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
        """<Default Extension="xml" ContentType="application/xml"/>""" +
        """<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>""" +
        "</Types>"
    val rels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>""" +
        "</Relationships>"
    val out = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(out)
    def put(name: String, content: String): Unit = {
      z.putNextEntry(new java.util.zip.ZipEntry(name))
      val bytes = content.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      z.write(bytes, 0, bytes.length)
      z.closeEntry()
    }
    put("[Content_Types].xml", types)
    put("_rels/.rels", rels)
    put("word/document.xml", doc)
    z.close()
    out.toByteArray
  }

  /** Real EPUB bytes for fixtures + tests: OCF mimetype entry (stored,
    * first — the spec's own detector), container.xml, and one XHTML
    * chapter per string (entities escaped on write). */
  def encodeEpub(chapters: Seq[String]): Array[Byte] = {
    def esc(t: String): String = t.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case c => c.toString
    }
    val out = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(out)
    val mime = "application/epub+zip".getBytes("US-ASCII")
    val me = new java.util.zip.ZipEntry("mimetype")
    me.setMethod(java.util.zip.ZipOutputStream.STORED)
    me.setSize(mime.length)
    val crc = new java.util.zip.CRC32(); crc.update(mime)
    me.setCrc(crc.getValue)
    z.putNextEntry(me); z.write(mime); z.closeEntry()
    def put(name: String, content: String): Unit = {
      z.putNextEntry(new java.util.zip.ZipEntry(name))
      val bytes = content.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      z.write(bytes, 0, bytes.length)
      z.closeEntry()
    }
    put("META-INF/container.xml",
      """<?xml version="1.0"?><container version="1.0"><rootfiles>""" +
        """<rootfile full-path="OEBPS/content.opf"/></rootfiles></container>""")
    chapters.zipWithIndex.foreach { case (c, i) =>
      put(f"OEBPS/chap$i%03d.xhtml",
        "<?xml version=\"1.0\"?><html><head><title></title></head>" +
          s"<body><p>${esc(c)}</p></body></html>")
    }
    z.close()
    out.toByteArray
  }
}
