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

/** xlsx_text(content binary) -> string — the spreadsheet slice of a
  * crawl; see [[OfficeText.xlsxText]] for the extraction contract. */
case class XlsxTextExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "xlsx_text"
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects binary content, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    OfficeText.xlsxTextU(input.asInstanceOf[Array[Byte]])

  override def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.OfficeText.xlsxTextU($c);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** pptx_text(content binary) -> string — the slide-deck slice of a
  * crawl; see [[OfficeText.pptxText]] for the extraction contract. */
case class PptxTextExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "pptx_text"
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects binary content, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    OfficeText.pptxTextU(input.asInstanceOf[Array[Byte]])

  override def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.OfficeText.pptxTextU($c);
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
  private def extractWml(xml: String): String =
    extractRuns(xml, "w:t", Set("/w:p", "w:br", "w:tab", "w:cr"))

  /** An XML entity reference starting at `xml(i) == '&'`: the decoded
    * replacement and the index after the reference, or null when the
    * ampersand isn't a well-formed reference (callers keep the '&').
    * The five predefined entities + numeric forms, surrogate-range and
    * control code points refused — the contract [[HtmlText]] set. */
  private def entityAt(xml: String, i: Int): (String, Int) = {
    val semi = xml.indexOf(';', i + 1)
    if (semi <= i || semi - i > 10) return null
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
    if (decoded == null) null else (decoded, semi + 1)
  }

  /** Plain entity decode for non-run element content (spreadsheet cell
    * values, formula strings). */
  private def decodeXml(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val e = entityAt(s, i)
        if (e != null) { out.append(e._1); i = e._2 }
        else { out.append(c); i += 1 }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** The shared run walk behind DOCX (`w:t`) and PPTX (`a:t`): text
    * inside `textTag` elements with entity decode, tags in `breakTags`
    * contributing whitespace separators, everything else dropped;
    * output whitespace collapses to single spaces and is trimmed. */
  private def extractRuns(xml: String, textTag: String,
      breakTags: Set[String]): String = {
    val n = xml.length
    val closeTag = "/" + textTag
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
        if (inText && isTag(closeTag)) inText = false
        else if (!inText && isTag(textTag) && !body.endsWith("/"))
          inText = true // <w:t> or <w:t xml:space="preserve">; a
          // SELF-CLOSING <w:t/> (real Word output writes empty runs)
          // must not enter text mode — it has no matching close tag,
          // and raw text of unrelated elements would leak out
        else if (breakTags.exists(isTag))
          pendingSpace = true
        i = close + 1
      } else if (inText) {
        if (c == '&') {
          val e = entityAt(xml, i)
          if (e != null) {
            e._1.foreach(emit)
            i = e._2
          } else { // not a reference: keep the ampersand
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

  // ------------------------------------------------- xlsx / pptx (r20)

  /** Wanted ZIP entries as (name, bytes) in write order, or null when
    * the cumulative decompressed size blows the bomb cap. */
  private def zipEntries(b: Array[Byte], want: String => Boolean)
      : Seq[(String, Array[Byte])] = {
    val zin = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(b))
    val out = Seq.newBuilder[(String, Array[Byte])]
    var total = 0L
    var entry = zin.getNextEntry
    while (entry != null) {
      if (want(entry.getName)) {
        val bos = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = zin.read(buf)
        while (n >= 0 && total <= MaxXmlBytes) {
          bos.write(buf, 0, n)
          total += n
          n = zin.read(buf)
        }
        if (total > MaxXmlBytes) return null // zip bomb: refuse
        out += entry.getName -> bos.toByteArray
      }
      entry = zin.getNextEntry
    }
    out.result()
  }

  private def isZip(b: Array[Byte]): Boolean =
    b != null && b.length >= 4 &&
      b(0) == 'P' && b(1) == 'K' && b(2) == 3 && b(3) == 4

  /** `attrName="value"` (or single-quoted) inside one tag body. */
  private def attr(tagBody: String, name: String): String = {
    var from = 0
    while (from < tagBody.length) {
      val at = tagBody.indexOf(name + "=", from)
      if (at < 0) return null
      // attribute names are delimited by whitespace in OOXML output
      if (at == 0 || !tagBody.charAt(at - 1).isWhitespace) {
        from = at + 1
      } else {
        if (at + name.length + 1 >= tagBody.length) return null
        val q = tagBody.charAt(at + name.length + 1)
        if (q != '"' && q != '\'') return null
        val start = at + name.length + 2
        val end = tagBody.indexOf(q, start)
        return if (end < 0) null else tagBody.substring(start, end)
      }
    }
    null
  }

  /** First `<tag>…</tag>` child's raw content (delimiter-checked). */
  private def childContent(block: String, tag: String): String = {
    var at = block.indexOf("<" + tag)
    while (at >= 0) {
      val after = at + 1 + tag.length
      if (after < block.length && (block.charAt(after) == '>' ||
          block.charAt(after).isWhitespace || block.charAt(after) == '/')) {
        val gt = block.indexOf('>', at)
        if (gt < 0) return null
        if (block.charAt(gt - 1) == '/') return "" // self-closing
        val close = block.indexOf("</" + tag + ">", gt + 1)
        return if (close < 0) null else block.substring(gt + 1, close)
      }
      at = block.indexOf("<" + tag, at + 1)
    }
    null
  }

  /** sharedStrings.xml → the string table: one entry per `<si>` block,
    * rich-text runs (`<r><t>…</t></r>…`) concatenated without
    * separators — the same run contract as WordprocessingML. */
  private def parseSharedStrings(xml: String): IndexedSeq[String] = {
    val out = IndexedSeq.newBuilder[String]
    var at = xml.indexOf("<si")
    while (at >= 0) {
      val after = at + 3
      if (after < xml.length && (xml.charAt(after) == '>' ||
          xml.charAt(after).isWhitespace)) {
        val end = xml.indexOf("</si>", at)
        if (end < 0) return out.result() // truncated: keep prefix
        out += extractRuns(xml.substring(at, end), "t", Set.empty)
        at = xml.indexOf("<si", end)
      } else at = xml.indexOf("<si", at + 1)
    }
    out.result()
  }

  /** One worksheet's cell values in row-major order, space-joined.
    * Cell kinds per SpreadsheetML: `t="s"` shared-string index,
    * `t="inlineStr"` inline `<is><t>` runs, everything else (`t` absent
    * = number, `t="str"` formula string, `t="b"`/`t="e"`) emits the raw
    * `<v>` serialization — cell VALUES are the text a curation pipeline
    * wants, numbers included. Out-of-range shared indexes drop the CELL,
    * never the sheet. */
  private def sheetText(xml: String, shared: IndexedSeq[String]): String = {
    val cells = Seq.newBuilder[String]
    var at = xml.indexOf("<c")
    while (at >= 0) {
      val after = at + 2
      val delimOk = after < xml.length &&
        (xml.charAt(after) == '>' || xml.charAt(after).isWhitespace ||
          xml.charAt(after) == '/')
      if (!delimOk) at = xml.indexOf("<c", at + 1)
      else {
        val gt = xml.indexOf('>', at)
        if (gt < 0) return cells.result().mkString(" ") // truncated
        val tagBody = xml.substring(at + 1, gt)
        if (tagBody.endsWith("/")) at = xml.indexOf("<c", gt) // empty cell
        else {
          val end = xml.indexOf("</c>", gt)
          if (end < 0) return cells.result().mkString(" ")
          val content = xml.substring(gt + 1, end)
          val t = attr(tagBody, "t")
          val v: String =
            if (t == "s") {
              val idx = Option(childContent(content, "v"))
                .flatMap(s => s.trim.toIntOption).getOrElse(-1)
              if (idx >= 0 && idx < shared.length) shared(idx) else null
            } else if (t == "inlineStr")
              extractRuns(content, "t", Set.empty)
            else Option(childContent(content, "v")).map(decodeXml).orNull
          if (v != null && v.nonEmpty) cells += v
          at = xml.indexOf("<c", end)
        }
      }
    }
    cells.result().mkString(" ")
  }

  private def numberedOrder(name: String): (Int, String) = {
    val m = "(\\d+)\\.xml$".r.findFirstMatchIn(name)
    (m.map(_.group(1).toInt).getOrElse(Int.MaxValue), name)
  }

  /** Extracted XLSX text, or null when the payload isn't a readable
    * workbook (detection: a ZIP carrying `xl/workbook.xml`). Sheets
    * extract in numeric name order (`sheet1.xml`, `sheet2.xml`, …) —
    * the deterministic approximation of workbook order an extractor
    * uses without chasing the rels indirection, same discipline as
    * EPUB's zip-order spine — and join with single spaces. */
  def xlsxText(b: Array[Byte]): String = {
    if (!isZip(b)) return null
    try {
      val entries = zipEntries(b, n =>
        n == "xl/workbook.xml" || n == "xl/sharedStrings.xml" ||
          (n.startsWith("xl/worksheets/") && n.endsWith(".xml")))
      if (entries == null || !entries.exists(_._1 == "xl/workbook.xml"))
        return null
      val shared = entries.find(_._1 == "xl/sharedStrings.xml")
        .map(e => parseSharedStrings(new String(e._2,
          java.nio.charset.StandardCharsets.UTF_8)))
        .getOrElse(IndexedSeq.empty)
      val text = entries.filter(_._1.startsWith("xl/worksheets/"))
        .sortBy(e => numberedOrder(e._1))
        .map(e => sheetText(new String(e._2,
          java.nio.charset.StandardCharsets.UTF_8), shared))
        .filter(_.nonEmpty).mkString(" ")
      if (text.isEmpty) null else text
    } catch {
      case _: java.io.IOException => null
      case _: IllegalArgumentException => null
    }
  }

  def xlsxTextU(b: Array[Byte]): UTF8String = {
    val s = xlsxText(b)
    if (s == null) null else UTF8String.fromString(s)
  }

  /** Extracted PPTX text, or null when the payload isn't a readable
    * deck (detection: a ZIP carrying `ppt/presentation.xml`). Slides
    * extract in numeric name order; DrawingML runs (`<a:t>`)
    * concatenate without separators, paragraph ends (`</a:p>`) and
    * breaks (`<a:br/>`) contribute whitespace — the [[extractRuns]]
    * contract DOCX set. */
  def pptxText(b: Array[Byte]): String = {
    if (!isZip(b)) return null
    try {
      val entries = zipEntries(b, n =>
        n == "ppt/presentation.xml" ||
          (n.startsWith("ppt/slides/slide") && n.endsWith(".xml")))
      if (entries == null ||
          !entries.exists(_._1 == "ppt/presentation.xml")) return null
      val text = entries.filter(_._1.startsWith("ppt/slides/"))
        .sortBy(e => numberedOrder(e._1))
        .map(e => extractRuns(new String(e._2,
          java.nio.charset.StandardCharsets.UTF_8), "a:t",
          Set("/a:p", "a:br")))
        .filter(_.nonEmpty).mkString(" ")
      if (text.isEmpty) null else text
    } catch {
      case _: java.io.IOException => null
      case _: IllegalArgumentException => null
    }
  }

  def pptxTextU(b: Array[Byte]): UTF8String = {
    val s = pptxText(b)
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

  private def xmlEsc(s: String): String = s.flatMap {
    case '&' => "&amp;"
    case '<' => "&lt;"
    case '>' => "&gt;"
    case c => c.toString
  }

  private def newZip(): (java.io.ByteArrayOutputStream,
      java.util.zip.ZipOutputStream, (String, String) => Unit) = {
    val out = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(out)
    val put = (name: String, content: String) => {
      z.putNextEntry(new java.util.zip.ZipEntry(name))
      val bytes = content.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      z.write(bytes, 0, bytes.length)
      z.closeEntry()
    }
    (out, z, put)
  }

  /** Real XLSX bytes for fixtures + tests. Each sheet is a list of
    * rows, each row a list of (kind, value) cells with kind ∈
    * `s` (shared string), `inline` (inlineStr), `num` (bare `<v>`),
    * `str` (formula string). Shared strings dedupe into the string
    * table in first-use order; with `richShared` every shared entry
    * writes as TWO rich-text runs split mid-string (extraction must
    * concatenate runs without separators). XML specials escaped on
    * write. */
  def encodeXlsx(sheets: Seq[Seq[Seq[(String, String)]]],
      richShared: Boolean = false): Array[Byte] = {
    val table = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    def sharedIdx(s: String): Int =
      table.getOrElseUpdate(s, table.size)
    val sheetXmls = sheets.map { rows =>
      val body = rows.map { cells =>
        "<row>" + cells.map {
          case ("s", v) => s"""<c t="s"><v>${sharedIdx(v)}</v></c>"""
          case ("inline", v) =>
            s"""<c t="inlineStr"><is><t xml:space="preserve">${xmlEsc(v)}</t></is></c>"""
          case ("str", v) => s"""<c t="str"><v>${xmlEsc(v)}</v></c>"""
          case (_, v) => s"<c><v>${xmlEsc(v)}</v></c>"
        }.mkString + "</row>"
      }.mkString
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""" +
        s"<sheetData>$body</sheetData></worksheet>"
    }
    val sst = table.keys.map { s =>
      if (richShared && s.length >= 2) {
        val (a, b) = s.splitAt(s.length / 2)
        s"""<si><r><t xml:space="preserve">${xmlEsc(a)}</t></r>""" +
          s"""<r><t xml:space="preserve">${xmlEsc(b)}</t></r></si>"""
      } else s"""<si><t xml:space="preserve">${xmlEsc(s)}</t></si>"""
    }.mkString
    val (out, z, put) = newZip()
    put("[Content_Types].xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
        """<Default Extension="xml" ContentType="application/xml"/>""" +
        """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
        "</Types>")
    put("_rels/.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
        "</Relationships>")
    put("xl/workbook.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheets>""" +
        sheets.indices.map(i =>
          s"""<sheet name="Sheet${i + 1}" sheetId="${i + 1}"/>""").mkString +
        "</sheets></workbook>")
    put("xl/sharedStrings.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        s"""<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="${table.size}" uniqueCount="${table.size}">$sst</sst>""")
    sheetXmls.zipWithIndex.foreach { case (xml, i) =>
      put(s"xl/worksheets/sheet${i + 1}.xml", xml)
    }
    z.close()
    out.toByteArray
  }

  /** Real PPTX bytes for fixtures + tests: one slide per paragraph
    * list; each paragraph splits into TWO `<a:r><a:t>` runs mid-text
    * (extraction must concatenate runs without separators). Slides are
    * WRITTEN in reverse order so extraction's numeric-name sort is
    * load-bearing. */
  def encodePptx(slides: Seq[Seq[String]]): Array[Byte] = {
    val (out, z, put) = newZip()
    put("[Content_Types].xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
        """<Default Extension="xml" ContentType="application/xml"/>""" +
        """<Override PartName="/ppt/presentation.xml" ContentType="application/vnd.openxmlformats-officedocument.presentationml.presentation.main+xml"/>""" +
        "</Types>")
    put("ppt/presentation.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<p:presentation xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main"/>""")
    slides.zipWithIndex.reverse.foreach { case (paras, i) =>
      val body = paras.map { p =>
        val (a, b) = p.splitAt(p.length / 2)
        s"""<a:p><a:r><a:t>${xmlEsc(a)}</a:t></a:r>""" +
          s"""<a:r><a:t>${xmlEsc(b)}</a:t></a:r></a:p>"""
      }.mkString
      put(s"ppt/slides/slide${i + 1}.xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<p:sld xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main" """ +
          """xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main">""" +
          s"<p:cSld><p:spTree><p:sp><p:txBody>$body</p:txBody></p:sp>" +
          "</p:spTree></p:cSld></p:sld>")
    }
    z.close()
    out.toByteArray
  }
}
