package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** pdf_text(content binary) -> string — baseline text extraction from
  * PDF files (ISO 32000-1), the single most common document-extraction
  * step in real LLM corpus pipelines. Zero new dependencies — the only
  * codec needed is the JDK Inflater. Scope (the honest baseline, stated
  * up front):
  *
  *  - Cross-reference walk: `startxref` → classic xref TABLES and xref
  *    STREAMS (/Type/XRef with /W field widths + /Index subsections,
  *    FlateDecode), /Prev chains for incremental updates, hybrid
  *    /XRefStm bridges, and OBJECT STREAMS (/Type/ObjStm, xref entry
  *    type 2 — the layout modern writers emit): the container's
  *    N/First header pairs resolve member objects on demand.
  *  - Document walk: trailer /Root → /Pages tree (inheritable
  *    /Resources), per-page /Contents (single stream or array),
  *    streams raw or FlateDecode'd (64 MB total decompression cap —
  *    a deflate bomb refuses the document, never OOMs the executor).
  *  - Content-stream text machine: BT…ET text objects; `Tj`, `TJ`
  *    (kerning adjustments ≤ −180 milli-em count as word gaps — the
  *    standard extractor heuristic), `'` and `"` show operators;
  *    `Td`/`TD`/`T*`/`Tm` line moves contribute separators; `Tf`
  *    switches the active font's byte decoding. Inline images
  *    (BI…ID…EI) are skipped by scanning for the EI sentinel.
  *  - String decoding: literal strings with the full escape set
  *    (balanced parens, \\ooo octal, line continuations), hex strings;
  *    bytes map through the selected font's single-byte encoding —
  *    /WinAnsiEncoding (≈ windows-1252) or /MacRomanEncoding — and a
  *    leading FE FF BOM switches the string to UTF-16BE.
  *  - Labeled refusals (NULL, never an exception): encrypted documents
  *    (trailer /Encrypt), CID/Type0 composite fonts (multi-byte text
  *    needs CMap machinery beyond baseline), malformed xref/objects,
  *    decompression-cap blowouts, non-PDF bytes. Corrupt attachments
  *    in a 100 TB crawl are data, not errors.
  *
  * Output whitespace collapses to single spaces and is trimmed — the
  * same normalization contract as `html_to_text`/`docx_text`, so
  * downstream curation treats every document source identically.
  * Per-row inside the scan projection (static-invoke codegen), zero
  * shuffle at any scale.
  */
case class PdfTextExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "pdf_text"
  override def nullable: Boolean = true // non-PDF / refused bytes yield NULL

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects binary content, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    PdfText.pdfTextU(input.asInstanceOf[Array[Byte]])

  override def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.PdfText.pdfTextU($c);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PdfText {

  /** Total decompressed bytes allowed per document (deflate-bomb cap). */
  private val MaxInflated = 64L << 20
  /** Indirect-object loads per document (cyclic/hostile xref cap). */
  private val MaxObjLoads = 50000
  /** Page-tree nodes visited (hostile /Kids fan-out cap). */
  private val MaxPages = 10000
  /** Extracted characters (output cap; beyond this the doc refuses). */
  private val MaxOutChars = 16 << 20

  private val Win = java.nio.charset.Charset.forName("windows-1252")
  private val Mac = java.nio.charset.Charset.forName("x-MacRoman")

  def pdfTextU(b: Array[Byte]): UTF8String = {
    val s = pdfText(b)
    if (s == null) null else UTF8String.fromString(s)
  }

  /** Extracted text, or null when the payload isn't an extractable PDF
    * (non-PDF bytes, encryption, CID fonts, malformed xref, bombs). */
  def pdfText(b: Array[Byte]): String = {
    if (b == null || b.length < 16) return null
    // header: %PDF- within the first 1 KB (the spec allows junk prefix)
    val scan = math.min(b.length - 5, 1024)
    var h = -1
    var i = 0
    while (h < 0 && i < scan) {
      if (b(i) == '%' && b(i + 1) == 'P' && b(i + 2) == 'D' &&
          b(i + 3) == 'F' && b(i + 4) == '-') h = i
      i += 1
    }
    if (h < 0) return null
    try new Parser(b).extract()
    catch { case scala.util.control.NonFatal(_) => null }
  }

  private final class Refuse extends RuntimeException(null, null, false, false)
  private def refuse(): Nothing = throw new Refuse

  private case class PName(s: String)
  private case class PRef(num: Int, gen: Int)
  private case class POp(s: String)
  private case class PStream(dict: Map[String, Any], dataStart: Int, rawLen: Int)
  private case object PNull

  // ----------------------------------------------------------- lexer

  /** Token/value reader over a byte buffer — one instance per parse
    * site (indirect object, xref section, content stream), so indirect
    * /Length resolution can't clobber an outer parse position. */
  private final class Lex(val b: Array[Byte], var pos: Int) {
    def atEnd: Boolean = pos >= b.length
    private def ch: Int = if (pos < b.length) b(pos) & 0xff else -1

    private def isWs(c: Int) =
      c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == '\f' || c == 0
    private def isDelim(c: Int) =
      c == '(' || c == ')' || c == '<' || c == '>' || c == '[' ||
        c == ']' || c == '{' || c == '}' || c == '/' || c == '%'
    private def isRegular(c: Int) = c >= 0 && !isWs(c) && !isDelim(c)

    def skipWs(): Unit = {
      var go = true
      while (go) {
        while (isWs(ch)) pos += 1
        if (ch == '%') { // comment to EOL
          while (ch >= 0 && ch != '\n' && ch != '\r') pos += 1
        } else go = false
      }
    }

    /** Regular-character run (keyword or operator). Empty at delim. */
    def keyword(): String = {
      val s = pos
      while (isRegular(ch)) pos += 1
      new String(b, s, pos - s, java.nio.charset.StandardCharsets.US_ASCII)
    }

    def peekKeyword(k: String): Boolean = {
      skipWs()
      if (pos + k.length > b.length) return false
      var i = 0
      while (i < k.length) {
        if (b(pos + i) != k.charAt(i)) return false
        i += 1
      }
      val after = if (pos + k.length < b.length) b(pos + k.length) & 0xff else -1
      !isRegular(after)
    }

    def expectKeyword(k: String): Unit = {
      if (!peekKeyword(k)) refuse()
      pos += k.length
    }

    private def name(): PName = { // pos at '/'
      pos += 1
      val sb = new java.lang.StringBuilder(16)
      while (isRegular(ch)) {
        if (ch == '#' && pos + 2 < b.length) {
          val hi = Character.digit(b(pos + 1), 16)
          val lo = Character.digit(b(pos + 2), 16)
          if (hi >= 0 && lo >= 0) { sb.append(((hi << 4) | lo).toChar); pos += 3 }
          else { sb.append('#'); pos += 1 }
        } else { sb.append(ch.toChar); pos += 1 }
      }
      PName(sb.toString)
    }

    private def number(): Any = {
      val s = pos
      if (ch == '+' || ch == '-') pos += 1
      var dot = false
      while ((ch >= '0' && ch <= '9') || ch == '.') {
        if (ch == '.') dot = true
        pos += 1
      }
      if (pos == s) refuse()
      val str = new String(b, s, pos - s, java.nio.charset.StandardCharsets.US_ASCII)
      if (dot) java.lang.Double.valueOf(str)
      else try java.lang.Long.valueOf(str)
      catch { case _: NumberFormatException => refuse() }
    }

    /** Literal string () with the full escape set; raw bytes out. */
    private def literalString(): Array[Byte] = { // pos at '('
      pos += 1
      val out = new java.io.ByteArrayOutputStream(64)
      var depth = 1
      while (depth > 0) {
        val c = ch
        if (c < 0) refuse()
        else if (c == '\\') {
          pos += 1
          val e = ch
          e match {
            case 'n' => out.write('\n'); pos += 1
            case 'r' => out.write('\r'); pos += 1
            case 't' => out.write('\t'); pos += 1
            case 'b' => out.write('\b'); pos += 1
            case 'f' => out.write('\f'); pos += 1
            case '(' => out.write('('); pos += 1
            case ')' => out.write(')'); pos += 1
            case '\\' => out.write('\\'); pos += 1
            case '\r' => // line continuation: \CR or \CRLF
              pos += 1; if (ch == '\n') pos += 1
            case '\n' => pos += 1
            case d if d >= '0' && d <= '7' => // 1-3 octal digits
              var v = 0
              var n = 0
              while (n < 3 && ch >= '0' && ch <= '7') {
                v = v * 8 + (ch - '0'); pos += 1; n += 1
              }
              out.write(v & 0xff)
            case -1 => refuse()
            case other => out.write(other); pos += 1 // \x → x
          }
        } else {
          if (c == '(') depth += 1
          else if (c == ')') depth -= 1
          if (depth > 0) out.write(c)
          pos += 1
        }
      }
      out.toByteArray
    }

    private def hexString(): Array[Byte] = { // pos at '<', next not '<'
      pos += 1
      val out = new java.io.ByteArrayOutputStream(64)
      var hi = -1
      var go = true
      while (go) {
        val c = ch
        if (c < 0) refuse()
        else if (c == '>') { pos += 1; go = false }
        else {
          val d = Character.digit(c, 16)
          if (d >= 0) {
            if (hi < 0) hi = d
            else { out.write((hi << 4) | d); hi = -1 }
          } else if (!isWs(c)) refuse()
          pos += 1
        }
      }
      if (hi >= 0) out.write(hi << 4) // odd final digit pads 0
      out.toByteArray
    }

    def parseValue(depth: Int = 0): Any = {
      if (depth > 64) refuse()
      skipWs()
      ch match {
        case '<' =>
          if (pos + 1 < b.length && b(pos + 1) == '<') { // dict
            pos += 2
            var m = Map.empty[String, Any]
            var go = true
            while (go) {
              skipWs()
              if (ch == '>') {
                pos += 1
                if (ch != '>') refuse()
                pos += 1
                go = false
              } else if (ch == '/') {
                val k = name().s
                m = m.updated(k, parseValue(depth + 1))
              } else refuse()
            }
            m
          } else hexString()
        case '(' => literalString()
        case '/' => name()
        case '[' =>
          pos += 1
          val buf = Vector.newBuilder[Any]
          var go = true
          while (go) {
            skipWs()
            if (ch == ']') { pos += 1; go = false }
            else if (ch < 0) refuse()
            else buf += parseValue(depth + 1)
          }
          buf.result()
        case c if c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9') =>
          val n1 = number()
          n1 match {
            case l1: java.lang.Long if l1.longValue() >= 0 =>
              // lookahead: INT INT R → indirect reference
              val save = pos
              skipWs()
              if (ch >= '0' && ch <= '9') {
                try {
                  number() match {
                    case l2: java.lang.Long =>
                      skipWs()
                      if (ch == 'R') {
                        val after =
                          if (pos + 1 < b.length) b(pos + 1) & 0xff else -1
                        if (!isRegular(after)) {
                          pos += 1
                          return PRef(l1.intValue(), l2.intValue())
                        }
                      }
                    case _ => ()
                  }
                } catch { case _: Refuse => () }
              }
              pos = save
              n1
            case _ => n1
          }
        case c if c >= 0 && isRegular(c) =>
          keyword() match {
            case "true" => java.lang.Boolean.TRUE
            case "false" => java.lang.Boolean.FALSE
            case "null" => PNull
            case "" => refuse()
            case op => POp(op) // content-stream operator
          }
        case _ => refuse()
      }
    }

    /** Content-stream token: a value or an operator; null at EOF. */
    def nextToken(): Any = {
      skipWs()
      if (atEnd) null else parseValue()
    }
  }

  // ---------------------------------------------------------- parser

  private final case class FontInfo(cid: Boolean, mac: Boolean,
      diff: Map[Int, Char] = Map.empty)
  private val DefaultFont = FontInfo(cid = false, mac = false)

  /** Glyph name → character for /Differences arrays: the `uniXXXX` /
    * `uXXXX(XX)` algorithmic forms plus the ASCII block of the Adobe
    * Standard names (what subset fonts actually remap). Unknown names
    * return 0 → the base encoding's byte mapping applies. */
  private val StdGlyphNames: Map[String, Char] = {
    val ascii = Seq(
      "space" -> ' ', "exclam" -> '!', "quotedbl" -> '"',
      "numbersign" -> '#', "dollar" -> '$', "percent" -> '%',
      "ampersand" -> '&', "quotesingle" -> '\'', "parenleft" -> '(',
      "parenright" -> ')', "asterisk" -> '*', "plus" -> '+',
      "comma" -> ',', "hyphen" -> '-', "period" -> '.', "slash" -> '/',
      "zero" -> '0', "one" -> '1', "two" -> '2', "three" -> '3',
      "four" -> '4', "five" -> '5', "six" -> '6', "seven" -> '7',
      "eight" -> '8', "nine" -> '9', "colon" -> ':', "semicolon" -> ';',
      "less" -> '<', "equal" -> '=', "greater" -> '>', "question" -> '?',
      "at" -> '@', "bracketleft" -> '[', "backslash" -> '\\',
      "bracketright" -> ']', "asciicircum" -> '^', "underscore" -> '_',
      "grave" -> '`', "braceleft" -> '{', "bar" -> '|',
      "braceright" -> '}', "asciitilde" -> '~')
    val letters = (('a' to 'z') ++ ('A' to 'Z')).map(c => c.toString -> c)
    (ascii ++ letters).toMap
  }

  private def glyphChar(name: String): Char = {
    if (name.length == 7 && name.startsWith("uni")) {
      try return Integer.parseInt(name.substring(3), 16).toChar
      catch { case _: NumberFormatException => () }
    }
    if (name.length >= 5 && name.length <= 7 && name.charAt(0) == 'u') {
      try {
        val cp = Integer.parseInt(name.substring(1), 16)
        if (cp <= 0xffff) return cp.toChar
      } catch { case _: NumberFormatException => () }
    }
    StdGlyphNames.getOrElse(name, 0.toChar)
  }

  private final class Parser(b: Array[Byte]) {
    private val xref = scala.collection.mutable.Map.empty[Int, Long]
    // objnum → (object-stream container number, index within it)
    private val objStmMap = scala.collection.mutable.Map.empty[Int, (Int, Int)]
    // container number → (decoded data, per-object offsets, /First)
    private val objStmCache =
      scala.collection.mutable.Map.empty[Int, (Array[Byte], Array[Int], Int)]
    private var trailer = Map.empty[String, Any]
    private val cache = scala.collection.mutable.Map.empty[Int, Any]
    private val loading = scala.collection.mutable.Set.empty[Int]
    private var objLoads = 0
    private var inflated = 0L
    private var pagesSeen = 0
    private val out = new java.lang.StringBuilder(1024)
    private var pendingSpace = false

    // ------------------------------------------------------- xref walk

    private def findStartXref(): Long = {
      // search the last 2 KB for the LAST "startxref"
      val from = math.max(0, b.length - 2048)
      var found = -1
      var i = from
      val k = "startxref".getBytes
      while (i + k.length <= b.length) {
        var j = 0
        while (j < k.length && b(i + j) == k(j)) j += 1
        if (j == k.length) found = i
        i += 1
      }
      if (found < 0) refuse()
      val lx = new Lex(b, found + k.length)
      lx.skipWs()
      lx.parseValue() match {
        case l: java.lang.Long => l.longValue()
        case _ => refuse()
      }
    }

    private def mergeTrailer(d: Map[String, Any]): Unit =
      // newest-first walk: first-seen keys win
      d.foreach { case (k, v) =>
        if (!trailer.contains(k)) trailer = trailer.updated(k, v)
      }

    private def be(data: Array[Byte], off: Int, w: Int): Long = {
      var v = 0L
      var i = 0
      while (i < w) { v = (v << 8) | (data(off + i) & 0xff); i += 1 }
      v
    }

    /** Xref stream at `off`: /W widths, /Index subsections. Returns the
      * /Prev offset or -1. */
    private def loadXrefStream(off: Long): Long = {
      val (dict, data) = loadObjAt(off) match {
        case s: PStream =>
          val d = streamData(s)
          if (d == null) refuse()
          (s.dict, d)
        case _ => refuse()
      }
      val w = dict.get("W") match {
        case Some(v: Vector[_]) =>
          v.map { case l: java.lang.Long if l >= 0 && l <= 8 => l.intValue()
                  case _ => refuse() }
        case _ => refuse()
      }
      if (w.size < 3) refuse()
      val size = dict.get("Size") match {
        case Some(l: java.lang.Long) => l.intValue()
        case _ => refuse()
      }
      val index: Vector[Int] = dict.get("Index") match {
        case Some(v: Vector[_]) =>
          v.map { case l: java.lang.Long => l.intValue(); case _ => refuse() }
        case _ => Vector(0, size)
      }
      val rowW = w.sum
      var row = 0
      var sub = 0
      while (sub + 1 < index.size) {
        val start = index(sub)
        val count = index(sub + 1)
        var i = 0
        while (i < count) {
          if ((row + 1).toLong * rowW > data.length) refuse()
          val o = row * rowW
          val tpe = if (w(0) == 0) 1L else be(data, o, w(0))
          val f2 = be(data, o + w(0), w(1))
          val f3 = be(data, o + w(0) + w(1), w(2))
          // type 1 = plain object at byte offset f2; type 2 = object
          // number f2's object stream, index f3. Newest-first walk:
          // first-seen wins ACROSS both entry kinds
          val num = start + i
          if (!xref.contains(num) && !objStmMap.contains(num)) {
            if (tpe == 1) xref.update(num, f2)
            else if (tpe == 2) objStmMap.update(num, (f2.toInt, f3.toInt))
          }
          row += 1
          i += 1
        }
        sub += 2
      }
      mergeTrailer(dict)
      dict.get("Prev") match {
        case Some(l: java.lang.Long) => l.longValue()
        case _ => -1L
      }
    }

    /** Classic xref table at `off`. Returns /Prev or -1. */
    private def loadXrefTable(off: Long): Long = {
      val lx = new Lex(b, off.toInt)
      lx.expectKeyword("xref")
      var go = true
      while (go) {
        if (lx.peekKeyword("trailer")) go = false
        else {
          val start = lx.parseValue() match {
            case l: java.lang.Long => l.intValue(); case _ => refuse()
          }
          val count = lx.parseValue() match {
            case l: java.lang.Long => l.intValue(); case _ => refuse()
          }
          if (count < 0 || count > 1000000) refuse()
          var i = 0
          while (i < count) {
            val o = lx.parseValue() match {
              case l: java.lang.Long => l.longValue(); case _ => refuse()
            }
            lx.parseValue() match { // generation
              case _: java.lang.Long => (); case _ => refuse()
            }
            lx.skipWs()
            val flag = lx.keyword()
            if (flag == "n") {
              if (!xref.contains(start + i)) xref.update(start + i, o)
            } else if (flag != "f") refuse()
            i += 1
          }
        }
      }
      lx.expectKeyword("trailer")
      val d = lx.parseValue() match {
        case m: Map[String, Any] @unchecked => m
        case _ => refuse()
      }
      // hybrid-reference file: bridge stream holds entries the table
      // omits (never overrides — first-seen wins either way)
      d.get("XRefStm") match {
        case Some(l: java.lang.Long) => loadXrefStream(l.longValue())
        case _ => ()
      }
      mergeTrailer(d)
      d.get("Prev") match {
        case Some(l: java.lang.Long) => l.longValue()
        case _ => -1L
      }
    }

    private def loadXrefChain(): Unit = {
      var off = findStartXref()
      val visited = scala.collection.mutable.Set.empty[Long]
      var iter = 0
      while (off >= 0 && off < b.length && !visited.contains(off) && iter < 64) {
        visited += off
        val lx = new Lex(b, off.toInt)
        off = if (lx.peekKeyword("xref")) loadXrefTable(off)
              else loadXrefStream(off)
        iter += 1
      }
    }

    // --------------------------------------------------- object loads

    private def loadObjAt(off: Long): Any = {
      if (off < 0 || off >= b.length) refuse()
      objLoads += 1
      if (objLoads > MaxObjLoads) refuse()
      val lx = new Lex(b, off.toInt)
      lx.parseValue() match {
        case _: java.lang.Long => (); case _ => refuse()
      }
      lx.parseValue() match {
        case _: java.lang.Long => (); case _ => refuse()
      }
      lx.expectKeyword("obj")
      val v = lx.parseValue()
      if (lx.peekKeyword("stream")) {
        val dict = v match {
          case m: Map[String, Any] @unchecked => m
          case _ => refuse()
        }
        lx.pos += "stream".length
        // single EOL after the keyword: CRLF or LF (spec 7.3.8.1)
        if (lx.pos < b.length && b(lx.pos) == '\r') lx.pos += 1
        if (lx.pos < b.length && b(lx.pos) == '\n') lx.pos += 1
        val len = deref(dict.getOrElse("Length", PNull)) match {
          case l: java.lang.Long if l >= 0 => l.intValue()
          case _ => refuse()
        }
        if (lx.pos.toLong + len > b.length) refuse()
        PStream(dict, lx.pos, len)
      } else v
    }

    /** Member `idx` of object stream `container` (ISO 32000-1 §7.5.7):
      * the stream body leads with N (objnum, offset) pairs; object data
      * begins at /First + offset. Members are direct objects (no nested
      * streams), parsed on demand from the cached decoded body. */
    private def loadFromObjStm(container: Int, idx: Int): Any = {
      val (data, offsets, first) = objStmCache.getOrElseUpdate(container, {
        obj(container) match {
          case s: PStream
              if deref(s.dict.getOrElse("Type", PNull)) == PName("ObjStm") =>
            val d = streamData(s)
            if (d == null) refuse()
            val n = deref(s.dict.getOrElse("N", PNull)) match {
              case l: java.lang.Long if l >= 0 && l <= 100000 => l.intValue()
              case _ => refuse()
            }
            val firstOff = deref(s.dict.getOrElse("First", PNull)) match {
              case l: java.lang.Long if l >= 0 => l.intValue()
              case _ => refuse()
            }
            val lx = new Lex(d, 0)
            val offs = new Array[Int](n)
            var i = 0
            while (i < n) {
              lx.parseValue() match { // member object number (unused —
                case _: java.lang.Long => () //  the xref already maps it)
                case _ => refuse()
              }
              offs(i) = lx.parseValue() match {
                case l: java.lang.Long if l >= 0 => l.intValue()
                case _ => refuse()
              }
              i += 1
            }
            (d, offs, firstOff)
          case _ => refuse()
        }
      })
      if (idx < 0 || idx >= offsets.length) refuse()
      val at = first.toLong + offsets(idx)
      if (at < 0 || at >= data.length) refuse()
      new Lex(data, at.toInt).parseValue()
    }

    private def obj(num: Int): Any =
      cache.getOrElseUpdate(num, {
        if (loading.contains(num)) refuse() // /Length or ObjStm cycle
        loading += num
        try xref.get(num).map(loadObjAt).getOrElse {
          objStmMap.get(num) match {
            case Some((c, i)) =>
              objLoads += 1
              if (objLoads > MaxObjLoads) refuse()
              loadFromObjStm(c, i)
            case None => PNull
          }
        }
        finally loading -= num
      })

    private def deref(v: Any, depth: Int = 0): Any = v match {
      case r: PRef => if (depth > 16) refuse() else deref(obj(r.num), depth + 1)
      case x => x
    }

    private def derefDict(v: Any): Map[String, Any] = deref(v) match {
      case m: Map[String, Any] @unchecked => m
      case _ => refuse()
    }

    // -------------------------------------------------------- streams

    private def inflate(raw: Array[Byte]): Array[Byte] = {
      val inf = new java.util.zip.Inflater()
      try {
        inf.setInput(raw)
        val out = new java.io.ByteArrayOutputStream(math.min(raw.length * 4, 1 << 20))
        val buf = new Array[Byte](16384)
        while (!inf.finished()) {
          val n =
            try inf.inflate(buf)
            catch { case _: java.util.zip.DataFormatException => refuse() }
          if (n == 0 && !inf.finished()) {
            if (inf.needsInput() || inf.needsDictionary()) refuse()
          }
          inflated += n
          if (inflated > MaxInflated) refuse() // deflate bomb
          out.write(buf, 0, n)
        }
        out.toByteArray
      } finally inf.end()
    }

    /** Undo a /DecodeParms predictor over inflated bytes: TIFF
      * horizontal (2) and the PNG row filters (10–15 — the tag selects
      * per-row, exactly PNG semantics; predictor 12/Up is what real
      * xref streams ship). Unknown predictors refuse. */
    private def unpredict(data: Array[Byte], parms: Map[String, Any]): Array[Byte] = {
      val pred = deref(parms.getOrElse("Predictor", PNull)) match {
        case l: java.lang.Long => l.intValue()
        case _ => 1
      }
      if (pred <= 1) return data
      val colors = deref(parms.getOrElse("Colors", PNull)) match {
        case l: java.lang.Long => l.intValue(); case _ => 1
      }
      val bpc = deref(parms.getOrElse("BitsPerComponent", PNull)) match {
        case l: java.lang.Long => l.intValue(); case _ => 8
      }
      val columns = deref(parms.getOrElse("Columns", PNull)) match {
        case l: java.lang.Long => l.intValue(); case _ => 1
      }
      if (colors < 1 || bpc < 1 || columns < 1) refuse()
      val bpp = math.max(1, (colors * bpc + 7) / 8)
      val rowLen = (colors * bpc * columns + 7) / 8
      if (pred == 2) { // TIFF horizontal differencing (8-bit components)
        if (bpc != 8) return null
        val out = data.clone()
        val rows = out.length / rowLen
        var r = 0
        while (r < rows) {
          var i = bpp
          while (i < rowLen) {
            out(r * rowLen + i) =
              (out(r * rowLen + i) + out(r * rowLen + i - bpp)).toByte
            i += 1
          }
          r += 1
        }
        return out
      }
      if (pred < 10 || pred > 15) return null
      // PNG predictors: each row = 1 filter-type byte + rowLen bytes
      val stride = rowLen + 1
      val rows = data.length / stride
      val out = new Array[Byte](rows * rowLen)
      var r = 0
      while (r < rows) {
        val ft = data(r * stride) & 0xff
        var i = 0
        while (i < rowLen) {
          val x = data(r * stride + 1 + i) & 0xff
          val a = if (i >= bpp) out(r * rowLen + i - bpp) & 0xff else 0
          val bUp = if (r > 0) out((r - 1) * rowLen + i) & 0xff else 0
          val c = if (r > 0 && i >= bpp) out((r - 1) * rowLen + i - bpp) & 0xff else 0
          val v = ft match {
            case 0 => x
            case 1 => x + a
            case 2 => x + bUp
            case 3 => x + ((a + bUp) / 2)
            case 4 =>
              val p = a + bUp - c
              val pa = math.abs(p - a); val pb = math.abs(p - bUp)
              val pc = math.abs(p - c)
              x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) bUp else c)
            case _ => refuse()
          }
          out(r * rowLen + i) = v.toByte
          i += 1
        }
        r += 1
      }
      out
    }

    /** Decoded stream bytes, or null when the filter chain isn't
      * baseline-decodable (DCT, CCITT, LZW, crypt filters, …). */
    private def streamData(s: PStream): Array[Byte] = {
      val raw = java.util.Arrays.copyOfRange(b, s.dataStart, s.dataStart + s.rawLen)
      val parms: Map[String, Any] =
        deref(s.dict.getOrElse("DecodeParms", PNull)) match {
          case m: Map[String, Any] @unchecked => m
          case v: Vector[_] if v.nonEmpty =>
            deref(v.head) match {
              case m: Map[String, Any] @unchecked => m
              case _ => Map.empty
            }
          case _ => Map.empty
        }
      deref(s.dict.getOrElse("Filter", PNull)) match {
        case PNull => raw
        case PName("FlateDecode") => unpredict(inflate(raw), parms)
        case v: Vector[_] =>
          val names = v.map(deref(_))
          if (names.isEmpty) raw
          else if (names == Vector(PName("FlateDecode")))
            unpredict(inflate(raw), parms)
          else null
        case _ => null
      }
    }

    // -------------------------------------------------- text emission

    private def emit(s: String): Unit = {
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == ' ' || c == '\t' || c == '\r' || c == '\n' || c == '\f')
          pendingSpace = true
        else {
          if (pendingSpace && out.length > 0) out.append(' ')
          pendingSpace = false
          out.append(c)
        }
        i += 1
      }
      if (out.length > MaxOutChars) refuse()
    }

    private def sep(): Unit = pendingSpace = true

    private def decodeString(bytes: Array[Byte], font: FontInfo): String = {
      if (font.cid) refuse() // CID text needs CMaps: labeled refusal
      if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xfe &&
          (bytes(1) & 0xff) == 0xff)
        return new String(bytes, 2, bytes.length - 2,
          java.nio.charset.StandardCharsets.UTF_16BE)
      val cs = if (font.mac) Mac else Win
      if (font.diff.isEmpty) new String(bytes, cs)
      else { // per-byte: /Differences override, base encoding otherwise
        val sb = new java.lang.StringBuilder(bytes.length)
        bytes.foreach { bb =>
          val code = bb & 0xff
          font.diff.get(code) match {
            case Some(c) => sb.append(c)
            case None => sb.append(new String(Array(bb), cs))
          }
        }
        sb.toString
      }
    }

    // ------------------------------------------------- content machine

    private def fontInfo(d: Map[String, Any]): FontInfo = {
      val cid = deref(d.getOrElse("Subtype", PNull)) match {
        case PName("Type0") => true
        case _ => false
      }
      val enc = deref(d.getOrElse("Encoding", PNull))
      val mac = enc match {
        case PName("MacRomanEncoding") => true
        case m: Map[String, Any] @unchecked =>
          deref(m.getOrElse("BaseEncoding", PNull)) == PName("MacRomanEncoding")
        case _ => false
      }
      // /Differences: [ code /name /name ... code /name ... ] — codes
      // assign consecutively; names resolve via uniXXXX / the Standard
      // ASCII names, unresolvable names fall back to the base encoding
      val diff: Map[Int, Char] = enc match {
        case m: Map[String, Any] @unchecked =>
          deref(m.getOrElse("Differences", PNull)) match {
            case arr: Vector[_] =>
              val out = Map.newBuilder[Int, Char]
              var code = -1
              arr.foreach {
                case l: java.lang.Long => code = l.intValue()
                case PName(n) if code >= 0 && code <= 255 =>
                  val c = glyphChar(n)
                  if (c != 0) out += code -> c
                  code += 1
                case _ => ()
              }
              out.result()
            case _ => Map.empty
          }
        case _ => Map.empty
      }
      FontInfo(cid, mac, diff)
    }

    private def runContent(data: Array[Byte],
        fonts: Map[String, FontInfo]): Unit = {
      val lx = new Lex(data, 0)
      val operands = scala.collection.mutable.ArrayBuffer.empty[Any]
      var font = DefaultFont
      var inText = false
      var tok = try lx.nextToken() catch { case _: Refuse => return }
      while (tok != null) {
        tok match {
          case POp(op) =>
            op match {
              case "BT" => inText = true
              case "ET" => inText = false; sep()
              case "Tf" =>
                operands.headOption match {
                  case Some(PName(n)) => font = fonts.getOrElse(n, DefaultFont)
                  case _ => ()
                }
              case "Tj" if inText =>
                operands.lastOption match {
                  case Some(s: Array[Byte]) => emit(decodeString(s, font))
                  case _ => ()
                }
              case "'" if inText =>
                sep()
                operands.lastOption match {
                  case Some(s: Array[Byte]) => emit(decodeString(s, font))
                  case _ => ()
                }
              case "\"" if inText =>
                sep()
                operands.lastOption match {
                  case Some(s: Array[Byte]) => emit(decodeString(s, font))
                  case _ => ()
                }
              case "TJ" if inText =>
                operands.lastOption match {
                  case Some(v: Vector[_]) =>
                    v.foreach {
                      case s: Array[Byte] => emit(decodeString(s, font))
                      case n: java.lang.Long =>
                        if (n.longValue() <= -180) sep()
                      case d: java.lang.Double =>
                        if (d.doubleValue() <= -180) sep()
                      case _ => ()
                    }
                  case _ => ()
                }
              case "Td" | "TD" | "T*" | "Tm" => sep()
              case "BI" =>
                // inline image: raw sample bytes would derail the lexer;
                // scan forward for the whitespace-delimited EI sentinel
                var p = lx.pos
                var found = -1
                while (found < 0 && p + 2 < data.length) {
                  if (data(p) == 'E' && data(p + 1) == 'I' &&
                      (p + 2 >= data.length ||
                        data(p + 2) == ' ' || data(p + 2) == '\n' ||
                        data(p + 2) == '\r' || data(p + 2) == '\t'))
                    found = p
                  p += 1
                }
                if (found < 0) return // truncated inline image: keep prefix
                lx.pos = found + 2
              case _ => () // path/color/state operators: no text effect
            }
            operands.clear()
          case v => operands += v
        }
        tok = try lx.nextToken() catch { case _: Refuse => return }
        if (operands.size > 256) operands.clear() // hostile operand flood
      }
    }

    // ------------------------------------------------------ page walk

    private def pageFonts(res: Map[String, Any]): Map[String, FontInfo] =
      deref(res.getOrElse("Font", PNull)) match {
        case m: Map[String, Any] @unchecked =>
          m.map { case (k, v) => k -> fontInfo(derefDict(v)) }
        case _ => Map.empty
      }

    private def walkPages(node: Map[String, Any],
        inheritedRes: Map[String, Any], depth: Int): Unit = {
      if (depth > 64) refuse()
      pagesSeen += 1
      if (pagesSeen > MaxPages) refuse()
      val res = deref(node.getOrElse("Resources", PNull)) match {
        case m: Map[String, Any] @unchecked => m
        case _ => inheritedRes
      }
      deref(node.getOrElse("Kids", PNull)) match {
        case kids: Vector[_] =>
          kids.foreach(k => walkPages(derefDict(k), res, depth + 1))
        case _ => // leaf page
          val fonts = pageFonts(res)
          val streams = deref(node.getOrElse("Contents", PNull)) match {
            case s: PStream => Vector(s)
            case v: Vector[_] =>
              v.map(deref(_)).collect { case s: PStream => s }
            case _ => Vector.empty
          }
          streams.foreach { s =>
            val data = streamData(s)
            if (data != null) { runContent(data, fonts); sep() }
          }
      }
    }

    // -------------------------------------------------------- extract

    def extract(): String = {
      loadXrefChain()
      if (trailer.contains("Encrypt")) refuse() // encrypted: labeled NULL
      val root = derefDict(trailer.getOrElse("Root", refuse()))
      val pages = derefDict(root.getOrElse("Pages", refuse()))
      walkPages(pages, Map.empty, 0)
      out.toString.trim
    }
  }

  // ------------------------------------------------- fixture encoder

  /** Escape + encode one show-string for the chosen single-byte
    * charset; non-ASCII bytes render as \ooo octal escapes. */
  private def litString(s: String, cs: java.nio.charset.Charset): String = {
    val bytes = s.getBytes(cs)
    val sb = new java.lang.StringBuilder(bytes.length + 8)
    sb.append('(')
    bytes.foreach { bb =>
      val c = bb & 0xff
      if (c == '(' || c == ')' || c == '\\') { sb.append('\\'); sb.append(c.toChar) }
      else if (c < 32 || c > 126)
        sb.append('\\').append(Integer.toOctalString(c))
      else sb.append(c.toChar)
    }
    sb.append(')')
    sb.toString
  }

  private def hexLit(bytes: Array[Byte]): String =
    bytes.map(bb => f"${bb & 0xff}%02X").mkString("<", "", ">")

  /** Write a REAL (single-font) PDF whose extracted text is the
    * paragraphs of each page joined by whitespace. Spelling rotations —
    * all invariant under extraction, the fixture discipline every codec
    * here follows:
    *
    *  - `xrefStream = true` writes a cross-reference STREAM (/Type/XRef,
    *    /W [1 4 2], FlateDecode) instead of the classic table;
    *  - `macRoman = true` declares /MacRomanEncoding and encodes the
    *    text bytes through it (WinAnsi otherwise);
    *  - `utf16 = true` carries every paragraph as a BOM'd UTF-16BE hex
    *    string instead of single-byte literals;
    *  - paragraphs rotate the four show operators (Tj / TJ-with-kern /
    *    `'` / `"`), and every third paragraph spells its string in hex;
    *  - `flate = false` leaves the content stream uncompressed;
    *  - `objStm = true` moves every document dictionary into an OBJECT
    *    STREAM with type-2 xref entries (implies a cross-reference
    *    stream) — the layout modern writers emit;
    *  - `cidFont` / `encrypted` build the two labeled-refusal shapes.
    */
  def encodePdf(pages: Seq[Seq[String]], xrefStream: Boolean = false,
      macRoman: Boolean = false, utf16: Boolean = false,
      flate: Boolean = true, cidFont: Boolean = false,
      encrypted: Boolean = false, xrefPredictor: Boolean = false,
      objStm: Boolean = false): Array[Byte] = {
    require(pages.nonEmpty && pages.forall(_.nonEmpty))
    // objStm: the document dictionaries live inside an OBJECT STREAM
    // (the layout modern writers emit) — implies a cross-reference
    // stream, since classic tables cannot carry type-2 entries
    val useXrefStream = xrefStream || objStm
    val cs = if (macRoman) Mac else Win
    val out = new java.io.ByteArrayOutputStream(4096)
    def w(s: String): Unit =
      out.write(s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    val offsets = scala.collection.mutable.Map.empty[Int, Int]

    val nPages = pages.size
    // object numbering: 1 catalog, 2 pages, 3..2+n page dicts,
    // 3+n..2+2n content streams, 3+2n font
    val fontObj = 3 + 2 * nPages

    def showString(s: String, idx: Int): String =
      if (utf16)
        hexLit(Array[Byte](0xfe.toByte, 0xff.toByte) ++
          s.getBytes(java.nio.charset.StandardCharsets.UTF_16BE))
      else if (idx % 3 == 2) hexLit(s.getBytes(cs))
      else litString(s, cs)

    def contentFor(paras: Seq[String]): Array[Byte] = {
      val sb = new java.lang.StringBuilder(256)
      sb.append("BT\n/F1 12 Tf\n14 TL\n72 720 Td\n")
      paras.zipWithIndex.foreach { case (p, i) =>
        if (i > 0) sb.append("T*\n")
        (i % 4) match {
          case 0 => sb.append(showString(p, i)).append(" Tj\n")
          case 1 =>
            // TJ: split at the first space; the -250 kern IS the gap
            val cut = p.indexOf(' ')
            if (cut > 0)
              sb.append('[').append(showString(p.substring(0, cut), i))
                .append(" -250 ")
                .append(showString(p.substring(cut + 1), i))
                .append("] TJ\n")
            else sb.append('[').append(showString(p, i)).append("] TJ\n")
          case 2 => sb.append(showString(p, i)).append(" '\n")
          case _ => sb.append("1 0 ").append(showString(p, i)).append(" \"\n")
        }
      }
      sb.append("ET\n")
      sb.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    }

    def deflate(data: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      try {
        d.setInput(data); d.finish()
        val o = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
        val buf = new Array[Byte](8192)
        while (!d.finished()) o.write(buf, 0, d.deflate(buf))
        o.toByteArray
      } finally d.end()
    }

    w("%PDF-1.7\n%âãÏÓ\n")
    def beginObj(num: Int): Unit = { offsets(num) = out.size(); w(s"$num 0 obj\n") }
    def endObj(): Unit = w("endobj\n")

    val catalogStr = "<< /Type /Catalog /Pages 2 0 R >>"
    val pagesStr =
      s"<< /Type /Pages /Kids [${(0 until nPages).map(i => s"${3 + i} 0 R").mkString(" ")}] /Count $nPages >>"
    def pageStr(i: Int): String =
      s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        s"/Resources << /Font << /F1 $fontObj 0 R >> >> " +
        s"/Contents ${3 + nPages + i} 0 R >>"
    val fontStr =
      if (cidFont)
        "<< /Type /Font /Subtype /Type0 /BaseFont /Noto /Encoding /Identity-H >>"
      else
        "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /" +
          (if (macRoman) "MacRomanEncoding" else "WinAnsiEncoding") + " >>"

    if (!objStm) {
      beginObj(1); w(catalogStr + "\n"); endObj()
      beginObj(2); w(pagesStr + "\n"); endObj()
      pages.indices.foreach { i =>
        beginObj(3 + i); w(pageStr(i) + "\n"); endObj()
      }
    }
    pages.indices.foreach { i =>
      val raw = contentFor(pages(i))
      val data = if (flate) deflate(raw) else raw
      beginObj(3 + nPages + i)
      w(s"<< /Length ${data.length}" +
        (if (flate) " /Filter /FlateDecode" else "") + " >>\nstream\n")
      out.write(data, 0, data.length)
      w("\nendstream\nendobj\n")
    }
    if (!objStm) { beginObj(fontObj); w(fontStr + "\n"); endObj() }

    // objStm layout: dictionaries live in the object-stream container
    // (content STREAMS may not — the spec forbids streams in ObjStm)
    val objStmNum = fontObj + 1
    val memberIdx = scala.collection.mutable.Map.empty[Int, Int]
    if (objStm) {
      val members: Seq[(Int, String)] =
        Seq(1 -> catalogStr, 2 -> pagesStr) ++
          pages.indices.map(i => (3 + i) -> pageStr(i)) :+ (fontObj -> fontStr)
      members.zipWithIndex.foreach { case ((n, _), i) => memberIdx(n) = i }
      val body = new java.lang.StringBuilder()
      val offs = members.map { case (_, d) =>
        val o = body.length(); body.append(d).append(' '); o
      }
      val header = members.zip(offs)
        .map { case ((n, _), o) => s"$n $o" }.mkString("", " ", "\n")
      val payload = deflate((header + body.toString)
        .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
      beginObj(objStmNum)
      w(s"<< /Type /ObjStm /N ${members.size} /First ${header.length} " +
        s"/Filter /FlateDecode /Length ${payload.length} >>\nstream\n")
      out.write(payload, 0, payload.length)
      w("\nendstream\nendobj\n")
    }

    val size = if (objStm) fontObj + 2 else fontObj + 1
    val encExtra = if (encrypted) s" /Encrypt ${size + 5} 0 R" else ""
    if (!useXrefStream) {
      val xrefOff = out.size()
      w(s"xref\n0 $size\n")
      w("0000000000 65535 f \n")
      (1 until size).foreach(n => w(f"${offsets(n)}%010d 00000 n \n"))
      w(s"trailer\n<< /Size $size /Root 1 0 R$encExtra >>\n")
      w(s"startxref\n$xrefOff\n%%EOF\n")
    } else {
      // xref STREAM covering objects 0..size (incl. itself at `size`)
      val xrefObjNum = size
      val xrefOff = out.size()
      val rows = new java.io.ByteArrayOutputStream()
      def row(tpe: Int, f2: Long, f3: Int): Unit = {
        rows.write(tpe)
        rows.write(((f2 >> 24) & 0xff).toInt); rows.write(((f2 >> 16) & 0xff).toInt)
        rows.write(((f2 >> 8) & 0xff).toInt); rows.write((f2 & 0xff).toInt)
        rows.write((f3 >> 8) & 0xff); rows.write(f3 & 0xff)
      }
      row(0, 0, 0xffff)
      (1 until size).foreach { n =>
        memberIdx.get(n) match {
          case Some(idx) => row(2, objStmNum, idx) // inside the ObjStm
          case None => row(1, offsets(n), 0)
        }
      }
      row(1, xrefOff, 0)
      // optional real-world spelling: PNG Up predictor (12) over the
      // 7-byte rows, the layout most writers actually emit
      val plain = rows.toByteArray
      val encoded =
        if (!xrefPredictor) plain
        else {
          val rowLen = 7
          val nRows = plain.length / rowLen
          val o = new Array[Byte]((rowLen + 1) * nRows)
          var r = 0
          while (r < nRows) {
            o(r * (rowLen + 1)) = 2 // PNG filter type: Up
            var i = 0
            while (i < rowLen) {
              val up = if (r > 0) plain((r - 1) * rowLen + i) & 0xff else 0
              o(r * (rowLen + 1) + 1 + i) =
                ((plain(r * rowLen + i) & 0xff) - up).toByte
              i += 1
            }
            r += 1
          }
          o
        }
      val data = deflate(encoded)
      val parms =
        if (xrefPredictor) " /DecodeParms << /Predictor 12 /Columns 7 >>"
        else ""
      w(s"$xrefObjNum 0 obj\n<< /Type /XRef /Size ${size + 1} /W [1 4 2] " +
        s"/Index [0 ${size + 1}] /Root 1 0 R$encExtra$parms " +
        s"/Filter /FlateDecode /Length ${data.length} >>\nstream\n")
      out.write(data, 0, data.length)
      w("\nendstream\nendobj\n")
      w(s"startxref\n$xrefOff\n%%EOF\n")
    }
    out.toByteArray
  }

  /** Single-page convenience. */
  def encodePdf(paragraphs: Seq[String]): Array[Byte] =
    encodePdf(Seq(paragraphs))
}
