package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** eml_text(content binary) → struct<subject, from, date_ms, text> —
  * RFC 5322/2045 email extraction: mailing-list archives and mbox
  * dumps are a standard LLM corpus source, and the signal lives in
  * the MIME machinery, not a regex:
  *
  *  - header block: CRLF/LF tolerant, continuation-line UNFOLDING,
  *    first-wins for repeated headers;
  *  - RFC 2047 encoded-words in Subject/From: `=?charset?B?...?=`
  *    (base64) and `=?charset?Q?...?=` (Q-encoding, `_` = space,
  *    `=XX` hex), adjacent encoded-words joined without separators
  *    per the spec, charset via the shared [[CharsetSniff]] resolver;
  *  - Date → epoch millis through the RFC 1123 parser (java.time);
  *    unparseable dates are NULL, never a guess;
  *  - body transfer decoding: 7bit/8bit/binary verbatim,
  *    quoted-printable (soft line breaks, `=XX`), base64 (the MIME
  *    decoder — whitespace-tolerant);
  *  - MIME tree walk: multipart containers split on the boundary parameter
  *    and recurses (depth ≤ 8, parts ≤ 64); `multipart/alternative`
  *    prefers the LAST text part it can extract (the spec's
  *    increasing-faithfulness order); other multiparts concatenate
  *    every extractable part; `message/rfc822` recurses into the
  *    embedded message's body; `text/plain` decodes per its charset
  *    param; `text/html` goes through [[HtmlText]]; everything else
  *    (attachments) contributes nothing;
  *  - whitespace collapses to the html_to_text contract so every
  *    document source normalizes identically.
  *
  * Payloads with no recognizable header block → NULL. Per-row inside
  * the scan projection, zero shuffle at any scale.
  */
case class EmlTextExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = EmlText.schema
  override def prettyName: String = "eml_text"
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects binary content, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    EmlText.parseRow(input.asInstanceOf[Array[Byte]])

  override def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.EmlText.parseRow($c);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object EmlText {

  val schema: StructType = StructType(Seq(
    StructField("subject", StringType),
    StructField("from", StringType),
    StructField("date_ms", LongType),
    StructField("text", StringType)))

  final case class Mail(subject: String, from: String, dateMs: Long,
      text: String)

  def parseRow(b: Array[Byte]): InternalRow = {
    val m = parse(b)
    if (m == null) null
    else new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](
        if (m.subject == null) null else UTF8String.fromString(m.subject),
        if (m.from == null) null else UTF8String.fromString(m.from),
        if (m.dateMs < 0) null else m.dateMs,
        UTF8String.fromString(m.text)))
  }

  private val MaxDepth = 8
  private val MaxParts = 64
  private val MaxText = 16 << 20

  // ------------------------------------------------------ header block

  /** (headers first-wins lowercased, body-start offset), or null when
    * the payload has no recognizable header block. */
  private def splitHeaders(b: Array[Byte]): (Map[String, String], Int) = {
    // find the blank line (CRLFCRLF or LFLF); headers are ASCII-ish —
    // decode the block as ISO-8859-1 (loss-free byte↔char)
    var bodyAt = -1
    var i = 0
    while (bodyAt < 0 && i < b.length) {
      if (b(i) == '\n') {
        if (i + 1 < b.length && b(i + 1) == '\n') bodyAt = i + 2
        else if (i + 2 < b.length && b(i + 1) == '\r' && b(i + 2) == '\n')
          bodyAt = i + 3
      }
      i += 1
    }
    val headEnd = if (bodyAt < 0) b.length else bodyAt
    val head = new String(b, 0, headEnd,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    // unfold: CRLF/LF followed by WSP joins with a single space
    val unfolded = head.replaceAll("\r?\n[ \t]+", " ")
    var map = Map.empty[String, String]
    var any = false
    unfolded.split("\r?\n").foreach { line =>
      val colon = line.indexOf(':')
      // a header NAME is printable ASCII sans colon/space (RFC 5322)
      if (colon > 0 && line.substring(0, colon).forall(c =>
          c > 32 && c < 127 && c != ':')) {
        any = true
        val k = line.substring(0, colon).toLowerCase(java.util.Locale.ROOT)
        if (!map.contains(k)) map = map.updated(k, line.substring(colon + 1).trim)
      }
    }
    if (!any) null
    else (map, if (bodyAt < 0) b.length else bodyAt)
  }

  // -------------------------------------------------- RFC 2047 words

  /** Decode encoded-words; adjacent encoded-words join without the
    * intervening whitespace (RFC 2047 §6.2); plain runs pass through. */
  private[functions] def decodeWords(s: String): String = {
    if (s == null) return null
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    var lastWasWord = false
    while (i < s.length) {
      val at = s.indexOf("=?", i)
      if (at < 0) { out.append(s, i, s.length); i = s.length }
      else {
        val q1 = s.indexOf('?', at + 2)
        val q2 = if (q1 < 0) -1 else s.indexOf('?', q1 + 1)
        val end = if (q2 < 0) -1 else s.indexOf("?=", q2 + 1)
        if (q1 < 0 || q2 < 0 || end < 0) {
          out.append(s, i, at + 2); i = at + 2; lastWasWord = false
        } else {
          val between = s.substring(i, at)
          // whitespace BETWEEN two encoded-words is transparent
          if (!(lastWasWord && between.forall(c => c == ' ' || c == '\t')))
            out.append(between)
          val charset = s.substring(at + 2, q1)
          val enc = s.substring(q1 + 1, q2).toLowerCase(java.util.Locale.ROOT)
          val payload = s.substring(q2 + 1, end)
          val bytes: Array[Byte] = enc match {
            case "b" =>
              try java.util.Base64.getMimeDecoder.decode(payload)
              catch { case _: IllegalArgumentException => null }
            case "q" =>
              val o = new java.io.ByteArrayOutputStream(payload.length)
              var j = 0
              var ok = true
              while (ok && j < payload.length) {
                payload.charAt(j) match {
                  case '_' => o.write(' '); j += 1
                  case '=' =>
                    if (j + 2 < payload.length) {
                      val hi = Character.digit(payload.charAt(j + 1), 16)
                      val lo = Character.digit(payload.charAt(j + 2), 16)
                      if (hi >= 0 && lo >= 0) { o.write((hi << 4) | lo); j += 3 }
                      else ok = false
                    } else ok = false
                  case c => o.write(c); j += 1
                }
              }
              if (ok) o.toByteArray else null
            case _ => null
          }
          if (bytes == null) {
            out.append(s, at, end + 2) // malformed word stays verbatim
            lastWasWord = false
          } else {
            val cs = CharsetSniff.resolve(
              charset.toLowerCase(java.util.Locale.ROOT))
            val decoded =
              if (cs == null) null else CharsetSniff.decode(bytes, 0, cs)
            if (decoded == null) out.append(s, at, end + 2)
            else out.append(decoded)
            lastWasWord = decoded != null
          }
          i = end + 2
        }
      }
    }
    out.toString
  }

  // --------------------------------------------------- body decoding

  private def qpDecode(body: Array[Byte]): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream(body.length)
    var i = 0
    while (i < body.length) {
      val c = body(i) & 0xff
      if (c == '=') {
        if (i + 1 < body.length && body(i + 1) == '\n') i += 2 // soft break LF
        else if (i + 2 < body.length && body(i + 1) == '\r' &&
            body(i + 2) == '\n') i += 3 // soft break CRLF
        else if (i + 2 < body.length) {
          val hi = Character.digit(body(i + 1), 16)
          val lo = Character.digit(body(i + 2), 16)
          if (hi >= 0 && lo >= 0) { o.write((hi << 4) | lo); i += 3 }
          else { o.write(c); i += 1 } // malformed escape stays verbatim
        } else { o.write(c); i += 1 }
      } else { o.write(c); i += 1 }
    }
    o.toByteArray
  }

  private def transferDecode(body: Array[Byte], cte: String): Array[Byte] =
    cte match {
      case "quoted-printable" => qpDecode(body)
      case "base64" =>
        try java.util.Base64.getMimeDecoder.decode(
          new String(body, java.nio.charset.StandardCharsets.US_ASCII)
            .replaceAll("[^A-Za-z0-9+/=]", ""))
        catch { case _: IllegalArgumentException => Array.emptyByteArray }
      case _ => body // 7bit / 8bit / binary / absent
    }

  /** `param` from a structured header value (`; name=value` pairs,
    * optionally quoted), case-insensitive; null when absent. */
  private[functions] def headerParam(value: String, param: String): String = {
    if (value == null) return null
    value.split(";").drop(1).foreach { seg =>
      val eq = seg.indexOf('=')
      if (eq > 0) {
        val name = seg.substring(0, eq).trim.toLowerCase(java.util.Locale.ROOT)
        if (name == param) {
          var v = seg.substring(eq + 1).trim
          if (v.length >= 2 && v.charAt(0) == '"' && v.endsWith("\""))
            v = v.substring(1, v.length - 1)
          return v
        }
      }
    }
    null
  }

  private def mediaType(contentType: String): String =
    if (contentType == null) "text/plain"
    else contentType.split(";")(0).trim.toLowerCase(java.util.Locale.ROOT)

  /** Extract the text of one MIME entity (headers already split). */
  private def entityText(headers: Map[String, String], body: Array[Byte],
      depth: Int): String = {
    if (depth > MaxDepth) return ""
    val ct = headers.get("content-type").orNull
    val mt = mediaType(ct)
    val cte = headers.getOrElse("content-transfer-encoding", "7bit")
      .trim.toLowerCase(java.util.Locale.ROOT)
    if (mt.startsWith("multipart/")) {
      val boundary = headerParam(ct, "boundary")
      if (boundary == null) return ""
      val parts = splitMultipart(body, boundary)
      val texts = parts.take(MaxParts).flatMap { part =>
        splitHeaders(part) match {
          case null => None
          case (h, at) =>
            val t = entityText(h,
              java.util.Arrays.copyOfRange(part, at, part.length), depth + 1)
            if (t.isEmpty) None else Some(t)
        }
      }
      if (mt == "multipart/alternative")
        texts.lastOption.getOrElse("") // increasing faithfulness
      else texts.mkString(" ")
    } else if (mt == "message/rfc822") {
      splitHeaders(body) match {
        case null => ""
        case (h, at) => entityText(h,
          java.util.Arrays.copyOfRange(body, at, body.length), depth + 1)
      }
    } else if (mt == "text/plain" || mt == "text/html") {
      val decoded = transferDecode(body, cte)
      val csLabel = Option(headerParam(ct, "charset"))
        .map(_.toLowerCase(java.util.Locale.ROOT)).getOrElse("utf-8")
      val cs = Option(CharsetSniff.resolve(csLabel))
        .getOrElse(java.nio.charset.StandardCharsets.UTF_8)
      val text = CharsetSniff.decode(decoded, 0, cs)
      if (text == null) ""
      else if (mt == "text/html") HtmlText.extract(text)
      else text
    } else "" // attachments contribute nothing
  }

  /** Body parts between boundary delimiters (RFC 2046 §5.1.1): lines
    * `--boundary` separate, `--boundary--` terminates; the preamble
    * and epilogue drop. */
  private def splitMultipart(body: Array[Byte],
      boundary: String): Seq[Array[Byte]] = {
    val s = new String(body, java.nio.charset.StandardCharsets.ISO_8859_1)
    val delim = "--" + boundary
    val out = Vector.newBuilder[Array[Byte]]
    var at = s.indexOf(delim)
    var count = 0
    while (at >= 0 && count < MaxParts) {
      // delimiter must start a line
      if (at == 0 || s.charAt(at - 1) == '\n') {
        val lineEnd0 = s.indexOf('\n', at)
        if (lineEnd0 < 0) return out.result()
        val line = s.substring(at, lineEnd0).stripTrailing()
        if (line == delim + "--") return out.result() // terminator
        if (line == delim) {
          val partStart = lineEnd0 + 1
          // find the NEXT delimiter line
          var next = s.indexOf(delim, partStart)
          while (next > 0 && s.charAt(next - 1) != '\n')
            next = s.indexOf(delim, next + 1)
          if (next < 0) return out.result() // unterminated: drop tail
          var partEnd = next
          // the CRLF before the delimiter belongs to the delimiter
          if (partEnd > partStart && s.charAt(partEnd - 1) == '\n') partEnd -= 1
          if (partEnd > partStart && s.charAt(partEnd - 1) == '\r') partEnd -= 1
          out += s.substring(partStart, partEnd)
            .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
          count += 1
          at = next
        } else at = s.indexOf(delim, at + 1)
      } else at = s.indexOf(delim, at + 1)
    }
    out.result()
  }

  // ------------------------------------------------------------ parse

  private def whitespaceCollapse(s: String): String = {
    val out = new java.lang.StringBuilder(s.length)
    var pending = false
    var i = 0
    while (i < s.length && out.length < MaxText) {
      val c = s.charAt(i)
      if (c == ' ' || c == '\t' || c == '\r' || c == '\n' ||
          c == '\u00a0' || c == '\f') pending = true
      else {
        if (pending && out.length > 0) out.append(' ')
        pending = false
        out.append(c)
      }
      i += 1
    }
    out.toString
  }

  def parse(b: Array[Byte]): Mail = {
    if (b == null || b.length < 8) return null
    val split = splitHeaders(b)
    if (split == null) return null
    val (headers, bodyAt) = split
    // an email has at least one of the defining headers — a colon in
    // some random text file does not make it mail
    if (!headers.contains("from") && !headers.contains("subject") &&
        !headers.contains("date") && !headers.contains("content-type"))
      return null
    val subject = headers.get("subject").map(decodeWords).orNull
    val from = headers.get("from").map(decodeWords).orNull
    val dateMs: Long = headers.get("date").map { d =>
      try java.time.ZonedDateTime.parse(d.trim,
        java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME)
        .toInstant.toEpochMilli
      catch { case _: java.time.format.DateTimeParseException => -1L }
    }.getOrElse(-1L)
    val text = entityText(headers,
      java.util.Arrays.copyOfRange(b, bodyAt, b.length), 0)
    Mail(subject, from, dateMs, whitespaceCollapse(text).trim)
  }

  // ------------------------------------------------- fixture encoder

  /** One RFC 2047 B-encoded word for a header value. */
  def encodeWordB(s: String): String =
    "=?utf-8?B?" + java.util.Base64.getEncoder.encodeToString(
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8)) + "?="

  /** One RFC 2047 Q-encoded word (utf-8 payload). */
  def encodeWordQ(s: String): String = {
    val sb = new java.lang.StringBuilder("=?utf-8?Q?")
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8).foreach { bb =>
      val c = bb & 0xff
      if (c == ' ') sb.append('_')
      else if (c > 32 && c < 127 && c != '=' && c != '?' && c != '_')
        sb.append(c.toChar)
      else sb.append(f"=$c%02X")
    }
    sb.append("?=").toString
  }

  def encodeQp(s: String, cs: java.nio.charset.Charset): String = {
    val sb = new java.lang.StringBuilder(s.length * 2)
    var col = 0
    s.getBytes(cs).foreach { bb =>
      val c = bb & 0xff
      if (col > 70) { sb.append("=\r\n"); col = 0 } // soft line break
      if ((c >= 33 && c <= 126 && c != '=') || c == ' ' || c == '\t') {
        sb.append(c.toChar); col += 1
      } else if (c == '\n') { sb.append("\r\n"); col = 0 }
      else { sb.append(f"=$c%02X"); col += 3 }
    }
    sb.toString
  }

  /** A REAL RFC 5322 message. `bodyKind` selects the MIME spelling:
    * "plain" (7bit), "qp" (quoted-printable windows-1252), "b64"
    * (base64 utf-8), "alt" (multipart/alternative: html then the
    * plain part LAST — wait, alternative order is increasing
    * faithfulness: plain first, html last; the extractor prefers the
    * LAST extractable part → the html one must carry the same text),
    * "mixed" (text + an attachment that must contribute nothing),
    * "nested" (message/rfc822 wrapper). */
  def encodeEml(subject: String, from: String, date: String, body: String,
      bodyKind: String = "plain", subjectEnc: String = "none",
      foldSubject: Boolean = false): Array[Byte] = {
    val sb = new java.lang.StringBuilder(1024)
    // the builder serializes to ISO-8859-1 at the end; non-latin1 body
    // text must already sit as its UTF-8 BYTES (one char per byte)
    def raw(s: String): String = new String(
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val subjVal = subjectEnc match {
      case "b" => encodeWordB(subject)
      case "q" => encodeWordQ(subject)
      case _ => subject
    }
    if (foldSubject && subjVal.contains(' ')) {
      // fold at a space near the middle — the continuation line's
      // leading WSP must unfold back to exactly one space
      var cut = subjVal.indexOf(' ', subjVal.length / 2)
      if (cut < 0) cut = subjVal.indexOf(' ')
      sb.append("Subject: ").append(subjVal.substring(0, cut))
        .append("\r\n ").append(subjVal.substring(cut + 1)).append("\r\n")
    } else sb.append("Subject: ").append(subjVal).append("\r\n")
    sb.append("From: ").append(from).append("\r\n")
    sb.append("Date: ").append(date).append("\r\n")
    sb.append("MIME-Version: 1.0\r\n")
    bodyKind match {
      case "plain" =>
        sb.append("Content-Type: text/plain; charset=utf-8\r\n\r\n")
        sb.append(raw(body))
      case "qp" =>
        sb.append("Content-Type: text/plain; charset=windows-1252\r\n")
        sb.append("Content-Transfer-Encoding: quoted-printable\r\n\r\n")
        sb.append(encodeQp(body,
          java.nio.charset.Charset.forName("windows-1252")))
      case "b64" =>
        sb.append("Content-Type: text/plain; charset=utf-8\r\n")
        sb.append("Content-Transfer-Encoding: base64\r\n\r\n")
        // MIME line-wrapped base64
        sb.append(java.util.Base64.getMimeEncoder.encodeToString(
          body.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      case "alt" =>
        val bd = "----=_graft_alt_7bf3"
        sb.append(s"""Content-Type: multipart/alternative; boundary="$bd"\r\n\r\n""")
        sb.append("preamble to be ignored\r\n")
        sb.append(s"--$bd\r\n")
        sb.append("Content-Type: text/plain; charset=utf-8\r\n\r\n")
        sb.append("plain fallback not preferred\r\n")
        sb.append(s"--$bd\r\n")
        sb.append("Content-Type: text/html; charset=utf-8\r\n\r\n")
        sb.append(raw(s"<html><body><p>${body
          .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        }</p></body></html>\r\n"))
        sb.append(s"--$bd--\r\nepilogue ignored\r\n")
      case "mixed" =>
        val bd = "----=_graft_mix_51ac"
        sb.append(s"""Content-Type: multipart/mixed; boundary="$bd"\r\n\r\n""")
        sb.append(s"--$bd\r\n")
        sb.append("Content-Type: text/plain; charset=utf-8\r\n\r\n")
        sb.append(raw(body)).append("\r\n")
        sb.append(s"--$bd\r\n")
        sb.append("Content-Type: application/octet-stream\r\n")
        sb.append("Content-Transfer-Encoding: base64\r\n")
        sb.append("Content-Disposition: attachment; filename=\"a.bin\"\r\n\r\n")
        sb.append(java.util.Base64.getEncoder.encodeToString(
          Array.tabulate[Byte](32)(i => i.toByte))).append("\r\n")
        sb.append(s"--$bd--\r\n")
      case "nested" =>
        sb.append("Content-Type: message/rfc822\r\n\r\n")
        sb.append(new String(encodeEml("inner subject", "inner@x", date,
          body, "plain"), java.nio.charset.StandardCharsets.ISO_8859_1))
      case other => throw new IllegalArgumentException(other)
    }
    sb.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
  }
}
