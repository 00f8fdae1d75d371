package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** mbox_split(content binary) → array<struct<envelope, message>> —
  * the mailbox container (RFC 4155): mailing-list archives ship as
  * mbox files holding thousands of messages, and the pipeline shape
  * is `explode(mbox_split(mbox))` → [[EmlText]] per message — the
  * container walk is an EXPRESSION so Catalyst's explode does the
  * fan-out (no custom operator, no shuffle beyond the projection):
  *
  *  - message boundaries are "From " ENVELOPE lines at file start or
  *    after a blank line (the RFC 4155 shape — a "From " line
  *    mid-paragraph is content, not a boundary, and real archives
  *    contain them);
  *  - the envelope line (sender + asctime date) is carried verbatim
  *    in `envelope` (minus the "From " prefix);
  *  - From-STUFFING is undone per mboxrd: body lines matching
  *    `^>+From ` drop exactly one `>` (the mboxo subset falls out);
  *  - messages cap at 10,000 per file against hostile inputs;
  *    payloads that do not start with an envelope line → NULL
  *    (not an mbox; a bare RFC 5322 message belongs to eml_text).
  *
  * Per-row inside the scan projection. */
case class MboxSplitExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(MboxSplit.entryType)
  override def prettyName: String = "mbox_split"
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects binary content, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    MboxSplit.splitRow(input.asInstanceOf[Array[Byte]])

  override def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MboxSplit.splitRow($c);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MboxSplit {

  val entryType: StructType = StructType(Seq(
    StructField("envelope", StringType),
    StructField("message", BinaryType)))

  private val MaxMessages = 10000

  def splitRow(b: Array[Byte]): ArrayData = {
    val msgs = split(b)
    if (msgs == null) null
    else new GenericArrayData(msgs.map { case (env, body) =>
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](UTF8String.fromString(env), body))
    }.toArray[Any])
  }

  private def isFromLine(s: String, at: Int): Boolean =
    s.startsWith("From ", at)

  /** Messages as (envelope, unstuffed bytes), or null for non-mbox. */
  def split(b: Array[Byte]): Seq[(String, Array[Byte])] = {
    if (b == null || b.length < 6) return null
    // the mbox is line-structured ASCII framing around 8-bit bodies:
    // ISO-8859-1 is the loss-free byte↔char view
    val s = new String(b, java.nio.charset.StandardCharsets.ISO_8859_1)
    if (!isFromLine(s, 0)) return null
    // boundary offsets: "From " at 0, or following a BLANK line
    val bounds = scala.collection.mutable.ArrayBuffer(0)
    var i = s.indexOf('\n')
    while (i >= 0 && bounds.size < MaxMessages) {
      // a blank line, then a From-line?
      var j = i + 1
      if (j < s.length && s.charAt(j) == '\r') j += 1
      if (j < s.length && s.charAt(j) == '\n') {
        var k = j + 1
        if (k < s.length && isFromLine(s, k)) bounds += k
      }
      i = s.indexOf('\n', i + 1)
    }
    val out = Vector.newBuilder[(String, Array[Byte])]
    var idx = 0
    while (idx < bounds.size) {
      val from = bounds(idx)
      val end = if (idx + 1 < bounds.size) bounds(idx + 1) else s.length
      // envelope line
      val eol = {
        val e = s.indexOf('\n', from)
        if (e < 0 || e >= end) end else e
      }
      var envEnd = eol
      if (envEnd > from && s.charAt(envEnd - 1) == '\r') envEnd -= 1
      val envelope = s.substring(from + 5, math.max(from + 5, envEnd))
      // message body: unstuff ^>+From  lines (drop one '>')
      val body = new java.lang.StringBuilder(end - eol)
      var p = math.min(eol + 1, end)
      while (p < end) {
        var lineEnd = s.indexOf('\n', p)
        if (lineEnd < 0 || lineEnd >= end) lineEnd = end - 1
        // detect >+From
        var q = p
        while (q < end && s.charAt(q) == '>') q += 1
        if (q > p && isFromLine(s, q)) body.append(s, p + 1, lineEnd + 1)
        else body.append(s, p, lineEnd + 1)
        p = lineEnd + 1
      }
      // trim the blank separator line(s) that belong to the FRAMING
      var text = body.toString
      while (text.endsWith("\n\n") || text.endsWith("\r\n\r\n"))
        text = text.substring(0, text.length -
          (if (text.endsWith("\r\n\r\n")) 2 else 1))
      out += ((envelope,
        text.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)))
      idx += 1
    }
    out.result()
  }

  // ------------------------------------------------- fixture encoder

  /** A REAL mbox: envelope lines + From-stuffed message bodies. */
  def encodeMbox(messages: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new java.lang.StringBuilder(1024)
    messages.foreach { case (envelope, msg) =>
      out.append("From ").append(envelope).append('\n')
      val body = new String(msg, java.nio.charset.StandardCharsets.ISO_8859_1)
      body.split("\n", -1).foreach { line =>
        // stuff any line whose visible text begins (>*)From_ — the
        // mboxrd discipline, symmetric with the splitter's unstuff
        var q = 0
        while (q < line.length && line.charAt(q) == '>') q += 1
        if (line.startsWith("From ", q)) out.append('>')
        out.append(line).append('\n')
      }
      // ensure a blank separator line before the next envelope
      if (!out.toString.endsWith("\n\n")) out.append('\n')
    }
    out.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
  }
}
