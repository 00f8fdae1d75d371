package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** html_to_text(html string) -> string — the WET-generation step between
  * a crawled HTTP response and the documents table (what Common Crawl's
  * conversion records contain, what C4/RefinedWeb start from).
  *
  * Deterministic, documented extraction semantics (a single-pass state
  * machine, no DOM, no library):
  *
  *  - `<script>`/`<style>` elements: the ENTIRE content is dropped, up
  *    to the case-insensitive closing tag — a `>` inside the script
  *    body (comparisons, arrow functions, strings) does not end it.
  *  - `<!-- comments -->` dropped; other `<!...>` declarations
  *    (DOCTYPE) and `<?...?>` processing instructions dropped to their
  *    closing `>`.
  *  - Every other tag is dropped and contributes one whitespace
  *    separator (inline tags therefore also separate — the simple
  *    extractor convention; documented, deterministic). Quoted
  *    attribute values may contain `>` without ending the tag.
  *  - Character references: the HTML-core named set (`&amp;` `&lt;`
  *    `&gt;` `&quot;` `&apos;` `&nbsp;` — nbsp becomes a plain space)
  *    and numeric forms `&#NN;` / `&#xHH;` decode; anything unknown is
  *    kept verbatim (crawl text is full of bare ampersands).
  *  - All whitespace runs collapse to single spaces; the result is
  *    trimmed. An unterminated tag at EOF is dropped.
  *
  * NULL in -> NULL out; the expression itself never throws. Runs inside
  * whole-stage codegen as a static-invoke kernel (same shape as
  * [[ImageMeta]]), per-row, zero shuffle.
  */
case class HtmlTextExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "html_to_text"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a string, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    HtmlText.extractU(input.asInstanceOf[UTF8String])

  override def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HtmlText.extractU($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HtmlText {

  def extractU(s: UTF8String): UTF8String =
    UTF8String.fromString(extract(s.toString))

  def extract(html: String): String = {
    val n = html.length
    val out = new java.lang.StringBuilder(n)
    var pendingSpace = false
    def emit(c: Char): Unit = {
      if (c == ' ' || c == '\t' || c == '\r' || c == '\n' ||
          c == '\u00a0' || c == '\f') pendingSpace = true
      else {
        if (pendingSpace && out.length > 0) out.append(' ')
        pendingSpace = false
        out.append(c)
      }
    }
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.regionMatches(true, i, "<!--", 0, 4)) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
          pendingSpace = true // dropped markup separates, like any tag
        } else if (html.regionMatches(true, i, "<script", 0, 7) &&
            (i + 7 >= n || !Character.isLetterOrDigit(html.charAt(i + 7)))) {
          i = skipRawElement(html, i, "</script")
          pendingSpace = true
        } else if (html.regionMatches(true, i, "<style", 0, 6) &&
            (i + 6 >= n || !Character.isLetterOrDigit(html.charAt(i + 6)))) {
          i = skipRawElement(html, i, "</style")
          pendingSpace = true
        } else {
          // a tag / declaration / PI: scan to the closing '>', honoring
          // quoted attribute values
          var j = i + 1
          var quote: Char = 0
          var done = -1
          while (done < 0 && j < n) {
            val cj = html.charAt(j)
            if (quote != 0) { if (cj == quote) quote = 0 }
            else if (cj == '"' || cj == '\'') quote = cj
            else if (cj == '>') done = j
            j += 1
          }
          i = if (done < 0) n else done + 1 // unterminated tag: drop tail
          pendingSpace = true // every tag separates
        }
      } else if (c == '&') {
        val (decoded, next) = entity(html, i)
        if (next == i) { emit('&'); i += 1 } // unknown ref: verbatim
        else { emit(decoded); i = next }
      } else {
        emit(c)
        i += 1
      }
    }
    out.toString
  }

  /** Past the raw-text element starting at `at` (its close tag's `>`),
    * or end of input when unterminated. */
  private[functions] def skipRawElement(html: String, at: Int, close: String): Int = {
    val n = html.length
    // first the opening tag's own '>'
    var i = html.indexOf('>', at)
    if (i < 0) return n
    i += 1
    var k = i
    while (k + close.length <= n) {
      if (html.regionMatches(true, k, close, 0, close.length)) {
        val gt = html.indexOf('>', k + close.length)
        return if (gt < 0) n else gt + 1
      }
      k += 1
    }
    n
  }

  /** Decode the character reference at `at` ('&'): (char, index past
    * it), or (_, at) — next == at — to keep the ampersand verbatim.
    * nbsp maps to a plain space (the collapse step absorbs it). */
  private[functions] def entity(html: String, at: Int): (Char, Int) = {
    val semi = html.indexOf(';', at + 1)
    if (semi < 0 || semi - at > 10) return (' ', at)
    val name = html.substring(at + 1, semi)
    name match {
      case "amp" => ('&', semi + 1)
      case "lt" => ('<', semi + 1)
      case "gt" => ('>', semi + 1)
      case "quot" => ('"', semi + 1)
      case "apos" => ('\'', semi + 1)
      case "nbsp" => (' ', semi + 1)
      case _ if name.startsWith("#") =>
        val cp =
          try {
            if (name.length > 1 && (name.charAt(1) == 'x' || name.charAt(1) == 'X'))
              Integer.parseInt(name.substring(2), 16)
            else Integer.parseInt(name.substring(1))
          } catch { case _: NumberFormatException => -1 }
        // BMP only: supplementary-plane references stay verbatim (the
        // Char return lane) — rare in crawl text, documented
        if (cp >= 0x20 && cp <= 0xffff && !(cp >= 0xd800 && cp <= 0xdfff))
          (cp.toChar, semi + 1)
        else (' ', at)
      case _ => (' ', at)
    }
  }
}
