package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** main_text(html string) -> string — BOILERPLATE REMOVAL, the step
  * between [[HtmlText]] (which keeps everything) and a training
  * corpus (which must not learn nav menus, cookie banners, and footer
  * link farms). The boilerpipe/trafilatura-class heuristic, stated
  * exactly so the behavior is a contract, not a vibe:
  *
  *  1. the page segments into BLOCKS at block-level tag boundaries
  *     (p, div, section, article, h1–h6, li, ul, ol, table, tr, td,
  *     th, blockquote, pre, br, main, body, figure, figcaption, dl,
  *     dt, dd);
  *  2. content inside <nav>, <header>, <footer>, <aside>, and <form>
  *     subtrees is boilerplate BY STRUCTURE and is dropped wholesale
  *     (nesting tracked per element name, stray close tags clamp at
  *     zero);
  *  3. a surviving block is KEPT iff its normalized text is ≥ 25
  *     chars AND its link density ≤ 1/3 (non-space chars inside <a>
  *     count as link chars, separator spaces are neutral; menus and
  *     related-article lists die here);
  *  4. kept blocks join with single spaces under [[HtmlText]]'s
  *     whitespace-collapse contract, and script/style/comment content
  *     never reaches a block (shared raw-element skipping).
  *
  * The thresholds (25 chars, 1/3 density) are the classic
  * boilerpipe-style operating point; they are constants of the
  * contract, exercised verbatim by the oracle fixtures. Per-row
  * inside the scan projection, zero shuffle at any scale.
  */
case class MainTextExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "main_text"
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects an html string, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    MainText.extractU(input.asInstanceOf[UTF8String])

  override def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MainText.extractU($c);""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MainText {

  /** Keep-rule constants — part of the operator contract. */
  val MinBlockChars = 25
  val MaxLinkDensityNum = 1 // link chars ≤ text chars × 1/3
  val MaxLinkDensityDen = 3

  private val BlockTags = Set(
    "p", "div", "section", "article", "h1", "h2", "h3", "h4", "h5", "h6",
    "li", "ul", "ol", "table", "tr", "td", "th", "blockquote", "pre",
    "br", "main", "body", "figure", "figcaption", "dl", "dt", "dd")

  private val DropTags = Set("nav", "header", "footer", "aside", "form")

  def extractU(s: UTF8String): UTF8String =
    UTF8String.fromString(extract(s.toString))

  def extract(html: String): String = {
    val n = html.length
    val out = new java.lang.StringBuilder(n / 2)

    // current block accumulator
    val block = new java.lang.StringBuilder(256)
    var blockPending = false // pendingSpace within the block
    var linkChars = 0
    var linkDepth = 0
    var dropDepth = 0

    def emitChar(c: Char): Unit = {
      if (dropDepth > 0) return
      if (c == ' ' || c == '\t' || c == '\r' || c == '\n' ||
          c == '\u00a0' || c == '\f') blockPending = true
      else {
        // separator spaces are NEUTRAL: they sit at word/tag
        // boundaries and belong to neither link nor body text
        if (blockPending && block.length > 0) block.append(' ')
        blockPending = false
        block.append(c)
        if (linkDepth > 0) linkChars += 1
      }
    }

    def flushBlock(): Unit = {
      val text = block.toString.trim
      if (text.length >= MinBlockChars &&
          linkChars.toLong * MaxLinkDensityDen <=
            text.length.toLong * MaxLinkDensityNum) {
        if (out.length > 0) out.append(' ')
        out.append(text)
      }
      block.setLength(0)
      blockPending = false
      linkChars = 0
    }

    /** The element name starting a tag at `at` (past '<' and any '/');
      * lowercase, empty for declarations/PIs. */
    def tagName(at: Int): String = {
      var j = at
      val sb = new java.lang.StringBuilder(8)
      while (j < n && (html.charAt(j).isLetterOrDigit)) {
        sb.append(Character.toLowerCase(html.charAt(j)))
        j += 1
      }
      sb.toString
    }

    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.regionMatches(true, i, "<!--", 0, 4)) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
          blockPending = true
        } else if (html.regionMatches(true, i, "<script", 0, 7) &&
            (i + 7 >= n || !Character.isLetterOrDigit(html.charAt(i + 7)))) {
          i = HtmlText.skipRawElement(html, i, "</script")
          blockPending = true
        } else if (html.regionMatches(true, i, "<style", 0, 6) &&
            (i + 6 >= n || !Character.isLetterOrDigit(html.charAt(i + 6)))) {
          i = HtmlText.skipRawElement(html, i, "</style")
          blockPending = true
        } else {
          val closing = i + 1 < n && html.charAt(i + 1) == '/'
          val name = tagName(if (closing) i + 2 else i + 1)
          // scan to '>' honoring quotes (shared convention)
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
          val selfClose = done > i && html.charAt(done - 1) == '/'
          i = if (done < 0) n else done + 1
          if (name == "a") {
            if (closing) { if (linkDepth > 0) linkDepth -= 1 }
            else if (!selfClose) linkDepth += 1
          } else if (DropTags.contains(name)) {
            if (closing) { if (dropDepth > 0) dropDepth -= 1 }
            else if (!selfClose) {
              if (dropDepth == 0) flushBlock() // boundary into boilerplate
              dropDepth += 1
            }
          } else if (BlockTags.contains(name)) {
            if (dropDepth == 0) flushBlock()
          }
          blockPending = true
        }
      } else if (c == '&') {
        val (decoded, next) = HtmlText.entity(html, i)
        if (next == i) { emitChar('&'); i += 1 }
        else { emitChar(decoded); i = next }
      } else {
        emitChar(c)
        i += 1
      }
    }
    flushBlock()
    out.toString
  }
}
