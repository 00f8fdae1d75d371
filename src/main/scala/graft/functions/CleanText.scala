package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** clean_text(text) → string — the unicode-normalization front step of
  * every real curation pipeline (run BEFORE tokenization, dedup
  * shingling, or LM scoring, so byte-different spellings of the same
  * text hash identically):
  *
  *  1. Unicode NFC normalization (java.text.Normalizer — decomposed
  *     accents compose, compatibility forms untouched: NFC, not NFKC,
  *     because DuckDB's `nfc_normalize` is the oracle and because NFKC
  *     loses information a corpus owner may want);
  *  2. C0 control characters (except the whitespace trio \t \n \r),
  *     \x0b, \x0c, and DEL stripped — PDF/OCR payloads leak them;
  *  3. whitespace runs (\t \n \r space) collapsed to single spaces and
  *     trimmed — the same contract html_to_text / docx_text emit, so
  *     every text column in the pipeline shares one whitespace shape.
  *
  * \x0b/\x0c sit in the STRIP class rather than the collapse class
  * deliberately: Java's `\s` includes \x0b, RE2's (DuckDB's) does not —
  * removing them first keeps the two dialects' `\s+` collapse
  * equivalent. NULL → NULL. Single pass after NFC, codegen'd per-row,
  * zero shuffle.
  */
case class CleanTextExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "clean_text"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects string, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    CleanText.cleanU(input.asInstanceOf[UTF8String])

  override def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.CleanText.cleanU($c);""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CleanText {

  def cleanU(s: UTF8String): UTF8String =
    UTF8String.fromString(clean(s.toString))

  def clean(s0: String): String = {
    val s = java.text.Normalizer.normalize(s0, java.text.Normalizer.Form.NFC)
    val out = new java.lang.StringBuilder(s.length)
    var pendingSpace = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == ' ' || c == '\t' || c == '\n' || c == '\r') pendingSpace = true
      else if (c < 0x20 || c == 0x7f) () // control: strip, no separator
      else {
        if (pendingSpace && out.length > 0) out.append(' ')
        pendingSpace = false
        out.append(c)
      }
      i += 1
    }
    out.toString
  }
}
