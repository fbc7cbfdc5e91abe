package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text canonicalization for ingest pipelines: NFC normalization
  * (compose combining sequences — the form every downstream exact-dedup
  * fingerprint, shingle, and tokenizer should see, so that `e` + U+0301 and
  * precomposed `é` hash identically) and accent stripping (NFD then drop
  * non-spacing marks — the classic fold used before language-agnostic
  * matching; non-decomposable letters like `ø` pass through unchanged).
  *
  * Spark has no built-in Unicode-normalization function, so these are native
  * Catalyst expressions over `java.text.Normalizer` with real `doGenCode`
  * (the call stays inside whole-stage codegen; no UDF boxing). The semantics
  * are the Unicode standard's, so DuckDB's utf8proc-based `nfc_normalize` /
  * `strip_accents` agree byte-for-byte — verified over the full composed +
  * decomposed Latin accent set by `UnicodeNormSpec` and the `text_normalize`
  * oracle gate.
  *
  * Scale shape: a pure per-row projection with an ASCII fast path (the bulk
  * of a crawl corpus) that returns the input buffer untouched — no
  * Normalizer call, no allocation — so the expression runs at scan speed.
  */
object UnicodeNorm {
  /** True iff every byte is < 0x80 (pure ASCII ⇒ NFC/strip are identity). */
  private def isAscii(s: UTF8String): Boolean = {
    val n = s.numBytes()
    var i = 0
    while (i < n) {
      if ((s.getByte(i) & 0x80) != 0) return false
      i += 1
    }
    true
  }

  def nfc(s: UTF8String): UTF8String =
    if (isAscii(s)) s
    else UTF8String.fromString(
      Normalizer.normalize(s.toString, Normalizer.Form.NFC))

  def stripAccents(s: UTF8String): UTF8String =
    if (isAscii(s)) s
    else {
      val d = Normalizer.normalize(s.toString, Normalizer.Form.NFD)
      val sb = new java.lang.StringBuilder(d.length)
      var i = 0
      while (i < d.length) {
        val cp = d.codePointAt(i)
        if (Character.getType(cp) != Character.NON_SPACING_MARK)
          sb.appendCodePoint(cp)
        i += Character.charCount(cp)
      }
      UTF8String.fromString(sb.toString)
    }
}

case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes() =
    if (child.dataType.isInstanceOf[StringType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"requires STRING input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    UnicodeNorm.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.UnicodeNorm$$.MODULE$$.nfc($c)")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class StripAccentsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes() =
    if (child.dataType.isInstanceOf[StringType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"requires STRING input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    UnicodeNorm.stripAccents(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.UnicodeNorm$$.MODULE$$.stripAccents($c)")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object UnicodeExpressions {
  def nfcNormalize(c: Column): Column = column(NfcNormalizeExpr(expression(c)))
  def stripAccents(c: Column): Column = column(StripAccentsExpr(expression(c)))
}
