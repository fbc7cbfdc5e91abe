package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Character k-gram shingles as a single linear pass.
  *
  * The composable form `transform(sequence(...), i -> substr(s, i, k))` is
  * O(len²) per row: SQL substr counts codepoints, so every window re-scans the
  * string from the start. This expression walks the string once (O(len·k)),
  * which is what makes shingle-based dedup viable on long documents at scale.
  *
  * Semantics match `substr(s, i, k)` for BMP text (the SQL oracle counts
  * codepoints; both agree outside supplementary planes). Short inputs
  * (< k chars) yield the whole string as the single shingle.
  */
case class CharShinglesExpr(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes() =
    if (child.dataType.isInstanceOf[org.apache.spark.sql.types.StringType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"requires STRING input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (s.length < k) {
      new GenericArrayData(Array[Any](UTF8String.fromString(s)))
    } else {
      val n = s.length - k + 1
      val out = new Array[Any](n)
      var i = 0
      while (i < n) {
        out(i) = UTF8String.fromString(s.substring(i, i + k))
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object TextExpressions {
  def charShinglesNative(c: Column, k: Int): Column =
    column(CharShinglesExpr(expression(c), k))
}
