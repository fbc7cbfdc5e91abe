package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Pareto dominance as a codegen'd Catalyst expression: `a` dominates `b`
  * iff a[i] <= b[i] for all i and a[i] < b[i] for at least one i
  * (minimization; exact reference semantics `ServiceTuple.java:67-77`,
  * including "equal vectors never dominate"). Registered in SQL as
  * `sky_dominates(a, b)` by [[graft.plans.SkylineExtensions]].
  */
case class DominatesExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes() =
    org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return false
    var better = false
    var i = 0
    while (i < n) {
      val av = x.getDouble(i); val bv = y.getDouble(i)
      if (av > bv) return false
      if (av < bv) better = true
      i += 1
    }
    better
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val better = ctx.freshName("better"); val bad = ctx.freshName("bad")
      val av = ctx.freshName("av"); val bv = ctx.freshName("bv")
      s"""
         |int $n = $a.numElements();
         |boolean $better = false;
         |boolean $bad = ($n != $b.numElements());
         |for (int $i = 0; !$bad && $i < $n; $i++) {
         |  double $av = $a.getDouble($i);
         |  double $bv = $b.getDouble($i);
         |  if ($av > $bv) { $bad = true; }
         |  else if ($av < $bv) { $better = true; }
         |}
         |${ev.value} = !$bad && $better;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object DominanceExpressions {
  /** Column API: does `a` Pareto-dominate `b` (both ARRAY<DOUBLE>)? */
  def dominates(a: Column, b: Column): Column =
    column(DominatesExpr(expression(a), expression(b)))
}
