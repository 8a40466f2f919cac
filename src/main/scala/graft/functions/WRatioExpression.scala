package graft.functions

import graft.core.Fuzz
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** F14 as a native Catalyst expression: `wratio(query, target)` → 0..100.
  *
  * Versus a Scala UDF this stays inside whole-stage codegen with a
  * direct static call — no closure serialization, no encoder round trip,
  * no extra null-handling wrapper — which is the preferred shape for the
  * scoring hot path (SURVEY.md §2.7, §7.3). The scalar algorithm lives
  * in [[graft.core.Fuzz]] (object methods compile to static forwarders,
  * so generated Java can call it directly).
  */
case class WRatioExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"wratio requires (string, string), got (${left.dataType}, ${right.dataType})")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "wratio"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Fuzz.wratio(a.asInstanceOf[UTF8String].toString, b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.core.Fuzz.wratio($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WRatioExpression =
    copy(left = newLeft, right = newRight)
}
