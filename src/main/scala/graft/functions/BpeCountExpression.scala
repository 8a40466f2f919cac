package graft.functions

import graft.core.Bpe
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `bpe_count(text)` → true BPE token count under the committed merges
  * fixture ([[graft.core.Bpe]]) — the budget column a training pipeline
  * packs and mixes by (VERDICT r14 task 3, replacing the `subwordCount`
  * regex proxy).
  *
  * Native Catalyst expression so corpus-wide counting stays inside
  * whole-stage codegen: the generated code makes one static call per
  * row (the merges table and word cache live in the executor JVM —
  * loaded from the jar's classpath, nothing serialized per task).
  */
case class BpeCountExpression(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_count requires string, got ${child.dataType}")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "bpe_count"

  override protected def nullSafeEval(t: Any): Any =
    Bpe.countTokens(t.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.core.Bpe.countTokens($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): BpeCountExpression =
    copy(child = newChild)
}
