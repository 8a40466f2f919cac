package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Scalar core shared by interpreted eval and generated code (object
  * methods compile to static forwarders, so codegen calls it directly). */
object DotQ {
  /** NULL if the lengths differ or any participating element is NULL —
    * matching the `aggregate(zip_with(_*_))` form this expression
    * replaces (zip_with null-pads the shorter array and a NULL product
    * poisons the HOF fold to NULL; a common-prefix dot would silently
    * MASK a dimension mismatch for a general-purpose SQL function).
    * One boxed return per ROW, not per element — negligible next to the
    * loop. */
  def dotOrNull(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }
}

/** INT64 dot product of two quantized `array<long>` vectors as a native
  * codegen expression — the hot primitive under every similarity/ANN
  * cosine ([[graft.ext.Similarity]]).
  *
  * The higher-order-function form (`aggregate(zip_with(_*_))`) builds an
  * intermediate product array and evaluates the lambdas INTERPRETED per
  * row — measured ~2x slower on the 45k-pair cosine shape even before
  * allocation pressure; this expression is one tight primitive loop
  * inside whole-stage codegen. Semantics match the HOF form exactly:
  * NULL on a length mismatch (zip_with null-pads) and NULL if any
  * participating element is NULL.
  */
case class DotQExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isLongArray(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongArray(left.dataType) && isLongArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dotq requires (array<bigint>, array<bigint>), got (${left.dataType}, ${right.dataType})")

  override def dataType: DataType = LongType
  override def prettyName: String = "dotq"

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotQ.dotOrNull(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("dotq")
      s"""java.lang.Long $r = graft.functions.DotQ.dotOrNull($a, $b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotQExpression =
    copy(left = newLeft, right = newRight)
}
