package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Scalar core shared by interpreted eval and generated code. */
object Sq8 {
  /** int8 scalar quantization of one float vector: q_i = round(x_i ·
    * 127 / max|x|), round half AWAY FROM ZERO (the semantics of Spark's
    * `round` — decimal HALF_UP on the exact binary value; `Math.round`
    * alone is half-toward-positive-infinity and would differ on
    * negative .5 fractions). Matches the HOF formulation this replaces
    * bit for bit: NULL elements are ignored by the max reduction; an
    * all-zero (or all-NULL) vector quantizes to all-zero codes; with a
    * nonzero scale a NULL element yields a NULL code. Here |x| ≤ 127ish
    * so `x + 0.5` is exact in double and floor(x+0.5) IS decimal
    * HALF_UP. */
  def quantize(a: ArrayData): ArrayData = {
    val n = a.numElements()
    var mx = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val v = Math.abs(a.getFloat(i).toDouble)
        // NaN propagates into the scale like the HOF's greatest() (NaN
        // orders above every double in Spark), so a NaN-bearing vector
        // quantizes to all-zero codes in both formulations
        if (java.lang.Double.isNaN(v) || v > mx) mx = v
      }
      i += 1
    }
    val out = new Array[Any](n)
    i = 0
    if (mx == 0.0) {
      while (i < n) { out(i) = 0L; i += 1 }
    } else {
      while (i < n) {
        out(i) =
          if (a.isNullAt(i)) null
          else {
            val x = (a.getFloat(i).toDouble * 127.0) / mx
            if (x < 0) -Math.round(-x) else Math.round(x)
          }
        i += 1
      }
    }
    new GenericArrayData(out)
  }
}

/** int8 scalar quantization (`array<float>` → `array<bigint>` codes) as
  * a native codegen expression — the corpus-encode primitive of the SQ
  * compression tier ([[graft.ext.Similarity.withSq8]]).
  *
  * The HOF form (`aggregate` for the max-abs scale + `transform` for
  * the codes) evaluates both lambdas INTERPRETED per row and walks the
  * array twice through boxed lambda variables; at 100 TB the encode
  * touches every corpus vector, so it belongs inside whole-stage
  * codegen as one tight two-pass loop — the same argument as
  * [[DotQExpression]]. Semantics match the HOF form exactly (see
  * [[Sq8.quantize]]).
  */
case class Sq8Expression(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sq8 requires array<float>, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "sq8"
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(a: Any): Any =
    Sq8.quantize(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Sq8.quantize($a);")

  override protected def withNewChildInternal(newChild: Expression): Sq8Expression =
    copy(child = newChild)
}
