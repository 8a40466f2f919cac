package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._

/** Session extension registering the engine's scalar functions for SQL
  * use (`spark.sql.extensions=graft.functions.GraftExtensions`):
  *
  *   - `wratio(q, t)` — native fuzzy-similarity expression (codegen)
  *   - `dotq(a, b)` — INT64 quantized-vector dot product (codegen)
  *   - `canon(s)` — gazetteer name normalization (F1), expanded into the
  *     same built-in expression tree as [[graft.core.Norm.canon]] — the
  *     Spark analogue of the reference's DuckDB macro (`000_init.sql:5-11`)
  *   - `haversine_km(lat1, lon1, lat2, lon2)` — great-circle km (F13)
  *
  * The composed functions expand to resolved built-in expression trees at
  * registration, so Catalyst optimizes through them (constant folding,
  * pushdown) as if the user had written the expansion inline.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  /** F1 canon as a catalyst tree (must mirror Norm.canon exactly). */
  private def canonExpr(s: Expression): Expression =
    StringTrim(Lower(RegExpReplace(
      RegExpReplace(
        Coalesce(Seq(s, Literal(""))),
        Literal("[^\\p{Alnum}\\s]"), Literal(" ")),
      Literal("\\s+"), Literal(" "))))

  /** F13 haversine as a catalyst tree (mirrors Geo.haversineKm). */
  private def haversineExpr(lat1: Expression, lon1: Expression,
                            lat2: Expression, lon2: Expression): Expression = {
    def rad(e: Expression) = ToRadians(e)
    def sq(e: Expression) = Multiply(e, e)
    val dphi = rad(Subtract(lat2, lat1))
    val dl = rad(Subtract(lon2, lon1))
    val a = Add(
      sq(Sin(Divide(dphi, Literal(2.0)))),
      Multiply(Multiply(Cos(rad(lat1)), Cos(rad(lat2))),
        sq(Sin(Divide(dl, Literal(2.0))))))
    Multiply(Literal(2 * 6371.0088), Asin(Sqrt(a)))
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("wratio"),
      info("wratio", "wratio(q, t) - rapidfuzz-style WRatio similarity in [0,100]"),
      (children: Seq[Expression]) => WRatioExpression(children(0), children(1))))

    ext.injectFunction((
      FunctionIdentifier("dotq"),
      info("dotq", "dotq(a, b) - INT64 dot product of quantized array<bigint> vectors; " +
        "NULL on length mismatch or any NULL element"),
      (children: Seq[Expression]) => DotQExpression(children(0), children(1))))

    ext.injectFunction((
      FunctionIdentifier("sq8"),
      info("sq8", "sq8(v) - int8 scalar quantization of an array<float> vector " +
        "(round(x*127/max|x|), zero vector -> zero codes)"),
      (children: Seq[Expression]) => Sq8Expression(children.head)))

    ext.injectFunction((
      FunctionIdentifier("bpe_count"),
      info("bpe_count", "bpe_count(text) - true BPE token count under the " +
        "committed merges fixture (graft/bpe/merges.txt)"),
      (children: Seq[Expression]) => BpeCountExpression(children.head)))

    ext.injectFunction((
      FunctionIdentifier("canon"),
      info("canon", "canon(s) - scout gazetteer name normalization"),
      (children: Seq[Expression]) => canonExpr(children.head)))

    ext.injectFunction((
      FunctionIdentifier("haversine_km"),
      info("haversine_km", "haversine_km(lat1, lon1, lat2, lon2) - great-circle km"),
      (children: Seq[Expression]) => {
        val c = children.map(e => Cast(e, org.apache.spark.sql.types.DoubleType))
        haversineExpr(c(0), c(1), c(2), c(3))
      }))
  }
}
