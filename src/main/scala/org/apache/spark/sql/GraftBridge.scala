package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for this extension library.
  *
  * Spark 4 moved the converters behind `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`); an extension that
  * builds `Column`s around custom Catalyst expressions needs exactly
  * these two functions, so they are re-exported from inside the package —
  * the conventional technique for Spark extension libraries.
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
