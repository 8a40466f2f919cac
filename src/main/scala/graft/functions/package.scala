package graft

import org.apache.spark.sql.{Column, GraftBridge}

/** Column-level entry points for the engine's native expressions. */
package object functions {

  /** F14 WRatio as a codegen'd native expression (preferred over the UDF
    * form in any hot path). */
  def wratio(q: Column, target: Column): Column =
    GraftBridge.column(WRatioExpression(
      GraftBridge.expression(q), GraftBridge.expression(target)))
}
