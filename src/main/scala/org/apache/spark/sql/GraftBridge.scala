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

  /** Block until the async listener bus has delivered every queued
    * event (`LiveListenerBus.waitUntilEmpty`, `private[spark]`).
    * Measurement probes that attribute task metrics to a query window
    * need a deterministic drain — a wall-clock sleep can both miss late
    * events and bleed one query's events into the next window. */
  def drainListenerBus(sc: org.apache.spark.SparkContext,
                       timeoutMs: Long = 30000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
