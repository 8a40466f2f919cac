package graft

import org.apache.spark.sql.{Column, GraftBridge}

/** Column-level entry points for the engine's native expressions. */
package object functions {

  /** F14 WRatio as a codegen'd native expression (preferred over the UDF
    * form in any hot path). */
  def wratio(q: Column, target: Column): Column =
    GraftBridge.column(WRatioExpression(
      GraftBridge.expression(q), GraftBridge.expression(target)))

  /** INT64 dot product of quantized vectors as a codegen'd native
    * expression (the similarity/ANN hot primitive). */
  def dotq(a: Column, b: Column): Column =
    GraftBridge.column(DotQExpression(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** int8 scalar quantization (float vector → int codes) as a codegen'd
    * native expression (the SQ compression tier's encode primitive). */
  def sq8(emb: Column): Column =
    GraftBridge.column(Sq8Expression(GraftBridge.expression(emb)))

  /** True BPE token count under the committed merges fixture as a
    * codegen'd native expression (the training-budget primitive). */
  def bpeCount(text: Column): Column =
    GraftBridge.column(BpeCountExpression(GraftBridge.expression(text)))
}
