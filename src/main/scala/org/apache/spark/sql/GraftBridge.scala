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

  /** A full copy of `s`'s session state (conf, UDF registrations, temp
    * views) over the SAME SparkContext — `SparkSession.cloneSession`,
    * `private[sql]`. The isolation primitive for per-operation conf
    * pinning: set what the operation needs on the clone, run on the
    * clone, drop it — the shared session is never mutated, so
    * concurrent queries can't observe (or race to restore) another
    * operation's overrides. Do NOT stop() a clone — it shares the
    * context. */
  def cloneSession(s: SparkSession): SparkSession =
    s.asInstanceOf[org.apache.spark.sql.classic.SparkSession].cloneSession()

  /** Re-bind `df`'s plan to session `s` (`Dataset.ofRows`,
    * `private[sql]`): the plan executes under s's conf — the second
    * half of the clone-session isolation idiom. Re-binds the ANALYZED
    * plan, not the raw logical one: a df built over a temp view (e.g. a
    * memory-sink drain) carries an UnresolvedRelation in its logical
    * plan, and the view lives in the ORIGIN session's catalog — a clone
    * re-resolving the name would fail (or worse, resolve to something
    * else). The analyzed plan has the relation inlined, so the rebind
    * moves data lineage, never name resolution. */
  def withSession(df: DataFrame, s: SparkSession): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      s.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      df.queryExecution.analyzed)

  /** Schema of one parquet file, read DRIVER-SIDE from its footer.
    * `spark.read.parquet(dir)` runs schema inference as a 1-task Spark
    * JOB (`readParquetFootersInParallel`) — a ~50-100 ms scheduler
    * round-trip per cold table read. For index shard tables whose
    * schema a single footer fully determines (no mergeSchema), the
    * driver can read that footer itself and hand the result to
    * `spark.read.schema(...)`, skipping the job. Uses Spark's own
    * parquet→Catalyst converter, so types match what inference would
    * have produced. */
  def parquetFileSchema(spark: SparkSession,
                        file: org.apache.hadoop.fs.Path): types.StructType = {
    val conf = spark.sparkContext.hadoopConfiguration
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(file, conf)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    val msg = try reader.getFooter.getFileMetaData.getSchema finally reader.close()
    new org.apache.spark.sql.execution.datasources.parquet
      .ParquetToSparkSchemaConverter(spark.sessionState.conf).convert(msg)
  }

  /** Block until the async listener bus has delivered every queued
    * event (`LiveListenerBus.waitUntilEmpty`, `private[spark]`).
    * Measurement probes that attribute task metrics to a query window
    * need a deterministic drain — a wall-clock sleep can both miss late
    * events and bleed one query's events into the next window. */
  def drainListenerBus(sc: org.apache.spark.SparkContext,
                       timeoutMs: Long = 30000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
