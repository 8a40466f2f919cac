package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming surface (SURVEY.md §2.8 extension targets):
  * watermarked tumbling windows, session windows, streaming dedup, and
  * an availableNow replay harness that lets batch oracles check
  * streaming results (replay has no late data, so watermarked streaming
  * aggregation ≡ the batch aggregate).
  */
object StreamOps {

  /** Tumbling 1-hour event counts with a watermark — the streaming twin
    * of the batch `window()` aggregate. */
  def hourlyEventCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))

  /** Session windows per user: 30-minute inactivity gap. Works in both
    * batch (session_window is batch-capable) and streaming mode. */
  def userSessions(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        col("n_events"))

  /** Streaming exact dedup on a fingerprint column within the watermark
    * horizon: equal fingerprints at DIFFERENT timestamps dedup too
    * (`dropDuplicatesWithinWatermark`, not `dropDuplicates(fp, ts)`);
    * the watermark bounds the per-key state, which is what makes this
    * viable on an unbounded stream. */
  def dedupStream(events: DataFrame, fingerprintCol: String): DataFrame =
    events.withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark(fingerprintCol)

  /** Micro-batch geocode stream (reference §2.8 extension target): each
    * batch of (`qid`, `text`) rows runs through the distributed
    * [[graft.query.GeocodeJoin]] — the full scoring pipeline per
    * micro-batch via `foreachBatch`, results delivered to `sink`. */
  def geocodeStream(queryStream: DataFrame, poiView: DataFrame,
                    settings: graft.core.Settings, k: Int)(
      sink: (Long, DataFrame) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    queryStream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(batchId, graft.query.GeocodeJoin.topK(batch, poiView, settings, k))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** Replay a bounded source through a streaming query into a memory
    * sink and return the materialized result. `Trigger.AvailableNow`
    * drains everything then stops — deterministic, oracle-checkable. */
  def replayToTable(spark: SparkSession, streamed: DataFrame,
                    name: String, outputMode: String): DataFrame = {
    val q = streamed.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}
