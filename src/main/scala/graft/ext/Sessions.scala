package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization — the offline twin of the streaming session
  * windows in [[graft.streaming.StreamOps]]: group a user's events into
  * sessions separated by inactivity gaps, then aggregate per session.
  *
  * Shape at 100 TB: both windows partition by the USER key — millions of
  * distinct users, so each task handles many small per-user slices and
  * no task ever sorts more than one user's events (contrast the
  * per-language windows [[TopK]] exists to avoid: 5 partitions ≠ 5M
  * partitions). One shuffle on user_id serves the lag, the running sum,
  * and the final per-session aggregate — the session id is a prefix sum
  * over the same ordering, so Catalyst reuses the exchange.
  */
object Sessions {

  /** Assign a per-user session sequence number: a new session starts
    * when the gap to the previous event exceeds `gapSec`. The gap is
    * compared on exact integer MICROSECONDS (`unix_micros` here,
    * `epoch_us` in the oracle) — second-truncated comparison would make
    * a sub-second boundary event land in different sessions per engine.
    * Ordering is (ts, tiebreak) — make the tiebreak unique so results
    * are partitioning-independent. Adds `session_seq` (1-based). */
  def assign(events: DataFrame, userCol: String, tsCol: String,
             tiebreakCol: String, gapSec: Long): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(tiebreakCol))
    val prev = lag(col(tsCol), 1).over(w)
    val isNew = when(prev.isNull
        .or(unix_micros(col(tsCol)) - unix_micros(prev) > gapSec * 1000000L), 1L)
      .otherwise(0L)
    // ROWS frame pinned: RANGE (the default) would merge tied (ts,
    // tiebreak) rows into one prefix-sum step — see Sampling.packAssign
    events.withColumn("session_seq",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Sessionize and aggregate: one row per (user, session) with event
    * count, bounds, and duration in whole seconds (integral division of
    * the exact micros delta — exact and order-free cross-engine). */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
                 tiebreakCol: String, gapSec: Long): DataFrame =
    assign(events, userCol, tsCol, tiebreakCol, gapSec)
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"))
      .withColumn("duration_sec",
        expr("(unix_micros(session_end) - unix_micros(session_start)) DIV 1000000"))
}
