package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine query: a Spark program plus (when SQL-expressible)
  * the equivalent DuckDB oracle SQL over the same parquet tables.
  * Column names MUST match between the two — the driver's compare sorts
  * columns by name before hashing values (see the project contract).
  *
  * Determinism rules (SURVEY.md §5.2): every oracle query ends in a total
  * ORDER BY with a unique tiebreaker; floats that cross an
  * aggregation-order boundary are rounded in the query on BOTH sides.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  /** Run `body` against a CLONED session whose
    * `spark.sql.shuffle.partitions` is pinned to `n` (size shuffles to
    * the relation, not session width — index-lifecycle and
    * streaming-replay queries move generation-sized batches). The clone
    * ([[org.apache.spark.sql.GraftBridge.cloneSession]]) shares the
    * SparkContext but owns its conf, so the pin can't leak into — or be
    * clobbered by — a concurrently running query on the shared session
    * (the set/restore form this replaces was a documented
    * one-at-a-time contract; this is the enforced version). DataFrames
    * the body builds from the clone stay bound to it, so the width
    * holds even when execution happens after the call returns. Library
    * operators still size their plans with explicit repartitions (the
    * `connectedComponents` precedent) — this belongs in bench/verify
    * query bodies and probes. */
  def withShuffleWidth[T](s: SparkSession, n: Int)(body: SparkSession => T): T =
    body(pinnedSession(s, n))

  /** The clone [[withShuffleWidth]] hands its body — exposed for call
    * sites that need to build inputs (memory streams, staged tables)
    * directly on the pinned session before composing the query. */
  def pinnedSession(s: SparkSession, n: Int): SparkSession = {
    val c = org.apache.spark.sql.GraftBridge.cloneSession(s)
    c.conf.set("spark.sql.shuffle.partitions", n.toString)
    c
  }

  /** Re-bind `df` to `session` ([[org.apache.spark.sql.GraftBridge
    * .withSession]]) — how a DataFrame built on the shared session
    * enters a pinned clone's scope. */
  def rebind(df: DataFrame, session: SparkSession): DataFrame =
    org.apache.spark.sql.GraftBridge.withSession(df, session)

  /** FIXTURE-setup nanos the current query run wants excluded from
    * bench timing (round 18): lifecycle queries mutate a private COPY
    * of a memoized base index ([[Fixtures.clonedIndex]]) — production
    * refreshes an existing artifact, so the per-invocation file copy
    * (and the one-time template build on the cold pass) is harness
    * setup, not engine work, and was inflating the lifecycle tier's
    * totals. [[graft.Bench]] resets this before each timed run and
    * subtracts it after; [[graft.Verify]] ignores it (correctness does
    * not time). Bench runs queries sequentially, so one global cell
    * suffices. */
  val benchSetupNanos = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Run `body` with its wall time recorded as excluded fixture setup. */
  def excludeFromBench[T](body: => T): T = {
    val t0 = System.nanoTime()
    try body finally { benchSetupNanos.addAndGet(System.nanoTime() - t0); () }
  }
}

object Registry {
  lazy val all: Seq[Q] =
    Relational.all ++ Relational2.all ++ Relational3.all ++ GeocodeQueries.all ++
      TextQueries.all ++ TextQueries2.all ++ TextQueries3.all ++
      CurationQueries.all ++ DedupQueries.all ++ SimilarityQueries.all ++
      MultimodalQueries.all ++ GraphQueries.all ++ StreamingQueries.all
}
