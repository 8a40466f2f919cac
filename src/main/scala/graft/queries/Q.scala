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
  /** Run `body` with `spark.sql.shuffle.partitions` pinned to `n` (size
    * shuffles to the relation, not session width — index-lifecycle and
    * streaming-replay queries move generation-sized batches), restoring
    * the previous value after. Mutates the session conf, so it belongs
    * in bench/verify query bodies (one query at a time), NOT in library
    * code (see the `connectedComponents` precedent — library operators
    * size their plans with explicit repartitions instead). */
  def withShuffleWidth[T](s: SparkSession, n: Int)(body: => T): T = {
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", n.toString)
    try body finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }
}

object Registry {
  lazy val all: Seq[Q] =
    Relational.all ++ Relational2.all ++ Relational3.all ++ GeocodeQueries.all ++
      TextQueries.all ++ TextQueries2.all ++ TextQueries3.all ++
      CurationQueries.all ++ DedupQueries.all ++ SimilarityQueries.all ++
      MultimodalQueries.all ++ GraphQueries.all ++ StreamingQueries.all
}
