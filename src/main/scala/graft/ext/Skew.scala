package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: salted equi-join.
  *
  * When one join key carries a disproportionate share of rows (hot
  * city, hot user, empty-string key), a plain shuffle join puts the
  * whole hot key in one task. Salting splits the skewed (large) side's
  * key into `saltFactor` sub-keys and replicates the small side across
  * all salt values — the hot key now spreads over `saltFactor` tasks.
  *
  * Spark 4's AQE skew-join handles many cases at runtime; explicit
  * salting remains the tool when AQE can't split (aggregations after
  * the join, extreme single-key skew, disabled AQE). Result equality
  * with the plain join is asserted in the spec.
  */
object Skew {

  /** Inner equi-join `large ⋈ small` on `key`, salted. `small` is
    * replicated `saltFactor`× (explode), so keep it the dimension side. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 saltFactor: Int): DataFrame = {
    require(saltFactor > 0)
    // deterministic salt: spread rows without RNG (reproducible retries)
    val salted = large.withColumn("_salt",
      pmod(hash(col(key), monotonically_increasing_id()), lit(saltFactor)))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated,
        salted(key) === replicated(key) && salted("_salt") === replicated("_salt"))
      .drop(replicated(key))
      .drop("_salt")
  }

  /** Top key frequencies — the diagnostic used to decide whether a join
    * needs salting (run it on the join key before shipping the job). */
  def keyHistogram(df: DataFrame, key: Column, topK: Int = 20): DataFrame =
    df.groupBy(key.as("key")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("key").asc)
      .limit(topK)
}
