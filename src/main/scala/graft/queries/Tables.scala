package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated fixture corpus (TESTDATA.md /
  * FIXTURES.md §1). One parquet file per table under the sf directory.
  *
  * `events.ts` is written as Parquet TIMESTAMP(NANOS), which Spark's
  * vectorized reader rejects; we read it as raw nanos
  * (`spark.sql.legacy.parquet.nanosAsLong`) and convert to micros —
  * sub-microsecond precision is irrelevant to every declared query
  * (they truncate to hours/days).
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // integral `div`, NOT `/`: double division loses sub-microsecond
    // precision at 2024-era nano magnitudes (~1.7e18, double ulp 256ns)
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
