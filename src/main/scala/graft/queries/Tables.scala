package graft.queries

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated fixture corpus (TESTDATA.md /
  * FIXTURES.md §1). One parquet file per table under the sf directory.
  *
  * `events.ts` has shipped in two Parquet encodings across fixture
  * generations: TIMESTAMP(NANOS) (which Spark's vectorized reader
  * rejects unless `spark.sql.legacy.parquet.nanosAsLong` reads it as a
  * raw BIGINT of epoch-nanos) and plain TIMESTAMP(MICROS) (read as
  * TIMESTAMP_NTZ / TIMESTAMP directly). [[normalizeTs]] branches on the
  * *loaded* type, so either encoding lands as session-TZ TIMESTAMP with
  * identical values (sessions run UTC; sub-microsecond precision is
  * irrelevant to every declared query — they truncate to hours/days).
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // fixture dirs are immutable for a session's lifetime, so the
  // resolved relation (file listing + footer schema, ~30-80 ms of
  // driver work per spark.read) is paid once per (session, dir, table)
  // instead of once per query × table. Own map, NOT Fixtures.memo — a
  // nested computeIfAbsent on the same map throws "Recursive update",
  // and fixture builders call table() inside their memo bodies.
  private val dfCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, String), DataFrame]()

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    dfCache.computeIfAbsent((spark, sfDir, name), _ =>
      if (name == "events") events(spark, sfDir)
      else spark.read.parquet(s"$sfDir/$name.parquet"))

  def events(spark: SparkSession, sfDir: String): DataFrame =
    normalizeTs(rawEvents(spark, s"$sfDir/events.parquet"))

  /** Read the events file with whatever ts encoding it carries, leaving
    * `ts` in its raw loaded type (BIGINT epoch-nanos for NANOS files,
    * timestamp for MICROS files). The legacy nanosAsLong flag is only
    * flipped on when a plain read actually rejects the footer — and must
    * then stay on for the lazy scan (Spark re-reads the footer schema at
    * execution), so a NANOS fixture leaves it set; the common MICROS
    * path never mutates session conf.
    */
  /** True when the read failure is the vectorized reader rejecting a
    * TIMESTAMP(NANOS) footer — the ONE condition the legacy-flag retry
    * answers. Matched against the message chain so an unrelated
    * analysis error (bad schema merge, corrupt footer, permissions)
    * rethrows untouched instead of being masked behind a confusing
    * second failure with the flag left flipped session-wide. */
  private def isNanosRejection(e: Throwable): Boolean = {
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" ")
    msgs.contains("Illegal Parquet type") || msgs.toLowerCase.contains("nanos")
  }

  def rawEvents(spark: SparkSession, path: String): DataFrame =
    try spark.read.parquet(path)
    catch {
      case e @ (_: org.apache.spark.sql.AnalysisException | _: UnsupportedOperationException)
          if isNanosRejection(e) =>
        // only a NANOS footer-rejection on an EXISTING file justifies the
        // legacy-flag retry — a missing path (also an AnalysisException)
        // must rethrow untouched, or the flag flip would silently change
        // how every later read in the session decodes NANOS columns
        val p = new org.apache.hadoop.fs.Path(path)
        if (!p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)) throw e
        val prev = spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        try spark.read.parquet(path)
        catch { case retryFailure: Throwable =>
          // the failure wasn't the nanos encoding: undo the flag flip
          prev match {
            case Some(v) => spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", v)
            case None => spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
          }
          throw retryFailure
        }
    }

  /** Normalize a raw-loaded `ts` column to session-TZ TIMESTAMP:
    * BIGINT epoch-nanos → integral `div` 1000 (NOT `/`: double division
    * loses sub-microsecond precision at 2024-era nano magnitudes,
    * ~1.7e18, double ulp 256ns) → `timestamp_micros`; TIMESTAMP_NTZ →
    * cast (value-preserving under the UTC session TZ every entrypoint
    * pins); TIMESTAMP → pass through. Works on batch and streaming
    * frames alike — the streaming loader shares it.
    */
  def normalizeTs[T](df: Dataset[T]): DataFrame = {
    val raw: DataType = df.schema("ts").dataType
    raw match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => df.toDF()
      case other => throw new IllegalStateException(
        s"events.ts loaded as unsupported type $other (expected BIGINT nanos, TIMESTAMP_NTZ, or TIMESTAMP)")
    }
  }
}
