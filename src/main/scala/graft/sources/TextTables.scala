package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface beyond the Parquet fixture contract: JSON-lines
  * and CSV round-trips, and hive-partitioned Parquet layout.
  *
  * Design rules for 100 TB ingest:
  *   - Explicit schemas ALWAYS. Schema inference is a scale
  *     anti-pattern — it runs an extra pass over the input per job and
  *     can infer differently on different samples; at scale the schema
  *     is a contract, not a guess.
  *   - CSV escaping pinned to RFC-4180 double-quote (`escape="\""`).
  *     Spark's default escape is backslash, which other engines
  *     (DuckDB, Excel, Postgres COPY) do not read back — round-trip
  *     safety across engines beats Spark-internal symmetry.
  *   - Partitioned layout (`partitionBy`) turns an equality filter on
  *     the partition column into directory pruning: the scan never
  *     opens non-matching files. The partition column must be
  *     low-cardinality (lang, date, source) — per-doc ids would create
  *     a million tiny directories.
  */
object TextTables {

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def readJsonl(spark: SparkSession, schema: StructType, path: String): DataFrame =
    spark.read.schema(schema).json(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", "true")
      .option("escape", "\"")
      .csv(path)

  def readCsv(spark: SparkSession, schema: StructType, path: String): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .option("escape", "\"")
      // embedded newlines inside quoted fields span lines; without this
      // the reader splits records at raw line breaks. Costs input-split
      // parallelism on huge single files — at scale, many medium files
      .option("multiLine", "true")
      .csv(path)

  def writePartitioned(df: DataFrame, path: String, cols: String*): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(cols: _*).parquet(path)

  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** ORC round-trip: the other columnar interchange format (Hive/Trino
    * ecosystems). Same pushdown/pruning levers as Parquet — predicate
    * pushdown and column pruning reach the ORC scan (asserted in
    * `TextTablesSpec`), so a downstream that standardizes on ORC loses
    * nothing. */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def readOrc(spark: SparkSession, schema: StructType, path: String): DataFrame =
    spark.read.schema(schema).orc(path)
}
