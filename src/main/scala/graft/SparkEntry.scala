package graft

import graft.queries.Registry
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` exposes every implemented operator from SURVEY.md §2 as a
  * named DataFrame program over an sf directory; `oracleSql` carries the
  * DuckDB-equivalent SQL for each SQL-expressible query (identical
  * column names/aliases on both sides — the driver hash-compares after
  * sorting columns by name).
  */
object SparkEntry {

  /** Flagship: the full forward-geocode pipeline (ETL → candidate scan →
    * WRatio scoring → top-k) over a gazetteer derived from sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    queries("g8_forward_geocode")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map(q => q.name -> q.run).toMap

  def oracleSql: Map[String, String] =
    Registry.all.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
