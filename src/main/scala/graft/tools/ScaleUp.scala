package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture scale-up: writes an N×-enlarged copy of an sf directory by
  * unioning id-shifted copies of each table (disjoint key ranges per
  * copy, referential integrity preserved by shifting foreign keys with
  * their parents). Dimension tables (region, nation) stay single-copy.
  *
  * `runMain graft.tools.ScaleUp <srcDir> <dstDir> [copies]`
  *
  * Purpose: scale-sanity runs above the largest driver-provided SF —
  * catch any operator whose cost curves worse than linearly before a
  * real cluster does. Not an oracle surface (the DuckDB gate runs on
  * the driver's own fixtures).
  */
object ScaleUp {

  /** Key-column shift strides per table; one stride per key FAMILY so
    * foreign keys move with their parents. */
  val shifts: Map[String, Map[String, Long]] = Map(
    "region" -> Map.empty,
    "nation" -> Map.empty,
    "customer" -> Map("c_custkey" -> 1000000L),
    "supplier" -> Map("s_suppkey" -> 100000L),
    "part" -> Map("p_partkey" -> 1000000L),
    "orders" -> Map("o_orderkey" -> 10000000L, "o_custkey" -> 1000000L),
    "lineitem" -> Map("l_orderkey" -> 10000000L, "l_partkey" -> 1000000L,
      "l_suppkey" -> 100000L),
    "events" -> Map("event_id" -> 10000000L, "user_id" -> 1000000L),
    "documents" -> Map("doc_id" -> 10000000L),
    "embeddings" -> Map("vec_id" -> 10000000L))

  def scaled(df: DataFrame, table: String, copies: Int): DataFrame = {
    val s = shifts(table)
    if (s.isEmpty) df
    else (0 until copies).map { k =>
      s.foldLeft(df) { case (acc, (c, stride)) =>
        acc.withColumn(c, col(c) + lit(k * stride))
      }
    }.reduce(_ unionByName _)
  }

  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: runMain graft.tools.ScaleUp <srcDir> <dstDir> [copies]")
      sys.exit(2)
    }
    val (src, dst) = (args(0), args(1))
    val copies = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-scaleup")
      .config("spark.sql.shuffle.partitions", "32")
      // events.ts is TIMESTAMP(NANOS): read AND write as raw nano longs
      // so the copy stays loadable through Tables.events unchanged
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.queries.Tables.names.foreach { t =>
      val df = spark.read.parquet(s"$src/$t.parquet")
      scaled(df, t, copies).write.mode(SaveMode.Overwrite)
        .parquet(s"$dst/$t.parquet")
      println(s"[scaleup] $t x${if (shifts(t).isEmpty) 1 else copies}")
    }
    spark.stop()
  }
}
