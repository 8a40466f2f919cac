package graft.tools

import graft.queries.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Disposable decomposition probe for r29_profile's warm cost: times the
  * plain multi-agg (no distinct), each countDistinct column family, and
  * the full 6-distinct Expand, interleaved, to locate the floor. */
object R29Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Boot.master(SparkSession.builder(), "local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val o = Tables.table(spark, sfDir, "orders")
    def time(tag: String)(body: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = body
        println(f"$tag%-28s run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n)")
      }
    }
    time("noop count")(o.count())
    time("plain agg no distinct")(
      o.agg(count(lit(1)), count(col("o_orderkey")), min(col("o_totalprice")),
        max(col("o_totalprice"))).collect().length.toLong)
    time("1 distinct orderkey")(o.agg(countDistinct(col("o_orderkey"))).collect().length.toLong)
    time("1 distinct status")(o.agg(countDistinct(col("o_orderstatus"))).collect().length.toLong)
    time("3 numeric distincts")(
      o.agg(countDistinct(col("o_orderkey")), countDistinct(col("o_custkey")),
        countDistinct(col("o_totalprice"))).collect().length.toLong)
    time("all 6 distincts")(
      o.agg(countDistinct(col("o_orderkey")), countDistinct(col("o_custkey")),
        countDistinct(col("o_totalprice")), countDistinct(col("o_orderstatus")),
        countDistinct(col("o_orderpriority")), countDistinct(col("o_orderdate"))).collect().length.toLong)
    time("3 distinct + 3 collect_set")(
      o.agg(countDistinct(col("o_orderkey")), countDistinct(col("o_custkey")),
        countDistinct(col("o_totalprice")),
        size(collect_set(col("o_orderstatus"))),
        size(collect_set(col("o_orderpriority"))),
        size(collect_set(col("o_orderdate")))).collect().length.toLong)
    spark.stop()
  }
}
