package graft.tools

import graft.queries.{Fixtures, Tables}
import graft.streaming.StreamOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Width/projection A/B for the stream-stream interval join's addBatch
  * cost: same join shape as st_interval_join, swept over
  * spark.sql.shuffle.partitions (state-store parallelism — one store
  * per partition per side) within one JVM, interleaved. */
object StreamJoinWidth {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = if (args.length > 1) args(1).toInt else 3
    val widths = (if (args.length > 2) args(2) else "4,8,16,32").split(",").map(_.toInt).toSeq
    val spark = graft.Boot.master(SparkSession.builder(), "local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val noDataKey = "spark.sql.streaming.noDataMicroBatches.enabled"
    spark.conf.set(noDataKey, "false")

    def drain(width: Int, prefilter: Boolean = false): Long = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", width.toString)
      try {
        val schema = Fixtures.tableSchema(spark, sfDir, "events")
        val raw = StreamOps.readStreamOf(spark, sfDir, "events", schema)
        val src = Tables.normalizeTs(
          if (prefilter) raw.filter(col("event_type").isin("view", "purchase"))
          else raw)
        val views = src.filter(col("event_type") === "view")
          .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
        val buys = src.filter(col("event_type") === "purchase")
          .select(col("user_id").as("buy_user_id"),
            col("event_id").as("purchase_id"), col("ts").as("buy_ts"))
        val joined = StreamOps.attributionJoin(views, buys,
          maxDelay = "6 hours", watermark = "1 hour")
        StreamOps.replayToTable(spark, joined,
          s"sjw_${width}_${System.nanoTime()}", "append").count()
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    drain(widths.head) // warm
    val acc = scala.collection.mutable.Map.empty[(Int, Boolean), List[Double]]
    for (p <- 1 to passes; w <- widths; pf <- Seq(false, true)) {
      val t0 = System.nanoTime()
      val n = drain(w, pf)
      val dt = (System.nanoTime() - t0) / 1e9
      acc((w, pf)) = dt :: acc.getOrElse((w, pf), Nil)
      println(f"pass $p width $w%2d pf=$pf%-5s: $dt%6.3f s rows=$n")
    }
    println("== medians ==")
    for (w <- widths; pf <- Seq(false, true)) {
      val vs = acc((w, pf)).sorted
      println(f"width $w%2d pf=$pf%-5s: ${vs(vs.size / 2)}%6.3f s")
    }
    spark.stop()
  }
}
