package graft.tools

import graft.queries.{Fixtures, Tables}
import graft.streaming.StreamOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Marginal per-generation cost of a LONG-LIVED stream-stream interval
  * join vs per-generation fresh drains — the amortization measurement
  * for st_interval_join's lifecycle floor (the CrawlLoopProbe argument
  * applied to the OTHER perf-weak query). One started
  * [[StreamOps.attributionJoin]] query consumes the event corpus in G
  * slices (MemoryStream, `processAllAvailable` per slice): planning,
  * state-store init, and checkpoint setup land once; each following
  * slice pays only delivery + per-row state insert/probe. The contrast
  * arm drains the SAME slices through G fresh bounded replays — the
  * st_interval_join lifecycle shape, paying the full floor per slice. */
object IntervalLoopProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nGens = if (args.length > 1) args(1).toInt else 5
    val spark = graft.Boot.master(SparkSession.builder(), "local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = spark
    import s.implicits._

    // event slices ordered by ts so watermarks only move forward across
    // generations (the long-lived query's state actually evicts, exactly
    // as a live feed would let it)
    val events = Tables.table(s, sfDir, "events")
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("ts"), col("event_type"), col("user_id"), col("event_id"))
      .orderBy("ts")
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val slices = {
      val per = math.max(1, events.length / nGens)
      events.grouped(per).toSeq
    }
    println(s"${events.length} view/purchase events in ${slices.size} slices")

    def secs(t0: Long): Double = (System.nanoTime() - t0) / 1e9
    def sides(df: org.apache.spark.sql.DataFrame) = {
      val views = df.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
      val buys = df.filter(col("event_type") === "purchase")
        .select(col("user_id").as("buy_user_id"),
          col("event_id").as("purchase_id"), col("ts").as("buy_ts"))
      (views, buys)
    }

    val noDataKey = "spark.sql.streaming.noDataMicroBatches.enabled"

    def longLived(tag: String): Unit = {
      val cs = graft.queries.Q.pinnedSession(s, 4)
      implicit val sqlc: org.apache.spark.sql.SQLContext = cs.sqlContext
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(java.sql.Timestamp, String, Long, Long)]
      val src = mem.toDF().toDF("ts", "event_type", "user_id", "event_id")
      val (views, buys) = sides(src)
      val ckpt = StreamOps.volatileCheckpointDir(cs)
      val name = s"ilp_loop_${System.nanoTime()}"
      val t0 = System.nanoTime()
      val q = {
        val w = StreamOps.attributionJoin(views, buys, "6 hours", "1 hour")
          .writeStream.format("memory").queryName(name).outputMode("append")
        ckpt.fold(w)(w.option("checkpointLocation", _)).start()
      }
      println(f"$tag start        ${secs(t0)}%6.3f s")
      try {
        slices.zipWithIndex.foreach { case (slice, i) =>
          val tg = System.nanoTime()
          mem.addData(slice.toSeq: _*)
          q.processAllAvailable()
          println(f"$tag gen$i (${slice.length} ev)  batch ${secs(tg)}%6.3f s")
        }
      } finally {
        q.stop()
        StreamOps.dropCheckpoint(ckpt)
      }
      // the memory sink registers its table on the pinned clone
      println(f"$tag TOTAL        ${secs(t0)}%6.3f s  (${cs.table(name).count()} matches)")
    }

    def freshDrains(tag: String): Unit = {
      // one pinned clone for the whole drain sequence: width 4 AND the
      // no-data-microbatch override both live on the clone only
      val cs = graft.queries.Q.pinnedSession(s, 4)
      cs.conf.set(noDataKey, "false") // the st_interval_join drain shape
      implicit val sqlc: org.apache.spark.sql.SQLContext = cs.sqlContext
      var matches = 0L
      val t0 = System.nanoTime()
      slices.zipWithIndex.foreach { case (slice, i) =>
        val tg = System.nanoTime()
        val mem = org.apache.spark.sql.execution.streaming.runtime
          .MemoryStream[(java.sql.Timestamp, String, Long, Long)]
        mem.addData(slice.toSeq: _*)
        val (views, buys) = sides(mem.toDF().toDF("ts", "event_type", "user_id", "event_id"))
        matches += StreamOps.replayToTable(cs,
          StreamOps.attributionJoin(views, buys, "6 hours", "1 hour"),
          s"ilp_fresh_${System.nanoTime()}", "append").count()
        println(f"$tag gen$i (${slice.length} ev)  drain ${secs(tg)}%6.3f s")
      }
      println(f"$tag TOTAL        ${secs(t0)}%6.3f s  ($matches matches)")
    }

    longLived("warm-loop ")
    freshDrains("warm-fresh")
    longLived("loop      ")
    freshDrains("fresh     ")
    longLived("loop2     ")
    freshDrains("fresh2    ")
    spark.stop()
  }
}
