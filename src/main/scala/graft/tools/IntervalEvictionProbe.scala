package graft.tools

import graft.queries.Tables
import graft.streaming.StreamOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Watermark-driven state EVICTION for the stream-stream interval join
  * at fixture scale (VERDICT r13 task 5): the sf100 st_interval_join
  * replay drains in ONE micro-batch, so the watermark never advances
  * mid-run and both sides' full 100M rows sit in join state — correct,
  * but it never exercises the mechanism that bounds state in a real
  * deployment. This probe replays the same corpus in EVENT-TIME order
  * (the fixture's ×1000 copies all span the same 30 days, so file
  * order is not time order: it first slices events into per-day files,
  * written oldest-first) with `maxFilesPerTrigger=1`, so each day is a
  * micro-batch, the watermark advances daily, and views/purchases
  * older than (watermark − 6 h interval) are EVICTED between batches.
  *
  * Reports per arm (state provider × watermark delay): wall, batch
  * count, MAX state rows held (the bound a deployment provisions for),
  * and the matched-row count vs the batch-join truth — time-ordered
  * arrival means eviction must lose NOTHING (the join's state
  * retention is derived from the interval condition, so in-watermark
  * matches survive by construction; the probe verifies it by count). */
object IntervalEvictionProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft-sf100")
    val arms: Seq[(String, String)] =
      if (args.length > 1) args(1).split(";").toSeq.map { a =>
        val Array(p, w) = a.split(":"); (p, w.replace('_', ' '))
      }
      else Seq("default" -> "1 hour", "default" -> "1 minute",
        "rocksdb-clog" -> "1 hour")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // warmup

    // ---- one-time: slice events into per-day files, oldest first ----
    // cache keyed by a SOURCE fingerprint, not just the dir name: a
    // regenerated fixture must invalidate the slices, or both "truth"
    // and the streaming arms would silently measure stale data (and the
    // == truth check could not catch it — truth reads the same slices)
    val slicesDir = new java.io.File(s"/tmp/graft-evict-slices-${new java.io.File(sfDir).getName}")
    val fingerprint = {
      val src = new java.io.File(sfDir, "events.parquet")
      val files =
        if (src.isDirectory) Option(src.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
        else Seq(src)
      val parts = files.filter(f => f.isFile && !f.getName.startsWith("_"))
      s"n=${parts.size} bytes=${parts.map(_.length).sum} " +
        s"mtime=${(0L +: parts.map(_.lastModified)).max}"
    }
    val done = new java.io.File(slicesDir, "_DONE")
    val stale = done.exists() &&
      new String(java.nio.file.Files.readAllBytes(done.toPath)) != fingerprint
    if (stale) {
      println(s"slice cache stale (source fingerprint changed) — re-slicing")
      def rmAll(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rmAll)); f.delete(); ()
      }
      rmAll(slicesDir)
    }
    if (!done.exists() || stale) {
      val t0 = System.nanoTime()
      slicesDir.mkdirs()
      val ev = Tables.table(spark, sfDir, "events")
        .select("event_id", "user_id", "event_type", "ts")
      val (lo, hi) = {
        val r = ev.agg(min(col("ts")), max(col("ts"))).collect()(0)
        (r.getTimestamp(0).getTime, r.getTimestamp(1).getTime)
      }
      val dayMs = 24L * 3600 * 1000
      val nSlices = ((hi - lo) / dayMs + 1).toInt
      for (d <- 0 until nSlices) {
        val tmp = new java.io.File(slicesDir, s"_stage-$d")
        ev.filter(
            unix_millis(col("ts")) >= lo + d.toLong * dayMs &&
              unix_millis(col("ts")) < lo + (d + 1).toLong * dayMs)
          .coalesce(1).write.mode("overwrite").parquet(tmp.getAbsolutePath)
        val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
        val dst = new java.io.File(slicesDir, f"slice-$d%02d.parquet")
        java.nio.file.Files.move(part.toPath, dst.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        dst.setLastModified(t0 / 1000000L + d * 1000L) // deterministic order
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(tmp)
      }
      java.nio.file.Files.write(done.toPath, fingerprint.getBytes)
      println(f"sliced $nSlices day files in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }

    val sch = spark.read.parquet(slicesDir.getAbsolutePath).schema
    def sides(ev: DataFrame): (DataFrame, DataFrame) = (
      ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("view_id"),
          col("ts").as("view_ts")),
      ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("buy_user_id"),
          col("event_id").as("purchase_id"), col("ts").as("buy_ts")))

    // ---- truth: the batch interval join over the same corpus ----
    val tTruth = System.nanoTime()
    val (bv, bb) = sides(spark.read.parquet(slicesDir.getAbsolutePath))
    val truth = bv.join(bb,
      col("user_id") === col("buy_user_id") &&
        col("buy_ts") >= col("view_ts") &&
        col("buy_ts") <= col("view_ts") + expr("INTERVAL 6 hours")).count()
    println(f"truth (batch join): $truth%d matches in ${(System.nanoTime() - tTruth) / 1e9}%.1f s")

    // ---- listener: max state rows held across batches ----
    val maxState = new java.util.concurrent.atomic.AtomicLong(0)
    val nBatches = new java.util.concurrent.atomic.AtomicLong(0)
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        nBatches.incrementAndGet()
        e.progress.stateOperators.foreach { so =>
          maxState.getAndUpdate(m => math.max(m, so.numRowsTotal))
        }
      }
    })

    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val clogKey =
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    val rocks = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    for ((provider, wm) <- arms) {
      if (provider.startsWith("rocksdb")) spark.conf.set(provKey, rocks)
      else spark.conf.unset(provKey)
      spark.conf.set(clogKey, provider.endsWith("-clog").toString)
      maxState.set(0); nBatches.set(0)
      val matched = new java.util.concurrent.atomic.AtomicLong(0)
      val ckpt = StreamOps.volatileCheckpointDir(spark)
      val t0 = System.nanoTime()
      val src = spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", "1")
        .parquet(slicesDir.getAbsolutePath)
      val (v, b) = sides(src)
      val joined = StreamOps.attributionJoin(v, b,
        maxDelay = "6 hours", watermark = wm)
      val w = joined.writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          matched.addAndGet(batch.count()); ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      val q = ckpt.fold(w)(w.option("checkpointLocation", _)).start()
      q.awaitTermination()
      StreamOps.dropCheckpoint(ckpt)
      Thread.sleep(500) // listener events are async
      val ok = if (matched.get() == truth) "== truth" else s"!= truth($truth) DIVERGED"
      println(f"${provider}%-13s wm=${wm}%-9s wall=${(System.nanoTime() - t0) / 1e9}%7.1f s " +
        f"batches=${nBatches.get()}%3d maxStateRows=${maxState.get()}%,12d " +
        f"matched=${matched.get()}%,d $ok")
    }
    spark.stop()
  }
}
