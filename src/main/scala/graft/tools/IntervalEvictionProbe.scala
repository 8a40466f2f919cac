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
    // arm syntax: provider:watermark[:late] — `late` replays the
    // DISORDERED copy of the slices (day 12 arrives after day 18), the
    // case that makes the state-size vs matched-rows trade real: a
    // tight watermark has already evicted/finalized past day 12 when
    // it finally arrives (quantified match loss, small state); a
    // watermark wider than the disorder keeps it (zero loss, state
    // grows to watermark + interval of data).
    val arms: Seq[(String, String, Boolean)] =
      if (args.length > 1) args(1).split(";").toSeq.map { a =>
        val parts = a.split(":")
        (parts(0), parts(1).replace('_', ' '),
          parts.length > 2 && parts(2) == "late")
      }
      else Seq(("default", "1 hour", false), ("default", "1 minute", false),
        ("rocksdb-clog", "1 hour", false))
    val spark = graft.Boot.master(SparkSession.builder(), "local[32]")
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
      // the late copy is derived from the slices — drop it too, or the
      // late arms would replay stale slices against fresh batch truth
      rmAll(new java.io.File(slicesDir.getParentFile, slicesDir.getName + "-late"))
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
        // fixed epoch base (NOT nanoTime-derived — arbitrary origin can be
        // negative, which setLastModified rejects) and assert the return:
        // a silent failure would scramble the event-time replay order
        require(dst.setLastModified(1000000000000L + d * 1000L),
          s"setLastModified failed for $dst")
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

    // disordered copy: same files, arrival (mod-time) order permuted so
    // day 12 lands after day 18 — 6 days of lateness against the
    // watermark, everything else in order
    lazy val lateDir: java.io.File = {
      val d = new java.io.File(slicesDir.getParentFile,
        slicesDir.getName + "-late")
      // fingerprint-keyed like the primary slice cache: a bare _DONE
      // check would silently replay stale slices after a fixture refresh
      val lateDone = new java.io.File(d, "_DONE")
      val lateFresh = lateDone.exists() &&
        new String(java.nio.file.Files.readAllBytes(lateDone.toPath)) == fingerprint
      if (!lateFresh) {
        def rmAll(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rmAll)); f.delete(); ()
        }
        rmAll(d)
        d.mkdirs()
        val slices = slicesDir.listFiles()
          .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
        require(slices.length >= 20, s"need >=20 slices, got ${slices.length}")
        val order = slices.take(12) ++ slices.slice(13, 19) ++
          Seq(slices(12)) ++ slices.drop(19)
        order.zipWithIndex.foreach { case (f, i) =>
          val dst = new java.io.File(d, f.getName)
          java.nio.file.Files.copy(f.toPath, dst.toPath,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          require(dst.setLastModified(1000000000000L + i * 1000L),
            s"setLastModified failed for $dst")
        }
        java.nio.file.Files.write(lateDone.toPath, fingerprint.getBytes)
      }
      d
    }

    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val clogKey =
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    val rocks = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    for ((provider, wm, late) <- arms) {
      if (provider.startsWith("rocksdb")) spark.conf.set(provKey, rocks)
      else spark.conf.unset(provKey)
      spark.conf.set(clogKey, provider.endsWith("-clog").toString)
      maxState.set(0); nBatches.set(0)
      val matched = new java.util.concurrent.atomic.AtomicLong(0)
      val ckpt = StreamOps.volatileCheckpointDir(spark)
      val t0 = System.nanoTime()
      val srcDir = if (late) lateDir else slicesDir
      val src = spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", "1")
        .parquet(srcDir.getAbsolutePath)
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
      val ok =
        if (matched.get() == truth) "== truth"
        else if (late) f"lost ${truth - matched.get()}%,d of $truth%,d (late-drop trade)"
        else s"!= truth($truth) DIVERGED"
      val tag = if (late) s"$wm+late" else wm
      println(f"${provider}%-13s wm=${tag}%-14s wall=${(System.nanoTime() - t0) / 1e9}%7.1f s " +
        f"batches=${nBatches.get()}%3d maxStateRows=${maxState.get()}%,12d " +
        f"matched=${matched.get()}%,d $ok")
    }
    spark.stop()
  }
}
