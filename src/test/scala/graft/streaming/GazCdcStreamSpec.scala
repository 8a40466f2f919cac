package graft.streaming

import graft.SparkSpec
import graft.etl.GazetteerBuilder
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The streaming gazetteer CDC journey ([[StreamOps.gazCdcLoop]]) and
  * its exactly-once seam ([[GazetteerBuilder.refreshDelta]]'s `txn`):
  * Structured Streaming's `foreachBatch` is AT-LEAST-ONCE — after a
  * crash between the snapshot publish and the checkpoint commit, the
  * restarted query re-delivers the last micro-batch — so the refresh
  * records a (checkpoint-identity, batchId) frontier in the published
  * manifest and skips an already-applied batch idempotently. Content
  * equality under replay is the WEAKEST part of the claim (a re-applied
  * batch is content-idempotent by the anti-join + watermark algebra);
  * what these cases pin is the metadata hygiene a long-running feed
  * needs: no junk snapshot version, no duplicate trigram shard, zero
  * evaluation of the replayed feed, and the frontier surviving
  * maintenance (losing it there would re-open the window). */
class GazCdcStreamSpec extends SparkSpec {

  private val rawSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("tags", MapType(StringType, StringType)),
    StructField("wkt", StringType)))

  private def raw(rows: (Long, String)*): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, name) =>
        Row(id, name, Map("amenity" -> "cafe", "name" -> name),
          s"POINT(${id % 50} ${id % 30})")
      }), rawSchema)

  private def feed(rows: (Long, String, String)*): DataFrame =
    raw(rows.map(r => (r._1, r._2)): _*)
      .withColumn("op",
        element_at(typedLit(rows.map(r => r._1 -> r._3).toMap), col("id")))

  private def poiSet(df: DataFrame): Set[(Long, String)] =
    df.select("osm_id", "name_local").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  private val baseRows: Seq[(Long, String)] =
    (1L to 40L).map(i => i -> s"cafe number $i")

  private def versionsOf(root: String): Seq[Int] =
    graft.ext.VersionedStore.versionIds(spark, root)

  private def commitsOf(root: String): Seq[Int] = {
    val cur = graft.ext.VersionedStore.resolveCurrent(spark, root)
    GazetteerBuilder.readManifest(spark, cur).get.ixCommits
  }

  test("refreshDelta txn: an applied (tag, batchId) replays as a zero-version skip; the frontier survives maintenance") {
    val root = graft.core.TempDirs.create("graft-gazcdctxn-") + "/gaz"
    GazetteerBuilder.writeVersionedPartitioned(spark, raw(baseRows: _*), root,
      targetParts = 4)
    val f0 = feed((3L, "renamed three", "U"), (7L, "", "D"))
    val v1 = GazetteerBuilder.refreshDelta(spark, root, f0,
      txn = Some(("src", 0L)))
    assert(versionsOf(root).size == 2)
    val shardsAfter = commitsOf(root)

    // the replay: same (tag, batchId) — must return the CURRENT path
    // without a new version, a new shard, or even evaluating the feed
    // (the feed here would THROW if evaluated: proof of zero jobs)
    val boom = udf { (id: Long) =>
      if (id >= 0) throw new IllegalStateException("replayed feed was evaluated")
      id
    }
    val poison = feed((9L, "never", "U")).withColumn("id", boom(col("id")))
    val replayed = GazetteerBuilder.refreshDelta(spark, root, poison,
      txn = Some(("src", 0L)))
    assert(replayed == v1, "replay must resolve to the already-published version")
    assert(versionsOf(root).size == 2, "replay must not publish a junk version")
    assert(commitsOf(root) == shardsAfter, "replay must not append a shard")

    // a LATER batch from the same source applies normally
    GazetteerBuilder.refreshDelta(spark, root, feed((8L, "renamed eight", "U")),
      txn = Some(("src", 1L)))
    assert(versionsOf(root).size == 3)
    val cur = graft.ext.VersionedStore.resolveCurrent(spark, root)
    assert(GazetteerBuilder.readManifest(spark, cur).get.txns == Map("src" -> 1L))

    // maintenance must CARRY the frontier — losing it would double-apply
    // the next crash-replay
    GazetteerBuilder.maintainSnapshots(spark, root, keepLast = 1, maxShards = 1)
    val cur2 = graft.ext.VersionedStore.resolveCurrent(spark, root)
    assert(GazetteerBuilder.readManifest(spark, cur2).get.txns == Map("src" -> 1L),
      "maintainSnapshots must carry the applied-txn frontier")
    val nVersions = versionsOf(root).size
    val replayed2 = GazetteerBuilder.refreshDelta(spark, root, poison,
      txn = Some(("src", 1L)))
    assert(replayed2 == cur2 && versionsOf(root).size == nVersions,
      "post-maintenance replay must still skip")

    // an UNTAGGED refresh (no checkpoint → the rerun contract) always
    // applies and leaves the frontier intact
    GazetteerBuilder.refreshDelta(spark, root, feed((2L, "renamed two", "U")))
    val cur3 = graft.ext.VersionedStore.resolveCurrent(spark, root)
    assert(GazetteerBuilder.readManifest(spark, cur3).get.txns == Map("src" -> 1L))
    assert(poiSet(GazetteerBuilder.readPois(spark, cur3))
      .contains((2L, "renamed two")))
  }

  test("the serving engine follows CURRENT: a published refresh reaches requests with no operator reload") {
    val root = graft.core.TempDirs.create("graft-gazfollow-") + "/gaz"
    GazetteerBuilder.writeVersionedPartitioned(spark, raw(baseRows: _*), root,
      targetParts = 4)
    val v1 = graft.ext.VersionedStore.resolveCurrent(spark, root)
    val eng = graft.query.ScoutEngine.fromPath(spark, v1)
    val follower = eng.followCurrent(root, intervalMs = 100L,
      initial = Some(v1))
    try {
      // the publish side: one CDC batch flips CURRENT (the gazCdcLoop
      // path under the same pointer protocol — pinned above; this case
      // pins the SERVING side of the composition)
      GazetteerBuilder.refreshDelta(spark, root,
        feed((3L, "followed three", "U")))
      val req = graft.query.ForwardReq(
        Seq(graft.query.ForwardCandidate("followed three")), limit = 3)
      val deadline = System.currentTimeMillis() + 30000L
      var served = false
      while (!served && System.currentTimeMillis() < deadline) {
        served = eng.forwardDF(req).collect()
          .exists(_.getAs[String]("name") == "followed three")
        if (!served) Thread.sleep(100)
      }
      assert(served, "the follower never served the published refresh")
    } finally { follower.close(); eng.close() }
  }

  test("gazCdcLoop: a micro-batch landing during maintenance retries behind the writer lock instead of killing the query") {
    val root = graft.core.TempDirs.create("graft-gazcdclock-") + "/gaz"
    GazetteerBuilder.writeVersionedPartitioned(spark, raw(baseRows: _*), root,
      targetParts = 4)
    val b1 = feed((3L, "renamed three", "U"))
    val feedDir = graft.core.TempDirs.create("graft-gazcdclock-feed-")
    val ckpt = graft.core.TempDirs.create("graft-gazcdclock-ckpt-")
    val stage = new java.io.File(s"$feedDir/_stage1")
    b1.coalesce(1).write.parquet(stage.getAbsolutePath)
    java.nio.file.Files.move(
      stage.listFiles.find(_.getName.endsWith(".parquet")).get.toPath,
      new java.io.File(s"$feedDir/batch1.parquet").toPath)

    // a "maintainer" holds the root's writer lock across the batch's
    // landing window: the lock is taken BEFORE the loop starts, so any
    // successful apply proves the batch serialized behind it — and the
    // query staying alive proves it retried instead of dying
    val held = new java.util.concurrent.CountDownLatch(1)
    val locker = new Thread(() => {
      graft.ext.VersionedStore.withWriterLock(spark, root) {
        held.countDown()
        Thread.sleep(4000) // outlasts stream startup + first attempt
      }
      ()
    })
    locker.start()
    held.await()
    val q = StreamOps.gazCdcLoop(
      spark.readStream.schema(b1.schema).parquet(feedDir), root,
      checkpoint = Some(ckpt), lockWaitMs = 60000L) { (_, _) => () }
    try {
      q.processAllAvailable() // throws if the query died on the collision
      locker.join()
      assert(q.isActive, "the loop must survive maintenance holding the lock")
    } finally q.stop()
    assert(versionsOf(root).size == 2, "the batch must apply once released")
    val cur = graft.ext.VersionedStore.resolveCurrent(spark, root)
    assert(poiSet(GazetteerBuilder.readPois(spark, cur))
      .contains((3L, "renamed three")))
  }

  test("gazCdcLoop: a crash between publish and checkpoint commit replays the batch as an idempotent skip") {
    val root = graft.core.TempDirs.create("graft-gazcdcloop-") + "/gaz"
    GazetteerBuilder.writeVersionedPartitioned(spark, raw(baseRows: _*), root,
      targetParts = 4)
    val b1 = feed((3L, "renamed three", "U"), (7L, "", "D"))
    val b2 = feed((41L, "new fortyone", "I"))
    val feedDir = graft.core.TempDirs.create("graft-gazcdcloop-feed-")
    val ckpt = graft.core.TempDirs.create("graft-gazcdcloop-ckpt-")
    def land(df: DataFrame, n: Int): Unit = {
      val stage = new java.io.File(s"$feedDir/_stage$n")
      df.coalesce(1).write.parquet(stage.getAbsolutePath)
      val part = stage.listFiles.find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        new java.io.File(s"$feedDir/batch$n.parquet").toPath)
      ()
    }
    val applied = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def loop() = StreamOps.gazCdcLoop(
      spark.readStream.schema(b1.schema).parquet(feedDir), root,
      checkpoint = Some(ckpt)) { (bid, _) => applied.add(bid); () }

    land(b1, 1)
    val q1 = loop()
    try { q1.processAllAvailable(); land(b2, 2); q1.processAllAvailable() }
    finally q1.stop()
    assert(versionsOf(root).size == 3, "base + one version per micro-batch")
    val shardsAfter = commitsOf(root)
    import scala.jdk.CollectionConverters._
    assert(applied.asScala.toSeq == Seq(0L, 1L))

    // crash window: the newest commit never landed — restart re-delivers
    // that micro-batch; the manifest txn must make it a skip. (Drop the
    // hidden .crc sibling too: the local fs is a ChecksumFs, and a
    // stale checksum blocks the replayed commit's rename.)
    val newest = new java.io.File(s"$ckpt/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).maxBy(_.getName.toLong)
    new java.io.File(newest.getParentFile, s".${newest.getName}.crc").delete()
    newest.delete()
    // the replay drain must run ZERO Spark jobs: the loop's frontier
    // fast-path decides from one manifest read, before the emptiness
    // probe would evaluate the re-read source
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    org.apache.spark.sql.GraftBridge.drainListenerBus(spark.sparkContext)
    spark.sparkContext.addSparkListener(listener)
    val q2 = loop()
    try q2.processAllAvailable() finally {
      q2.stop()
      org.apache.spark.sql.GraftBridge.drainListenerBus(spark.sparkContext)
      spark.sparkContext.removeSparkListener(listener)
    }
    assert(jobs.get() == 0,
      s"the crash-replay drain launched ${jobs.get()} Spark jobs")
    assert(versionsOf(root).size == 3,
      "the replayed micro-batch must not publish a duplicate version")
    assert(commitsOf(root) == shardsAfter,
      "the replayed micro-batch must not append a duplicate shard")

    // and the chain serves the CDC-applied corpus
    val cur = graft.ext.VersionedStore.resolveCurrent(spark, root)
    val got = poiSet(GazetteerBuilder.readPois(spark, cur))
    val expect = poiSet(GazetteerBuilder.buildPois(graft.ext.Cdc.applyChanges(
      graft.ext.Cdc.applyChanges(raw(baseRows: _*), b1, "id"), b2, "id")))
    assert(got == expect)
    assert(got.contains((3L, "renamed three")) && got.contains((41L, "new fortyone")))
    assert(!got.exists(_._1 == 7L))

    // a FRESH checkpoint is a different restart identity: its batch 0
    // must NOT collide with the old tag's frontier
    val ckpt2 = graft.core.TempDirs.create("graft-gazcdcloop-ckpt2-")
    land(feed((8L, "renamed eight", "U")), 3)
    val q3 = StreamOps.gazCdcLoop(
      spark.readStream.schema(b1.schema).parquet(feedDir), root,
      checkpoint = Some(ckpt2)) { (_, _) => () }
    try q3.processAllAvailable() finally q3.stop()
    val cur2 = graft.ext.VersionedStore.resolveCurrent(spark, root)
    assert(poiSet(GazetteerBuilder.readPois(spark, cur2))
      .contains((8L, "renamed eight")),
      "a fresh checkpoint's batch 0 must apply — tags carry restart identity")
  }
}
