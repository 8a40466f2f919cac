package graft.ext

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The gazetteer's trigram name index under the [[IndexIO]] shard
  * protocol — the round-17 answer to "the refresh rebuilds the FULL
  * trigram index every CDC batch" ([[graft.etl.TrigramIndex]] is the
  * bulk artifact; this store makes it incrementally maintainable,
  * inheriting the format gate, commit markers, claim/lease machinery
  * and maintenance policy the three persisted indexes already share).
  *
  * Layout: one `postings(gram, col_id, osm_id)` table in committed
  * shards (gram-range sorted so per-gram equality probes prune row
  * groups, exactly the bulk artifact's layout), plus a `deletes` table
  * of WATERMARKS `(osm_id, below)` — NOT the plain id-tombstones of the
  * other indexes, because a gazetteer refresh UPDATES rows: a rename
  * appends the new name's postings for an id that already has postings,
  * and a plain id tombstone cannot kill the old rows without also
  * killing the new ones. A watermark `(id, K)` means "postings of `id`
  * in shards < K are superseded"; `(id, Long.MaxValue)` is a full
  * delete. The live view is then exact per id — which matters because
  * the probe ([[graft.etl.TrigramIndex.candidateIds]]) counts gram hits
  * EXACTLY (`hit === ng`): a duplicate (gram, col, id) row from an old
  * shard would overshoot the count and turn into a FALSE NEGATIVE, the
  * one failure mode the trigram design must never have.
  *
  * Crash ordering inside [[append]]: postings shard publishes first,
  * watermarks publish second, the commit marker lands LAST. A watermark
  * naming an UNCOMMITTED shard is inert ([[postingsOf]] only applies
  * watermarks whose `below` shard is committed, or MaxValue), so a
  * crash at any point leaves the previous state serving exactly and a
  * retry lands the whole batch under a fresh shard id — whose fresh
  * watermarks then supersede BOTH the old rows and the crashed
  * duplicate's rows.
  *
  * Snapshot pinning: a versioned gazetteer manifest records this
  * store's (committed shard ids, delete shard ids) at publish time and
  * serves through [[postingsPinned]] — so a CURRENT rollback restores
  * the exact index state of the older snapshot, not "whatever the live
  * store holds now". [[compactAll]] is the one op that invalidates
  * pins older than itself (it folds pinned shards away); run it only
  * after [[IndexIO.pruneVersions]]-style retention has dropped the
  * manifests that pin them — the pinned read fails LOUD (missing
  * marker check), never silently partial.
  */
object TrigramStore {

  private val Tables = Seq("postings")
  private val DeleteCol = "osm_id"

  /** The pinned index state a snapshot manifest records. */
  final case class Pin(commits: Seq[Int], deletes: Seq[Int])

  /** Build and publish a fresh store from a pois relation (the
    * [[graft.etl.GazetteerBuilder.buildPois]] schema: osm_id,
    * name_local_norm, name_en_norm). One committed shard, staged and
    * landed by the atomic [[IndexIO.publish]] rename, format-stamped. */
  def write(pois: DataFrame, path: String, partitions: Int = 8): Unit = {
    val spark = pois.sparkSession
    val staging = IndexIO.stagingFor(path)
    IndexIO.sortedLayout(graft.etl.TrigramIndex.build(pois), partitions,
        Seq("gram", "col_id", "osm_id"), rangeCols = Seq("gram"))
      .write.mode(SaveMode.Overwrite).parquet(s"$staging/postings/shard=0")
    IndexIO.commitShard(spark, staging, 0)
    IndexIO.publish(spark, staging, path)
  }

  /** Append one CDC batch: `upserts` are pois-schema rows whose ids are
    * inserted or renamed (their grams land as ONE new shard; any older
    * postings of the same ids are superseded via watermarks), and
    * `deleteIds` are ids removed from the gazetteer (watermarked at
    * MaxValue). Existing shard files are never read or rewritten — the
    * cost is the batch, not the corpus. Returns the committed shard id. */
  def append(upserts: DataFrame, path: String,
             deleteIds: Seq[Long] = Nil, partitions: Int = 1): Int = {
    val spark = upserts.sparkSession
    IndexIO.dropIncompleteCommitted(spark, path, Tables)
    val next = IndexIO.claimShardId(spark, path, Tables)
    val stage = IndexIO.shardStagingFor(s"$path/postings")
    val newPosts = graft.etl.TrigramIndex.build(upserts)
    IndexIO.sortedLayout(newPosts, partitions,
        Seq("gram", "col_id", "osm_id"), rangeCols = Seq("gram"))
      .write.mode(SaveMode.Overwrite).parquet(stage)
    IndexIO.heartbeatClaim(spark, path, next)
    IndexIO.publishShard(spark, stage, s"$path/postings/shard=$next")
    // watermarks: upserted ids supersede their own older postings
    // (below = this shard), deleted ids supersede everything. Published
    // BEFORE the marker — a watermark naming shard `next` is inert
    // until the marker lands, so the cutover for upserts is the one
    // marker rename. Upsert ids read back from the JUST-WRITTEN shard
    // (delta-sized); the routing mirrors publishIdShard: a bounded
    // probe collects and writes driver-side, a giant batch stays a
    // distributed (still delta-sized) Spark write.
    val maxDriverIds = 1 << 20
    val written = spark.read.parquet(s"$path/postings/shard=$next")
      .select(col("osm_id")).distinct()
    val probe = written.limit(maxDriverIds + 1).collect()
    if (probe.length <= maxDriverIds) {
      writeWatermarks(spark, path,
        probe.toSeq.map(r => r.getLong(0) -> next.toLong) ++
          deleteIds.map(_ -> Long.MaxValue))
    } else {
      import spark.implicits._
      writeWatermarksDF(spark, path,
        written.select(col("osm_id"), lit(next.toLong).as("below"))
          .unionByName(deleteIds.toDF("osm_id")
            .select(col("osm_id"), lit(Long.MaxValue).as("below"))))
    }
    IndexIO.commitShard(spark, path, next, enforceLease = true,
      verifyTables = Tables)
    next
  }

  /** Watermark-only mutation (a takedown batch with no new postings). */
  def delete(spark: SparkSession, path: String, ids: Seq[Long]): Unit = {
    IndexIO.requireSupportedFormat(spark, path)
    writeWatermarks(spark, path, ids.map(_ -> Long.MaxValue))
  }

  private def writeWatermarks(spark: SparkSession, path: String,
                              rows: Seq[(Long, Long)]): Unit = {
    if (rows.isEmpty) return
    import spark.implicits._
    writeWatermarksDF(spark, path, rows.toDF(DeleteCol, "below").coalesce(1))
  }

  private def writeWatermarksDF(spark: SparkSession, path: String,
                                wm: DataFrame): Unit = {
    val next = IndexIO.shardIds(spark, s"$path/deletes")
      .lastOption.getOrElse(-1) + 1
    val staging = IndexIO.shardStagingFor(s"$path/deletes")
    wm.write.mode(SaveMode.Overwrite).parquet(staging)
    IndexIO.publishShard(spark, staging, s"$path/deletes/shard=$next")
  }

  /** The live postings view: committed shards, watermark-subtracted.
    * Same (gram, col_id, osm_id) shape as the bulk artifact — plugs
    * straight into [[graft.etl.TrigramIndex.fetchCandidates]] and the
    * serving engine's nameIndex slot. */
  def postings(spark: SparkSession, path: String): DataFrame = {
    val committed = IndexIO.liveCommittedIds(spark, path)
    IndexIO.requireCommittedOrLegacy(spark, path, "postings", committed)
    postingsOf(spark, path, committed,
      IndexIO.shardIds(spark, s"$path/deletes"))
  }

  /** The postings view AS OF a snapshot pin — the versioned-gazetteer
    * read path. Fails loudly if a pinned shard was folded away by a
    * [[compactAll]] that outlived the snapshot's retention (serving a
    * silently-partial index would be the worse failure). */
  def postingsPinned(spark: SparkSession, path: String, pin: Pin): DataFrame = {
    IndexIO.requireSupportedFormat(spark, path)
    val have = IndexIO.shardIds(spark, s"$path/commits").toSet
    val missing = pin.commits.filterNot(have)
    if (missing.nonEmpty)
      throw new java.io.IOException(
        s"pinned trigram shards ${missing.mkString(", ")} no longer exist " +
          s"under $path (compacted after the snapshot was published) — " +
          "rebuild the snapshot or roll forward")
    val haveDels = IndexIO.shardIds(spark, s"$path/deletes").toSet
    val missingDels = pin.deletes.filterNot(haveDels)
    if (missingDels.nonEmpty)
      throw new java.io.IOException(
        s"pinned trigram delete shards ${missingDels.mkString(", ")} no " +
          s"longer exist under $path — rebuild the snapshot or roll forward")
    postingsOf(spark, path, pin.commits, pin.deletes)
  }

  private val WmSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField(DeleteCol,
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("below",
      org.apache.spark.sql.types.LongType, nullable = false)))

  private def postingsOf(spark: SparkSession, path: String,
                         committed: Seq[Int], delShards: Seq[Int]): DataFrame = {
    val posts = IndexIO.readCommitted(spark, path, "postings", committed)
    if (delShards.isEmpty)
      return posts.select("gram", "col_id", "osm_id")
    val committedSet = committed.map(_.toLong).toSet
    // LATEST watermark per id wins (delete-shard order is publish
    // order): a delete then a re-append leaves (id, MaxValue) then
    // (id, K) — recency resurrects the id, a max over `below` would
    // keep it dead forever. Inert entries (watermarks naming an
    // uncommitted postings shard — the append-crash window) filter out
    // FIRST, so a crashed re-append falls back to the older watermark
    // instead of resurrecting rows that never committed.
    val wm = spark.read.schema(WmSchema)
      .option("basePath", s"$path/deletes")
      .parquet(delShards.map(k => s"$path/deletes/shard=$k"): _*)
      .filter(col("below") === Long.MaxValue ||
        col("below").isInCollection(committedSet))
      .groupBy(col(DeleteCol))
      .agg(max(struct(col("shard").cast("long").as("s"), col("below")))
        .as("w"))
      .select(col(DeleteCol), col("w.below").as("below"))
    // watermark sets are delta-scale, postings corpus-scale: broadcast
    // the aggregated watermarks so the corpus side never shuffles
    posts.join(broadcast(wm.withColumnRenamed(DeleteCol, "_wm_id")),
        posts("osm_id") === col("_wm_id"), "left")
      .filter(col("below").isNull || col("shard") >= col("below"))
      .select("gram", "col_id", "osm_id")
  }

  /** The current pin — what a snapshot publish records. */
  def pinNow(spark: SparkSession, path: String): Pin =
    Pin(IndexIO.liveCommittedIds(spark, path),
      IndexIO.shardIds(spark, s"$path/deletes"))

  /** Fold every live shard into one, applying all watermarks — the
    * hygiene op that physically drops superseded postings (a
    * long-running refresh loop otherwise accretes one shard and one
    * watermark file per batch). Maintainer-locked; REPLACES marker
    * makes the swap atomic to live readers. Returns folded ids.
    *
    * `deferDeletes = false` reclaims the folded shards and applied
    * watermarks immediately — pins recorded by snapshots published
    * BEFORE this fold stop resolving, so run it only after retention
    * pruned them. `deferDeletes = true` is the PIN-SAFE route
    * ([[graft.etl.GazetteerBuilder.maintainSnapshots]]): the folded
    * shards' markers, files, and watermarks stay on disk (invisible to
    * live reads — the REPLACES marker already hides them — but still
    * resolvable by older manifests' pinned reads); [[gcUnpinned]]
    * reclaims them once no kept manifest pins them. */
  def compactAll(spark: SparkSession, path: String, partitions: Int = 8,
                 deferDeletes: Boolean = false): Seq[Int] = {
    val nonce = IndexIO.acquireMaintLock(spark, path)
    try {
      IndexIO.gcStaging(spark, path)
      IndexIO.gcClaims(spark, path)
      val obsDels = IndexIO.shardIds(spark, s"$path/deletes")
      val live = IndexIO.liveCommittedIds(spark, path)
      require(live.nonEmpty, s"no committed shards under $path — not a TrigramStore?")
      val folded = postingsOf(spark, path, live, obsDels)
      val next = IndexIO.claimShardId(spark, path, Tables)
      IndexIO.heartbeatMaintLock(spark, path, nonce)
      val stage = IndexIO.shardStagingFor(s"$path/postings")
      IndexIO.sortedLayout(folded, partitions,
          Seq("gram", "col_id", "osm_id"), rangeCols = Seq("gram"))
        .write.mode(SaveMode.Overwrite).parquet(stage)
      IndexIO.publishShard(spark, stage, s"$path/postings/shard=$next")
      IndexIO.commitShard(spark, path, next, replaces = live,
        maintLockNonce = nonce)
      if (!deferDeletes) {
        for (k <- live) IndexIO.deleteDir(spark, s"$path/commits/shard=$k")
        for (k <- live) IndexIO.deleteDir(spark, s"$path/postings/shard=$k")
        // the fold applied every observed watermark; clear exactly those
        for (k <- obsDels) IndexIO.deleteDir(spark, s"$path/deletes/shard=$k")
      }
      live
    } finally IndexIO.releaseMaintLock(spark, path, nonce)
  }

  /** Reclaim REPLACES-hidden (folded-away) shards and applied
    * watermark shards that no surviving snapshot pins — the deferred
    * half of a pin-safe [[compactAll]]. `pins` is the union of every
    * KEPT manifest's pinned state (the caller lists them after version
    * retention ran); live shards are never touched. */
  def gcUnpinned(spark: SparkSession, path: String, pins: Seq[Pin]): Unit = {
    val live = IndexIO.liveCommittedIds(spark, path).toSet
    val pinnedCommits = pins.flatMap(_.commits).toSet ++ live
    val pinnedDels = pins.flatMap(_.deletes).toSet
    val committed = IndexIO.shardIds(spark, s"$path/commits")
    for (k <- committed if !pinnedCommits(k)) {
      IndexIO.deleteDir(spark, s"$path/commits/shard=$k")
      IndexIO.deleteDir(spark, s"$path/postings/shard=$k")
    }
    // a watermark shard is reclaimable when no kept pin references it
    // AND the live fold already applied it (every fold applies all
    // watermarks it observes; watermarks published after the fold are
    // still pending and must stay). Conservative cut: only shards
    // older than the newest live commit's fold can be proven applied —
    // the fold observed exactly the delete shards present at its
    // start, which the caller's pins capture; anything unpinned AND
    // not referenced by the CURRENT pin is reclaimable.
    val dels = IndexIO.shardIds(spark, s"$path/deletes")
    for (k <- dels if !pinnedDels(k))
      IndexIO.deleteDir(spark, s"$path/deletes/shard=$k")
  }
}
