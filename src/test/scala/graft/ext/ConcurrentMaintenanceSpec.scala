package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-11 concurrency contract (VERDICT r10 task 3): `maintain` no
  * longer needs to be EXCLUSIVE of appends. The interleaving under test
  * is the worst one — a full maintenance pass (reconcile + gc + fold,
  * including the fold-ALL full-compact route) running at the exact
  * point where an appender has published its table shards but not yet
  * its commit marker. The appender lease ([[IndexIO.appendLeaseMs]] /
  * [[IndexIO.leasedIds]]) is what makes that safe: a young claim is a
  * live appender, not crash garbage.
  *
  * Determinism: no sleeps — [[IndexIO.preCommitHook]] (a one-shot test
  * seam at the top of `commitShard`, the append's LAST rename) runs the
  * racing maintenance synchronously at precisely the
  * tables-published-uncommitted point, then the append resumes and
  * commits. Assertions: BOTH writers' work lands (no lost shard), and
  * serving equals a from-scratch rebuild on the union corpus.
  *
  * Crash garbage is still reclaimed — just not before the lease
  * expires: pinned by the expiry tests (lease zeroed → the same
  * orphan/staging reclaim behavior every pre-round-11 spec asserts).
  *
  * CROSS-PROCESS evidence (round 17): these in-process races exercise
  * the interleavings deterministically; the same protocol racing two
  * REAL JVMs (separate drivers, shared root only) is executed by
  * `graft.tools.WriterRaceProbe` — 2×6 batches + mid-race maintains
  * from both processes, serve hash-equal to a sequential reference, no
  * shard-id collisions (`bench_artifacts/writer_race_r17.txt`). The
  * seam-driven specs pin WHICH interleavings are safe; the probe pins
  * that nothing about the arbitration (rename-claims, leases, the
  * maintlock) silently depended on a shared JVM. */
class ConcurrentMaintenanceSpec extends SparkSpec {

  import spark.implicits._

  private val K1 = 1.2
  private val B = 0.75
  private val Terms = Seq("fox", "spark", "jugs")

  private def fresh(tag: String) = java.nio.file.Files
    .createTempDirectory(s"graft-conc-$tag").toString + "/idx"

  private def docs(ids: Seq[Long]) = ids
    .map(i => (i, s"fox spark jugs doc$i tok${i % 5}")).toDF("doc_id", "text")

  private def tserve(path: String) =
    TextIndex.bm25TopK(spark, path, Terms, 100, K1, B)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq

  /** Arm the one-shot interleaving: `body` runs at the next
    * commit-marker publish (i.e. with that append's table shards
    * published but uncommitted), then the hook disarms itself so the
    * maintenance op's own commits don't recurse. */
  private def atNextCommit(body: => Unit): Unit =
    IndexIO.preCommitHook = () => {
      IndexIO.preCommitHook = () => ()
      body
    }

  override def afterAll(): Unit = {
    IndexIO.preCommitHook = () => ()
    super.afterAll()
  }

  test("TextIndex: maintain's fold route races an append — both land, serving exact") {
    val path = fresh("text-fold")
    TextIndex.write(docs(0L until 10L), path)
    TextIndex.append(docs(10L until 20L), path)
    assert(IndexIO.liveCommittedIds(spark, path).size == 2)
    var report: Option[MaintainReport] = None
    // maintain fires at the appender's tables-published-uncommitted
    // point; maxShards=1 forces the compactSmall fold of both existing
    // committed shards while the in-flight shard must survive untouched
    atNextCommit {
      report = Some(TextIndex.maintain(spark, path, maxShards = 1))
    }
    TextIndex.append(docs(20L until 30L), path)
    assert(report.exists(_.action == "compactSmall"),
      s"racing maintain did not fold: $report")
    // no lost shard: the fold result AND the appender's shard are live
    val live = IndexIO.liveCommittedIds(spark, path)
    assert(live.size == 2, s"expected folded + appended shards live, got $live")
    val ref = fresh("text-fold-ref")
    TextIndex.write(docs(0L until 30L), ref)
    assert(tserve(path) == tserve(ref),
      "serving after the race must equal a from-scratch rebuild")
  }

  test("TextIndex: maintain's FULL-compact route races an append — both land, tombstones clear") {
    val path = fresh("text-full")
    TextIndex.write(docs(0L until 10L), path)
    TextIndex.append(docs(10L until 20L), path)
    TextIndex.delete((0L until 8L).toDF("doc_id"), path)
    var report: Option[MaintainReport] = None
    // 8/20 dead ≥ 0.3 → the dead-fraction trigger takes the fold-all
    // in-root route (compactAllInPlace), racing the in-flight append
    atNextCommit {
      report = Some(TextIndex.maintain(spark, path, maxShards = 8,
        tombstoneFrac = 0.3))
    }
    TextIndex.append(docs(20L until 30L), path)
    assert(report.exists(_.action == "compact"),
      s"racing maintain did not full-compact: $report")
    val live = IndexIO.liveCommittedIds(spark, path)
    assert(live.size == 2, s"expected folded + appended shards live, got $live")
    // fold-all observed and applied every tombstone shard → cleared
    assert(IndexIO.shardIds(spark, s"$path/deletes").isEmpty,
      "fold-all must clear the observed tombstone shards")
    val ref = fresh("text-full-ref")
    TextIndex.write(docs((8L until 30L)), ref)
    assert(tserve(path) == tserve(ref),
      "serving after the racing full compact must equal a rebuild on survivors")
  }

  test("MinHashIndex: maintain races an append — both land, pairs exact") {
    val NumHashes = 8
    def toks(ids: Seq[Long]) = Dedup.docTokens(
      ids.map(i => (i, if (i % 3 == 0) "the quick brown fox jumps high"
                       else s"unique text $i topic ${i % 7}")).toDF("doc_id", "text"),
      "doc_id", "text", distinct = false)
    def pairs(p: String) = MinHashIndex.pairs(spark, p, NumHashes)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val path = fresh("mh")
    MinHashIndex.write(toks(0L until 12L), path, NumHashes, rowsPerBand = 2)
    MinHashIndex.append(toks(12L until 24L), path, NumHashes, rowsPerBand = 2)
    var report: Option[MaintainReport] = None
    atNextCommit {
      report = Some(MinHashIndex.maintain(spark, path, maxShards = 1))
    }
    MinHashIndex.append(toks(24L until 36L), path, NumHashes, rowsPerBand = 2)
    assert(report.exists(_.action == "compactSmall"),
      s"racing maintain did not fold: $report")
    assert(IndexIO.liveCommittedIds(spark, path).size == 2)
    val ref = fresh("mh-ref")
    MinHashIndex.write(toks(0L until 36L), ref, NumHashes, rowsPerBand = 2)
    assert(pairs(path) == pairs(ref))
  }

  test("VectorIndex: maintain races an append — both land, topK exact") {
    val emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    def topk(p: String) = VectorIndex.topK(spark, p,
        emb.filter(col("vec_id") < 5), k = 5, nprobe = 2)
      .select("query_id", "rank", "cand_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val path = fresh("vec")
    VectorIndex.write(emb.filter(col("vec_id") < 150), path, nCentroids = 4)
    VectorIndex.append(
      emb.filter(col("vec_id") >= 150 && col("vec_id") < 250), path)
    var report: Option[MaintainReport] = None
    atNextCommit {
      report = Some(VectorIndex.maintain(spark, path, maxShards = 1))
    }
    VectorIndex.append(
      emb.filter(col("vec_id") >= 250 && col("vec_id") < 350), path)
    assert(report.exists(_.action == "compactSmall"),
      s"racing maintain did not fold: $report")
    assert(IndexIO.liveCommittedIds(spark, path).size == 2)
    // centroid training is deterministic, so a SEQUENTIAL twin (same
    // build + same appends, maintain at the generation boundary) has
    // identical centroids and must serve identical topK
    val ref = fresh("vec-ref")
    VectorIndex.write(emb.filter(col("vec_id") < 150), ref, nCentroids = 4)
    VectorIndex.append(
      emb.filter(col("vec_id") >= 150 && col("vec_id") < 250), ref)
    VectorIndex.maintain(spark, ref, maxShards = 1)
    VectorIndex.append(
      emb.filter(col("vec_id") >= 250 && col("vec_id") < 350), ref)
    assert(topk(path) == topk(ref),
      "racing maintain must serve exactly like the sequential twin")
    // and no lost shard: every batch's ids survive among live postings
    val stored = spark.read.parquet(s"$path/postings")
      .filter(col("shard").isin(IndexIO.liveCommittedIds(spark, path): _*))
    assert(stored.filter(col("cand_id") >= 250 && col("cand_id") < 350).count() == 100,
      "appender's batch must survive the racing maintain")
    assert(stored.filter(col("cand_id") < 250).count() == 250,
      "folded corpus must survive intact")
  }

  test("two racing maintainers: second fails LOUD on the maintenance lock — no double fold") {
    val path = fresh("maint-race")
    TextIndex.write(docs(0L until 10L), path)
    TextIndex.append(docs(10L until 20L), path)
    assert(IndexIO.liveCommittedIds(spark, path).size == 2)
    // the second maintainer fires at the FIRST one's commit point — its
    // fold set is selected and written, only the REPLACES marker is
    // pending. Before the round-12 lock, the second pass would select
    // the SAME source shards and fold them again into a second new
    // shard (duplicated serving rows); with it, the second acquire
    // fails loud while the first holds the lock.
    var second: Option[Throwable] = None
    atNextCommit {
      second = Some(intercept[java.io.IOException] {
        TextIndex.compactAllInPlace(spark, path)
      })
    }
    val folded = TextIndex.compactAllInPlace(spark, path)
    assert(folded.sorted == Seq(0, 1), s"first maintainer folds both: $folded")
    assert(second.exists(_.getMessage.contains("maintenance already running")),
      s"second maintainer must fail loud on the lock, got: $second")
    assert(IndexIO.liveCommittedIds(spark, path).size == 1,
      "exactly ONE folded shard may serve — no double fold")
    val ref = fresh("maint-race-ref")
    TextIndex.write(docs(0L until 20L), ref)
    assert(tserve(path) == tserve(ref),
      "serving after the maintainer race must equal a rebuild")
    // the lock released with the first pass: a later maintain succeeds
    assert(TextIndex.maintain(spark, path).action == "none")
  }

  test("a crashed maintainer's stale lock is broken by the next pass") {
    val path = fresh("maint-stale")
    TextIndex.write(docs(0L until 6L), path)
    TextIndex.append(docs(6L until 12L), path)
    // forge the crash leftover: a lock whose owner timestamp (file
    // CONTENT — the clock authority; mtime is only the no-content
    // fallback) is far past the freshness bound. Back-date the mtime
    // too for realism, though content alone now decides.
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lock = new org.apache.hadoop.fs.Path(s"$path/maintlock")
    val old = System.currentTimeMillis() - IndexConfig.maintLockMs - 60000L
    fs.mkdirs(lock)
    val f = fs.create(new org.apache.hadoop.fs.Path(lock, "CLAIM"), false)
    try f.writeBytes(s"dead-maintainer\n$old\n") finally f.close()
    fs.setTimes(lock, old, old)
    // the STALE lock is broken and the pass runs to completion
    val folded = TextIndex.compactAllInPlace(spark, path)
    assert(folded.sorted == Seq(0, 1), s"stale lock must not block: $folded")
    assert(!fs.exists(lock), "the pass releases its own lock")
    val ref = fresh("maint-stale-ref")
    TextIndex.write(docs(0L until 12L), ref)
    assert(tserve(path) == tserve(ref))
  }

  test("release never deletes a successor's lock (rename-aside release)") {
    val path = fresh("rel-succ")
    TextIndex.write(docs(0L until 4L), path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lock = new org.apache.hadoop.fs.Path(s"$path/maintlock")
    val mine = IndexIO.acquireMaintLock(spark, path)
    // forge the worst case: this maintainer overran, a breaker broke
    // its lock and a SUCCESSOR acquired — release must leave the
    // successor's lock intact (the old holds-then-delete would read its
    // own stale nonce... here the nonce already mismatches, but the
    // assertion pins the full no-touch contract either way)
    fs.delete(lock, true)
    fs.mkdirs(lock)
    val f = fs.create(new org.apache.hadoop.fs.Path(lock, "CLAIM"), false)
    try f.writeBytes(s"successor\n${System.currentTimeMillis()}\n")
    finally f.close()
    IndexIO.releaseMaintLock(spark, path, mine)
    assert(fs.exists(lock), "successor's lock must survive the release")
    assert(IndexIO.holdsMaintLock(fs, lock, "successor"),
      "successor still owns its lock after the overrunner's release")
    fs.delete(lock, true) // clean for later passes
  }

  test("fold commit fails loud when the maintenance lock was lost mid-fold") {
    val path = fresh("commit-lost-lock")
    TextIndex.write(docs(0L until 4L), path)
    TextIndex.append(docs(4L until 8L), path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lock = new org.apache.hadoop.fs.Path(s"$path/maintlock")
    val mine = IndexIO.acquireMaintLock(spark, path)
    val k = IndexIO.claimShardId(spark, path, Seq("postings", "doclens", "stats"))
    // the lock is broken + re-acquired while this maintainer folds
    fs.delete(lock, true)
    fs.mkdirs(lock)
    val f = fs.create(new org.apache.hadoop.fs.Path(lock, "CLAIM"), false)
    try f.writeBytes(s"successor\n${System.currentTimeMillis()}\n")
    finally f.close()
    val e = intercept[java.io.IOException] {
      IndexIO.commitShard(spark, path, k, replaces = Seq(0, 1),
        maintLockNonce = mine)
    }
    assert(e.getMessage.contains("lock"), s"loud ownership failure: $e")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$path/commits/shard=$k")),
      "no REPLACES marker may land after the lock was lost")
    assert(IndexIO.liveCommittedIds(spark, path).sorted == Seq(0, 1),
      "the original shards keep serving untouched")
    fs.delete(lock, true)
  }

  test("an HB-only (CLAIM-less) lock dir never blocks maintenance") {
    val path = fresh("hb-only")
    TextIndex.write(docs(0L until 4L), path)
    TextIndex.append(docs(4L until 8L), path)
    // forge the resurrected state: a crashed heartbeat re-created the
    // lock dir with a FRESH HB and no CLAIM — never a valid acquisition
    // (CLAIM is staged before publish), so it must be broken
    // immediately, not after maintLockMs
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lock = new org.apache.hadoop.fs.Path(s"$path/maintlock")
    fs.mkdirs(lock)
    val f = fs.create(new org.apache.hadoop.fs.Path(lock, "HB"), false)
    try f.writeBytes(s"${System.currentTimeMillis()}\n") finally f.close()
    val folded = TextIndex.compactAllInPlace(spark, path)
    assert(folded.sorted == Seq(0, 1),
      s"HB-only lock must be breakable now, not in maintLockMs: $folded")
    assert(!fs.exists(lock), "the pass releases its own lock")
  }

  test("lease clock authority is claim CONTENT — an mtime-resetting store keeps the contract") {
    val path = fresh("clock")
    TextIndex.write(docs(0L until 6L), path)
    val k = IndexIO.claimShardId(spark, path, Seq("postings", "doclens", "stats"))
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = new org.apache.hadoop.fs.Path(s"$path/claims/shard=$k")
    // simulate a store with rename-reset / coarse mtimes: claim-dir
    // mtime far in the past, while the CLAIM file's content timestamp
    // (written at claim) is fresh — the lease must still hold
    val past = System.currentTimeMillis() - 10L * 60L * 60L * 1000L
    fs.setTimes(dir, past, past)
    assert(IndexIO.leasedIds(spark, path).contains(k),
      "content timestamp must keep the lease alive when mtime lies")
    // a heartbeat refreshes the content timestamp the same way
    IndexIO.heartbeatClaim(spark, path, k)
    fs.setTimes(dir, past, past)
    assert(IndexIO.leasedIds(spark, path).contains(k))
    // and a claim whose content timestamps AND mtime are all old is
    // correctly treated as expired (crash garbage)
    val old = System.currentTimeMillis() - 2L * IndexIO.appendLeaseMs
    fs.delete(new org.apache.hadoop.fs.Path(dir, "HB"), false)
    val f = fs.create(new org.apache.hadoop.fs.Path(dir, "CLAIM"), true)
    try f.writeBytes(s"some-nonce\n$old\n") finally f.close()
    fs.setTimes(dir, past, past)
    assert(!IndexIO.leasedIds(spark, path).contains(k),
      "an expired claim must not stay leased")
  }

  test("commit withdraws its marker when the tables vanished before it landed (TOCTOU guard)") {
    val path = fresh("toctou")
    TextIndex.write(docs(0L until 6L), path)
    // simulate the reconcile race ADVICE r11 named: the appender's
    // uncommitted table shards reclaimed between the lease check and
    // the marker rename — the marker must NOT survive as a success
    // signal for a batch that silently never serves
    atNextCommit {
      for (t <- Seq("postings", "doclens", "stats"))
        IndexIO.deleteDir(spark, s"$path/$t/shard=1")
    }
    val ex = intercept[java.io.IOException] {
      TextIndex.append(docs(6L until 12L), path)
    }
    assert(ex.getMessage.contains("lost its table shards"), ex.getMessage)
    assert(!IndexIO.committedIds(spark, path).contains(1),
      "the committed-but-tableless marker must be withdrawn")
    // the loud failure is retryable: a re-append lands the batch clean
    TextIndex.append(docs(6L until 12L), path)
    val ref = fresh("toctou-ref")
    TextIndex.write(docs(0L until 12L), ref)
    assert(tserve(path) == tserve(ref))
  }

  test("an append that outruns its lease fails loudly at commit, then retries clean") {
    val path = fresh("lease-enforce")
    TextIndex.write(docs(0L until 6L), path)
    val saved = IndexIO.appendLeaseMs
    try {
      IndexIO.appendLeaseMs = 200L
      // the interleaving hook stalls the appender past its lease right
      // before the marker rename — commit must fail LOUD, not land a
      // marker for shards a racing maintain may have reclaimed
      atNextCommit { Thread.sleep(400) }
      val ex = intercept[java.io.IOException] {
        TextIndex.append(docs(6L until 12L), path)
      }
      assert(ex.getMessage.contains("lease expired"), ex.getMessage)
      // the failed batch is invisible; reclaim + retry lands the data
      IndexIO.appendLeaseMs = 0L
      TextIndex.compactSmall(spark, path, maxShardBytes = Long.MaxValue)
      IndexIO.appendLeaseMs = saved
      TextIndex.append(docs(6L until 12L), path)
      val ref = fresh("lease-enforce-ref")
      TextIndex.write(docs(0L until 12L), ref)
      assert(tserve(path) == tserve(ref))
    } finally IndexIO.appendLeaseMs = saved
  }

  test("historical claims are reclaimed by maintenance (bounded metadata)") {
    val path = fresh("claims-gc")
    TextIndex.write(docs(0L until 6L), path)
    for (g <- 1 to 4)
      TextIndex.append(docs((g * 6L) until (g * 6L + 6L)), path)
    assert(IndexIO.shardIds(spark, s"$path/claims").size >= 4)
    val saved = IndexIO.appendLeaseMs
    try {
      // expire the leases (all claims are seconds old) so gcClaims can
      // act — in production this is the steady state after 15 min
      IndexIO.appendLeaseMs = 0L
      TextIndex.maintain(spark, path, maxShards = 1)
    } finally IndexIO.appendLeaseMs = saved
    // gcClaims runs at the START of the maintenance pass, so the pass's
    // own fold claim (and the pre-pass floor holder) may linger one
    // cycle — the invariant is BOUNDED claims (≤2 here after 4 appends),
    // not zero lag
    val claims = IndexIO.shardIds(spark, s"$path/claims")
    val maxC = IndexIO.shardIds(spark, s"$path/commits").max
    assert(claims.size <= 2 && claims.forall(_ >= maxC - 1),
      s"claims not bounded by maintenance: $claims (floor $maxC)")
    val ref = fresh("claims-gc-ref")
    TextIndex.write(docs(0L until 30L), ref)
    assert(tserve(path) == tserve(ref), "claims gc must not affect serving")
  }

  test("crash garbage is left within the lease, reclaimed after expiry") {
    val path = fresh("lease")
    TextIndex.write(docs(0L until 6L), path)
    val baseline = tserve(path)
    // canonical crash: tables published, marker never landed
    TextIndex.append(docs(6L until 12L), path)
    IndexIO.deleteDir(spark, s"$path/commits/shard=1")
    assert(tserve(path) == baseline, "uncommitted shard must not serve")
    // within the lease: a maintenance fold treats the orphan as a live
    // appender and leaves it
    TextIndex.compactSmall(spark, path, maxShardBytes = Long.MaxValue)
    assert(IndexIO.shardIds(spark, s"$path/postings").contains(1),
      "orphan inside the lease must survive maintenance")
    assert(tserve(path) == baseline)
    // after expiry: same call reclaims it for good
    val saved = IndexIO.appendLeaseMs
    try {
      IndexIO.appendLeaseMs = 0L
      TextIndex.compactSmall(spark, path, maxShardBytes = Long.MaxValue)
    } finally IndexIO.appendLeaseMs = saved
    assert(!IndexIO.shardIds(spark, s"$path/postings").contains(1),
      "orphan past the lease must be reclaimed")
    assert(tserve(path) == baseline)
  }

  test("MinHashIndex: two interleaved appenders commit distinct shards; band pairs equal sequential") {
    // the r12 gap: TextIndexSpec proves the two-appender race for BM25
    // postings, but MinHash's serve path (band-bucket pair join over
    // signatures + buckets) was unproven under it. Deterministic
    // interleaving: appender A pauses at its commit point (both table
    // shards published, marker not yet landed) while appender B runs a
    // COMPLETE append — and the two exercise DIFFERENT write routes
    // (A distributed partitions=2, B the small-batch driver route).
    val nh = 8
    def toks(ids: Seq[Long]) = Dedup.docTokens(
      ids.map(i => (i, s"alpha beta gamma doc$i tok${i % 3}"))
        .toDF("doc_id", "text"), "doc_id", "text", distinct = false)
    def mserve(p: String) = MinHashIndex.pairs(spark, p, nh)
      .orderBy("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val path = fresh("mh-writers")
    val pSeq = fresh("mh-writers-seq")
    MinHashIndex.write(toks(0L until 8L), path, nh, rowsPerBand = 2)
    atNextCommit {
      MinHashIndex.append(toks(12L until 16L), path, nh, rowsPerBand = 2,
        partitions = 1) // appender B: driver route, full append inside A's commit window
    }
    MinHashIndex.append(toks(8L until 12L), path, nh, rowsPerBand = 2,
      partitions = 2) // appender A
    assert(IndexIO.liveCommittedIds(spark, path).sorted == Seq(0, 1, 2),
      "each appender must land its own fresh shard id")
    MinHashIndex.write(toks(0L until 8L), pSeq, nh, rowsPerBand = 2)
    MinHashIndex.append(toks(8L until 12L), pSeq, nh, rowsPerBand = 2)
    MinHashIndex.append(toks(12L until 16L), pSeq, nh, rowsPerBand = 2)
    val got = mserve(path)
    assert(got.nonEmpty && got == mserve(pSeq),
      "interleaved appends must serve the same candidate pairs as sequential")
  }

  test("VectorIndex: two interleaved appenders commit distinct shards; IVF topK equals sequential") {
    val emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    def vserve(p: String) = VectorIndex.topK(spark, p,
        emb.filter(col("vec_id") < 5), k = 5, nprobe = 2)
      .select("query_id", "rank", "cand_id")
      .orderBy("query_id", "rank")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val path = fresh("vec-writers")
    val pSeq = fresh("vec-writers-seq")
    val base = emb.filter(col("vec_id") < 200)
    val batchA = emb.filter(col("vec_id") >= 200 && col("vec_id") < 300)
    val batchB = emb.filter(col("vec_id") >= 300 && col("vec_id") < 400)
    VectorIndex.write(base, path, nCentroids = 8)
    // appender B's complete append runs inside appender A's
    // published-but-uncommitted window (same seam as the MinHash case)
    atNextCommit { VectorIndex.append(batchB, path, partitions = 1) }
    VectorIndex.append(batchA, path, partitions = 1)
    assert(IndexIO.liveCommittedIds(spark, path).sorted == Seq(0, 1, 2),
      "each appender must land its own fresh shard id")
    VectorIndex.write(base, pSeq, nCentroids = 8)
    VectorIndex.append(batchA, pSeq, partitions = 1)
    VectorIndex.append(batchB, pSeq, partitions = 1)
    val got = vserve(path)
    assert(got.nonEmpty && got == vserve(pSeq),
      "interleaved appends must serve the same IVF top-k as sequential")
  }

  test("a fresh mtime cannot resurrect a stale lock (content is the only authority when present)") {
    val path = fresh("mtime-bump")
    TextIndex.write(docs(0L until 6L), path)
    TextIndex.append(docs(6L until 12L), path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lock = new org.apache.hadoop.fs.Path(s"$path/maintlock")
    // forge the ADVICE r12 scenario: a crashed maintainer's lock whose
    // CONTENT timestamp is stale, but whose dir mtime is FRESH — e.g. a
    // losing racer's rename deposited garbage inside the dir, or the
    // store refreshes directory mtimes. The old max(content, mtime)
    // read this as a live lock for another full bound; content
    // authority breaks it now.
    val old = System.currentTimeMillis() - IndexConfig.maintLockMs - 60000L
    fs.mkdirs(lock)
    val f = fs.create(new org.apache.hadoop.fs.Path(lock, "CLAIM"), false)
    try f.writeBytes(s"dead-maintainer\n$old\n") finally f.close()
    fs.mkdirs(new org.apache.hadoop.fs.Path(lock, "_deposited-garbage"))
    val folded = TextIndex.compactAllInPlace(spark, path)
    assert(folded.sorted == Seq(0, 1),
      s"stale-content lock with fresh mtime must be breakable: $folded")
    assert(!fs.exists(lock), "the pass releases its own lock")
    val ref = fresh("mtime-bump-ref")
    TextIndex.write(docs(0L until 12L), ref)
    assert(tserve(path) == tserve(ref))
  }

  test("maintenance lock fails loud on non-atomic-rename schemes, degrades only by explicit opt-in") {
    // the scheme check runs BEFORE any filesystem is instantiated, so
    // no s3a jars are needed to pin the guard
    val ex = intercept[java.io.IOException] {
      IndexIO.acquireMaintLock(spark, "s3a://bucket/some/index")
    }
    assert(ex.getMessage.contains("copy+delete"), ex.getMessage)
    assert(IndexIO.isNonAtomicRenameScheme("gs://b/idx"))
    assert(IndexIO.isNonAtomicRenameScheme("S3A://b/idx"), "scheme match is case-insensitive")
    assert(!IndexIO.isNonAtomicRenameScheme("/local/path"))
    assert(!IndexIO.isNonAtomicRenameScheme("hdfs://nn/idx"))
    assert(!IndexIO.isNonAtomicRenameScheme("abfss://c@a.dfs.core.windows.net/idx"),
      "ADLS Gen2 renames atomically and must not be blocked")
    // explicit opt-in: lock disabled (single-maintainer-by-contract),
    // returns the locking-disabled sentinel instead of throwing
    System.setProperty("graft.maint.lock.allowNonAtomic", "1")
    try assert(IndexIO.acquireMaintLock(spark, "s3a://bucket/some/index") == "")
    finally System.clearProperty("graft.maint.lock.allowNonAtomic")
  }

  test("gcStaging honors the lease: young staging kept, expired staging swept") {
    val path = fresh("gc")
    TextIndex.write(docs(0L until 6L), path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val young = new org.apache.hadoop.fs.Path(s"$path/_append-staging-young1")
    fs.mkdirs(young)
    IndexIO.gcStaging(spark, path)
    assert(fs.exists(young), "a staging dir inside the lease must survive gc")
    val saved = IndexIO.appendLeaseMs
    try {
      IndexIO.appendLeaseMs = 0L
      IndexIO.gcStaging(spark, path)
    } finally IndexIO.appendLeaseMs = saved
    assert(!fs.exists(young), "an expired staging dir must be swept")
  }
}
