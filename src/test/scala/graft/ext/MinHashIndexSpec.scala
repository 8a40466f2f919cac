package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The persisted MinHash/LSH index (ext/MinHashIndex): result parity
  * with the build-inline [[Dedup.minhashLshPairs]], the staged
  * publish (no partial index visible under the destination), and
  * overwrite-on-rebuild semantics.
  */
class MinHashIndexSpec extends SparkSpec with EagerLease {

  import spark.implicits._

  private val NumHashes = 8

  private def docsDf = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),
    (3L, "pack my box with five dozen liquor jugs"),
    (4L, "the quick brown fox jumps over the lazy dog"),
    (5L, "completely unrelated text about spark plans")
  ).toDF("doc_id", "text")

  private def toks = Dedup.docTokens(docsDf, "doc_id", "text", distinct = false)

  private val path = java.nio.file.Files
    .createTempDirectory("graft-mhindex-spec").toString + "/idx"

  test("persisted pairs equal the build-inline minhashLshPairs") {
    MinHashIndex.write(toks, path, NumHashes, rowsPerBand = 2)
    val stored = MinHashIndex.pairs(spark, path, NumHashes)
      .orderBy("a", "b").collect()
    val inline = Dedup.minhashLshPairs(
        Dedup.minhashSignature(toks, NumHashes), NumHashes, rowsPerBand = 2)
      .orderBy("a", "b").collect()
    assert(stored.nonEmpty && stored.sameElements(inline))
    // the exact-dup pair must be there with a perfect estimate
    val perfect = stored.filter(r => r.getLong(0) == 1L && r.getLong(1) == 4L)
    assert(perfect.length == 1 && perfect.head.getDouble(2) == 1.0)
  }

  test("rebuild overwrites in place; serving sees exactly the new corpus") {
    MinHashIndex.write(toks, path, NumHashes, rowsPerBand = 2)
    // rebuild WITHOUT doc 4: the (1,4) exact-dup pair must vanish
    val toks2 = Dedup.docTokens(
      docsDf.filter(col("doc_id") =!= 4L), "doc_id", "text", distinct = false)
    MinHashIndex.write(toks2, path, NumHashes, rowsPerBand = 2)
    val got = MinHashIndex.pairs(spark, path, NumHashes).collect()
    assert(!got.exists(r => r.getLong(1) == 4L || r.getLong(0) == 4L))
    // no staging residue next to the destination after publish
    val parent = new java.io.File(path).getParentFile
    assert(parent.listFiles.map(_.getName).filter(_.contains("staging")).isEmpty)
  }

  test("small-batch driver append route: engaged at partitions=1, bit-equal to the Spark route") {
    // scalar hash twin parity first — the driver route's foundation
    val sampleToks = Seq("fox", "jugs", "ünïcode", "", "a b", "1234567890")
    val colHashes = sampleToks.toDF("tok")
      .select(Dedup.tokenHash(col("tok")).as("h")).collect().map(_.getLong(0))
    assert(sampleToks.map(Dedup.tokenHashStr) == colHashes.toSeq,
      "tokenHashStr must equal the column tokenHash bit-for-bit")
    def toksOf(pred: org.apache.spark.sql.Column) = Dedup.docTokens(
      docsDf.filter(pred), "doc_id", "text", distinct = false)
    val pD = java.nio.file.Files
      .createTempDirectory("graft-mhindex-drv").toString + "/idx"
    val pS = java.nio.file.Files
      .createTempDirectory("graft-mhindex-spk").toString + "/idx"
    for (p <- Seq(pD, pS))
      MinHashIndex.write(toksOf(col("doc_id") <= 2), p, NumHashes, rowsPerBand = 2)
    // partitions=1 → driver route; partitions=2 → Spark route
    MinHashIndex.append(toksOf(col("doc_id") > 2), pD, NumHashes,
      rowsPerBand = 2, partitions = 1)
    MinHashIndex.append(toksOf(col("doc_id") > 2), pS, NumHashes,
      rowsPerBand = 2, partitions = 2)
    // the driver route really engaged: exactly one Group-API file, no
    // Spark commit protocol residue (_SUCCESS)
    for (t <- Seq("signatures", "buckets")) {
      val files = new java.io.File(s"$pD/$t/shard=1").listFiles.map(_.getName)
        .filterNot(n => n.startsWith(".") || n.startsWith("_")) // fs checksum files
      assert(files.toSeq == Seq("part-00000.parquet"),
        s"driver route must have written $t/shard=1 itself, saw ${files.toSeq}")
    }
    // table contents bit-equal between the routes
    val mcols = (0 until NumHashes).map(i => s"m$i")
    def sig(p: String) = spark.read.parquet(s"$p/signatures")
      .select("id", mcols: _*).orderBy("id").collect().toSeq
    def bkt(p: String) = spark.read.parquet(s"$p/buckets")
      .select("id", "band", "bucket").orderBy("band", "bucket", "id")
      .collect().toSeq
    assert(sig(pD) == sig(pS), "signatures must match the Spark route")
    assert(bkt(pD) == bkt(pS), "buckets must match the Spark route")
    // and serving equality against a from-scratch rebuild
    val reb = java.nio.file.Files
      .createTempDirectory("graft-mhindex-drv-reb").toString + "/idx"
    MinHashIndex.write(toks, reb, NumHashes, rowsPerBand = 2)
    val a = MinHashIndex.pairs(spark, pD, NumHashes).orderBy("a", "b").collect()
    val b = MinHashIndex.pairs(spark, reb, NumHashes).orderBy("a", "b").collect()
    assert(a.nonEmpty && a.sameElements(b))
  }

  test("append equals rebuild and never touches existing shard files") {
    val pA = java.nio.file.Files
      .createTempDirectory("graft-mhindex-app").toString + "/idx"
    val pB = java.nio.file.Files
      .createTempDirectory("graft-mhindex-reb").toString + "/idx"
    def toksOf(pred: org.apache.spark.sql.Column) = Dedup.docTokens(
      docsDf.filter(pred), "doc_id", "text", distinct = false)
    MinHashIndex.write(toksOf(col("doc_id") <= 2), pA, NumHashes, rowsPerBand = 2)
    val sigBefore = ShardFiles.snapshot(s"$pA/signatures/shard=0")
    val bktBefore = ShardFiles.snapshot(s"$pA/buckets/shard=0")
    assert(sigBefore.nonEmpty && bktBefore.nonEmpty)
    MinHashIndex.append(toksOf(col("doc_id") > 2), pA, NumHashes, rowsPerBand = 2)
    // only NEW shards appeared; the original shard files are untouched
    assert(ShardFiles.snapshot(s"$pA/signatures/shard=0") == sigBefore)
    assert(ShardFiles.snapshot(s"$pA/buckets/shard=0") == bktBefore)
    assert(IndexIO.shardIds(spark, s"$pA/signatures") == Seq(0, 1))
    assert(IndexIO.shardIds(spark, s"$pA/buckets") == Seq(0, 1))
    MinHashIndex.write(toks, pB, NumHashes, rowsPerBand = 2)
    val a = MinHashIndex.pairs(spark, pA, NumHashes).orderBy("a", "b").collect()
    val b = MinHashIndex.pairs(spark, pB, NumHashes).orderBy("a", "b").collect()
    assert(a.nonEmpty && a.sameElements(b))
    // signature ROWS equal the rebuild's (layout aside)
    val mcols = (0 until NumHashes).map(i => s"m$i")
    val sa = spark.read.parquet(s"$pA/signatures")
      .select("id", mcols: _*).orderBy("id").collect()
    val sb = spark.read.parquet(s"$pB/signatures")
      .select("id", mcols: _*).orderBy("id").collect()
    assert(sa.sameElements(sb))
    // compact folds shards back to one; pair results are unchanged
    MinHashIndex.compact(spark, pA)
    assert(IndexIO.shardIds(spark, s"$pA/signatures") == Seq(0))
    assert(IndexIO.shardIds(spark, s"$pA/buckets") == Seq(0))
    val c = MinHashIndex.pairs(spark, pA, NumHashes).orderBy("a", "b").collect()
    assert(c.sameElements(b))
  }

  test("tombstone delete kills pairs through re-append; compact resets the index") {
    val p = java.nio.file.Files
      .createTempDirectory("graft-mhindex-del").toString + "/idx"
    def toks4 = Dedup.docTokens(
      docsDf.filter(col("doc_id") === 4L), "doc_id", "text", distinct = false)
    MinHashIndex.write(toks, p, NumHashes, rowsPerBand = 2)
    val sigBefore = ShardFiles.snapshot(s"$p/signatures/shard=0")
    MinHashIndex.delete(Seq(4L).toDF("id"), p)
    // delete is a pure shard publish: stored tables untouched
    assert(ShardFiles.snapshot(s"$p/signatures/shard=0") == sigBefore)
    def pairsWith4() = MinHashIndex.pairs(spark, p, NumHashes).collect()
      .exists(r => r.getLong(0) == 4L || r.getLong(1) == 4L)
    assert(!pairsWith4())
    // served pairs equal an index NEVER built over the deleted doc
    val pReb = java.nio.file.Files
      .createTempDirectory("graft-mhindex-del-reb").toString + "/idx"
    MinHashIndex.write(Dedup.docTokens(docsDf.filter(col("doc_id") =!= 4L),
      "doc_id", "text", distinct = false), pReb, NumHashes, rowsPerBand = 2)
    assert(MinHashIndex.pairs(spark, p, NumHashes).orderBy("a", "b").collect()
      .sameElements(
        MinHashIndex.pairs(spark, pReb, NumHashes).orderBy("a", "b").collect()))
    // tombstones are index-wide: a re-appended deleted id stays dead
    MinHashIndex.append(toks4, p, NumHashes, rowsPerBand = 2)
    assert(!pairsWith4())
    // compact drops tombstoned rows (including the re-appended shard's)
    // and clears the set; a fresh append then serves the id again
    MinHashIndex.compact(spark, p)
    assert(IndexIO.shardIds(spark, s"$p/deletes").isEmpty)
    assert(spark.read.parquet(s"$p/signatures")
      .filter(col("id") === 4L).count() == 0)
    MinHashIndex.append(toks4, p, NumHashes, rowsPerBand = 2)
    val revived = MinHashIndex.pairs(spark, p, NumHashes).collect()
      .filter(r => r.getLong(0) == 1L && r.getLong(1) == 4L)
    assert(revived.length == 1 && revived.head.getDouble(2) == 1.0)
  }

  test("minhashLshPairs durable route equals inline and leaves a servable index") {
    val p = java.nio.file.Files
      .createTempDirectory("graft-mhpairs-route").toString + "/idx"
    val sig = Dedup.minhashSignature(toks, NumHashes)
    val inline = Dedup.minhashLshPairs(sig, NumHashes, rowsPerBand = 2)
      .orderBy("a", "b").collect()
    val durable = Dedup.minhashLshPairs(sig, NumHashes, rowsPerBand = 2,
        indexPath = Some(p))
      .orderBy("a", "b").collect()
    assert(durable.nonEmpty && durable.sameElements(inline))
    // the route's side effect IS the persisted index: servable + appendable
    val served = MinHashIndex.pairs(spark, p, NumHashes).orderBy("a", "b").collect()
    assert(served.sameElements(inline))
    assert(IndexIO.shardIds(spark, s"$p/signatures") == Seq(0))
  }

  test("append retry after a mid-append crash drops the orphan shard") {
    val pA = java.nio.file.Files
      .createTempDirectory("graft-mhindex-crash").toString + "/idx"
    val pB = java.nio.file.Files
      .createTempDirectory("graft-mhindex-crash-reb").toString + "/idx"
    def toksOf(pred: org.apache.spark.sql.Column) = Dedup.docTokens(
      docsDf.filter(pred), "doc_id", "text", distinct = false)
    MinHashIndex.write(toksOf(col("doc_id") <= 2), pA, NumHashes, rowsPerBand = 2)
    MinHashIndex.append(toksOf(col("doc_id") > 2), pA, NumHashes, rowsPerBand = 2)
    // simulate a committed-but-incomplete shard (external tampering: the
    // marker landed, a table shard vanished) — the harder reconcile case
    IndexIO.deleteDir(spark, s"$pA/buckets/shard=1")
    // readers on the crashed index see the PRE-append answer
    val crashed = MinHashIndex.pairs(spark, pA, NumHashes).collect()
    assert(!crashed.exists(r => r.getLong(0) > 2 || r.getLong(1) > 2))
    // retry the same batch: the orphan must be dropped, not duplicated
    MinHashIndex.append(toksOf(col("doc_id") > 2), pA, NumHashes, rowsPerBand = 2)
    MinHashIndex.write(toks, pB, NumHashes, rowsPerBand = 2)
    val a = MinHashIndex.pairs(spark, pA, NumHashes).orderBy("a", "b").collect()
    val b = MinHashIndex.pairs(spark, pB, NumHashes).orderBy("a", "b").collect()
    assert(a.nonEmpty && a.sameElements(b))
    // no duplicate signature rows survived the retry
    val ids = spark.read.parquet(s"$pA/signatures").groupBy("id").count()
      .filter(col("count") > 1).count()
    assert(ids == 0)
  }

  test("a shard without its commit marker is invisible and reconciled away") {
    val pA = java.nio.file.Files
      .createTempDirectory("graft-mhindex-marker").toString + "/idx"
    val pB = java.nio.file.Files
      .createTempDirectory("graft-mhindex-marker-reb").toString + "/idx"
    def toksOf(pred: org.apache.spark.sql.Column) = Dedup.docTokens(
      docsDf.filter(pred), "doc_id", "text", distinct = false)
    MinHashIndex.write(toksOf(col("doc_id") <= 2), pA, NumHashes, rowsPerBand = 2)
    val baseline = MinHashIndex.pairs(spark, pA, NumHashes)
      .orderBy("a", "b").collect().toSeq
    // simulate the canonical crash: BOTH table shards published, marker
    // not — remove the marker the append wrote
    MinHashIndex.append(toksOf(col("doc_id") > 2), pA, NumHashes, rowsPerBand = 2)
    IndexIO.deleteDir(spark, s"$pA/commits/shard=1")
    assert(MinHashIndex.pairs(spark, pA, NumHashes)
      .orderBy("a", "b").collect().toSeq == baseline,
      "uncommitted shard must not serve")
    // the retry lands under a FRESH claimed id (ids are never reused —
    // the concurrent-append contract); the orphan stays reader-invisible
    MinHashIndex.append(toksOf(col("doc_id") > 2), pA, NumHashes, rowsPerBand = 2)
    assert(IndexIO.committedIds(spark, pA) == Seq(0, 2),
      "retry must claim a fresh shard id, not reuse the orphan's")
    MinHashIndex.write(toks, pB, NumHashes, rowsPerBand = 2)
    assert(MinHashIndex.pairs(spark, pA, NumHashes).orderBy("a", "b").collect()
      .sameElements(
        MinHashIndex.pairs(spark, pB, NumHashes).orderBy("a", "b").collect()))
  }

  test("compactSmall folds small shards, leaves the big one, and guards lost commits") {
    val pA = java.nio.file.Files
      .createTempDirectory("graft-mhindex-tiered").toString + "/idx"
    val pB = java.nio.file.Files
      .createTempDirectory("graft-mhindex-tiered-reb").toString + "/idx"
    def toksOf(pred: org.apache.spark.sql.Column) = Dedup.docTokens(
      docsDf.filter(pred), "doc_id", "text", distinct = false)
    MinHashIndex.write(toksOf(col("doc_id") <= 3), pA, NumHashes, rowsPerBand = 2)
    MinHashIndex.append(toksOf(col("doc_id") === 4L), pA, NumHashes, rowsPerBand = 2)
    MinHashIndex.append(toksOf(col("doc_id") === 5L), pA, NumHashes, rowsPerBand = 2)
    val bigBytes = Seq("signatures", "buckets")
      .map(t => IndexIO.dirBytes(spark, s"$pA/$t/shard=0")).sum
    val before = Seq("signatures", "buckets")
      .map(t => t -> ShardFiles.snapshot(s"$pA/$t/shard=0")).toMap
    val folded = MinHashIndex.compactSmall(spark, pA, maxShardBytes = bigBytes - 1)
    assert(folded == Seq(1, 2), s"expected the two small shards, got $folded")
    assert(Seq("signatures", "buckets")
      .map(t => t -> ShardFiles.snapshot(s"$pA/$t/shard=0")).toMap == before,
      "size-tiered compaction must not rewrite the big shard")
    assert(IndexIO.liveCommittedIds(spark, pA) == Seq(0, 3))
    MinHashIndex.write(toks, pB, NumHashes, rowsPerBand = 2)
    assert(MinHashIndex.pairs(spark, pA, NumHashes).orderBy("a", "b").collect()
      .sameElements(
        MinHashIndex.pairs(spark, pB, NumHashes).orderBy("a", "b").collect()))
    // lost-commits guard: a multi-shard table with no markers must fail
    // loudly rather than silently serve possibly-uncommitted shards
    IndexIO.deleteDir(spark, s"$pA/commits")
    val ex = intercept[IllegalArgumentException] {
      MinHashIndex.pairs(spark, pA, NumHashes).collect()
    }
    assert(ex.getMessage.contains("no commit markers"))
  }

  test("compactSmall crash after the REPLACES commit: resurrected folded " +
      "shards are invisible and the next maintenance reclaims them") {
    val pA = java.nio.file.Files
      .createTempDirectory("graft-mhindex-crash").toString + "/idx"
    def toksOf(pred: org.apache.spark.sql.Column) = Dedup.docTokens(
      docsDf.filter(pred), "doc_id", "text", distinct = false)
    MinHashIndex.write(toksOf(col("doc_id") <= 3), pA, NumHashes, rowsPerBand = 2)
    MinHashIndex.append(toksOf(col("doc_id") === 4L), pA, NumHashes, rowsPerBand = 2)
    MinHashIndex.append(toksOf(col("doc_id") === 5L), pA, NumHashes, rowsPerBand = 2)
    def copyTree(src: java.io.File, dst: java.io.File): Unit =
      if (src.isDirectory) {
        dst.mkdirs()
        Option(src.listFiles).foreach(_.foreach(f =>
          copyTree(f, new java.io.File(dst, f.getName))))
      } else java.nio.file.Files.copy(src.toPath, dst.toPath)
    val stash = java.nio.file.Files.createTempDirectory("graft-mh-stash").toString
    val tables = Seq("signatures", "buckets", "commits")
    for (t <- tables; k <- Seq(1, 2))
      copyTree(new java.io.File(s"$pA/$t/shard=$k"),
        new java.io.File(s"$stash/$t/shard=$k"))
    val bigBytes = Seq("signatures", "buckets")
      .map(t => IndexIO.dirBytes(spark, s"$pA/$t/shard=0")).sum
    assert(MinHashIndex.compactSmall(spark, pA, maxShardBytes = bigBytes - 1)
      == Seq(1, 2))
    val healthy = MinHashIndex.pairs(spark, pA, NumHashes)
      .orderBy("a", "b").collect()
    // crash reconstruction: REPLACES marker landed, physical deletes did
    // not — the folded shards (markers AND table shards) come back
    for (t <- tables; k <- Seq(1, 2))
      copyTree(new java.io.File(s"$stash/$t/shard=$k"),
        new java.io.File(s"$pA/$t/shard=$k"))
    assert(IndexIO.liveCommittedIds(spark, pA) == Seq(0, 3))
    assert(MinHashIndex.pairs(spark, pA, NumHashes)
      .orderBy("a", "b").collect().sameElements(healthy),
      "a reader must serve identically across the crash window")
    // the next maintenance pass reconciles the garbage away for good
    assert(MinHashIndex.compactSmall(spark, pA, maxShardBytes = 1).isEmpty)
    assert(IndexIO.shardIds(spark, s"$pA/signatures") == Seq(0, 3))
    assert(IndexIO.shardIds(spark, s"$pA/commits") == Seq(0, 3))
    assert(MinHashIndex.pairs(spark, pA, NumHashes)
      .orderBy("a", "b").collect().sameElements(healthy))
  }

  test("append refuses a pre-marker sharded index; compact migrates it") {
    val p = java.nio.file.Files
      .createTempDirectory("graft-mhindex-premarker").toString + "/idx"
    // emulate a round-7 index: sharded tables, no commits/ — build one
    // normally and strip its marker table
    MinHashIndex.write(toks, p, NumHashes, rowsPerBand = 2)
    IndexIO.deleteDir(spark, s"$p/commits")
    val before = MinHashIndex.pairs(spark, p, NumHashes).orderBy("a", "b").collect()
    assert(before.nonEmpty, "legacy index must stay readable")
    val ex = intercept[IllegalArgumentException] {
      MinHashIndex.append(toks, p, NumHashes, rowsPerBand = 2)
    }
    assert(ex.getMessage.contains("commit-marker"))
    MinHashIndex.compact(spark, p)
    assert(IndexIO.committedIds(spark, p) == Seq(0))
    assert(MinHashIndex.pairs(spark, p, NumHashes).orderBy("a", "b").collect()
      .sameElements(before))
  }

  test("append refuses the pre-shard flat layout; compact migrates it") {
    val p = java.nio.file.Files
      .createTempDirectory("graft-mhindex-flat").toString + "/idx"
    // emulate an index written by the pre-shard layout: part-files
    // directly under each table root, no shard= directories
    val sig = Dedup.minhashSignature(toks, NumHashes)
    sig.write.parquet(s"$p/signatures")
    MinHashIndex.bands(sig, NumHashes, rowsPerBand = 2)
      .write.parquet(s"$p/buckets")
    val before = MinHashIndex.pairs(spark, p, NumHashes).orderBy("a", "b").collect()
    val ex = intercept[IllegalArgumentException] {
      MinHashIndex.append(toks, p, NumHashes, rowsPerBand = 2)
    }
    assert(ex.getMessage.contains("flat layout"))
    MinHashIndex.compact(spark, p)
    assert(IndexIO.shardIds(spark, s"$p/signatures") == Seq(0))
    assert(IndexIO.shardIds(spark, s"$p/buckets") == Seq(0))
    val after = MinHashIndex.pairs(spark, p, NumHashes).orderBy("a", "b").collect()
    assert(after.sameElements(before))
  }

  test("versioned publish: pointer flip, immutable history, rollback, prune") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-mhindex-ver").toString + "/idx"
    def toksOf(pred: org.apache.spark.sql.Column) = Dedup.docTokens(
      docsDf.filter(pred), "doc_id", "text", distinct = false)
    val v1 = MinHashIndex.writeVersioned(toksOf(col("doc_id") <= 2), root,
      NumHashes, rowsPerBand = 2)
    assert(v1.endsWith("/v00001"))
    assert(IndexIO.resolveCurrent(spark, root) == v1)
    val v1Sig = ShardFiles.snapshot(s"$v1/signatures/shard=0")
    val v2 = MinHashIndex.writeVersioned(toks, root, NumHashes, rowsPerBand = 2)
    // pointer flipped to the new COMPLETE version; v1 is untouched history
    assert(IndexIO.resolveCurrent(spark, root) == v2)
    assert(ShardFiles.snapshot(s"$v1/signatures/shard=0") == v1Sig)
    val cur = MinHashIndex.pairsCurrent(spark, root, NumHashes)
      .orderBy("a", "b").collect()
    val inline = Dedup.minhashLshPairs(
        Dedup.minhashSignature(toks, NumHashes), NumHashes, rowsPerBand = 2)
      .orderBy("a", "b").collect()
    assert(cur.nonEmpty && cur.sameElements(inline))
    // rollback is a pointer flip, no rebuild: serving returns to v1's corpus
    IndexIO.setCurrent(spark, root, "v00001")
    val rolled = MinHashIndex.pairsCurrent(spark, root, NumHashes).collect()
    assert(!rolled.exists(r => r.getLong(0) > 2L || r.getLong(1) > 2L))
    // prune keeps the newest keepLast and always the current version
    IndexIO.pruneVersions(spark, root, keepLast = 1)
    assert(IndexIO.versionIds(spark, root).contains(1))
    IndexIO.setCurrent(spark, root, "v00002")
    IndexIO.pruneVersions(spark, root, keepLast = 1)
    assert(IndexIO.versionIds(spark, root) == Seq(2))
    // a pointer at a pruned/missing version fails loudly
    intercept[java.io.IOException] {
      IndexIO.setCurrent(spark, root, "v00001")
    }
  }

  test("a version dir without a pointer flip is never served; a later publish skips past and prune reclaims it") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-mhindex-crash").toString + "/idx"
    def toksOf(pred: org.apache.spark.sql.Column) = Dedup.docTokens(
      docsDf.filter(pred), "doc_id", "text", distinct = false)
    val v1 = MinHashIndex.writeVersioned(toksOf(col("doc_id") <= 2), root,
      NumHashes, rowsPerBand = 2)
    // simulate a crash BETWEEN the version-dir rename and the pointer
    // flip: a complete build lands as v00002 but CURRENT still names v1
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-mhindex-orphan").toString + "/idx"
    MinHashIndex.write(toks, tmp, NumHashes, rowsPerBand = 2)
    assert(new java.io.File(tmp).renameTo(new java.io.File(s"$root/v00002")))
    assert(IndexIO.resolveCurrent(spark, root) == v1) // reader unaffected
    // the retried publish takes the NEXT slot and flips past the orphan
    val v3 = MinHashIndex.writeVersioned(toks, root, NumHashes, rowsPerBand = 2)
    assert(v3.endsWith("/v00003") && IndexIO.resolveCurrent(spark, root) == v3)
    IndexIO.pruneVersions(spark, root, keepLast = 1)
    assert(IndexIO.versionIds(spark, root) == Seq(3)) // orphan reclaimed
  }

  test("band keys: persisted table matches the shared construction") {
    MinHashIndex.write(toks, path, NumHashes, rowsPerBand = 2)
    val sig = spark.read.parquet(s"$path/signatures")
    val derived = MinHashIndex.bands(sig, NumHashes, rowsPerBand = 2)
      .orderBy("band", "bucket", "id").collect()
    val stored = spark.read.parquet(s"$path/buckets")
      .select("id", "band", "bucket")
      .orderBy("band", "bucket", "id").collect()
    assert(stored.sameElements(derived))
  }

  test("buckets() serves the commit protocol: uncommitted shards and deleted docs never collide") {
    val p = java.nio.file.Files
      .createTempDirectory("graft-mh-buckets-spec").toString + "/idx"
    MinHashIndex.write(toks, p, NumHashes, rowsPerBand = 2)
    // hazard 1: a tombstoned doc — its rows stay in the files until a
    // compaction, but it must stop colliding IMMEDIATELY
    MinHashIndex.delete(Seq(4L).toDF("id"), p)
    // hazard 2: a crashed appender — table shard lands, the commit
    // marker never does (the one-shot hook throws at the commit point)
    IndexIO.preCommitHook = () => {
      IndexIO.preCommitHook = () => ()
      sys.error("spec: crash before the commit marker")
    }
    val more = Dedup.docTokens(
      Seq((9L, "the quick brown fox jumps over the lazy dog"))
        .toDF("doc_id", "text"), "doc_id", "text", distinct = false)
    intercept[Exception] {
      MinHashIndex.append(more, p, NumHashes, rowsPerBand = 2, partitions = 1)
    }
    IndexIO.preCommitHook = () => ()
    // the raw path really carries both hazards…
    val raw = spark.read.parquet(s"$p/buckets")
      .select("id").distinct().collect().map(_.getLong(0)).toSet
    assert(raw.contains(4L) && raw.contains(9L),
      s"spec setup must leave both hazards on disk, raw ids = $raw")
    // …and the serving accessor prunes both
    val served = MinHashIndex.buckets(spark, p)
      .select("id").distinct().collect().map(_.getLong(0)).toSet
    assert(served == Set(1L, 2L, 3L, 5L), s"served ids = $served")
  }
}
