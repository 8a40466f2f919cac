package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The persisted IVF index (ext/VectorIndex): result parity with the
  * build-inline form, and the serving-path scan claims — the probed
  * cids reach the parquet scan as a pushed filter over the cid-sorted
  * layout, and the index build is what pays the assignment cost.
  */
class VectorIndexSpec extends SparkSpec with EagerLease {

  private def emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")

  private val path = java.nio.file.Files
    .createTempDirectory("graft-vindex-spec").toString

  test("persisted-index topK equals the build-inline ivfTopK") {
    VectorIndex.write(emb, path, nCentroids = 8)
    val stored = VectorIndex.topK(spark, path,
        emb.filter(col("vec_id") < 5), k = 5, nprobe = 2)
      .select("query_id", "rank", "cand_id", "cosine")
      .orderBy("query_id", "rank").collect()
    val inline = Similarity.ivfTopK(
        emb.filter(col("vec_id") < 5), emb, k = 5, nCentroids = 8, nprobe = 2)
      .select("query_id", "rank", "cand_id", "cosine")
      .orderBy("query_id", "rank").collect()
    assert(stored.nonEmpty && stored.sameElements(inline))
  }

  test("probed cids are pushed to the postings scan as a literal filter") {
    VectorIndex.write(emb, path, nCentroids = 8)
    val df = VectorIndex.topK(spark, path,
      emb.filter(col("vec_id") < 5), k = 5, nprobe = 2)
    val plan = df.queryExecution.executedPlan.toString
    assert("PushedFilters: \\[[^\\]]*[Ii]n\\(cid".r.findFirstIn(plan).isDefined,
      s"cid IN filter not pushed to the postings scan:\n$plan")
  }

  test("filtered search: metadata rides in postings, predicate pushes to the scan, appends keep it") {
    val p = java.nio.file.Files
      .createTempDirectory("graft-vindex-meta").toString + "/idx"
    VectorIndex.write(emb.filter(col("vec_id") < 400), p, nCentroids = 8,
      metaCols = Seq("label"))
    // an append lacking the stored metadata column fails loudly
    val ex = intercept[IllegalArgumentException] {
      VectorIndex.append(emb.filter(col("vec_id") >= 400).drop("label"), p)
    }
    assert(ex.getMessage.contains("label"))
    VectorIndex.append(emb.filter(col("vec_id") >= 400), p)
    val filtered = VectorIndex.topK(spark, p,
      emb.filter(col("vec_id") < 5), k = 5, nprobe = 2,
      candFilter = Some(col("label") % 2 === 0))
    // every served candidate satisfies the predicate (checked against
    // the raw corpus, which the serve path itself never joins)
    val evenIds = emb.filter(col("label") % 2 === 0)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val got = filtered.select("query_id", "cand_id").collect()
    assert(got.nonEmpty && got.forall(r => evenIds.contains(r.getLong(1))))
    // the label predicate reaches the SAME parquet scan as the cid probe
    val plan = filtered.queryExecution.executedPlan.toString
    assert("PushedFilters: \\[[^\\]]*[Ii]n\\(cid".r.findFirstIn(plan).isDefined)
    assert(plan.contains("label"), s"label predicate missing from plan:\n$plan")
    // compact preserves the metadata column and the filtered answer
    val before = filtered.orderBy("query_id", "rank").collect()
    VectorIndex.compact(spark, p)
    val after = VectorIndex.topK(spark, p,
        emb.filter(col("vec_id") < 5), k = 5, nprobe = 2,
        candFilter = Some(col("label") % 2 === 0))
      .orderBy("query_id", "rank").collect()
    assert(after.sameElements(before))
  }

  test("versioned publish serves the pointed-at version; rollback is a pointer flip") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-vindex-ver").toString + "/idx"
    VectorIndex.writeVersioned(emb.filter(col("vec_id") < 100), root, nCentroids = 8)
    val v2 = VectorIndex.writeVersioned(emb, root, nCentroids = 8)
    assert(IndexIO.resolveCurrent(spark, root) == v2)
    val cur = VectorIndex.topKCurrent(spark, root,
        emb.filter(col("vec_id") < 5), k = 5, nprobe = 2)
      .select("query_id", "rank", "cand_id", "cosine")
      .orderBy("query_id", "rank").collect()
    val inline = Similarity.ivfTopK(
        emb.filter(col("vec_id") < 5), emb, k = 5, nCentroids = 8, nprobe = 2)
      .select("query_id", "rank", "cand_id", "cosine")
      .orderBy("query_id", "rank").collect()
    assert(cur.nonEmpty && cur.sameElements(inline))
    // rollback: candidates beyond v1's corpus disappear without a rebuild
    IndexIO.setCurrent(spark, root, "v00001")
    val rolled = VectorIndex.topKCurrent(spark, root,
      emb.filter(col("vec_id") < 5), k = 5, nprobe = 2)
    assert(rolled.filter(col("cand_id") >= 100).count() == 0)
  }

  test("tombstone delete: no rebuild, candFilter-identical results, compact clears the set") {
    val p = java.nio.file.Files
      .createTempDirectory("graft-vindex-del").toString + "/idx"
    VectorIndex.write(emb, p, nCentroids = 8)
    val postingsDir = s"$p/postings/shard=0"
    val before = ShardFiles.snapshot(postingsDir)
    VectorIndex.delete(emb.filter(col("vec_id") % 7 === 0).select("vec_id"), p)
    // delete is a pure shard publish: existing posting files untouched
    assert(ShardFiles.snapshot(postingsDir) == before)
    def serve() = VectorIndex.topK(spark, p,
        emb.filter(col("vec_id") < 5), k = 5, nprobe = 2)
      .select("query_id", "rank", "cand_id", "cosine")
      .orderBy("query_id", "rank").collect()
    val served = serve()
    assert(served.nonEmpty && served.forall(_.getLong(2) % 7 != 0))
    // identical to excluding the same ids via candFilter (the
    // oracle-pinned position: after probing, before the re-rank)
    val viaFilter = VectorIndex.topK(spark, p,
        emb.filter(col("vec_id") < 5), k = 5, nprobe = 2,
        candFilter = Some(col("cand_id") % 7 =!= 0))
      .select("query_id", "rank", "cand_id", "cosine")
      .orderBy("query_id", "rank").collect()
    assert(served.sameElements(viaFilter))
    // compact physically drops the rows and clears the tombstone set;
    // serving is unchanged
    VectorIndex.compact(spark, p)
    assert(IndexIO.shardIds(spark, s"$p/deletes").isEmpty)
    assert(spark.read.parquet(s"$p/postings")
      .filter(col("cand_id") % 7 === 0).count() == 0)
    assert(serve().sameElements(served))
  }

  test("append equals rebuild and never touches existing shard files") {
    // initial corpus holds the nCentroids smallest ids, so the seed
    // centroids of the split build equal those of the full rebuild
    val first = emb.filter(col("vec_id") < 40)
    val rest = emb.filter(col("vec_id") >= 40)
    val pA = java.nio.file.Files.createTempDirectory("graft-vindex-app").toString + "/idx"
    val pB = java.nio.file.Files.createTempDirectory("graft-vindex-reb").toString + "/idx"
    VectorIndex.write(first, pA, nCentroids = 8)
    val before = ShardFiles.snapshot(s"$pA/postings/shard=0")
    assert(before.nonEmpty)
    VectorIndex.append(rest, pA)
    // the append wrote ONLY a new shard: shard=0's files are
    // byte-identical and the new rows live under shard=1
    assert(ShardFiles.snapshot(s"$pA/postings/shard=0") == before)
    assert(IndexIO.shardIds(spark, s"$pA/postings") == Seq(0, 1))
    assert(spark.read.parquet(s"$pA/postings")
      .filter(col("shard") === 1).select("cand_id").collect()
      .forall(_.getLong(0) >= 40))
    VectorIndex.write(emb, pB, nCentroids = 8)
    val qs = emb.filter(col("vec_id") < 5)
    val a = VectorIndex.topK(spark, pA, qs, k = 5, nprobe = 2)
      .orderBy("query_id", "rank").collect()
    val b = VectorIndex.topK(spark, pB, qs, k = 5, nprobe = 2)
      .orderBy("query_id", "rank").collect()
    assert(a.nonEmpty && a.sameElements(b))
    // the postings ROWS are identical to the rebuild's (layout aside)
    val cols = Seq("cid", "cand_id", "c_emb")
    val ta = spark.read.parquet(s"$pA/postings")
      .select(cols.map(col): _*).orderBy("cid", "cand_id").collect()
    val tb = spark.read.parquet(s"$pB/postings")
      .select(cols.map(col): _*).orderBy("cid", "cand_id").collect()
    assert(ta.sameElements(tb))
    // compact folds the two shards back to one; serving is unchanged
    VectorIndex.compact(spark, pA)
    assert(IndexIO.shardIds(spark, s"$pA/postings") == Seq(0))
    val c = VectorIndex.topK(spark, pA, qs, k = 5, nprobe = 2)
      .orderBy("query_id", "rank").collect()
    assert(c.sameElements(b))
  }

  test("a posting shard without its commit marker is invisible and reconciled away") {
    val first = emb.filter(col("vec_id") < 40)
    val rest = emb.filter(col("vec_id") >= 40)
    val pA = java.nio.file.Files
      .createTempDirectory("graft-vindex-marker").toString + "/idx"
    val pB = java.nio.file.Files
      .createTempDirectory("graft-vindex-marker-reb").toString + "/idx"
    VectorIndex.write(first, pA, nCentroids = 8)
    val qs = emb.filter(col("vec_id") < 5)
    def serve(p: String) = VectorIndex.topK(spark, p, qs, k = 5, nprobe = 2)
      .orderBy("query_id", "rank").collect().toSeq
    val baseline = serve(pA)
    // simulate the canonical crash: posting shard published, marker not
    VectorIndex.append(rest, pA)
    IndexIO.deleteDir(spark, s"$pA/commits/shard=1")
    assert(serve(pA) == baseline, "uncommitted shard must not serve")
    // the retry lands under a FRESH claimed id (ids are never reused —
    // the concurrent-append contract); the orphan stays reader-invisible
    VectorIndex.append(rest, pA)
    assert(IndexIO.committedIds(spark, pA) == Seq(0, 2),
      "retry must claim a fresh shard id, not reuse the orphan's")
    VectorIndex.write(emb, pB, nCentroids = 8)
    assert(serve(pA) == serve(pB))
    // no duplicate posting rows are SERVED (the on-disk orphan shard is
    // reader-invisible until compact reclaims it)
    assert(IndexIO.readCommitted(spark, pA, "postings",
        IndexIO.liveCommittedIds(spark, pA))
      .groupBy("cand_id").count().filter(col("count") > 1).count() == 0)
    VectorIndex.compact(spark, pA)
    assert(IndexIO.shardIds(spark, s"$pA/postings") == Seq(0))
    assert(spark.read.parquet(s"$pA/postings").groupBy("cand_id").count()
      .filter(col("count") > 1).count() == 0)
    assert(serve(pA) == serve(pB))
  }

  test("compactSmall folds small posting shards and the tombstone-heavy case") {
    val pA = java.nio.file.Files
      .createTempDirectory("graft-vindex-tiered").toString + "/idx"
    val pB = java.nio.file.Files
      .createTempDirectory("graft-vindex-tiered-reb").toString + "/idx"
    VectorIndex.write(emb.filter(col("vec_id") < 400), pA, nCentroids = 8)
    VectorIndex.append(emb.filter(col("vec_id") >= 400 && col("vec_id") < 430), pA)
    VectorIndex.append(emb.filter(col("vec_id") >= 430 && col("vec_id") < 460), pA)
    val bigBytes = IndexIO.dirBytes(spark, s"$pA/postings/shard=0")
    val before = ShardFiles.snapshot(s"$pA/postings/shard=0")
    val folded = VectorIndex.compactSmall(spark, pA, maxShardBytes = bigBytes - 1)
    assert(folded == Seq(1, 2), s"expected the two small shards, got $folded")
    assert(ShardFiles.snapshot(s"$pA/postings/shard=0") == before,
      "size-tiered compaction must not rewrite the big shard")
    assert(IndexIO.liveCommittedIds(spark, pA) == Seq(0, 3))
    val qs = emb.filter(col("vec_id") < 5)
    def serve(p: String) = VectorIndex.topK(spark, p, qs, k = 5, nprobe = 2)
      .orderBy("query_id", "rank").collect().toSeq
    // parity against an append-built twin over the same corpus and the
    // same stored centroids (a fresh write would train different ones)
    VectorIndex.write(emb.filter(col("vec_id") < 400), pB, nCentroids = 8)
    VectorIndex.append(emb.filter(col("vec_id") >= 400 && col("vec_id") < 460), pB)
    assert(serve(pA) == serve(pB), "folding must not change results")
    // tombstone-heavy: kill most of the folded shard's rows; it folds
    // even with a zero-byte threshold, physically dropping the dead rows
    import spark.implicits._
    VectorIndex.delete((400L until 455L).toDF("vec_id"), pA)
    val folded2 = VectorIndex.compactSmall(spark, pA, maxShardBytes = 0L,
      tombstoneFrac = 0.5)
    assert(folded2 == Seq(3), s"expected the tombstone-heavy shard, got $folded2")
    val live = IndexIO.liveCommittedIds(spark, pA)
    assert(live == Seq(0, 4))
    assert(IndexIO.readCommitted(spark, pA, "postings", Seq(4))
      .filter(col("cand_id") < 455).count() == 0,
      "tombstoned rows physically dropped from the folded shard")
  }

  test("compactSmall crash after the REPLACES commit: resurrected folded " +
      "posting shards are invisible and the next maintenance reclaims them") {
    val pA = java.nio.file.Files
      .createTempDirectory("graft-vindex-crash").toString + "/idx"
    VectorIndex.write(emb.filter(col("vec_id") < 400), pA, nCentroids = 8)
    VectorIndex.append(emb.filter(col("vec_id") >= 400 && col("vec_id") < 430), pA)
    VectorIndex.append(emb.filter(col("vec_id") >= 430 && col("vec_id") < 460), pA)
    def copyTree(src: java.io.File, dst: java.io.File): Unit =
      if (src.isDirectory) {
        dst.mkdirs()
        Option(src.listFiles).foreach(_.foreach(f =>
          copyTree(f, new java.io.File(dst, f.getName))))
      } else java.nio.file.Files.copy(src.toPath, dst.toPath)
    val stash = java.nio.file.Files.createTempDirectory("graft-v-stash").toString
    for (t <- Seq("postings", "commits"); k <- Seq(1, 2))
      copyTree(new java.io.File(s"$pA/$t/shard=$k"),
        new java.io.File(s"$stash/$t/shard=$k"))
    val bigBytes = IndexIO.dirBytes(spark, s"$pA/postings/shard=0")
    assert(VectorIndex.compactSmall(spark, pA, maxShardBytes = bigBytes - 1)
      == Seq(1, 2))
    val qs = emb.filter(col("vec_id") < 5)
    def serve() = VectorIndex.topK(spark, pA, qs, k = 5, nprobe = 2)
      .orderBy("query_id", "rank").collect().toSeq
    val healthy = serve()
    // crash reconstruction: REPLACES marker landed, physical deletes did
    // not — folded shards (markers AND posting shards) come back
    for (t <- Seq("postings", "commits"); k <- Seq(1, 2))
      copyTree(new java.io.File(s"$stash/$t/shard=$k"),
        new java.io.File(s"$pA/$t/shard=$k"))
    assert(IndexIO.liveCommittedIds(spark, pA) == Seq(0, 3))
    assert(serve() == healthy,
      "a reader must serve identically across the crash window")
    assert(VectorIndex.compactSmall(spark, pA, maxShardBytes = 1).isEmpty)
    assert(IndexIO.shardIds(spark, s"$pA/postings") == Seq(0, 3))
    assert(IndexIO.shardIds(spark, s"$pA/commits") == Seq(0, 3))
    assert(serve() == healthy)
  }

  test("append refuses a pre-marker sharded index; compact migrates it") {
    val p = java.nio.file.Files
      .createTempDirectory("graft-vindex-premarker").toString + "/idx"
    // emulate a round-7 index: sharded postings, no commits/ — build one
    // normally and strip its marker table
    VectorIndex.write(emb, p, nCentroids = 8)
    IndexIO.deleteDir(spark, s"$p/commits")
    val qs = emb.filter(col("vec_id") < 5)
    def serve() = VectorIndex.topK(spark, p, qs, k = 5, nprobe = 2)
      .orderBy("query_id", "rank").collect().toSeq
    val before = serve()
    assert(before.nonEmpty, "legacy index must stay readable")
    val ex = intercept[IllegalArgumentException] { VectorIndex.append(emb, p) }
    assert(ex.getMessage.contains("commit-marker"))
    VectorIndex.compact(spark, p)
    assert(IndexIO.committedIds(spark, p) == Seq(0))
    assert(serve() == before)
  }

  test("append rejects a batch whose embedding dimension differs") {
    val p = java.nio.file.Files
      .createTempDirectory("graft-vindex-dim").toString + "/idx"
    VectorIndex.write(emb.filter(col("vec_id") < 40), p, nCentroids = 8)
    // same schema, wrong width: such a batch would cosine to NULL
    // against every centroid and silently pile into the lowest cid
    val narrow = emb.filter(col("vec_id") >= 40)
      .withColumn("embedding", slice(col("embedding"), 1, 3))
    val ex = intercept[IllegalArgumentException] {
      VectorIndex.append(narrow, p)
    }
    assert(ex.getMessage.contains("dimension"))
    // the refused append left nothing behind: still one shard, servable
    assert(IndexIO.shardIds(spark, s"$p/postings") == Seq(0))
    assert(VectorIndex.topK(spark, p, emb.filter(col("vec_id") < 3),
      k = 3, nprobe = 2).collect().nonEmpty)
  }

  test("append refuses the pre-shard flat posting layout") {
    val p = java.nio.file.Files
      .createTempDirectory("graft-vindex-flat").toString + "/idx"
    VectorIndex.write(emb.filter(col("vec_id") < 40), p, nCentroids = 8)
    // emulate the pre-shard layout: move shard=0's files up to the root
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new org.apache.hadoop.fs.Path(s"$p/postings/shard=0"))
      .foreach { s =>
        fs.rename(s.getPath,
          new org.apache.hadoop.fs.Path(s"$p/postings/${s.getPath.getName}"))
      }
    fs.delete(new org.apache.hadoop.fs.Path(s"$p/postings/shard=0"), true)
    // a real pre-shard index predates the commits table too
    fs.delete(new org.apache.hadoop.fs.Path(s"$p/commits"), true)
    val ex = intercept[IllegalArgumentException] {
      VectorIndex.append(emb.filter(col("vec_id") >= 40), p)
    }
    assert(ex.getMessage.contains("flat layout"))
    // compact migrates the flat layout to sharded; serving unchanged
    val before = VectorIndex.topK(spark, p, emb.filter(col("vec_id") < 3),
      k = 3, nprobe = 2).orderBy("query_id", "rank").collect()
    VectorIndex.compact(spark, p)
    assert(IndexIO.shardIds(spark, s"$p/postings") == Seq(0))
    val after = VectorIndex.topK(spark, p, emb.filter(col("vec_id") < 3),
      k = 3, nprobe = 2).orderBy("query_id", "rank").collect()
    assert(after.sameElements(before))
  }

  test("trained centroids drop in: write(iterations=2) serves and stays deterministic") {
    VectorIndex.write(emb, path, nCentroids = 4, iterations = 2)
    val a = VectorIndex.topK(spark, path, emb.filter(col("vec_id") < 3),
      k = 3, nprobe = 1).orderBy("query_id", "rank").collect()
    val b = VectorIndex.topK(spark, path, emb.filter(col("vec_id") < 3),
      k = 3, nprobe = 1).orderBy("query_id", "rank").collect()
    assert(a.nonEmpty && a.sameElements(b))
  }
}
