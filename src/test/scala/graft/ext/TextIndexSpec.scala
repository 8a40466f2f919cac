package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The persisted inverted text index (ext/TextIndex): BM25 serving
  * parity with a from-scratch rebuild through append/delete/compact,
  * the commit-marker shard protocol (uncommitted shards invisible,
  * reconciled on the next write), and the untouched-files append
  * contract.
  */
class TextIndexSpec extends SparkSpec with EagerLease {

  import spark.implicits._

  private val K1 = 1.2
  private val B = 0.75
  private val Terms = Seq("fox", "spark", "jugs")

  private def corpus = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox likes another fox"),
    (2L, "pack my box with five dozen liquor jugs"),
    (3L, "spark plans and spark stages and spark tasks"),
    (4L, ""), // zero tokens: counts in n_docs, adds nothing to sum_dl
    (5L, "fox and jugs and spark all at once"),
    (6L, "nothing relevant here at all"),
    (7L, "spark spark spark spark fox")
  ).toDF("doc_id", "text")

  private def freshPath(tag: String) = java.nio.file.Files
    .createTempDirectory(s"graft-tindex-$tag").toString + "/idx"

  private def serve(path: String) =
    TextIndex.bm25TopK(spark, path, Terms, 10, K1, B)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq

  test("in-process BM25 fast serve is bit-equal to the forced job path") {
    val path = freshPath("fastserve")
    TextIndex.write(corpus, path)
    def jobServe() = {
      System.setProperty("graft.bm25.fast", "0")
      try serve(path) finally System.clearProperty("graft.bm25.fast")
    }
    // no tombstones: one bounded collect, zero other jobs
    assert(serve(path) == jobServe(), "fast serve diverged (clean index)")
    assert(serve(path).nonEmpty)
    // with tombstones: the driver-read delete set must subtract the
    // exact doc and length mass in BOTH routes
    TextIndex.delete(Seq(5L, 4L).toDF("doc_id"), path)
    val fast = serve(path)
    assert(fast == jobServe(), "fast serve diverged (tombstoned index)")
    assert(!fast.exists(_._1 == 5L), "tombstoned doc served")
    // appended shards sum into the same constants through both routes
    TextIndex.append(Seq((8L, "fox jugs fox")).toDF("doc_id", "text"), path)
    assert(serve(path) == jobServe(), "fast serve diverged (after append)")
    assert(serve(path).exists(_._1 == 8L))
  }

  test("served ranking matches expectations on a crafted corpus") {
    val path = freshPath("basic")
    TextIndex.write(corpus, path)
    val got = serve(path)
    // doc 5 holds all three probe terms; doc 7 is term-dense but
    // single-term; every returned doc must actually contain a term
    assert(got.map(_._1).contains(5L) && got.map(_._1).contains(7L))
    assert(!got.map(_._1).exists(Set(4L, 6L)), "no termless docs")
    // rank column is 1..n dense in score order
    assert(got.map(_._3) == (1 to got.length))
    val scores = got.map(_._2)
    assert(scores == scores.sorted.reverse)
  }

  test("append equals rebuild and never rewrites existing shard files") {
    val pApp = freshPath("app")
    val pReb = freshPath("reb")
    TextIndex.write(corpus.filter(col("doc_id") < 4), pApp)
    val before = Seq("postings", "doclens", "stats", "commits")
      .map(t => t -> ShardFiles.snapshot(s"$pApp/$t/shard=0")).toMap
    TextIndex.append(corpus.filter(col("doc_id") >= 4), pApp)
    val after = Seq("postings", "doclens", "stats", "commits")
      .map(t => t -> ShardFiles.snapshot(s"$pApp/$t/shard=0")).toMap
    assert(before == after, "append must not touch shard=0 files")
    TextIndex.write(corpus, pReb)
    assert(serve(pApp) == serve(pReb),
      "shard-summed df/stats must equal the rebuild's")
  }

  test("delete serves as if the docs never existed; compact makes it physical") {
    val pDel = freshPath("del")
    val pReb = freshPath("delreb")
    TextIndex.write(corpus, pDel)
    TextIndex.delete(Seq(1L, 7L).toDF("doc_id"), pDel)
    TextIndex.write(corpus.filter(!col("doc_id").isin(1L, 7L)), pReb)
    assert(serve(pDel) == serve(pReb),
      "tombstone serving must subtract doc count and length mass exactly")
    TextIndex.compact(spark, pDel)
    assert(serve(pDel) == serve(pReb), "compaction must not change results")
    assert(IndexIO.shardIds(spark, s"$pDel/postings") == Seq(0)
      && IndexIO.shardIds(spark, s"$pDel/deletes").isEmpty,
      "compact folds to one shard and clears tombstones")
    val stored = spark.read.parquet(s"$pDel/postings")
    assert(stored.filter(col("doc_id").isin(1L, 7L)).count() == 0,
      "tombstoned rows physically dropped")
  }

  test("a shard without its commit marker is invisible and reconciled away") {
    val path = freshPath("crash")
    TextIndex.write(corpus.filter(col("doc_id") < 4), path)
    val baseline = serve(path)
    // simulate a crash after the table-shard publishes but before the
    // marker: append, then remove the commit marker it wrote
    TextIndex.append(corpus.filter(col("doc_id") >= 4), path)
    IndexIO.deleteDir(spark, s"$path/commits/shard=1")
    assert(serve(path) == baseline, "uncommitted shard must not serve")
    // the retry lands under a FRESH claimed id (ids are never reused —
    // the concurrent-append contract); the orphan stays reader-invisible
    TextIndex.append(corpus.filter(col("doc_id") >= 4), path)
    assert(IndexIO.shardIds(spark, s"$path/postings") == Seq(0, 1, 2),
      "retry must claim a fresh shard id, not reuse the orphan's")
    assert(IndexIO.liveCommittedIds(spark, path) == Seq(0, 2))
    val pReb = freshPath("crashreb")
    TextIndex.write(corpus, pReb)
    assert(serve(path) == serve(pReb))
    // compact (the single-writer maintenance op) reclaims the orphan
    TextIndex.compact(spark, path)
    assert(IndexIO.shardIds(spark, s"$path/postings") == Seq(0))
    assert(serve(path) == serve(pReb))
  }

  test("positional index serves exact phrase hits through append, delete, compact") {
    val path = freshPath("pos")
    val phrase = Seq("quick", "brown", "fox")
    TextIndex.write(corpus.filter(col("doc_id") < 4), path, withPositions = true)
    TextIndex.append(corpus.filter(col("doc_id") >= 4), path)
    def hits() = TextIndex.phraseHits(spark, path, phrase)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    // docs 0 and 1 contain "quick brown fox" (anchor pos 2); the inline
    // corpus-scan form must agree exactly
    val inline = TextAnalysis.phraseSearch(
        TextAnalysis.positionalPostings(corpus, "doc_id", "text"), phrase)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(hits() == inline && inline.nonEmpty)
    TextIndex.delete(Seq(0L).toDF("doc_id"), path)
    assert(hits() == inline.filterNot(_._1 == 0L), "tombstoned doc must not hit")
    TextIndex.compact(spark, path)
    assert(hits() == inline.filterNot(_._1 == 0L), "compaction keeps results")
    assert(IndexIO.shardIds(spark, s"$path/positions") == Seq(0),
      "positions table folds with the rest")
  }

  test("batch serving equals per-query serving on both probe routes") {
    import spark.implicits._
    val path = freshPath("batch")
    TextIndex.write(corpus, path)
    val queries = Seq(
      10L -> "fox", 10L -> "jugs", 20L -> "spark", 20L -> "fox", 30L -> "jugs")
      .toDF("query_id", "term")
    def perQuery(qid: Long, terms: Seq[String]) =
      TextIndex.bm25TopK(spark, path, terms, 10, K1, B)
        .collect().map(r => (qid, r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val expected = perQuery(10L, Seq("fox", "jugs")) ++
      perQuery(20L, Seq("spark", "fox")) ++ perQuery(30L, Seq("jugs"))
    def batch(maxLiteralTerms: Int) =
      TextIndex.bm25TopKBatch(spark, path, queries, 10, K1, B, maxLiteralTerms)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSeq
    // literal-IN route (terms under the cap) and the broadcast
    // semi-join route (cap forced below the term count) must agree
    // with per-query serving exactly
    assert(batch(maxLiteralTerms = 10000) == expected)
    assert(batch(maxLiteralTerms = 1) == expected)
  }

  test("every serve during concurrent appends returns a committed-boundary answer") {
    import org.apache.spark.sql.functions.col
    val path = freshPath("race")
    // boundary answers: serving after k committed batches must equal a
    // rebuild over the first k prefixes (append ≡ rebuild is pinned
    // above) — so the set of LEGAL reader observations is exactly the
    // per-prefix rebuild answers
    val prefixes = (1 to 7).map(hi => corpus.filter(col("doc_id") < hi))
    val legal = prefixes.zipWithIndex.map { case (d, i) =>
      val p = freshPath(s"race-b$i")
      TextIndex.write(d, p)
      serve(p)
    }.toSet
    TextIndex.write(prefixes.head, path)
    val pool = java.util.concurrent.Executors.newSingleThreadExecutor()
    val appender = pool.submit(new java.util.concurrent.Callable[Unit] {
      def call(): Unit =
        (1 until 7).foreach(hi => TextIndex.append(
          corpus.filter(col("doc_id") === hi.toLong), path))
    })
    try {
      while (!appender.isDone) {
        val got = serve(path)
        assert(legal.contains(got),
          s"reader observed a non-boundary (partially appended) answer: $got")
      }
      appender.get() // surface appender-side failures
      assert(serve(path) == serve({ // final state ≡ full rebuild
        val p = freshPath("race-full")
        TextIndex.write(corpus.filter(col("doc_id") < 7), p); p
      }))
    } finally pool.shutdownNow()
  }

  test("two concurrent appenders commit distinct shards; serve equals sequential") {
    val path = freshPath("writers")
    val pSeq = freshPath("writers-seq")
    TextIndex.write(corpus.filter(col("doc_id") < 4), path)
    val batchA = corpus.filter(col("doc_id") >= 4 && col("doc_id") < 6)
    val batchB = corpus.filter(col("doc_id") >= 6)
    // both appenders released simultaneously: they race the shard-id
    // claim; exactly one wins each id and the loser retries at the next
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    def task(b: org.apache.spark.sql.DataFrame) =
      pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = { barrier.await(); TextIndex.append(b, path) }
      })
    val (fa, fb) = (task(batchA), task(batchB))
    try { fa.get(); fb.get() } finally pool.shutdownNow()
    // both batches committed under DISTINCT fresh ids — neither clobbered
    // or double-committed the other
    assert(IndexIO.liveCommittedIds(spark, path).sorted == Seq(0, 1, 2))
    TextIndex.write(corpus.filter(col("doc_id") < 4), pSeq)
    TextIndex.append(batchA, pSeq)
    TextIndex.append(batchB, pSeq)
    assert(serve(path) == serve(pSeq),
      "concurrent appends must serve exactly like a sequential order")
  }

  test("compactSmall folds only small shards and leaves the big one byte-identical") {
    val path = freshPath("tiered")
    val pReb = freshPath("tiered-reb")
    // shard 0 carries most of the corpus (big); two one-doc appends
    // leave small shards 1 and 2
    TextIndex.write(corpus.filter(col("doc_id") < 6), path)
    TextIndex.append(corpus.filter(col("doc_id") === 6), path)
    TextIndex.append(corpus.filter(col("doc_id") === 7), path)
    val bigBytes = Seq("postings", "doclens", "stats")
      .map(t => IndexIO.dirBytes(spark, s"$path/$t/shard=0")).sum
    val before = Seq("postings", "doclens", "stats", "commits")
      .map(t => t -> ShardFiles.snapshot(s"$path/$t/shard=0")).toMap
    // threshold below the big shard's size: only 1 and 2 qualify
    val folded = TextIndex.compactSmall(spark, path, maxShardBytes = bigBytes - 1)
    assert(folded == Seq(1, 2), s"expected to fold the two small shards, got $folded")
    assert(Seq("postings", "doclens", "stats", "commits")
      .map(t => t -> ShardFiles.snapshot(s"$path/$t/shard=0")).toMap == before,
      "size-tiered compaction must not rewrite the big shard")
    // the fold set is superseded atomically: live ids are {0, merged}
    assert(IndexIO.liveCommittedIds(spark, path) == Seq(0, 3))
    assert(IndexIO.shardIds(spark, s"$path/postings") == Seq(0, 3),
      "folded shards physically reclaimed")
    TextIndex.write(corpus, pReb)
    assert(serve(path) == serve(pReb), "folding must not change results")
    // nothing left under the threshold worth folding twice
    assert(TextIndex.compactSmall(spark, path, maxShardBytes = 1).isEmpty)
  }

  test("compactSmall folds a tombstone-heavy shard regardless of size and drops its dead docs") {
    val path = freshPath("tombheavy")
    val pReb = freshPath("tombheavy-reb")
    TextIndex.write(corpus.filter(col("doc_id") < 4), path)
    TextIndex.append(corpus.filter(col("doc_id") >= 4), path)
    // tombstone 3 of shard 1's 4 docs (75% dead) — folds even with a
    // zero-byte size threshold
    TextIndex.delete(Seq(4L, 5L, 6L).toDF("doc_id"), path)
    val folded = TextIndex.compactSmall(spark, path, maxShardBytes = 0L,
      tombstoneFrac = 0.5)
    assert(folded == Seq(1), s"expected the tombstone-heavy shard, got $folded")
    TextIndex.write(corpus.filter(!col("doc_id").isin(4L, 5L, 6L)), pReb)
    assert(serve(path) == serve(pReb))
    // the folded shard's dead docs are physically gone; the tombstone
    // set itself only clears on a full compact
    val foldedShard = IndexIO.liveCommittedIds(spark, path).filterNot(_ == 0)
    assert(foldedShard.length == 1)
    assert(spark.read.parquet(s"$path/doclens")
      .filter(col("shard") === foldedShard.head)
      .filter(col("doc_id").isin(4L, 5L, 6L)).count() == 0,
      "tombstoned docs physically dropped from the folded shard")
    assert(IndexIO.shardIds(spark, s"$path/deletes").nonEmpty)
  }

  test("compactSmall crash AFTER the REPLACES commit: resurrected folded " +
      "shards stay invisible to serving and the next maintenance reclaims them") {
    val path = freshPath("tiered-crash")
    TextIndex.write(corpus.filter(col("doc_id") < 6), path)
    TextIndex.append(corpus.filter(col("doc_id") === 6), path)
    TextIndex.append(corpus.filter(col("doc_id") === 7), path)
    // snapshot the soon-to-fold shards' dirs so the post-commit cleanup
    // crash (REPLACES marker landed, physical deletes did not) can be
    // reconstructed exactly
    def copyTree(src: java.io.File, dst: java.io.File): Unit =
      if (src.isDirectory) {
        dst.mkdirs()
        Option(src.listFiles).foreach(_.foreach(f =>
          copyTree(f, new java.io.File(dst, f.getName))))
      } else java.nio.file.Files.copy(src.toPath, dst.toPath)
    val stash = java.nio.file.Files.createTempDirectory("graft-crash-stash").toString
    val tables = Seq("postings", "doclens", "stats", "commits")
    for (t <- tables; k <- Seq(1, 2))
      copyTree(new java.io.File(s"$path/$t/shard=$k"),
        new java.io.File(s"$stash/$t/shard=$k"))
    val bigBytes = Seq("postings", "doclens", "stats")
      .map(t => IndexIO.dirBytes(spark, s"$path/$t/shard=0")).sum
    val folded = TextIndex.compactSmall(spark, path, maxShardBytes = bigBytes - 1)
    assert(folded == Seq(1, 2))
    val healthy = serve(path)
    // crash reconstruction: the folded shards (markers AND table
    // shards) come back from the stash — exactly the state a crash
    // between commitShard(replaces) and the deletes leaves behind
    for (t <- tables; k <- Seq(1, 2))
      copyTree(new java.io.File(s"$stash/$t/shard=$k"),
        new java.io.File(s"$path/$t/shard=$k"))
    // 1. readers never see the superseded shards: the REPLACES marker,
    // not their physical absence, is what makes them dead
    assert(IndexIO.liveCommittedIds(spark, path) == Seq(0, 3))
    assert(serve(path) == healthy,
      "a reader must serve identically across the crash window")
    // 2. the next maintenance pass reclaims the garbage for good
    assert(TextIndex.compactSmall(spark, path, maxShardBytes = 1).isEmpty)
    assert(IndexIO.shardIds(spark, s"$path/postings") == Seq(0, 3),
      "reconcile must physically drop the resurrected folded shards")
    assert(IndexIO.shardIds(spark, s"$path/commits") == Seq(0, 3))
    assert(serve(path) == healthy)
  }

  test("compact sweeps crashed-build staging leftovers, asides survive") {
    val path = freshPath("gc")
    TextIndex.write(corpus, path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // plant every leftover class a crash can leave: a sibling full-build
    // staging, a hidden append staging under the root, a hidden shard
    // staging under a table dir — and a recovery aside that must SURVIVE
    val leftovers = Seq(
      s"$path-staging-deadbeef",
      s"$path/_append-staging-deadbeef",
      s"$path/postings/_shard-staging-deadbeef")
    val aside = s"$path-old-deadbeef"
    (leftovers :+ aside).foreach(d =>
      fs.mkdirs(new org.apache.hadoop.fs.Path(d)))
    val before = serve(path)
    TextIndex.compact(spark, path)
    leftovers.foreach(d => assert(
      !fs.exists(new org.apache.hadoop.fs.Path(d)), s"$d not swept"))
    assert(fs.exists(new org.apache.hadoop.fs.Path(aside)),
      "recovery aside must not be garbage-collected")
    assert(serve(path) == before, "gc must not change results")
  }

  test("versioned publish: pointer flip, immutable v1, rollback") {
    val root = freshPath("ver")
    val v1 = TextIndex.writeVersioned(corpus.filter(col("doc_id") < 4), root)
    assert(v1.endsWith("/v00001"))
    val served1 = TextIndex.bm25TopKCurrent(spark, root, Terms, 10, K1, B)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(served1 == serve(v1))
    val v1Files = Seq("postings", "doclens", "stats", "commits")
      .map(t => t -> ShardFiles.snapshot(s"$v1/$t/shard=0")).toMap
    // v2 full rebuild: CURRENT flips, v1 stays byte-identical
    val v2 = TextIndex.writeVersioned(corpus, root)
    assert(v2.endsWith("/v00002"))
    val served2 = TextIndex.bm25TopKCurrent(spark, root, Terms, 10, K1, B)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(served2 == serve(v2) && served2 != served1)
    assert(Seq("postings", "doclens", "stats", "commits")
      .map(t => t -> ShardFiles.snapshot(s"$v1/$t/shard=0")).toMap == v1Files,
      "published versions are immutable")
    // rollback is a pointer flip, not a rebuild
    IndexIO.setCurrent(spark, root, "v00001")
    assert(TextIndex.bm25TopKCurrent(spark, root, Terms, 10, K1, B)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq == served1)
  }

  test("an index written without positions refuses phrase serving loudly") {
    val path = freshPath("nopos")
    TextIndex.write(corpus, path)
    val e = intercept[IllegalArgumentException] {
      TextIndex.phraseHits(spark, path, Seq("fox"))
    }
    assert(e.getMessage.contains("without positions"))
  }

  test("zero-token docs count toward the corpus constants") {
    val pWith = freshPath("empty")
    val pWithout = freshPath("noempty")
    TextIndex.write(corpus, pWith)
    TextIndex.write(corpus.filter(col("doc_id") =!= 4L), pWithout)
    // doc 4 changes n_docs (hence avgdl, hence every tfn) — the two
    // indexes must NOT serve identical score_micro values
    val a = serve(pWith).map(t => t._1 -> t._2).toMap
    val b = serve(pWithout).map(t => t._1 -> t._2).toMap
    assert(a.keySet == b.keySet && a != b,
      "corpus constants must include termless docs")
  }
}
