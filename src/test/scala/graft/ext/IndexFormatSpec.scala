package graft.ext

import graft.SparkSpec

/** Round-15 durability contract: the on-disk FORMAT VERSION gate
  * ([[IndexIO.CurrentFormat]] / `_FORMAT`). A persisted index outlives
  * any one binary; when a future engine bumps the layout format, THIS
  * binary must refuse both to serve from and to mutate that index —
  * loudly, at the protocol chokepoints (committedIds / liveCommittedIds
  * for reads, claimShardId / acquireMaintLock for writes) — while every
  * index this binary writes carries its stamp atomically (the `_FORMAT`
  * file rides the publish rename, so a published index is never
  * observable without it) and every LEGACY pre-stamp index keeps
  * reading exactly as before (missing stamp = format 1 implied).
  */
class IndexFormatSpec extends SparkSpec {

  import spark.implicits._

  private val K1 = 1.2
  private val B = 0.75
  private val Terms = Seq("fox", "spark")

  private def fresh(tag: String) = java.nio.file.Files
    .createTempDirectory(s"graft-fmt-$tag").toString + "/idx"

  private def docs(ids: Seq[Long]) = ids
    .map(i => (i, s"fox spark doc$i tok${i % 3}")).toDF("doc_id", "text")

  private def writeFormat(root: String, content: String): Unit = {
    val p = java.nio.file.Paths.get(root, "_FORMAT")
    java.nio.file.Files.write(p, content.getBytes("UTF-8"))
    // drop the local ChecksumFileSystem's sidecar — the hand-edit
    // simulates a DIFFERENT (newer) writer, whose own crc would be
    // consistent with its stamp
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(root, "._FORMAT.crc"))
    ()
  }

  test("publish stamps _FORMAT with the current version; stamped index serves") {
    val path = fresh("stamp")
    TextIndex.write(docs(0L until 8L), path)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(path, "_FORMAT")))
    assert(IndexIO.formatOf(spark, path).contains(IndexIO.CurrentFormat))
    assert(TextIndex.bm25TopK(spark, path, Terms, 5, K1, B).count() === 5)
  }

  test("versioned publish stamps _FORMAT inside the version dir") {
    val root = fresh("stamp-v")
    TextIndex.writeVersioned(docs(0L until 8L), root)
    val resolved = IndexIO.resolveCurrent(spark, root)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(resolved, "_FORMAT")))
    assert(IndexIO.formatOf(spark, resolved).contains(IndexIO.CurrentFormat))
    assert(TextIndex.bm25TopKCurrent(spark, root, Terms, 5, K1, B).count() === 5)
  }

  test("a FUTURE-format index refuses to serve, append, or be maintained") {
    val path = fresh("future")
    TextIndex.write(docs(0L until 8L), path)
    writeFormat(path, s"graft.index.format=${IndexIO.CurrentFormat + 1}\n")

    val read = intercept[java.io.IOException] {
      TextIndex.bm25TopK(spark, path, Terms, 5, K1, B).count()
    }
    assert(read.getMessage.contains(s"format ${IndexIO.CurrentFormat + 1}"))
    assert(read.getMessage.contains("newer"))

    val append = intercept[java.io.IOException] {
      TextIndex.append(docs(100L until 104L), path)
    }
    assert(append.getMessage.contains("newer"))

    val maint = intercept[java.io.IOException] {
      IndexIO.acquireMaintLock(spark, path)
    }
    assert(maint.getMessage.contains("newer"))
  }

  test("a FUTURE-format index refuses tombstone deletes (all three kinds)") {
    // delete() publishes an id shard WITHOUT claiming a shard id, so it
    // needs its own gate (publishIdShard): a takedown against a newer
    // layout would appear to succeed while the newer engine ignores or
    // misreads the tombstone shard
    val t = fresh("del-text"); val m = fresh("del-mh"); val v = fresh("del-ivf")
    TextIndex.write(docs(0L until 8L), t)
    MinHashIndex.write(Dedup.docTokens(docs(0L until 8L), "doc_id", "text"),
      m, numHashes = 8, rowsPerBand = 2)
    VectorIndex.write(
      (0L until 8L).map(i => (i, Array.tabulate(4)(d => (i + d).toFloat)))
        .toDF("vec_id", "embedding"), v, nCentroids = 2)
    for (p <- Seq(t, m, v))
      writeFormat(p, s"graft.index.format=${IndexIO.CurrentFormat + 1}\n")

    val et = intercept[java.io.IOException] {
      TextIndex.delete(Seq(1L).toDF("doc_id"), t)
    }
    assert(et.getMessage.contains("newer"))
    val em = intercept[java.io.IOException] {
      MinHashIndex.delete(Seq(1L).toDF("id"), m)
    }
    assert(em.getMessage.contains("newer"))
    val ev = intercept[java.io.IOException] {
      VectorIndex.delete(Seq(1L).toDF("vec_id"), v)
    }
    assert(ev.getMessage.contains("newer"))
    // and no tombstone shard landed anywhere
    for (p <- Seq(t, m, v))
      assert(IndexIO.shardIds(spark, s"$p/deletes").isEmpty, p)
  }

  test("overflow-sized digits in _FORMAT land in the corrupt contract") {
    val path = fresh("overflow")
    TextIndex.write(docs(0L until 8L), path)
    writeFormat(path, "graft.index.format=99999999999999999999\n")
    val e = intercept[java.io.IOException] {
      TextIndex.bm25TopK(spark, path, Terms, 5, K1, B).count()
    }
    assert(e.getMessage.contains("corrupt"))
  }

  test("a future-format VERSION behind CURRENT refuses to serve") {
    val root = fresh("future-v")
    TextIndex.writeVersioned(docs(0L until 8L), root)
    val resolved = IndexIO.resolveCurrent(spark, root)
    writeFormat(resolved, s"graft.index.format=${IndexIO.CurrentFormat + 7}\n")
    val e = intercept[java.io.IOException] {
      TextIndex.bm25TopKCurrent(spark, root, Terms, 5, K1, B).count()
    }
    assert(e.getMessage.contains(s"format ${IndexIO.CurrentFormat + 7}"))
  }

  test("a LEGACY pre-stamp index (no _FORMAT) reads and appends as before") {
    val path = fresh("legacy")
    TextIndex.write(docs(0L until 8L), path)
    java.nio.file.Files.delete(java.nio.file.Paths.get(path, "_FORMAT"))
    assert(IndexIO.formatOf(spark, path).isEmpty)
    assert(TextIndex.bm25TopK(spark, path, Terms, 5, K1, B).count() === 5)
    TextIndex.append(docs(100L until 104L), path)
    // the append mutated the root in place — by contract it does NOT
    // retro-stamp a live legacy root
    assert(IndexIO.formatOf(spark, path).isEmpty)
    assert(TextIndex.bm25TopK(spark, path, Seq("doc100"), 1, K1, B).count() === 1)
  }

  test("a corrupt _FORMAT fails loudly rather than serving") {
    val path = fresh("corrupt")
    TextIndex.write(docs(0L until 8L), path)
    writeFormat(path, "not a format line\n")
    val e = intercept[java.io.IOException] {
      TextIndex.bm25TopK(spark, path, Terms, 5, K1, B).count()
    }
    assert(e.getMessage.contains("corrupt"))
  }

  // ---- migration rehearsal, parameterized over ALL THREE families
  // (VERDICT r16 task 2: the runbook told the operator to run "the
  // MinHash/Vector twin" of TextIndex.compact — now a test executes it)

  private def emb(ids: Seq[Long]) = ids
    .map(i => (i, Array.tabulate(4)(d => (i + d).toFloat)))
    .toDF("vec_id", "embedding")

  private case class Family(
      name: String,
      write: String => Unit,
      serve: String => Long,
      append: String => Unit,
      migrate: String => Unit)

  private lazy val families = Seq(
    Family("TextIndex",
      p => TextIndex.write(docs(0L until 8L), p),
      p => TextIndex.bm25TopK(spark, p, Terms, 5, K1, B).count(),
      p => TextIndex.append(docs(100L until 104L), p),
      p => TextIndex.compact(spark, p, partitions = 1)),
    Family("MinHashIndex",
      p => MinHashIndex.write(
        Dedup.docTokens(docs(0L until 8L), "doc_id", "text"), p,
        numHashes = 8, rowsPerBand = 2),
      p => MinHashIndex.pairs(spark, p, numHashes = 8).count(),
      p => MinHashIndex.append(
        Dedup.docTokens(docs(100L until 104L), "doc_id", "text"), p,
        numHashes = 8, rowsPerBand = 2),
      p => MinHashIndex.compact(spark, p, partitions = 1)),
    Family("VectorIndex",
      p => VectorIndex.write(emb(0L until 8L), p, nCentroids = 2),
      p => VectorIndex.topK(spark, p, emb(0L until 2L), k = 3, nprobe = 2).count(),
      p => VectorIndex.append(emb(100L until 104L), p),
      p => VectorIndex.compact(spark, p, partitions = 1)))

  for (f <- families)
    test(s"format bump rehearsal [${f.name}]: a v2 engine migrates a v1 root; this binary then refuses") {
      // VERDICT r15 task 3 — the path an operator executes under
      // pressure, not just the refusal. The "v2 engine" is this binary
      // with the format seam set (writes AND reads format 2).
      val path = fresh(s"bump-${f.name}")
      f.write(path) // a v1 root
      assert(IndexIO.formatOf(spark, path).contains(1))
      val n0 = f.serve(path)
      assert(n0 > 0, s"${f.name} fixture must serve rows")
      IndexIO.formatOverride = Some(2)
      try {
        // forward-compatible read: the newer engine serves the v1 root as-is
        assert(f.serve(path) === n0)
        // MIGRATION = full compact: rewrite + republish stamps the new
        // format behind the same aside-protected rename
        f.migrate(path)
        assert(IndexIO.formatOf(spark, path).contains(2),
          "migration must restamp the root at the writer's format")
        assert(f.serve(path) === n0)
      } finally IndexIO.formatOverride = None
      // the v1 binary now refuses the migrated root, loudly, on read AND mutate
      IndexIO.resetCachesForTest() // a different binary = a different process
      val read = intercept[java.io.IOException] { f.serve(path) }
      assert(read.getMessage.contains("format 2") && read.getMessage.contains("newer"))
      val append = intercept[java.io.IOException] { f.append(path) }
      assert(append.getMessage.contains("newer"))
    }

  for (f <- families)
    test(s"crash mid-migration [${f.name}] never leaves a torn root: some binary serves it whole") {
      val expected = { // the family's steady serve count (crash-free root)
        val p = fresh(s"bump-crash-ref-${f.name}")
        f.write(p); f.serve(p)
      }
      var k = 0
      var fired = true
      while (fired && k < 12) {
        val path = fresh(s"bump-crash-${f.name}-$k")
        f.write(path)
        IndexIO.formatOverride = Some(2)
        fired =
          try CrashSeam.crashedAt(k) { f.migrate(path) }
          finally IndexIO.formatOverride = None
        if (fired) {
          IndexIO.resetCachesForTest() // crash = process death: caches gone
          val fmt =
            try IndexIO.formatOf(spark, path)
            catch { case _: java.io.IOException => None }
          fmt match {
            case Some(1) => // not yet swapped: the v1 binary serves it whole
              assert(f.serve(path) === expected,
                s"kill point $k: v1 root no longer serves")
            case Some(2) => // swapped: the v2 binary serves it whole
              IndexIO.formatOverride = Some(2)
              try assert(f.serve(path) === expected,
                s"kill point $k: migrated root no longer serves")
              finally IndexIO.formatOverride = None
            case other =>
              // the publish died between its two renames: the root is
              // ABSENT (loud, not torn) and the previous index is intact
              // under the dest-old-* recovery aside
              val parent = java.nio.file.Paths.get(path).getParent
              val name = java.nio.file.Paths.get(path).getFileName.toString
              val aside = java.nio.file.Files.list(parent).iterator()
              var found = false
              while (aside.hasNext) {
                val p = aside.next()
                if (p.getFileName.toString.startsWith(s"$name-old-")) found = true
              }
              assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(path)) && found,
                s"kill point $k: torn state — format=$other, recovery aside present=$found")
          }
        }
        k += 1
      }
      assert(k > 2, s"crash seam never fired across the ${f.name} migration path")
    }

  test("all three index kinds stamp at publish") {
    val t = fresh("kind-text"); val m = fresh("kind-mh"); val v = fresh("kind-ivf")
    TextIndex.write(docs(0L until 8L), t)
    MinHashIndex.write(Dedup.docTokens(docs(0L until 8L), "doc_id", "text"),
      m, numHashes = 8, rowsPerBand = 2)
    VectorIndex.write(
      (0L until 8L).map(i => (i, Array.tabulate(4)(d => (i + d).toFloat)))
        .toDF("vec_id", "embedding"), v, nCentroids = 2)
    for (p <- Seq(t, m, v))
      assert(IndexIO.formatOf(spark, p).contains(IndexIO.CurrentFormat), p)
  }
}
