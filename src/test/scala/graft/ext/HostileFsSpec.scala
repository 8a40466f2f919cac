package graft.ext

import graft.SparkSpec
import org.apache.hadoop.fs.{FileStatus, FileUtil, Path, RawLocalFileSystem}

/** Local filesystem re-schemed as `s3a` with OBJECT-STORE rename
  * semantics: rename is copy+delete and an existing destination merges
  * instead of failing, so two "exclusive" renames both report success —
  * the exact hazard [[IndexIO.NonAtomicRenameSchemes]] guards against.
  * Hadoop instantiates filesystems reflectively: top-level class,
  * no-arg constructor. */
class MockCopyDeleteFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "s3a"
  override def getUri: java.net.URI = java.net.URI.create("s3a:///")
  override def rename(src: Path, dst: Path): Boolean = {
    val target =
      if (exists(dst) && getFileStatus(dst).isDirectory)
        new Path(dst, src.getName)
      else dst
    FileUtil.copy(this, src, this, target, true, getConf)
  }
}

/** Local filesystem re-schemed as `mockdfs`: ATOMIC local rename but NO
  * AbstractFileSystem (FileContext) binding — the vendor-connector
  * shape where [[IndexIO]] must run its no-FileContext fallbacks
  * (exists-then-rename acquisition, versioned-HB heartbeat replace).
  * [[MockDfsFileSystem.lies]] makes `exists()` deny the maintlock dir
  * N times, deterministically forcing the fallback's check-then-act
  * window (a racer that checked before the holder's rename landed). */
class MockDfsFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "mockdfs"
  override def getUri: java.net.URI = java.net.URI.create("mockdfs:///")
  override def exists(p: Path): Boolean =
    if (p.getName == "maintlock" && MockDfsFileSystem.lies.get() > 0) {
      MockDfsFileSystem.lies.decrementAndGet()
      false
    } else super.exists(p)
}
object MockDfsFileSystem {
  val lies = new java.util.concurrent.atomic.AtomicInteger(0)
}

/** Local filesystem re-schemed as `mockmt`: every DIRECTORY status
  * reports the CURRENT time as its modification time — the
  * object-store behavior (mtime refreshed by listings/child writes)
  * that motivated making file CONTENT the lease-clock authority. */
class MockMtimeRefreshFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "mockmt"
  override def getUri: java.net.URI = java.net.URI.create("mockmt:///")
  override def getFileStatus(p: Path): FileStatus = {
    val st = super.getFileStatus(p)
    if (!st.isDirectory) st
    // the 6-arg ctor never touches permissions (RawLocal loads them
    // lazily via java.io.File(uri), which rejects non-file schemes)
    else new FileStatus(st.getLen, true, 1, st.getBlockSize,
      System.currentTimeMillis(), st.getPath)
  }
}

/** Contract tests for the maintenance lock on HOSTILE filesystems
  * (VERDICT r13 task 4): the round-13 scheme guard and the round-13/14
  * no-FileContext fallbacks were doc+guard only — these mocks make the
  * three hostile behaviors real and race the protocol against them. */
class HostileFsSpec extends SparkSpec {

  private val schemes = Seq("s3a", "mockdfs", "mockmt")

  private lazy val conf = {
    val c = spark.sparkContext.hadoopConfiguration
    c.set("fs.s3a.impl", classOf[MockCopyDeleteFileSystem].getName)
    c.set("fs.mockdfs.impl", classOf[MockDfsFileSystem].getName)
    c.set("fs.mockmt.impl", classOf[MockMtimeRefreshFileSystem].getName)
    c
  }

  /** The session (and Hadoop's FileSystem cache) outlive this suite:
    * evict the mock instances and unset the impl keys so no other
    * suite can silently resolve s3a/mockdfs/mockmt to these mocks. */
  override def afterAll(): Unit = {
    val c = spark.sparkContext.hadoopConfiguration
    schemes.foreach { s =>
      try org.apache.hadoop.fs.FileSystem
        .get(java.net.URI.create(s"$s:///"), c).close()
      catch { case _: Exception => () }
      c.unset(s"fs.$s.impl")
    }
    super.afterAll()
  }
  private def freshDir(tag: String): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"graft-hostile-$tag").toFile
    d.getAbsolutePath
  }
  private def lockOf(root: String) = new Path(s"$root/maintlock")
  private def claimOf(root: String) = new Path(s"$root/maintlock/CLAIM")
  private def writeClaim(fs: org.apache.hadoop.fs.FileSystem, root: String,
                         nonce: String, ts: Long): Unit = {
    fs.mkdirs(lockOf(root))
    val f = fs.create(claimOf(root), true)
    try f.writeBytes(s"$nonce\n$ts\n") finally f.close()
  }

  // ---- (a) copy+delete rename (object-store semantics) ----

  test("(a) copy-merge rename: two exclusive renames both succeed — the hazard is real") {
    val root = s"s3a:${freshDir("s3a")}"
    val fs = new Path(root).getFileSystem(conf)
    for (n <- Seq("a", "b")) {
      fs.mkdirs(new Path(s"$root/stage-$n"))
      val f = fs.create(new Path(s"$root/stage-$n/CLAIM"), false)
      try f.writeBytes(s"racer-$n\n") finally f.close()
    }
    // on a copy+delete store, the second "dest-must-not-exist" rename
    // does NOT fail: it merges into the existing directory and reports
    // success — exactly why no rename-based lock can work here
    assert(fs.rename(new Path(s"$root/stage-a"), new Path(s"$root/lock")))
    assert(fs.rename(new Path(s"$root/stage-b"), new Path(s"$root/lock")),
      "copy-merge semantics: the losing racer's rename also reports success")
    assert(fs.exists(new Path(s"$root/lock/stage-b/CLAIM")),
      "the loser's payload nests inside the winner's dir")
  }

  test("(a) the scheme guard fires on a MOUNTED copy+delete filesystem") {
    val root = s"s3a:${freshDir("s3a-guard")}"
    val fs = new Path(root).getFileSystem(conf)
    fs.mkdirs(new Path(root)) // the store is live, the guard still refuses
    val e = intercept[java.io.IOException](IndexIO.acquireMaintLock(spark, root))
    assert(e.getMessage.contains("copy+delete"), s"guard message: $e")
    // explicit opt-out degrades to single-maintainer-by-contract (no lock)
    System.setProperty("graft.maint.lock.allowNonAtomic", "1")
    try assert(IndexIO.acquireMaintLock(spark, root) == "")
    finally System.clearProperty("graft.maint.lock.allowNonAtomic")
  }

  // ---- (b) atomic rename, no AbstractFileSystem binding ----

  test("(b) two racing acquirers through the check-then-act window: never both hold") {
    val root = s"mockdfs:${freshDir("race")}"
    val fs = new Path(root).getFileSystem(conf)
    fs.mkdirs(new Path(root))
    val a = IndexIO.acquireMaintLock(spark, root)
    assert(a.nonEmpty)
    // B races through the exact window the fallback leaves open: its
    // exists() checks ran before A's rename landed (the mock lies
    // twice: the top-of-loop check and renameExclusive's check)
    MockDfsFileSystem.lies.set(2)
    val e = intercept[java.io.IOException] {
      try IndexIO.acquireMaintLock(spark, root)
      finally MockDfsFileSystem.lies.set(0)
    }
    assert(e.getMessage.contains("maintenance already running"),
      s"B must lose via the nonce re-read, not double-hold: $e")
    // A's ownership is intact through the whole race
    assert(IndexIO.holdsMaintLock(fs, lockOf(root), a),
      "the live holder keeps the lock after the racer loses")
    // and A's release still works (any racer garbage nested in the
    // lock dir rides out with the recursive delete)
    IndexIO.releaseMaintLock(spark, root, a)
    assert(!fs.exists(lockOf(root)), "release removes the lock")
  }

  test("(b) heartbeat falls back to versioned HB files; the lease never reads heartbeat-less") {
    val root = s"mockdfs:${freshDir("hb")}"
    val fs = new Path(root).getFileSystem(conf)
    fs.mkdirs(new Path(root))
    val nonce = IndexIO.acquireMaintLock(spark, root)
    IndexIO.heartbeatMaintLock(spark, root, nonce)
    val hbs1 = fs.listStatus(lockOf(root))
      .map(_.getPath.getName).filter(_.startsWith("HB"))
    assert(hbs1.length == 1 && hbs1(0).startsWith("HB-"),
      s"no-FileContext heartbeat lands a VERSIONED file: ${hbs1.toSeq}")
    Thread.sleep(5) // distinct mtimes: the keep-newest prune sorts on them
    IndexIO.heartbeatMaintLock(spark, root, nonce)
    val hbs2 = fs.listStatus(lockOf(root))
      .map(_.getPath.getName).filter(_.startsWith("HB"))
    assert(hbs2.length == 2 && hbs2.contains(hbs1(0)),
      s"the predecessor heartbeat survives one generation (a reader " +
        s"that listed it can still read it): ${hbs2.toSeq}")
    Thread.sleep(5)
    IndexIO.heartbeatMaintLock(spark, root, nonce)
    val hbs3 = fs.listStatus(lockOf(root))
      .map(_.getPath.getName).filter(_.startsWith("HB"))
    assert(hbs3.length == 2 && !hbs3.contains(hbs1(0)),
      s"the third heartbeat prunes the oldest file — the set stays " +
        s"bounded at two: ${hbs3.toSeq}")
    // the versioned heartbeat is the lease clock: back-date the CLAIM
    // acquisition line to stale — a breaker must still REFUSE, because
    // the fresh HB-* content keeps the lease live (the old delete+
    // rename replace had an instant with no HB at all, where exactly
    // this breaker judged a live maintainer stale)
    val old = System.currentTimeMillis() - IndexConfig.maintLockMs - 60000L
    val f = fs.create(claimOf(root), true)
    try f.writeBytes(s"$nonce\n$old\n") finally f.close()
    val e = intercept[java.io.IOException](IndexIO.acquireMaintLock(spark, root))
    assert(e.getMessage.contains("maintenance already running"),
      s"fresh versioned HB must keep the lease live: $e")
    // with the heartbeats gone, the stale CLAIM is all that remains —
    // now the break must go through
    fs.listStatus(lockOf(root)).filter(_.getPath.getName.startsWith("HB"))
      .foreach(st => fs.delete(st.getPath, false))
    val b = IndexIO.acquireMaintLock(spark, root)
    assert(b.nonEmpty && b != nonce, "stale lock broken once heartbeats stop")
    IndexIO.releaseMaintLock(spark, root, b)
  }

  // ---- (c) mtime-refresh on list ----

  test("(c) content is the lease clock: a stale lock on an mtime-refreshing store is broken") {
    val root = s"mockmt:${freshDir("mt")}"
    val fs = new Path(root).getFileSystem(conf)
    fs.mkdirs(new Path(root))
    val old = System.currentTimeMillis() - IndexConfig.maintLockMs - 60000L
    writeClaim(fs, root, "dead-maintainer", old)
    // the mock reports the lock DIR as modified right now — an
    // mtime-in-the-max lease clock would see it fresh for another full
    // maintLockMs; content authority must break it immediately
    assert(fs.getFileStatus(lockOf(root)).getModificationTime >
      System.currentTimeMillis() - 5000L, "mock refreshes dir mtime")
    val nonce = IndexIO.acquireMaintLock(spark, root)
    assert(nonce.nonEmpty, "stale-by-content lock must break despite fresh mtime")
    assert(IndexIO.holdsMaintLock(fs, lockOf(root), nonce))
    IndexIO.releaseMaintLock(spark, root, nonce)
  }

  test("(c) a FRESH lock on an mtime-refreshing store still blocks (content, both directions)") {
    val root = s"mockmt:${freshDir("mt-fresh")}"
    val fs = new Path(root).getFileSystem(conf)
    fs.mkdirs(new Path(root))
    writeClaim(fs, root, "live-maintainer", System.currentTimeMillis())
    val e = intercept[java.io.IOException](IndexIO.acquireMaintLock(spark, root))
    assert(e.getMessage.contains("maintenance already running"), s"$e")
  }
}
