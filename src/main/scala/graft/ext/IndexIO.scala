package graft.ext

import org.apache.spark.sql.SparkSession

/** Publish-by-rename for multi-table persisted indexes
  * ([[VectorIndex]], [[MinHashIndex]]). A naive per-table overwrite
  * publishes non-atomically: a failure (or concurrent reader) between
  * the two table writes pairs NEW table A with STALE table B —
  * silently wrong serving results rather than an error.
  *
  * The staging pattern here shrinks that to a fail-LOUD window: every
  * table is written under a fresh staging directory sibling to the
  * destination, then ONE directory rename publishes the whole index.
  * On a rename-atomic filesystem (file://, HDFS) a reader races only
  * the rename-aside→rename-in instant, where the path is briefly
  * absent and the read errors — it can never observe mixed tables —
  * and a crash inside that instant leaves the previous index intact
  * under a `dest-old-*` sibling for recovery. Concurrent WRITERS to
  * the same destination remain single-writer-by-contract (last rename
  * wins).
  *
  * OBJECT STORES (s3a:// and friends) are weaker: a directory "rename"
  * is a non-atomic copy+delete, so a concurrent reader can observe a
  * partially-copied index and a crash mid-copy leaves a partial
  * destination. Deployments serving from an object store need one
  * more indirection this module deliberately leaves to the deployment:
  * write each build to a fresh versioned directory and flip a small
  * current-pointer file (a single-object PUT, which IS atomic) — the
  * staged-write half of this pattern still applies unchanged.
  */
private[ext] object IndexIO {

  /** Staging path: sibling of `dest` so the rename stays within one
    * filesystem. */
  def stagingFor(dest: String): String =
    s"$dest-staging-${java.util.UUID.randomUUID().toString.take(8)}"

  private def fsOf(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Shard ids present under a shard-partitioned table root (`shard=N`
    * subdirectories, Hive partition-dir naming so a plain
    * `spark.read.parquet(root)` discovers them). Driver-side directory
    * listing — one RPC, never a data read. */
  def shardIds(spark: SparkSession, tableRoot: String): Seq[Int] = {
    val root = new org.apache.hadoop.fs.Path(tableRoot)
    val fs = fsOf(spark, tableRoot)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case s if s.startsWith("shard=") => s.stripPrefix("shard=").toInt }
      .sorted
  }

  /** True when `tableRoot` holds non-hidden regular FILES — the
    * pre-shard flat layout. Publishing a `shard=N` directory next to
    * flat part-files would leave the table unreadable (Spark rejects
    * leaf files at two depths as conflicting partition structures), so
    * appends must refuse and route the caller through a migrating
    * `compact()` (which reads either layout and republishes sharded). */
  def hasFlatFiles(spark: SparkSession, tableRoot: String): Boolean = {
    val root = new org.apache.hadoop.fs.Path(tableRoot)
    val fs = fsOf(spark, tableRoot)
    fs.exists(root) && fs.listStatus(root).exists { s =>
      val n = s.getPath.getName
      s.isFile && !n.startsWith("_") && !n.startsWith(".")
    }
  }

  /** Recursive delete (shard-reconcile helper). Missing path is a
    * no-op; a failed delete throws — leaving a half-reconciled index
    * silent would defeat the repair. */
  def deleteDir(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = fsOf(spark, path)
    if (fs.exists(p) && !fs.delete(p, true))
      throw new java.io.IOException(s"delete $path failed")
  }

  /** Hidden staging dir for a single-shard append: lives UNDER the
    * table root (same filesystem, one rename away) but starts with
    * `_`, which Spark's file listing skips — a crash mid-write leaves
    * invisible garbage, never a partial shard in query results. */
  def shardStagingFor(tableRoot: String): String =
    s"$tableRoot/_shard-staging-${java.util.UUID.randomUUID().toString.take(8)}"

  /** Publish one NEW shard: a single rename of the hidden staging dir
    * to `root/shard=N`. The destination must not exist (appends only
    * ever add shards; rewriting history is [[publish]]'s job via a
    * full-index staging). On a rename-atomic filesystem a reader sees
    * the shard fully or not at all — there is no aside/restore dance
    * because nothing pre-existing is touched. */
  def publishShard(spark: SparkSession, staging: String, destShard: String): Unit = {
    val fs = fsOf(spark, destShard)
    val dest = new org.apache.hadoop.fs.Path(destShard)
    if (fs.exists(dest))
      throw new java.io.IOException(s"shard publish: $destShard already exists")
    if (!fs.rename(new org.apache.hadoop.fs.Path(staging), dest))
      throw new java.io.IOException(s"shard publish rename $staging -> $destShard failed")
  }

  /** Replace `dest` with `staging` via the Hadoop filesystem of the
    * path (hdfs:// and s3a:// work like file://). The old index is
    * renamed ASIDE first, not deleted: a crash between the two renames
    * leaves the previous index recoverable under `dest-old-*` instead
    * of destroyed (delete-first would lose it permanently — the worst
    * possible failure for a serving index). The aside copy is removed
    * only after the new index is in place. */
  def publish(spark: SparkSession, staging: String, dest: String): Unit = {
    val destPath = new org.apache.hadoop.fs.Path(dest)
    val fs = destPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val aside = new org.apache.hadoop.fs.Path(
      s"$dest-old-${java.util.UUID.randomUUID().toString.take(8)}")
    val hadOld = fs.exists(destPath)
    if (hadOld && !fs.rename(destPath, aside))
      throw new java.io.IOException(s"publish aside-rename $dest -> $aside failed")
    if (!fs.rename(new org.apache.hadoop.fs.Path(staging), destPath)) {
      // restore the old index before failing so serving keeps working
      if (hadOld) fs.rename(aside, destPath)
      throw new java.io.IOException(s"publish rename $staging -> $dest failed")
    }
    if (hadOld) fs.delete(aside, true)
  }
}
