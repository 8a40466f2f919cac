package graft.ext

import org.apache.spark.sql.SparkSession

/** TRANSIENT writer-lock contention — the lock is held, mid-break, or
  * being raced; the operation is safe to retry once the holder
  * finishes. Typed (not message-matched) so retry policies — e.g.
  * [[graft.streaming.StreamOps.gazCdcLoop]]'s serialize-behind-
  * maintenance backoff — can distinguish "busy, try again" from the
  * protocol's genuine failures (corrupt CLAIM restore, format refusal),
  * which must stay loud. Subclasses IOException, so existing loud
  * callers are unchanged. */
final class LockBusyException(msg: String) extends java.io.IOException(msg)

/** Public facade over the (package-private) versioned-pointer publish
  * for SNAPSHOT ARTIFACTS outside `graft.ext` — the gazetteer is the
  * first client ([[graft.etl.GazetteerBuilder.writeVersioned]]): a
  * serving engine must never observe a half-written snapshot, and the
  * machinery that guarantees that for the persisted indexes (stage →
  * rename to a fresh `v{N}` → one atomic CURRENT flip, format-stamped,
  * crash garbage reclaimed out-of-band) is exactly what a snapshot
  * needs. Kept to the five verbs a publisher uses so [[IndexIO]] stays
  * package-private.
  */
object VersionedStore {

  /** A sibling staging path for a build destined for `root` — write
    * the snapshot here, then [[publish]]. Crash garbage under this
    * name is reclaimed by [[gc]]. */
  def stagingFor(root: String): String = IndexIO.stagingFor(root)

  /** Land `staging` as the next version under `root` and flip CURRENT
    * to it (atomic; readers see old-or-new, never torn). Returns the
    * published version path. */
  def publish(spark: SparkSession, staging: String, root: String): String =
    IndexIO.publishVersioned(spark, staging, root)

  /** The path CURRENT names — the read-side entry point; loud on a
    * missing or tampered pointer, gated on the format stamp. */
  def resolveCurrent(spark: SparkSession, root: String): String = {
    val resolved = IndexIO.resolveCurrent(spark, root)
    IndexIO.requireSupportedFormat(spark, resolved)
    resolved
  }

  /** Whether `root` carries a CURRENT pointer (is a versioned root) —
    * the quiet probe; [[resolveCurrent]] stays loud. */
  def currentExists(spark: SparkSession, root: String): Boolean =
    IndexIO.currentExists(spark, root)

  /** Version ids present under `root`, ascending. */
  def versionIds(spark: SparkSession, root: String): Seq[Int] =
    IndexIO.versionIds(spark, root)

  /** Reclaim rolled-past versions (keeping `keepLast` plus CURRENT's)
    * and crash-orphaned staging dirs — never during publish. */
  def gc(spark: SparkSession, root: String, keepLast: Int = 2): Unit = {
    IndexIO.pruneVersions(spark, root, keepLast)
    IndexIO.gcStaging(spark, root)
  }

  /** Run `body` as the root's SINGLE WRITER — the maintainer-lock
    * protocol ([[IndexIO.acquireMaintLock]]: atomic create, staleness
    * bound, loud refusal) applied to snapshot publishers. A concurrent
    * writer fails LOUDLY ("maintenance already running") instead of
    * racing the version-number allocation or interleaving partition
    * generations with someone else's manifest; a crashed writer's lock
    * ages out. Heartbeat long phases via the returned handle if `body`
    * can outrun the lock bound. */
  def withWriterLock[T](spark: SparkSession, root: String)(body: => T): T = {
    val nonce = IndexIO.acquireMaintLock(spark, root)
    try body
    finally IndexIO.releaseMaintLock(spark, root, nonce)
  }
}
