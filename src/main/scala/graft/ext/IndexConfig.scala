package graft.ext

/** Public knobs of the persisted-index concurrency protocol
  * ([[IndexIO]] is package-private; operators tune these without
  * reaching into the protocol internals). Both are also settable at
  * JVM start via system properties, which is the deployment route —
  * the setters here are for embedded/test callers.
  *
  *  - `appendLeaseMs` (`-Dgraft.append.lease.ms=...`): how long a
  *    claimed-but-uncommitted append shard is protected from
  *    maintenance reclaim without a heartbeat. Appends heartbeat after
  *    their table writes, so the lease bounds only the publish→commit
  *    tail; raise it for deployments with coarse clocks or very slow
  *    metadata operations. 0 = eager-reclaim test mode (no commit-time
  *    enforcement).
  *  - `maintLockMs` (`-Dgraft.maint.lock.ms=...`): how long a
  *    maintenance lock without a heartbeat stays authoritative before
  *    the next maintainer may break it as crash leftover. 0 = locking
  *    disabled.
  */
object IndexConfig {
  def appendLeaseMs: Long = IndexIO.appendLeaseMs
  def appendLeaseMs_=(v: Long): Unit = IndexIO.appendLeaseMs = v
  def maintLockMs: Long = IndexIO.maintLockMs
  def maintLockMs_=(v: Long): Unit = IndexIO.maintLockMs = v
}
