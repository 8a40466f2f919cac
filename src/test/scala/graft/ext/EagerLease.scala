package graft.ext

import org.scalatest.{BeforeAndAfterAll, Suite}

/** Mix-in for suites that SIMULATE crashes and assert eager garbage
  * reclamation: zeroes the appender lease ([[IndexIO.appendLeaseMs]])
  * for the suite so reconcile/gc treat all uncommitted shards and
  * staging dirs as expired (the pre-lease behavior), restoring the
  * production default afterwards. Suites exercising the lease itself
  * ([[ConcurrentMaintenanceSpec]]) leave the default in place. Safe
  * because suites run sequentially in the one forked test JVM. */
trait EagerLease extends BeforeAndAfterAll { this: Suite =>
  private var saved: Long = _

  override def beforeAll(): Unit = {
    super.beforeAll()
    saved = IndexIO.appendLeaseMs
    IndexIO.appendLeaseMs = 0L
  }

  override def afterAll(): Unit = {
    IndexIO.appendLeaseMs = saved
    super.afterAll()
  }
}
