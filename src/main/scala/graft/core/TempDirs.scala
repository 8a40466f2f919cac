package graft.core

/** Temp directories for per-invocation index builds (Verify/Bench run
  * each registered query as a self-contained program, so persisted-index
  * queries build under a throwaway path). Every directory created here
  * is removed recursively at JVM exit — a long Verify+Bench session no
  * longer leaks one full index copy per invocation to /tmp. Production
  * callers pass a real, durable path instead.
  *
  * A single shutdown hook drains a shared list: a session that builds an
  * index per invocation registers one hook thread total, not one per
  * directory.
  */
object TempDirs {

  private val pending = new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
  private val hookInstalled = new java.util.concurrent.atomic.AtomicBoolean(false)

  def create(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    pending.add(p)
    if (hookInstalled.compareAndSet(false, true))
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        var q = pending.poll()
        while (q != null) { delete(q.toFile); q = pending.poll() }
      }))
    p.toString
  }

  private def delete(f: java.io.File): Unit = {
    Option(f.listFiles).foreach(_.foreach(delete))
    f.delete(); ()
  }
}
