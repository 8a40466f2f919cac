package graft.core

/** Temp directories for per-invocation index builds (Verify/Bench run
  * each registered query as a self-contained program, so persisted-index
  * queries build under a throwaway path). Every directory created here
  * is removed recursively at JVM exit — a long Verify+Bench session no
  * longer leaks one full index copy per invocation to /tmp. Production
  * callers pass a real, durable path instead.
  */
object TempDirs {

  def create(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => delete(p.toFile)))
    p.toString
  }

  private def delete(f: java.io.File): Unit = {
    Option(f.listFiles).foreach(_.foreach(delete))
    f.delete(); ()
  }
}
