package graft.tools

/** The REAL kill-the-JVM arm of the exactly-once streaming-ingest audit
  * (VERDICT r14 task 1; the deterministic in-process sweep is
  * `StreamReplaySpec`, the child logic [[graft.ext.ReplayHarness]]):
  * for each kill point, spawn a child JVM that runs a file-source
  * bm25 crawl loop and `Runtime.halt(137)`s mid-protocol inside the
  * mid-run batch (kill ≥ 0: the K-th IndexIO mutation of the append;
  * kill = -1: the post-marker sink window — the one only the round-15
  * idempotency tag closes), then a SECOND child JVM that resumes the
  * SAME checkpoint, finishes, and verifies exactly-once convergence.
  * Children reuse this JVM's classpath — no sbt in the loop.
  *
  * Usage: runMain graft.tools.StreamReplayProbe [all [k...]] | crash <work> <k> | resume <work>
  */
object StreamReplayProbe {

  def main(args: Array[String]): Unit = args.headOption.getOrElse("all") match {
    case "all" => driver(args.drop(1))
    case "crash" => graft.ext.ReplayHarness.child(args(1), args(2).toInt, resume = false)
    case "resume" => graft.ext.ReplayHarness.child(args(1), -999, resume = true)
    case other => sys.error(s"unknown phase $other")
  }

  private def driver(rest: Array[String]): Unit = {
    val kills = if (rest.nonEmpty) rest.map(_.toInt).toSeq else Seq(-1, 0, 3, 6)
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val cp = System.getProperty("java.class.path")
    val opens = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.toArray.map(_.toString)
      .filter(a => a.startsWith("--add-opens") || a.startsWith("--add-exports"))
    def run(phase: String, work: String, k: Int): Int = {
      val cmd = Seq(javaBin) ++ opens ++ Seq("-Xmx4g", "-cp", cp,
        "-Dspark.ui.enabled=false",
        "graft.tools.StreamReplayProbe", phase, work, k.toString)
      val pb = new ProcessBuilder(cmd: _*).inheritIO()
      pb.start().waitFor()
    }
    var failures = 0
    for (k <- kills) {
      val work = java.nio.file.Files
        .createTempDirectory(s"graft-jvmkill-$k").toString
      val rcCrash = run("crash", work, k)
      val rcResume = run("resume", work, k)
      val tag = if (k < 0) "post-marker(sink)" else s"kill-point $k"
      if (rcCrash == 137 && rcResume == 0)
        println(s"JVMKILL $tag: crash rc=$rcCrash resume rc=$rcResume OK")
      else {
        println(s"JVMKILL $tag: crash rc=$rcCrash resume rc=$rcResume FAILED")
        failures += 1
      }
    }
    if (failures > 0) sys.error(s"$failures kill points failed")
    println(s"all ${kills.size} JVM-kill points converged exactly-once")
  }
}
