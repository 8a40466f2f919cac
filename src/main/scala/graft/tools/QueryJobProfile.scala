package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Generic Spark-JOB-count decomposition for any registry query — the
  * [[LifecycleProfile]] lens aimed at arbitrary names. The lifecycle
  * tier's cost is scheduler round-trips; this shows how many each
  * query pays and (verbose) the stage names, so a cut can be targeted
  * instead of guessed.
  *
  *   SPARK_GRAFT_JP_VERBOSE=1 sbt "runMain graft.tools.QueryJobProfile [sfDir] [passes] [q1,q2,..]"
  */
object QueryJobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = if (args.length > 1) args(1).toInt else 2
    val names = (if (args.length > 2) args(2).split(",").toSeq
      else Seq("st_interval_join", "st_enrich", "st_sessions", "st_stream_dedup"))
    val spark = graft.Boot.master(SparkSession.builder(), "local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.limit.initialNumPartitions", "64")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger(0)
    val sites = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val verbose = sys.env.get("SPARK_GRAFT_JP_VERBOSE").contains("1")
    // wall-clock per job (start→end, driver-observed): the job-count
    // lens alone can't tell a 30 ms footer probe from a 500 ms write
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        val desc = e.stageInfos.map(si =>
          s"${si.name.takeWhile(_ != '\n')}(${si.numTasks})").mkString("; ")
        starts.put(e.jobId, (System.nanoTime(), desc))
        ()
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(starts.remove(e.jobId)).foreach { case (t0, desc) =>
          if (verbose) sites.add(
            f"${(System.nanoTime() - t0) / 1e6}%8.1f ms  $desc")
        }
        ()
      }
    })
    val qs = names.map(n => graft.queries.Registry.all.find(_.name == n)
      .getOrElse(sys.error(s"unknown query $n")))
    qs.foreach(_.run(spark, sfDir).count()) // warm
    for (p <- 1 to passes; q <- qs) {
      org.apache.spark.sql.GraftBridge.drainListenerBus(spark.sparkContext)
      sites.clear()
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      q.run(spark, sfDir).count()
      org.apache.spark.sql.GraftBridge.drainListenerBus(spark.sparkContext)
      println(f"pass $p ${q.name}%-24s ${(System.nanoTime() - t0) / 1e6}%8.1f ms  ${jobs.get() - j0}%3d jobs")
      if (verbose && p == passes) {
        var s = sites.poll()
        while (s != null) { println(s"    job: $s"); s = sites.poll() }
      }
    }
    spark.stop()
  }
}
