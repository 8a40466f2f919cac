package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import graft.queries.{Fixtures, Tables, TextQueries2}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Spark-JOB-level decomposition of the index-lifecycle floor (VERDICT
  * r15 task 7): for each step of the append/delete/maintain/serve
  * journey, wall time AND the number of Spark jobs launched — the
  * lifecycle tier's 12–14× over its trivial DuckDB twins is protocol
  * floor, and the question is which steps pay jobs (scheduler
  * round-trips, ~20–80 ms each even for empty work) vs driver FS I/O.
  *
  *   sbt "runMain graft.tools.LifecycleProfile [sfDir] [passes]"
  */
object LifecycleProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = if (args.length > 1) args(1).toInt else 3
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
    val verbose = sys.env.get("SPARK_GRAFT_LC_VERBOSE").contains("1")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (verbose) sites.add(
          e.stageInfos.map(si => s"${si.name.takeWhile(_ != '\n')}(${si.numTasks})")
            .mkString("; "))
        ()
      }
    })
    val d = Tables.table(spark, sfDir, "documents")

    def t[T](tag: String)(body: => T): T = {
      org.apache.spark.sql.GraftBridge.drainListenerBus(spark.sparkContext)
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      val r = body
      org.apache.spark.sql.GraftBridge.drainListenerBus(spark.sparkContext)
      println(f"  $tag%-12s ${(System.nanoTime() - t0) / 1e6}%8.1f ms  ${jobs.get() - j0}%3d jobs")
      if (verbose) {
        var s = sites.poll()
        while (s != null) { println(s"      job: $s"); s = sites.poll() }
      }
      r
    }

    for (p <- 1 to passes) {
      println(s"pass $p:")
      val path = t("clone") {
        Fixtures.clonedIndex(spark, sfDir, "tindex-even") { pth =>
          graft.ext.TextIndex.write(d.filter(col("doc_id") % 2 === 0), pth)
        }
      }
      val cs = graft.queries.Q.pinnedSession(spark, 4)
      val dc = graft.queries.Q.rebind(d, cs)
      t("append") {
        graft.ext.TextIndex.append(dc.filter(col("doc_id") % 2 === 1), path,
          partitions = 1)
      }
      t("delete") {
        graft.ext.TextIndex.delete(
          dc.filter(col("doc_id") % 7 === 3).select("doc_id"), path)
      }
      t("serve") {
        graft.ext.TextIndex.bm25TopK(cs, path, TextQueries2.Bm25Terms, 20,
          TextQueries2.Bm25K1, TextQueries2.Bm25B).collect()
      }
      t("maintain") {
        graft.ext.TextIndex.maintain(cs, path, maxShards = 1, partitions = 1)
      }
      t("serve2") {
        graft.ext.TextIndex.bm25TopK(cs, path, TextQueries2.Bm25Terms, 20,
          TextQueries2.Bm25K1, TextQueries2.Bm25B).collect()
      }
    }
    spark.stop()
  }
}
