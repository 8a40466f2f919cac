package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Phase-level decomposition of ONE streaming drain (VERDICT r12 task
  * 2): runs the st_interval_join shape with a StreamingQueryListener
  * and prints, per pass, the wall split into construct/start/drain/
  * collect plus Spark's own per-batch durationMs map (addBatch,
  * queryPlanning, walCommit, …) — the instrument that says where the
  * ~1 s per-generation floor actually goes. */
object StreamDrainProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = if (args.length > 1) args(1).toInt else 4
    val spark = graft.Boot.master(SparkSession.builder(), "local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val batches = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        import scala.jdk.CollectionConverters._
        val durs = p.durationMs.asScala.toSeq.sortBy(-_._2)
          .map { case (k, v) => s"$k=$v" }.mkString(" ")
        batches.add(s"batch=${p.batchId} rows=${p.numInputRows} $durs")
        p.stateOperators.foreach { so =>
          batches.add(s"  state op=${so.operatorName} updated=${so.numRowsUpdated} " +
            s"total=${so.numRowsTotal} updMs=${so.allUpdatesTimeMs} " +
            s"rmMs=${so.allRemovalsTimeMs} commitMs=${so.commitTimeMs} " +
            s"memUsed=${so.memoryUsedBytes}")
        }
      }
    })

    val qName = if (args.length > 2) args(2) else "st_interval_join"
    val q = graft.queries.Registry.all.find(_.name == qName).get
    // warm once
    q.run(spark, sfDir).count()
    for (p <- 1 to passes) {
      batches.clear()
      val t0 = System.nanoTime()
      val df = q.run(spark, sfDir)
      val t1 = System.nanoTime()
      val n = df.count()
      val t2 = System.nanoTime()
      println(f"pass $p: body(run+drain)=${(t1 - t0) / 1e9}%.3f s collect=${(t2 - t1) / 1e9}%.3f s rows=$n")
      // listener events arrive async; give them a beat
      Thread.sleep(300)
      import scala.jdk.CollectionConverters._
      batches.asScala.foreach(b => println(s"  $b"))
    }
    spark.stop()
  }
}
