package graft.tools

import graft.queries.Registry
import org.apache.spark.sql.SparkSession

/** Interleaved A/B of the stream-lifecycle floor levers (VERDICT r10
  * task 2): runs the named queries alternating the volatile-checkpoint
  * seam ON and OFF within ONE JVM, so VM-level drift (this box swings
  * ±10-20% across minutes) cancels instead of masquerading as signal.
  * `runMain graft.tools.StreamFloorProfile [sfDir] [passes] [q1,q2,..]`. */
object StreamFloorProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = if (args.length > 1) args(1).toInt else 4
    val names = (if (args.length > 2) args(2).split(",").toSeq
      else Seq("st_interval_join", "st_stream_dedup", "st_bm25_refresh",
        "st_neardup_refresh"))
    val spark = graft.Boot.master(SparkSession.builder(), s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = Registry.all.filter(q => names.contains(q.name))
    // warm codegen/scheduler once per query before measuring
    qs.foreach(_.run(spark, sfDir).count())
    val acc = scala.collection.mutable.Map.empty[(String, String), List[Double]]
    for (p <- 1 to passes; mode <- Seq("on", "off"); q <- qs) {
      System.setProperty("graft.volatile.ckpt", if (mode == "on") "1" else "0")
      val t0 = System.nanoTime()
      q.run(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      acc((q.name, mode)) = dt :: acc.getOrElse((q.name, mode), Nil)
      println(f"pass $p ${q.name}%-22s $mode%-3s $dt%6.2f s")
    }
    println("== medians ==")
    for (q <- qs; mode <- Seq("on", "off")) {
      val vs = acc((q.name, mode)).sorted
      println(f"${q.name}%-22s $mode%-3s ${vs(vs.length / 2)}%6.2f s")
    }
    spark.stop()
  }
}
