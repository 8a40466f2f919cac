package graft.tools

import graft.queries.Registry
import org.apache.spark.sql.SparkSession

/** The stateful streaming queries under the PRODUCTION state store:
  * RocksDB vs the default in-memory HDFS-backed provider, same
  * session, same fixture. At 100 TB/day the per-key state of the
  * dedup aggregate / both-side join cannot live on the JVM heap — the
  * deployment conf sets RocksDB, so the 1000× scale evidence should
  * include its cost, not just the heap store's (the unit-scale
  * RocksDB parity case lives in StreamOpsSpec; this measures it at
  * fixture scale). Provider is read at QUERY START, so a session-level
  * conf set/unset between runs switches stores. */
object RocksDbStreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft-sf100")
    val names = if (args.length > 1) args(1).split(",").toSeq
                else Seq("st_stream_dedup", "st_interval_join")
    val spark = graft.Boot.master(SparkSession.builder(), "local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // warmup
    val key = "spark.sql.streaming.stateStore.providerClass"
    val clogKey =
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    val rocks = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    val providers = if (args.length > 2) args(2).split(",").toSeq
                    else Seq("default", "rocksdb")
    for (provider <- providers; name <- names) {
      if (provider.startsWith("rocksdb")) spark.conf.set(key, rocks)
      else spark.conf.unset(key)
      // changelog checkpointing: per-batch delta upload instead of a
      // full RocksDB snapshot per store per batch
      spark.conf.set(clogKey, provider.endsWith("-clog").toString)
      val q = Registry.all.find(_.name == name)
        .getOrElse(sys.error(s"unknown query $name"))
      val t0 = System.nanoTime()
      val n = q.run(spark, sfDir).count()
      println(f"$provider%-8s $name%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    spark.stop()
  }
}
