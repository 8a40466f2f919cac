package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming-CDC replay-cost probe (round 18): the exactly-once claim
  * says a crash-restart costs "one manifest read", not a refresh. This
  * measures it against a REAL [[graft.streaming.StreamOps.gazCdcLoop]]:
  *
  *   apply   — per-micro-batch wall through the live loop (K id-disjoint
  *             slices of the localized GazRefreshProbe feed)
  *   restart — drain of a clean restart (nothing to replay): the
  *             stream-lifecycle floor a crash pays regardless
  *   replay  — restart with the newest checkpoint commit dropped (the
  *             crash window): re-delivers the last micro-batch, which
  *             the manifest txn frontier must skip — jobs counted, the
  *             marginal over `restart` is the skip's real cost
  *
  *   sbt "runMain graft.tools.GazCdcProbe [sfDir] [batches]"
  */
object GazCdcProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = if (args.length > 1) args(1).toInt else 3
    val spark = graft.Boot.master(SparkSession.builder(), "local[32]")
      .appName("graft-gaz-cdc-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    })

    // the GazRefreshProbe raw shape: part ⋈ customer, localized feed
    val part = spark.read.parquet(s"$sfDir/part.parquet")
    val customer = spark.read.parquet(s"$sfDir/customer.parquet")
    val raw = part.join(customer, col("p_partkey") === col("c_custkey"))
      .select(
        col("p_partkey").cast("long").as("id"),
        col("p_name").as("name"),
        map_from_arrays(array(lit("amenity"), lit("name")),
          array(lower(col("p_type")), col("p_name"))).as("tags"),
        concat(lit("POINT("),
          (lit(-180.0) + (col("c_custkey") * 73 % 36000) / 100.0), lit(" "),
          (lit(-85.0) + (col("c_custkey") * 37 % 17000) / 100.0), lit(")"))
          .as("wkt"))
    val maxId = raw.agg(max(col("id"))).head.getLong(0)
    val window = math.max(100L, maxId / 1000L)
    val local = raw.filter(col("id") <= window)
    val feed = local.filter(col("id") % 3 === 0)
        .withColumn("name", concat(col("name"), lit(" annex")))
        .withColumn("op", lit("U"))
      .unionByName(local.filter(col("id") % 3 === 1).withColumn("op", lit("D")))
      .unionByName(local.filter(col("id") % 3 === 2)
        .withColumn("id", col("id") + lit(maxId + 1L))
        .withColumn("name", concat(lit("new "), col("name")))
        .withColumn("op", lit("I")))

    val root = graft.core.TempDirs.create("graft-gazcdcprobe-") + "/gaz"
    val t0 = System.nanoTime()
    graft.etl.GazetteerBuilder.writeVersionedPartitioned(spark, raw, root)
    println(f"base build (one-time): ${(System.nanoTime() - t0) / 1e9}%6.2f s")

    val feedDir = graft.core.TempDirs.create("graft-gazcdcprobe-feed-")
    val ckpt = graft.core.TempDirs.create("graft-gazcdcprobe-ckpt-")
    def land(df: DataFrame, n: Int): Long = {
      val stage = new java.io.File(s"$feedDir/_stage$n")
      df.coalesce(1).write.parquet(stage.getAbsolutePath)
      val rows = spark.read.parquet(stage.getAbsolutePath).count()
      val part0 = stage.listFiles.find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part0.toPath,
        new java.io.File(s"$feedDir/batch$n.parquet").toPath)
      rows
    }
    val schema = feed.schema
    def loop() = graft.streaming.StreamOps.gazCdcLoop(
      spark.readStream.schema(schema).parquet(feedDir), root,
      checkpoint = Some(ckpt)) { (_, _) => () }

    // K id-disjoint slices through ONE long-lived loop
    val q = loop()
    try {
      for (i <- 0 until nBatches) {
        val rows = land(feed.filter(pmod(col("id"), lit(nBatches)) === i), i)
        val t1 = System.nanoTime()
        q.processAllAvailable()
        println(f"apply batch $i: ${(System.nanoTime() - t1) / 1e9}%6.2f s " +
          f"($rows rows)")
      }
    } finally q.stop()

    def drain(tag: String): Unit = {
      org.apache.spark.sql.GraftBridge.drainListenerBus(spark.sparkContext)
      val j0 = jobs.get()
      val t1 = System.nanoTime()
      val q2 = loop()
      try q2.processAllAvailable() finally q2.stop()
      org.apache.spark.sql.GraftBridge.drainListenerBus(spark.sparkContext)
      println(f"$tag%-14s ${(System.nanoTime() - t1) / 1e9}%6.2f s  " +
        f"${jobs.get() - j0}%3d jobs")
    }
    drain("clean restart") // the stream-lifecycle floor, nothing to do

    // the crash window: newest commit dropped → the restarted loop
    // re-delivers that micro-batch; the frontier makes it a skip
    val commits = new java.io.File(s"$ckpt/commits")
    val newest = commits.listFiles().filter(_.getName.forall(_.isDigit))
      .maxBy(_.getName.toLong)
    new java.io.File(commits, s".${newest.getName}.crc").delete()
    newest.delete()
    drain("crash replay")

    val nVersions = graft.ext.VersionedStore.versionIds(spark, root).size
    println(s"versions after probe: $nVersions (expect ${1 + nBatches} — " +
      "no junk version from the replay)")
    spark.stop()
  }
}
