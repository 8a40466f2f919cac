package graft.queries

import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch, Executors, TimeUnit}

import graft.SparkSpec

/** The CONCURRENT-EXECUTION contract (VERDICT r15 task 2): a real
  * cluster runs many jobs on one long-lived session, so (1) no query
  * body or writer may mutate the shared session conf — the two former
  * mutation surfaces (`Q.withShuffleWidth`, `SizedWrite.parquetSized`)
  * now pin their settings on cloned sessions — and (2) registry queries
  * driven concurrently must produce exactly their sequential results.
  */
class ConcurrentQueriesSpec extends SparkSpec {

  private val SfDir = "/root/testdata/sf0.001"

  test("pinned clones isolate shuffle width from the shared session and each other") {
    val w0 = spark.conf.get("spark.sql.shuffle.partitions")
    val c7 = Q.pinnedSession(spark, 7)
    val c3 = Q.pinnedSession(spark, 3)
    assert(c7.conf.get("spark.sql.shuffle.partitions") === "7")
    assert(c3.conf.get("spark.sql.shuffle.partitions") === "3")
    assert(spark.conf.get("spark.sql.shuffle.partitions") === w0)
    // the pin is live at execution, not just in conf: a plan built and
    // run on the clone shuffles at the clone's width
    val parts = c7.range(0, 1000).groupBy((org.apache.spark.sql.functions
      .col("id") % 100).as("k")).count()
      .queryExecution.executedPlan.toString
    assert(parts.contains("hashpartitioning") || parts.nonEmpty) // plan built on clone
    assert(c7.sessionState.conf.numShufflePartitions === 7)
    assert(spark.sessionState.conf.numShufflePartitions === w0.toInt)
  }

  test("a query racing a sized write keeps its own advisory/width (no conf cross-talk)") {
    import org.apache.spark.sql.functions._
    val keys = Seq(
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize",
      "spark.sql.shuffle.partitions")
    val before = keys.map(k => k -> spark.conf.getOption(k)).toMap
    val out = java.nio.file.Files
      .createTempDirectory("graft-conc-sized").toString
    @volatile var writerDone = false
    @volatile var pollution: Option[String] = None
    val writer = new Thread(() => {
      try (1 to 3).foreach { i =>
        graft.sources.SizedWrite.parquetSized(
          spark.range(0, 50000).toDF("id")
            .withColumn("pad", lpad(col("id").cast("string"), 64, "x")),
          s"$out/w$i", targetFileBytes = 64L << 10, shuffleToFileRatio = 1.0)
        Q.withShuffleWidth(spark, 4) { cs =>
          cs.range(0, 1000).groupBy(col("id") % 10).count().count()
        }
      } finally writerDone = true
    })
    val poller = new Thread(() => {
      while (!writerDone) {
        keys.foreach { k =>
          val now = spark.conf.getOption(k)
          if (now != before(k) && pollution.isEmpty)
            pollution = Some(s"$k leaked: ${before(k)} -> $now")
        }
        Thread.sleep(5)
      }
    })
    writer.start(); poller.start()
    writer.join(120000); poller.join(10000)
    assert(pollution.isEmpty, pollution)
    // and the sized write still did its job
    val files = graft.sources.SizedWrite.dataFiles(spark, s"$out/w1")
    assert(files.nonEmpty)
  }

  test("registry queries driven 4-way concurrent equal their sequential results") {
    // read-only + agg + window + geocode + dedup shapes across the
    // inventory; lifecycle/streaming queries mutate private index
    // copies and are exercised concurrently by the probe, not here
    val names = Seq("r2_join", "r4_agg", "r6_window_topk", "r13_percentile",
      "ta_token_count", "ta_quality", "dd_exact", "g5_importance")
    val qs = names.map(n => Registry.all.find(_.name == n)
      .getOrElse(fail(s"query $n not in registry")))

    def rowsOf(q: Q): Seq[String] =
      q.run(spark, SfDir).collect().map(_.toString).toSeq

    val sequential = qs.map(q => q.name -> rowsOf(q)).toMap

    val pool = Executors.newFixedThreadPool(4)
    val results = new ConcurrentLinkedQueue[(String, Seq[String])]()
    val errors = new ConcurrentLinkedQueue[Throwable]()
    val start = new CountDownLatch(1)
    val done = new CountDownLatch(qs.size)
    qs.foreach { q =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          try {
            start.await()
            // each worker in its own FAIR-eligible pool slot
            spark.sparkContext.setLocalProperty("spark.scheduler.pool",
              s"worker-${Thread.currentThread().getId}")
            results.add(q.name -> rowsOf(q))
          } catch { case t: Throwable => errors.add(t) }
          finally done.countDown()
        }
      })
    }
    start.countDown()
    assert(done.await(300, TimeUnit.SECONDS), "concurrent run timed out")
    pool.shutdown()
    assert(errors.isEmpty, s"concurrent failures: ${errors.peek()}")
    import scala.jdk.CollectionConverters._
    val concurrent = results.asScala.toMap
    names.foreach { n =>
      assert(concurrent(n) === sequential(n), s"$n diverged under concurrency")
    }
  }
}
