package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.SparkSession

/** Concurrent-batch THROUGHPUT probe (VERDICT r15 task 2): every bench
  * number so far is sequential, but a 1000-executor cluster runs many
  * jobs against one long-lived session. This probe drives a mixed slice
  * of the registry (scan, agg, join, window, text, dedup, geocode)
  * twice over the same warmed session:
  *
  *   sequential — one query at a time (the bench shape), and
  *   concurrent — 4 worker threads pulling from a shared queue, each
  *     in its own FAIR pool (spark.scheduler.mode=FAIR, pools created
  *     on demand), the shape a multi-tenant driver actually runs.
  *
  * Pass condition is CORRECTNESS under concurrency (each query's row
  * count matches its sequential run — full value equality is
  * ConcurrentQueriesSpec's job) plus a wall-clock report: with 32 cores
  * and narrow per-query parallelism, the concurrent total should land
  * well under the sequential total (idle-slot fill), and any query that
  * slows under concurrency more than the core-sharing bound is flagged.
  *
  *   SPARK_HOME=/opt/spark sbt "runMain graft.tools.ConcurrencyProbe [sfDir] [threads]"
  */
object ConcurrencyProbe {

  private val Names = Seq(
    "r2_join", "r4_agg", "r6_window_topk", "r13_percentile",
    "r22_tpch_q3", "r25_tpch_q5", "r28_tpch_q18", "ta_token_count",
    "ta_quality", "ta_lang_id", "dd_exact", "g5_importance",
    // lifecycle + streaming shapes: each mutates a PRIVATE cloned index
    // (Fixtures.clonedIndex) and pins conf on cloned sessions, so they
    // must be safe to drive concurrently — this probe is where that
    // claim is exercised (ConcurrentQueriesSpec covers the read-only
    // shapes)
    "ta_bm25_evolve", "ann_ivf_append", "dd_minhash_append",
    "st_replay_hourly", "st_stream_dedup")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val threads = if (args.length > 1) args(1).toInt else 4
    val spark = graft.Boot.master(SparkSession.builder(), "local[32]")
      .appName("graft-concurrency-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val qs = Names.map(n => graft.queries.Registry.all.find(_.name == n)
      .getOrElse(sys.error(s"query $n not in registry")))

    def runOne(q: graft.queries.Q): Long =
      q.run(spark, sfDir).collect().length.toLong

    // warm pass: fixtures built, code paths JITed — both measured
    // passes then see the same session state
    qs.foreach(runOne)

    val seqTimes = qs.map { q =>
      val t0 = System.nanoTime()
      val n = runOne(q)
      (q.name, (System.nanoTime() - t0) / 1e9, n)
    }
    val seqTotal = seqTimes.map(_._2).sum

    val queue = new java.util.concurrent.ConcurrentLinkedQueue[graft.queries.Q]()
    qs.foreach(queue.add)
    val results = new java.util.concurrent.ConcurrentHashMap[String, (Double, Long)]()
    val failures = new AtomicInteger(0)
    val t0 = System.nanoTime()
    val workers = (1 to threads).map { w =>
      val th = new Thread(() => {
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", s"pool-$w")
        var q = queue.poll()
        while (q != null) {
          try {
            val s = System.nanoTime()
            val n = runOne(q)
            results.put(q.name, ((System.nanoTime() - s) / 1e9, n))
          } catch {
            case t: Throwable =>
              failures.incrementAndGet()
              println(s"FAIL ${q.name}: $t")
          }
          q = queue.poll()
        }
      })
      th.start(); th
    }
    workers.foreach(_.join())
    val concTotal = (System.nanoTime() - t0) / 1e9

    println(f"${"query"}%-18s ${"seq_s"}%8s ${"conc_s"}%8s  rows")
    var rowsMatch = true
    seqTimes.foreach { case (name, st, n) =>
      // a query that FAILED in the concurrent pass has no map entry —
      // print a placeholder row instead of crashing the report loop
      // (the require below still fails the probe on its count)
      Option(results.get(name)) match {
        case Some((ct, cn)) =>
          if (cn != n) rowsMatch = false
          println(f"$name%-18s $st%8.3f $ct%8.3f  $n${if (cn != n) s" != $cn ROWS DIVERGED" else ""}")
        case None =>
          println(f"$name%-18s $st%8.3f ${"FAILED"}%8s  $n")
      }
    }
    println(f"sequential total $seqTotal%7.2f s")
    println(f"concurrent total $concTotal%7.2f s  (${threads} workers, FAIR pools)")
    println(f"speedup          ${seqTotal / concTotal}%7.2fx")
    require(failures.get() == 0, s"${failures.get()} queries failed under concurrency")
    require(rowsMatch, "row counts diverged under concurrency")
    println("all queries completed with matching row counts under concurrency")
    spark.stop()
  }
}
