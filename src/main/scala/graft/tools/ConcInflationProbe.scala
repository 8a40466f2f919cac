package graft.tools

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** WHY do lifecycle/streaming queries inflate up to 2× per-query under
  * 4 concurrent workers (VERDICT r16 task 3 — `concurrency_r16.txt`
  * measured the inflation; this probe ATTRIBUTES it)?
  *
  * For each query, sequential vs 4-way, the wall decomposes into
  *   - EXEC: Σ per-job wall (jobGroup-attributed: each worker tags its
  *     jobs with the query name) — time inside the Spark scheduler,
  *   - DRIVER: wall − EXEC — driver-side work BETWEEN jobs: FS
  *     listings, driver parquet reads/writes (writeIdShard, stats
  *     shards), analysis, lock/claim renames, checkpoint bookkeeping,
  *   and per-jobGroup task metrics: Σ task runtime (CPU demand) and
  *   Σ GC time.
  * Process CPU is sampled through each pass. The verdicts this
  * separates:
  *   - cores full (CPU ~100%, EXEC inflates, task runtime flat):
  *     saturation — expected, not a defect;
  *   - EXEC inflates with idle CPU: scheduler/FAIR-pool queueing;
  *   - DRIVER inflates: contention on driver-side filesystem /
  *     lock / single-threaded protocol sections — fixable;
  *   - task runtime itself inflates: executor-side interference
  *     (spill, GC, memory) — tune, or accept as saturation.
  *
  *   sbt "runMain graft.tools.ConcInflationProbe [sfDir] [threads]"
  */
object ConcInflationProbe {

  private val Names = Seq(
    "ta_bm25_evolve", "ann_ivf_append", "dd_minhash_append",
    "st_replay_hourly", "st_stream_dedup")

  private final class GroupStats {
    val jobs = new AtomicLong(0)
    val jobWallNs = new AtomicLong(0)
    val taskRunMs = new AtomicLong(0)
    val gcMs = new AtomicLong(0)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val threads = if (args.length > 1) args(1).toInt else 4
    val spark = graft.Boot.master(SparkSession.builder(), "local[32]")
      .appName("graft-conc-inflation-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stats = new ConcurrentHashMap[String, GroupStats]()
    val jobStartNs = new ConcurrentHashMap[Int, (String, Long)]()
    val stageToGroup = new ConcurrentHashMap[Int, String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val g = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.jobGroup.id"))).getOrElse("?")
        jobStartNs.put(e.jobId, (g, System.nanoTime()))
        e.stageInfos.foreach(si => stageToGroup.put(si.stageId, g))
        ()
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(jobStartNs.remove(e.jobId)).foreach { case (g, t0) =>
          val s = stats.computeIfAbsent(g, _ => new GroupStats)
          s.jobs.incrementAndGet()
          s.jobWallNs.addAndGet(System.nanoTime() - t0)
        }
        ()
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val g = stageToGroup.get(e.stageId)
        if (g != null && e.taskMetrics != null) {
          val s = stats.computeIfAbsent(g, _ => new GroupStats)
          s.taskRunMs.addAndGet(e.taskMetrics.executorRunTime)
          s.gcMs.addAndGet(e.taskMetrics.jvmGCTime)
        }
        ()
      }
    })

    val qs = Names.map(n => graft.queries.Registry.all.find(_.name == n)
      .getOrElse(sys.error(s"query $n not in registry")))

    def runTagged(q: graft.queries.Q, tag: String): Double = {
      spark.sparkContext.setJobGroup(tag, tag, interruptOnCancel = false)
      val t0 = System.nanoTime()
      q.run(spark, sfDir).collect()
      spark.sparkContext.clearJobGroup()
      (System.nanoTime() - t0) / 1e9
    }

    // warm: fixtures + JIT
    qs.foreach(q => runTagged(q, s"warm-${q.name}"))
    // drop warm-pass section noise (SPARK_GRAFT_SECTIONS=1 runs only)
    graft.ext.IndexInspect.sectionSecondsAndReset()

    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    @volatile var sampling = true
    // java.lang.Double elements: a scala.Double instantiation makes
    // poll() unbox (null -> 0.0) BEFORE any null check can see it
    val cpuSamples =
      new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Double]()
    def startSampler(): Thread = {
      sampling = true
      val t = new Thread(() => {
        while (sampling) {
          cpuSamples.add(java.lang.Double.valueOf(
            osBean.getProcessCpuLoad * Runtime.getRuntime.availableProcessors()))
          Thread.sleep(200)
        }
      })
      t.setDaemon(true); t.start(); t
    }
    def drainCpu(): (Double, Double) = {
      var n = 0; var sum = 0.0; var mx = 0.0
      // boxed handle: a scala.Double var would unbox poll()'s null to
      // 0.0 and the != null test to constant-true — an infinite spin
      var v: java.lang.Double = cpuSamples.poll()
      while (v != null) {
        val d = v.doubleValue
        if (d >= 0) { n += 1; sum += d; mx = math.max(mx, d) }
        v = cpuSamples.poll()
      }
      (if (n > 0) sum / n else 0.0, mx)
    }

    def snapshot(tag: String): Map[String, (Long, Double, Double, Double)] =
      Names.map { n =>
        val s = stats.get(s"$tag-$n")
        n -> (if (s == null) (0L, 0.0, 0.0, 0.0)
              else (s.jobs.get(), s.jobWallNs.get() / 1e9,
                s.taskRunMs.get() / 1e3, s.gcMs.get() / 1e3))
      }.toMap

    // SEQUENTIAL pass
    startSampler()
    val seqWall = qs.map(q => q.name -> runTagged(q, s"seq-${q.name}")).toMap
    org.apache.spark.sql.GraftBridge.drainListenerBus(spark.sparkContext)
    sampling = false
    val (seqCpuAvg, seqCpuMax) = drainCpu()
    val seq = snapshot("seq")
    val seqSections = graft.ext.IndexInspect.sectionSecondsAndReset()

    // CONCURRENT pass: every worker runs the full list, staggered start
    // order per worker so the mix overlaps (the r16 probe shape)
    startSampler()
    val concWall = new ConcurrentHashMap[String, Double]()
    val t0 = System.nanoTime()
    val workers = (0 until threads).map { w =>
      val th = new Thread(() => {
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", s"pool-$w")
        val rotated = qs.drop(w % qs.size) ++ qs.take(w % qs.size)
        rotated.foreach { q =>
          val wall = runTagged(q, s"conc-${q.name}")
          concWall.merge(q.name, wall,
            (a, b) => math.max(a.doubleValue, b.doubleValue)) // worst worker
        }
      })
      th.start(); th
    }
    workers.foreach(_.join())
    val concTotal = (System.nanoTime() - t0) / 1e9
    org.apache.spark.sql.GraftBridge.drainListenerBus(spark.sparkContext)
    sampling = false
    val (concCpuAvg, concCpuMax) = drainCpu()
    val conc = snapshot("conc")

    println(f"${"query"}%-18s ${"seq_s"}%7s ${"conc_s"}%7s ${"infl"}%5s  " +
      f"${"exec s->c"}%13s ${"driver s->c"}%13s ${"taskcpu s->c"}%13s " +
      f"${"gc s->c"}%11s  jobs")
    for (n <- Names) {
      val sw = seqWall(n)
      val cw = concWall.get(n)
      val (sj, se, st, sg) = seq(n)
      val (cj, ce, ct, cg) = conc(n)
      // concurrent per-query numbers are summed over `threads` runs of
      // the query — normalize to per-run for the comparison
      val k = threads.toDouble
      println(f"$n%-18s $sw%7.3f $cw%7.3f ${cw / sw}%5.2f  " +
        f"$se%5.2f->${ce / k}%5.2f   ${sw - se}%5.2f->${cw - ce / k}%5.2f   " +
        f"$st%5.2f->${ct / k}%5.2f   $sg%4.2f->${cg / k}%4.2f  " +
        f"$sj%3d->${cj / threads}%3d")
    }
    println(f"sequential wall ${seqWall.values.sum}%7.2f s   cpu avg $seqCpuAvg%5.1f / max $seqCpuMax%5.1f cores")
    println(f"concurrent wall $concTotal%7.2f s   cpu avg $concCpuAvg%5.1f / max $concCpuMax%5.1f cores " +
      f"(${threads} workers x ${qs.size} queries)")
    println(f"speedup ${seqWall.values.sum * threads / concTotal}%5.2fx of ${threads} ideal")
    // driver-gap SECTION attribution (SPARK_GRAFT_SECTIONS=1): which
    // protocol section's wall inflates under concurrency. Concurrent
    // totals are over threads× the sequential work — `conc/thr` is the
    // per-run-equivalent; a section whose per-run wall grows is where
    // the serialization lives; if none grows, the gap is OUTSIDE the
    // protocol (plan analysis / streaming microbatch scheduling —
    // Spark-internal driver paths).
    val concSections = graft.ext.IndexInspect.sectionSecondsAndReset().toMap
    if (seqSections.nonEmpty) {
      println(f"${"section"}%-22s ${"seq_s"}%8s ${"conc/thr"}%9s ${"infl"}%6s")
      for ((name, sv) <- seqSections) {
        val cv = concSections.getOrElse(name, 0.0) / threads
        println(f"$name%-22s $sv%8.3f $cv%9.3f ${cv / math.max(sv, 1e-9)}%6.2f")
      }
      val sSum = seqSections.map(_._2).sum
      val cSum = concSections.values.sum / threads
      println(f"${"TOTAL protocol"}%-22s $sSum%8.3f $cSum%9.3f ${cSum / math.max(sSum, 1e-9)}%6.2f" +
        f"   (driver gap outside protocol = the residual)")
    }
    spark.stop()
  }
}
