package graft.tools

import graft.streaming.StreamOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Sustained crawl-loop SOAK at a real cadence (VERDICT r14 task 5):
  * ≥100 generations through the long-lived loops with `maintain()`
  * firing on its own trigger policy mid-run — the LSM invariant held
  * IN MOTION, not in a 6-generation spec. A rate-limited source is
  * emulated by a fixed generation cadence; the probe reports
  *
  *   - steady-state LAG: per-generation wall vs the cadence budget,
  *     as first/middle/last-decile means + p95/max — drift shows here
  *     first (an unbounded shard count makes later gens slower);
  *   - shard-count EQUILIBRIUM: live committed shards sampled per
  *     generation — must stay ≤ maxShards + 1 after warmup;
  *   - serve-latency drift: a bm25TopK / bucket-probe serve timed
  *     every 10 generations on top of the loop's own as-of serves;
  *   - maintenance amortization: folds fired and their total cost.
  *
  * Arms: the BM25 crawl loop ([[StreamOps.bm25Loop]] — append + as-of
  * serve inside each batch) and the near-dup crawl loop
  * ([[StreamOps.nearDupLoop]] — bands vs the stored buckets, index
  * appended between generations as in st_crawl_loop).
  *
  * Usage: runMain graft.tools.CrawlSoakProbe [nGens] [cadenceMs] [docsPerGen]
  */
object CrawlSoakProbe {

  private def doc(i: Long): (Long, String) = {
    // Zipf-ish synthetic crawl text: shared head tokens + per-doc tail
    val head = "fox spark jugs merge window batch"
    (i, s"$head doc$i tok${i % 7} tok${i % 13} body${i % 3}")
  }

  private def stats(xs: Seq[Double]): String = {
    val s = xs.sorted
    def pct(p: Double) = s(math.min(s.length - 1, (p * s.length).toInt))
    f"p50=${pct(0.5)}%5.3f p95=${pct(0.95)}%5.3f max=${s.last}%5.3f"
  }
  private def decile(xs: Seq[Double], which: String): Double = {
    val n = math.max(1, xs.length / 10)
    val slice = which match {
      case "first" => xs.take(n)
      case "mid" => xs.slice(xs.length / 2 - n / 2, xs.length / 2 + (n + 1) / 2)
      case _ => xs.takeRight(n)
    }
    slice.sum / slice.length
  }

  def main(args: Array[String]): Unit = {
    val nGens = args.headOption.map(_.toInt).getOrElse(100)
    val cadenceMs = if (args.length > 1) args(1).toLong else 400L
    val docsPerGen = if (args.length > 2) args(2).toInt else 40
    val spark = graft.Boot.master(SparkSession.builder(), "local[32]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = spark
    import s.implicits._
    spark.range(1000000).selectExpr("sum(id)").collect()

    // ---- arm 1: BM25 crawl loop, maintain() on its trigger policy ----
    {
      import graft.ext.{IndexInspect, TextIndex}
      val idx = java.nio.file.Files
        .createTempDirectory("graft-soak-bm25").toString + "/idx"
      TextIndex.write((0L until 100L).map(doc).toDF("doc_id", "text"), idx,
        partitions = 1)
      implicit val sqlc: org.apache.spark.sql.SQLContext = s.sqlContext
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String)]
      val ckpt = StreamOps.volatileCheckpointDir(s)
      var served = 0L
      val q = StreamOps.bm25Loop(mem.toDF().toDF("doc_id", "text"), idx,
        Seq("fox", "spark", "jugs"), 20, 1.2, 0.75, checkpoint = ckpt) {
        (_, topk) => served += topk.count(); ()
      }
      val walls = scala.collection.mutable.ArrayBuffer[Double]()
      val lags = scala.collection.mutable.ArrayBuffer[Double]()
      val shardsAt = scala.collection.mutable.ArrayBuffer[Int]()
      val serveAt = scala.collection.mutable.ArrayBuffer[(Int, Double)]()
      var folds = 0
      var foldSecs = 0.0
      val t0 = System.nanoTime()
      for (g <- 0 until nGens) {
        val tg = System.nanoTime()
        val base = 100L + g.toLong * docsPerGen
        mem.addData((base until base + docsPerGen).map(doc): _*)
        q.processAllAvailable()
        // the trigger policy runs after every generation, folds when due
        val tm = System.nanoTime()
        val r = TextIndex.maintain(s, idx, maxShards = 8, partitions = 1)
        if (r.folded.nonEmpty) { folds += 1; foldSecs += (System.nanoTime() - tm) / 1e9 }
        shardsAt += IndexInspect.liveShardCount(s, idx)
        if (g % 10 == 9) {
          val ts = System.nanoTime()
          TextIndex.bm25TopK(s, idx, Seq("fox", "spark", "jugs"), 20, 1.2, 0.75).count()
          serveAt += ((g, (System.nanoTime() - ts) / 1e9))
        }
        val wall = (System.nanoTime() - tg) / 1e9
        walls += wall
        lags += math.max(0.0, wall - cadenceMs / 1000.0)
        val remain = cadenceMs - (System.nanoTime() - tg) / 1000000L
        if (remain > 0) Thread.sleep(remain)
      }
      q.stop(); StreamOps.dropCheckpoint(ckpt)
      val total = (System.nanoTime() - t0) / 1e9
      println(f"bm25-soak: $nGens gens × $docsPerGen docs @ ${cadenceMs}ms cadence, total $total%.1f s, served=$served")
      println(f"bm25-soak: gen wall first/mid/last decile = ${decile(walls.toSeq, "first")}%5.3f/${decile(walls.toSeq, "mid")}%5.3f/${decile(walls.toSeq, "last")}%5.3f s  (${stats(walls.toSeq)})")
      println(f"bm25-soak: lag over cadence ${stats(lags.toSeq)}  behind-cadence gens=${lags.count(_ > 0)}")
      println(s"bm25-soak: shard count per-10-gens = ${shardsAt.grouped(10).map(_.max).mkString(",")} (max=${shardsAt.max})")
      println(f"bm25-soak: maintains fired=$folds total=${foldSecs}%.1f s (${foldSecs / math.max(1, folds)}%.2f s/fold)")
      println(s"bm25-soak: serve wall every 10 gens = ${serveAt.map { case (g, w) => f"g$g:$w%.3f" }.mkString(" ")}")
      require(shardsAt.drop(10).forall(_ <= 9),
        s"shard count left equilibrium: ${shardsAt.mkString(",")}")
      // exact final-state check: the soak index equals a rebuild
      val finalServe = TextIndex.bm25TopK(s, idx, Seq("fox", "spark", "jugs"), 20, 1.2, 0.75)
        .collect().map(_.toString).sorted.toSeq
      val refIdx = java.nio.file.Files
        .createTempDirectory("graft-soak-ref").toString + "/idx"
      TextIndex.write((0L until (100L + nGens.toLong * docsPerGen)).map(doc)
        .toDF("doc_id", "text"), refIdx, partitions = 1)
      val ref = TextIndex.bm25TopK(s, refIdx, Seq("fox", "spark", "jugs"), 20, 1.2, 0.75)
        .collect().map(_.toString).sorted.toSeq
      require(finalServe == ref, "soak-end serving != from-scratch rebuild")
      println("bm25-soak: final serve == from-scratch rebuild")
    }

    // ---- arm 2: near-dup crawl loop (bands vs stored buckets) ----
    {
      import graft.ext.{Dedup, IndexInspect, MinHashIndex}
      val idx = java.nio.file.Files
        .createTempDirectory("graft-soak-ndl").toString + "/idx"
      MinHashIndex.write(Dedup.docTokens(
        (0L until 100L).map(doc).toDF("doc_id", "text"), "doc_id", "text",
        distinct = false), idx, 8, 2, partitions = 1)
      implicit val sqlc: org.apache.spark.sql.SQLContext = s.sqlContext
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String)]
      val ckpt = StreamOps.volatileCheckpointDir(s)
      var hits = 0L
      val q = StreamOps.nearDupLoop(mem.toDF().toDF("doc_id", "text"),
        "doc_id", "text", 8, 2, checkpoint = ckpt) { () =>
        MinHashIndex.buckets(s, idx)
      } { (_, h) => hits += h.count(); () }
      val walls = scala.collection.mutable.ArrayBuffer[Double]()
      val lags = scala.collection.mutable.ArrayBuffer[Double]()
      val shardsAt = scala.collection.mutable.ArrayBuffer[Int]()
      var folds = 0
      var foldSecs = 0.0
      val t0 = System.nanoTime()
      for (g <- 0 until nGens) {
        val tg = System.nanoTime()
        val base = 100L + g.toLong * docsPerGen
        val gen = (base until base + docsPerGen).map(doc)
        mem.addData(gen: _*)
        q.processAllAvailable()
        // crawl-loop contract (st_crawl_loop): the batch's docs join the
        // stored index between generations, then the policy maintains
        MinHashIndex.append(Dedup.docTokens(gen.toDF("doc_id", "text"),
          "doc_id", "text", distinct = false), idx, 8, 2, partitions = 1)
        val tm = System.nanoTime()
        val r = MinHashIndex.maintain(s, idx, maxShards = 8, partitions = 1)
        if (r.folded.nonEmpty) { folds += 1; foldSecs += (System.nanoTime() - tm) / 1e9 }
        shardsAt += IndexInspect.liveShardCount(s, idx)
        val wall = (System.nanoTime() - tg) / 1e9
        walls += wall
        lags += math.max(0.0, wall - cadenceMs / 1000.0)
        val remain = cadenceMs - (System.nanoTime() - tg) / 1000000L
        if (remain > 0) Thread.sleep(remain)
      }
      q.stop(); StreamOps.dropCheckpoint(ckpt)
      val total = (System.nanoTime() - t0) / 1e9
      println(f"ndl-soak: $nGens gens × $docsPerGen docs @ ${cadenceMs}ms cadence, total $total%.1f s, hits=$hits")
      println(f"ndl-soak: gen wall first/mid/last decile = ${decile(walls.toSeq, "first")}%5.3f/${decile(walls.toSeq, "mid")}%5.3f/${decile(walls.toSeq, "last")}%5.3f s  (${stats(walls.toSeq)})")
      println(f"ndl-soak: lag over cadence ${stats(lags.toSeq)}  behind-cadence gens=${lags.count(_ > 0)}")
      println(s"ndl-soak: shard count per-10-gens = ${shardsAt.grouped(10).map(_.max).mkString(",")} (max=${shardsAt.max})")
      println(f"ndl-soak: maintains fired=$folds total=${foldSecs}%.1f s")
      require(shardsAt.drop(10).forall(_ <= 9),
        s"shard count left equilibrium: ${shardsAt.mkString(",")}")
    }
    spark.stop()
  }
}
