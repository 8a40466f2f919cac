package graft.tools

import graft.queries.{Fixtures, Tables, TextQueries2}
import graft.streaming.StreamOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Marginal per-generation cost of the LONG-LIVED BM25 crawl loop
  * ([[StreamOps.bm25Loop]] — one started query; per-batch shard append
  * + as-of serve) vs the same generations each paying a FRESH bounded
  * drain (the st_bm25_refresh lifecycle: new stream per generation,
  * then append, then serve). [[CrawlLoopProbe]]'s measurement applied
  * to the text index: the loop pays planning + checkpoint setup once;
  * each following generation pays only delivery + the append + the
  * committed-shard probe. */
object Bm25LoopProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nGens = if (args.length > 1) args(1).toInt else 5
    val spark = graft.Boot.master(SparkSession.builder(), "local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = spark
    import s.implicits._

    val bounds = (0 to nGens).map(i => 100 + i * 100 / nGens)
    val gens = bounds.sliding(2).map(b => (b(0), b(1))).toSeq
    val window = Tables.table(s, sfDir, "documents")
      .filter(col("doc_id") >= 100 && col("doc_id") < 200)
      .select(col("doc_id").cast("long"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))

    def secs(t0: Long): Double = (System.nanoTime() - t0) / 1e9
    def baseIndex(): String = Fixtures.clonedIndex(s, sfDir, "tindex-lt100") { p =>
      graft.ext.TextIndex.write(
        Tables.table(s, sfDir, "documents").filter(col("doc_id") < 100), p)
    }

    def longLived(tag: String): Unit = {
      val idxPath = baseIndex()
      val cs = graft.queries.Q.pinnedSession(s, 4)
      implicit val sqlc: org.apache.spark.sql.SQLContext = cs.sqlContext
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String)]
      var rows = 0L
      val ckpt = StreamOps.volatileCheckpointDir(cs)
      val t0 = System.nanoTime()
      val q =
        StreamOps.bm25Loop(mem.toDF().toDF("doc_id", "text"), idxPath,
          TextQueries2.Bm25Terms, 20, TextQueries2.Bm25K1,
          TextQueries2.Bm25B, checkpoint = ckpt) { (_, topk) =>
          rows += topk.count()
          ()
        }
      println(f"$tag start        ${secs(t0)}%6.3f s")
      try {
        gens.zipWithIndex.foreach { case ((lo, hi), i) =>
          val tg = System.nanoTime()
          mem.addData(window.filter(d => d._1 >= lo && d._1 < hi).toSeq: _*)
          q.processAllAvailable()
          println(f"$tag gen$i [$lo,$hi)  batch ${secs(tg)}%6.3f s (append+serve inside)")
        }
      } finally {
        q.stop()
        StreamOps.dropCheckpoint(ckpt)
      }
      println(f"$tag TOTAL        ${secs(t0)}%6.3f s  ($rows served rows)")
    }

    def freshDrains(tag: String): Unit = {
      val idxPath = baseIndex()
      val schema = Fixtures.tableSchema(s, sfDir, "documents")
      var rows = 0L
      val t0 = System.nanoTime()
      gens.zipWithIndex.foreach { case ((lo, hi), i) =>
        val tg = System.nanoTime()
        graft.queries.Q.withShuffleWidth(s, 4) { cs =>
          val stream = StreamOps.readStreamOf(cs, sfDir, "documents", schema)
            .filter(col("doc_id") >= lo && col("doc_id") < hi)
          val ckpt = StreamOps.volatileCheckpointDir(cs)
          try {
            val w = stream.writeStream
              .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
                graft.ext.TextIndex.append(batch.select("doc_id", "text"),
                  idxPath, partitions = 1)
              }
              .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            val dq = ckpt.fold(w)(w.option("checkpointLocation", _)).start()
            dq.awaitTermination()
          } finally StreamOps.dropCheckpoint(ckpt)
          rows += graft.ext.TextIndex.bm25TopK(cs, idxPath,
            TextQueries2.Bm25Terms, 20, TextQueries2.Bm25K1,
            TextQueries2.Bm25B).count()
        }
        println(f"$tag gen$i [$lo,$hi)  drain+serve ${secs(tg)}%6.3f s")
      }
      println(f"$tag TOTAL        ${secs(t0)}%6.3f s  ($rows served rows)")
    }

    longLived("warm-loop ")
    freshDrains("warm-fresh")
    longLived("loop      ")
    freshDrains("fresh     ")
    longLived("loop2     ")
    freshDrains("fresh2    ")
    spark.stop()
  }
}
