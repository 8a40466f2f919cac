package graft.tools

import graft.queries.{Fixtures, Tables}
import graft.streaming.StreamOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Marginal per-generation cost of the LONG-LIVED crawl loop
  * ([[StreamOps.nearDupLoop]] — one started query, generations as
  * micro-batches, index refreshed between batches) vs the same
  * generations each paying a FRESH bounded drain (the
  * st_neardup_filter lifecycle shape). The long-lived query pays
  * planning + state + checkpoint setup once; each following generation
  * pays only delivery + the stream-static join — the amortization
  * argument for the ~1 s per-drain floor, measured. */
object CrawlLoopProbe {
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
    val MhHashes = 8 // DedupQueries.NumHashes (private[queries])

    def toksOf(pred: org.apache.spark.sql.Column) = graft.ext.Dedup.docTokens(
      Tables.table(s, sfDir, "documents").filter(pred),
      "doc_id", "text", distinct = false)
    // fixed 100-doc crawl window split into nGens generations
    val bounds = (0 to nGens).map(i => 100 + i * 100 / nGens)
    val gens = bounds.sliding(2).map(b => (b(0), b(1))).toSeq
    val window = Tables.table(s, sfDir, "documents")
      .filter(col("doc_id") >= 100 && col("doc_id") < 200)
      .select(col("doc_id").cast("long"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))

    def secs(t0: Long): Double = (System.nanoTime() - t0) / 1e9

    def longLived(tag: String): Unit = {
      val idxPath = Fixtures.clonedIndex(s, sfDir, "mhindex") { p =>
        graft.ext.MinHashIndex.write(
          toksOf(col("doc_id") < 100), p, MhHashes, rowsPerBand = 2)
      }
      val cs = graft.queries.Q.pinnedSession(s, 4)
      implicit val sqlc: org.apache.spark.sql.SQLContext = cs.sqlContext
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String)]
      var rows = 0L
      val ckpt = StreamOps.volatileCheckpointDir(cs)
      val t0 = System.nanoTime()
      val q =
        StreamOps.nearDupLoop(mem.toDF().toDF("doc_id", "text"),
          "doc_id", "text", MhHashes, rowsPerBand = 2, checkpoint = ckpt)(
          () => cs.read.parquet(s"$idxPath/buckets")) { (_, hits) =>
          rows += hits.count()
          ()
        }
      println(f"$tag start        ${secs(t0)}%6.3f s")
      try {
        gens.zipWithIndex.foreach { case ((lo, hi), i) =>
          val tg = System.nanoTime()
          mem.addData(window.filter(d => d._1 >= lo && d._1 < hi).toSeq: _*)
          q.processAllAvailable()
          val dGen = secs(tg)
          val ta = System.nanoTime()
          if (i < gens.size - 1)
            graft.ext.MinHashIndex.append(
              toksOf(col("doc_id") >= lo && col("doc_id") < hi),
              idxPath, MhHashes, rowsPerBand = 2, partitions = 1)
          println(f"$tag gen$i [$lo,$hi)  batch $dGen%6.3f s  append ${secs(ta)}%6.3f s")
        }
      } finally {
        q.stop()
        StreamOps.dropCheckpoint(ckpt)
      }
      println(f"$tag TOTAL        ${secs(t0)}%6.3f s  ($rows hit rows)")
    }

    def freshDrains(tag: String): Unit = {
      val idxPath = Fixtures.clonedIndex(s, sfDir, "mhindex") { p =>
        graft.ext.MinHashIndex.write(
          toksOf(col("doc_id") < 100), p, MhHashes, rowsPerBand = 2)
      }
      val schema = Fixtures.tableSchema(s, sfDir, "documents")
      var rows = 0L
      val t0 = System.nanoTime()
      gens.zipWithIndex.foreach { case ((lo, hi), i) =>
        val tg = System.nanoTime()
        graft.queries.Q.withShuffleWidth(s, 4) { cs =>
          val stream = StreamOps.readStreamOf(cs, sfDir, "documents", schema)
            .filter(col("doc_id") >= lo && col("doc_id") < hi)
          val hits = StreamOps.nearDupBands(stream, "doc_id", "text", MhHashes, 2)
            .join(cs.read.parquet(s"$idxPath/buckets")
              .select(col("band"), col("bucket")), Seq("band", "bucket"))
            .groupBy(col("id").as("doc_id"))
            .agg(count(lit(1)).as("n_hits"))
          rows += StreamOps.replayToTable(cs, hits,
            s"clp_fresh_${System.nanoTime()}", "complete").count()
        }
        val dGen = secs(tg)
        val ta = System.nanoTime()
        if (i < gens.size - 1)
          graft.ext.MinHashIndex.append(
            toksOf(col("doc_id") >= lo && col("doc_id") < hi),
            idxPath, MhHashes, rowsPerBand = 2, partitions = 1)
        println(f"$tag gen$i [$lo,$hi)  drain $dGen%6.3f s  append ${secs(ta)}%6.3f s")
      }
      println(f"$tag TOTAL        ${secs(t0)}%6.3f s  ($rows hit rows)")
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
