package graft.tools

import graft.queries.{Fixtures, Tables}
import graft.streaming.StreamOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-phase wall decomposition of st_neardup_refresh's (round-13)
  * body: drain → shared band pass → gen1 join → append → gen2 join. */
object NeardupPhases {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = if (args.length > 1) args(1).toInt else 3
    val spark = graft.Boot.master(SparkSession.builder(), "local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = spark
    val MhHashes = 8 // DedupQueries.NumHashes (private[queries])

    def once(tag: String): Unit = {
      var t = System.nanoTime()
      def lap(name: String): Unit = {
        val now = System.nanoTime()
        println(f"$tag $name%-12s ${(now - t) / 1e9}%6.3f s")
        t = now
      }
      def toksOf(pred: org.apache.spark.sql.Column) = graft.ext.Dedup.docTokens(
        Tables.table(s, sfDir, "documents").filter(pred),
        "doc_id", "text", distinct = false)
      val idxPath = Fixtures.clonedIndex(s, sfDir, "mhindex") { p =>
        graft.ext.MinHashIndex.write(
          toksOf(col("doc_id") < 100), p, MhHashes, rowsPerBand = 2)
      }
      lap("clone")
      val schema = Fixtures.tableSchema(s, sfDir, "documents")
      // one pinned clone for all generation-width phases
      val cs = graft.queries.Q.pinnedSession(s, 4)
      val staged = {
        val stream = StreamOps.readStreamOf(cs, sfDir, "documents", schema)
          .filter(col("doc_id") >= 100 && col("doc_id") < 200)
          .select("doc_id", "text")
        StreamOps.replayToTable(cs, stream,
          s"ndp_stage_${System.nanoTime()}", "append")
      }
      lap("drain")
      val allBands =
        StreamOps.nearDupBands(staged, "doc_id", "text", MhHashes, 2)
          .localCheckpoint(true)
      lap("bands")
      def generation(lo: Int, hi: Int) = {
        val buckets = broadcast(cs.read.parquet(s"$idxPath/buckets")
          .select(col("band"), col("bucket"), col("id").as("index_id")))
        allBands.filter(col("id") >= lo && col("id") < hi)
          .join(buckets, Seq("band", "bucket"))
          .groupBy(col("id").as("doc_id"))
          .agg(count(lit(1)).as("n_hits"))
      }
      {
        val gen1 = generation(100, 150).localCheckpoint(true)
        lap("gen1")
        graft.ext.MinHashIndex.append(
          graft.ext.Dedup.docTokens(
            staged.filter(col("doc_id") >= 100 && col("doc_id") < 150),
            "doc_id", "text", distinct = false),
          idxPath, MhHashes, rowsPerBand = 2, partitions = 1)
        lap("append")
        val gen2 = generation(150, 200).localCheckpoint(true)
        lap("gen2")
        val n = gen1.unionByName(gen2).orderBy("doc_id").count()
        lap(s"count($n)")
      }
    }
    once("warm")
    (1 to passes).foreach(p => once(s"pass$p"))
    spark.stop()
  }
}
