package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the bulk indexed geocode join (g11's shape): times
  * `GeocodeJoin.topKIndexed` on a given SF directory across a grid of
  * `maxCandidatesPerQuery` / `maxDf` settings, so SCALE.md can record
  * how the pair bounds trade recall for wall-clock on low-diversity
  * vocabularies (the one workload where candidate pairs grow
  * quadratically — see VERDICT r5).
  *
  * `runMain graft.tools.G11Probe <sfDir> [cap,cap,...] [maxDf] [skew]`
  *
  * `skew`: append one pathological hot query — the text "old", a
  * substring of ~25% of all part-derived names — to measure how the
  * cap's pre-shuffle WindowGroupLimit absorbs a single text whose
  * candidate set dwarfs every other's.
  */
object G11Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val caps = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq
               else Seq(Int.MaxValue, 1000, 100)
    val maxDf = if (args.length > 2) args(2).toLong else 2000L
    val skew = args.length > 3 && args(3) == "skew"
    val spark = graft.Boot.master(SparkSession.builder(), s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-g11probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val pois = graft.queries.Fixtures.gazPois(spark, sfDir, withWikidata = false)
    val ix = graft.queries.Fixtures.gazIndex(spark, sfDir)
    val base = graft.queries.Tables.table(spark, sfDir, "part")
      .filter(col("p_partkey") % 13 === 0)
      .select(col("p_partkey").cast("long").as("qid"), col("p_name").as("text"))
    val queries =
      if (!skew) base
      else {
        import spark.implicits._
        base.unionByName(Seq((0L, "old")).toDF("qid", "text"))
      }
    // warm the memoized fixtures + codegen out of the measurement
    ix.count(); pois.count()

    for (cap <- caps) {
      val t0 = System.nanoTime()
      val n = graft.query.GeocodeJoin.topKIndexed(queries, pois, ix, k = 3,
        maxDf = maxDf, maxCandidatesPerQuery = cap).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[g11probe] sf=$sfDir cap=$cap maxDf=$maxDf skew=$skew rows=$n time=$sec%.1fs")
    }
    spark.stop()
  }
}
