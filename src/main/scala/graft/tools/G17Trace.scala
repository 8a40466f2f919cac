package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level wall decomposition of the g17_gaz_maintain journey
  * (clone copy / refresh 1 / refresh 2 / maintainSnapshots / probe) —
  * the job-count lens showed most of its wall is NOT in Spark jobs, so
  * this locates the driver-side share per phase.
  *
  *   sbt "runMain graft.tools.G17Trace [sfDir] [passes]"
  */
object G17Trace {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = if (args.length > 1) args(1).toInt else 2
    val spark = graft.Boot.master(SparkSession.builder(), "local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[T](tag: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"  $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    for (p <- 1 to passes) {
      println(s"pass $p:")
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
      val root = t("clonedIndex (bench-excluded)") {
        graft.queries.Fixtures.clonedIndex(spark, sfDir, "gazdelta") { pth =>
          graft.etl.GazetteerBuilder.writeVersionedPartitioned(spark, raw, pth)
        }
      }
      val (udP, insP, reinsP) = graft.queries.Fixtures.gazDeltaFeedPaths(spark, sfDir)
      val fsch = graft.queries.Fixtures.gazFeedSchema(spark, sfDir)
      t("refreshDelta 1") {
        graft.etl.GazetteerBuilder.refreshDelta(spark, root,
          spark.read.schema(fsch).parquet(udP)
            .unionByName(spark.read.schema(fsch).parquet(insP)))
      }
      t("refreshDelta 2") {
        graft.etl.GazetteerBuilder.refreshDelta(spark, root,
          spark.read.schema(fsch).parquet(reinsP))
      }
      t("maintainSnapshots") {
        graft.etl.GazetteerBuilder.maintainSnapshots(spark, root, keepLast = 2,
          maxShards = 1)
      }
      val resolved = t("resolveCurrent") {
        graft.ext.VersionedStore.resolveCurrent(spark, root)
      }
      t("probe count") {
        val poiView = graft.etl.GazetteerBuilder.readPois(spark, resolved)
          .select(col("osm_id"), col("name_local_norm"), col("name_en_norm"),
            col("lat"), col("lon"))
        val live = graft.ext.TrigramStore.postings(spark,
          graft.etl.GazetteerBuilder.storeDir(root))
        graft.etl.TrigramIndex.fetchCandidates(poiView, live, Seq("back"),
            bboxPred = None, limitScan = 1 << 20).get
          .select(col("osm_id"), col("name_local_norm"), col("lat"), col("lon"))
          .orderBy("osm_id").count()
      }
    }
    spark.stop()
  }
}
