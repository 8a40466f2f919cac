package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Skew probe for the bulk reverse geocode (the [[G11Probe]] treatment
  * for g12): measures `ReverseGeocode.nearest` with a pinned sparse
  * cell size against `nearestAuto`'s density-derived size on a
  * CLUSTERED fixture — all POIs and queries inside one dense "city"
  * square, the shape where a world-map cell degenerates to per-cell
  * all-pairs.
  *
  * usage: runMain graft.tools.G12Probe [sfDir] [cityDeg] [pinnedCellDeg]
  *
  * The fixture derives deterministically from customer/supplier keys:
  * `n` POIs and `n/10` queries uniformly hash-spread inside a
  * `cityDeg`-degree square centered at (3.1, 101.7). With the pinned
  * cell (default 10°) every query × every POI lands in one bucket;
  * auto sizing derives a cell ~sqrt(cityDeg² · 64 / n) and the join
  * product stays ~64 POIs per probe.
  */
object G12Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cityDeg = if (args.length > 1) args(1).toDouble else 0.5
    val pinned = if (args.length > 2) args(2).toDouble else 10.0
    val spark = graft.Boot.master(SparkSession.builder(), s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-g12probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def clustered(keyCol: String, table: String, id: String) = {
      val t = graft.queries.Tables.table(spark, sfDir, table)
      t.select(col(keyCol).cast("long").as(id),
        (lit(3.1 - cityDeg / 2) +
          (col(keyCol) * 37 % 10000) / 10000.0 * cityDeg).as("lat"),
        (lit(101.7 - cityDeg / 2) +
          (col(keyCol) * 53 % 10000) / 10000.0 * cityDeg).as("lon"))
    }
    val pois = clustered("c_custkey", "customer", "osm_id")
    val pts = clustered("s_suppkey", "supplier", "qid")
    val nP = pois.count(); val nQ = pts.count() // warm + sizes

    for ((label, run) <- Seq(
      "pinned" -> (() => graft.query.ReverseGeocode.nearest(pts, pois, pinned)),
      "auto" -> (() => graft.query.ReverseGeocode.nearestAuto(pts, pois)))) {
      val t0 = System.nanoTime()
      val n = run().count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[g12probe] sf=$sfDir city=$cityDeg%.2fdeg pois=$nP queries=$nQ mode=$label rows=$n time=$sec%.1fs")
    }
    spark.stop()
  }
}
