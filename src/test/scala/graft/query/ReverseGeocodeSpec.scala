package graft.query

import graft.SparkSpec
import graft.core.Geo
import org.apache.spark.sql.functions._

/** Semantics of the bulk reverse geocode (query/ReverseGeocode): true
  * nearest inside the neighborhood, the bounded-radius miss contract,
  * cell-boundary behavior, and the no-cross-join plan shape.
  */
class ReverseGeocodeSpec extends SparkSpec {

  import spark.implicits._

  private lazy val pois = Seq(
    (1L, 3.139, 101.6869),   // KL
    (2L, 3.15, 101.71),      // KL, slightly NE
    (3L, 1.30, 103.85),      // Singapore
    (4L, 48.8566, 2.3522)    // Paris — far from everything else
  ).toDF("osm_id", "lat", "lon")

  test("nearest picks the true closest POI; ties impossible here") {
    val pts = Seq(
      (10L, 3.14, 101.69),   // near KL: osm 1 closest
      (20L, 1.31, 103.86),   // near SG: osm 3
      (30L, 48.9, 2.4)       // near Paris: osm 4
    ).toDF("qid", "lat", "lon")
    val got = ReverseGeocode.nearest(pts, pois, cellDeg = 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(10L -> 1L, 20L -> 3L, 30L -> 4L))
    // distance agrees with the scalar haversine (rounded)
    val d = ReverseGeocode.nearest(pts.filter(col("qid") === 10), pois)
      .select("dist_km").as[Double].head()
    assert(math.abs(d - Geo.haversineKm(3.14, 101.69, 3.139, 101.6869)) < 1e-6)
  }

  test("bounded-radius contract: an empty 3x3 neighborhood yields no row") {
    val pts = Seq((99L, -60.0, -150.0)).toDF("qid", "lat", "lon") // ocean
    assert(ReverseGeocode.nearest(pts, pois, cellDeg = 1.0).isEmpty)
    // widening the cell recovers it
    assert(!ReverseGeocode.nearest(pts, pois, cellDeg = 180.0).isEmpty)
  }

  test("cross-cell neighbors are found (query's own cell is empty)") {
    // query cell (4, 102) holds NO poi; the nearest (poi 2, cell (3, 101))
    // is a DIAGONAL neighbor — remove the dx/dy probing and this fails
    val pts = Seq((40L, 4.0001, 102.0001)).toDF("qid", "lat", "lon")
    val got = ReverseGeocode.nearest(pts, pois, cellDeg = 1.0).collect()
    assert(got.length == 1 && got.head.getLong(1) == 2L)
  }

  test("auto cell size: dense cloud derives a small cell, same nearest") {
    // 200 POIs packed into ~0.2 deg around KL — a 1-degree cell would
    // hold them all; the derived cell targets ~64 per cell
    val dense = spark.range(200).select(
      (col("id") + 100).as("osm_id"),
      (lit(3.0) + (col("id") * 37 % 100) / 500.0).as("lat"),
      (lit(101.6) + (col("id") * 53 % 100) / 500.0).as("lon"))
    val pts = Seq((10L, 3.1, 101.7)).toDF("qid", "lat", "lon")
    val auto = ReverseGeocode.nearestAuto(pts, dense).collect()
    // brute-force truth over the small fixture
    val truth = ReverseGeocode.nearest(pts, dense, cellDeg = 1.0).collect()
    assert(auto.length == 1 && auto.head == truth.head)
    // empty corpus: no rows, no failure
    assert(ReverseGeocode.nearestAuto(pts, dense.filter(col("osm_id") < 0)).isEmpty)
    // zero-area corpus (all POIs one point): still answers
    val point = Seq((1L, 3.1, 101.7)).toDF("osm_id", "lat", "lon")
    assert(ReverseGeocode.nearestAuto(pts, point).collect()
      .map(_.getLong(1)).sameElements(Array(1L)))
    // null-coordinate rows (real gazetteer tables have them) must not
    // skew the density count — the derived cell, and so the result,
    // equals the located-subset's
    val withNulls = dense.unionByName(spark.range(500).select(
      (col("id") + 9000).as("osm_id"),
      lit(null).cast("double").as("lat"),
      lit(null).cast("double").as("lon")))
    val got = ReverseGeocode.nearestAuto(pts, withNulls).collect()
    assert(got.length == 1 && got.head == auto.head)
    // all-null corpus behaves like an empty one: no rows, no crash
    assert(ReverseGeocode.nearestAuto(pts,
      withNulls.filter(col("osm_id") >= 9000)).isEmpty)
  }

  test("plan: equality join on cells, no cartesian product") {
    val pts = Seq((1L, 3.0, 101.0)).toDF("qid", "lat", "lon")
    val plan = ReverseGeocode.nearest(pts, pois)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"product join in:\n$plan")
  }
}
