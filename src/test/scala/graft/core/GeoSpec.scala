package graft.core

import org.scalatest.funsuite.AnyFunSuite

class GeoSpec extends AnyFunSuite {

  test("WKT point parse") {
    val g = Geo.parseWkt("POINT(101.6869 3.1390)").get
    assert(g.geomType == "POINT")
    assert(g.lon == 101.6869 && g.lat == 3.1390)
    assert(g.minx == 101.6869 && g.maxy == 3.1390)
  }

  test("WKT polygon envelope + area centroid") {
    val g = Geo.parseWkt("POLYGON((0 0, 4 0, 4 2, 0 2, 0 0))").get
    assert(g.geomType == "POLYGON")
    assert((g.minx, g.miny, g.maxx, g.maxy) == (0.0, 0.0, 4.0, 2.0))
    assert(math.abs(g.lon - 2.0) < 1e-12) // rectangle centroid
    assert(math.abs(g.lat - 1.0) < 1e-12)
  }

  test("WKT non-convex polygon centroid is area-weighted (not vertex mean)") {
    // L-shape: area centroid differs from the mean of vertices
    val g = Geo.parseWkt("POLYGON((0 0, 2 0, 2 1, 1 1, 1 2, 0 2, 0 0))").get
    // area = 3; centroid = (sum of piece centroids weighted): known (5/6, 5/6)... compute:
    // split: [0,2]x[0,1] area2 c(1,0.5) + [0,1]x[1,2] area1 c(0.5,1.5)
    // cx = (2*1 + 1*0.5)/3 = 5/6 ; cy = (2*0.5 + 1*1.5)/3 = 5/6
    assert(math.abs(g.lon - 5.0 / 6) < 1e-9)
    assert(math.abs(g.lat - 5.0 / 6) < 1e-9)
  }

  test("WKT polygon with hole: centroid subtracts the hole") {
    // 4x4 square (CCW) with centered 2x2 hole (CW): symmetric -> centroid stays (2,2)
    val sym = Geo.parseWkt(
      "POLYGON((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 1 3, 3 3, 3 1, 1 1))").get
    assert(math.abs(sym.lon - 2.0) < 1e-9 && math.abs(sym.lat - 2.0) < 1e-9)
    // off-center hole pushes the centroid away from it
    val off = Geo.parseWkt(
      "POLYGON((0 0, 4 0, 4 4, 0 4, 0 0), (2.5 1.5, 2.5 2.5, 3.5 2.5, 3.5 1.5, 2.5 1.5))").get
    assert(off.lon < 2.0, s"centroid should shift left of 2, got ${off.lon}")
  }

  test("WKT multipolygon: area-weighted centroid across parts, full envelope") {
    // unit square at origin (area 1) + 2x2 square at (10,0) (area 4)
    val g = Geo.parseWkt(
      "MULTIPOLYGON(((0 0, 1 0, 1 1, 0 1, 0 0)), ((10 0, 12 0, 12 2, 10 2, 10 0)))").get
    assert(g.geomType == "MULTIPOLYGON")
    assert((g.minx, g.miny, g.maxx, g.maxy) == (0.0, 0.0, 12.0, 2.0))
    // centroid = (0.5*1 + 11*4)/5 = 8.9 ; (0.5*1 + 1*4)/5 = 0.9
    assert(math.abs(g.lon - 8.9) < 1e-9)
    assert(math.abs(g.lat - 0.9) < 1e-9)
  }

  test("WKT negative and scientific-notation coordinates") {
    val g = Geo.parseWkt("POINT(-1.5e2 -3.25)").get
    assert(g.lon == -150.0 && g.lat == -3.25)
  }

  test("unparseable / null WKT -> None") {
    assert(Geo.parseWkt(null).isEmpty)
    assert(Geo.parseWkt("GARBAGE").isEmpty)
    assert(Geo.parseWkt("POLYGON(())").isEmpty)
  }

  test("haversine known distances") {
    // KL (3.1390,101.6869) to Singapore (1.3521,103.8198): the reference
    // formula (ranking.py:19-28) gives 309.2526717524923 for these coords
    val d = Geo.haversineKm(3.1390, 101.6869, 1.3521, 103.8198)
    assert(math.abs(d - 309.2526717524923) < 1e-9, s"got $d")
    assert(Geo.haversineKm(10, 20, 10, 20) == 0.0)
    // antipodal upper bound ~ half circumference
    assert(Geo.haversineKm(0, 0, 0, 180) < 20040 && Geo.haversineKm(0, 0, 0, 180) > 20000)
  }

  test("triangle inequality (spot sample)") {
    val pts = Seq((0.0, 0.0), (10.0, 10.0), (-20.0, 30.0), (45.0, -60.0))
    for (a <- pts; b <- pts; c <- pts) {
      val ab = Geo.haversineKm(a._1, a._2, b._1, b._2)
      val bc = Geo.haversineKm(b._1, b._2, c._1, c._2)
      val ac = Geo.haversineKm(a._1, a._2, c._1, c._2)
      assert(ac <= ab + bc + 1e-6)
    }
  }
}
