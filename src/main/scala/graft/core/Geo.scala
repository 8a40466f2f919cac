package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** Geometry summary extracted from a WKT string — exactly the spatial
  * surface the reference uses (`001_pois.sql:30-31`, `002_admin.sql:14-20`):
  * geometry-type test, point X/Y, centroid, envelope. Everything else in
  * a full spatial library is unnecessary for this engine.
  */
case class GeomSummary(
    geomType: String,
    lat: Double,        // centroid Y (point Y for points)
    lon: Double,        // centroid X
    minx: Double,
    miny: Double,
    maxx: Double,
    maxy: Double)

/** F10–F13 — WKT point/centroid/envelope helpers + haversine.
  *
  * Geometry stays a WKT `StringType` column at rest (the engine's
  * replacement for DuckDB's GEOMETRY type, SURVEY.md §1.2) and is parsed
  * once per row at ETL time — query time only ever sees the derived
  * doubles, so the UDF is out of every hot path.
  */
object Geo {

  private val Num = "[-+]?[0-9]*\\.?[0-9]+(?:[eE][-+]?[0-9]+)?"
  private val PairRe = s"($Num)\\s+($Num)".r

  private def coords(s: String): Array[(Double, Double)] =
    PairRe.findAllMatchIn(s)
      .map(m => (m.group(1).toDouble, m.group(2).toDouble)).toArray

  /** Signed shoelace area (×2) and centroid numerators of one ring. */
  private def ringMoments(ring: Array[(Double, Double)]): (Double, Double, Double) = {
    var a = 0.0; var cx = 0.0; var cy = 0.0
    var i = 0
    while (i < ring.length - 1) {
      val (x0, y0) = ring(i); val (x1, y1) = ring(i + 1)
      val cross = x0 * y1 - x1 * y0
      a += cross; cx += (x0 + x1) * cross; cy += (y0 + y1) * cross
      i += 1
    }
    (a, cx, cy)
  }

  /** Innermost parenthesized groups = rings, in document order. The WKT
    * sign convention does the hole bookkeeping for us: outer rings are
    * counter-clockwise (positive shoelace area), holes clockwise
    * (negative), so summing signed moments over ALL rings of a
    * (MULTI)POLYGON yields the hole-subtracted area centroid. */
  private def rings(s: String): Seq[Array[(Double, Double)]] =
    "\\(([^()]+)\\)".r.findAllMatchIn(s).map(m => coords(m.group(1))).toSeq

  /** Parse `POINT(x y)`, `POLYGON((ring)(hole)...)`,
    * `MULTIPOLYGON(((...)),((...)))`, `LINESTRING(x y, ...)`.
    * Centroid semantics follow ST_Centroid: area centroid with holes
    * subtracted; degenerate (zero-area) polygons fall back to the
    * vertex mean. Returns None on null/unparseable input. */
  def parseWkt(wkt: String): Option[GeomSummary] = {
    if (wkt == null) return None
    val s = wkt.trim
    val u = s.toUpperCase
    if (u.startsWith("POINT")) {
      PairRe.findFirstMatchIn(s).map { m =>
        val x = m.group(1).toDouble; val y = m.group(2).toDouble
        GeomSummary("POINT", y, x, x, y, x, y)
      }
    } else if (u.startsWith("MULTIPOLYGON") || u.startsWith("POLYGON")) {
      val rs = rings(s).filter(_.nonEmpty)
      if (rs.isEmpty || rs.forall(_.isEmpty)) return None
      val all = rs.flatten
      val minx = all.map(_._1).min; val maxx = all.map(_._1).max
      val miny = all.map(_._2).min; val maxy = all.map(_._2).max
      var a = 0.0; var cx = 0.0; var cy = 0.0
      rs.foreach { r =>
        val (ra, rcx, rcy) = ringMoments(r)
        a += ra; cx += rcx; cy += rcy
      }
      val (gx, gy) =
        if (math.abs(a) < 1e-12)
          (all.map(_._1).sum / all.length, all.map(_._2).sum / all.length)
        else (cx / (3 * a), cy / (3 * a))
      val tpe = if (u.startsWith("MULTIPOLYGON")) "MULTIPOLYGON" else "POLYGON"
      Some(GeomSummary(tpe, gy, gx, minx, miny, maxx, maxy))
    } else if (u.startsWith("LINESTRING")) {
      val all = coords(s)
      if (all.isEmpty) return None
      val minx = all.map(_._1).min; val maxx = all.map(_._1).max
      val miny = all.map(_._2).min; val maxy = all.map(_._2).max
      // length-weighted midpoint centroid
      var lx = 0.0; var ly = 0.0; var len = 0.0
      var i = 1
      while (i < all.length) {
        val (x0, y0) = all(i - 1); val (x1, y1) = all(i)
        val d = math.hypot(x1 - x0, y1 - y0)
        lx += d * (x0 + x1) / 2; ly += d * (y0 + y1) / 2; len += d
        i += 1
      }
      val (gx, gy) =
        if (len == 0) (all(0)._1, all(0)._2) else (lx / len, ly / len)
      Some(GeomSummary("LINESTRING", gy, gx, minx, miny, maxx, maxy))
    } else None
  }

  /** One parse per row; downstream code selects fields from the struct. */
  val geomSummaryUdf: UserDefinedFunction = udf((wkt: String) => parseWkt(wkt))

  private val EarthRadiusKm = 6371.0088

  /** F13 — great-circle distance in km (`ranking.py:19-28`), as a pure
    * built-in column composition (codegen-friendly, no UDF). */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dphi = radians(lat2 - lat1)
    val dl = radians(lon2 - lon1)
    val a = pow(sin(dphi / 2), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dl / 2), 2)
    lit(2 * EarthRadiusKm) * asin(sqrt(a))
  }

  /** Driver-side scalar twin of [[haversineKm]]. */
  def haversineKm(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val dphi = math.toRadians(lat2 - lat1)
    val dl = math.toRadians(lon2 - lon1)
    val a = math.pow(math.sin(dphi / 2), 2) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.pow(math.sin(dl / 2), 2)
    2 * EarthRadiusKm * math.asin(math.sqrt(a))
  }
}
