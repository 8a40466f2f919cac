package graft.etl

import graft.SparkSpec
import graft.core.{Settings, Wkb}
import org.apache.spark.sql.functions._

import java.nio.{ByteBuffer, ByteOrder}

/** The QuackOSM GeoParquet → S1 ingest boundary: WKB decoding, feature
  * id mapping, the CLI-flag-equivalent filters, and the full path into
  * `BuildMain` — the recipe a user coming from the reference's
  * `build_gazetteer.py` follows (documented in `tools/pbf_ingest.md`).
  */
class QuackOsmAdapterSpec extends SparkSpec {

  import spark.implicits._

  // --- little WKB writers (little-endian ISO WKB, as QuackOSM emits) ---

  private def wkbPoint(x: Double, y: Double): Array[Byte] = {
    val b = ByteBuffer.allocate(21).order(ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte).putInt(1).putDouble(x).putDouble(y)
    b.array()
  }

  private def wkbPolygon(rings: Seq[Seq[(Double, Double)]]): Array[Byte] = {
    val n = 9 + rings.map(r => 4 + 16 * r.size).sum
    val b = ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte).putInt(3).putInt(rings.size)
    rings.foreach { r =>
      b.putInt(r.size)
      r.foreach { case (x, y) => b.putDouble(x).putDouble(y) }
    }
    b.array()
  }

  private def wkbMultiPolygon(polys: Seq[Seq[Seq[(Double, Double)]]]): Array[Byte] = {
    val parts = polys.map(wkbPolygon)
    val b = ByteBuffer.allocate(9 + parts.map(_.length).sum)
      .order(ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte).putInt(6).putInt(parts.size)
    parts.foreach(b.put)
    b.array()
  }

  test("Wkb.toWkt: point / polygon / multipolygon, both endiannesses, bad input") {
    assert(Wkb.toWkt(wkbPoint(101.6869, 3.139)) == "POINT (101.6869 3.139)")
    assert(Wkb.toWkt(wkbPolygon(Seq(Seq((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 0.0)))))
      == "POLYGON ((0 0, 4 0, 4 4, 0 0))")
    assert(Wkb.toWkt(wkbMultiPolygon(Seq(
      Seq(Seq((0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 0.0))),
      Seq(Seq((5.0, 5.0), (6.0, 5.0), (6.0, 6.0), (5.0, 5.0))))))
      == "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5)))")
    // big-endian point
    val be = ByteBuffer.allocate(21).order(ByteOrder.BIG_ENDIAN)
    be.put(0.toByte).putInt(1).putDouble(7.5).putDouble(-2.25)
    assert(Wkb.toWkt(be.array()) == "POINT (7.5 -2.25)")
    // EWKB SRID flag is skipped
    val srid = ByteBuffer.allocate(25).order(ByteOrder.LITTLE_ENDIAN)
    srid.put(1.toByte).putInt(1 | 0x20000000).putInt(4326).putDouble(1.0).putDouble(2.0)
    assert(Wkb.toWkt(srid.array()) == "POINT (1 2)")
    // Z geometry and garbage are rejected, not mangled
    val z = ByteBuffer.allocate(29).order(ByteOrder.LITTLE_ENDIAN)
    z.put(1.toByte).putInt(1001).putDouble(1).putDouble(2).putDouble(3)
    intercept[IllegalArgumentException](Wkb.toWkt(z.array()))
    intercept[IllegalArgumentException](Wkb.toWkt(Array[Byte](9, 9)))
    // TRUNCATED blob (valid point header, missing coordinate bytes):
    // must surface as IllegalArgumentException, not BufferUnderflow —
    // the adapter's bad-geometry→null policy catches only IAE
    val trunc = ByteBuffer.allocate(5).order(ByteOrder.LITTLE_ENDIAN)
    trunc.put(1.toByte).putInt(1)
    intercept[IllegalArgumentException](Wkb.toWkt(trunc.array()))
    // truncated polygon ring (claims 4 points, carries 1)
    val truncPoly = ByteBuffer.allocate(9 + 4 + 16).order(ByteOrder.LITTLE_ENDIAN)
    truncPoly.put(1.toByte).putInt(3).putInt(1).putInt(4).putDouble(0).putDouble(0)
    intercept[IllegalArgumentException](Wkb.toWkt(truncPoly.array()))
  }

  test("Wkb.toWkt: multi-geometry MEMBER headers validated like top level") {
    // EWKB Z flag on a MULTIPOINT member: loud rejection, not misparse
    val zMember = ByteBuffer.allocate(9 + 29).order(ByteOrder.LITTLE_ENDIAN)
    zMember.put(1.toByte).putInt(4).putInt(1) // MULTIPOINT of 1
      .put(1.toByte).putInt(1 | 0x80000000).putDouble(1).putDouble(2).putDouble(3)
    val eZ = intercept[IllegalArgumentException](Wkb.toWkt(zMember.array()))
    assert(eZ.getMessage.contains("Z/M or unknown"))
    // EWKB SRID flag on a member is skipped, same as at top level
    val sridMember = ByteBuffer.allocate(9 + 25).order(ByteOrder.LITTLE_ENDIAN)
    sridMember.put(1.toByte).putInt(4).putInt(1)
      .put(1.toByte).putInt(1 | 0x20000000).putInt(4326).putDouble(3).putDouble(4)
    assert(Wkb.toWkt(sridMember.array()) == "MULTIPOINT ((3 4))")
    // bad member byte-order marker: rejected, not treated as big-endian
    val badOrder = ByteBuffer.allocate(9 + 21).order(ByteOrder.LITTLE_ENDIAN)
    badOrder.put(1.toByte).putInt(5).putInt(1) // MULTILINESTRING of 1
      .put(7.toByte).putInt(2).putDouble(0).putDouble(0)
    val eOrd = intercept[IllegalArgumentException](Wkb.toWkt(badOrder.array()))
    assert(eOrd.getMessage.contains("byte-order"))
    // wrong member type inside a MULTIPOLYGON still rejected
    val wrongType = ByteBuffer.allocate(9 + 21).order(ByteOrder.LITTLE_ENDIAN)
    wrongType.put(1.toByte).putInt(6).putInt(1)
      .put(1.toByte).putInt(1).putDouble(0).putDouble(0) // a POINT member
    intercept[IllegalArgumentException](Wkb.toWkt(wrongType.array()))
  }

  test("feature ids: disjoint per type, numeric suffix preserved, malformed rejected") {
    val n = QuackOsmAdapter.parseFeatureId("node/240109189")
    val w = QuackOsmAdapter.parseFeatureId("way/240109189")
    val r = QuackOsmAdapter.parseFeatureId("relation/240109189")
    assert(Set(n, w, r).size == 3 && n == 240109189L)
    intercept[IllegalArgumentException](QuackOsmAdapter.parseFeatureId("junk"))
    intercept[IllegalArgumentException](QuackOsmAdapter.parseFeatureId("area/1"))
  }

  private def quackDf = Seq(
    ("node/1", Map("name" -> "Monograph Dining", "amenity" -> "restaurant"),
      wkbPoint(101.6869, 3.139)),
    ("node/2", Map("name" -> "Monogram Cafe", "amenity" -> "cafe"),
      wkbPoint(101.71, 3.15)),
    ("way/3", Map("name" -> "Pasar Seni", "shop" -> "market"),
      wkbPolygon(Seq(Seq((101.69, 3.14), (101.70, 3.14), (101.70, 3.145), (101.69, 3.14))))),
    ("relation/4", Map("name" -> "Malaysia", "boundary" -> "administrative",
      "admin_level" -> "2"),
      wkbMultiPolygon(Seq(Seq(Seq((99.6, 0.8), (119.3, 0.8), (119.3, 7.4), (99.6, 0.8)))))),
    ("node/5", Map("amenity" -> "bench"), wkbPoint(0.0, 0.0)), // unnamed
    ("node/6", Map("name" -> "Broken"), Array[Byte](42)) // bad WKB
  ).toDF("feature_id", "tags", "geometry")

  test("adapt produces the S1 contract and BuildMain consumes it end-to-end") {
    val raw = QuackOsmAdapter.adapt(quackDf)
    assert(raw.columns.toSeq == Seq("id", "name", "tags", "wkt"))
    // bad WKB -> null wkt kept by default, droppable on request
    assert(raw.filter(col("wkt").isNull).count() == 1)
    assert(QuackOsmAdapter.adapt(quackDf, dropBadGeometry = true)
      .filter(col("wkt").isNull).count() == 0)

    // full recipe: adapted parquet -> BuildMain.run -> gazetteer tables
    val dir = java.nio.file.Files.createTempDirectory("graft-quack").toString
    QuackOsmAdapter.adapt(quackDf, dropBadGeometry = true)
      .write.mode("overwrite").parquet(s"$dir/raw")
    val ran = BuildMain.run(spark, s"$dir/raw",
      Settings(), outPath = Some(s"$dir/gaz"))
    assert(ran)
    val pois = spark.read.parquet(s"$dir/gaz/pois")
    val names = pois.select("name_local").as[String].collect().toSet
    assert(names == Set("Monograph Dining", "Monogram Cafe", "Pasar Seni"))
    val admin = spark.read.parquet(s"$dir/gaz/admin")
    assert(admin.count() == 1) // the relation with admin_level
  }

  test("tags and bbox filters mirror the reference CLI flags") {
    // --osm-tags-filter-file {"amenity": ["cafe"], "shop": []}
    val tf = quackDf.filter(QuackOsmAdapter.tagsFilter(
      Map("amenity" -> Seq("cafe"), "shop" -> Seq.empty)))
    assert(tf.select("feature_id").as[String].collect().toSet == Set("node/2", "way/3"))
    // --geom-filter-bbox around Kuala Lumpur: drops the 0,0 bench and
    // keeps overlapping envelopes (incl. the country multipolygon)
    val adapted = QuackOsmAdapter.adapt(quackDf, dropBadGeometry = true)
    val bf = adapted.transform(QuackOsmAdapter.bboxFilter(101.5, 3.0, 101.8, 3.3))
    assert(bf.select("id").count() == 4)
    assert(bf.columns.toSeq == adapted.columns.toSeq) // helper column dropped
    // empty filter map fails with a clear message, not reduceLeft noise
    val eEmpty = intercept[IllegalArgumentException](
      QuackOsmAdapter.tagsFilter(Map.empty))
    assert(eEmpty.getMessage.contains("at least one tag key"))
  }
}
