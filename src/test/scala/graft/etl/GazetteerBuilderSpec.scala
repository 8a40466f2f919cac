package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class GazetteerBuilderSpec extends SparkSpec {

  private val fullSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("tags", MapType(StringType, StringType)),
    StructField("wkt", StringType)))

  private def df(rows: Seq[Row], schema: StructType = fullSchema) =
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)

  test("pois: name fallback, category filter, kind priority, importance cap") {
    val raw = df(Seq(
      // explicit name wins
      Row(1L, "Explicit", Map("amenity" -> "cafe", "name" -> "TagName"), "POINT(1 2)"),
      // name NULL -> tags name
      Row(2L, null, Map("shop" -> "mart", "name" -> "FromTags"), "POINT(3 4)"),
      // no names at all -> dropped
      Row(3L, null, Map("amenity" -> "x"), "POINT(5 6)"),
      // named but no category tag -> dropped
      Row(4L, "NoCat", Map("building" -> "yes"), "POINT(7 8)"),
      // amenity beats shop in kind chain; all importance flags on -> capped at 1.0
      Row(5L, "Both", Map("amenity" -> "a", "shop" -> "s", "tourism" -> "t",
        "wikidata" -> "Q5", "website" -> "w"), "POINT(9 10)")))
    val pois = GazetteerBuilder.buildPois(raw).collect().map(r => r.getLong(0) -> r).toMap
    assert(pois.keySet == Set(1L, 2L, 5L))
    assert(pois(1L).getString(1) == "Explicit")
    assert(pois(2L).getString(1) == "FromTags")
    assert(pois(5L).getString(15) == "amenity:a") // kind priority
    assert(pois(5L).getDouble(16) == 1.0) // 0.40+0.25+0.20+0.10+0.05 capped
    assert(pois(1L).getDouble(13) == 2.0 && pois(1L).getDouble(14) == 1.0) // lat/lon
  }

  test("static PoisSchema/AdminSchema match the builders (the no-inference read contract)") {
    val raw = df(Seq(
      Row(1L, "Cafe", Map("amenity" -> "cafe", "boundary" -> "administrative",
        "admin_level" -> "4"), "POINT(1 2)")))
    def names(s: StructType) = s.fields.map(f => f.name -> f.dataType).toSeq
    assert(names(GazetteerBuilder.buildPois(raw).schema) ==
      names(GazetteerBuilder.PoisSchema))
    assert(names(GazetteerBuilder.buildAdmin(raw).schema) ==
      names(GazetteerBuilder.AdminSchema))
  }

  test("pois: unparseable geometry rows are dropped (never null coords in serving)") {
    val raw = df(Seq(
      Row(1L, "Good", Map("amenity" -> "a"), "POINT(1 2)"),
      Row(2L, "BadGeom", Map("amenity" -> "a"), "GEOMETRYCOLLECTION(POINT(1 2))"),
      Row(3L, "NullGeom", Map("amenity" -> "a"), null)))
    val ids = GazetteerBuilder.buildPois(raw).collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L))
  }

  test("pois: missing id column synthesizes unique ids; missing name -> tags only") {
    val schema = StructType(Seq(
      StructField("tags", MapType(StringType, StringType)),
      StructField("wkt", StringType)))
    val raw = df(Seq(
      Row(Map("amenity" -> "a", "name" -> "A"), "POINT(0 0)"),
      Row(Map("amenity" -> "b", "name" -> "B"), "POINT(1 1)")), schema)
    val ids = GazetteerBuilder.buildPois(raw).collect().map(_.getLong(0))
    assert(ids.distinct.length == 2) // unique, arbitrary
  }

  test("missing wkt column is a hard error (matches reference abort)") {
    val schema = StructType(Seq(
      StructField("tags", MapType(StringType, StringType))))
    val raw = df(Seq(Row(Map("amenity" -> "a"))), schema)
    intercept[IllegalArgumentException] {
      GazetteerBuilder.buildPois(raw)
    }
  }

  test("admin: boundary filter, try_cast admin_level, envelope + center") {
    val raw = df(Seq(
      Row(1L, "Country", Map("boundary" -> "administrative", "admin_level" -> "2",
        "ISO3166-1" -> "MY"), "POLYGON((0 0, 4 0, 4 2, 0 2, 0 0))"),
      Row(2L, "BadLevel", Map("boundary" -> "administrative", "admin_level" -> "x"),
        "POINT(1 1)"),
      Row(3L, "NotAdmin", Map("boundary" -> "census"), "POINT(2 2)"),
      Row(4L, "NoGeom", Map("boundary" -> "administrative"), null)))
    val admin = GazetteerBuilder.buildAdmin(raw).collect().map(r => r.getLong(0) -> r).toMap
    assert(admin.keySet == Set(1L, 2L))
    val c = admin(1L)
    assert(c.getInt(5) == 2) // admin_level parsed
    assert(admin(2L).isNullAt(5)) // non-numeric -> NULL
    assert(admin(2L).getString(6) == "x") // raw kept
    assert((c.getDouble(10), c.getDouble(11), c.getDouble(12), c.getDouble(13)) ==
      (0.0, 0.0, 4.0, 2.0))
    assert(c.getDouble(14) == 1.0 && c.getDouble(15) == 2.0) // center lat/lon
  }

  test("write/read round trip preserves schema and rows; overwrite gate skips rebuilds") {
    val raw = df(Seq(
      Row(1L, "A", Map("amenity" -> "cafe"), "POINT(1 2)"),
      Row(2L, "B", Map("boundary" -> "administrative", "admin_level" -> "2"), "POINT(3 4)")))
    val out = java.nio.file.Files.createTempDirectory("gaz-test").toString
    assert(GazetteerBuilder.write(spark, raw, out, source = "spec"))
    assert(spark.read.parquet(s"$out/pois").count() == 1)
    assert(spark.read.parquet(s"$out/admin").count() == 1)
    val meta = spark.read.parquet(s"$out/meta").collect()
    // S6: the reference's six provenance keys as (key, value) ROWS
    // (build_gazetteer.py:91-99), key-for-key analogues
    assert(meta.map(_.getString(0)).toSet == Set(
      "engine_version", "source", "ingest_args", "schema_version",
      "built_at", "artifact_path"))
    assert(meta.map(_.schema.fieldNames.toSeq).forall(_ == Seq("key", "value")))
    val kv = meta.map(r => r.getString(0) -> r.getString(1)).toMap
    assert(kv("source") == "spec" && kv("artifact_path") == out)
    assert(kv("built_at").nonEmpty && kv("engine_version") == spark.version)
    // existing artifact + overwrite=false -> build skipped (S5)
    assert(!GazetteerBuilder.write(spark, raw, out, source = "spec", overwrite = false))
    assert(GazetteerBuilder.write(spark, raw, out, source = "spec"))
  }

  test("BuildMain wires settings: db_path target, overwrite gate, pbf_url provenance") {
    val raw = df(Seq(Row(1L, "A", Map("amenity" -> "cafe"), "POINT(1 2)")))
    val rawPath = java.nio.file.Files.createTempDirectory("gaz-raw").toString
    raw.write.mode("overwrite").parquet(rawPath)
    val out = java.nio.file.Files.createTempDirectory("gaz-built").toString + "/gaz"
    val s = graft.core.Settings(dbPath = out, pbfUrl = "https://example.org/x.pbf")
    // first build runs; second is gated by buildOverwrite=false (the
    // reference's idempotent skip); OVERWRITE-style true rebuilds
    assert(BuildMain.run(spark, rawPath, s, cliArgs = Seq("spec-run")))
    assert(!BuildMain.run(spark, rawPath, s))
    assert(BuildMain.run(spark, rawPath, s.copy(buildOverwrite = true)))
    val kv = spark.read.parquet(s"$out/meta").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(kv("source") == "https://example.org/x.pbf")
    assert(kv("artifact_path") == out)
  }
}
