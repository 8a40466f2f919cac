package graft.etl

import graft.core.{Geo, Norm}
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Build-time ETL: raw OSM relational form → gazetteer tables
  * (reference: `scripts/build_gazetteer.py` + the SQL migrations).
  *
  * Input contract (FIXTURES.md §2.1, from `build_gazetteer.py:25-54`):
  * `tags map<string,string>` and a WKT geometry column named `wkt` are
  * required; `id bigint` and `name string` are optional. The reference's
  * dynamic `PRAGMA table_info` templating becomes schema introspection +
  * conditional `Column` construction (`df.schema.fieldNames`):
  * missing `name` → NULL arg (`build_gazetteer.py:41`), missing `id` →
  * synthesized unique id (`:42` — same "unique, arbitrary" contract).
  *
  * Both outputs are plain DataFrames; [[write]] persists them as Parquet
  * with a scale-conscious physical layout: `pois` range-partitioned and
  * sorted by `(lat, lon)` so bbox predicates prune Parquet row groups —
  * the Spark replacement for the reference's (ineffective) B-tree indexes
  * (SURVEY.md §4).
  */
object GazetteerBuilder {

  /** `gaz.name_local(n, t)` (`000_init.sql:14-19`). */
  private def nameLocal(name: Column, tags: Column): Column = {
    val t = element_at(tags, "name")
    when(name.isNotNull && name =!= "", name)
      .when(t.isNotNull && t =!= "", t)
  }

  /** `gaz.name_en(t)` (`000_init.sql:21`). */
  private def nameEn(tags: Column): Column =
    nullif(element_at(tags, "name:en"), lit(""))

  private def tagOrEmpty(tags: Column, k: String): Column =
    coalesce(element_at(tags, k), lit(""))

  private def tagOrNull(tags: Column, k: String): Column =
    nullif(element_at(tags, k), lit(""))

  /** Resolve the optional-column contract against the actual schema. */
  private def baseColumns(raw: DataFrame): (Column, Column) = {
    val fields = raw.schema.fieldNames.toSet
    val idExpr =
      if (fields.contains("id")) col("id").cast("long")
      else monotonically_increasing_id() // unique, arbitrary — matches ROW_NUMBER() OVER ()
    val nameExpr =
      if (fields.contains("name")) col("name") else lit(null).cast("string")
    require(fields.contains("wkt"),
      "raw table has no geometry column 'wkt' (build_gazetteer.py:38-39 errors likewise)")
    (idExpr, nameExpr)
  }

  /** `gaz.pois` (`001_pois.sql:4-52`): named, categorized POIs with
    * normalized names, centroid lat/lon, kind and importance. */
  def buildPois(raw: DataFrame): DataFrame = {
    val (idExpr, nameExpr) = baseColumns(raw)
    val tags = col("tags")
    val nl = nameLocal(nameExpr, tags)
    val categoryKeys = Seq("amenity", "shop", "tourism", "leisure", "office")

    val src = raw
      .filter(nl.isNotNull || nameEn(tags).isNotNull) // 001_pois.sql:13-14
      .filter(categoryKeys                            // 001_pois.sql:48-52
        .map(k => element_at(tags, k).isNotNull)
        .reduce(_ || _))
      .select(
        idExpr.as("osm_id"),
        nl.as("name_local"),
        nameEn(tags).as("name_en"),
        tags.as("tags"),
        Geo.geomSummaryUdf(col("wkt")).as("g"))
      // unparseable geometry → drop, like buildAdmin; a null lat/lon row
      // would poison serving (the reference's build fails loudly on bad
      // geometry instead — ST_GeomFromText errors)
      .filter(col("g").isNotNull)

    // kind: first-match CASE chain, category priority order is semantic
    // (001_pois.sql:32-39)
    val kindCol = categoryKeys
      .map(k => (tagOrEmpty(col("tags"), k) =!= "", concat(lit(k + ":"), element_at(col("tags"), k))))
      .foldRight(lit("unknown"): Column) { case ((cond, value), acc) =>
        when(cond, value).otherwise(acc)
      }

    // importance: capped additive flag score (001_pois.sql:40-46)
    val importance = least(
      lit(1.0),
      when(element_at(col("tags"), "wikidata").isNotNull, 0.40).otherwise(0.0) +
        when(tagOrEmpty(col("tags"), "tourism") =!= "", 0.25).otherwise(0.0) +
        when(tagOrEmpty(col("tags"), "amenity") =!= "", 0.20).otherwise(0.0) +
        when(tagOrEmpty(col("tags"), "shop") =!= "", 0.10).otherwise(0.0) +
        when(element_at(col("tags"), "website").isNotNull, 0.05).otherwise(0.0))

    src.select(
      col("osm_id"),
      col("name_local"),
      col("name_en"),
      Norm.canon(col("name_local")).as("name_local_norm"),
      Norm.canon(col("name_en")).as("name_en_norm"),
      tagOrEmpty(col("tags"), "amenity").as("amenity"),
      tagOrEmpty(col("tags"), "shop").as("shop"),
      tagOrEmpty(col("tags"), "tourism").as("tourism"),
      tagOrEmpty(col("tags"), "leisure").as("leisure"),
      tagOrEmpty(col("tags"), "office").as("office"),
      tagOrNull(col("tags"), "addr:city").as("city"),
      tagOrNull(col("tags"), "addr:state").as("state"),
      tagOrNull(col("tags"), "addr:country").as("country"),
      col("g.lat").as("lat"),
      col("g.lon").as("lon"),
      kindCol.as("kind"),
      importance.as("importance"))
  }

  /** `gaz.admin` (`002_admin.sql:3-24`): administrative boundaries with
    * envelope + center for bbox resolution. */
  def buildAdmin(raw: DataFrame): DataFrame = {
    val (idExpr, nameExpr) = baseColumns(raw)
    val tags = col("tags")
    val nl = nameLocal(nameExpr, tags)

    raw
      .filter(tagOrEmpty(tags, "boundary") === "administrative")
      .filter(col("wkt").isNotNull)
      .filter(nl.isNotNull || nameEn(tags).isNotNull)
      .select(
        idExpr.as("osm_id"),
        nl.as("name_local"),
        nameEn(tags).as("name_en"),
        Norm.canon(nl).as("name_local_norm"),
        Norm.canon(nameEn(tags)).as("name_en_norm"),
        expr("try_cast(nullif(element_at(tags, 'admin_level'), '') as int)")
          .as("admin_level"),
        tagOrNull(tags, "admin_level").as("admin_level_raw"),
        tagOrEmpty(tags, "ISO3166-1").as("iso1"),
        tagOrEmpty(tags, "ISO3166-2").as("iso2"),
        col("wkt").as("geom"),
        Geo.geomSummaryUdf(col("wkt")).as("g"))
      .filter(col("g").isNotNull)
      .select(
        col("osm_id"), col("name_local"), col("name_en"),
        col("name_local_norm"), col("name_en_norm"),
        col("admin_level"), col("admin_level_raw"), col("iso1"), col("iso2"),
        col("geom"),
        col("g.minx").as("minx"), col("g.miny").as("miny"),
        col("g.maxx").as("maxx"), col("g.maxy").as("maxy"),
        col("g.lat").as("center_lat"), col("g.lon").as("center_lon"))
  }

  /** Build metadata — the reference's `gaz_meta` six-row provenance
    * table (`build_gazetteer.py:75-110`: `duckdb_version`, `pbf`,
    * `quackosm_args`, `schema_version`, `built_at`, `artifact_path`, all
    * as (key, value) ROWS). Key-for-key analogue: `engine_version` ↔
    * `duckdb_version`, `source` ↔ `pbf`, `ingest_args` ↔
    * `quackosm_args`; `built_at` is a row like the reference's
    * `CAST(CURRENT_TIMESTAMP AS TEXT)`, not a column. Overwrite replaces
    * its DELETE+INSERT transaction. */
  def buildMeta(spark: SparkSession, source: String, outPath: String,
                ingestArgs: String = ""): DataFrame = {
    import spark.implicits._
    Seq(
      "engine_version" -> spark.version,
      "source" -> source,
      "ingest_args" -> ingestArgs,
      "schema_version" -> "1",
      "built_at" -> java.time.OffsetDateTime.now(java.time.ZoneOffset.UTC).toString,
      "artifact_path" -> outPath
    ).toDF("key", "value")
  }

  /** Persist the gazetteer with a layout that scales: `pois` sorted by
    * (lat, lon) so bbox BETWEEN predicates hit Parquet min/max pruning;
    * `admin` is small and stays broadcast-sized.
    *
    * `overwrite = false` reproduces the reference's idempotent-build
    * gate (`build_gazetteer.py:151-156`): an existing artifact short-
    * circuits the build. Returns true iff a build ran. */
  def write(spark: SparkSession, raw: DataFrame, outPath: String,
            source: String = "raw_osm", bucketTarget: Int = 0,
            overwrite: Boolean = true, ingestArgs: String = ""): Boolean = {
    val metaPath = new org.apache.hadoop.fs.Path(s"$outPath/meta")
    val fs = metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!overwrite && fs.exists(metaPath)) return false
    val pois = buildPois(raw)
    val poisPartitions =
      if (bucketTarget > 0) bucketTarget
      else math.max(1, spark.sparkContext.defaultParallelism / 2)
    pois
      .repartitionByRange(poisPartitions, col("lat"), col("lon"))
      .sortWithinPartitions("lat", "lon")
      .write.mode(SaveMode.Overwrite).parquet(s"$outPath/pois")
    buildAdmin(raw).coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$outPath/admin")
    buildMeta(spark, source, outPath, ingestArgs).coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$outPath/meta")
    // trigram name index: the physical design that keeps the LIKE
    // candidate scan subquadratic at scale (see TrigramIndex)
    TrigramIndex.write(spark.read.parquet(s"$outPath/pois"), s"$outPath/name_index")
    true
  }

  /** [[write]] under the versioned-pointer commit protocol
    * ([[graft.ext.VersionedStore]]) — the INCREMENTAL-REFRESH publish
    * the reference lacks (it rebuilds from scratch into a fixed path; a
    * 100 TB deployment applies an OSM change feed via
    * [[graft.ext.Cdc.applyChanges]] and republises). The full snapshot
    * (pois, admin, meta, name_index) stages as one dir and lands as
    * `root/v{N}` behind one atomic CURRENT flip, so a serving engine
    * ([[graft.query.ScoutEngine.reloadFrom]] pointed at
    * [[graft.ext.VersionedStore.resolveCurrent]]) always loads a
    * COMPLETE snapshot — old or new, never torn — and rollback is a
    * pointer flip back. Returns the published version path. */
  def writeVersioned(spark: SparkSession, raw: DataFrame, root: String,
                     source: String = "raw_osm", bucketTarget: Int = 0,
                     ingestArgs: String = ""): String = {
    val staging = graft.ext.VersionedStore.stagingFor(root)
    write(spark, raw, staging, source, bucketTarget,
      overwrite = true, ingestArgs = ingestArgs)
    graft.ext.VersionedStore.publish(spark, staging, root)
  }
}
