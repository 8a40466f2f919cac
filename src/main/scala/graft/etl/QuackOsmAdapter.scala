package graft.etl

import graft.core.Wkb
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Adapter from QuackOSM's GeoParquet layout to the S1 raw-relational
  * contract [[GazetteerBuilder]] consumes — the missing first mile for
  * a user coming from the reference, whose build shells out to QuackOSM
  * (`scripts/build_gazetteer.py:158-180`) and then migrates inside
  * DuckDB. Here the same pipeline is:
  *
  * {{{
  * quackosm region.osm.pbf --compact-tags --output raw/   # (or any GeoParquet)
  * val raw = QuackOsmAdapter.adapt(spark.read.parquet("raw/"))
  * BuildMain.run(spark, <adapted path>, settings)          // or GazetteerBuilder.write
  * }}}
  *
  * Input contract (QuackOSM defaults): `feature_id` string like
  * `"node/240109189"`, `tags` map<string,string> (compact-tags form),
  * `geometry` ISO-WKB binary. Output: `(id, name, tags, wkt)` — the
  * S1 shape, ready for [[GazetteerBuilder]]/[[BuildMain]].
  *
  * The reference CLI's geometry/tag filters map to plain DataFrame
  * filters here (run BEFORE the WKB decode so dropped features never
  * pay for parsing):
  *  - `--geom-filter-bbox minx,miny,maxx,maxy` →
  *    `.transform(bboxFilter(...))` (envelope-overlap on the decoded
  *    geometry — apply after adapt)
  *  - `--osm-tags-filter-file {"amenity": ["cafe"]}` → [[tagsFilter]]
  *  - `--explode-tags` has no equivalent because nothing needs one:
  *    the engine consumes the map form directly (`element_at`).
  */
object QuackOsmAdapter {

  /** Feature type prefixes get disjoint id spaces: OSM node/way/relation
    * ids are independent sequences, so the raw numeric suffix alone
    * would collide. OSM ids are < 2^40; the stride keeps each family
    * distinct and the result positive. */
  private val TypeStride = 1L << 41
  private val TypeIdx = Map("node" -> 0L, "way" -> 1L, "relation" -> 2L)

  private[etl] def parseFeatureId(fid: String): Long = {
    val slash = if (fid == null) -1 else fid.indexOf('/')
    require(slash > 0 && slash < fid.length - 1, s"malformed feature_id '$fid'")
    val idx = TypeIdx.getOrElse(fid.substring(0, slash),
      throw new IllegalArgumentException(s"unknown feature type in '$fid'"))
    idx * TypeStride + fid.substring(slash + 1).toLong
  }

  private val featureIdUdf = udf((fid: String) => parseFeatureId(fid))

  /** WKB → WKT at the ingest boundary (same build-time UDF precedent as
    * `Geo.geomSummaryUdf`); malformed geometry → null, and the caller
    * chooses [[adapt]]'s `dropBadGeometry` policy. */
  private val wkbToWktUdf = udf((b: Array[Byte]) =>
    if (b == null) null
    else try Wkb.toWkt(b) catch { case _: IllegalArgumentException => null })

  /** QuackOSM GeoParquet → S1 raw contract `(id, name, tags, wkt)`.
    *
    * `dropBadGeometry = false` (default) keeps rows whose WKB failed to
    * decode with `wkt = null` so the build's own geometry handling
    * decides (GazetteerBuilder drops unparseable geometry rows, logged
    * by count); `true` drops them here. */
  def adapt(quack: DataFrame, dropBadGeometry: Boolean = false): DataFrame = {
    val out = quack.select(
      featureIdUdf(col("feature_id")).as("id"),
      element_at(col("tags"), "name").as("name"),
      col("tags"),
      wkbToWktUdf(col("geometry")).as("wkt"))
    if (dropBadGeometry) out.filter(col("wkt").isNotNull) else out
  }

  /** `--osm-tags-filter-file` equivalent: keep features where SOME
    * listed key matches (empty value-set = any value, like the QuackOSM
    * `true` form). Apply BEFORE [[adapt]] — it prunes on the tags map
    * alone, so dropped features never pay for WKB decoding.
    *
    * An empty map is rejected: a caller translating an empty
    * `--osm-tags-filter-file` should skip the filter entirely (QuackOSM
    * with no filter keeps everything), and silently returning
    * `lit(true)` would hide that a filter file failed to parse. */
  def tagsFilter(filter: Map[String, Seq[String]]): Column = {
    require(filter.nonEmpty,
      "tagsFilter needs at least one tag key; omit the filter to keep all features")
    filter.map { case (k, vs) =>
      val present = element_at(col("tags"), k).isNotNull
      if (vs.isEmpty) present
      else present && element_at(col("tags"), k).isInCollection(vs)
    }.reduceLeft(_ || _)
  }

  /** `--geom-filter-bbox` equivalent, applied AFTER [[adapt]] via
    * `.transform(...)`: keep features whose envelope overlaps the box.
    * Envelope-overlap (not exact intersection) mirrors the prefilter
    * role the CLI flag plays — the gazetteer's own bbox predicates
    * re-verify downstream. A DataFrame transform rather than a Column:
    * the summary UDF (a full WKT parse — megabytes for a country
    * multipolygon) must be PROJECTED to an attribute once, because a
    * filter predicate referencing one UDF expression five times
    * re-evaluates it five times (no subexpression elimination in
    * predicates — the ta_lang_unicode lesson at the ingest boundary). */
  def bboxFilter(minx: Double, miny: Double, maxx: Double, maxy: Double)(
      df: DataFrame): DataFrame = {
    val g = col("__geo_summary")
    df.withColumn("__geo_summary", graft.core.Geo.geomSummaryUdf(col("wkt")))
      .filter(g.isNotNull &&
        !(g.getField("minx") > maxx || g.getField("maxx") < minx ||
          g.getField("miny") > maxy || g.getField("maxy") < miny))
      .drop("__geo_summary")
  }
}
