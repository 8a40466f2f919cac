package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Resolved area bounding box (reference: `repo.py:16-45` returns the
  * 6-tuple `(minx, miny, maxx, maxy, center_lat, center_lon)`). */
case class Bbox(minx: Double, miny: Double, maxx: Double, maxy: Double,
                centerLat: Double, centerLon: Double)

/** Candidate retrieval over the gazetteer (reference: `repo.py`).
  *
  * The two-phase area-restriction lookup is kept deliberately: phase A
  * resolves ONE admin row (`limit(1).collect()` → `TakeOrderedAndProject`,
  * no shuffle of the big side), and its scalars feed BOTH the bbox range
  * predicate and the proximity term of the score — the same scalar reuse
  * the reference does in Python (`app.py:100-113`). At scale this is a
  * broadcast of 6 doubles, not a join.
  */
object Repo {

  /** P5 — token containment predicate (`repo.py:5-13`): conjunctive
    * across tokens, disjunctive across columns; empty tokens → true.
    * `Column.contains` == `LIKE '%tok%'` (tokens are already stripped of
    * LIKE metachars by normalization, as in the reference). */
  def likePredicate(tokens: Seq[String], cols: Seq[Column]): Column =
    if (tokens.isEmpty) lit(true)
    else tokens.map(t => cols.map(_.contains(t)).reduce(_ || _)).reduce(_ && _)

  /** P6 — bbox range predicate (`repo.py:57-61`). */
  def bboxPredicate(bbox: Bbox): Column =
    col("lat").between(bbox.miny, bbox.maxy) &&
      col("lon").between(bbox.minx, bbox.maxx)

  /** O1/F19 — largest-area-first top-1 admin row for a token filter +
    * level predicate (`repo.py:16-45`), as an UNCOLLECTED 1-row plan so
    * both hint levels can ride one job. Deterministic tiebreak on osm_id
    * (a documented tightening over the reference's engine-order tie,
    * SURVEY.md §7.4). */
  private def topAreaPlan(admin: DataFrame, tokens: Seq[String],
                          levelPred: Column, prio: Int): DataFrame = {
    val pred = likePredicate(tokens, Seq(col("name_local_norm"), col("name_en_norm")))
    val area = (col("maxx") - col("minx")) * (col("maxy") - col("miny"))
    admin
      .filter(pred && levelPred)
      .orderBy(area.desc, col("osm_id").asc)
      .limit(1)
      .select(lit(prio).as("prio"), col("minx"), col("miny"),
        col("maxx"), col("maxy"), col("center_lat"), col("center_lon"))
  }

  /** Whitespace-lowercase tokenization used only for area hints
    * (`repo.py:20-23` `_norm_tokens` — simpler than F2 by design). */
  def hintTokens(s: Option[String]): Seq[String] =
    s.toSeq.flatMap(_.toLowerCase(java.util.Locale.ROOT).split("\\s+")).filter(_.nonEmpty)

  /** J1 phase A — city hint first (admin_level >= 6), else country
    * (admin_level = 2) (`repo.py:16-45`, P7).
    *
    * Both levels resolve in ONE Spark action: each side is a
    * TakeOrderedAndProject over the (small, cached) admin table, their
    * 0/1-row results union, and the priority column re-creates the
    * reference's sequential city-then-country fallback — previously a
    * missing city hit cost a second driver round-trip. */
  def resolveAreaBbox(admin: DataFrame, cityHint: Option[String],
                      country: Option[String]): Option[Bbox] = {
    val sides = Seq(
      (hintTokens(cityHint), col("admin_level") >= 6, 1),
      (hintTokens(country), col("admin_level") === 2, 2))
      .collect { case (toks, pred, prio) if toks.nonEmpty =>
        topAreaPlan(admin, toks, pred, prio) }
    if (sides.isEmpty) return None
    sides.reduce(_ unionByName _)
      .orderBy(col("prio").asc)
      .limit(1)
      .collect()
      .headOption
      .map(r => Bbox(r.getDouble(1), r.getDouble(2), r.getDouble(3),
                     r.getDouble(4), r.getDouble(5), r.getDouble(6)))
  }

  /** J1 phase B + P8 — candidate fetch (`repo.py:48-71`): token LIKE
    * conjunction over the normalized name columns, optional bbox range,
    * scan cap BEFORE scoring. The cap bounds scoring work exactly like
    * the reference; which rows survive an over-full cap is
    * engine-dependent there too (SURVEY.md P8). */
  def fetchCandidates(poiView: DataFrame, nameTokens: Seq[String],
                      bbox: Option[Bbox], limitScan: Int = 10000): DataFrame = {
    val namePred = likePredicate(
      nameTokens, Seq(col("name_local_norm"), col("name_en_norm")))
    val withBbox = bbox.map(b => namePred && bboxPredicate(b)).getOrElse(namePred)
    poiView.filter(withBbox).limit(limitScan)
  }
}
