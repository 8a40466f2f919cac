package graft.query

import graft.core.{Geo, Norm, Settings}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scoring pipeline (reference: `ranking.py:31-114`), re-expressed as ONE
  * declarative DataFrame program instead of a Python row loop: the score
  * is a column expression, ranking is `orderBy(...).limit(k)` which
  * Catalyst executes as `TakeOrderedAndProject` — per-partition top-k,
  * only k rows ever reach the driver. That is what makes the same code
  * correct on 10k candidate rows and on a 1000-executor scan.
  *
  * Only the WRatio similarity crosses a UDF boundary (F14 has no
  * built-in equivalent); every other term — type boost, importance,
  * haversine proximity decay — is built-in column arithmetic inside
  * whole-stage codegen.
  */
object Ranking {

  /** The similarity target for one name: the precomputed canon'd norm
    * when non-empty, else the F2-normalized RAW name (`ranking.py:69-70`:
    * `local_norm or norm(name_local or "")`) — the fallback matters for
    * names whose canon form is empty (fully non-ASCII names: canon
    * strips non-ASCII, norm keeps it). */
  private def simTarget(normCol: Column, rawCol: Column): Column =
    when(normCol.isNotNull && normCol =!= "", normCol)
      .otherwise(Norm.normCol(rawCol))

  /** A1 — best similarity over (query texts × {local, en} targets),
    * `ranking.py:66-77`: per-candidate-text max of the two name targets,
    * `greatest` across texts. Empty targets score 0. */
  def bestSim(candTexts: Seq[String]): Column = {
    val qs = candTexts.map(Norm.norm).filter(_.nonEmpty)
    if (qs.isEmpty) lit(0.0)
    else {
      val targets = Seq(
        simTarget(col("name_local_norm"), col("name_local")),
        simTarget(col("name_en_norm"), col("name_en")))
      val sims = for (q <- qs; t <- targets) yield
        when(t =!= "", graft.functions.wratio(lit(q), t)).otherwise(0.0)
      (if (sims.size == 1) sims.head else greatest(sims: _*)) / 100.0
    }
  }

  /** F15 — ordered prefix-match type boost as a when-chain
    * (`ranking.py:34-38`; insertion order is semantic). */
  def typeBoost(settings: Settings): Column =
    typeBoost(settings.typeBoost, settings.typeBoostDefault)

  def typeBoost(boosts: Seq[(String, Double)], default: Double): Column =
    boosts.foldRight(lit(default): Column) { case ((prefix, v), acc) =>
      when(col("kind").startsWith(prefix), lit(v)).otherwise(acc)
    }

  /** F16 — linear proximity decay `max(0, 1 - min(d/km, 1))`
    * (`ranking.py:85-93`), guarded on coordinate presence. */
  def proximity(bbox: Bbox, proximityKm: Double): Column = {
    val d = Geo.haversineKm(col("lat"), col("lon"),
      lit(bbox.centerLat), lit(bbox.centerLon))
    when(col("lat").isNotNull && col("lon").isNotNull,
      greatest(lit(0.0), lit(1.0) - least(d / lit(proximityKm), lit(1.0))))
      .otherwise(lit(0.0))
  }

  /** F17 — weighted score; the proximity term only exists when an area
    * bbox resolved (`ranking.py:79-93`). */
  def score(candTexts: Seq[String], bbox: Option[Bbox],
            settings: Settings): Column = {
    val base =
      lit(settings.wSimilarity) * bestSim(candTexts) +
        lit(settings.wType) * typeBoost(settings) +
        lit(settings.wImportance) * coalesce(col("importance"), lit(0.0))
    bbox.fold(base)(b => base + lit(settings.wProximity) * proximity(b, settings.proximityKm))
  }

  /** O2 + F18 — score, rank, top-k. Tiebreak on osm_id ascending (the
    * reference's tie order is engine-dependent; ours is total,
    * SURVEY.md §7.4). */
  def rank(candidates: DataFrame, candTexts: Seq[String], bbox: Option[Bbox],
           settings: Settings, limit: Int): DataFrame =
    candidates
      .withColumn("score", score(candTexts, bbox, settings))
      .withColumn("name", coalesce(col("name_local"), col("name_en"), lit("")))
      .select("name", "lat", "lon", "country", "state", "city",
              "osm_id", "kind", "score")
      .orderBy(col("score").desc, col("osm_id").asc)
      .limit(limit)

  /** Driver-side SCALAR twin of [[score]] — the in-process serving fast
    * path's scorer (the reference answers one request in-process against
    * DuckDB, `app.py:86-114`; when the packed-postings probe yields a
    * small candidate set, this scores it on the driver and the request
    * launches NO Spark job). Term-for-term the same arithmetic, in the
    * same association order, over the same scalar twins the column form
    * composes ([[graft.core.Fuzz.wratio]], [[graft.core.Geo.haversineKm]],
    * [[graft.core.Norm.norm]]) — bit-equal scores, parity spec-pinned
    * (`ScoutEngineSpec`). `lat`/`lon` carry no null guard because the
    * serving view filters coordinate-less rows out up front. */
  def scoreScalar(candTexts: Seq[String], bbox: Option[Bbox], settings: Settings,
                  nameLocal: String, nameEn: String,
                  nameLocalNorm: String, nameEnNorm: String,
                  kind: String, importance: Option[Double],
                  lat: Double, lon: Double): Double = {
    val qs = candTexts.map(Norm.norm).filter(_.nonEmpty)
    val sim =
      if (qs.isEmpty) 0.0
      else {
        def target(n: String, raw: String): String =
          if (n != null && n.nonEmpty) n else Norm.norm(raw)
        val ts = Seq(target(nameLocalNorm, nameLocal), target(nameEnNorm, nameEn))
        val sims = for (q <- qs; t <- ts)
          yield if (t.nonEmpty) graft.core.Fuzz.wratio(q, t) else 0.0
        sims.max / 100.0
      }
    val k = if (kind == null) "" else kind
    // first matching prefix wins, in declaration order — the when-chain's
    // evaluation order ([[typeBoost]])
    val boost = settings.typeBoost.collectFirst {
      case (p, v) if k.startsWith(p) => v
    }.getOrElse(settings.typeBoostDefault)
    val base =
      settings.wSimilarity * sim +
        settings.wType * boost +
        settings.wImportance * importance.getOrElse(0.0)
    bbox.fold(base) { b =>
      val d = Geo.haversineKm(lat, lon, b.centerLat, b.centerLon)
      val prox = math.max(0.0, 1.0 - math.min(d / settings.proximityKm, 1.0))
      base + settings.wProximity * prox
    }
  }
}
