package graft.query

import graft.core.{Norm, Settings}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed many-to-many forward geocode — the "fuzzy join" form of
  * the reference's request/response path, for pipelines that geocode a
  * whole COLUMN of place names (the reference can only answer one HTTP
  * request at a time; a training-data pipeline needs this shape).
  *
  * One declarative program: queries are normalized in-plan
  * ([[Norm.normCol]]), joined to the gazetteer under the same
  * conjunctive token-containment predicate as `Repo.likePredicate`
  * (here with column-valued tokens via `forall`), scored with the same
  * weighted formula, and ranked per query with a window top-k.
  *
  * Scale shape: the query side of a micro-batch is small → broadcast;
  * the predicate join is a broadcast nested-loop against the (pruned,
  * bbox-laid-out) gazetteer scan, and only (query × candidate) survivors
  * reach scoring. The per-query window top-k shuffles survivors by qid —
  * at most k rows per query reach the result.
  */
object GeocodeJoin {

  /** `queries` must carry (`qid`, `text`). Returns per-qid top-k hits
    * with the same scoring surface as [[Ranking.rank]] minus proximity
    * (no per-query area hint in the bulk form). */
  def topK(queries: DataFrame, poiView: DataFrame,
           settings: Settings = Settings(), k: Int = 5): DataFrame = {
    val q = queries.select(
        col("qid"), col("text"),
        Norm.normCol(col("text")).as("qnorm"))
      .withColumn("toks", filter(split(col("qnorm"), " "), t => t =!= ""))
      .filter(size(col("toks")) > 0)

    val tokenPred = forall(col("toks"), t =>
      col("name_local_norm").contains(t) || col("name_en_norm").contains(t))

    // same raw-name fallback as Ranking.simTarget (ranking.py:69-70)
    def target(normCol: Column, rawCol: Column): Column =
      when(normCol.isNotNull && normCol =!= "", normCol)
        .otherwise(Norm.normCol(rawCol))
    val tLocal = target(col("name_local_norm"), col("name_local"))
    val tEn = target(col("name_en_norm"), col("name_en"))
    val sim = greatest(
      when(tLocal =!= "", graft.functions.wratio(col("qnorm"), tLocal)).otherwise(0.0),
      when(tEn =!= "", graft.functions.wratio(col("qnorm"), tEn)).otherwise(0.0)) / 100.0

    val score =
      lit(settings.wSimilarity) * sim +
        lit(settings.wType) * Ranking.typeBoost(settings) +
        lit(settings.wImportance) * coalesce(col("importance"), lit(0.0))

    poiView.join(broadcast(q), tokenPred)
      .withColumn("score", score)
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid")
          .orderBy(col("score").desc, col("osm_id").asc)))
      .filter(col("rank") <= k)
      .select(col("qid"), col("text"), col("rank"),
        coalesce(col("name_local"), col("name_en"), lit("")).as("name"),
        col("lat"), col("lon"), col("osm_id"), col("kind"), col("score"))
  }
}
