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

  /** Normalized query side: (qid, text, qnorm, toks), empty-token rows
    * dropped (`app.py:96-97`'s empty-request short-circuit, join form). */
  private def prepQueries(queries: DataFrame): DataFrame =
    queries.select(
        col("qid"), col("text"),
        Norm.normCol(col("text")).as("qnorm"))
      .withColumn("toks", filter(split(col("qnorm"), " "), t => t =!= ""))
      .filter(size(col("toks")) > 0)

  /** P5 with column-valued tokens (`forall` over the query's token
    * array). */
  private val tokenPred: Column = forall(col("toks"), t =>
    col("name_local_norm").contains(t) || col("name_en_norm").contains(t))

  /** Score + per-key window top-k over joined (poiView × query)
    * survivor rows — shared by the broadcast and the indexed path so
    * both produce identical hits by construction. `keyCols` is the
    * per-query partition key: (qid, text) on the direct path, the
    * normalized text alone on the deduplicated bulk path (where the
    * caller re-attaches qids after ranking). */
  private def rankTopKKeyed(cands: DataFrame, settings: Settings, k: Int,
                            keyCols: Seq[String]): DataFrame = {
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

    cands
      .withColumn("score", score)
      .withColumn("rank", row_number().over(
        Window.partitionBy(keyCols.map(col): _*)
          .orderBy(col("score").desc, col("osm_id").asc)))
      .filter(col("rank") <= k)
      .select(keyCols.map(col) ++ Seq(col("rank"),
        coalesce(col("name_local"), col("name_en"), lit("")).as("name"),
        col("lat"), col("lon"), col("osm_id"), col("kind"), col("score")): _*)
  }

  private def rankTopK(cands: DataFrame, settings: Settings, k: Int): DataFrame =
    rankTopKKeyed(cands, settings, k, Seq("qid", "text"))
      .select(col("qid"), col("text"), col("rank"), col("name"),
        col("lat"), col("lon"), col("osm_id"), col("kind"), col("score"))

  /** `queries` must carry (`qid`, `text`). Returns per-qid top-k hits
    * with the same scoring surface as [[Ranking.rank]] minus proximity
    * (no per-query area hint in the bulk form). Micro-batch shape: the
    * query side broadcasts. For query sides too big to broadcast use
    * [[topKIndexed]]. */
  def topK(queries: DataFrame, poiView: DataFrame,
           settings: Settings = Settings(), k: Int = 5): DataFrame =
    rankTopK(poiView.join(broadcast(prepQueries(queries)), tokenPred), settings, k)

  /** Large-query-side form: queries are DEDUPLICATED by normalized
    * text first (every downstream stage is a pure function of qnorm;
    * qids re-attach after ranking), candidate pairs come from the
    * trigram name index (`TrigramIndex.candidateIdsBulk` — token
    * explode → posting equality join → count checks), the exact
    * predicate re-verifies the superset, and scoring/ranking is shared
    * with [[topK]].
    *
    * Any query with AT LEAST one gram-sized token rides the index:
    * `candidateIdsBulk` conjuncts only the indexable tokens and the
    * exact predicate re-verifies the short ones, so the residue is
    * queries whose tokens are ALL shorter than the gram size. That
    * residue is broadcast only while it is provably small
    * (`maxFallbackBroadcast` rows); a pathological corpus of 1–2-char
    * queries instead takes a PARTITIONED nested loop
    * (`shuffle_replicate_nl`) — quadratic like any unindexable
    * containment join, but nothing large is ever broadcast. Result
    * equality with [[topK]] is spec-pinned; no step broadcasts or sorts
    * the full query side.
    *
    * EAGERNESS CONTRACT: the residue route is decided by a bounded
    * count run AT CALL TIME (a join strategy cannot switch inside one
    * static plan), so this builder launches a small job, and a plan
    * built long before execution keeps the route chosen from the data
    * as of the call. Callers that build plans ahead of mutable inputs
    * should pass `maxFallbackBroadcast = 0` to pin the
    * never-broadcast route.
    *
    * PAIR BOUNDS (the two knobs that keep a low-diversity vocabulary —
    * where thousands of names share every token — from going quadratic
    * at scale):
    *  - `maxDf` cuts ubiquitous grams out of the posting probe
    *    ([[graft.etl.TrigramIndex.candidateIdsBulk]]); correctness-
    *    neutral for ANY value (superset + exact re-verify).
    *  - `maxCandidatesPerQuery` caps how many VERIFIED candidates per
    *    query reach WRatio scoring, keeping the expensive stage linear
    *    in queries instead of quadratic in (queries × same-token
    *    names). Candidates are kept by a cheap score proxy (smallest
    *    name-length distance to the query, osm_id tiebreak — WRatio is
    *    length-ratio-bounded, so far-length candidates are the right
    *    ones to shed) — EXACT whenever every query has ≤ cap verified
    *    candidates (the window just counts), approximate top-k above
    *    it; deterministic either way. */
  def topKIndexed(queries: DataFrame, poiView: DataFrame, index: DataFrame,
                  settings: Settings = Settings(), k: Int = 5,
                  maxFallbackBroadcast: Long = 5000L,
                  maxDf: Long = Long.MaxValue,
                  maxCandidatesPerQuery: Int = Int.MaxValue): DataFrame = {
    val q = prepQueries(queries)
    // DEDUP BY NORMALIZED TEXT: candidates, verification, and scoring
    // depend only on qnorm (toks is a pure function of it), so every
    // stage below runs once per DISTINCT query text and the qids
    // re-attach after ranking. Bulk geocode workloads are Zipfian in
    // surface forms — popular place names repeat constantly — so this
    // collapses the candidate fan-out AND the WRatio stage by the
    // duplication factor, exactly (same score, same osm_id tiebreak →
    // same ranked list for every duplicate).
    // (route split BEFORE the dedup aggregate: the split predicate is a
    // pure function of the text, and keeping the filters directly on
    // the query relation lets Catalyst fold a provably-empty residue
    // away — ConvertToLocalRelation can't see through an Aggregate)
    val indexable = exists(col("toks"),
      t => length(t) >= graft.etl.TrigramIndex.N)
    def uniq(side: DataFrame): DataFrame =
      side.select(col("qnorm"), col("toks")).dropDuplicates("qnorm")
    val uqIdx = uniq(q.filter(indexable))
    val uqRest = uniq(q.filter(!indexable))
    val pairs = graft.etl.TrigramIndex.candidateIdsBulk(
        index, uqIdx.select(col("qnorm").as("qid"), col("toks")), maxDf)
      .withColumnRenamed("qid", "qnorm")
    val idxCands = poiView.join(pairs, Seq("osm_id"))
      .join(uqIdx, Seq("qnorm"))
      .filter(tokenPred)
    // bounded count: one cheap action decides the route, and the limit
    // keeps the decision O(threshold) however large the residue is
    // (threshold counts DISTINCT unindexable texts)
    val restSmall =
      uqRest.limit((maxFallbackBroadcast + 1).toInt).count() <= maxFallbackBroadcast
    val restCands =
      if (restSmall) poiView.join(broadcast(uqRest), tokenPred)
      else poiView.join(uqRest.hint("shuffle_replicate_nl"), tokenPred)
    // EXPLICIT-width repartition by the window key, on the BULK path
    // only (topK's micro-batches would just gain empty-task latency):
    // the WRatio projection is CPU-bound, and AQE's byte-based
    // coalescing would shrink the survivor shuffle to 1-3 partitions
    // and serialize the scoring — measured 3x on g11. A user-numbered
    // repartition is exempt from coalescing, and the ranking window
    // reuses the hash(qnorm) distribution, so no extra shuffle.
    val width = queries.sparkSession.sessionState.conf.numShufflePartitions
    val unioned = idxCands.unionByName(restCands)
    // pair bound: shed far-length candidates BEFORE the WRatio
    // projection (the CPU-heavy stage). A `row_number <= cap` filter
    // is Spark 4's WindowGroupLimit pattern; left on its OWN exchange
    // (no user repartition upstream) the planner splits it into a
    // PARTIAL group-limit below the shuffle and a Final above, so a
    // single ubiquitous query text whose candidates span the whole
    // gazetteer is pruned WHERE ITS ROWS SIT — each map partition
    // forwards ≤ cap rows per text, in codegen, and the final window
    // task handles ≤ partitions × cap rows per text. The skew
    // treatment comes free with the declarative form
    // (`GeocodeJoinSpec` pins the Partial pass; a hand-rolled
    // mapPartitions heap prune measured 30-75% SLOWER here from
    // typed-Row serialization). The explicit-width repartition for the
    // CPU-bound scoring stage then moves only the capped survivors.
    val capped =
      if (maxCandidatesPerQuery == Int.MaxValue)
        unioned.repartition(width, col("qnorm"))
      else {
        val qLen = length(col("qnorm"))
        def lenDist(c: Column): Column =
          when(c.isNotNull && c =!= "", abs(length(c) - qLen))
            .otherwise(lit(Int.MaxValue))
        val proxy = least(lenDist(col("name_local_norm")), lenDist(col("name_en_norm")))
        unioned
          .withColumn("cap_rk", row_number().over(
            Window.partitionBy("qnorm").orderBy(proxy.asc, col("osm_id").asc)))
          .filter(col("cap_rk") <= maxCandidatesPerQuery)
          .drop("cap_rk")
          .repartition(width, col("qnorm"))
      }
    // rank once per distinct text, then re-expand to every (qid, text)
    // that normalizes to it
    rankTopKKeyed(capped, settings, k, Seq("qnorm"))
      .join(q.select("qid", "text", "qnorm"), Seq("qnorm"))
      .select(col("qid"), col("text"), col("rank"), col("name"),
        col("lat"), col("lon"), col("osm_id"), col("kind"), col("score"))
  }
}
