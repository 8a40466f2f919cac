package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Character-trigram inverted index over the gazetteer's normalized name
  * columns — the physical design that keeps the reference's
  * `LIKE '%token%'` candidate scan (P5) off a full table scan at scale.
  *
  * The reference's B-tree indexes are useless for leading-wildcard LIKE
  * (SURVEY.md §1.3); the classic fix is a trigram index: `col CONTAINS t`
  * implies every trigram of `t` occurs in `col`, so intersecting posting
  * lists yields a candidate superset, and the exact predicate re-verifies
  * on that reduced set. False negatives are impossible by construction;
  * false positives are filtered by the verify step — result equality
  * with the scan path is asserted in the spec.
  *
  * Scale shape: the index is (gram, col, osm_id) — build is one
  * explode + distinct; a query is k posting-list lookups (equality
  * predicates → Parquet min/max pruning when sorted by gram) + a
  * semi-join, instead of a substring match over every name in 100 TB.
  */
object TrigramIndex {

  val N = 3

  def grams(s: String): Seq[String] =
    if (s == null || s.length < N) Seq.empty
    else s.sliding(N).toIndexedSeq

  /** Build the posting table from `pois` (works for `admin` too): one row
    * per (gram, source column, osm_id). */
  def build(pois: DataFrame): DataFrame = {
    val spark = pois.sparkSession
    import spark.implicits._
    pois.select(col("osm_id"), col("name_local_norm"), col("name_en_norm"))
      .as[(Long, String, String)]
      .flatMap { case (id, local, en) =>
        grams(local).map(g => (g, 0, id)) ++ grams(en).map(g => (g, 1, id))
      }
      .toDF("gram", "col_id", "osm_id")
      .distinct()
  }

  /** Sorted-by-gram layout so per-gram equality probes prune row groups.
    * `partitions == 1` coalesces (one globally-sorted file, no bounds-
    * sampling job / shuffle — the [[graft.ext.IndexIO.sortedLayout]]
    * idiom); wider layouts range-partition. */
  def write(pois: DataFrame, outPath: String, partitions: Int = 8): Unit =
    (if (partitions == 1) build(pois).coalesce(1)
     else build(pois).repartitionByRange(partitions, col("gram")))
      .sortWithinPartitions("gram", "col_id", "osm_id")
      .write.mode(SaveMode.Overwrite).parquet(outPath)

  /** Posting-list sizes, `(gram, df)` — the statistics table behind the
    * `maxDf` probe cut in [[candidateIdsBulk]]. One partial-aggregatable
    * pass over the index; persist it next to the index at build time so
    * serving-path queries don't re-aggregate 100 TB of postings. */
  def gramDfOf(index: DataFrame): DataFrame =
    index.groupBy(col("gram")).agg(count(lit(1)).as("df"))

  /** ids of rows where SOME name column contains every gram of EVERY
    * token — the candidate superset for the P5 predicate. Tokens shorter
    * than the gram size can't be indexed; None → caller falls back to
    * the scan path.
    *
    * ONE aggregation pass for the whole probe (the serving-latency
    * lever: the former per-token groupBy→filter→distinct chains joined
    * pairwise cost 2 shuffles + a join PER TOKEN of fixed scheduling
    * latency per request). The token set is request literals, so every
    * token×column containment check compiles to a conditional count in
    * a single `groupBy(osm_id)` — and because the index is DISTINCT by
    * construction (one row per (gram, col_id, osm_id)), plain `count`
    * equals `countDistinct(gram)` with no Expand. A row is a candidate
    * iff for EVERY token SOME column counted all of the token's grams —
    * the same set the per-token form produced (column may differ per
    * token there too, via its per-(osm_id, col_id) check then
    * id-distinct union). Map-side partial aggregation absorbs the
    * posting fan-out; the downstream semi-join sees a relation tiny
    * enough to broadcast. */
  def candidateIds(index: DataFrame, tokens: Seq[String]): Option[DataFrame] = {
    val indexable = tokens.filter(_.length >= N)
    if (indexable.isEmpty || indexable.size != tokens.size) return None
    val gramSets = indexable.map(t => grams(t).distinct)
    val allGrams = gramSets.flatten.distinct
    val aggs = gramSets.zipWithIndex.flatMap { case (gs, i) => Seq(
      count(when(col("col_id") === 0 && col("gram").isInCollection(gs), 1)).as(s"l$i"),
      count(when(col("col_id") === 1 && col("gram").isInCollection(gs), 1)).as(s"e$i"))
    }
    val everyTokenSomeColumn = gramSets.zipWithIndex.map { case (gs, i) =>
      col(s"l$i") === gs.size || col(s"e$i") === gs.size
    }.reduce(_ && _)
    Some(index
      .filter(col("gram").isInCollection(allGrams))
      .groupBy(col("osm_id"))
      .agg(aggs.head, aggs.tail: _*)
      .filter(everyTokenSomeColumn)
      .select("osm_id"))
  }

  /** Bulk form of [[candidateIds]] for COLUMN-VALUED tokens: `queryToks`
    * is (qid, toks array) and the result is the (qid, osm_id) candidate
    * superset where some name column holds every gram of EVERY token of
    * the query.
    *
    * Everything is an equality join: token→gram explode, gram-equality
    * posting probe, (tok, osm_id, col_id) gram-count check, then a
    * per-(qid, osm_id) token-count check. Nothing broadcasts the query
    * side — this is what lets a 100M-name geocode join run as ordinary
    * shuffles where the single-request path would have to broadcast.
    *
    * Tokens shorter than the gram size have no postings and are
    * EXCLUDED from the conjunction (the result stays a superset — the
    * caller's exact re-verify restores them); a query with NO indexable
    * token gets no row at all, so callers must route those to the scan
    * path (`topKIndexed` routes any short-token query there).
    *
    * `maxDf` is the document-frequency cut on posting-list probes — the
    * `Dedup.jaccardPairs` treatment applied to the gram index. Grams
    * whose posting list exceeds `maxDf` rows are dropped from each
    * token's conjunction BEFORE the index join, so no probe fans out
    * past `maxDf` rows; when ALL of a token's grams are ubiquitous, its
    * single rarest gram is kept instead (tiebreak lexicographic), so
    * every token still contributes ≥1 equality constraint and the
    * short-token routing contract above is unchanged. Dropping grams
    * only WEAKENS the conjunction, so the result remains a superset for
    * any `maxDf` — the caller's exact re-verify restores precision; the
    * cut trades probe fan-out for (bounded) extra verify work.
    * `gramDf` optionally supplies a precomputed `(gram, df)` table (the
    * production shape: persisted next to the index at build time);
    * absent, dfs are aggregated from `index` in-plan. */
  def candidateIdsBulk(index: DataFrame, queryToks: DataFrame,
                       maxDf: Long = Long.MaxValue,
                       gramDf: Option[DataFrame] = None): DataFrame = {
    // every expected-count rides ALONG its exploded rows (size before
    // explode) instead of being re-aggregated from a second read of the
    // same subtree: a separate nGrams/nToks aggregate + join re-executes
    // the whole upstream plan per use (Spark reuses exchanges, not
    // arbitrary subplans) — measured 4-8x slower on the g11 shape. With
    // inputs distinct-by-construction, count(1) == countDistinct, and
    // avoiding countDistinct also avoids its Expand doubling.
    val qt = queryToks
      .select(col("qid"),
        // sub-N tokens would explode into descending-sequence garbage
        // grams (Spark's sequence(1, len-2) steps DOWN for len < 3) and
        // silently zero the whole query; dropping them keeps the
        // superset contract instead
        array_distinct(filter(col("toks"), t => length(t) >= N)).as("dtoks"))
      .select(col("qid"), size(col("dtoks")).as("nt"), explode(col("dtoks")).as("tok"))
    val toks = qt.select("tok").distinct()
    // grams of each distinct token, column-side (no UDF): sliding
    // substrings via sequence+transform
    val tokGramsAll = toks
      .select(col("tok"), expr(
        s"array_distinct(transform(sequence(1, length(tok) - ${N - 1}), i -> substring(tok, i, $N)))")
        .as("grams"))
    val tokGrams =
      if (maxDf == Long.MaxValue && gramDf.isEmpty)
        tokGramsAll
          .select(col("tok"), size(col("grams")).as("ng"), explode(col("grams")).as("gram"))
      else {
        // df-cut path: join each token's grams to their posting-list
        // sizes, drop ubiquitous grams, keep-rarest fallback. Grams
        // ABSENT from the index keep df 0 (left join): they cost
        // nothing to probe and correctly zero the token's candidates.
        // Both windows share the tok partitioning -> one shuffle of a
        // tiny (distinct tokens × grams) table.
        val dfs = gramDf.getOrElse(gramDfOf(index))
        val wTok = org.apache.spark.sql.expressions.Window.partitionBy("tok")
        tokGramsAll
          .select(col("tok"), explode(col("grams")).as("gram"))
          .join(dfs.select(col("gram"), col("df")), Seq("gram"), "left")
          .withColumn("df", coalesce(col("df"), lit(0L)))
          .withColumn("rk", row_number().over(
            wTok.orderBy(col("df").asc, col("gram").asc)))
          .filter(col("df") <= maxDf || col("rk") === 1)
          .select(col("tok"), count(lit(1)).over(wTok).as("ng"), col("gram"))
      }
    val tokCands = tokGrams
      .join(index, Seq("gram"))
      .groupBy(col("tok"), col("osm_id"), col("col_id"))
      .agg(count(lit(1)).as("hit"), max(col("ng")).as("ng"))
      .filter(col("hit") === col("ng"))
      .select("tok", "osm_id")
      .distinct()
    // explicit-width repartition (exempt from AQE coalescing): when the
    // query side is small enough to broadcast, tokCands is the PROBE
    // side of the fan-out join, and its byte size wildly understates the
    // join's output and aggregation CPU — without this the whole
    // fan-out+count stage can collapse to 1-2 partitions
    val w = tokCands.sparkSession.sessionState.conf.numShufflePartitions
    qt.join(tokCands.repartition(w, col("osm_id")), Seq("tok"))
      .groupBy(col("qid"), col("osm_id"))
      .agg(count(lit(1)).as("thit"), max(col("nt")).as("nt"))
      .filter(col("thit") === col("nt"))
      .select("qid", "osm_id")
  }

  /** Index-accelerated candidate fetch: prefilter by posting-list
    * intersection, then re-verify the exact predicate on the survivors.
    * Results are identical to `Repo.fetchCandidates` up to the
    * engine-order-dependent cap (P8). */
  def fetchCandidates(poiView: DataFrame, index: DataFrame,
                      nameTokens: Seq[String], bboxPred: Option[Column],
                      limitScan: Int = 10000): Option[DataFrame] =
    candidateIds(index, nameTokens).map { ids =>
      val verify = graft.query.Repo.likePredicate(
        nameTokens, Seq(col("name_local_norm"), col("name_en_norm")))
      val base = poiView.join(ids, Seq("osm_id"), "left_semi").filter(verify)
      bboxPred.fold(base)(base.filter).limit(limitScan)
    }

  /** PACKED per-gram posting arrays `(gram, col_id, ids)` — the
    * low-latency SERVING layout: a probe reads ~|query grams| rows
    * instead of their exploded posting rows, collects them driver-side
    * (they are the request's working set — the classic retrieval-server
    * shape, posting lists intersected in-process), and the main job
    * then runs with the candidate set as a literal `InSet`, so a
    * request is ONE aux collect with no shuffle plus the ranking job.
    * `maxDf` bounds every array for the 100 TB case: an over-cap
    * (ubiquitous) gram keeps its row with `ids = NULL` — a marker the
    * probe reads as "skip this constraint" — which is distinguishable
    * from an ABSENT gram (no postings → the token matches nothing).
    * Dropping constraints only widens the superset; the caller's exact
    * re-verify restores precision. */
  def packed(index: DataFrame, maxDf: Long = Long.MaxValue): DataFrame =
    index.groupBy(col("gram"), col("col_id"))
      .agg(collect_list(col("osm_id")).as("all_ids"))
      .select(col("gram"), col("col_id"),
        when(size(col("all_ids")) <= lit(maxDf), col("all_ids")).as("ids"))

  /** Driver-side probe of a [[packed]] index: candidate osm_ids where
    * some name column contains every gram of EVERY token — the same
    * superset contract as [[candidateIds]], intersected in-process from
    * the collected posting arrays. None routes the caller to the scan
    * path: a sub-gram-size token (unindexable, as in [[candidateIds]]),
    * or a token whose every gram is ubiquity-marked in some column
    * (nothing left to constrain that column — its candidate set would
    * be the whole corpus, which is the scan path by definition). */
  def probeIds(packedIx: DataFrame, tokens: Seq[String]): Option[Array[Long]] =
    indexableGramSets(tokens).flatMap { gramSets =>
      val allGrams = gramSets.flatten.distinct
      val rows = packedIx.filter(col("gram").isInCollection(allGrams)).collect()
        .map(r => (r.getAs[String]("gram"), r.getAs[Int]("col_id")) ->
          Option(r.getAs[scala.collection.Seq[Long]]("ids")).map { s =>
            val arr = s.toArray
            java.util.Arrays.sort(arr) // the merge algebra's invariant
            arr
          })
        .toMap
      // normalize to the intersect contract: every requested (gram, col)
      // resolves — absent pairs to empty postings
      val post = allGrams.flatMap(g => Seq(0, 1).map(c =>
        (g, c) -> rows.getOrElse((g, c), Some(Array.empty[Long])))).toMap
      intersectPost(post, gramSets)
    }

  private def indexableGramSets(tokens: Seq[String]): Option[Seq[Seq[String]]] = {
    val indexable = tokens.filter(_.length >= N)
    if (indexable.isEmpty || indexable.size != tokens.size) None
    else Some(indexable.map(t => grams(t).distinct))
  }

  /** The probe's intersection core over resolved postings (`None` value
    * = ubiquity marker → constraint skipped; empty array = absent gram
    * → the token matches nothing): per (token, column) intersect the
    * grams' posting sets; per token union over columns ("some column
    * holds every gram"); overall intersect over tokens ("every token").
    * All set algebra runs on SORTED primitive long arrays (two-pointer
    * merges, smallest-first) — `Set[Long]` boxing made wide first-token
    * probes driver-bound at the 10× corpus. Inputs are sorted at load
    * ([[probeIds]] / [[PostingCache]]); output stays sorted. */
  private def intersectPost(post: Map[(String, Int), Option[Array[Long]]],
                            gramSets: Seq[Seq[String]]): Option[Array[Long]] = {
    def colArr(gs: Seq[String], c: Int): Option[Array[Long]] = {
      val constraints = gs.flatMap(g => post((g, c)))
      if (constraints.isEmpty) None // every gram ubiquitous: unconstrained
      else Some(constraints.sortBy(_.length).reduceLeft(intersectSorted))
    }
    val perToken = gramSets.map { gs =>
      (colArr(gs, 0), colArr(gs, 1)) match {
        case (Some(a), Some(b)) => Some(unionSorted(a, b))
        case _ => None // an unconstrained column widens to the corpus
      }
    }
    if (perToken.exists(_.isEmpty)) None
    else Some(perToken.flatten.sortBy(_.length).reduceLeft(intersectSorted))
  }

  private def intersectSorted(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = Array.ofDim[Long](math.min(a.length, b.length))
    var i = 0; var j = 0; var k = 0
    while (i < a.length && j < b.length) {
      if (a(i) < b(j)) i += 1
      else if (a(i) > b(j)) j += 1
      else { out(k) = a(i); k += 1; i += 1; j += 1 }
    }
    java.util.Arrays.copyOf(out, k)
  }

  private def unionSorted(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = Array.ofDim[Long](a.length + b.length)
    var i = 0; var j = 0; var k = 0
    while (i < a.length || j < b.length) {
      val v =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) { val x = a(i); i += 1; x }
        else { val x = b(j); j += 1; x }
      if (k == 0 || out(k - 1) != v) { out(k) = v; k += 1 }
    }
    java.util.Arrays.copyOf(out, k)
  }

  /** Bounded driver-side LRU over a [[packed]] index's per-gram rows —
    * the in-process posting cache a retrieval server fronts its stored
    * postings with: misses fetch through ONE filtered collect over the
    * gram-sorted cached relation, hits cost driver-map lookups only, so
    * a warm request runs ZERO auxiliary jobs before its ranking job.
    * Memory is bounded by entry count × the pack-time `maxDf` array
    * bound, flat at any corpus size; eviction is access-order LRU.
    * Thread-safe (one lock — the fetch is the only slow path). */
  final class PostingCache(packedIx: DataFrame, maxGrams: Int = 65536) {
    private type Entry = (Option[Array[Long]], Option[Array[Long]])
    private val cache = new java.util.LinkedHashMap[String, Entry](256, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[String, Entry]): Boolean =
        size() > maxGrams
    }
    def postings(allGrams: Seq[String]): Map[(String, Int), Option[Array[Long]]] =
      synchronized {
        // the request's working set is accumulated LOCALLY and the result
        // built from it — re-reading through the LRU after insertion would
        // NPE on any request with more distinct grams than `maxGrams`
        // (same-call entries evict each other before the read-back)
        val local = scala.collection.mutable.Map.empty[String, Entry]
        for (g <- allGrams; e = cache.get(g); if e != null) local(g) = e
        val missing = allGrams.distinct.filterNot(local.contains)
        if (missing.nonEmpty) {
          val fetched = packedIx.filter(col("gram").isInCollection(missing))
            .collect().groupBy(_.getAs[String]("gram"))
          for (g <- missing) {
            val rows = fetched.getOrElse(g, Array.empty)
            def colIds(c: Int): Option[Array[Long]] =
              rows.find(_.getAs[Int]("col_id") == c) match {
                case Some(r) =>
                  // null ids = pack-time ubiquity marker (skip), kept as None
                  Option(r.getAs[scala.collection.Seq[Long]]("ids")).map { s =>
                    val arr = s.toArray
                    java.util.Arrays.sort(arr) // the merge algebra's invariant
                    arr
                  }
                case None => Some(Array.empty[Long]) // absent gram: no postings
              }
            val e = (colIds(0), colIds(1))
            local(g) = e
            cache.put(g, e)
          }
        }
        allGrams.flatMap { g =>
          val (c0, c1) = local(g)
          Seq((g, 0) -> c0, (g, 1) -> c1)
        }.toMap
      }
  }

  /** [[probeIds]] through a [[PostingCache]] — the warm-path form. */
  def probeIdsCached(cache: PostingCache, tokens: Seq[String]): Option[Array[Long]] =
    indexableGramSets(tokens).flatMap { gramSets =>
      intersectPost(cache.postings(gramSets.flatten.distinct), gramSets)
    }

  /** [[fetchCandidates]] over a [[packed]] index: the candidate set is
    * intersected driver-side ([[probeIds]]) and pushed into the poi
    * scan as an `InSet` literal — no aux shuffle, no broadcast
    * exchange; same verify + bbox + cap tail as the row-layout path.
    * Identical results to `Repo.fetchCandidates` up to the
    * engine-order-dependent cap (P8), like [[fetchCandidates]]. */
  def fetchCandidatesPacked(poiView: DataFrame, packedIx: DataFrame,
                            nameTokens: Seq[String], bboxPred: Option[Column],
                            limitScan: Int = 10000,
                            cache: Option[PostingCache] = None,
                            maxCandidates: Int = 4096): Option[DataFrame] = {
    val ids = cache match {
      case Some(c) => probeIdsCached(c, nameTokens)
      case None => probeIds(packedIx, nameTokens)
    }
    // SELECTIVITY routing: a probe matching more than `maxCandidates`
    // ids prunes nothing worth the narrowing plan's extra legs — the
    // verify predicate alone does the work, i.e. the SCAN plan, so
    // route there (None) instead of serving the scan's job with an
    // index toll on top. The classic optimizer rule (skip an index
    // below some selectivity), applied at serve time where the probe
    // has just measured its own selectivity for free.
    ids.filter(_.length <= maxCandidates).map { arr =>
      val verify = graft.query.Repo.likePredicate(
        nameTokens, Seq(col("name_local_norm"), col("name_en_norm")))
      // narrow candidate sets ride as an IN literal (InSet after
      // OptimizeIn); wide ones (first-token probes at large corpora)
      // become a broadcast of a LOCAL relation — an In with tens of
      // thousands of literal children costs more to ANALYZE per request
      // than the ranking job itself, and a raw InSet over the cached
      // scan measured slower still (per-row boxed set probes across the
      // whole corpus vs a hashed semi-join over it)
      val narrowed =
        if (arr.length <= 1024)
          poiView.filter(col("osm_id").isInCollection(arr.toSeq))
        else {
          val spark = poiView.sparkSession
          import spark.implicits._
          poiView.join(
            org.apache.spark.sql.functions.broadcast(arr.toSeq.toDF("osm_id")),
            Seq("osm_id"), "left_semi")
        }
      val base = narrowed.filter(verify)
      bboxPred.fold(base)(base.filter).limit(limitScan)
    }
  }
}
