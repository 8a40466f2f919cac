package graft.queries

import graft.ext.{Sampling, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Corpus-composition inventory: temperature domain mixing and sequence
  * packing over `documents` ([[graft.ext.Sampling]]). Both oracles
  * rebuild the identical portable hash + exact arithmetic in DuckDB, so
  * membership and bin assignment are hash-checked bit-for-bit.
  */
object CurationQueries {

  private def docs(s: SparkSession, dir: String) = Tables.table(s, dir, "documents")

  private val canonSql = TextQueries.canonSql
  private val ntokSql = s"len(list_filter(string_split($canonSql, ' '), x -> x <> ''))"

  private def hashSql(expr: String) = DedupQueries.portableHash(expr)

  /** Temperature-2 language re-mix weighted by token mass: rare
    * languages kept whole, the dominant one down-sampled toward (not
    * past) uniform. Keeps ≈ sqrt(min-mass/mass) of each language,
    * membership by portable hash — deterministic across engines,
    * retries, and partitionings. */
  val taDomainMix = Q("ta_domain_mix",
    (s, dir) =>
      Sampling.temperatureMix(
        docs(s, dir), group = "lang", id = "doc_id",
        weight = TextAnalysis.tokenCount(col("text")).cast("long"))
        .select("doc_id", "lang", "keep_ppm")
        .orderBy("doc_id"),
    Some(s"""WITH masses AS (
               SELECT lang, sum($ntokSql) AS mass FROM documents
               GROUP BY 1 HAVING sum($ntokSql) > 0),
             mn AS (SELECT min(mass) AS min_mass FROM masses),
             rates AS (
               SELECT lang,
                      CAST(floor(sqrt(min_mass::DOUBLE / mass::DOUBLE) * 1000000) AS BIGINT) AS keep_ppm
               FROM masses, mn)
           SELECT d.doc_id, d.lang, r.keep_ppm
           FROM documents d JOIN rates r USING (lang)
           WHERE ${hashSql("'mix:' || d.doc_id")} % 1000000 < r.keep_ppm
           ORDER BY doc_id"""))

  private val PackShards = 16
  private val PackCapacity = 512L

  /** Sequence packing into 512-token bins over 16 hash shards:
    * prefix-sum bin assignment in per-shard id order (see
    * [[Sampling.packBins]] for the scale contract — shard count is the
    * knob that scales with corpus tokens). */
  val taPack = Q("ta_pack",
    (s, dir) =>
      Sampling.packBins(docs(s, dir), id = "doc_id",
        tokens = TextAnalysis.tokenCount(col("text")),
        shards = PackShards, capacity = PackCapacity)
        .orderBy("shard", "bin"),
    Some(s"""WITH t AS (
               SELECT doc_id, CAST($ntokSql AS BIGINT) AS ntok,
                      ${hashSql("'pack:' || doc_id")} % $PackShards AS shard
               FROM documents),
             c AS (
               SELECT doc_id, ntok, shard,
                      sum(ntok) OVER (PARTITION BY shard ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - ntok AS strt
               FROM t)
           SELECT shard, CAST(strt // $PackCapacity AS BIGINT) AS bin,
                  count(*) AS n_docs, CAST(sum(ntok) AS BIGINT) AS sum_tokens,
                  min(doc_id) AS min_id, max(doc_id) AS max_id
           FROM c GROUP BY 1, 2 ORDER BY shard, bin"""))

  private val ChunkSize = 32
  private val ChunkOverlap = 8

  /** Context-window chunking ([[TextAnalysis.chunkify]]): 32-token
    * windows advancing by 24, chunk content pinned by md5 of the joined
    * tokens so slicing is hash-checked, not just counted. */
  val taChunks = Q("ta_chunks",
    (s, dir) =>
      TextAnalysis.chunkify(docs(s, dir), "text", ChunkSize, ChunkOverlap)
        .select(col("doc_id"), col("chunk_id"),
          size(col("chunk_tokens")).as("n_tokens"),
          md5(array_join(col("chunk_tokens"), " ")).as("chunk_hash"))
        .orderBy("doc_id", "chunk_id"),
    Some {
      val step = ChunkSize - ChunkOverlap
      s"""WITH t AS (
            SELECT doc_id,
                   list_filter(string_split($canonSql, ' '), x -> x <> '') AS toks
            FROM documents),
          c AS (
            SELECT doc_id, toks,
                   unnest(generate_series(0,
                     greatest(CAST((len(toks) - $ChunkOverlap - 1) // $step AS INT), 0))) AS chunk_id
            FROM t WHERE len(toks) > 0),
          s AS (
            SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
                   toks[chunk_id * $step + 1 :
                        least(chunk_id * $step + $ChunkSize, len(toks))] AS chunk
            FROM c)
        SELECT doc_id, chunk_id, CAST(len(chunk) AS INT) AS n_tokens,
               md5(array_to_string(chunk, ' ')) AS chunk_hash
        FROM s ORDER BY doc_id, chunk_id"""
    })

  private val CmsDepth = 4
  private val CmsWidth = 256

  /** Count-min heavy-hitter estimation ([[graft.functions.CountMin]]):
    * the sketch aggregates ALL token occurrences into a fixed
    * 4×256-count buffer (one sketch per partition on the shuffle, not
    * one row per distinct token), then the top-25 true tokens are
    * point-estimated against it. The affine-over-md5 bucket hashing is
    * engine-portable, so the oracle rebuilds the sketch's exact counts
    * — collisions included — and the estimates hash-match. */
  val taCmsHeavy = Q("ta_cms_heavy",
    (s, dir) => {
      import graft.ext.Dedup
      import graft.functions.CountMin
      // aggregate occurrences to the vocab-sized (tok, n, h) relation
      // FIRST, then feed the sketch weighted updates (CMS is linear) —
      // one tokenize pass, and the materialized relation is vocabulary-
      // sized, not corpus-occurrence-sized
      val tokCounts = Dedup.docTokens(docs(s, dir), "doc_id", "text", distinct = false)
        .select(col("tok"), Dedup.tokenHash(col("tok")).as("h"))
        .groupBy("tok")
        .agg(count(lit(1)).as("n_true"), max("h").as("h"))
        .localCheckpoint(true) // read 2x: sketch build + top-k
      val sketch = tokCounts.agg(
        CountMin.cmsketchWeighted(col("h"), col("n_true"), CmsDepth, CmsWidth)
          .as("sketch"))
      val top = tokCounts.orderBy(desc("n_true"), col("tok")).limit(25)
      top.crossJoin(broadcast(sketch))
        .select(col("tok"), col("n_true"),
          CountMin.estimate(col("sketch"), col("h"), CmsDepth, CmsWidth).as("n_est"))
        .orderBy(desc("n_true"), col("tok"))
    },
    Some(s"""WITH occ AS (
               SELECT unnest(list_filter(string_split($canonSql, ' '), x -> x <> '')) AS tok
               FROM documents),
             oh AS (SELECT tok, ${hashSql("tok")} AS h FROM occ),
             cnt AS (
               SELECT d, ((h * (2 * d + 1) + (40503 * (d + 1) + 9973)) % 4294967311) % $CmsWidth AS b,
                      count(*) AS c
               FROM oh, range(0, $CmsDepth) t(d) GROUP BY 1, 2),
             top AS (
               SELECT tok, max(h) AS h, count(*) AS n_true FROM oh
               GROUP BY tok ORDER BY n_true DESC, tok LIMIT 25),
             est AS (
               SELECT top.tok, top.n_true, min(c.c) AS n_est
               FROM top CROSS JOIN range(0, $CmsDepth) t(d)
               JOIN cnt c ON c.d = t.d
                 AND c.b = ((top.h * (2 * t.d + 1) + (40503 * (t.d + 1) + 9973)) % 4294967311) % $CmsWidth
               GROUP BY 1, 2)
           SELECT tok, n_true, CAST(n_est AS BIGINT) AS n_est
           FROM est ORDER BY n_true DESC, tok"""))

  /** Contrastive negative sampling ([[Sampling.negativeSample]]): 3
    * deterministic negatives per query doc via hash-bucket probes — one
    * equality join, no query × corpus product. Bucket count AUTO-SIZES
    * from the corpus (`max(16, count/64)` — bucket cardinality stays
    * ~64 at any scale, so per-slot work doesn't grow with the corpus);
    * the oracle replays the same integer formula from the same relation
    * plus the identical md5 draw arithmetic, so the sampled ids
    * hash-match bit-for-bit at every scale factor. */
  val taNegatives = Q("ta_negatives",
    (s, dir) => {
      val d = docs(s, dir)
      Sampling.negativeSample(
        d.filter(col("doc_id") % 17 === 3), d,
        "doc_id", "doc_id", k = 3)
        .orderBy("qid", "slot")
    },
    Some {
      val nbSql = s"greatest(${Sampling.AutoMinBuckets}, " +
        s"(SELECT count(*) FROM documents) // ${Sampling.AutoBucketSize})"
      val bucketOf = (e: String) =>
        s"(${hashSql(s"concat_ws(':', 'neg', $e)")} % nb.n)"
      s"""WITH nb AS (SELECT $nbSql AS n),
          cands AS (
            SELECT doc_id AS neg_id, ${bucketOf("doc_id")} AS bucket
            FROM documents, nb),
          slots AS (
            SELECT doc_id AS qid, t.slot,
                   ${bucketOf("doc_id, t.slot")} AS bucket
            FROM documents, generate_series(1, 3) AS t(slot), nb
            WHERE doc_id % 17 = 3),
          drawn AS (
            SELECT qid, slot, neg_id,
                   row_number() OVER (PARTITION BY qid, slot
                     ORDER BY ${hashSql("concat_ws(':', 'neg', qid, slot, neg_id)")} ASC,
                              neg_id ASC) AS rk
            FROM slots JOIN cands USING (bucket)
            WHERE neg_id <> qid)
          SELECT qid, slot, neg_id FROM drawn WHERE rk = 1
          ORDER BY qid, slot"""
    })

  /** Sequence packing re-binned on TRUE BPE token counts (VERDICT r14
    * task 3): identical prefix-sum pack plan to [[taPack]], with the
    * budget column swapped from the whitespace proxy to
    * [[graft.functions.bpeCount]]. `ta_pack` is kept on the proxy so
    * the two stay comparable — the delta between their bin manifests
    * IS the budget error a proxy-packed deployment ships. The oracle
    * derives per-doc counts from [[BpeSql]]'s recursive-CTE replay,
    * then packs with the same portable hash + window as the ta_pack
    * twin. */
  val taBpePack = Q("ta_bpe_pack",
    (s, dir) =>
      Sampling.packBins(docs(s, dir), id = "doc_id",
        tokens = graft.functions.bpeCount(col("text")),
        shards = PackShards, capacity = PackCapacity)
        .orderBy("shard", "bin"),
    Some(s"""WITH RECURSIVE
               ${BpeSql.wordTokCtes},
             t AS (
               SELECT doc_id, CAST(n_bpe AS BIGINT) AS ntok,
                      ${hashSql("'pack:' || doc_id")} % $PackShards AS shard
               FROM doc_bpe),
             c AS (
               SELECT doc_id, ntok, shard,
                      sum(ntok) OVER (PARTITION BY shard ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - ntok AS strt
               FROM t)
           SELECT shard, CAST(strt // $PackCapacity AS BIGINT) AS bin,
                  count(*) AS n_docs, CAST(sum(ntok) AS BIGINT) AS sum_tokens,
                  min(doc_id) AS min_id, max(doc_id) AS max_id
           FROM c GROUP BY 1, 2 ORDER BY shard, bin"""))

  val all: Seq[Q] = Seq(taDomainMix, taPack, taChunks, taCmsHeavy, taNegatives,
    taBpePack)
}
