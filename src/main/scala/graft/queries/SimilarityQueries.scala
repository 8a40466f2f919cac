package graft.queries

import graft.ext.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Embedding similarity inventory over `embeddings` (64-dim float
  * vectors). The oracle twins rebuild the quantized-integer cosine in
  * pure SQL (range join over vector positions), so every similarity —
  * including the LSH bucket assignment — is bit-identical cross-engine.
  */
object SimilarityQueries {

  private def emb(s: SparkSession, dir: String) = Tables.table(s, dir, "embeddings")

  private val Dim = 64

  /** Quantized components CTE: (vec_id, i, v) with v = round(x·2^15). */
  private def qvSql(where: String = "") =
    s"""SELECT vec_id, i, CAST(round(embedding[i] * 32768.0) AS BIGINT) AS v
        FROM (SELECT vec_id, embedding FROM embeddings $where), range(1, ${Dim + 1}) t(i)"""

  /** Top-20 most-similar embedding pairs in a bounded window — the
    * embedding-cosine near-dup detector (top-k form: this corpus has no
    * true near-dups, a fixed threshold would select nothing). */
  val simPairs = Q("sim_embed_pairs",
    (s, dir) => {
      val base = emb(s, dir).filter(col("vec_id") < 300)
        .select(col("vec_id"), Similarity.quantize(col("embedding")).as("q"))
      base.as("x").join(base.as("y"), col("x.vec_id") < col("y.vec_id"))
        .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"),
          round(Similarity.cosineQ(col("x.q"), col("y.q")), 6).as("cosine"))
        .orderBy(col("cosine").desc, col("a").asc, col("b").asc)
        .limit(20)
    },
    Some(s"""WITH qv AS (${qvSql("WHERE vec_id < 300")}),
               norms AS (SELECT vec_id, sum(v * v) AS nn FROM qv GROUP BY 1),
               dots AS (
                 SELECT x.vec_id AS a, y.vec_id AS b, sum(x.v * y.v) AS dot
                 FROM qv x JOIN qv y ON x.i = y.i AND x.vec_id < y.vec_id
                 GROUP BY 1, 2)
             SELECT a, b,
                    round(dot::DOUBLE / (sqrt(na.nn::DOUBLE) * sqrt(nb.nn::DOUBLE)), 6) AS cosine
             FROM dots
             JOIN norms na ON a = na.vec_id
             JOIN norms nb ON b = nb.vec_id
             ORDER BY cosine DESC, a ASC, b ASC LIMIT 20"""))

  /** Brute-force cosine top-10 for 5 query vectors — the ANN correctness
    * baseline (broadcast queries; corpus never shuffles pre-rank). */
  val annBrute = Q("ann_brute_topk",
    (s, dir) => Similarity.bruteForceTopK(
      emb(s, dir).filter(col("vec_id") < 5), emb(s, dir), k = 10)
      .select("query_id", "rank", "cand_id", "cosine")
      .orderBy("query_id", "rank"),
    Some(s"""WITH qq AS (${qvSql("WHERE vec_id < 5")}),
               cc AS (${qvSql()}),
               qn AS (SELECT vec_id, sum(v * v) AS nn FROM qq GROUP BY 1),
               cn AS (SELECT vec_id, sum(v * v) AS nn FROM cc GROUP BY 1),
               dots AS (
                 SELECT qq.vec_id AS query_id, cc.vec_id AS cand_id, sum(qq.v * cc.v) AS dot
                 FROM qq JOIN cc ON qq.i = cc.i
                 WHERE qq.vec_id <> cc.vec_id
                 GROUP BY 1, 2),
               scored AS (
                 SELECT query_id, cand_id,
                        round(dot::DOUBLE / (sqrt(qn.nn::DOUBLE) * sqrt(cn.nn::DOUBLE)), 6) AS cosine
                 FROM dots
                 JOIN qn ON query_id = qn.vec_id
                 JOIN cn ON cand_id = cn.vec_id),
               ranked AS (
                 SELECT query_id, cand_id, cosine,
                        row_number() OVER (PARTITION BY query_id
                          ORDER BY cosine DESC, cand_id ASC) AS rank
                 FROM scored)
             SELECT query_id, rank, cand_id, cosine FROM ranked
             WHERE rank <= 10 ORDER BY query_id, rank"""))

  private val Planes = 8

  /** One LSH ranking chain (hyperplanes → sign buckets → same-bucket
    * candidates → exact re-rank), parameterized on the plane count and
    * name-suffixed so the recall audit can instantiate several plane
    * counts in ONE oracle — the [[pqCtes]] shared-fragment treatment.
    * Assumes `qv` and `norms` CTEs in scope. */
  private def lshRankedCtes(planes: Int, sfx: String): String =
    s"""wv$sfx AS (
               SELECT p, i, ((p * $Dim + (i - 1)) * 2654435761) % 2000001 - 1000000 AS w
               FROM range(0, $planes) t1(p), range(1, ${Dim + 1}) t2(i)),
               pdots$sfx AS (
                 SELECT vec_id, p, sum(v * w) AS dot
                 FROM qv JOIN wv$sfx USING (i) GROUP BY 1, 2),
               buckets$sfx AS (
                 SELECT vec_id, sum(CASE WHEN dot > 0 THEN 1 << p ELSE 0 END) AS bucket
                 FROM pdots$sfx GROUP BY 1),
               cand$sfx AS (
                 SELECT q.vec_id AS query_id, c.vec_id AS cand_id
                 FROM buckets$sfx q JOIN buckets$sfx c
                   ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
                 WHERE q.vec_id < 5),
               dots$sfx AS (
                 SELECT query_id, cand_id, sum(a.v * b.v) AS dot
                 FROM cand$sfx
                 JOIN qv a ON a.vec_id = query_id
                 JOIN qv b ON b.vec_id = cand_id AND b.i = a.i
                 GROUP BY 1, 2),
               scored$sfx AS (
                 SELECT query_id, cand_id,
                        round(dot::DOUBLE / (sqrt(qn.nn::DOUBLE) * sqrt(cn.nn::DOUBLE)), 6) AS cosine
                 FROM dots$sfx
                 JOIN norms qn ON query_id = qn.vec_id
                 JOIN norms cn ON cand_id = cn.vec_id),
               ranked$sfx AS (
                 SELECT query_id, cand_id, cosine,
                        row_number() OVER (PARTITION BY query_id
                          ORDER BY cosine DESC, cand_id ASC) AS rank
                 FROM scored$sfx)"""

  /** Sign-LSH bucketed ANN — the scale path: equality join on bucket
    * replaces the cross join; exact re-rank only inside the bucket. */
  val annLsh = Q("ann_lsh_topk",
    (s, dir) => Similarity.lshTopK(
      emb(s, dir).filter(col("vec_id") < 5), emb(s, dir),
      k = 5, numPlanes = Planes, dim = Dim)
      .select("query_id", "rank", "cand_id", "cosine")
      .orderBy("query_id", "rank"),
    Some(s"""WITH qv AS (${qvSql()}),
               norms AS (SELECT vec_id, sum(v * v) AS nn FROM qv GROUP BY 1),
               ${lshRankedCtes(Planes, "")}
             SELECT query_id, rank, cand_id, cosine FROM ranked
             WHERE rank <= 5 ORDER BY query_id, rank"""))

  /** One multi-probe LSH oracle chain: hyperplane dots -> sign buckets
    * -> Hamming-(<=2) probe masks scored by flipped-margin sum (the
    * query-directed probe order) -> probe-rank-annotated candidates ->
    * exact rounded cosine. Suffixed so the recall audit instantiates
    * several plane counts in ONE oracle. Assumes `qv` and `norms` CTEs
    * in scope. Bucket sums are cast to BIGINT (DuckDB sums to HUGEINT,
    * which xor() rejects); probe order ties break to the lower mask in
    * both engines. */
  private def lshProbeCtes(planes: Int, sfx: String): String =
    s"""wv$sfx AS (
               SELECT p, i, ((p * $Dim + (i - 1)) * 2654435761) % 2000001 - 1000000 AS w
               FROM range(0, $planes) t1(p), range(1, ${Dim + 1}) t2(i)),
               pdots$sfx AS (
                 SELECT vec_id, p, sum(v * w) AS dot
                 FROM qv JOIN wv$sfx USING (i) GROUP BY 1, 2),
               buckets$sfx AS (
                 SELECT vec_id,
                        CAST(sum(CASE WHEN dot > 0 THEN 1 << p ELSE 0 END) AS BIGINT) AS bucket
                 FROM pdots$sfx GROUP BY 1),
               masks$sfx AS (
                 SELECT CAST(0 AS BIGINT) AS mask
                 UNION ALL SELECT 1 << p FROM range(0, $planes) t(p)
                 UNION ALL SELECT (1 << a) | (1 << b)
                   FROM range(0, $planes) ta(a), range(0, $planes) tb(b)
                   WHERE a < b),
               mscore$sfx AS (
                 SELECT d.vec_id, m.mask,
                        coalesce(sum(CASE WHEN ((m.mask >> d.p) & 1) = 1
                                          THEN abs(d.dot) END), 0) AS score
                 FROM pdots$sfx d CROSS JOIN masks$sfx m
                 WHERE d.vec_id < 5
                 GROUP BY 1, 2),
               probe$sfx AS (
                 SELECT vec_id, mask,
                        row_number() OVER (PARTITION BY vec_id
                          ORDER BY score ASC, mask ASC) AS pr
                 FROM mscore$sfx),
               pcand$sfx AS (
                 SELECT p.vec_id AS query_id, c.vec_id AS cand_id, p.pr AS probe_rank
                 FROM probe$sfx p
                 JOIN buckets$sfx qb ON qb.vec_id = p.vec_id
                 JOIN buckets$sfx c ON xor(qb.bucket, p.mask) = c.bucket
                                   AND c.vec_id <> p.vec_id),
               pdotsum$sfx AS (
                 SELECT query_id, cand_id, probe_rank, sum(a.v * b.v) AS dot
                 FROM pcand$sfx
                 JOIN qv a ON a.vec_id = query_id
                 JOIN qv b ON b.vec_id = cand_id AND b.i = a.i
                 GROUP BY 1, 2, 3),
               pscored$sfx AS (
                 SELECT query_id, cand_id, probe_rank,
                        round(dot::DOUBLE / (sqrt(qn.nn::DOUBLE) * sqrt(cn.nn::DOUBLE)), 6) AS cosine
                 FROM pdotsum$sfx
                 JOIN norms qn ON query_id = qn.vec_id
                 JOIN norms cn ON cand_id = cn.vec_id)"""

  /** Serving form of the multi-probe tier: top-5 at (8 planes,
    * 9 probes) = the query bucket plus its 8 LOWEST-MARGIN flips in
    * query-directed order (1- or 2-plane — a budget prefix, not the
    * Hamming-1 tier). See [[annLshRecall]] for the measured
    * (planes, probes) curve that picks an operating point. */
  val annLshMultiprobe = Q("ann_lsh_multiprobe",
    (s, dir) => Similarity.lshTopKMultiProbe(
      emb(s, dir).filter(col("vec_id") < 5), emb(s, dir),
      k = 5, numPlanes = 8, dim = Dim, probes = 9)
      .select("query_id", "rank", "cand_id", "cosine")
      .orderBy("query_id", "rank"),
    Some(s"""WITH qv AS (${qvSql()}),
               norms AS (SELECT vec_id, sum(v * v) AS nn FROM qv GROUP BY 1),
               ${lshProbeCtes(8, "_mp")}
             SELECT query_id, rank, cand_id, cosine FROM (
               SELECT query_id, cand_id, cosine,
                      row_number() OVER (PARTITION BY query_id
                        ORDER BY cosine DESC, cand_id ASC) AS rank
               FROM pscored_mp WHERE probe_rank <= 9)
             WHERE rank <= 5 ORDER BY query_id, rank"""))

  /** The (planes, probes) grid the recall audit sweeps: per plane
    * count, probes = 1 (the single-bucket probe), two intermediate
    * BUDGETS, and the full Hamming-<=2 neighborhood
    * ([[Similarity.maxProbes]]). A budget is a PREFIX of the
    * margin-ordered probe sequence, NOT a Hamming tier: a 2-plane flip
    * whose two margins are near zero outranks a distant single flip,
    * so probes = 1+n is not the Hamming-<=1 set — it is the n+1 most
    * likely buckets, which is the point of query-directed ordering. */
  private val LshGrid: Seq[(Int, Seq[Int])] =
    Seq(4 -> Seq(1, 3, 5, 11), 8 -> Seq(1, 5, 9, 37), 12 -> Seq(1, 7, 13, 79))

  /** Recall@5 AND candidate cost of the sign-LSH tier vs brute-force
    * truth, swept over BOTH knobs: plane count (bucket width) and
    * query-directed multi-probe count (Hamming-<=2 neighborhood in
    * flipped-margin order). Round 13 measured the single-bucket probe
    * at recall 0.16 / 0.04 / 0.00 for 4 / 8 / 12 planes on this
    * near-uniform corpus — not servable; this round adds the probes
    * axis so a deployment reads off whether multi-probe buys a usable
    * operating point or the tier should yield to IVF / the banded
    * [[Similarity.nearDupPairs]]. `n_cand` is the per-query candidate
    * count the probe set examined — the cost axis recall trades
    * against. Exact INT64 arithmetic end to end (margins, buckets,
    * masks), so the probe ORDER — not just the set — is pinned by the
    * DuckDB twin. */
  val annLshRecall = Q("ann_lsh_recall",
    (s, dir) => {
      import s.implicits._
      val q = emb(s, dir).filter(col("vec_id") < 5)
      val c = emb(s, dir)
      val truth = Similarity.bruteForceTopK(q, c, k = 5)
        .select(col("query_id"), col("cand_id"))
      val perPlane = LshGrid.map { case (pl, prs) =>
        val cands = Similarity.lshProbeCandidates(q, c, pl, Dim)
          .crossJoin(prs.toDF("probes"))
          .filter(col("probe_rank") <= col("probes"))
        // ONE pass over the expensive probe join: mark truth membership
        // per candidate (truth is 5 rows/query — broadcast), rank, and
        // aggregate recall + candidate count together (a separate
        // retrieved/ncand pair of branches recomputed the whole
        // bucket join twice per plane count)
        val agg = cands
          .join(truth.withColumn("t", lit(true)),
            Seq("query_id", "cand_id"), "left")
          .withColumn("rank", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("probes", "query_id")
              .orderBy(col("cosine").desc, col("cand_id").asc)))
          .groupBy("probes", "query_id")
          .agg(
            (sum(when(col("rank") <= 5 && coalesce(col("t"), lit(false)), 1L)
              .otherwise(0L)) / lit(5.0)).as("recall"),
            count(lit(1)).as("n_cand"))
        // reinstate empty groups: a (probes, query) whose probe set
        // reached zero candidates still reports recall 0 / n_cand 0
        truth.select("query_id").distinct()
          .crossJoin(prs.toDF("probes"))
          .join(agg, Seq("probes", "query_id"), "left")
          .select(lit(pl).as("planes"), col("probes"), col("query_id"),
            coalesce(col("recall"), lit(0.0)).as("recall"),
            coalesce(col("n_cand"), lit(0L)).as("n_cand"))
      }
      perPlane.reduce(_ unionByName _).orderBy("planes", "probes", "query_id")
    },
    Some(lshRecallOracle(qvSql())))

  /** The ann_lsh_recall oracle over an arbitrary `qv` CTE — shared by
    * the uniform and CLUSTERED fixtures (only the vector values
    * differ; plane margins, probe order, and the recall arithmetic are
    * the same exact-INT64 program). */
  private def lshRecallOracle(qvCte: String): String =
    s"""WITH qv AS ($qvCte),
               norms AS (SELECT vec_id, sum(v * v) AS nn FROM qv GROUP BY 1),
               $exactRankedCtes,
               truth AS (SELECT query_id, cand_id FROM eranked WHERE rank <= 5),
               ${lshProbeCtes(4, "_p4")},
               ${lshProbeCtes(8, "_p8")},
               ${lshProbeCtes(12, "_p12")},
               pgrid AS (SELECT * FROM (VALUES
                 (4, 1), (4, 3), (4, 5), (4, 11),
                 (8, 1), (8, 5), (8, 9), (8, 37),
                 (12, 1), (12, 7), (12, 13), (12, 79)) g(planes, probes)),
               allc AS (
                 SELECT 4 AS planes, query_id, cand_id, probe_rank, cosine FROM pscored_p4
                 UNION ALL
                 SELECT 8, query_id, cand_id, probe_rank, cosine FROM pscored_p8
                 UNION ALL
                 SELECT 12, query_id, cand_id, probe_rank, cosine FROM pscored_p12),
               sel AS (
                 SELECT g.planes, g.probes, a.query_id, a.cand_id, a.cosine
                 FROM pgrid g JOIN allc a
                   ON a.planes = g.planes AND a.probe_rank <= g.probes),
               retr AS (
                 SELECT planes, probes, query_id, cand_id,
                        row_number() OVER (PARTITION BY planes, probes, query_id
                          ORDER BY cosine DESC, cand_id ASC) AS rank
                 FROM sel),
               nc AS (SELECT planes, probes, query_id, count(*) AS n_cand
                      FROM sel GROUP BY 1, 2, 3)
             SELECT g.planes, g.probes, t.query_id,
                    count(r.cand_id)::DOUBLE / 5 AS recall,
                    coalesce(any_value(nc.n_cand), 0) AS n_cand
             FROM truth t
             CROSS JOIN pgrid g
             LEFT JOIN (SELECT * FROM retr WHERE rank <= 5) r
               ON r.planes = g.planes AND r.probes = g.probes
              AND r.query_id = t.query_id AND r.cand_id = t.cand_id
             LEFT JOIN nc ON nc.planes = g.planes AND nc.probes = g.probes
                         AND nc.query_id = t.query_id
             GROUP BY 1, 2, 3
             ORDER BY 1, 2, 3"""

  private val NCent = 8
  private val NProbe = 2

  /** Shared IVF oracle (seeded centroids, NCent lists, NProbe probes):
    * [[annIvf]] and the persisted-index [[annIvfPersisted]] compute the
    * SAME result by contract, so one twin pins both.
    * [[ivfOracleSqlWhere]] adds a candidate metadata predicate at the
    * same point the engine applies `candFilter` — after probing,
    * before the re-rank. */
  private def ivfOracleSqlWhere(candCond: Option[String]): String = {
    val extra = candCond
      .map(c => s" AND cand_id IN (SELECT vec_id FROM embeddings WHERE $c)")
      .getOrElse("")
    ivfOracleSql.replace("WHERE query_id <> cand_id)",
      s"WHERE query_id <> cand_id$extra)")
  }

  private lazy val ivfOracleSql: String =
    s"""WITH qv AS (${qvSql()}),
               norms AS (SELECT vec_id, sum(v * v) AS nn FROM qv GROUP BY 1),
               cent AS (SELECT vec_id AS cid FROM embeddings ORDER BY vec_id LIMIT $NCent),
               cdots AS (
                 SELECT a.vec_id, c.cid, sum(a.v * b.v) AS dot
                 FROM qv a
                 JOIN cent c ON true
                 JOIN qv b ON b.vec_id = c.cid AND b.i = a.i
                 GROUP BY 1, 2),
               csim AS (
                 SELECT cdots.vec_id AS vec_id, cdots.cid AS cid,
                        dot::DOUBLE / (sqrt(n1.nn::DOUBLE) * sqrt(n2.nn::DOUBLE)) AS sim
                 FROM cdots
                 JOIN norms n1 ON cdots.vec_id = n1.vec_id
                 JOIN norms n2 ON cdots.cid = n2.vec_id),
               ranked_assign AS (
                 SELECT vec_id, cid, sim,
                        row_number() OVER (PARTITION BY vec_id
                          ORDER BY sim DESC, cid ASC) AS crank
                 FROM csim),
               corpus_lists AS (SELECT vec_id AS cand_id, cid FROM ranked_assign WHERE crank = 1),
               query_probes AS (SELECT vec_id AS query_id, cid FROM ranked_assign
                                WHERE crank <= $NProbe AND vec_id < 5),
               cand AS (
                 SELECT query_id, cand_id
                 FROM query_probes JOIN corpus_lists USING (cid)
                 WHERE query_id <> cand_id),
               dots AS (
                 SELECT query_id, cand_id, sum(a.v * b.v) AS dot
                 FROM cand
                 JOIN qv a ON a.vec_id = query_id
                 JOIN qv b ON b.vec_id = cand_id AND b.i = a.i
                 GROUP BY 1, 2),
               scored AS (
                 SELECT query_id, cand_id,
                        round(dot::DOUBLE / (sqrt(qn.nn::DOUBLE) * sqrt(cn.nn::DOUBLE)), 6) AS cosine
                 FROM dots
                 JOIN norms qn ON query_id = qn.vec_id
                 JOIN norms cn ON cand_id = cn.vec_id),
               ranked AS (
                 SELECT query_id, cand_id, cosine,
                        row_number() OVER (PARTITION BY query_id
                          ORDER BY cosine DESC, cand_id ASC) AS rank
                 FROM scored)
             SELECT query_id, rank, cand_id, cosine FROM ranked
             WHERE rank <= 5 ORDER BY query_id, rank"""

  /** IVF ANN: coarse-quantizer posting lists + nprobe probing — the
    * second scale path beside sign-LSH. Centroid assignment uses the
    * bit-exact quantized cosine, so DuckDB reproduces the exact lists. */
  val annIvf = Q("ann_ivf_topk",
    (s, dir) => Similarity.ivfTopK(
      emb(s, dir).filter(col("vec_id") < 5), emb(s, dir),
      k = 5, nCentroids = NCent, nprobe = NProbe)
      .select("query_id", "rank", "cand_id", "cosine")
      .orderBy("query_id", "rank"),
    Some(ivfOracleSql))

  /** The PERSISTED-index serving path ([[graft.ext.VectorIndex]]):
    * build centroids + cid-sorted posting lists as parquet tables, then
    * answer the query batch from the stored layout — probed cids become
    * a literal pushed-down IN filter, so only the covering row groups
    * are read. Same centroids/probes/re-rank as [[annIvf]] by
    * construction, so the same oracle pins it; `VectorIndexSpec`
    * asserts the pushdown. */
  val annIvfPersisted = Q("ann_ivf_persisted_topk",
    (s, dir) => {
      // built ONCE per (session, sf dir) — the bench measures the
      // serving probe, not a rebuild per invocation; the lifecycle
      // queries below keep building inline (Fixtures.indexPath)
      val path = Fixtures.indexPath(s, dir, "vindex") { p =>
        graft.ext.VectorIndex.write(emb(s, dir), p, nCentroids = NCent)
      }
      graft.ext.VectorIndex.topK(s, path,
          emb(s, dir).filter(col("vec_id") < 5), k = 5, nprobe = NProbe)
        .select("query_id", "rank", "cand_id", "cosine")
        .orderBy("query_id", "rank")
    },
    Some(ivfOracleSql))

  /** The APPEND ingest path ([[graft.ext.VectorIndex.append]]): build
    * the index over part of the corpus, append the rest against the
    * stored centroids, serve the same batch. The initial part holds the
    * NCent smallest vec_ids, so the split build's seed centroids equal
    * the full rebuild's — the SAME oracle as ann_ivf_topk therefore
    * pins append ≡ rebuild end-to-end. */
  /** A private clone of the half-corpus base index (vec_id < 250 —
    * the initial part must hold the NCent smallest vec_ids for
    * seed-centroid parity, and 250 stays below the 500-vector sf0.001
    * table so both halves are non-empty). The append/compact queries
    * measure their MUTATION protocol on top of it
    * ([[Fixtures.clonedIndex]]), not the base build. */
  private def halfIvfIndex(s: SparkSession, dir: String): String =
    Fixtures.clonedIndex(s, dir, "vindex-half") { p =>
      graft.ext.VectorIndex.write(
        emb(s, dir).filter(col("vec_id") < 250), p, nCentroids = NCent)
    }

  val annIvfAppend = Q("ann_ivf_append",
    (s, dir) => {
      val path = halfIvfIndex(s, dir)
      // generation-sized append: one cid-sorted file, no bounds-sampling job
      graft.ext.VectorIndex.append(
        emb(s, dir).filter(col("vec_id") >= 250), path, partitions = 1)
      graft.ext.VectorIndex.topK(s, path,
          emb(s, dir).filter(col("vec_id") < 5), k = 5, nprobe = NProbe)
        .select("query_id", "rank", "cand_id", "cosine")
        .orderBy("query_id", "rank")
    },
    Some(ivfOracleSql))

  /** The COMPACTION path ([[graft.ext.VectorIndex.compact]]): build +
    * append accumulate two posting shards, compact folds them back to
    * one, topK serves from the compacted layout. Same oracle as
    * ann_ivf_topk — the hash match pins compact as a pure layout
    * rewrite (results unchanged, fewer files per centroid probe). */
  /** FILTERED vector search: top-k under a candidate metadata
    * predicate ([[graft.ext.VectorIndex.topK]]'s `candFilter` over a
    * `metaCols`-carrying index — the label rides IN the posting rows,
    * so the predicate pushes to the same parquet scan as the cid
    * probe; no corpus join at serve time). Post-filter semantics: the
    * k nearest SURVIVORS of the probed lists, which the oracle
    * replays by restricting the candidate CTE with the same
    * condition. Result differs from ann_ivf_persisted_topk wherever
    * an odd-label neighbor held a top-5 slot, so the hash certifies
    * the filter actually reached the candidate set. */
  val annIvfFiltered = Q("ann_ivf_filtered",
    (s, dir) => {
      // built once per (session, sf dir), like ann_ivf_persisted_topk —
      // its own key: the metaCols-carrying layout is a different build
      val path = Fixtures.indexPath(s, dir, "vindex-fil") { p =>
        graft.ext.VectorIndex.write(emb(s, dir), p, nCentroids = NCent,
          metaCols = Seq("label"))
      }
      graft.ext.VectorIndex.topK(s, path,
          emb(s, dir).filter(col("vec_id") < 5), k = 5, nprobe = NProbe,
          candFilter = Some(col("label") % 2 === 0))
        .select("query_id", "rank", "cand_id", "cosine")
        .orderBy("query_id", "rank")
    },
    Some(ivfOracleSqlWhere(Some("label % 2 = 0"))))

  /** SCHEMA-EVOLVED filtered search (VERDICT r15 task 6): the base
    * index is built WITHOUT metadata, the second half appends with
    * `evolveMeta = label` — a mixed-schema index (v1 shard lacks the
    * column). Pinned semantics: the read schema is the NEWEST shard's
    * (evolution is additive), v1 rows surface `label` as NULL, and a
    * candFilter over the evolved column therefore keeps only NEW-shard
    * survivors (SQL three-valued logic — NULL predicate drops the
    * row). The oracle applies the identical restriction (new-half ids
    * with even labels) at the same candidate stage. v1 shard files stay
    * byte-untouched ([[graft.ext.VectorIndex.append]] contract). */
  val annIvfEvolved = Q("ann_ivf_evolved",
    (s, dir) => {
      val path = halfIvfIndex(s, dir) // fresh clone: evolution is the subject
      graft.ext.VectorIndex.append(
        emb(s, dir).filter(col("vec_id") >= 250), path, partitions = 1,
        evolveMeta = Seq("label"))
      graft.ext.VectorIndex.topK(s, path,
          emb(s, dir).filter(col("vec_id") < 5), k = 5, nprobe = NProbe,
          candFilter = Some(col("label") % 2 === 0))
        .select("query_id", "rank", "cand_id", "cosine")
        .orderBy("query_id", "rank")
    },
    Some(ivfOracleSqlWhere(Some("vec_id >= 250 AND label % 2 = 0"))))

  /** The VERSIONED-POINTER publish route for the vector index
    * ([[graft.ext.VectorIndex.writeVersioned]] — the dd_minhash_versioned
    * twin): a half-corpus v00001 then a full rebuild v00002 under one
    * root, serving resolves the CURRENT pointer. The half-corpus v1
    * returns different neighbors, so the shared oracle's hash
    * certifies the pointer really flipped to the full rebuild. */
  val annIvfVersioned = Q("ann_ivf_versioned",
    (s, dir) => {
      // v1 (the half-corpus stale version) is the fixture; the measured
      // subject is the v2 rebuild + pointer flip + pointer-resolved serve
      val root = Fixtures.clonedIndex(s, dir, "vindex-ver-base") { p =>
        graft.ext.VectorIndex.writeVersioned(
          emb(s, dir).filter(col("vec_id") < 250), p, nCentroids = NCent)
      }
      graft.ext.VectorIndex.writeVersioned(emb(s, dir), root, nCentroids = NCent)
      graft.ext.VectorIndex.topKCurrent(s, root,
          emb(s, dir).filter(col("vec_id") < 5), k = 5, nprobe = NProbe)
        .select("query_id", "rank", "cand_id", "cosine")
        .orderBy("query_id", "rank")
    },
    Some(ivfOracleSql))

  /** The TOMBSTONE-DELETE path ([[graft.ext.VectorIndex.delete]]):
    * index the full corpus, tombstone every seventh vector, serve the
    * query batch. The engine never rebuilds — topK anti-joins the
    * stored delete shard out of the probed lists, after the cid probe
    * and before the re-rank — while the oracle excludes the tombstoned
    * ids at exactly that point ([[ivfOracleSqlWhere]], the candFilter
    * position): the hash match certifies delete-without-rebuild ≡
    * candidate-excluded, survivors back-filling the top-k. */
  val annIvfDelete = Q("ann_ivf_delete",
    (s, dir) => {
      // the full-corpus base is the same build ann_ivf_persisted_topk
      // memoizes; the measured subject is tombstone + serve-with-deletes
      val path = Fixtures.clonedIndex(s, dir, "vindex") { p =>
        graft.ext.VectorIndex.write(emb(s, dir), p, nCentroids = NCent)
      }
      graft.ext.VectorIndex.delete(
        emb(s, dir).filter(col("vec_id") % 7 === 0).select("vec_id"), path)
      graft.ext.VectorIndex.topK(s, path,
          emb(s, dir).filter(col("vec_id") < 5), k = 5, nprobe = NProbe)
        .select("query_id", "rank", "cand_id", "cosine")
        .orderBy("query_id", "rank")
    },
    Some(ivfOracleSqlWhere(Some("vec_id % 7 <> 0"))))

  val annIvfCompact = Q("ann_ivf_compact",
    (s, dir) => {
      // the compacted-from state (base + one appended shard) is the
      // fixture; compact + serve are the measured subject (the append
      // protocol itself is ann_ivf_append's subject)
      val path = Fixtures.clonedIndex(s, dir, "vindex-split") { p =>
        graft.ext.VectorIndex.write(
          emb(s, dir).filter(col("vec_id") < 250), p, nCentroids = NCent)
        graft.ext.VectorIndex.append(
          emb(s, dir).filter(col("vec_id") >= 250), p)
      }
      graft.ext.VectorIndex.compact(s, path)
      graft.ext.VectorIndex.topK(s, path,
          emb(s, dir).filter(col("vec_id") < 5), k = 5, nprobe = NProbe)
        .select("query_id", "rank", "cand_id", "cosine")
        .orderBy("query_id", "rank")
    },
    Some(ivfOracleSql))

  /** The MAINTENANCE-POLICY path ([[graft.ext.VectorIndex.maintain]],
    * round 10): from the split (base + appended shard) state, `maintain`
    * with maxShards = 1 decides and runs the fold itself, then topK
    * serves from whatever layout it chose. Same oracle as
    * append/compact — the policy may only ever change layout. */
  val annIvfMaintain = Q("ann_ivf_maintain",
    (s, dir) => {
      val path = Fixtures.clonedIndex(s, dir, "vindex-split-maint") { p =>
        graft.ext.VectorIndex.write(
          emb(s, dir).filter(col("vec_id") < 250), p, nCentroids = NCent)
        graft.ext.VectorIndex.append(
          emb(s, dir).filter(col("vec_id") >= 250), p, partitions = 1)
      }
      graft.ext.VectorIndex.maintain(s, path, maxShards = 1, partitions = 1)
      graft.ext.VectorIndex.topK(s, path,
          emb(s, dir).filter(col("vec_id") < 5), k = 5, nprobe = NProbe)
        .select("query_id", "rank", "cand_id", "cosine")
        .orderBy("query_id", "rank")
    },
    Some(ivfOracleSql))

  /** One unrolled Lloyd iteration `cent{k-1}` → `cent{k}` over quantized
    * components (cid, i, cv): bit-exact quantized-cosine assignment with
    * the (sim DESC, cid ASC) argmax tiebreak, then the per-position
    * INT64-sum → rounded-mean update — the exact twin of
    * `Similarity.trainIvfCentroids`'s loop body. */
  private def lloydIterSql(k: Int): String = {
    val p = s"cent${k - 1}"
    s"""cn$k AS (SELECT cid, sum(cv * cv) AS nn FROM $p GROUP BY 1),
        cd$k AS (SELECT a.vec_id, c.cid, sum(a.v * c.cv) AS dot
                 FROM qv a JOIN $p c ON a.i = c.i GROUP BY 1, 2),
        cs$k AS (SELECT cd$k.vec_id AS vec_id, cd$k.cid AS cid,
                        dot::DOUBLE / (sqrt(n1.nn::DOUBLE) * sqrt(cn$k.nn::DOUBLE)) AS sim
                 FROM cd$k
                 JOIN norms n1 ON cd$k.vec_id = n1.vec_id
                 JOIN cn$k ON cd$k.cid = cn$k.cid),
        as$k AS (SELECT vec_id, cid FROM (
                   SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
                     ORDER BY sim DESC, cid ASC) AS rk FROM cs$k) WHERE rk = 1),
        ct$k AS (SELECT cid, count(*) AS n FROM as$k GROUP BY 1),
        cent$k AS (SELECT a1.cid, a.i,
                          CAST(round(sum(a.v)::DOUBLE / ct$k.n) AS BIGINT) AS cv
                   FROM as$k a1
                   JOIN qv a ON a.vec_id = a1.vec_id
                   JOIN ct$k ON a1.cid = ct$k.cid
                   GROUP BY a1.cid, a.i, ct$k.n)"""
  }

  private val TrainIters = 2

  /** IVF with TRAINED centroids: 2 deterministic Lloyd iterations from
    * the lowest-id seeds, then the same posting-list serve path — pins
    * the training loop (assignment argmax + integer-mean update) that
    * the seeded `ann_ivf_topk` never exercises. */
  val annIvfTrained = Q("ann_ivf_trained_topk",
    (s, dir) => {
      // TRAINED-centroid index memoized like the persisted probes
      // (round-12, VERDICT r11 task 4): the deterministic Lloyd train
      // runs ONCE inside the fixture build (`VectorIndex.write(
      // iterations = TrainIters)` — spec-pinned drop-in for the inline
      // trained path), and the measured serve is the same pushed-
      // literal posting probe as ann_ivf_persisted_topk instead of a
      // whole-corpus re-assignment per invocation. The training loop
      // still pins cross-engine through the oracle's replayed Lloyd
      // iterations; the inline ann_ivf_topk keeps the build-per-
      // invocation lifecycle shape (the build IS its subject).
      val path = Fixtures.indexPath(s, dir, "vindex-trained") { p =>
        graft.ext.VectorIndex.write(emb(s, dir), p, nCentroids = NCent,
          iterations = TrainIters)
      }
      graft.ext.VectorIndex.topK(s, path,
          emb(s, dir).filter(col("vec_id") < 5), k = 5, nprobe = NProbe)
        .select("query_id", "rank", "cand_id", "cosine")
        .orderBy("query_id", "rank")
    },
    Some(s"""WITH qv AS (${qvSql()}),
               norms AS (SELECT vec_id, sum(v * v) AS nn FROM qv GROUP BY 1),
               cent0 AS (
                 SELECT vec_id AS cid, i, v AS cv FROM qv
                 WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT $NCent)),
               ${(1 to TrainIters).map(lloydIterSql).mkString(",\n")},
               centf AS (SELECT * FROM cent$TrainIters),
               cnf AS (SELECT cid, sum(cv * cv) AS nn FROM centf GROUP BY 1),
               cdots AS (
                 SELECT a.vec_id, c.cid, sum(a.v * c.cv) AS dot
                 FROM qv a JOIN centf c ON a.i = c.i GROUP BY 1, 2),
               csim AS (
                 SELECT cdots.vec_id AS vec_id, cdots.cid AS cid,
                        dot::DOUBLE / (sqrt(n1.nn::DOUBLE) * sqrt(cnf.nn::DOUBLE)) AS sim
                 FROM cdots
                 JOIN norms n1 ON cdots.vec_id = n1.vec_id
                 JOIN cnf ON cdots.cid = cnf.cid),
               ranked_assign AS (
                 SELECT vec_id, cid, sim,
                        row_number() OVER (PARTITION BY vec_id
                          ORDER BY sim DESC, cid ASC) AS crank
                 FROM csim),
               corpus_lists AS (SELECT vec_id AS cand_id, cid FROM ranked_assign WHERE crank = 1),
               query_probes AS (SELECT vec_id AS query_id, cid FROM ranked_assign
                                WHERE crank <= $NProbe AND vec_id < 5),
               cand AS (
                 SELECT query_id, cand_id
                 FROM query_probes JOIN corpus_lists USING (cid)
                 WHERE query_id <> cand_id),
               dots AS (
                 SELECT query_id, cand_id, sum(a.v * b.v) AS dot
                 FROM cand
                 JOIN qv a ON a.vec_id = query_id
                 JOIN qv b ON b.vec_id = cand_id AND b.i = a.i
                 GROUP BY 1, 2),
               scored AS (
                 SELECT query_id, cand_id,
                        round(dot::DOUBLE / (sqrt(qn.nn::DOUBLE) * sqrt(cn.nn::DOUBLE)), 6) AS cosine
                 FROM dots
                 JOIN norms qn ON query_id = qn.vec_id
                 JOIN norms cn ON cand_id = cn.vec_id),
               ranked AS (
                 SELECT query_id, cand_id, cosine,
                        row_number() OVER (PARTITION BY query_id
                          ORDER BY cosine DESC, cand_id ASC) AS rank
                 FROM scored)
             SELECT query_id, rank, cand_id, cosine FROM ranked
             WHERE rank <= 5 ORDER BY query_id, rank"""))

  /** SemDeDup: cluster-scoped semantic dedup
    * ([[Similarity.semDedupKeep]]) over the corpus with planted
    * near-dups (every 25th vector re-entered with its first two
    * components zeroed under id+1e6 — the same planted-rows pattern as
    * `dd_embed_neardup`, which prunes the SAME pairs by sign-LSH; this
    * prunes by coarse-quantizer cluster). The oracle rebuilds the
    * identical assignment argmax and within-cluster pairwise cosine. */
  val ddSemDedup = Q("dd_semdedup",
    (s, dir) => {
      val e = emb(s, dir)
      val planted = e.filter(col("vec_id") % 25 === 0)
        .select((col("vec_id") + 1000000L).as("vec_id"),
          concat(array(lit(0.0f), lit(0.0f)),
            slice(col("embedding"), 3, Dim - 2)).as("embedding"))
      val corpus = e.select("vec_id", "embedding").unionByName(planted)
      Similarity.semDedupKeep(corpus, nCentroids = NCent, minCosine = 0.9)
        .orderBy("vec_id")
    },
    Some(s"""WITH corpus AS (
               SELECT vec_id, embedding FROM embeddings
               UNION ALL
               SELECT vec_id + 1000000 AS vec_id,
                      list_concat([0.0::FLOAT, 0.0::FLOAT], embedding[3:]) AS embedding
               FROM embeddings WHERE vec_id % 25 = 0),
             qv AS (
               SELECT vec_id, i, CAST(round(embedding[i] * 32768.0) AS BIGINT) AS v
               FROM corpus, range(1, ${Dim + 1}) t(i)),
             norms AS (SELECT vec_id, sum(v * v) AS nn FROM qv GROUP BY 1),
             cent AS (SELECT vec_id AS cid FROM corpus ORDER BY vec_id LIMIT $NCent),
             cdots AS (
               SELECT a.vec_id, c.cid, sum(a.v * b.v) AS dot
               FROM qv a
               JOIN cent c ON true
               JOIN qv b ON b.vec_id = c.cid AND b.i = a.i
               GROUP BY 1, 2),
             csim AS (
               SELECT cdots.vec_id, cdots.cid,
                      dot::DOUBLE / (sqrt(n1.nn::DOUBLE) * sqrt(n2.nn::DOUBLE)) AS sim
               FROM cdots
               JOIN norms n1 ON cdots.vec_id = n1.vec_id
               JOIN norms n2 ON cdots.cid = n2.vec_id),
             assign AS (
               SELECT vec_id, cid FROM (
                 SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
                   ORDER BY sim DESC, cid ASC) AS rn FROM csim)
               WHERE rn = 1),
             pairs AS (
               SELECT x.vec_id AS a, y.vec_id AS b
               FROM assign x JOIN assign y
                 ON x.cid = y.cid AND y.vec_id < x.vec_id),
             pdots AS (
               SELECT a, b, sum(p.v * q.v) AS dot
               FROM pairs
               JOIN qv p ON p.vec_id = a
               JOIN qv q ON q.vec_id = b AND q.i = p.i
               GROUP BY 1, 2),
             dropped AS (
               SELECT DISTINCT a AS vec_id
               FROM pdots
               JOIN norms na ON a = na.vec_id
               JOIN norms nb ON b = nb.vec_id
               WHERE round(dot::DOUBLE / (sqrt(na.nn::DOUBLE) * sqrt(nb.nn::DOUBLE)), 6)
                     >= 0.9::DOUBLE)
           SELECT assign.vec_id, assign.cid,
                  (dropped.vec_id IS NOT NULL) AS dropped
           FROM assign LEFT JOIN dropped USING (vec_id)
           ORDER BY vec_id"""))

  private val PqM = 8   // subspaces (64-dim → 8×8)
  private val PqKs = 16 // codewords per subspace

  /** Shared oracle CTE fragments — each tier's ranking chain has ONE
    * SQL body, composed into both its own query's oracle and the
    * recall audit's (independent copies of a 20-line CTE chain drift;
    * the [[qvSql]] / `mhSigSqlOf` precedent). All assume `qv` (and for
    * [[exactRankedCtes]], `norms`) CTEs in scope. */
  private def pqCtes: String =
    s"""seeds AS (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT $PqKs),
               cw AS (
                 SELECT vec_id AS code, (i - 1) // ${Dim / PqM} AS s, i, v AS w
                 FROM qv WHERE vec_id IN (SELECT vec_id FROM seeds)),
               cdist AS (
                 SELECT a.vec_id AS vid, c.s, c.code,
                        CAST(sum((a.v - c.w) * (a.v - c.w)) AS BIGINT) AS d2
                 FROM qv a JOIN cw c ON c.i = a.i
                 GROUP BY 1, 2, 3),
               codes AS (
                 SELECT vid AS cand_id, s, code FROM (
                   SELECT vid, s, code,
                          row_number() OVER (PARTITION BY vid, s
                            ORDER BY d2 ASC, code ASC) AS rn
                   FROM cdist)
                 WHERE rn = 1),
               qtab AS (
                 SELECT vid AS query_id, s, code, d2 FROM cdist WHERE vid < 5),
               adc AS (
                 SELECT t.query_id, c.cand_id, CAST(sum(t.d2) AS BIGINT) AS adist
                 FROM codes c JOIN qtab t ON t.s = c.s AND t.code = c.code
                 GROUP BY 1, 2)"""

  private def sqCtes: String =
    s"""mxs AS (
               SELECT vec_id,
                      list_max(list_transform(embedding,
                        x -> abs(CAST(x AS DOUBLE)))) AS mx
               FROM embeddings),
             sqv AS (
               SELECT e.vec_id, i,
                      CASE WHEN m.mx = 0 THEN 0
                           ELSE CAST(round((CAST(embedding[i] AS DOUBLE) * 127.0) / m.mx)
                                     AS BIGINT) END AS v
               FROM embeddings e JOIN mxs m USING (vec_id), range(1, ${Dim + 1}) t(i)),
             sdots AS (
               SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
                      CAST(sum(q.v * c.v) AS BIGINT) AS dot
               FROM sqv q JOIN sqv c ON q.i = c.i AND q.vec_id <> c.vec_id
               WHERE q.vec_id < 5
               GROUP BY 1, 2)"""

  private def bqBitsCtes: String =
    s"""bits AS (
                 SELECT vec_id,
                        sum(CASE WHEN v > 0 AND i <= 32 THEN (1::BIGINT << (i - 1)) ELSE 0 END) AS b0,
                        sum(CASE WHEN v > 0 AND i > 32 THEN (1::BIGINT << (i - 33)) ELSE 0 END) AS b1
                 FROM qv GROUP BY 1)"""

  /** Full-precision exact ranking (edots → eranked) — the truth leg
    * shared by the per-hit `in_exact` flags and the recall audits. */
  private def exactRankedCtes: String =
    s"""edots AS (
                 SELECT q.vec_id AS query_id, c.vec_id AS cand_id, sum(q.v * c.v) AS dot
                 FROM qv q JOIN qv c ON q.i = c.i AND q.vec_id <> c.vec_id
                 WHERE q.vec_id < 5 GROUP BY 1, 2),
               eranked AS (
                 SELECT query_id, cand_id,
                        row_number() OVER (PARTITION BY query_id
                          ORDER BY round(dot::DOUBLE / (sqrt(qn.nn::DOUBLE) * sqrt(cn.nn::DOUBLE)), 6) DESC,
                                   cand_id ASC) AS rank
                 FROM edots
                 JOIN norms qn ON query_id = qn.vec_id
                 JOIN norms cn ON cand_id = cn.vec_id)"""

  /** Product-quantization ANN (ADC): vectors compressed to 8 codes of
    * 16 codewords each; candidates ranked by summed per-subspace lookup
    * distances — the compression scale path ([[Similarity.pqTopK]]).
    * Everything is INT64 squared-L2 over quantized components, so the
    * oracle reproduces codes, distance tables, and ranking bit-exactly
    * (the one approximation — PQ itself — is deterministic). */
  val annPq = Q("ann_pq_topk",
    (s, dir) => Similarity.pqTopK(
      emb(s, dir).filter(col("vec_id") < 5), emb(s, dir),
      k = 5, m = PqM, ks = PqKs, dim = Dim)
      .select("query_id", "rank", "cand_id", "adist", "in_exact")
      .orderBy("query_id", "rank"),
    Some(s"""WITH qv AS (${qvSql()}),
               $pqCtes,
               ranked AS (
                 SELECT query_id, cand_id, adist,
                        row_number() OVER (PARTITION BY query_id
                          ORDER BY adist ASC, cand_id ASC) AS rank
                 FROM adc WHERE query_id <> cand_id),
               norms AS (SELECT vec_id, sum(v * v) AS nn FROM qv GROUP BY 1),
               $exactRankedCtes
             SELECT r.query_id, r.rank, r.cand_id, r.adist,
                    (e.cand_id IS NOT NULL) AS in_exact
             FROM ranked r
             LEFT JOIN (SELECT query_id, cand_id FROM eranked WHERE rank <= 5) e
               ON r.query_id = e.query_id AND r.cand_id = e.cand_id
             WHERE r.rank <= 5 ORDER BY r.query_id, r.rank"""))

  /** int8 scalar-quantized ANN with a per-hit `in_exact` recall flag
    * against the full-precision top-10 ([[Similarity.sqTopK]]) — the
    * compression-acceptance report for a memory-bound serving tier.
    * Every ranked score is an INT64 dot over engine-portable int8
    * codes; the oracle rebuilds the quantization (per-vector max-abs
    * scale, round half away from zero) and both rankings in SQL. */
  /** Binary-quantization ANN: sign bits packed 32/word (two INT64
    * words at dim=64 — 16 bytes/vector, the deepest compression tier),
    * Hamming prefilter to 50 candidates, exact re-rank to top-10. The
    * oracle rebuilds the identical packed words (`v > 0` on the same
    * quantized components, 32-bit-safe shifts), XOR+popcount Hamming,
    * and the shared (cosine desc, cand_id asc) re-rank contract. */
  val annBq = Q("ann_bq_topk",
    (s, dir) => Similarity.bqTopK(
      emb(s, dir).filter(col("vec_id") < 5), emb(s, dir),
      k = 10, dim = Dim, nCandidates = 50)
      .select("query_id", "rank", "cand_id", "cosine", "in_exact")
      .orderBy("query_id", "rank"),
    Some(s"""WITH qv AS (${qvSql()}),
               $bqBitsCtes,
               pre AS (
                 SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
                        bit_count(xor(q.b0, c.b0)) + bit_count(xor(q.b1, c.b1)) AS ham
                 FROM bits q JOIN bits c ON q.vec_id <> c.vec_id
                 WHERE q.vec_id < 5),
               cand AS (
                 SELECT query_id, cand_id FROM (
                   SELECT query_id, cand_id,
                          row_number() OVER (PARTITION BY query_id
                            ORDER BY ham ASC, cand_id ASC) AS crank
                   FROM pre) WHERE crank <= 50),
               norms AS (SELECT vec_id, sum(v * v) AS nn FROM qv GROUP BY 1),
               dots AS (
                 SELECT query_id, cand_id, sum(a.v * b.v) AS dot
                 FROM cand
                 JOIN qv a ON a.vec_id = query_id
                 JOIN qv b ON b.vec_id = cand_id AND b.i = a.i
                 GROUP BY 1, 2),
               scored AS (
                 SELECT query_id, cand_id,
                        round(dot::DOUBLE / (sqrt(qn.nn::DOUBLE) * sqrt(cn.nn::DOUBLE)), 6) AS cosine
                 FROM dots
                 JOIN norms qn ON query_id = qn.vec_id
                 JOIN norms cn ON cand_id = cn.vec_id),
               ranked AS (
                 SELECT query_id, cand_id, cosine,
                        row_number() OVER (PARTITION BY query_id
                          ORDER BY cosine DESC, cand_id ASC) AS rank
                 FROM scored),
               $exactRankedCtes
             SELECT r.query_id, r.rank, r.cand_id, r.cosine,
                    (e.cand_id IS NOT NULL) AS in_exact
             FROM ranked r
             LEFT JOIN (SELECT query_id, cand_id FROM eranked WHERE rank <= 10) e
               ON r.query_id = e.query_id AND r.cand_id = e.cand_id
             WHERE r.rank <= 10 ORDER BY r.query_id, r.rank"""))

  val annSq = Q("ann_sq_topk",
    (s, dir) => Similarity.sqTopK(
      emb(s, dir).filter(col("vec_id") < 5), emb(s, dir), k = 10)
      .orderBy("query_id", "rank"),
    Some(s"""WITH $sqCtes,
             sranked AS (
               SELECT query_id, cand_id, dot,
                      row_number() OVER (PARTITION BY query_id
                        ORDER BY dot DESC, cand_id ASC) AS rank
               FROM sdots),
             qq AS (${qvSql("WHERE vec_id < 5")}),
             cc AS (${qvSql()}),
             qn AS (SELECT vec_id, sum(v * v) AS nn FROM qq GROUP BY 1),
             cn AS (SELECT vec_id, sum(v * v) AS nn FROM cc GROUP BY 1),
             edots AS (
               SELECT qq.vec_id AS query_id, cc.vec_id AS cand_id, sum(qq.v * cc.v) AS dot
               FROM qq JOIN cc ON qq.i = cc.i
               WHERE qq.vec_id <> cc.vec_id
               GROUP BY 1, 2),
             escored AS (
               SELECT query_id, cand_id,
                      round(dot::DOUBLE / (sqrt(qn.nn::DOUBLE) * sqrt(cn.nn::DOUBLE)), 6) AS cosine
               FROM edots
               JOIN qn ON query_id = qn.vec_id
               JOIN cn ON cand_id = cn.vec_id),
             eranked AS (
               SELECT query_id, cand_id,
                      row_number() OVER (PARTITION BY query_id
                        ORDER BY cosine DESC, cand_id ASC) AS rank
               FROM escored)
           SELECT s.query_id, s.rank, s.cand_id, s.dot,
                  (e.cand_id IS NOT NULL) AS in_exact
           FROM sranked s
           LEFT JOIN (SELECT query_id, cand_id FROM eranked WHERE rank <= 10) e
             ON s.query_id = e.query_id AND s.cand_id = e.cand_id
           WHERE s.rank <= 10
           ORDER BY s.query_id, s.rank"""))

  /** ANN RECALL AUDIT: per-query recall@5 of the IVF tier against the
    * exact brute-force truth, swept over nprobe ∈ {1, 2, 4} — the
    * tuning curve that decides how many posting lists a deployment
    * probes (recall climbs with nprobe while probe work grows linearly
    * in probed lists; at 100 TB this sweep runs on a sampled query set
    * before committing an nprobe to the serving config). Pure
    * composition of two already-pinned operators
    * ([[Similarity.ivfTopK]], [[Similarity.bruteForceTopK]]) plus exact
    * arithmetic (matched count / 5 ∈ {0.0, 0.2, …}), so the oracle
    * replays both chains and the recall values are bit-identical. The
    * truth×nprobe grid LEFT-joins the retrieved sets so a zero-overlap
    * (query, nprobe) cell still reports recall 0.0. */
  val annRecall = Q("ann_recall",
    (s, dir) => {
      import s.implicits._
      val q = emb(s, dir).filter(col("vec_id") < 5)
      val c = emb(s, dir)
      val truth = Similarity.bruteForceTopK(q, c, k = 5)
        .select(col("query_id"), col("cand_id"))
      val retrieved = Seq(1, 2, 4).map { np =>
        Similarity.ivfTopK(q, c, k = 5, nCentroids = NCent, nprobe = np)
          .select(col("query_id"), col("cand_id"), lit(np).as("nprobe"))
      }.reduce(_ unionByName _)
      truth.crossJoin(Seq(1, 2, 4).toDF("nprobe")).as("t")
        .join(retrieved.as("r"),
          col("t.query_id") === col("r.query_id") &&
            col("t.cand_id") === col("r.cand_id") &&
            col("t.nprobe") === col("r.nprobe"), "left")
        .groupBy(col("t.nprobe").as("nprobe"), col("t.query_id").as("query_id"))
        .agg((count(col("r.cand_id")) / lit(5.0)).as("recall"))
        .orderBy("nprobe", "query_id")
    },
    Some(ivfRecallOracle(qvSql())))

  /** The ann_recall oracle over an arbitrary `qv` CTE — shared by the
    * uniform and CLUSTERED fixtures (centroid seeding picks IDS, which
    * are fixture-independent; every similarity reads qv). */
  private def ivfRecallOracle(qvCte: String): String =
    s"""WITH qv AS ($qvCte),
               norms AS (SELECT vec_id, sum(v * v) AS nn FROM qv GROUP BY 1),
               $exactRankedCtes,
               truth AS (SELECT query_id, cand_id FROM eranked WHERE rank <= 5),
               cent AS (SELECT vec_id AS cid FROM embeddings ORDER BY vec_id LIMIT $NCent),
               cdots AS (
                 SELECT a.vec_id, c.cid, sum(a.v * b.v) AS dot
                 FROM qv a
                 JOIN cent c ON true
                 JOIN qv b ON b.vec_id = c.cid AND b.i = a.i
                 GROUP BY 1, 2),
               csim AS (
                 SELECT cdots.vec_id AS vec_id, cdots.cid AS cid,
                        dot::DOUBLE / (sqrt(n1.nn::DOUBLE) * sqrt(n2.nn::DOUBLE)) AS sim
                 FROM cdots
                 JOIN norms n1 ON cdots.vec_id = n1.vec_id
                 JOIN norms n2 ON cdots.cid = n2.vec_id),
               ranked_assign AS (
                 SELECT vec_id, cid, sim,
                        row_number() OVER (PARTITION BY vec_id
                          ORDER BY sim DESC, cid ASC) AS crank
                 FROM csim),
               corpus_lists AS (SELECT vec_id AS cand_id, cid FROM ranked_assign WHERE crank = 1),
               probes AS (SELECT np FROM (VALUES (1), (2), (4)) p(np)),
               query_probes AS (
                 SELECT p.np, vec_id AS query_id, cid
                 FROM ranked_assign, probes p
                 WHERE crank <= p.np AND vec_id < 5),
               cand AS (
                 SELECT np, query_id, cand_id
                 FROM query_probes JOIN corpus_lists USING (cid)
                 WHERE query_id <> cand_id),
               pairs AS (SELECT DISTINCT query_id, cand_id FROM cand),
               dots AS (
                 SELECT query_id, cand_id, sum(a.v * b.v) AS dot
                 FROM pairs
                 JOIN qv a ON a.vec_id = query_id
                 JOIN qv b ON b.vec_id = cand_id AND b.i = a.i
                 GROUP BY 1, 2),
               scored AS (
                 SELECT query_id, cand_id,
                        round(dot::DOUBLE / (sqrt(qn.nn::DOUBLE) * sqrt(cn.nn::DOUBLE)), 6) AS cosine
                 FROM dots
                 JOIN norms qn ON query_id = qn.vec_id
                 JOIN norms cn ON cand_id = cn.vec_id),
               retr AS (
                 SELECT np, query_id, cand_id FROM (
                   SELECT c.np, c.query_id, c.cand_id,
                          row_number() OVER (PARTITION BY c.np, c.query_id
                            ORDER BY s.cosine DESC, c.cand_id ASC) AS rank
                   FROM cand c JOIN scored s USING (query_id, cand_id))
                 WHERE rank <= 5)
             SELECT p.np AS nprobe, t.query_id,
                    count(r.cand_id)::DOUBLE / 5 AS recall
             FROM truth t
             CROSS JOIN probes p
             LEFT JOIN retr r ON r.np = p.np AND r.query_id = t.query_id
                             AND r.cand_id = t.cand_id
             GROUP BY 1, 2
             ORDER BY 1, 2"""

  /** CLUSTERED fixture (VERDICT r15 task 4): the recall audits so far
    * ran on the driver's near-uniform synthetic embeddings — the regime
    * where every bucket/list looks alike and single-probe LSH measured
    * unusable (round 13). Real-world embeddings cluster, so this
    * derives a deterministic Gaussian-mixture-like corpus FROM the
    * driver fixture: every vector is pulled 85% toward the embedding of
    * `vec_id % 16` (16 tight clusters, cluster spread set by the
    * residual 15% of the original vector). The blend computes in DOUBLE
    * and rounds to FLOAT on both engines, so the quantized-INT64 pipeline
    * downstream stays bit-identical. */
  private val ClusterCenters = 16
  private val ClusterPull = 0.85

  private def clusteredEmb(s: SparkSession, dir: String) = {
    val e = emb(s, dir)
    val centers = e.filter(col("vec_id") < ClusterCenters)
      .select(col("vec_id").as("center_id"), col("embedding").as("cemb"))
    e.join(broadcast(centers), (col("vec_id") % ClusterCenters) === col("center_id"))
      .select(col("vec_id"),
        zip_with(col("cemb"), col("embedding"), (c, x) =>
          (lit(ClusterPull) * c.cast("double") +
            lit(1.0 - ClusterPull) * x.cast("double")).cast("float"))
          .as("embedding"))
  }

  private def qvClusteredSql(where: String = "") =
    s"""SELECT e.vec_id, t.i,
               CAST(round(CAST($ClusterPull * c.embedding[t.i] +
                               ${1.0 - ClusterPull} * e.embedding[t.i] AS FLOAT)
                          * 32768.0) AS BIGINT) AS v
        FROM (SELECT vec_id, embedding FROM embeddings $where) e
        JOIN embeddings c ON c.vec_id = e.vec_id % $ClusterCenters,
        range(1, ${Dim + 1}) t(i)"""

  /** [[annRecall]] over the clustered fixture: the IVF nprobe curve a
    * deployment actually sees on clustered data. */
  val annRecallClustered = Q("ann_recall_clustered",
    (s, dir) => {
      import s.implicits._
      val cemb = clusteredEmb(s, dir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val q = cemb.filter(col("vec_id") < 5)
      val truth = Similarity.bruteForceTopK(q, cemb, k = 5)
        .select(col("query_id"), col("cand_id"))
      val retrieved = Seq(1, 2, 4).map { np =>
        Similarity.ivfTopK(q, cemb, k = 5, nCentroids = NCent, nprobe = np)
          .select(col("query_id"), col("cand_id"), lit(np).as("nprobe"))
      }.reduce(_ unionByName _)
      truth.crossJoin(Seq(1, 2, 4).toDF("nprobe")).as("t")
        .join(retrieved.as("r"),
          col("t.query_id") === col("r.query_id") &&
            col("t.cand_id") === col("r.cand_id") &&
            col("t.nprobe") === col("r.nprobe"), "left")
        .groupBy(col("t.nprobe").as("nprobe"), col("t.query_id").as("query_id"))
        .agg((count(col("r.cand_id")) / lit(5.0)).as("recall"))
        .orderBy("nprobe", "query_id")
    },
    Some(ivfRecallOracle(qvClusteredSql())))

  /** [[annLshRecall]] over the clustered fixture: where sign-LSH
    * multi-probe earns (or fails to earn) its keep on data with real
    * cluster structure — the measurement the round-13 recommendation
    * was missing. */
  val annLshRecallClustered = Q("ann_lsh_recall_clustered",
    (s, dir) => {
      import s.implicits._
      val cemb = clusteredEmb(s, dir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val q = cemb.filter(col("vec_id") < 5)
      val truth = Similarity.bruteForceTopK(q, cemb, k = 5)
        .select(col("query_id"), col("cand_id"))
      val perPlane = LshGrid.map { case (pl, prs) =>
        val cands = Similarity.lshProbeCandidates(q, cemb, pl, Dim)
          .crossJoin(prs.toDF("probes"))
          .filter(col("probe_rank") <= col("probes"))
        val agg = cands
          .join(truth.withColumn("t", lit(true)),
            Seq("query_id", "cand_id"), "left")
          .withColumn("rank", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("probes", "query_id")
              .orderBy(col("cosine").desc, col("cand_id").asc)))
          .groupBy("probes", "query_id")
          .agg(
            (sum(when(col("rank") <= 5 && coalesce(col("t"), lit(false)), 1L)
              .otherwise(0L)) / lit(5.0)).as("recall"),
            count(lit(1)).as("n_cand"))
        truth.select("query_id").distinct()
          .crossJoin(prs.toDF("probes"))
          .join(agg, Seq("probes", "query_id"), "left")
          .select(lit(pl).as("planes"), col("probes"), col("query_id"),
            coalesce(col("recall"), lit(0.0)).as("recall"),
            coalesce(col("n_cand"), lit(0L)).as("n_cand"))
      }
      perPlane.reduce(_ unionByName _).orderBy("planes", "probes", "query_id")
    },
    Some(lshRecallOracle(qvClusteredSql())))

  /** QUANTIZED-TIER RECALL AUDIT (the [[annRecall]] pattern applied to
    * the three compression tiers — PQ-ADC, int8 SQ, binary-quantized
    * Hamming): per-query recall@5 of the tier's CANDIDATE set against
    * the exact brute-force truth, swept over the candidate bound C ∈
    * {5, 10, 25}. C is the knob these tiers actually expose — each
    * trades exactness for speed by ranking on a compressed code, and a
    * deployment recovers accuracy by exact-re-ranking the top-C
    * compressed candidates; since that re-rank is order-preserving on
    * the survivors, |truth ∩ top-C| / 5 IS the recall@5 the tier can
    * achieve at bound C. PQ/SQ candidate-at-C sets fall out of one
    * ranked call each (rank ≤ C); BQ's Hamming prefilter is re-run per
    * C (its survivor set is the bound, [[Similarity.bqTopK]]
    * nCandidates). All arithmetic is exact (INT64 codes, count/5), so
    * the oracle replays every chain and the curve is bit-identical.
    * The truth × tier × C grid LEFT-joins the retrieved sets so a
    * zero-overlap cell still reports recall 0.0. */
  val annQuantRecall = Q("ann_quant_recall",
    (s, dir) => {
      import s.implicits._
      val q = emb(s, dir).filter(col("vec_id") < 5)
      val c = emb(s, dir)
      val Cs = Seq(5, 10, 25)
      val maxC = Cs.max
      val truth = Similarity.bruteForceTopK(q, c, k = 5)
        .select(col("query_id"), col("cand_id"))
      // PQ/SQ: one ranked call each at the max bound; membership at C is
      // rank ≤ C (ranks are deterministic: adist/dot with cand_id ties).
      // includeExact = false: the audit computes its OWN truth once —
      // the tiers' per-hit recall legs would be two redundant
      // whole-corpus exact passes
      val pq = Similarity.pqTopK(q, c, k = maxC, m = PqM, ks = PqKs, dim = Dim,
          includeExact = false)
        .select(lit("pq").as("tier"), col("query_id"), col("cand_id"),
          col("rank").as("arank"))
      val sq = Similarity.sqTopK(q, c, k = maxC, includeExact = false)
        .select(lit("sq").as("tier"), col("query_id"), col("cand_id"),
          col("rank").as("arank"))
      val csDf = Cs.toDF("c")
      val pqsq = pq.unionByName(sq)
        .join(broadcast(csDf), col("arank") <= col("c"))
        .select("tier", "c", "query_id", "cand_id")
      // BQ: the bound IS the prefilter width (nCandidates), and the
      // survivor set at C is exactly the top-C of the Hamming ranking —
      // so ONE ranked pass over the packed bits serves every C, instead
      // of three bqTopK calls (each of which would also re-run its
      // internal brute-force recall leg)
      val words = (Dim + 31) / 32
      val qBits = broadcast(q.select(col("vec_id").as("query_id"),
        Similarity.packBits(Similarity.quantize(col("embedding")), Dim).as("q_bits")))
      val cBits = c.select(col("vec_id").as("cand_id"),
        Similarity.packBits(Similarity.quantize(col("embedding")), Dim).as("c_bits"))
      val bq = qBits.crossJoin(cBits)
        .filter(col("query_id") =!= col("cand_id"))
        .select(col("query_id"), col("cand_id"),
          Similarity.hammingPacked(col("q_bits"), col("c_bits"), words).as("ham"))
        .withColumn("arank", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("query_id")
            .orderBy(col("ham").asc, col("cand_id").asc)))
        .filter(col("arank") <= maxC)
        .select(lit("bq").as("tier"), col("query_id"), col("cand_id"), col("arank"))
        .join(broadcast(csDf), col("arank") <= col("c"))
        .select("tier", "c", "query_id", "cand_id")
      val retrieved = pqsq.unionByName(bq)
      truth.crossJoin(Seq("pq", "sq", "bq").toDF("tier"))
        .crossJoin(broadcast(csDf)).as("t")
        .join(retrieved.as("r"),
          col("t.tier") === col("r.tier") && col("t.c") === col("r.c") &&
            col("t.query_id") === col("r.query_id") &&
            col("t.cand_id") === col("r.cand_id"), "left")
        .groupBy(col("t.tier").as("tier"), col("t.c").as("c"),
          col("t.query_id").as("query_id"))
        .agg((count(col("r.cand_id")) / lit(5.0)).as("recall"))
        .orderBy("tier", "c", "query_id")
    },
    Some(s"""WITH qv AS (${qvSql()}),
               norms AS (SELECT vec_id, sum(v * v) AS nn FROM qv GROUP BY 1),
               $exactRankedCtes,
               truth AS (SELECT query_id, cand_id FROM eranked WHERE rank <= 5),
               $pqCtes,
               pqranked AS (
                 SELECT query_id, cand_id,
                        row_number() OVER (PARTITION BY query_id
                          ORDER BY adist ASC, cand_id ASC) AS rank
                 FROM adc WHERE query_id <> cand_id),
               $sqCtes,
               sranked AS (
                 SELECT query_id, cand_id,
                        row_number() OVER (PARTITION BY query_id
                          ORDER BY dot DESC, cand_id ASC) AS rank
                 FROM sdots),
               $bqBitsCtes,
               bqranked AS (
                 SELECT query_id, cand_id,
                        row_number() OVER (PARTITION BY query_id
                          ORDER BY ham ASC, cand_id ASC) AS rank
                 FROM (
                   SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
                          bit_count(xor(q.b0, c.b0)) + bit_count(xor(q.b1, c.b1)) AS ham
                   FROM bits q JOIN bits c ON q.vec_id <> c.vec_id
                   WHERE q.vec_id < 5)),
               cs AS (SELECT cb FROM (VALUES (5), (10), (25)) v(cb)),
               tiers AS (SELECT t FROM (VALUES ('pq'), ('sq'), ('bq')) v(t)),
               retr AS (
                 SELECT 'pq' AS tier, cs.cb, query_id, cand_id
                 FROM pqranked, cs WHERE rank <= cs.cb
                 UNION ALL
                 SELECT 'sq' AS tier, cs.cb, query_id, cand_id
                 FROM sranked, cs WHERE rank <= cs.cb
                 UNION ALL
                 SELECT 'bq' AS tier, cs.cb, query_id, cand_id
                 FROM bqranked, cs WHERE rank <= cs.cb)
             SELECT ti.t AS tier, cs.cb AS c, tr.query_id,
                    count(r.cand_id)::DOUBLE / 5 AS recall
             FROM truth tr
             CROSS JOIN tiers ti
             CROSS JOIN cs
             LEFT JOIN retr r ON r.tier = ti.t AND r.cb = cs.cb
                             AND r.query_id = tr.query_id
                             AND r.cand_id = tr.cand_id
             GROUP BY 1, 2, 3
             ORDER BY 1, 2, 3"""))

  val all: Seq[Q] = Seq(simPairs, annBrute, annLsh, annIvf, annIvfTrained,
    ddSemDedup, annPq, annSq, annBq, annIvfPersisted, annIvfAppend, annIvfCompact,
    annIvfFiltered, annIvfEvolved, annIvfVersioned, annIvfDelete, annIvfMaintain,
    annRecall, annRecallClustered, annQuantRecall, annLshRecall,
    annLshRecallClustered, annLshMultiprobe)
}
