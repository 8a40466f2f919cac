package graft.queries

import graft.ext.{Dedup, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deduplication inventory over `documents`. The pairwise queries bound
  * their input (doc_id windows) so cost stays fixed across scale factors
  * — the UNBOUNDED scale path is MinHash/LSH banding (dd_minhash_*), not
  * the quadratic verifiers.
  */
object DedupQueries {

  private def docs(s: SparkSession, dir: String) = Tables.table(s, dir, "documents")

  private val canonSql = TextQueries.canonSql

  /** Distinct (id, tok) CTE in DuckDB — twin of Dedup.docTokens. */
  private def toksSql(where: String = "") =
    s"""SELECT DISTINCT doc_id AS id, unnest(list_filter(string_split($canonSql, ' '), x -> x <> '')) AS tok
        FROM documents $where"""

  /** Portable 32-bit hash in DuckDB — twin of Dedup.tokenHash over an
    * arbitrary expression. Single source for every oracle in the
    * package (the canonSql lesson: independent copies drift). */
  private[queries] def portableHash(expr: String) =
    s"('0x' || substr(md5($expr), 1, 8))::BIGINT"

  private val tokHashSql = portableHash("tok")

  val ddExact = Q("dd_exact",
    (s, dir) => Dedup.exactGroups(docs(s, dir), "doc_id", "text")
      .orderBy("keep_id"),
    Some(s"""SELECT md5($canonSql) AS fp, min(doc_id) AS keep_id, count(*) AS n_docs
             FROM documents GROUP BY 1 ORDER BY keep_id"""))

  private[queries] val NumHashes = 8

  /** DuckDB 3-gram shingles: positional slices over the token list
    * (generate_series used as a list, not a lateral table function). */
  private def shinglesSql(n: Int, where: String = "") =
    s"""SELECT DISTINCT id, tok FROM (
          SELECT doc_id AS id,
                 unnest(list_transform(generate_series(1, len(t) - ${n - 1}),
                        i -> array_to_string(t[i : i + ${n - 1}], ' '))) AS tok
          FROM (SELECT doc_id, list_filter(string_split($canonSql, ' '), x -> x <> '') AS t
                FROM documents $where)
        ) WHERE tok IS NOT NULL AND tok <> ''"""

  private def minhashSigSql(src: String): String = {
    val mins = (0 until NumHashes).map(i =>
      s"min((h * ${Dedup.minhashA(i)} + ${Dedup.minhashB(i)}) % ${Dedup.MinhashPrime}) AS m$i")
      .mkString(", ")
    s"""SELECT id, $mins FROM (
          SELECT id, $tokHashSql AS h FROM ($src)
        ) GROUP BY id"""
  }

  val ddMinhashSigQ = Q("dd_minhash_sig",
    // distinct = false: min over the shingle multiset equals min over the
    // set, so the dedup shuffle is pure waste (partial-agg min shrinks
    // the map side to 8 longs per doc before the only shuffle)
    (s, dir) => Dedup.minhashSignature(
      Dedup.docShingles(docs(s, dir), "doc_id", "text", 3, distinct = false), NumHashes)
      .orderBy("id"),
    Some(s"""SELECT * FROM (${minhashSigSql(shinglesSql(3))}) ORDER BY id"""))

  /** LSH band/bucket candidate pairs as CTEs over an in-scope `sig` —
    * shared by the dd_minhash_pairs and dd_components oracles (the
    * clustering oracle builds its edge list from the same pair SQL). */
  /** Band-select union over a sig-shaped relation — the ONE SQL twin of
    * [[graft.ext.MinHashIndex.bands]], shared by the dd_* oracles and
    * st_neardup_filter's (independent copies drift — the canonSql
    * lesson). */
  private[queries] def bandsSqlOver(rel: String, rowsPerBand: Int): String =
    (0 until NumHashes / rowsPerBand).map { b =>
      val ms = (0 until rowsPerBand).map(r => s"m${rowsPerBand * b + r}").mkString(", ")
      s"SELECT id, $b AS band, concat_ws('_', $b, $ms) AS bucket FROM $rel"
    }.mkString(" UNION ALL ")

  private def lshCandSqlFor(rowsPerBand: Int): String =
    s"""bands AS (${bandsSqlOver("sig", rowsPerBand)}),
        cand AS (
          SELECT DISTINCT l.id AS a, r.id AS b
          FROM bands l JOIN bands r
            ON l.band = r.band AND l.bucket = r.bucket AND l.id < r.id)"""

  private def lshCandSql: String = lshCandSqlFor(2)

  /** LSH banding over unigram signatures of a bounded doc window: bands
    * of 2 rows over 8 hashes; pairs sharing a band bucket, scored by the
    * agreeing-hash fraction (the MinHash Jaccard estimate). */
  /** Shared oracle for the inline (dd_minhash_pairs) and persisted
    * (dd_minhash_persisted) LSH pair paths — both must reproduce the
    * same (a, b, est_sim) set over the same doc window. */
  private def minhashPairsOracle: String =
    minhashPairsOracleWhere("WHERE doc_id < 100")

  /** [[minhashPairsOracle]] over an arbitrary doc window — the delete
    * query narrows the window to the surviving ids (tombstoned docs
    * contribute no pairs, so the index-after-delete must equal an
    * index never built over them). */
  private def minhashPairsOracleWhere(where: String): String = {
    val agree = (0 until NumHashes)
      .map(i => s"(CASE WHEN sa.m$i = sb.m$i THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH sig AS (${minhashSigSql(toksSql(where))}),
          $lshCandSql
        SELECT a, b, round(($agree)::DOUBLE / $NumHashes, 6) AS est_sim
        FROM cand
        JOIN sig sa ON a = sa.id
        JOIN sig sb ON b = sb.id
        ORDER BY a, b"""
  }

  private def minhashPairTokens(s: SparkSession, dir: String) =
    Dedup.docTokens(docs(s, dir).filter(col("doc_id") < 100), "doc_id", "text",
      distinct = false)

  val ddMinhashPairs = Q("dd_minhash_pairs",
    (s, dir) => {
      val sig = Dedup.minhashSignature(minhashPairTokens(s, dir), NumHashes)
      Dedup.minhashLshPairs(sig, NumHashes, rowsPerBand = 2)
        .orderBy("a", "b")
    },
    Some(minhashPairsOracle))

  /** [[Dedup.minhashLshPairs]]' DURABLE route (`indexPath` supplied):
    * the signature materialization is a persisted index write, not an
    * executor-local checkpoint — the form a long-lived cluster runs.
    * Same oracle as dd_minhash_pairs: the hash match pins both routes
    * identical end-to-end. */
  val ddMinhashPairsDurable = Q("dd_minhash_pairs_durable",
    (s, dir) => {
      val sig = Dedup.minhashSignature(minhashPairTokens(s, dir), NumHashes)
      Dedup.minhashLshPairs(sig, NumHashes, rowsPerBand = 2,
          indexPath = Some(graft.core.TempDirs.create("graft-mhroute-")))
        .orderBy("a", "b")
    },
    Some(minhashPairsOracle))

  /** The PERSISTED-index serving path ([[graft.ext.MinHashIndex]]):
    * signatures + band buckets written as sorted tables, candidate
    * pairs answered from the stored layout with no checkpoint and no
    * re-tokenization — the durable replacement for the inline form's
    * executor-local materialization. Same oracle as dd_minhash_pairs:
    * the hash match certifies persisted ≡ inline end-to-end. */
  val ddMinhashPersisted = Q("dd_minhash_persisted",
    (s, dir) => {
      // built ONCE per (session, sf dir) — the bench measures the
      // serving probe, not a rebuild per invocation; the lifecycle
      // queries below keep building inline (Fixtures.indexPath)
      val path = Fixtures.indexPath(s, dir, "mhindex") { p =>
        graft.ext.MinHashIndex.write(minhashPairTokens(s, dir), p,
          NumHashes, rowsPerBand = 2)
      }
      graft.ext.MinHashIndex.pairs(s, path, NumHashes)
        .orderBy("a", "b")
    },
    Some(minhashPairsOracle))

  /** The APPEND refresh path ([[graft.ext.MinHashIndex.append]]): index
    * half the doc window, append the other half against the stored
    * layout, serve pairs. The final corpus equals dd_minhash_pairs' —
    * the SAME oracle therefore pins append ≡ rebuild end-to-end. */
  /** Tokens of a sub-window of the pair corpus — ONE definition of the
    * split the append/compact queries use, so they cannot drift onto
    * different corpora while sharing one oracle (the final corpus must
    * equal [[minhashPairTokens]]', and the split must stay inside the
    * sf0.001 doc window so both halves are non-empty). */
  private def windowToks(s: SparkSession, dir: String,
                         pred: org.apache.spark.sql.Column) =
    Dedup.docTokens(docs(s, dir).filter(col("doc_id") < 100).filter(pred),
      "doc_id", "text", distinct = false)

  /** A private clone of the half-window base index
    * ([[Fixtures.clonedIndex]]): the append/compact queries measure
    * their MUTATION protocol on top of it, not the base build. */
  private def halfMinhashIndex(s: SparkSession, dir: String): String =
    Fixtures.clonedIndex(s, dir, "mhindex-half") { p =>
      graft.ext.MinHashIndex.write(windowToks(s, dir, col("doc_id") < 50), p,
        NumHashes, rowsPerBand = 2)
    }

  val ddMinhashAppend = Q("dd_minhash_append",
    (s, dir) => {
      val path = halfMinhashIndex(s, dir)
      // generation-sized append: one sorted file per table, no
      // bounds-sampling jobs
      graft.ext.MinHashIndex.append(windowToks(s, dir, col("doc_id") >= 50),
        path, NumHashes, rowsPerBand = 2, partitions = 1)
      graft.ext.MinHashIndex.pairs(s, path, NumHashes)
        .orderBy("a", "b")
    },
    Some(minhashPairsOracle))

  /** The COMPACTION path ([[graft.ext.MinHashIndex.compact]]): build +
    * append accumulate two shards, compact folds them back to one,
    * serving answers from the compacted layout. Same oracle again —
    * the hash match pins compact as a pure layout rewrite (results
    * unchanged, fewer files per band probe). */
  val ddMinhashCompact = Q("dd_minhash_compact",
    (s, dir) => {
      // the compacted-from state (base + one appended shard) is the
      // FIXTURE here; compact + serve are the measured subject (the
      // append protocol itself is dd_minhash_append's subject)
      val path = Fixtures.clonedIndex(s, dir, "mhindex-split") { p =>
        graft.ext.MinHashIndex.write(windowToks(s, dir, col("doc_id") < 50), p,
          NumHashes, rowsPerBand = 2)
        graft.ext.MinHashIndex.append(windowToks(s, dir, col("doc_id") >= 50),
          p, NumHashes, rowsPerBand = 2)
      }
      graft.ext.MinHashIndex.compact(s, path)
      graft.ext.MinHashIndex.pairs(s, path, NumHashes)
        .orderBy("a", "b")
    },
    Some(minhashPairsOracle))

  /** The MAINTENANCE-POLICY path ([[graft.ext.MinHashIndex.maintain]],
    * round 10): from the split (base + appended shard) state, `maintain`
    * with maxShards = 1 decides and runs the fold itself, then serving
    * answers from whatever layout it chose. Same oracle as
    * append/compact — the policy may only ever change layout. */
  val ddMinhashMaintain = Q("dd_minhash_maintain",
    (s, dir) => {
      val path = Fixtures.clonedIndex(s, dir, "mhindex-split-maint") { p =>
        graft.ext.MinHashIndex.write(windowToks(s, dir, col("doc_id") < 50), p,
          NumHashes, rowsPerBand = 2)
        graft.ext.MinHashIndex.append(windowToks(s, dir, col("doc_id") >= 50),
          p, NumHashes, rowsPerBand = 2, partitions = 1)
      }
      graft.ext.MinHashIndex.maintain(s, path, maxShards = 1, partitions = 1)
      graft.ext.MinHashIndex.pairs(s, path, NumHashes)
        .orderBy("a", "b")
    },
    Some(minhashPairsOracle))

  /** The VERSIONED-POINTER publish route
    * ([[graft.ext.MinHashIndex.writeVersioned]]): two successive builds
    * land as immutable v00001/v00002 under one root, a one-line CURRENT
    * pointer flips between them, and serving resolves the pointer — the
    * object-store-safe layout (a directory rename on s3a is a
    * copy+delete a reader can catch mid-copy; a pointer flip is a
    * single-object replace it cannot). The v1 build covers only half
    * the doc window, so a reader left on v1 — or resolving mid-publish
    * — would return a DIFFERENT (strictly smaller) pair set: the oracle
    * hash therefore certifies the pointer really flipped to the full
    * rebuild, not just that some index exists. */
  val ddMinhashVersioned = Q("dd_minhash_versioned",
    (s, dir) => {
      // v1 (the half-window stale version) is the fixture; the measured
      // subject is the v2 rebuild + pointer flip + pointer-resolved
      // serve — the publish route the docstring above pins
      val root = Fixtures.clonedIndex(s, dir, "mhindex-ver-base") { p =>
        graft.ext.MinHashIndex.writeVersioned(
          windowToks(s, dir, col("doc_id") < 50), p, NumHashes, rowsPerBand = 2)
      }
      graft.ext.MinHashIndex.writeVersioned(windowToks(s, dir, lit(true)), root,
        NumHashes, rowsPerBand = 2)
      graft.ext.MinHashIndex.pairsCurrent(s, root, NumHashes)
        .orderBy("a", "b")
    },
    Some(minhashPairsOracle))

  /** The TOMBSTONE-DELETE path ([[graft.ext.MinHashIndex.delete]]):
    * index the full doc window, tombstone every fifth doc, serve pairs.
    * The engine never rebuilds — serving anti-joins the stored delete
    * shard out of the bucket table — while the oracle builds its index
    * over the SURVIVING docs only: the hash match certifies
    * delete-without-rebuild ≡ never-indexed, the takedown contract. */
  val ddMinhashDelete = Q("dd_minhash_delete",
    (s, dir) => {
      // the full-window base is the same build dd_minhash_persisted
      // memoizes; the measured subject is tombstone + serve-with-deletes
      val path = Fixtures.clonedIndex(s, dir, "mhindex") { p =>
        graft.ext.MinHashIndex.write(minhashPairTokens(s, dir), p,
          NumHashes, rowsPerBand = 2)
      }
      graft.ext.MinHashIndex.delete(
        docs(s, dir).filter(col("doc_id") < 100 && col("doc_id") % 5 === 0)
          .select(col("doc_id").as("id")), path)
      graft.ext.MinHashIndex.pairs(s, path, NumHashes)
        .orderBy("a", "b")
    },
    Some(minhashPairsOracleWhere("WHERE doc_id < 100 AND doc_id % 5 <> 0")))

  private val SimhashBits = 16

  val ddSimhash = Q("dd_simhash",
    (s, dir) => Dedup.simhash(
      Dedup.docTokens(docs(s, dir), "doc_id", "text"), SimhashBits)
      .orderBy("id"),
    Some {
      val votes = (0 until SimhashBits).map(j =>
        s"sum(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS v$j").mkString(", ")
      val fp = (0 until SimhashBits).map(j =>
        s"(CASE WHEN v$j > 0 THEN ${1L << j} ELSE 0 END)").mkString(" + ")
      s"""WITH h AS (SELECT id, $tokHashSql AS h FROM (${toksSql()})),
            votes AS (SELECT id, $votes FROM h GROUP BY id)
          SELECT id, $fp AS simhash FROM votes ORDER BY id"""
    })

  /** Inverted-index token-set Jaccard with a document-frequency cut —
    * the subquadratic trick is the df filter, pinned on both engines. */
  val ddJaccard = Q("dd_jaccard",
    (s, dir) => Dedup.jaccardPairs(
      Dedup.docTokens(docs(s, dir).filter(col("doc_id") < 200), "doc_id", "text"),
      maxDf = 150)
      .filter(col("jaccard") >= 0.2)
      .orderBy("a", "b"),
    Some {
      val toks = toksSql("WHERE doc_id < 200")
      s"""WITH toks AS ($toks),
            keep AS (SELECT tok FROM toks GROUP BY tok HAVING count(*) <= 150),
            f AS (SELECT id, toks.tok FROM toks JOIN keep ON toks.tok = keep.tok),
            sizes AS (SELECT id, count(*) AS n_toks FROM f GROUP BY id),
            inter AS (
              SELECT x.id AS a, y.id AS b, count(*) AS n_inter
              FROM f x JOIN f y ON x.tok = y.tok AND x.id < y.id
              GROUP BY 1, 2)
          SELECT a, b,
                 round(n_inter::DOUBLE / (na.n_toks + nb.n_toks - n_inter)::DOUBLE, 6) AS jaccard
          FROM inter
          JOIN sizes na ON a = na.id
          JOIN sizes nb ON b = nb.id
          WHERE n_inter::DOUBLE / (na.n_toks + nb.n_toks - n_inter)::DOUBLE >= 0.2
          ORDER BY a, b"""
    })

  /** Dedup CLUSTERS from the LSH pair graph: connected components with
    * min-id labels (the keep-one-per-cluster step every near-dedup
    * pipeline ends with). The oracle computes the same fixpoint as a
    * recursive transitive closure — label propagation's unique
    * fixpoint is exactly min(reachable id). */
  val ddComponents = Q("dd_components",
    (s, dir) => {
      val win = docs(s, dir).filter(col("doc_id") < 100)
      val sig = Dedup.minhashSignature(
        Dedup.docTokens(win, "doc_id", "text", distinct = false), NumHashes)
      val edges = Dedup.minhashLshPairs(sig, NumHashes, rowsPerBand = 2)
      Dedup.connectedComponents(
        win.select(col("doc_id").cast("long").as("id")), edges)
        .select(col("id").as("doc_id"), col("comp").as("component"))
        .orderBy("doc_id")
    },
    Some(
      s"""WITH RECURSIVE sig AS (${minhashSigSql(toksSql("WHERE doc_id < 100"))}),
            $lshCandSql,
            nodes AS (SELECT doc_id AS id FROM documents WHERE doc_id < 100),
            edges AS (SELECT a AS src, b AS dst FROM cand
                      UNION SELECT b, a FROM cand),
            reach(src, dst) AS (
              SELECT id, id FROM nodes
              UNION
              SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
          SELECT src AS doc_id, min(dst) AS component
          FROM reach GROUP BY src ORDER BY doc_id"""))

  /** Cluster REPRESENTATIVE selection — the curation policy layered on
    * dd_components: within each near-dup cluster keep the doc with the
    * MOST content (longest text; ties to lowest id), not blindly the
    * lowest id — the policy real pipelines want when a cluster mixes a
    * full article with its truncated syndications. One window over the
    * component assignment joined back to doc lengths; the heavy work
    * (signatures → LSH pairs → components) is the dd_components shape
    * at STRICTER banding (4 rows/band → 2 bands): the fixture's
    * word-salad docs chain into one blob under 2-row bands, and a
    * representative policy is only observable across several clusters. */
  val ddClusterRep = Q("dd_cluster_rep",
    (s, dir) => {
      val win = docs(s, dir).filter(col("doc_id") < 100)
      val sig = Dedup.minhashSignature(
        Dedup.docTokens(win, "doc_id", "text", distinct = false), NumHashes)
      val edges = Dedup.minhashLshPairs(sig, NumHashes, rowsPerBand = 4)
      val comp = Dedup.connectedComponents(
        win.select(col("doc_id").cast("long").as("id")), edges)
      val sized = comp.join(
        win.select(col("doc_id").cast("long").as("id"),
          length(coalesce(col("text"), lit(""))).cast("long").as("n_chars")),
        Seq("id"))
      val reps = sized
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("comp")
            .orderBy(col("n_chars").desc, col("id").asc)))
        .filter(col("rk") === 1)
        .select(col("comp").as("component"), col("id").as("keep_id"),
          col("n_chars").as("keep_chars"))
      val csize = sized.groupBy(col("comp").as("component"))
        .agg(count(lit(1)).as("n_docs"))
      reps.join(csize, Seq("component"))
        .select("component", "keep_id", "keep_chars", "n_docs")
        .orderBy("component")
    },
    Some(
      s"""WITH RECURSIVE sig AS (${minhashSigSql(toksSql("WHERE doc_id < 100"))}),
            ${lshCandSqlFor(4)},
            nodes AS (SELECT doc_id AS id FROM documents WHERE doc_id < 100),
            edges AS (SELECT a AS src, b AS dst FROM cand
                      UNION SELECT b, a FROM cand),
            reach(src, dst) AS (
              SELECT id, id FROM nodes
              UNION
              SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
            comp AS (SELECT src AS id, min(dst) AS component
                     FROM reach GROUP BY src),
            sized AS (
              SELECT comp.id, comp.component,
                     CAST(length(coalesce(d.text, '')) AS BIGINT) AS n_chars
              FROM comp JOIN documents d ON comp.id = d.doc_id),
            ranked AS (
              SELECT *, row_number() OVER (PARTITION BY component
                          ORDER BY n_chars DESC, id ASC) AS rk
              FROM sized),
            csize AS (SELECT component, count(*) AS n_docs
                      FROM sized GROUP BY component)
          SELECT r.component, r.id AS keep_id, r.n_chars AS keep_chars,
                 CAST(csize.n_docs AS BIGINT) AS n_docs
          FROM ranked r JOIN csize USING (component)
          WHERE r.rk = 1 ORDER BY r.component"""))

  /** Corpus DRIFT report — the distribution check an incremental crawl
    * runs between snapshots before trusting a refresh: per-token rates
    * in integer parts-per-million for two snapshot halves (even/odd
    * ids here; in production, yesterday/today), ranked by absolute
    * shift. ONE tokenization pass: the corpus aggregates once into the
    * vocab-sized per-token counts (materialized — two readers below),
    * and the totals are SUMS OF THE COUNTS, not a second corpus scan.
    * ppm is INTEGRAL division on int64 (`div`), the exact twin of
    * DuckDB's `//` at any magnitude — floor over a double quotient
    * would disagree near integer boundaries once totals pass 2^53/1e6.
    * Top-25 by |shift| with a token tiebreak — deterministic. */
  val ddDrift = Q("dd_drift",
    (s, dir) => {
      val toks = Dedup.docTokens(docs(s, dir), "doc_id", "text", distinct = false)
      val counts = toks
        .select(col("tok"), (col("id") % 2 === 0).as("is_a"))
        .groupBy("tok").agg(
          sum(when(col("is_a"), 1L).otherwise(0L)).as("cnt_a"),
          sum(when(!col("is_a"), 1L).otherwise(0L)).as("cnt_b"))
        .localCheckpoint(true) // read twice: totals + the report itself
      val totals = counts.agg(
        sum(col("cnt_a")).as("tot_a"), sum(col("cnt_b")).as("tot_b"))
      counts.crossJoin(broadcast(totals))
        .withColumn("ppm_a", expr("(1000000 * cnt_a) div tot_a"))
        .withColumn("ppm_b", expr("(1000000 * cnt_b) div tot_b"))
        .select(col("tok"), col("cnt_a"), col("cnt_b"),
          col("ppm_a"), col("ppm_b"),
          (col("ppm_a") - col("ppm_b")).as("shift_ppm"))
        .orderBy(abs(col("shift_ppm")).desc, col("tok").asc)
        .limit(25)
    },
    Some {
      val toksAll =
        s"""SELECT doc_id AS id,
              unnest(list_filter(string_split($canonSql, ' '), x -> x <> '')) AS tok
            FROM documents"""
      s"""WITH sided AS (
            SELECT tok, (id % 2 = 0) AS is_a FROM ($toksAll)),
          counts AS (
            SELECT tok,
                   CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a,
                   CAST(sum(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS BIGINT) AS cnt_b
            FROM sided GROUP BY tok),
          totals AS (
            SELECT CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS tot_a,
                   CAST(sum(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS BIGINT) AS tot_b
            FROM sided)
          SELECT tok, cnt_a, cnt_b,
                 (1000000 * cnt_a) // tot_a AS ppm_a,
                 (1000000 * cnt_b) // tot_b AS ppm_b,
                 (1000000 * cnt_a) // tot_a - (1000000 * cnt_b) // tot_b AS shift_ppm
          FROM counts, totals
          ORDER BY abs((1000000 * cnt_a) // tot_a - (1000000 * cnt_b) // tot_b) DESC,
                   tok ASC
          LIMIT 25"""
    })

  /** Train/test decontamination: held-out docs (stable id-based split)
    * sharing 4-gram shingles with training docs, joined on the portable
    * shingle hash on BOTH engines (so hash collisions, if any, agree). */
  val ddContamination = Q("dd_contamination",
    (s, dir) => Dedup.contaminationPairs(
      docs(s, dir), "doc_id", "text", testPred = col("doc_id") % 20 === 0, n = 4)
      .orderBy("test_id", "train_id"),
    Some {
      s"""WITH sh AS (
            SELECT id, $tokHashSql AS h FROM (${shinglesSql(4)})),
          test AS (SELECT id AS test_id, h FROM sh WHERE id % 20 = 0),
          train AS (SELECT id AS train_id, h FROM sh WHERE id % 20 <> 0)
          SELECT test_id, train_id, count(*) AS n_shared
          FROM test JOIN train USING (h)
          GROUP BY test_id, train_id
          ORDER BY test_id, train_id"""
    })

  private val ContaminatedMinPpm = 500000L

  /** Fuzzy decontamination by shingle containment
    * ([[Dedup.containmentScores]]): per held-out doc, what fraction of
    * its distinct 4-gram shingles the training corpus contains, in
    * integer ppm — the graded complement of [[ddContamination]]'s exact
    * pair counts. The oracle rebuilds the distinct-hash semi-join with
    * an IN subquery. */
  val ddContainment = Q("dd_containment",
    (s, dir) => Dedup.containmentScores(
        docs(s, dir), "doc_id", "text", testPred = col("doc_id") % 20 === 0, n = 4)
      .withColumn("cont_ppm", expr("(n_shared * 1000000) DIV n_shingles"))
      .withColumn("contaminated", col("cont_ppm") >= ContaminatedMinPpm)
      .orderBy("test_id"),
    Some {
      s"""WITH sh AS (
            SELECT id, $tokHashSql AS h FROM (${shinglesSql(4)})),
          test AS (SELECT id, h FROM sh WHERE id % 20 = 0),
          trainh AS (SELECT DISTINCT h FROM sh WHERE id % 20 <> 0),
          tot AS (SELECT id AS test_id, count(*) AS n_shingles FROM test GROUP BY 1),
          shr AS (
            SELECT id AS test_id, count(*) AS n_shared FROM test
            WHERE h IN (SELECT h FROM trainh) GROUP BY 1)
          SELECT t.test_id, t.n_shingles,
                 coalesce(s.n_shared, 0) AS n_shared,
                 CAST((coalesce(s.n_shared, 0) * 1000000) // t.n_shingles AS BIGINT)
                   AS cont_ppm,
                 ((coalesce(s.n_shared, 0) * 1000000) // t.n_shingles
                   >= $ContaminatedMinPpm) AS contaminated
          FROM tot t LEFT JOIN shr s USING (test_id) ORDER BY test_id"""
    })

  /** The KEEP side of decontamination, via a broadcast Bloom sketch over
    * test shingles pre-filtering the train scan before the exact verify
    * ([[Dedup.bloomDecontaminate]] — the sketch moves, the corpus
    * doesn't). The sketch only prunes; the oracle is the plain exact
    * anti-join, so the result hash-checks regardless of fpp. */
  val ddBloomClean = Q("dd_bloom_clean",
    (s, dir) => Dedup.bloomDecontaminate(
      docs(s, dir), "doc_id", "text", testPred = col("doc_id") % 20 === 0, n = 4)
      .orderBy("id"),
    Some {
      s"""WITH sh AS (
            SELECT id, $tokHashSql AS h FROM (${shinglesSql(4)})),
          test AS (SELECT DISTINCT h FROM sh WHERE id % 20 = 0),
          dirty AS (
            SELECT DISTINCT s.id FROM sh s JOIN test USING (h)
            WHERE s.id % 20 <> 0)
          SELECT DISTINCT doc_id AS id FROM documents
          WHERE doc_id % 20 <> 0
            AND doc_id NOT IN (SELECT id FROM dirty)
          ORDER BY id"""
    })

  /** Incremental-refresh accounting ([[Dedup.snapshotDiff]]): snapshot A
    * is docs 0–299, snapshot B is docs 100–399 with every 7th document
    * re-crawled with extra content (the planted-rows pattern) — so the
    * diff exercises all four statuses: 100–399∌A → added, 0–99∉B →
    * removed, id%7=0 in the overlap → changed, rest → unchanged. */
  val ddSnapshotDiff = Q("dd_snapshot_diff",
    (s, dir) => {
      val d = docs(s, dir)
      val before = d.filter(col("doc_id") < 300)
      val after = d.filter(col("doc_id") >= 100 && col("doc_id") < 400)
        .withColumn("text",
          when(col("doc_id") % 7 === 0, concat(col("text"), lit(" rev2")))
            .otherwise(col("text")))
      Dedup.snapshotDiff(before, after, "doc_id", "text").orderBy("id")
    },
    Some(s"""WITH a AS (
               SELECT doc_id AS id, md5($canonSql) AS fp
               FROM documents WHERE doc_id < 300),
             b AS (
               SELECT doc_id AS id,
                      md5(${WRatioSql.canonOf(
                        "(CASE WHEN doc_id % 7 = 0 THEN text || ' rev2' ELSE text END)")}) AS fp
               FROM documents WHERE doc_id >= 100 AND doc_id < 400)
           SELECT coalesce(a.id, b.id) AS id,
                  CASE WHEN a.id IS NULL THEN 'added'
                       WHEN b.id IS NULL THEN 'removed'
                       WHEN a.fp = b.fp THEN 'unchanged'
                       ELSE 'changed' END AS status
           FROM a FULL OUTER JOIN b ON a.id = b.id
           ORDER BY id"""))

  /** Reproducible 90/10 split assignment over the whole corpus — the
    * salted-hash routing every decontamination/eval pipeline starts
    * from (stable under retries and repartitioning, unlike rand()). */
  val ddSplit = Q("dd_split",
    (s, dir) => docs(s, dir)
      .select(col("doc_id"),
        Dedup.splitAssign(col("doc_id"), trainPct = 90).as("split"))
      .orderBy("doc_id"),
    Some(s"""SELECT doc_id,
              CASE WHEN ${portableHash("'split:' || doc_id")} % 100 < 90
                   THEN 'train' ELSE 'test' END AS split
            FROM documents ORDER BY doc_id"""))

  /** The brief's actual user journey, end to end: exact dedup → MinHash/
    * LSH near-dup pairs → connected-component clusters → keep-one →
    * reproducible split, as ONE `Curate.run` program over a bounded doc
    * window, hash-checked on the final per-representative table (who
    * survived, how many originals each survivor absorbed, which split it
    * landed in). The oracle recomputes the whole pipeline in SQL from
    * the shared CTE pieces (fingerprint groups, signature arithmetic,
    * band buckets, recursive closure, portable split hash). */
  val ddCurate = Q("dd_curate",
    (s, dir) => graft.ext.Curate.run(
      docs(s, dir).filter(col("doc_id") < 200), "doc_id", "text")
      .orderBy("doc_id"),
    Some {
      val agree = (0 until NumHashes)
        .map(i => s"(CASE WHEN sa.m$i = sb.m$i THEN 1 ELSE 0 END)")
        .mkString(" + ")
      val keptShingles = shinglesSql(3,
        "WHERE doc_id < 200 AND doc_id IN (SELECT id FROM exact)")
      s"""WITH RECURSIVE
            exact AS (
              SELECT md5($canonSql) AS fp, min(doc_id) AS id, count(*) AS n_exact
              FROM documents WHERE doc_id < 200 GROUP BY 1),
            sig AS (${minhashSigSql(keptShingles)}),
            $lshCandSql,
            edges0 AS (
              SELECT a, b FROM cand
              JOIN sig sa ON a = sa.id
              JOIN sig sb ON b = sb.id
              WHERE round(($agree)::DOUBLE / $NumHashes, 6) >= 0.5::DOUBLE),
            edges AS (SELECT a AS src, b AS dst FROM edges0
                      UNION SELECT b, a FROM edges0),
            reach(src, dst) AS (
              SELECT id, id FROM exact
              UNION
              SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
            lab AS (SELECT src AS id, min(dst) AS comp FROM reach GROUP BY src),
            members AS (
              SELECT lab.comp AS doc_id, sum(exact.n_exact) AS n_members
              FROM lab JOIN exact ON lab.id = exact.id
              GROUP BY 1)
          SELECT doc_id,
                 CAST(n_members AS BIGINT) AS n_members,
                 CASE WHEN ${portableHash("'split:' || doc_id")} % 100 < 90
                      THEN 'train' ELSE 'test' END AS split
          FROM members ORDER BY doc_id"""
    })

  /** The WHOLE curation journey ([[graft.ext.Curate.runFull]]): dedup →
    * cluster → keep-one → split → Bloom decontaminate → temperature mix
    * → sequence pack, hash-checked end to end as the final training
    * manifest. The oracle chains the dd_curate recursive-CTE twin with
    * the dd_bloom_clean / ta_domain_mix / ta_pack twins over the
    * survivor relation. */
  /** The dd_curate_full oracle's CTE chain through `packed` (doc_id,
    * n_members, lang, shard, strt) — shared with the published-corpus
    * twin, whose only delta is the final projection. */
  private lazy val curateFullCtes: String = {
      val agree = (0 until NumHashes)
        .map(i => s"(CASE WHEN sa.m$i = sb.m$i THEN 1 ELSE 0 END)")
        .mkString(" + ")
      val keptShingles = shinglesSql(3,
        "WHERE doc_id < 200 AND doc_id IN (SELECT id FROM exact)")
      val survShingles = shinglesSql(4,
        "WHERE doc_id < 200 AND doc_id IN (SELECT doc_id FROM surv)")
      val ntok = s"len(list_filter(string_split($canonSql, ' '), x -> x <> ''))"
      s"""WITH RECURSIVE
            exact AS (
              SELECT md5($canonSql) AS fp, min(doc_id) AS id, count(*) AS n_exact
              FROM documents WHERE doc_id < 200 GROUP BY 1),
            sig AS (${minhashSigSql(keptShingles)}),
            $lshCandSql,
            edges0 AS (
              SELECT a, b FROM cand
              JOIN sig sa ON a = sa.id
              JOIN sig sb ON b = sb.id
              WHERE round(($agree)::DOUBLE / $NumHashes, 6) >= 0.5::DOUBLE),
            edges AS (SELECT a AS src, b AS dst FROM edges0
                      UNION SELECT b, a FROM edges0),
            reach(src, dst) AS (
              SELECT id, id FROM exact
              UNION
              SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
            lab AS (SELECT src AS id, min(dst) AS comp FROM reach GROUP BY src),
            members AS (
              SELECT lab.comp AS doc_id, sum(exact.n_exact) AS n_members
              FROM lab JOIN exact ON lab.id = exact.id
              GROUP BY 1),
            surv AS (
              SELECT doc_id, CAST(n_members AS BIGINT) AS n_members,
                     CASE WHEN ${portableHash("'split:' || doc_id")} % 100 < 90
                          THEN 'train' ELSE 'test' END AS split
              FROM members),
            sdocs AS (
              SELECT s.doc_id, s.n_members, s.split, d.text, d.lang
              FROM surv s JOIN documents d USING (doc_id)),
            ssh AS (SELECT id, $tokHashSql AS h FROM ($survShingles)),
            testh AS (
              SELECT DISTINCT h FROM ssh
              JOIN surv ON ssh.id = surv.doc_id WHERE surv.split = 'test'),
            dirty AS (
              SELECT DISTINCT s.id FROM ssh s JOIN testh USING (h)
              JOIN surv ON s.id = surv.doc_id WHERE surv.split = 'train'),
            clean AS (
              SELECT doc_id, n_members, lang, text FROM sdocs
              WHERE split = 'train' AND doc_id NOT IN (SELECT id FROM dirty)),
            masses AS (SELECT lang, sum($ntok) AS mass FROM clean
                       GROUP BY 1 HAVING sum($ntok) > 0),
            mn AS (SELECT min(mass) AS min_mass FROM masses),
            rates AS (
              SELECT lang,
                     CAST(floor(sqrt(min_mass::DOUBLE / mass::DOUBLE) * 1000000) AS BIGINT) AS keep_ppm
              FROM masses, mn),
            mixed AS (
              SELECT c.doc_id, c.n_members, c.lang, CAST($ntok AS BIGINT) AS ntok
              FROM clean c JOIN rates USING (lang)
              WHERE ${portableHash("'mix:' || c.doc_id")} % 1000000 < keep_ppm),
            packt AS (
              SELECT doc_id, n_members, lang, ntok,
                     ${portableHash("'pack:' || doc_id")} % 8 AS shard
              FROM mixed),
            packed AS (
              SELECT doc_id, n_members, lang, shard,
                     sum(ntok) OVER (PARTITION BY shard ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - ntok AS strt
              FROM packt)"""
  }

  val ddCurateFull = Q("dd_curate_full",
    (s, dir) => graft.ext.Curate.runFull(
      docs(s, dir).filter(col("doc_id") < 200), "doc_id", "text", "lang")
      .orderBy("doc_id"),
    Some(s"""$curateFullCtes
          SELECT doc_id, lang, n_members, shard, CAST(strt // 512 AS BIGINT) AS bin
          FROM packed ORDER BY doc_id"""))

  /** The journey's LAST MILE under the commit protocol (VERDICT r15
    * task 1): [[graft.ext.Curate.publish]] stages the sized,
    * hive-partitioned corpus and lands it via the versioned-pointer
    * publish, and THIS query reads it back the way a trainer would —
    * through CURRENT resolution ([[graft.ext.Curate.readPublished]]) —
    * so the oracle check covers manifest content AND the joined text
    * surviving the staged write/rename round-trip (md5-pinned). */
  val ddCuratePublished = Q("dd_curate_published",
    (s, dir) => {
      val d = docs(s, dir).filter(col("doc_id") < 200)
      val manifest = graft.ext.Curate.runFull(d, "doc_id", "text", "lang")
      val root = graft.core.TempDirs.create("graft-curate-pub-") + "/corpus"
      graft.ext.Curate.publish(manifest, d, "doc_id", "text", root,
        targetFileBytes = 1L << 20, shuffleToFileRatio = 1.0)
      graft.ext.Curate.readPublished(s, root)
        .select(col("doc_id"), col("lang"), col("n_members"),
          // hive partition discovery infers the shard dir name as INT;
          // the manifest (and the oracle's portable hash) carry BIGINT
          col("shard").cast("long").as("shard"),
          col("bin"), md5(col("text")).as("text_md5"))
        .orderBy("doc_id")
    },
    Some(s"""$curateFullCtes
          SELECT p.doc_id, p.lang, p.n_members, p.shard,
                 CAST(p.strt // 512 AS BIGINT) AS bin, md5(d.text) AS text_md5
          FROM packed p JOIN documents d USING (doc_id)
          ORDER BY doc_id"""))

  private val Dim = 64

  /** Embedding-cosine near-duplicate pairs — the fifth dedup modality
    * (beside exact / MinHash / SimHash / n-gram Jaccard): banded
    * sign-LSH candidates + exact quantized-cosine verify at a 0.9
    * threshold ([[graft.ext.Similarity.nearDupPairs]]). The fixture
    * corpus has no natural near-dups, so deterministic ones are PLANTED:
    * every 25th vector re-enters with its first two components zeroed
    * (cosine ≈ 0.98 to its source) under id+1'000'000 — the same
    * planted-rows pattern as `ta_redact`/`ta_lang_unicode`. The oracle
    * twin rebuilds the identical hyperplanes, bands, and quantized
    * cosine in SQL, so approximation misses match bit-for-bit too. */
  val ddEmbedNearDup = Q("dd_embed_neardup",
    (s, dir) => {
      // FIXED corpus window (the dd_minhash treatment): fixed-width
      // sign-LSH banding is occupancy-bound — at 8 bits/band, buckets
      // hold n/256 vectors, so candidate pairs grow QUADRATICALLY in
      // corpus size (the round-10 sf10 full-inventory run measured 453×
      // time for 100× data before this bound, then failed). A no-op at
      // every verify/bench SF (vec_id < 5000 covers the whole sf0.1
      // corpus); at larger fixtures the query pins the OPERATOR, and
      // the documented scale paths are planesPerBand ∝ log2(n) or the
      // SemDedup/ANN serving tiers (SCALE.md round-10 note).
      val emb = Tables.table(s, dir, "embeddings").filter(col("vec_id") < 5000)
      val planted = emb.filter(col("vec_id") % 25 === 0)
        .select((col("vec_id") + 1000000L).as("vec_id"),
          concat(array(lit(0.0f), lit(0.0f)),
            slice(col("embedding"), 3, Dim - 2)).as("embedding"))
      val corpus = emb.select("vec_id", "embedding").unionByName(planted)
      graft.ext.Similarity
        .nearDupPairs(corpus, bands = 4, planesPerBand = 8, dim = Dim,
          minCosine = 0.9)
        .orderBy("a", "b")
    },
    Some(s"""WITH corpus AS (
               SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5000
               UNION ALL
               SELECT vec_id + 1000000 AS vec_id,
                      list_concat([0.0::FLOAT, 0.0::FLOAT], embedding[3:]) AS embedding
               FROM embeddings WHERE vec_id < 5000 AND vec_id % 25 = 0),
             qv AS (
               SELECT vec_id, i, CAST(round(embedding[i] * 32768.0) AS BIGINT) AS v
               FROM corpus, range(1, ${Dim + 1}) t(i)),
             wv AS (
               SELECT p, i, ((p * $Dim + (i - 1)) * 2654435761) % 2000001 - 1000000 AS w
               FROM range(0, 32) t1(p), range(1, ${Dim + 1}) t2(i)),
             pdots AS (
               SELECT vec_id, p, sum(v * w) AS dot
               FROM qv JOIN wv USING (i) GROUP BY 1, 2),
             buckets AS (
               SELECT vec_id, p // 8 AS band,
                      sum(CASE WHEN dot > 0 THEN 1 << (p % 8) ELSE 0 END) AS bucket
               FROM pdots GROUP BY 1, 2),
             cand AS (
               SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
               FROM buckets x JOIN buckets y
                 ON x.band = y.band AND x.bucket = y.bucket AND x.vec_id < y.vec_id),
             norms AS (SELECT vec_id, sum(v * v) AS nn FROM qv GROUP BY 1),
             dots AS (
               SELECT a, b, sum(x.v * y.v) AS dot
               FROM cand
               JOIN qv x ON x.vec_id = a
               JOIN qv y ON y.vec_id = b AND y.i = x.i
               GROUP BY 1, 2),
             scored AS (
               SELECT a, b,
                      round(dot::DOUBLE / (sqrt(na.nn::DOUBLE) * sqrt(nb.nn::DOUBLE)), 6) AS cosine
               FROM dots
               JOIN norms na ON a = na.vec_id
               JOIN norms nb ON b = nb.vec_id)
           SELECT a, b, cosine FROM scored
           WHERE cosine >= 0.9::DOUBLE ORDER BY a, b"""))

  private val SpanK = 8

  /** Exact substring-span dedup profile — the sixth dedup modality:
    * which k-token spans recur ANYWHERE in the corpus, per document
    * (reference pipelines do this with a single-node suffix array over
    * the concatenated corpus; the distributed shape is
    * [[graft.ext.Dedup.spanHashes]] rolling window hashes → global
    * count → join-back, all equality-keyed). k=8 is proportional to the
    * ~54-token fixture documents the way 50 tokens is to real web text.
    * The oracle rebuilds the identical positional windows with
    * generate_series slices and the shared portable hash. */
  val ddSpanDedup = Q("dd_span_dedup",
    (s, dir) => Dedup.spanDupProfile(
      Dedup.spanHashes(docs(s, dir), "doc_id", "text", SpanK))
      .orderBy("id"),
    Some(s"""WITH t AS (
               SELECT doc_id,
                      list_filter(string_split($canonSql, ' '), x -> x <> '') AS t
               FROM documents),
             spans AS (
               SELECT doc_id AS id,
                      unnest(generate_series(1, len(t) - ${SpanK - 1})) AS pos,
                      unnest(list_transform(generate_series(1, len(t) - ${SpanK - 1}),
                             i -> array_to_string(t[i : i + ${SpanK - 1}], ' '))) AS gram
               FROM t WHERE len(t) >= $SpanK),
             h AS (SELECT id, pos, ${portableHash("gram")} AS whash FROM spans),
             cnt AS (SELECT whash, count(*) AS n_occ FROM h GROUP BY 1)
           SELECT id, count(*) AS n_spans,
                  CAST(sum(CASE WHEN n_occ > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans,
                  round(sum(CASE WHEN n_occ > 1 THEN 1 ELSE 0 END)::DOUBLE / count(*), 6)
                    AS dup_ratio
           FROM h JOIN cnt USING (whash)
           GROUP BY 1 ORDER BY id"""))

  /** Exact-substring dedup REMOVAL accounting: per doc, the exact
    * number of token positions covered by ≥1 duplicated k-span (the
    * interval UNION — overlapping duplicated spans don't double-count)
    * and the surviving-token ratio. This is what a span-cut pass would
    * actually delete; `dd_span_dedup` reports span counts, this reports
    * token coverage. */
  val ddSpanClean = Q("dd_span_clean",
    (s, dir) => {
      val d = docs(s, dir)
      val removed = Dedup.spanRemovalCounts(
        Dedup.spanHashes(d, "doc_id", "text", SpanK), SpanK)
      d.select(col("doc_id").as("id"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
        .join(removed, Seq("id"), "left")
        .select(col("id"), col("n_tokens"),
          coalesce(col("n_removed"), lit(0L)).as("n_removed"),
          round((col("n_tokens") - coalesce(col("n_removed"), lit(0L)))
            .cast("double") / greatest(col("n_tokens"), lit(1L)), 6)
            .as("keep_ratio"))
        .orderBy("id")
    },
    Some(s"""WITH t AS (
               SELECT doc_id,
                      list_filter(string_split($canonSql, ' '), x -> x <> '') AS t
               FROM documents),
             spans AS (
               SELECT doc_id AS id,
                      unnest(generate_series(1, len(t) - ${SpanK - 1})) AS pos,
                      unnest(list_transform(generate_series(1, len(t) - ${SpanK - 1}),
                             i -> array_to_string(t[i : i + ${SpanK - 1}], ' '))) AS gram
               FROM t WHERE len(t) >= $SpanK),
             h AS (SELECT id, pos, ${portableHash("gram")} AS whash FROM spans),
             cnt AS (SELECT whash FROM h GROUP BY whash HAVING count(*) > 1),
             covered AS (
               SELECT DISTINCT id, unnest(generate_series(pos, pos + ${SpanK - 1})) AS tpos
               FROM h JOIN cnt USING (whash)),
             removed AS (SELECT id, count(*) AS n_removed FROM covered GROUP BY 1)
           SELECT t.doc_id AS id,
                  CAST(len(t.t) AS BIGINT) AS n_tokens,
                  coalesce(r.n_removed, 0) AS n_removed,
                  round((len(t.t) - coalesce(r.n_removed, 0))::DOUBLE
                        / greatest(len(t.t), 1), 6) AS keep_ratio
           FROM t LEFT JOIN removed r ON t.doc_id = r.id
           ORDER BY id"""))

  /** URL-keyed exact dedup ([[graft.ext.Urls.canonicalUrl]] as the
    * groupBy key) — the cheapest dedup pass a crawl pipeline runs,
    * BEFORE any content hashing: the canonicalization is a narrow
    * codegen'd map, the dedup one partial-aggregated groupBy, and at
    * 100 TB nothing else is touched. Keeps the lowest doc_id per
    * canonical URL (first-crawled wins); NULL canons (non-absolute
    * inputs) are excluded — they have no URL identity to merge on.
    * The oracle re-derives both the messy fixture and the whole
    * canonicalization chain in SQL, so a drifted rule changes keys and
    * breaks the hash. */
  val ddUrlDedup = Q("dd_url_dedup",
    (s, dir) => docs(s, dir)
      .select(col("doc_id"), TextQueries3.urlFixture.as("url"))
      .withColumn("canon_url", graft.ext.Urls.canonicalUrl(col("url")))
      .filter(col("canon_url").isNotNull)
      .groupBy("canon_url")
      .agg(min("doc_id").as("keeper"), count(lit(1)).as("n_docs"))
      .orderBy("canon_url"),
    Some(s"""SELECT canon_url, min(doc_id) AS keeper, count(*) AS n_docs
             FROM (SELECT doc_id,
                          ${graft.ext.Urls.canonicalUrlSql("url")} AS canon_url
                   FROM (SELECT doc_id, ${TextQueries3.urlFixtureSql} AS url
                         FROM documents))
             WHERE canon_url IS NOT NULL
             GROUP BY canon_url ORDER BY canon_url"""))

  /** LSH S-CURVE AUDIT: empirical detection rate of MinHash banding by
    * exact-Jaccard bucket, for two band shapes over the same 8-hash
    * signatures — rowsPerBand=2 (4 bands, permissive) vs 4 (2 bands,
    * strict). This is the measured version of the 1-(1-J^r)^b design
    * curve: the knob-tuning audit a pipeline runs on a sampled window
    * before committing (bands, rows) at corpus scale, where the exact
    * all-pairs ground truth is affordable only on the sample (here the
    * doc_id<200 window; the production path stays the LSH equality
    * join). Truth = inverted-index token-set Jaccard (no df cut — the
    * audit must see the pairs the cut would drop), bucketed by
    * floor(10·J) over the ROUNDED value both engines share; detected =
    * membership in the band-bucket candidate pairs. The truth×shape
    * grid LEFT-joins detections so an all-missed bucket still reports
    * rate 0.0. */
  val ddLshCurve = Q("dd_lsh_curve",
    (s, dir) => {
      import s.implicits._
      val win = docs(s, dir).filter(col("doc_id") < 200)
      val truth = Dedup.jaccardPairs(
          Dedup.docTokens(win, "doc_id", "text"), maxDf = Long.MaxValue)
        .filter(col("jaccard") >= 0.1)
        .select(col("a"), col("b"),
          floor(col("jaccard") * 10).cast("int").as("j_bucket"))
      val sig = Dedup.minhashSignature(
        Dedup.docTokens(win, "doc_id", "text", distinct = false), NumHashes)
      val detected = Seq(2, 4).map { rpb =>
        Dedup.minhashLshPairs(sig, NumHashes, rowsPerBand = rpb)
          .select(col("a"), col("b"), lit(rpb).as("rows_per_band"))
      }.reduce(_ unionByName _)
      truth.crossJoin(Seq(2, 4).toDF("rows_per_band")).as("t")
        .join(detected.as("d"),
          col("t.a") === col("d.a") && col("t.b") === col("d.b") &&
            col("t.rows_per_band") === col("d.rows_per_band"), "left")
        .groupBy(col("t.rows_per_band").as("rows_per_band"),
          col("t.j_bucket").as("j_bucket"))
        .agg(count(lit(1)).as("n_pairs"),
          round(count(col("d.a")).cast("double") / count(lit(1)), 6)
            .as("det_rate"))
        .orderBy("rows_per_band", "j_bucket")
    },
    Some {
      val toks = toksSql("WHERE doc_id < 200")
      s"""WITH toks AS ($toks),
            sizes AS (SELECT id, count(*) AS n_toks FROM toks GROUP BY id),
            inter AS (
              SELECT x.id AS a, y.id AS b, count(*) AS n_inter
              FROM toks x JOIN toks y ON x.tok = y.tok AND x.id < y.id
              GROUP BY 1, 2),
            truth AS (
              SELECT a, b, CAST(floor(j * 10) AS INT) AS j_bucket
              FROM (
                SELECT a, b,
                       round(n_inter::DOUBLE / (na.n_toks + nb.n_toks - n_inter)::DOUBLE, 6) AS j
                FROM inter
                JOIN sizes na ON a = na.id
                JOIN sizes nb ON b = nb.id)
              WHERE j >= 0.1),
            sig AS (${minhashSigSql(toks)}),
            bands2 AS (${bandsSqlOver("sig", 2)}),
            bands4 AS (${bandsSqlOver("sig", 4)}),
            det AS (
              SELECT 2 AS rows_per_band, l.id AS a, r.id AS b
              FROM bands2 l JOIN bands2 r
                ON l.band = r.band AND l.bucket = r.bucket AND l.id < r.id
              UNION
              SELECT 4 AS rows_per_band, l.id AS a, r.id AS b
              FROM bands4 l JOIN bands4 r
                ON l.band = r.band AND l.bucket = r.bucket AND l.id < r.id),
            grid AS (
              SELECT t.a, t.b, t.j_bucket, p.rpb
              FROM truth t, (VALUES (2), (4)) p(rpb))
          SELECT g.rpb AS rows_per_band, g.j_bucket,
                 count(*) AS n_pairs,
                 round(count(d.a)::DOUBLE / count(*), 6) AS det_rate
          FROM grid g
          LEFT JOIN det d ON d.rows_per_band = g.rpb
                         AND d.a = g.a AND d.b = g.b
          GROUP BY 1, 2
          ORDER BY 1, 2"""
    })

  val all: Seq[Q] = Seq(ddExact, ddMinhashSigQ, ddMinhashPairs,
    ddMinhashPairsDurable,
    ddMinhashPersisted, ddMinhashAppend, ddMinhashCompact, ddMinhashVersioned,
    ddMinhashDelete, ddMinhashMaintain,
    ddSimhash, ddClusterRep, ddDrift,
    ddJaccard, ddComponents, ddContamination, ddContainment, ddBloomClean,
    ddSplit, ddCurate, ddCurateFull, ddCuratePublished, ddEmbedNearDup, ddSnapshotDiff,
    ddSpanDedup, ddSpanClean, ddUrlDedup, ddLshCurve)
}
