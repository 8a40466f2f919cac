package graft.queries

import graft.streaming.StreamOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Streaming inventory. `st_replay_hourly` runs a REAL Structured
  * Streaming query (parquet file source → watermark → windowed agg →
  * memory sink, Trigger.AvailableNow) whose drained result is
  * oracle-checkable against plain SQL — replay has no late data, so the
  * watermarked stream aggregate equals the batch aggregate.
  * `st_sessions` pins session-window semantics in batch mode against a
  * lag/gap reconstruction in DuckDB.
  */
object StreamingQueries {

  /** The fixture-table streaming source — now just a name for the
    * shared ingestion seam [[StreamOps.readStreamOf]] (layout-agnostic
    * over the single-file vs directory-of-part-files fixture shapes;
    * source-independence of the transforms is spec-pinned from
    * MemoryStream in `StreamOpsSpec`). */
  private[queries] def tableStream(s: SparkSession, dir: String, table: String,
      schema: org.apache.spark.sql.types.StructType): org.apache.spark.sql.DataFrame =
    StreamOps.readStreamOf(s, dir, table, schema)

  /** The replayed events file-source: raw schema from a batch probe read
    * (encoding-agnostic — `Tables.rawEvents` handles both the legacy
    * TIMESTAMP(NANOS)-as-BIGINT and plain TIMESTAMP(MICROS) fixture
    * generations), then the same `ts` normalization as the batch loader —
    * the shared front-end of every streaming query here (one body, so a
    * fix to the encoding handling reaches all of them). */
  private def eventsStream(s: SparkSession, dir: String) = {
    val schema = Fixtures.tableSchema(s, dir, "events")
    Tables.normalizeTs(tableStream(s, dir, "events", schema))
  }

  /** Run `body` against a CLONED session with
    * `spark.sql.shuffle.partitions` pinned to `n` (one state store per
    * shuffle partition — size to the aggregate's group count, not
    * default width). [[Q.pinnedSession]]: the pin lives on the clone,
    * so a concurrently running query on the shared session never
    * observes it — the same enforcement as Q.withShuffleWidth. */
  private def withShufflePartitions[T](s: SparkSession, n: Int)(
      body: SparkSession => T): T =
    body(Q.pinnedSession(s, n))

  val stReplayHourly = Q("st_replay_hourly",
    (s, dir) => {
      val replayed = withShufflePartitions(s, 4) { cs =>
        val agg = StreamOps.hourlyEventCounts(eventsStream(cs, dir))
        StreamOps.replayToTable(cs, agg, s"st_replay_hourly_${System.nanoTime()}", "complete")
      }
      replayed
        .select(
          date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
          col("event_type"), col("n_events"), col("sum_value"))
        .orderBy("window_start", "event_type")
    },
    Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
                   event_type, count(*) AS n_events, round(sum(value), 2) AS sum_value
            FROM events GROUP BY 1, 2
            ORDER BY window_start, event_type"""))

  /** Session windows (30-minute gap): a session breaks when the gap to
    * the previous event is >= the timeout; DuckDB reconstructs that with
    * lag + a running sum of session-break flags. */
  val stSessions = Q("st_sessions",
    (s, dir) => StreamOps.userSessions(Tables.table(s, dir, "events"))
      .orderBy("user_id", "session_start"),
    Some("""WITH flagged AS (
              SELECT user_id, ts,
                     CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                            >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
              FROM events),
            sessions AS (
              SELECT user_id, ts,
                     sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
              FROM flagged)
            SELECT user_id,
                   strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
                   count(*) AS n_events
            FROM sessions GROUP BY user_id, sid
            ORDER BY user_id, session_start"""))

  /** Stream-stream interval join, run as a REAL streaming query (two
    * watermarked file-source streams over the same events file,
    * [[StreamOps.attributionJoin]], append-mode memory sink): purchases
    * attributed to the same user's views within 6 hours. Replay has no
    * late data, so the result equals the batch interval join the oracle
    * runs. Delay is reported in exact integer microseconds (epoch_us
    * both engines) — DuckDB's `date_diff('second', …)` counts boundary
    * CROSSINGS, not elapsed floor, so a seconds column would diverge on
    * sub-second fractions. */
  val stIntervalJoin = Q("st_interval_join",
    (s, dir) => {
      val replayed = withShufflePartitions(s, 4) { cs =>
        // an inner stream-stream join emits on match; the trailing
        // no-data batch only advances the watermark for state EVICTION,
        // which a drain-and-stop replay never benefits from. Set on the
        // CLONE: no restore, no leak into concurrent queries.
        cs.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
        // ONE file-source; both join sides derive from it (a second
        // readStream would scan the parquet twice per micro-batch)
        val src = eventsStream(cs, dir)
        val views = src.filter(col("event_type") === "view")
          .select(col("user_id"), col("event_id").as("view_id"),
            col("ts").as("view_ts"))
        val buys = src.filter(col("event_type") === "purchase")
          .select(col("user_id").as("buy_user_id"),
            col("event_id").as("purchase_id"), col("ts").as("buy_ts"))
        val joined = StreamOps.attributionJoin(views, buys,
          maxDelay = "6 hours", watermark = "1 hour")
        StreamOps.replayToTable(cs, joined,
          s"st_interval_join_${System.nanoTime()}", "append")
      }
      replayed.orderBy("view_id", "purchase_id")
    },
    Some("""SELECT a.user_id, a.event_id AS view_id, b.event_id AS purchase_id,
                   epoch_us(b.ts) - epoch_us(a.ts) AS delay_us
            FROM events a JOIN events b
              ON a.user_id = b.user_id
             AND a.event_type = 'view' AND b.event_type = 'purchase'
             AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 6 HOUR
            ORDER BY view_id, purchase_id"""))

  /** Stream-static enrichment join ([[StreamOps.enrichedDailyCounts]]):
    * the replayed event stream broadcast-joins the static customer
    * dimension each micro-batch, then aggregates a day × segment
    * report. Money in integer cents — exact cross-engine. The oracle is
    * the plain batch join + group (replay has no late data). */
  val stEnrich = Q("st_enrich",
    (s, dir) => {
      val replayed = withShufflePartitions(s, 4) { cs =>
        val dim = Tables.table(cs, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment"))
        val agg = StreamOps.enrichedDailyCounts(eventsStream(cs, dir), dim)
        StreamOps.replayToTable(cs, agg,
          s"st_enrich_${System.nanoTime()}", "complete")
      }
      replayed
        .select(date_format(col("window.start"), "yyyy-MM-dd").as("day"),
          col("c_mktsegment").as("segment"), col("n_events"), col("sum_cents"))
        .orderBy("day", "segment")
    },
    Some("""SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                   c_mktsegment AS segment, count(*) AS n_events,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
            FROM events JOIN customer ON user_id = c_custkey
            GROUP BY 1, 2 ORDER BY day, segment"""))

  /** Exact dedup as a REAL streaming query (documents file source →
    * stateful fingerprint aggregate → memory sink): the state store
    * holds one (fp, keep_id, n_docs) row per distinct fingerprint, and
    * because min/count are arrival-order-independent the drained result
    * equals batch `dd_exact` — the same oracle pins both. */
  val stStreamDedup = Q("st_stream_dedup",
    (s, dir) => {
      val schema = Fixtures.tableSchema(s, dir, "documents")
      val replayed = withShufflePartitions(s, 4) { cs =>
        val stream = tableStream(cs, dir, "documents", schema)
        val agg = StreamOps.streamingExactDedup(stream, "doc_id", "text")
        StreamOps.replayToTable(cs, agg, s"st_stream_dedup_${System.nanoTime()}", "complete")
      }
      replayed.orderBy("keep_id")
    },
    Some(s"""SELECT md5(${TextQueries.canonSql}) AS fp, min(doc_id) AS keep_id,
                    count(*) AS n_docs
             FROM documents GROUP BY 1 ORDER BY keep_id"""))

  /** One hash-family constant and one band-SQL generator for the whole
    * queries package (independent copies drift). */
  private val MhHashes = DedupQueries.NumHashes

  private def bandsSqlOver(rel: String): String =
    DedupQueries.bandsSqlOver(rel, rowsPerBand = 2)

  /** DuckDB twin of [[graft.ext.Dedup.minhashSignature]] over a doc_id
    * predicate — shared by the two near-dup streaming oracles so the
    * signature SQL cannot drift between them. */
  private def mhSigSqlOf(pred: String): String = {
    val toks =
      s"""SELECT DISTINCT doc_id AS id,
            unnest(list_filter(string_split(${TextQueries.canonSql}, ' '), x -> x <> '')) AS tok
          FROM documents WHERE $pred"""
    val mins = (0 until MhHashes).map(i =>
      s"min((h * ${graft.ext.Dedup.minhashA(i)} + ${graft.ext.Dedup.minhashB(i)}) % ${graft.ext.Dedup.MinhashPrime}) AS m$i")
      .mkString(", ")
    s"""SELECT id, $mins FROM (
          SELECT id, ${DedupQueries.portableHash("tok")} AS h FROM ($toks)
        ) GROUP BY id"""
  }

  /** Streaming near-dup PREFILTER against the persisted MinHash index
    * ([[graft.ext.MinHashIndex]]): docs 0–99 are indexed as the
    * "already-crawled corpus", docs 100–199 replay as the incoming
    * stream, and each incoming doc's per-row signature bands
    * ([[StreamOps.nearDupBands]] — narrow, no stateful shuffle)
    * stream-static join the stored bucket table; `n_hits` counts the
    * (band, stored-doc) collisions that would route the doc to the
    * exact-verify path. The batch oracle recomputes both signature
    * sets and the same join — replay has no late data, and the per-row
    * HOF signature must be BIT-identical to the groupBy-min form. */
  val stNearDupFilter = Q("st_neardup_filter",
    (s, dir) => {
      // the "already-crawled corpus" index is a read-only fixture here
      // (nothing mutates it): built once per session like every serving
      // index — this is the SAME build dd_minhash_persisted memoizes
      val idxPath = Fixtures.indexPath(s, dir, "mhindex") { p =>
        graft.ext.MinHashIndex.write(
          graft.ext.Dedup.docTokens(
            Tables.table(s, dir, "documents").filter(col("doc_id") < 100),
            "doc_id", "text", distinct = false),
          p, MhHashes, rowsPerBand = 2)
      }
      // marker- and tombstone-pruned read (the serving protocol — a raw
      // parquet read would serve a concurrent appender's uncommitted
      // shard and resurrect deleted docs)
      val buckets = graft.ext.MinHashIndex.buckets(s, idxPath)
        .select(col("band"), col("bucket"), col("id").as("index_id"))
      val schema = Fixtures.tableSchema(s, dir, "documents")
      val replayed = withShufflePartitions(s, 4) { cs =>
        val stream = tableStream(cs, dir, "documents", schema)
          .filter(col("doc_id") >= 100 && col("doc_id") < 200)
        val hits = StreamOps.nearDupBands(stream, "doc_id", "text", MhHashes, 2)
          .join(Q.rebind(buckets, cs), Seq("band", "bucket"))
          .groupBy(col("id").as("doc_id"))
          .agg(count(lit(1)).as("n_hits"))
        StreamOps.replayToTable(cs, hits,
          s"st_neardup_${System.nanoTime()}", "complete")
      }
      replayed.orderBy("doc_id")
    },
    Some(
      s"""WITH sig_idx AS (${mhSigSqlOf("doc_id < 100")}),
            sig_q AS (${mhSigSqlOf("doc_id >= 100 AND doc_id < 200")}),
            b_idx AS (${bandsSqlOver("sig_idx")}),
            b_q AS (${bandsSqlOver("sig_q")})
          SELECT q.id AS doc_id, count(*) AS n_hits
          FROM b_q q JOIN b_idx x ON q.band = x.band AND q.bucket = x.bucket
          GROUP BY 1 ORDER BY doc_id"""))

  /** Index FRESHNESS in the crawl loop: the missing composition between
    * [[stNearDupFilter]] (static index, one stream generation) and
    * [[graft.ext.MinHashIndex.append]] (shard-local index growth).
    * Docs 0–99 are indexed; generation 1 (docs 100–149) streams against
    * that index; the generation-1 batch is then APPENDED (a new shard —
    * no existing posting file is rewritten); generation 2 (docs
    * 150–199) streams against the refreshed index and must collide
    * with BOTH halves. Each generation re-opens the bucket table so the
    * stream-static join sees the index as of its own start — the
    * between-microbatch refresh a real crawl loop runs, here pinned at
    * generation granularity where the oracle can recompute both joins
    * exactly. */
  val stNearDupRefresh = Q("st_neardup_refresh",
    (s, dir) => {
      def toksOf(pred: org.apache.spark.sql.Column) = graft.ext.Dedup.docTokens(
        Tables.table(s, dir, "documents").filter(pred),
        "doc_id", "text", distinct = false)
      // generation 1 APPENDS onto the crawled-corpus base, so this query
      // mutates its own clone of it ([[Fixtures.clonedIndex]] — same
      // base build as st_neardup_filter's memoized fixture)
      val idxPath = Fixtures.clonedIndex(s, dir, "mhindex") { p =>
        graft.ext.MinHashIndex.write(
          toksOf(col("doc_id") < 100), p, MhHashes, rowsPerBand = 2)
      }
      val schema = Fixtures.tableSchema(s, dir, "documents")
      // ONE file-source drain delivers the whole crawl window; the
      // refresh protocol then runs at generation granularity over the
      // staged rows. The former shape ran a full streaming query PER
      // GENERATION — each paying ~1 s of state-store + checkpoint +
      // planning fixed cost just to re-deliver rows already on disk.
      // Delivery is the only streaming concern in this query (the
      // in-stream stateful join + aggregate surface stays pinned by
      // st_neardup_filter); what it uniquely pins is the BETWEEN-
      // GENERATION index refresh, which is batch-side by nature.
      val staged = withShufflePartitions(s, 4) { cs =>
        val stream = tableStream(cs, dir, "documents", schema)
          .filter(col("doc_id") >= 100 && col("doc_id") < 200)
          .select("doc_id", "text")
        StreamOps.replayToTable(cs, stream,
          s"st_refresh_stage_${System.nanoTime()}", "append")
      }
      // a doc's band keys do not depend on the generation — only the
      // BUCKET snapshot each generation joins against does — so the
      // heavy expression tree (canon regex chain × 8 minhash HOF
      // columns) is planned and run ONCE over the whole staged window
      // instead of once per generation (measured: each fresh
      // nearDupBands plan cost ~0.2 s of analysis/codegen against
      // ~0.01 s of actual compute at this size)
      val allBands = withShufflePartitions(s, 4) { cs =>
        StreamOps.nearDupBands(Q.rebind(staged, cs), "doc_id", "text", MhHashes, 2)
          .localCheckpoint(true)
      }
      // each generation joins the bucket table AS OF its own start.
      // The PRE-append snapshot must be MATERIALIZED (localCheckpoint),
      // not merely constructed early: serving both generations from one
      // final plan lets Catalyst reuse broadcast exchanges, and two
      // same-path parquet scans canonicalize as identical even when
      // their pinned file listings differ — the round-13 first attempt
      // (two lazy reads bracketing the append) silently served BOTH
      // generations from one snapshot. A checkpointed 400-row relation
      // cannot be confused with the fresh post-append scan (at real
      // crawl scale the as-of-generation snapshot is a versioned
      // CURRENT pointer read, not a checkpoint — the fixture-scale
      // stand-in keeps the same read-at-generation-start semantics).
      // The BROADCAST side is the generation's bands: that side is
      // bounded by the crawl window, while the stored bucket table
      // accretes without bound as the crawl runs — force-broadcasting
      // the index would hit the broadcast-relation ceiling exactly when
      // the index has grown enough to matter (round-13 review).
      def genJoin(lo: Int, hi: Int,
                  buckets: org.apache.spark.sql.DataFrame) =
        broadcast(allBands.filter(col("id") >= lo && col("id") < hi))
          .join(buckets, Seq("band", "bucket"))
          .groupBy(col("id").as("doc_id"))
          .agg(count(lit(1)).as("n_hits"))
      def bucketsNow() = graft.ext.MinHashIndex.buckets(s, idxPath)
        .select(col("band"), col("bucket"), col("id").as("index_id"))
      val bucketsPre = withShufflePartitions(s, 4) { cs =>
        Q.rebind(bucketsNow(), cs).localCheckpoint(true) // materialized BEFORE the append
      }
      graft.ext.MinHashIndex.append(
        toksOf(col("doc_id") >= 100 && col("doc_id") < 150),
        idxPath, MhHashes, rowsPerBand = 2, partitions = 1)
      // ONE final job serves both generations (the drain, the shared
      // band pass, and the append already each paid a job — the two
      // tiny broadcast joins don't need two more materializations)
      genJoin(100, 150, bucketsPre)
        .unionByName(genJoin(150, 200, bucketsNow()))
        .orderBy("doc_id")
    },
    Some(
      s"""WITH sig_idx1 AS (${mhSigSqlOf("doc_id < 100")}),
            sig_idx2 AS (${mhSigSqlOf("doc_id < 150")}),
            sig_q1 AS (${mhSigSqlOf("doc_id >= 100 AND doc_id < 150")}),
            sig_q2 AS (${mhSigSqlOf("doc_id >= 150 AND doc_id < 200")}),
            b_idx1 AS (${bandsSqlOver("sig_idx1")}),
            b_idx2 AS (${bandsSqlOver("sig_idx2")}),
            b_q1 AS (${bandsSqlOver("sig_q1")}),
            b_q2 AS (${bandsSqlOver("sig_q2")})
          SELECT doc_id, n_hits FROM (
            SELECT q.id AS doc_id, count(*) AS n_hits FROM b_q1 q
            JOIN b_idx1 x ON q.band = x.band AND q.bucket = x.bucket GROUP BY 1
            UNION ALL
            SELECT q.id AS doc_id, count(*) AS n_hits FROM b_q2 q
            JOIN b_idx2 x ON q.band = x.band AND q.bucket = x.bucket GROUP BY 1
          ) ORDER BY doc_id"""))

  /** The crawl loop as ONE LONG-LIVED streaming query
    * ([[StreamOps.nearDupLoop]]) — the deployment shape that AMORTIZES
    * the per-generation lifecycle floor the drain queries pay. Where
    * [[stNearDupRefresh]] pins the between-generation refresh protocol
    * at drain granularity (a fresh bounded replay per window), this
    * query keeps a single started streaming query alive across THREE
    * crawl generations: each generation arrives as a micro-batch
    * (MemoryStream here — the in-process stand-in for the Kafka/file
    * tail the same code serves in production; the transforms never see
    * the source type), its per-row signature bands join the bucket
    * table AS OF that batch (`bucketsNow` re-reads inside
    * `foreachBatch`, so the shard appended between generations is
    * visible WITHOUT a query restart), and planning + state-store +
    * checkpoint setup are paid ONCE for the whole crawl. Generations 2
    * and 3 must collide with every previously appended half — the hash
    * match pins mid-query index freshness. The driver-side generation
    * feed and per-batch hit collect are bounded by the crawl WINDOW
    * (≤34 docs here), never the corpus. */
  val stCrawlLoop = Q("st_crawl_loop",
    (s, dir) => {
      def toksOf(pred: org.apache.spark.sql.Column) = graft.ext.Dedup.docTokens(
        Tables.table(s, dir, "documents").filter(pred),
        "doc_id", "text", distinct = false)
      // generation 1 APPENDS onto the crawled-corpus base: private clone
      val idxPath = Fixtures.clonedIndex(s, dir, "mhindex") { p =>
        graft.ext.MinHashIndex.write(
          toksOf(col("doc_id") < 100), p, MhHashes, rowsPerBand = 2)
      }
      val gens = Seq((100, 133), (133, 166), (166, 200))
      // one bounded fetch of the whole crawl window, split per generation
      val window = Tables.table(s, dir, "documents")
        .filter(col("doc_id") >= 100 && col("doc_id") < 200)
        .select(col("doc_id").cast("long"), col("text"))
        .collect().map(r => (r.getLong(0), r.getString(1)))
      // generation batches are tiny — pin their shuffles narrow on a
      // CLONED session (the stream, its source, and the per-batch index
      // reads all live on the clone; the shared session is untouched)
      val cs = Q.pinnedSession(s, 4)
      implicit val sqlc: org.apache.spark.sql.SQLContext = cs.sqlContext
      import cs.implicits._
      val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
      val acc = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      val ckpt = StreamOps.volatileCheckpointDir(cs)
      val q =
        StreamOps.nearDupLoop(mem.toDF().toDF("doc_id", "text"),
          "doc_id", "text", MhHashes, rowsPerBand = 2, checkpoint = ckpt)(
          () => graft.ext.MinHashIndex.buckets(cs, idxPath)) { (_, hits) =>
          acc ++= hits.collect().map(r => (r.getLong(0), r.getLong(1)))
          ()
        }
      try {
        gens.zipWithIndex.foreach { case ((lo, hi), i) =>
          mem.addData(window.filter(d => d._1 >= lo && d._1 < hi).toSeq: _*)
          q.processAllAvailable()
          if (i < gens.size - 1) // refresh BETWEEN generations, mid-query
            graft.ext.MinHashIndex.append(
              toksOf(col("doc_id") >= lo && col("doc_id") < hi),
              idxPath, MhHashes, rowsPerBand = 2, partitions = 1)
        }
      } finally {
        q.stop()
        StreamOps.dropCheckpoint(ckpt)
      }
      acc.toSeq.toDF("doc_id", "n_hits").orderBy("doc_id")
    },
    Some(
      s"""WITH sig_idx1 AS (${mhSigSqlOf("doc_id < 100")}),
            sig_idx2 AS (${mhSigSqlOf("doc_id < 133")}),
            sig_idx3 AS (${mhSigSqlOf("doc_id < 166")}),
            sig_q1 AS (${mhSigSqlOf("doc_id >= 100 AND doc_id < 133")}),
            sig_q2 AS (${mhSigSqlOf("doc_id >= 133 AND doc_id < 166")}),
            sig_q3 AS (${mhSigSqlOf("doc_id >= 166 AND doc_id < 200")}),
            b_idx1 AS (${bandsSqlOver("sig_idx1")}),
            b_idx2 AS (${bandsSqlOver("sig_idx2")}),
            b_idx3 AS (${bandsSqlOver("sig_idx3")}),
            b_q1 AS (${bandsSqlOver("sig_q1")}),
            b_q2 AS (${bandsSqlOver("sig_q2")}),
            b_q3 AS (${bandsSqlOver("sig_q3")})
          SELECT doc_id, n_hits FROM (
            SELECT q.id AS doc_id, count(*) AS n_hits FROM b_q1 q
            JOIN b_idx1 x ON q.band = x.band AND q.bucket = x.bucket GROUP BY 1
            UNION ALL
            SELECT q.id AS doc_id, count(*) AS n_hits FROM b_q2 q
            JOIN b_idx2 x ON q.band = x.band AND q.bucket = x.bucket GROUP BY 1
            UNION ALL
            SELECT q.id AS doc_id, count(*) AS n_hits FROM b_q3 q
            JOIN b_idx3 x ON q.band = x.band AND q.bucket = x.bucket GROUP BY 1
          ) ORDER BY doc_id"""))

  /** Streaming ingest into the persisted BM25 text index — the
    * text-retrieval twin of [[stNearDupRefresh]]'s crawl loop, driven
    * by the REAL Structured Streaming sink surface: each micro-batch
    * lands via `writeStream.foreachBatch → TextIndex.append`, i.e. one
    * transactional marker-committed shard per batch (postings + doclens
    * + stats publish first, the commit marker last), so a crash between
    * micro-batches leaves the index serving exactly the last committed
    * batch boundary. One replay drain appends the `% 3 != 0` remainder
    * of the corpus onto the `% 3 = 0` base build (one micro-batch per
    * source file group — the single-file fixtures drain as one appended
    * shard; ScaleUp's part-file copies may land several, and serving
    * sums them exactly either way). It was two residue-split drains,
    * but the second stream lifecycle + append bought no extra coverage:
    * [[stNearDupRefresh]] already pins multi-generation refresh, and
    * `ta_bm25_evolve` pins multi-shard BM25 serving. The oracle
    * recomputes BM25 over the WHOLE corpus from scratch: the hash match
    * pins that stream-appended shards sum df/doclen/stats exactly like
    * a single batch build (nothing about the stream path may leak into
    * the scores). */
  val stBm25Refresh = Q("st_bm25_refresh",
    (s, dir) => {
      import graft.ext.TextIndex
      // the `% 3 = 0` base build is the fixture ([[Fixtures.clonedIndex]]);
      // the measured subject is the streaming drain + shard append + serve
      val idxPath = Fixtures.clonedIndex(s, dir, "tindex-mod3") { p =>
        TextIndex.write(
          Tables.table(s, dir, "documents").filter(col("doc_id") % 3 === 0), p)
      }
      val schema = Fixtures.tableSchema(s, dir, "documents")
      withShufflePartitions(s, 4) { cs =>
        val stream = tableStream(cs, dir, "documents", schema)
          .filter(col("doc_id") % 3 =!= 0)
        // one-shot drain: volatile checkpoint (StreamOps contract — a
        // real ingest loop would pass its durable dir here instead)
        val ckpt = StreamOps.volatileCheckpointDir(cs)
        try {
          val w = stream.writeStream
            .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
              TextIndex.append(batch.select("doc_id", "text"), idxPath,
                partitions = 1) // micro-batch shards: one sorted file each
            }
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          val q = ckpt.fold(w)(w.option("checkpointLocation", _)).start()
          q.awaitTermination()
        } finally StreamOps.dropCheckpoint(ckpt)
      }
      TextIndex.bm25TopK(s, idxPath, TextQueries2.Bm25Terms, 20,
        TextQueries2.Bm25K1, TextQueries2.Bm25B)
    },
    Some(TextQueries2.bm25Sql()))

  /** The BM25 crawl loop as ONE LONG-LIVED streaming query
    * ([[StreamOps.bm25Loop]]) — [[stCrawlLoop]]'s amortization shape
    * applied to the TEXT index, closing the family: where
    * [[stBm25Refresh]] pins the one-shot drain → append → serve
    * lifecycle (a fresh stream per generation), this keeps a single
    * started query alive across THREE crawl generations; each
    * generation arrives as a micro-batch, `foreachBatch` appends it as
    * one marker-committed shard, and the SAME batch then serves the
    * standing BM25 probe through the committed-shard reader — so the
    * output is the top-20 AS OF each generation, and the hash match
    * pins mid-query index freshness (a shard committed seconds ago is
    * served without restart, pointer flip, or cache invalidation).
    * The oracle recomputes BM25 from scratch over each generation's
    * cumulative corpus: nothing about the stream path, the shard
    * count, or the append order may leak into the scores. Driver-side
    * feed is bounded by the crawl WINDOW (≤34 docs/generation), never
    * the corpus; `curGen` stamps results because a generation's
    * addData may legally split into several micro-batches — the sink
    * overwrites, keeping the as-of-END-of-generation ranking either
    * way. */
  val stBm25Loop = Q("st_bm25_loop",
    (s, dir) => {
      import graft.ext.TextIndex
      val idxPath = Fixtures.clonedIndex(s, dir, "tindex-lt100") { p =>
        TextIndex.write(
          Tables.table(s, dir, "documents").filter(col("doc_id") < 100), p)
      }
      val gens = Seq((100, 133), (133, 166), (166, 200))
      val window = Tables.table(s, dir, "documents")
        .filter(col("doc_id") >= 100 && col("doc_id") < 200)
        .select(col("doc_id").cast("long"), col("text"))
        .collect().map(r => (r.getLong(0), r.getString(1)))
      // pinned CLONE, not a session-conf mutation (see st_crawl_loop)
      val cs = Q.pinnedSession(s, 4)
      implicit val sqlc: org.apache.spark.sql.SQLContext = cs.sqlContext
      import cs.implicits._
      val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
      @volatile var curGen = 1
      val acc = scala.collection.mutable.LinkedHashMap[Int, Array[(Long, Long, Int)]]()
      val ckpt = StreamOps.volatileCheckpointDir(cs)
      val q =
        StreamOps.bm25Loop(mem.toDF().toDF("doc_id", "text"), idxPath,
          TextQueries2.Bm25Terms, 20, TextQueries2.Bm25K1, TextQueries2.Bm25B,
          checkpoint = ckpt) { (_, topk) =>
          acc(curGen) = topk.collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
          ()
        }
      try {
        gens.zipWithIndex.foreach { case ((lo, hi), i) =>
          curGen = i + 1
          mem.addData(window.filter(d => d._1 >= lo && d._1 < hi).toSeq: _*)
          q.processAllAvailable()
        }
      } finally {
        q.stop()
        StreamOps.dropCheckpoint(ckpt)
      }
      acc.toSeq.flatMap { case (g, rows) =>
        rows.map(t => (g, t._1, t._2, t._3))
      }.toDF("gen", "doc_id", "score_micro", "rank")
        .orderBy("gen", "rank")
    },
    Some(s"""SELECT gen, doc_id, score_micro, rank FROM (
               SELECT 1 AS gen, t1.* FROM (${TextQueries2.bm25Sql("WHERE doc_id < 133")}) t1
               UNION ALL
               SELECT 2 AS gen, t2.* FROM (${TextQueries2.bm25Sql("WHERE doc_id < 166")}) t2
               UNION ALL
               SELECT 3 AS gen, t3.* FROM (${TextQueries2.bm25Sql("WHERE doc_id < 200")}) t3
             ) ORDER BY gen, rank"""))

  /** The gazetteer CDC feed as a STREAM ([[StreamOps.gazCdcLoop]]) —
    * the production form of the g16 journey: one long-lived query
    * applies each micro-batch of change rows as a delta-proportional
    * snapshot version, then a CRASH-RESTART re-delivers the last
    * micro-batch and the manifest's (checkpoint-identity, batchId)
    * transaction makes the replay an idempotent skip (decided before
    * the replayed feed is evaluated — zero jobs, no junk version, no
    * duplicate trigram shard). The journey: partitioned base (g16's
    * shared fixture) → batch 1 (renames + deletes, one parquet file) →
    * batch 2 (inserts) through a single running [[StreamOps.gazCdcLoop]]
    * → drop the newest checkpoint commit (the publish landed, the
    * commit never did — the at-least-once window) → restart the loop →
    * final corpus projection. The oracle is g16's SQL recompute of the
    * feed applied ONCE ([[GeocodeQueries.gazDeltaOracleSql]] — the
    * batches are id-disjoint, so sequential application equals the
    * union): the hash match pins that nothing about micro-batch
    * boundaries, the restart, or the replay leaks into the snapshot.
    * Exactly-once METADATA hygiene (version/shard counts across the
    * replay) is pinned at the unit level in `GazCdcStreamSpec`. */
  val stGazCdc = Q("st_gaz_cdc",
    (s, dir) => {
      val raw = Fixtures.derivedRaw(s, dir, withWikidata = false)
      val root = Fixtures.clonedIndex(s, dir, "gazdelta") { p =>
        graft.etl.GazetteerBuilder.writeVersionedPartitioned(s, raw, p)
      }
      val (udP, insP, _) = Fixtures.gazDeltaFeedPaths(s, dir)
      val feedDir = graft.core.TempDirs.create("graft-gazcdc-feed-")
      // the checkpoint must survive the RESTART, not the JVM — the
      // journey's crash window is replayed in-process, so the tmpfs
      // drain checkpoint is sound here and skips the per-batch WAL
      // fsyncs a durable dir pays (a real deployment passes its own
      // durable location, the gazCdcLoop contract)
      val ckpt = StreamOps.volatileCheckpointDir(s)
        .getOrElse(graft.core.TempDirs.create("graft-gazcdc-ckpt-"))
      // each CDC batch lands as ONE visible file (the materialized
      // fixture batch's single part file, copied in), so file-source
      // batch boundaries are exactly the CDC batch boundaries
      def land(srcDir: String, n: Int): Unit = {
        val part = new java.io.File(srcDir).listFiles
          .find(_.getName.endsWith(".parquet")).get
        java.nio.file.Files.copy(part.toPath,
          new java.io.File(s"$feedDir/batch$n.parquet").toPath)
        ()
      }
      val cs = Q.pinnedSession(s, 4)
      val schema = Fixtures.gazFeedSchema(s, dir) // memoized: no per-run inference job
      def loop() = StreamOps.gazCdcLoop(
        cs.readStream.schema(schema).parquet(feedDir), root,
        checkpoint = Some(ckpt)) { (_, _) => () }
      land(udP, 1)
      val q1 = loop()
      try { q1.processAllAvailable(); land(insP, 2); q1.processAllAvailable() }
      finally q1.stop()
      // the at-least-once window: the version published but the
      // checkpoint commit never landed — the restarted query re-runs
      // the newest micro-batch, which must be an idempotent skip (the
      // hidden .crc sibling goes too: a stale ChecksumFs checksum would
      // block the replayed commit's rename)
      val newest = new java.io.File(s"$ckpt/commits").listFiles()
        .filter(_.getName.forall(_.isDigit)).maxBy(_.getName.toLong)
      new java.io.File(newest.getParentFile, s".${newest.getName}.crc").delete()
      newest.delete()
      val q2 = loop()
      try q2.processAllAvailable()
      finally { q2.stop(); StreamOps.dropCheckpoint(Some(ckpt)) }
      val resolved = graft.ext.VersionedStore.resolveCurrent(s, root)
      GeocodeQueries.gazRefreshProjection(
        graft.etl.GazetteerBuilder.readPois(s, resolved))
    },
    Some(GeocodeQueries.gazDeltaOracleSql))

  val all: Seq[Q] = Seq(stReplayHourly, stSessions, stIntervalJoin,
    stStreamDedup, stEnrich, stNearDupFilter, stNearDupRefresh,
    stCrawlLoop, stBm25Refresh, stBm25Loop, stGazCdc)
}
