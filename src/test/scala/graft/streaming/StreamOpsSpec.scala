package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

// top-level so Spark can derive an Encoder (inner classes can't)
case class Ev(ts: Timestamp, event_type: String, value: Double, user_id: Long)
case class AttrEv(ts: Timestamp, user_id: Long, event_id: Long)

class StreamOpsSpec extends SparkSpec {

  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("streaming hourly counts equal the batch aggregate on replay") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Ev]
    val events = Seq(
      Ev(ts(5), "click", 1.0, 1), Ev(ts(10), "click", 2.0, 1),
      Ev(ts(20), "view", 3.0, 2),
      Ev(Timestamp.valueOf("2024-01-01 11:05:00"), "click", 4.0, 1))
    mem.addData(events: _*)
    val out = StreamOps.replayToTable(spark,
      StreamOps.hourlyEventCounts(mem.toDF()), "spec_hourly", "complete")
      .select(date_format(col("window.start"), "HH:mm").as("h"),
        col("event_type"), col("n_events"), col("sum_value"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(out(("10:00", "click")) == (2L, 3.0))
    assert(out(("10:00", "view")) == (1L, 3.0))
    assert(out(("11:00", "click")) == (1L, 4.0))
  }

  test("stateful streaming runs on the RocksDB state store (off-heap state at scale)") {
    // 100 TB/day of novelty/window state cannot live on the JVM heap;
    // RocksDB is the provider a production deployment sets. Same query,
    // same results — only the state backend changes.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sc = spark.sqlContext
      val mem = MemoryStream[Ev]
      mem.addData(
        Ev(ts(5), "click", 1.0, 1), Ev(ts(10), "click", 2.0, 1),
        Ev(ts(20), "view", 3.0, 2))
      val out = StreamOps.replayToTable(spark,
        StreamOps.hourlyEventCounts(mem.toDF()), "spec_hourly_rocks", "complete")
        .select(col("event_type"), col("n_events")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(out == Map("click" -> 2L, "view" -> 1L))
    } finally prev.fold(spark.conf.unset(key))(v => spark.conf.set(key, v))
  }

  test("session windows split on the 30-minute gap") {
    val df = Seq(
      Ev(ts(0), "a", 1.0, 1), Ev(ts(10), "a", 1.0, 1), // session 1 (gap 10m)
      Ev(ts(45), "a", 1.0, 1),                         // session 2 (gap 35m)
      Ev(ts(0), "a", 1.0, 2)                           // other user
    ).toDF()
    val sessions = StreamOps.userSessions(df).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(sessions((1L, "2024-01-01 10:00:00")) == 2L)
    assert(sessions((1L, "2024-01-01 10:45:00")) == 1L)
    assert(sessions((2L, "2024-01-01 10:00:00")) == 1L)
  }

  test("streaming dedup drops repeated fingerprints within the watermark") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(
      Ev(ts(1), "x", 1.0, 1), Ev(ts(1), "x", 1.0, 1), // dup (same ts)
      Ev(ts(2), "x", 1.0, 1),                         // dup (DIFFERENT ts)
      Ev(ts(3), "y", 1.0, 1))                         // distinct fingerprint
    val out = StreamOps.replayToTable(spark,
      StreamOps.dedupStream(mem.toDF(), "event_type"), "spec_dedup", "append")
    // dropDuplicatesWithinWatermark: one row per fingerprint inside the horizon
    assert(out.select("event_type").collect().map(_.getString(0)).sorted.toSeq
      == Seq("x", "y"))
  }

  test("streaming geocode: micro-batches run the distributed scoring join") {
    implicit val sc = spark.sqlContext
    val pois = Seq(
      (1L, "Monograph Dining", null, "monograph dining", "",
        "amenity:restaurant", 0.6, 3.139, 101.6869))
      .toDF("osm_id", "name_local", "name_en", "name_local_norm", "name_en_norm",
        "kind", "importance", "lat", "lon")
    val mem = MemoryStream[(Long, String)]
    mem.addData((1L, "monograph"), (2L, "no such place zzz"))
    val results = scala.collection.mutable.Map[Long, Array[(Long, Long)]]()
    val q = StreamOps.geocodeStream(
      mem.toDF().toDF("qid", "text"), pois, graft.core.Settings(), k = 3) {
      (batchId, hits) =>
        results(batchId) = hits.select("qid", "osm_id").collect()
          .map(r => (r.getLong(0), r.getLong(1)))
    }
    q.awaitTermination()
    val all = results.values.flatten.toSet
    assert(all == Set((1L, 1L)), s"got $all") // query 1 matched poi 1; query 2 nothing
  }

  test("flatMapGroupsWithState: novelty tagging with bounded per-key state") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    mem.addData(("a", 100L), ("b", 200L), ("a", 300L), ("a", 400L))
    val out = StreamOps.replayToTable(spark,
      StreamOps.noveltyStream(mem.toDS()).toDF(), "spec_novelty", "append")
      .collect().map(r => (r.getString(0), r.getBoolean(1), r.getLong(2)))
    // 'a' first occurrence is new, later ones counted; 'b' new once
    assert(out.toSet == Set(("a", true, 1L), ("b", true, 1L),
      ("a", false, 2L), ("a", false, 3L)))
  }

  test("flatMapGroupsWithState: state expires after the event-time TTL and the key is novel again") {
    implicit val sc = spark.sqlContext
    val hour = 3600000L
    val mem = MemoryStream[(String, Long)]
    val q = StreamOps.noveltyStream(mem.toDS(), ttlMs = hour).toDF()
      .writeStream.format("memory").queryName("spec_novelty_ttl")
      .outputMode("append").start()
    try {
      val base = 1700000000000L // strictly above the initial watermark (0)
      mem.addData(("a", base))
      q.processAllAvailable() // batch 1: a is new; timeout at base+1h
      mem.addData(("w", base + 5 * hour))
      q.processAllAvailable() // batch 2: watermark advances past a's timeout
      mem.addData(("a", base + 6 * hour))
      q.processAllAvailable() // batch 3: a's state expired -> novel again
      val out = spark.table("spec_novelty_ttl").collect()
        .map(r => (r.getString(0), r.getBoolean(1), r.getLong(2))).toSeq
      assert(out.count { case (k, n, c) => k == "a" && n && c == 1L } == 2,
        s"'a' must be novel twice (before and after TTL expiry), got $out")
    } finally q.stop()
  }

  test("stream-stream interval join matches within the window, same user only") {
    implicit val sc = spark.sqlContext
    val vs = MemoryStream[AttrEv]
    val ps = MemoryStream[AttrEv]
    vs.addData(
      AttrEv(Timestamp.valueOf("2024-01-01 10:00:00"), 1L, 1L),
      AttrEv(Timestamp.valueOf("2024-01-01 11:00:00"), 2L, 2L))
    ps.addData(
      AttrEv(Timestamp.valueOf("2024-01-01 12:00:00"), 1L, 101L), // +2h → match
      AttrEv(Timestamp.valueOf("2024-01-02 10:00:00"), 1L, 102L), // +24h → outside
      AttrEv(Timestamp.valueOf("2024-01-01 12:30:00"), 3L, 103L), // other user
      AttrEv(Timestamp.valueOf("2024-01-01 09:00:00"), 2L, 104L)) // before the view
    val views = vs.toDF().select(col("user_id"),
      col("event_id").as("view_id"), col("ts").as("view_ts"))
    val buys = ps.toDF().select(col("user_id").as("buy_user_id"),
      col("event_id").as("purchase_id"), col("ts").as("buy_ts"))
    val out = StreamOps.replayToTable(spark,
      StreamOps.attributionJoin(views, buys, "6 hours", "1 hour"),
      "spec_attr_join", "append")
      .select("view_id", "purchase_id", "delay_us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((1L, 101L, 7200000000L)),
      s"only the in-window same-user purchase may match: $out")
  }

  test("chained stateful operators: interval join feeding a windowed aggregate in one query") {
    implicit val sc = spark.sqlContext
    val vs = MemoryStream[AttrEv]
    val ps = MemoryStream[AttrEv]
    // the last row on EACH stream is a far-future no-match flush: the
    // global watermark is min(per-stream max event time) - delay, and
    // append-mode windows only emit once it passes their end
    vs.addData(
      AttrEv(Timestamp.valueOf("2024-01-01 10:00:00"), 1L, 1L),
      AttrEv(Timestamp.valueOf("2024-01-01 10:10:00"), 2L, 2L),
      AttrEv(Timestamp.valueOf("2024-01-02 00:00:00"), 98L, 9L))
    ps.addData(
      AttrEv(Timestamp.valueOf("2024-01-01 11:30:00"), 1L, 101L), // window 11:00
      AttrEv(Timestamp.valueOf("2024-01-01 11:45:00"), 2L, 102L), // window 11:00
      AttrEv(Timestamp.valueOf("2024-01-01 13:00:00"), 1L, 103L), // window 13:00
      AttrEv(Timestamp.valueOf("2024-01-02 00:00:00"), 99L, 999L))
    val views = vs.toDF().select(col("user_id"),
      col("event_id").as("view_id"), col("ts").as("view_ts"))
    val buys = ps.toDF().select(col("user_id").as("buy_user_id"),
      col("event_id").as("purchase_id"), col("ts").as("buy_ts"))
    // join state + window state in ONE streaming query — the watermark
    // propagates through the join to the downstream aggregate
    val hourly = StreamOps.attributionJoin(views, buys, "6 hours", "1 hour",
        keepEventTime = true)
      .groupBy(window(col("buy_ts"), "1 hour"))
      .agg(count(lit(1)).as("n_attributed"))
    val out = StreamOps.replayToTable(spark, hourly, "spec_attr_hourly", "append")
      .select(date_format(col("window.start"), "HH:mm").as("h"), col("n_attributed"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("11:00" -> 2L, "13:00" -> 1L),
      s"attributed purchases must roll up by purchase hour: $out")
  }

  test("near-dup prefilter is source-agnostic: MemoryStream equals the file source") {
    implicit val sc = spark.sqlContext
    // the crawl-time prefilter pipeline as a pure function of its
    // streaming input — the seam contract: any source that yields
    // (doc_id, text) rows drains to identical results
    val dir = sf("sf0.001")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val idxPath = java.nio.file.Files
      .createTempDirectory("graft-ndf-seam").toString + "/idx"
    graft.ext.MinHashIndex.write(
      graft.ext.Dedup.docTokens(docs.filter(col("doc_id") < 50),
        "doc_id", "text", distinct = false),
      idxPath, numHashes = 8, rowsPerBand = 2)
    val buckets = spark.read.parquet(s"$idxPath/buckets")
      .select(col("band"), col("bucket"), col("id").as("index_id"))
    def prefilter(stream: org.apache.spark.sql.DataFrame) =
      StreamOps.nearDupBands(stream, "doc_id", "text", 8, 2)
        .join(buckets, Seq("band", "bucket"))
        .groupBy(col("id").as("doc_id"))
        .agg(count(lit(1)).as("n_hits"))

    val fromFile = StreamOps.replayToTable(spark,
        prefilter(StreamOps.readStreamOf(spark, dir, "documents", docs.schema)
          .filter(col("doc_id") >= 50 && col("doc_id") < 100)),
        "seam_ndf_file", "complete")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val mem = MemoryStream[(Long, String)]
    mem.addData(docs.filter(col("doc_id") >= 50 && col("doc_id") < 100)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq)
    val fromMem = StreamOps.replayToTable(spark,
        prefilter(mem.toDF().toDF("doc_id", "text")),
        "seam_ndf_mem", "complete")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    assert(fromFile.nonEmpty, "fixture stream drained empty — seam broke")
    assert(fromMem == fromFile,
      s"MemoryStream result diverged from the file source: $fromMem vs $fromFile")
  }

  test("interval join is source-agnostic: MemoryStream equals the file-source events") {
    implicit val sc = spark.sqlContext
    // same contract for the stream-stream shape: views/purchases derived
    // from the fixture events table, once through readStreamOf and once
    // through MemoryStream carrying the identical rows
    val dir = sf("sf0.001")
    val events = graft.queries.Tables.table(spark, dir, "events")
    def shape(src: org.apache.spark.sql.DataFrame) = {
      val views = src.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
      val buys = src.filter(col("event_type") === "purchase")
        .select(col("user_id").as("buy_user_id"),
          col("event_id").as("purchase_id"), col("ts").as("buy_ts"))
      StreamOps.attributionJoin(views, buys, "6 hours", "1 hour")
    }
    val raw = graft.queries.Tables.rawEvents(spark, s"$dir/events.parquet")
    val fromFile = StreamOps.replayToTable(spark,
        shape(graft.queries.Tables.normalizeTs(
          StreamOps.readStreamOf(spark, dir, "events", raw.schema))),
        "seam_attr_file", "append")
      .select("view_id", "purchase_id", "delay_us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val mem = MemoryStream[AttrEv]
    val evRows = events.select("ts", "user_id", "event_id", "event_type").collect()
    mem.addData(evRows.filter(_.getString(3) == "view")
      .map(r => AttrEv(r.getTimestamp(0), r.getLong(1), r.getLong(2))).toSeq)
    val mem2 = MemoryStream[AttrEv]
    mem2.addData(evRows.filter(_.getString(3) == "purchase")
      .map(r => AttrEv(r.getTimestamp(0), r.getLong(1), r.getLong(2))).toSeq)
    val views = mem.toDF().select(col("user_id"),
      col("event_id").as("view_id"), col("ts").as("view_ts"))
    val buys = mem2.toDF().select(col("user_id").as("buy_user_id"),
      col("event_id").as("purchase_id"), col("ts").as("buy_ts"))
    val fromMem = StreamOps.replayToTable(spark,
        StreamOps.attributionJoin(views, buys, "6 hours", "1 hour"),
        "seam_attr_mem", "append")
      .select("view_id", "purchase_id", "delay_us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    assert(fromFile.nonEmpty, "fixture events drained no attributions")
    assert(fromMem == fromFile,
      s"MemoryStream attribution diverged from the file source (sizes " +
        s"${fromMem.size} vs ${fromFile.size})")
  }

  test("micro-batch pipeline via foreachBatch reuses batch scoring (extension §2.8)") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[String]
    mem.addData("monograph dining", "zzz")
    val seen = scala.collection.mutable.ArrayBuffer[Long]()
    val q = mem.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        seen += batch.count() // stands in for per-batch geocode scoring
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(seen.sum == 2L)
  }

  test("nearDupLoop: an index appended MID-QUERY is visible to the next micro-batch") {
    // one long-lived query, two generations, one refresh between them:
    // docs 1/2/3 share the SAME text, so every band collides. With 8
    // hashes × rowsPerBand 2 = 4 bands: gen-1 doc 2 sees only indexed
    // doc 1 (4 hits); after doc 2 is appended WITHOUT restarting the
    // query, gen-2 doc 3 must see BOTH (8 hits) — the per-batch
    // bucketsNow() re-read is what makes the refresh visible.
    implicit val sc = spark.sqlContext
    import graft.ext.{Dedup, MinHashIndex}
    val idx = graft.core.TempDirs.create("neardup-loop-spec-")
    val text = "the quick brown fox jumps over the lazy dog"
    def toks(ids: Long*) = Dedup.docTokens(
      ids.map(i => (i, text)).toDF("doc_id", "text"),
      "doc_id", "text", distinct = false)
    MinHashIndex.write(toks(1L), idx, numHashes = 8, rowsPerBand = 2)
    val mem = MemoryStream[(Long, String)]
    val perBatch = scala.collection.mutable.ArrayBuffer[Set[(Long, Long)]]()
    val q = StreamOps.nearDupLoop(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text",
      numHashes = 8, rowsPerBand = 2)(
      () => MinHashIndex.buckets(spark, idx)) { (_, hits) =>
      val got = hits.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      if (got.nonEmpty) perBatch += got
      ()
    }
    try {
      mem.addData((2L, text))
      q.processAllAvailable()
      MinHashIndex.append(toks(2L), idx, numHashes = 8, rowsPerBand = 2,
        partitions = 1)
      mem.addData((3L, text))
      q.processAllAvailable()
    } finally q.stop()
    assert(perBatch.toSeq == Seq(Set((2L, 4L)), Set((3L, 8L))),
      s"expected gen-1 {2→4 hits} then gen-2 {3→8 hits}, got $perBatch")
  }

  test("nearDupLoop over a VERSIONED root: a CURRENT flip between batches is visible") {
    // the object-store-safe refresh: no in-place append — each refresh
    // publishes a fresh immutable v{N} and flips the one-line CURRENT
    // pointer. bucketsNow resolves the pointer per micro-batch, so the
    // v2 publish landing between generations reaches generation 2
    // without a query restart (and without rename-atomicity anywhere).
    implicit val sc = spark.sqlContext
    import graft.ext.{Dedup, MinHashIndex}
    val root = graft.core.TempDirs.create("neardup-loop-vspec-")
    val text = "the quick brown fox jumps over the lazy dog"
    def toks(ids: Long*) = Dedup.docTokens(
      ids.map(i => (i, text)).toDF("doc_id", "text"),
      "doc_id", "text", distinct = false)
    MinHashIndex.writeVersioned(toks(1L), root, numHashes = 8, rowsPerBand = 2)
    val mem = MemoryStream[(Long, String)]
    val perBatch = scala.collection.mutable.ArrayBuffer[Set[(Long, Long)]]()
    val q = StreamOps.nearDupLoop(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text",
      numHashes = 8, rowsPerBand = 2)(
      () => MinHashIndex.buckets(spark,
        MinHashIndex.currentVersion(spark, root))) { (_, hits) =>
      val got = hits.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      if (got.nonEmpty) perBatch += got
      ()
    }
    try {
      mem.addData((2L, text))
      q.processAllAvailable()
      MinHashIndex.writeVersioned(toks(1L, 2L), root, numHashes = 8, rowsPerBand = 2)
      mem.addData((3L, text))
      q.processAllAvailable()
    } finally q.stop()
    assert(perBatch.toSeq == Seq(Set((2L, 4L)), Set((3L, 8L))),
      s"expected gen-1 {2→4 hits} then gen-2 {3→8 hits}, got $perBatch")
  }

  test("bm25Loop with maintenance BETWEEN generations: compaction is invisible to as-of serving") {
    // the full production crawl shape: ONE long-lived ingest query,
    // maintain() (shard-count compaction) firing between generations —
    // as-of rankings must equal the maintenance-free run, and the
    // final index must serve like a from-scratch rebuild. This is the
    // loop-composition the standalone maintain()/soak specs don't pin.
    implicit val sc = spark.sqlContext
    import graft.ext.TextIndex
    def docs(ids: Range) = ids
      .map(i => (i.toLong, s"fox spark jugs doc$i tok${i % 5}"))
    def drive(idx: String, doMaintain: Boolean): Seq[Seq[(Long, Long, Int)]] = {
      TextIndex.write(docs(0 until 4).toDF("doc_id", "text"), idx)
      val mem = MemoryStream[(Long, String)]
      val perGen = scala.collection.mutable.ArrayBuffer[Seq[(Long, Long, Int)]]()
      val q = StreamOps.bm25Loop(mem.toDF().toDF("doc_id", "text"), idx,
        Seq("fox", "spark", "jugs"), k = 50, k1 = 1.2, b = 0.75) { (_, topk) =>
        perGen += topk.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
        ()
      }
      try for (g <- 0 until 3) {
        mem.addData(docs(4 + g * 4 until 8 + g * 4): _*)
        q.processAllAvailable()
        if (doMaintain)
          TextIndex.maintain(spark, idx, maxShards = 2)
      } finally q.stop()
      perGen.toSeq
    }
    val base = graft.core.TempDirs.create("bm25-loop-maint-")
    val withMaint = drive(s"$base/m", doMaintain = true)
    val noMaint = drive(s"$base/n", doMaintain = false)
    assert(withMaint == noMaint,
      s"as-of rankings must not see compaction:\n$withMaint\nvs\n$noMaint")
    // final serve ≡ rebuild
    TextIndex.write(docs(0 until 16).toDF("doc_id", "text"), s"$base/reb")
    def serve(p: String) = TextIndex
      .bm25TopK(spark, p, Seq("fox", "spark", "jugs"), 50, 1.2, 0.75)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(serve(s"$base/m") == serve(s"$base/reb"),
      "maintained crawl index must serve like a rebuild")
  }
}
