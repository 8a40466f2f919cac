package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics of the CDC merge apply (ext/Cdc), batch sessionization
  * (ext/Sessions), int8 scalar quantization (Similarity.withSq8/sqTopK)
  * and containment decontamination (Dedup.containmentScores) — the
  * boundary cases the sf-fixture oracles don't pin.
  */
class CdcSessionsSpec extends SparkSpec {

  import spark.implicits._

  // ---- Cdc.applyChanges ----

  private def base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0)
  ).toDF("k", "v", "p")

  test("applyChanges: update replaces, delete removes, insert adds") {
    val changes = Seq(
      (2L, "B2", 21.0, "U"),  // update key 2
      (3L, "c", 30.0, "D"),   // delete key 3
      (9L, "z", 90.0, "I")    // insert new key 9
    ).toDF("k", "v", "p", "op")
    val out = Cdc.applyChanges(base, changes, "k")
      .orderBy("k").as[(Long, String, Double)].collect()
    assert(out.toSeq == Seq(
      (1L, "a", 10.0), (2L, "B2", 21.0), (4L, "d", 40.0), (9L, "z", 90.0)))
  }

  test("applyChanges result keys stay unique and empty feeds are no-ops") {
    val none = Seq.empty[(Long, String, Double, String)].toDF("k", "v", "p", "op")
    assert(Cdc.applyChanges(base, none, "k").orderBy("k").collect().length == 4)
    val out = Cdc.applyChanges(base,
      Seq((1L, "x", 1.0, "U")).toDF("k", "v", "p", "op"), "k")
    assert(out.select("k").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("applyChanges seqCol compacts a duplicate-key feed to latest-per-key") {
    // key 2: upsert@1 then delete@2 -> gone; key 3: delete@1 then
    // upsert@2 -> resurrected with the v2 row; key 9: two inserts ->
    // only seq 2 survives
    val changes = Seq(
      (2L, "B2", 21.0, "U", 1L), (2L, "B2", 21.0, "D", 2L),
      (3L, "C1", 31.0, "D", 1L), (3L, "C2", 32.0, "U", 2L),
      (9L, "z1", 90.0, "I", 1L), (9L, "z2", 91.0, "I", 2L)
    ).toDF("k", "v", "p", "op", "seq")
    val out = Cdc.applyChanges(base, changes, "k", seqCol = Some("seq"))
      .orderBy("k").as[(Long, String, Double)].collect()
    assert(out.toSeq == Seq(
      (1L, "a", 10.0), (3L, "C2", 32.0), (4L, "d", 40.0), (9L, "z2", 91.0)))
    // same-seq delete+upsert tie resolves to the delete, deterministically
    val tied = Seq((2L, "x", 0.0, "U", 5L), (2L, "y", 0.0, "D", 5L))
      .toDF("k", "v", "p", "op", "seq")
    val out2 = Cdc.applyChanges(base, tied, "k", seqCol = Some("seq"))
      .select("k").as[Long].collect().sorted.toSeq
    assert(out2 == Seq(1L, 3L, 4L))
  }

  test("applyChanges treats a NULL op as an upsert, never a silent delete") {
    val changes = Seq((2L, "B2", 21.0, null.asInstanceOf[String]))
      .toDF("k", "v", "p", "op")
    val out = Cdc.applyChanges(base, changes, "k")
      .orderBy("k").as[(Long, String, Double)].collect()
    assert(out.toSeq == Seq(
      (1L, "a", 10.0), (2L, "B2", 21.0), (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("applyChanges plans one anti-join of base against the change keys") {
    val changes = Seq((2L, "B2", 21.0, "U")).toDF("k", "v", "p", "op")
    val plan = Cdc.applyChanges(base, changes, "k")
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), s"expected a left-anti join:\n$plan")
  }

  // ---- Sessions ----

  private def ev(rows: (Long, String, Long)*) =
    rows.toDF("user_id", "tss", "event_id")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")

  test("sessionize splits strictly beyond the gap, not at it") {
    // gap = 60s: +60s exactly stays in session 1; +60.000001s splits
    val e = ev(
      (1L, "2024-01-01 00:00:00", 1L),
      (1L, "2024-01-01 00:01:00", 2L),          // exactly 60s → same session
      (1L, "2024-01-01 00:02:00.000001", 3L))   // 60.000001s → new session
    val out = Sessions.sessionize(e, "user_id", "ts", "event_id", 60L)
      .orderBy("session_seq").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("n_events") == 2L)
    assert(out(0).getAs[Long]("duration_sec") == 60L)
    assert(out(1).getAs[Long]("n_events") == 1L)
  }

  test("sessionize orders ties by the tiebreak column and is repartition-stable") {
    val e = ev(
      (1L, "2024-01-01 00:00:00", 2L),
      (1L, "2024-01-01 00:00:00", 1L),  // tied ts — event_id orders them
      (2L, "2024-01-01 05:00:00", 3L))
    val a = Sessions.sessionize(e, "user_id", "ts", "event_id", 60L)
      .orderBy("user_id", "session_seq").collect()
    val b = Sessions.sessionize(e.repartition(5), "user_id", "ts", "event_id", 60L)
      .orderBy("user_id", "session_seq").collect()
    assert(a.sameElements(b))
    assert(a.length == 2 && a(0).getAs[Long]("n_events") == 2L)
  }

  test("sessionize plans ONE exchange: lag, prefix sum and final agg share it") {
    val e = ev((1L, "2024-01-01 00:00:00", 1L), (2L, "2024-01-01 01:00:00", 2L))
    val plan = Sessions.sessionize(e, "user_id", "ts", "event_id", 60L)
      .queryExecution.executedPlan.toString
    // both windows and the group-by key on user_id — hashpartitioning
    // (user_id) satisfies all three, so EnsureRequirements must not add
    // a second shuffle (the SCALE.md claim, executable)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected exactly 1 shuffle exchange:\n$plan")
  }

  // ---- Similarity int8 scalar quantization ----

  test("withSq8: codes bounded to ±127, zero vectors quantize to zero") {
    val vecs = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.withSq8(vecs, "embedding")
      .select("vec_id", "sq").as[(Long, Seq[Long])].collect().toMap
    assert(out(1L) == Seq(64L, -127L, 32L, 0L))
    assert(out(2L) == Seq(0L, 0L, 0L, 0L))
    assert(out.values.flatten.forall(v => v >= -127L && v <= 127L))
  }

  test("sqTopK flags exact-top-k members and preserves k per query") {
    val emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    val out = Similarity.sqTopK(emb.filter(col("vec_id") < 2), emb, k = 5)
    val rows = out.collect()
    assert(rows.length == 10)
    // int8 is a mild compression at dim 64 — the top-5 should mostly
    // survive; at minimum the sets must intersect for every query
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    byQ.values.foreach { rs =>
      assert(rs.count(_.getAs[Boolean]("in_exact")) >= 1)
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to 5))
    }
  }

  // ---- Dedup.containmentScores ----

  test("containmentScores: full containment → ppm 1e6; disjoint → 0") {
    val docs = Seq(
      // id 0 (test): its single 4-gram is inside train doc 1
      (0L, "alpha beta gamma delta"),
      (1L, "alpha beta gamma delta epsilon zeta"),
      // id 20 (test): shares nothing with the train side
      (20L, "one two three four five")
    ).toDF("doc_id", "text")
    val out = Dedup.containmentScores(docs, "doc_id", "text",
        testPred = col("doc_id") % 20 === 0, n = 4)
      .orderBy("test_id").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("n_shingles") == 1L &&
      out(0).getAs[Long]("n_shared") == 1L)
    assert(out(1).getAs[Long]("n_shingles") == 2L &&
      out(1).getAs[Long]("n_shared") == 0L)
  }
}
