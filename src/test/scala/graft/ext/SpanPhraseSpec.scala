package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Exact substring-span dedup and positional phrase search. */
class SpanPhraseSpec extends SparkSpec {

  import spark.implicits._

  test("spanHashes emits one 1-based window per position, none below k") {
    val docs = Seq((1L, "a b c d"), (2L, "a b"), (3L, "")).toDF("doc_id", "text")
    val spans = Dedup.spanHashes(docs, "doc_id", "text", 3)
      .orderBy("id", "pos").collect()
    assert(spans.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 1L), (1L, 2L)))
  }

  test("identical spans hash identically across documents") {
    val docs = Seq((1L, "x y z tail one"), (2L, "head x y z two")).toDF("doc_id", "text")
    val h = Dedup.spanHashes(docs, "doc_id", "text", 3)
      .groupBy("whash").agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).count()
    assert(h == 1) // exactly the shared "x y z" window
  }

  test("spanDupProfile: clones fully duplicated, unique doc untouched, within-doc repeat counts") {
    val docs = Seq(
      (1L, "p q r s t"), (2L, "p q r s t"),      // clones: every span repeated
      (3L, "u v w x y"),                          // unique
      (4L, "m n o m n o m n o")                   // self-repeating spans
    ).toDF("doc_id", "text")
    val prof = Dedup.spanDupProfile(Dedup.spanHashes(docs, "doc_id", "text", 3))
      .orderBy("id").collect()
    assert(prof.map(_.getDouble(3)).take(3).toSeq == Seq(1.0, 1.0, 0.0))
    // doc 4: windows at pos 1/4 ("m n o") and 2/5 ("n o m") and 3/6
    // ("o m n") each recur within the doc; the last window (pos 7) is
    // "m n o" again — all 7 spans duplicated
    assert(prof(3).getLong(1) == 7 && prof(3).getDouble(3) == 1.0)
  }

  test("spanRemovalCounts unions overlapping spans — no double counting") {
    val docs = Seq(
      (1L, "m n o m n o m n o"),   // every 3-span duplicated → all 9 covered
      (2L, "x y z tail filler"),   // shares only "x y z" with doc 3
      (3L, "head x y z other")
    ).toDF("doc_id", "text")
    val removed = Dedup.spanRemovalCounts(
      Dedup.spanHashes(docs, "doc_id", "text", 3), 3)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    // doc 1: 7 duplicated spans covering positions 1..9 exactly once
    // docs 2/3: one shared span → 3 covered positions each
    assert(removed.toSeq == Seq((1L, 9L), (2L, 3L), (3L, 3L)))
  }

  test("phraseSearch finds every occurrence at its anchor position") {
    val docs = Seq(
      (1L, "slow hash batch then slow hash batch"),
      (2L, "slow hash only"),
      (3L, "hash batch slow")).toDF("doc_id", "text")
    val hits = TextAnalysis.phraseSearch(
      TextAnalysis.positionalPostings(docs, "doc_id", "text"),
      Seq("slow", "hash", "batch"))
      .orderBy("id", "pos").collect()
    assert(hits.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 1L), (1L, 5L)))
  }

  test("single-term phrase degrades to a postings filter") {
    val docs = Seq((1L, "a b a")).toDF("doc_id", "text")
    val hits = TextAnalysis.phraseSearch(
      TextAnalysis.positionalPostings(docs, "doc_id", "text"), Seq("a"))
      .orderBy("pos").collect()
    assert(hits.map(_.getLong(1)).toSeq == Seq(1L, 3L))
  }

  test("phraseSearch plan is equality joins only — no product join") {
    val docs = Seq((1L, "slow hash batch")).toDF("doc_id", "text")
    val plan = TextAnalysis.phraseSearch(
      TextAnalysis.positionalPostings(docs, "doc_id", "text"),
      Seq("slow", "hash", "batch"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "phraseSearch plan has a cartesian")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "phraseSearch plan has a BNL")
  }
}
