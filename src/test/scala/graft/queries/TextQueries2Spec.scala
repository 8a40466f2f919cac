package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextQueries2Spec extends SparkSpec {

  import spark.implicits._

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("redact replaces every email, URL, and phone with typed tags") {
    val rows = Seq(
      "write alice.smith+work@example.com and bob@sub.example.org",
      "see https://example.com/a/b?q=1 or http://x.example.net/y",
      "call +1 (555) 123-4567 or 020 7946 0958",
      "plain text with no pii at all")
      .toDF("text")
      .select(TextQueries2.redact(col("text")).as("r"))
      .as[String].collect()
    assert(rows(0) == "write <EMAIL> and <EMAIL>")
    assert(rows(1) == "see <URL> or <URL>")
    assert(rows(2) == "call <PHONE> or <PHONE>")
    assert(rows(3) == "plain text with no pii at all")
  }

  test("redaction is idempotent on already-redacted text") {
    val once = Seq("mail <EMAIL> at <URL> or <PHONE>").toDF("text")
      .select(TextQueries2.redact(col("text")).as("r")).as[String].head()
    assert(once == "mail <EMAIL> at <URL> or <PHONE>")
  }

  test("bigramsOf: empty and single-token docs yield no bigrams; order is preserved") {
    val out = Seq("", "one", "a b c d").toDF("text")
      .withColumn("toks", graft.ext.TextAnalysis.tokensCol(col("text")))
      .select(TextQueries2.bigramsOf(col("toks")).as("bg"))
      .as[Seq[String]].collect()
    assert(out(0).isEmpty && out(1).isEmpty)
    assert(out(2) == Seq("a b", "b c", "c d"))
  }

  test("gopher rules: prose keeps; repetition, short, and numeric docs drop") {
    val dir = tmpDir("gopherdocs")
    Seq(
      (1L, "the quick brown fox and a dog run to the park", "en", "s", 45L),
      (2L, "spam spam spam spam spam spam", "en", "s", 29L), // top-bigram mass 1.0
      (3L, "a b", "en", "s", 3L), // too few/too short words
      (4L, "12345 67890 99999 55555", "en", "s", 23L)) // no alphabetic words
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextQueries2.taGopher.run(spark, dir)
      .select("doc_id", "keep", "top_bigram_frac", "alpha_frac")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(rows(1L)._1 == 1, s"prose doc must keep: $rows")
    assert(rows(2L)._1 == 0 && rows(2L)._2 == 1.0, s"repetitive doc must drop: $rows")
    assert(rows(3L)._1 == 0)
    assert(rows(4L)._1 == 0 && rows(4L)._3 == 0.0, s"numeric doc must drop: $rows")
  }

  test("rarity: a doc of corpus-unique tokens outscores a doc of repeated common ones") {
    val dir = tmpDir("raritydocs")
    Seq(
      (1L, "common common common common", "en", "s", 27L),
      (2L, "common common common common", "en", "s", 27L),
      (3L, "zyzzyva quetzal axolotl", "en", "s", 23L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextQueries2.taRarity.run(spark, dir)
      .select("doc_id", "rarity").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // 11 tokens total: 'common' appears 8x (inv-freq 11/8), the rare ones 1x (11/1)
    assert(out(3L) > out(1L) * 5, s"rare vocabulary must outscore common: $out")
    assert(out(1L) == out(2L), "identical docs must score identically")
  }

  test("bm25 ranks a doc with more distinct query terms above a longer one-term doc") {
    // hand corpus: doc 1 has two query terms once each; doc 2 repeats one
    // term but is long (length normalization damps it); doc 3 has none
    val dir = tmpDir("bm25docs")
    Seq(
      (1L, "spark merge now", "en", "s", 15L),
      (2L, "scan scan scan scan scan filler filler filler filler filler filler filler", "en", "s", 70L),
      (3L, "nothing relevant here", "en", "s", 21L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextQueries2.taBm25.run(spark, dir)
      .select("doc_id", "rank").as[(Long, Int)].collect().toSeq
    assert(out.map(_._1).toSet == Set(1L, 2L))
    assert(out.find(_._1 == 1L).get._2 == 1, s"two-term doc should rank first: $out")
  }
}
