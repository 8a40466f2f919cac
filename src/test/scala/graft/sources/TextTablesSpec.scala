package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextTablesSpec extends SparkSpec {

  import spark.implicits._

  // adversarial payloads: delimiters, quotes, newline, unicode, null
  private lazy val tricky = Seq(
    (1L, "plain text", "en"),
    (2L, "comma, semicolon; pipe|", "en"),
    (3L, "says \"quoted\" and \\backslash\\", "de"),
    (4L, "line one\nline two", "de"),
    (5L, "unicode: häuser 北京 مرحبا", "ar"),
    (6L, null: String, "en")
  ).toDF("doc_id", "text", "lang")

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  // name/type signature — file sources mark every column nullable, so
  // raw StructType equality would fail on nullability alone
  private def sig(df: org.apache.spark.sql.DataFrame): Seq[(String, String)] =
    df.schema.fields.toSeq.map(f => f.name -> f.dataType.sql)

  test("jsonl round-trip preserves every row including newlines, quotes, unicode, null") {
    val dir = s"${tmp("jsonl")}/docs"
    TextTables.writeJsonl(tricky, dir)
    val back = TextTables.readJsonl(spark, tricky.schema, dir)
    assert(sig(back) == sig(tricky))
    assert(back.orderBy("doc_id").collect().toSeq ==
      tricky.orderBy("doc_id").collect().toSeq)
  }

  test("csv round-trip with RFC-4180 escaping preserves every row") {
    val dir = s"${tmp("csv")}/docs"
    TextTables.writeCsv(tricky, dir)
    val back = TextTables.readCsv(spark, tricky.schema, dir)
    assert(sig(back) == sig(tricky))
    assert(back.orderBy("doc_id").collect().toSeq ==
      tricky.orderBy("doc_id").collect().toSeq)
  }

  test("partitioned parquet layout prunes non-matching partitions at scan time") {
    val dir = s"${tmp("part")}/docs"
    TextTables.writePartitioned(tricky, dir, "lang")
    val read = TextTables.readPartitioned(spark, dir).filter(col("lang") === "de")
    assert(read.count() == 2)
    // the filter must reach the scan as a PARTITION filter (directory
    // pruning), not a post-scan data filter
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("lang"),
      s"lang filter must prune partitions:\n$plan")
    // and the pruned directories must not be listed as inputs
    val inputs = read.queryExecution.executedPlan.collectLeaves().toString
    assert(!inputs.contains("lang=ar") || !plan.contains("lang=ar"))
  }

  test("orc round-trip preserves every row; filter and projection reach the ORC scan") {
    val dir = s"${tmp("orc")}/docs"
    TextTables.writeOrc(tricky, dir)
    val back = TextTables.readOrc(spark, tricky.schema, dir)
    assert(sig(back) == sig(tricky))
    assert(back.orderBy("doc_id").collect().toSeq ==
      tricky.orderBy("doc_id").collect().toSeq)
    val q = back.filter(col("doc_id") > 3).select("doc_id", "lang")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("doc_id"),
      s"doc_id filter must push to the ORC scan:\n$plan")
    assert(!plan.replaceAll("(?s).*ReadSchema: ([^\\n]*).*", "$1").contains("text"),
      s"unprojected text column must be pruned from the ORC read:\n$plan")
  }
}
