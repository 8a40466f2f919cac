package graft.functions

import graft.SparkSpec
import graft.core.Fuzz
import org.apache.spark.sql.functions._

class GraftFunctionsSpec extends SparkSpec {

  import spark.implicits._

  test("wratio native expression matches the scalar implementation") {
    val pairs = Seq(
      ("abc", "abc"), ("bc", "abcd"), ("dining", "monograph dining"),
      ("this is a test", "this is a test!"), ("", "x"), ("a-b", "a b"))
    val fromExpr = pairs.toDF("a", "b")
      .select(wratio(col("a"), col("b"))).as[Double].collect()
    pairs.map { case (a, b) => Fuzz.wratio(a, b) }.zip(fromExpr).foreach {
      case (scalar, expr) => assert(scalar == expr)
    }
  }

  test("wratio handles nulls (null-safe binary expression)") {
    val r = Seq((Option.empty[String], Option("x")))
      .toDF("a", "b").select(wratio(col("a"), col("b"))).collect()
    assert(r(0).isNullAt(0))
  }

  test("SQL registration via SparkSessionExtensions") {
    assert(spark.sql("SELECT wratio('abc', 'abc')").as[Double].head() == 100.0)
    assert(spark.sql("SELECT canon('  Jalan-Jalan  CAFE! ')").as[String].head()
      == "jalan jalan cafe")
    val d = spark.sql(
      "SELECT haversine_km(3.1390, 101.6869, 1.3521, 103.8198)").as[Double].head()
    assert(math.abs(d - 309.2526717524923) < 1e-9)
  }

  test("wratio participates in codegen (no UDF node in plan)") {
    val plan = Seq(("a", "b")).toDF("a", "b")
      .select(wratio(col("a"), col("b")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), s"UDF leaked into plan:\n$plan")
  }

  test("type check rejects non-strings") {
    intercept[Exception] {
      spark.sql("SELECT wratio(1, 2)").collect()
    }
  }

  test("dotq native expression matches the HOF form and registers in SQL") {
    val df = Seq(
      (Array(1L, 2L, 3L), Array(4L, -5L, 6L)),
      (Array(32768L, -32768L), Array(32768L, 32768L)),
      (Array.empty[Long], Array.empty[Long]))
      .toDF("a", "b")
    val hof = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0L), (acc, v) => acc + v)).as[Long].collect().toSeq
    val native = df.select(dotq(col("a"), col("b"))).as[Long].collect().toSeq
    assert(native == hof && native == Seq(12L, 0L, 0L))
    assert(spark.sql("SELECT dotq(array(1L, 2L), array(3L, 4L))").as[Long].head() == 11L)
    // null input -> null (null-safe binary expression)
    val r = Seq((Option.empty[Array[Long]], Option(Array(1L))))
      .toDF("a", "b").select(dotq(col("a"), col("b"))).collect()
    assert(r(0).isNullAt(0))
    // null ELEMENT -> null, matching the HOF fold it replaces (a raw
    // slot read would silently treat the null as 0)
    assert(spark.sql("SELECT dotq(array(1L, NULL), array(3L, 4L)) IS NULL")
      .as[Boolean].head())
    intercept[Exception] { spark.sql("SELECT dotq('x', 'y')").collect() }
    // length mismatch -> NULL, matching zip_with's null-padding (a
    // common-prefix dot would silently mask a dimension mismatch)
    assert(spark.sql("SELECT dotq(array(1L, 2L, 3L), array(3L, 4L)) IS NULL")
      .as[Boolean].head())
  }

  test("sq8 native expression matches the HOF formulation it replaced") {
    val df = Seq(
      Array(0.5f, -1.0f, 0.25f, 0.0f),
      Array(0.0f, 0.0f, 0.0f),           // zero vector -> zero codes
      Array(-2.0f, 1.0f, 0.5f),          // negative max-abs
      Array(3.0f, -1.5f)                 // -1.5*127/3 = -63.5: half away from zero
    ).toDF("v")
    // the exact pre-round-5 HOF form, kept as the semantic reference
    val hof = df
      .withColumn("mx", aggregate(col("v"), lit(0.0),
        (acc, x) => greatest(acc, abs(x.cast("double")))))
      .select(transform(col("v"), x =>
        when(col("mx") === 0.0, 0L)
          .otherwise(round(x.cast("double") * lit(127.0) / col("mx"))
            .cast("long"))))
      .as[Seq[Long]].collect().toSeq
    val native = df.select(sq8(col("v"))).as[Seq[Long]].collect().toSeq
    assert(native == hof)
    assert(native(3) == Seq(127L, -64L)) // away from zero, not half-up
    // SQL registration + codegen (no UDF node)
    assert(spark.sql("SELECT sq8(array(CAST(1.0 AS FLOAT), CAST(-0.5 AS FLOAT)))")
      .as[Seq[Long]].head() == Seq(127L, -64L))
    // null vector -> null; null ELEMENT -> null code, others quantized
    val r = Seq(Option.empty[Array[Float]]).toDF("v").select(sq8(col("v"))).collect()
    assert(r(0).isNullAt(0))
    val withNullElem = spark.sql(
      "SELECT sq8(array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)))")
      .collect()(0).getSeq[Any](0)
    assert(withNullElem == Seq(127L, null))
    intercept[Exception] { spark.sql("SELECT sq8(array(1.0, 2.0))").collect() }
  }

  test("VectorCentroid UDAF: integer mean per group, null/empty skipped, SQL-callable") {
    val df = Seq(
      (0, Seq(2L, 4L)), (0, Seq(5L, 8L)), (0, null: Seq[Long]),
      (1, Seq(10L, 20L)), (2, Seq.empty[Long]))
      .toDF("cid", "q")
    val out = df.groupBy("cid")
      .agg(VectorCentroid.centroid(col("q")).as("c"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    assert(out(0) == Seq(4L, 6L), s"round-half-up integer mean: $out") // (7/2, 12/2) -> (4, 6)
    assert(out(1) == Seq(10L, 20L))
    assert(out(2) == Seq.empty, "all-empty group yields an empty centroid")
    // and the same aggregator registered for SQL
    spark.udf.register("vec_centroid", org.apache.spark.sql.functions.udaf(VectorCentroid))
    df.createOrReplaceTempView("vc_in")
    val viaSql = spark.sql(
      "SELECT cid, vec_centroid(q) AS c FROM vc_in GROUP BY cid ORDER BY cid")
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    assert(viaSql == out)
  }

  test("CountMin UDAF registers for SQL and matches the column form") {
    val df = (1 to 100).map(i => s"k${i % 7}").toDF("k")
      .select(graft.ext.Dedup.tokenHash(col("k")).as("h"))
    val viaCol = df.agg(CountMin.cmsketch(col("h"), 2, 32)).as[Seq[Long]].head()
    spark.udf.register("cmsketch_2_32",
      org.apache.spark.sql.functions.udaf(new CountMin(2, 32)))
    df.createOrReplaceTempView("cms_in")
    val viaSql = spark.sql(
      "SELECT cmsketch_2_32(h, CAST(1 AS BIGINT)) FROM cms_in")
      .as[Seq[Long]].head()
    assert(viaCol == viaSql)
    assert(viaCol.sum == 200L) // 100 occurrences × depth 2
  }
}
