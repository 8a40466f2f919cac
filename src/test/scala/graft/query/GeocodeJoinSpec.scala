package graft.query

import graft.SparkSpec
import graft.core.{Norm, Settings}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class GeocodeJoinSpec extends SparkSpec {

  import spark.implicits._

  private lazy val pois = Seq(
    (1L, "Monograph Dining", null, "monograph dining", "", "amenity:restaurant", 0.6, 3.139, 101.6869),
    (2L, "Monogram Cafe", null, "monogram cafe", "", "amenity:cafe", 0.2, 3.15, 101.71),
    (3L, "Red Widget Store", null, "red widget store", "", "shop:store", 0.1, 1.30, 103.85),
    (4L, "Widget Outlet", "The Widget", "widget outlet", "the widget", "shop:outlet", 0.1, 1.31, 103.86)
  ).toDF("osm_id", "name_local", "name_en", "name_local_norm", "name_en_norm",
    "kind", "importance", "lat", "lon")

  test("bulk geocode join ranks per query like the request path") {
    val queries = Seq((10L, "monograph dining"), (20L, "widget")).toDF("qid", "text")
    val hits = GeocodeJoin.topK(queries, pois, Settings(), k = 3).collect()
      .groupBy(_.getLong(0))
    assert(hits(10L).head.getLong(6) == 1L) // top hit for monograph dining
    val widgetIds = hits(20L).map(_.getLong(6)).toSet
    assert(widgetIds == Set(3L, 4L)) // both widget names, ranked
    // ranks are 1..n within each query
    assert(hits(20L).map(_.getInt(2)).sorted.toSeq == Seq(1, 2))
  }

  test("empty/no-match queries produce no rows, others unaffected") {
    val queries = Seq((1L, "zzz qqq"), (2L, "  !! "), (3L, "cafe")).toDF("qid", "text")
    val hits = GeocodeJoin.topK(queries, pois, Settings(), k = 3).collect()
    assert(hits.map(_.getLong(0)).toSet == Set(3L))
  }

  test("topKIndexed equals topK, including the short-token fallback path") {
    val ix = graft.etl.TrigramIndex.build(pois)
    val queries = Seq(
      (10L, "monograph dining"),   // all tokens indexable
      (20L, "widget"),             // single indexable token, 2 candidates
      (30L, "kl cafe"),            // 'kl' < gram size -> broadcast fallback
      (40L, "zzz qqq"),            // no match on either path
      (50L, "the widget")          // matches via name_en_norm column
    ).toDF("qid", "text")
    val a = GeocodeJoin.topK(queries, pois, Settings(), k = 3)
      .orderBy("qid", "rank").collect().toSeq
    val b = GeocodeJoin.topKIndexed(queries, pois, ix, Settings(), k = 3)
      .orderBy("qid", "rank").collect().toSeq
    assert(a == b)
    assert(a.nonEmpty && a.exists(_.getLong(0) == 50L))
  }

  test("all-short-token residue above the broadcast cap: partitioned NL, nothing broadcast") {
    val ix = graft.etl.TrigramIndex.build(pois)
    // every token under the gram size -> pure fallback residue
    val queries = Seq((10L, "mo"), (20L, "ca"), (30L, "x y")).toDF("qid", "text")
    val guarded = GeocodeJoin.topKIndexed(queries, pois, ix, Settings(), k = 3,
      maxFallbackBroadcast = 0L)
    val plan = guarded.queryExecution.executedPlan.toString
    assert(plan.contains("CartesianProduct"),
      s"expected the partitioned shuffle_replicate_nl route:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"query side must not broadcast above the cap:\n$plan")
    // and the guarded route returns exactly the broadcast-path answer
    val a = GeocodeJoin.topK(queries, pois, Settings(), k = 3)
      .orderBy("qid", "rank").collect().toSeq
    assert(guarded.orderBy("qid", "rank").collect().toSeq == a && a.nonEmpty)
  }

  test("mixed short+long tokens ride the index (no fallback), short tokens re-verified") {
    val ix = graft.etl.TrigramIndex.build(pois)
    // 'kl' is sub-gram; 'cafe' indexes. The exact predicate must still
    // enforce the short token: only 'monogram cafe' contains both.
    val queries = Seq((1L, "kl cafe"), (2L, "am cafe")).toDF("qid", "text")
    val hits = GeocodeJoin.topKIndexed(queries, pois, ix, Settings(), k = 3,
      maxFallbackBroadcast = 0L) // cap 0: any fallback use would go NL
    val plan = hits.queryExecution.executedPlan.toString
    val got = hits.collect().map(r => (r.getLong(0), r.getLong(6))).toSet
    assert(got == Set((2L, 2L))) // 'am cafe' ⊂ monogram cafe; 'kl cafe' matches nothing
    // the residue is empty, so nothing needed the nested-loop route
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("pair bounds: df-cut + above-count cap reproduce the unbounded answer exactly") {
    val ix = graft.etl.TrigramIndex.build(pois)
    val queries = Seq(
      (10L, "monograph dining"), (20L, "widget"), (30L, "kl cafe"), (50L, "the widget")
    ).toDF("qid", "text")
    val a = GeocodeJoin.topK(queries, pois, Settings(), k = 3)
      .orderBy("qid", "rank").collect().toSeq
    // maxDf=1 forces the rarest-gram fallback on every token; cap 100 is
    // far above any query's candidate count -> bit-identical output
    val b = GeocodeJoin.topKIndexed(queries, pois, ix, Settings(), k = 3,
      maxDf = 1L, maxCandidatesPerQuery = 100)
      .orderBy("qid", "rank").collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("cap below the candidate count sheds far-length candidates deterministically") {
    val ix = graft.etl.TrigramIndex.build(pois)
    val queries = Seq((20L, "widget")).toDF("qid", "text")
    // 'widget' verifies against osm_id 3 ('red widget store', len 16) and
    // 4 (en 'the widget', len 10). qnorm len 6 -> length distances 10 vs 4:
    // cap=1 must keep osm_id 4 only.
    val got = GeocodeJoin.topKIndexed(queries, pois, ix, Settings(), k = 3,
      maxCandidatesPerQuery = 1).collect()
    assert(got.length == 1 && got.head.getLong(6) == 4L)
  }

  test("cap compiles to a WindowGroupLimit prune (skew-bounded, pre-sort shed)") {
    val ix = graft.etl.TrigramIndex.build(pois)
    val queries = Seq((10L, "monograph dining"), (20L, "widget")).toDF("qid", "text")
    val plan = GeocodeJoin.topKIndexed(queries, pois, ix, Settings(), k = 3,
      maxCandidatesPerQuery = 5).queryExecution.executedPlan.toString
    // the rank<=cap filter must lower to the group-limit operator in
    // BOTH modes: Partial (pre-shuffle, sheds a skewed text's
    // candidates where its rows sit) and Final — not a full per-group
    // sort+filter
    assert(plan.contains("Partial") && "WindowGroupLimit[^\\n]*5, Partial".r
      .findFirstIn(plan).isDefined, s"no pre-shuffle WindowGroupLimit Partial in:\n$plan")
    assert("WindowGroupLimit[^\\n]*5, Final".r.findFirstIn(plan).isDefined,
      s"no WindowGroupLimit Final in:\n$plan")
  }

  test("normCol matches the scalar norm (distributed query normalization)") {
    val samples = Seq("Jalan-Jalan Cafe!", "a#b@c", "  MixED   spacing ", "it's") ++
      Gen.listOfN(100, Gen.asciiPrintableStr).pureApply(Gen.Parameters.default, Seed(11L))
    val colForm = samples.toDF("s").select(Norm.normCol(col("s"))).as[String].collect()
    samples.zip(colForm).foreach { case (in, c) =>
      assert(Norm.norm(in) == c, s"for input ${in.map(_.toInt)}")
    }
  }
}
