package graft.server

import graft.SparkSpec
import graft.core.Settings
import graft.etl.GazetteerBuilder
import graft.query.ScoutEngine
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets

class ScoutServerSpec extends SparkSpec {

  private lazy val server: ScoutServer = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType),
      StructField("tags", MapType(StringType, StringType)),
      StructField("wkt", StringType)))
    val rows = Seq(
      Row(1L, "Monograph Dining", Map("amenity" -> "restaurant"), "POINT(101.6869 3.139)"),
      Row(100L, "Malaysia", Map("boundary" -> "administrative", "admin_level" -> "2"),
        "POLYGON((99.6 0.8, 119.3 0.8, 119.3 7.4, 99.6 7.4, 99.6 0.8))"))
    val raw = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
    val engine = new ScoutEngine(spark,
      GazetteerBuilder.buildPois(raw), GazetteerBuilder.buildAdmin(raw), Settings())
    new ScoutServer(engine, port = 0).start() // ephemeral port
  }

  override def afterAll(): Unit = { server.stop(); super.afterAll() }

  private def http(method: String, path: String, body: String = null): (Int, String, Map[String, String]) = {
    val conn = URI.create(s"http://127.0.0.1:${server.boundPort}$path")
      .toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod(method)
    if (body != null) {
      conn.setDoOutput(true)
      conn.getOutputStream.write(body.getBytes(StandardCharsets.UTF_8))
    }
    val code = conn.getResponseCode
    val stream = if (code < 400) conn.getInputStream else conn.getErrorStream
    val text = new String(stream.readAllBytes(), StandardCharsets.UTF_8)
    val headers = Seq("Server-Timing", "X-Process-Time")
      .flatMap(h => Option(conn.getHeaderField(h)).map(h -> _)).toMap
    (code, text, headers)
  }

  test("healthz") {
    val (code, body, _) = http("GET", "/healthz")
    assert(code == 200 && body == """{"ok": true}""")
  }

  test("forward geocode over HTTP (README worked example shape)") {
    val (code, body, headers) = http("POST", "/v1/geocode/forward",
      """{"candidates":[{"text":"Monograph Dining"}],"country":"malaysia","limit":3}""")
    assert(code == 200, body)
    val hits = Json.parse(body).asObj("hits").asArr
    assert(hits.nonEmpty)
    val top = hits.head.asObj
    assert(top("name").asStr == "Monograph Dining")
    assert(top("osm_id").asNum == 1.0)
    assert(top("score").asNum > 0.5)
    assert(headers.contains("Server-Timing"), "timing instrumentation header")
  }

  test("openapi.json parses and describes the serving surface (reference /docs parity)") {
    val (code, body, _) = http("GET", "/openapi.json")
    assert(code == 200, body)
    val spec = Json.parse(body).asObj
    assert(spec("openapi").asStr.startsWith("3."))
    val info = spec("info").asObj
    assert(info("title").asStr == "scout" && info("version").asStr == "1.0.0")
    val paths = spec("paths").asObj
    for (p <- Seq("/v1/geocode/forward", "/v1/geocode/bulk",
        "/v1/geocode/reverse", "/healthz"))
      assert(paths.contains(p), s"openapi paths missing $p")
    // the reference's worked example travels with the spec (app.py:75-84)
    val example = paths("/v1/geocode/forward").asObj("post").asObj("requestBody")
      .asObj("content").asObj("application/json").asObj("examples").asObj("basic")
      .asObj("value").asObj
    assert(example("candidates").asArr.head.asObj("text").asStr == "Monograph Dining")
    assert(example("country").asStr == "my")
    // and the example is an ACCEPTED request: POST it verbatim
    val (c2, b2, _) = http("POST", "/v1/geocode/forward", Json.write(Json.Obj(Map(
      "candidates" -> example("candidates"),
      "country" -> example("country"),
      "limit" -> example("limit")))))
    assert(c2 == 200, b2)
  }

  test("docs page serves endpoint list as HTML") {
    val (code, body, _) = http("GET", "/docs")
    assert(code == 200)
    assert(body.contains("/openapi.json") && body.contains("/v1/geocode/forward")
      && body.contains("Monograph Dining"))
  }

  test("malformed body -> 422 with detail (not a crash)") {
    val (code, body, _) = http("POST", "/v1/geocode/forward", """{"nope": []}""")
    assert(code == 422 && body.contains("detail"))
  }

  test("wrong method -> 405") {
    val (code, _, _) = http("GET", "/v1/geocode/forward")
    assert(code == 405)
  }

  test("concurrent forward requests: correct results, no cross-request bleed") {
    // four distinguishable payloads — different filters and limits, so
    // any cross-request state bleed (settings closure, a shared temp
    // view, a swapped response) shows up as the WRONG body, not a flake
    val payloads = Seq(
      """{"candidates":[{"text":"Monograph Dining"}],"country":"malaysia","limit":3}""",
      """{"candidates":[{"text":"Monograph Dining"}],"limit":1}""",
      """{"candidates":[{"text":"zzz qqq"}],"limit":2}""",
      """{"candidates":[]}""")
    val expected = payloads.map(p => http("POST", "/v1/geocode/forward", p))
    expected.foreach { case (code, body, _) => assert(code == 200, body) }
    assert(Json.parse(expected.head._2).asObj("hits").asArr.nonEmpty)
    assert(Json.parse(expected(2)._2).asObj("hits").asArr.isEmpty)
    val exec = java.util.concurrent.Executors.newFixedThreadPool(16)
    try {
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration._
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(exec)
      val storm = (0 until 32).map { i =>
        Future((i % payloads.length, http("POST", "/v1/geocode/forward",
          payloads(i % payloads.length))))
      }
      Await.result(Future.sequence(storm), 120.seconds).foreach {
        case (pi, (code, body, _)) =>
          assert(code == 200, body)
          assert(body == expected(pi)._2,
            s"response for payload $pi diverged under concurrency")
      }
    } finally exec.shutdown()
  }

  test("bulk geocode equals a per-request loop, in request order") {
    val texts = Seq("Monograph Dining", "zzz qqq", "Monograph Dining")
    val (code, body, headers) = http("POST", "/v1/geocode/bulk",
      s"""{"queries":[${texts.map(t => s"""{"text":"$t"}""").mkString(",")}],"limit":3}""")
    assert(code == 200, body)
    assert(headers.contains("Server-Timing"))
    val results = Json.parse(body).asObj("results").asArr.map(_.asObj)
    assert(results.map(_("text").asStr) == texts, "results ride in request order")
    // parity: each entry's hits equal a hint-less single-candidate
    // forward request for the same text
    texts.zip(results).foreach { case (t, r) =>
      val (fc, fb, _) = http("POST", "/v1/geocode/forward",
        s"""{"candidates":[{"text":"$t"}],"limit":3}""")
      assert(fc == 200, fb)
      assert(Json.write(Json.Arr(r("hits").asArr)) ==
        Json.write(Json.Arr(Json.parse(fb).asObj("hits").asArr)),
        s"bulk hits for '$t' diverge from the per-request path")
    }
    assert(results.head("hits").asArr.nonEmpty)
    assert(results(1)("hits").asArr.isEmpty)
  }

  test("bulk malformed body -> 422; wrong method -> 405") {
    val (code, body, _) = http("POST", "/v1/geocode/bulk", """{"nope": []}""")
    assert(code == 422 && body.contains("detail"))
    val (mcode, _, _) = http("GET", "/v1/geocode/bulk")
    assert(mcode == 405)
  }

  test("reverse geocode over HTTP: nearest POI with distance; empty-area point -> null hit") {
    // point right next to the only POI; second point in the open ocean
    val (code, body, _) = http("POST", "/v1/geocode/reverse",
      """{"points":[{"lat": 3.14, "lon": 101.69}, {"lat": -60.0, "lon": -150.0}]}""")
    assert(code == 200, body)
    val results = Json.parse(body).asObj("results").asArr
    assert(results.size == 2)
    val hit = results.head.asObj("hit").asObj
    assert(hit("name").asStr == "Monograph Dining")
    assert(hit("osm_id") match { case Json.Num(d) => d == 1.0; case _ => false })
    assert(hit.get("dist_km").exists { case Json.Num(d) => d >= 0 && d < 2; case _ => false })
    assert(!hit.contains("score"), "reverse hits rank by distance, not score")
    assert(results(1).asObj("hit") == Json.Null)
  }

  test("reverse malformed body -> 422; wrong method -> 405") {
    val (c1, b1, _) = http("POST", "/v1/geocode/reverse", """{"points": "nope"}""")
    assert(c1 == 422 && b1.contains("detail"))
    val (c2, _, _) = http("GET", "/v1/geocode/reverse")
    assert(c2 == 405)
  }

  test("json codec round-trips escapes") {
    val v = Json.parse("""{"a": "line\nbreak \"q\" é", "n": [1, 2.5, -3e2], "b": true, "x": null}""")
    val round = Json.parse(Json.write(v))
    assert(round == v)
    assert(v.asObj("a").asStr == "line\nbreak \"q\" é")
    assert(v.asObj("n").asArr.map(_.asNum) == Seq(1.0, 2.5, -300.0))
  }
}
