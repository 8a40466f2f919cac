package graft.server

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.query.{ForwardCandidate, ForwardReq, Hit, ScoutEngine}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

/** HTTP serving layer (reference: `app.py`) on the JDK's built-in
  * HttpServer — zero dependencies:
  *
  *   - `POST /v1/geocode/forward` with the reference's request shape
  *     (`{candidates:[{text}], country?, city_hint?, limit?}` →
  *     `{hits:[{name,lat,lon,country,state,city,osm_id,kind,score}]}`,
  *     `app.py:14-38`)
  *   - `GET /healthz` → `{"ok": true}` (`app.py:116-118`)
  *   - `Server-Timing: app;dur=<ms>` + `X-Process-Time` response headers
  *     (`app.py:58-65`)
  *
  * One engine (one SparkSession, cached gazetteer) serves all requests —
  * the Spark replacement for the reference's per-request read-only
  * connections (SURVEY.md §3.3).
  */
class ScoutServer(engine: ScoutEngine, port: Int = 8000, threads: Int = 8) {

  import Json._

  private val server = HttpServer.create(new InetSocketAddress(port), 0)
  // Real request concurrency: SparkSession is thread-safe and concurrent
  // collect()s schedule as concurrent jobs over the shared cached
  // gazetteer (local[32] and any real cluster both overlap them), and
  // the engine keeps no per-request mutable state (no temp views; the
  // settings closure is immutable) — serializing on one dispatcher
  // thread would queue every request behind the slowest one.
  private val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
  server.setExecutor(pool)

  def boundPort: Int = server.getAddress.getPort

  private def respond(ex: HttpExchange, code: Int, body: String,
                      startedNs: Long): Unit = {
    val ms = (System.nanoTime() - startedNs) / 1e6
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.getResponseHeaders.set("Server-Timing", f"app;dur=$ms%.1f")
    ex.getResponseHeaders.set("X-Process-Time", f"$ms%.1f")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def parseReq(body: String): ForwardReq = {
    val o = Json.parse(body).asObj
    ForwardReq(
      candidates = o("candidates").asArr
        .map(c => ForwardCandidate(c.asObj("text").asStr)),
      country = o.get("country").collect { case Str(s) => s },
      cityHint = o.get("city_hint").collect { case Str(s) => s },
      limit = o.get("limit").collect { case Num(d) => d.toInt }.getOrElse(5))
  }

  private def hitJson(h: Hit): Value = Obj(Map(
    "name" -> Str(h.name),
    "lat" -> Num(h.lat),
    "lon" -> Num(h.lon),
    "country" -> h.country.map(Str).getOrElse(Null),
    "state" -> h.state.map(Str).getOrElse(Null),
    "city" -> h.city.map(Str).getOrElse(Null),
    "osm_id" -> Num(h.osmId.toDouble),
    "kind" -> Str(h.kind),
    "score" -> Num(h.score)))

  server.createContext("/healthz", new HttpHandler {
    override def handle(ex: HttpExchange): Unit = {
      val t0 = System.nanoTime()
      respond(ex, 200, """{"ok": true}""", t0)
    }
  })

  /** OpenAPI description of the serving surface (reference parity:
    * FastAPI auto-serves `/openapi.json` + `/docs` — `app.py:41` title
    * and version, `app.py:75-84` the worked forward example). Static
    * document — the contract is fixed at compile time, exactly like the
    * reference's pydantic models. */
  server.createContext("/openapi.json", new HttpHandler {
    override def handle(ex: HttpExchange): Unit = {
      val t0 = System.nanoTime()
      if (ex.getRequestMethod != "GET")
        respond(ex, 405, """{"detail": "Method Not Allowed"}""", t0)
      else respond(ex, 200, ScoutServer.openApiJson, t0)
    }
  })

  /** Minimal human-readable docs page (the `/docs` slot): zero-egress
    * stand-in for Swagger UI — endpoint list, the worked request, and a
    * link to the machine-readable spec. */
  server.createContext("/docs", new HttpHandler {
    override def handle(ex: HttpExchange): Unit = {
      val t0 = System.nanoTime()
      if (ex.getRequestMethod != "GET") {
        respond(ex, 405, """{"detail": "Method Not Allowed"}""", t0)
        return
      }
      val bytes = ScoutServer.docsHtml.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", "text/html; charset=utf-8")
      // duration measured at write time, like respond() does
      ex.getResponseHeaders.set("Server-Timing",
        f"app;dur=${(System.nanoTime() - t0) / 1e6}%.1f")
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    }
  })

  server.createContext("/v1/geocode/forward", new HttpHandler {
    override def handle(ex: HttpExchange): Unit = {
      val t0 = System.nanoTime()
      if (ex.getRequestMethod != "POST") {
        respond(ex, 405, """{"detail": "Method Not Allowed"}""", t0)
        return
      }
      try {
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        val req = parseReq(body)
        val hits = engine.forward(req)
        respond(ex, 200, write(Obj(Map("hits" -> Arr(hits.map(hitJson))))), t0)
      } catch {
        case e: Exception =>
          respond(ex, 422, write(Obj(Map("detail" -> Str(
            Option(e.getMessage).getOrElse(e.getClass.getSimpleName))))), t0)
      }
    }
  })

  /** BULK endpoint: the reference's forward request shape, list-valued —
    * `{queries:[{text}], limit?}` → `{results:[{text, hits:[...]}]}`,
    * results in request order. One distributed job serves the whole
    * list ([[ScoutEngine.bulk]]), amortizing the per-request job floor
    * the serving profile measured; each entry's hits equal a hint-less
    * single-candidate `/v1/geocode/forward` call (spec-pinned). */
  server.createContext("/v1/geocode/bulk", new HttpHandler {
    override def handle(ex: HttpExchange): Unit = {
      val t0 = System.nanoTime()
      if (ex.getRequestMethod != "POST") {
        respond(ex, 405, """{"detail": "Method Not Allowed"}""", t0)
        return
      }
      try {
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        val o = Json.parse(body).asObj
        val texts = o("queries").asArr.map(q => q.asObj("text").asStr)
        val limit = o.get("limit").collect { case Num(d) => d.toInt }.getOrElse(5)
        val results = engine.bulk(texts, limit)
        respond(ex, 200, write(Obj(Map("results" -> Arr(
          texts.zip(results).map { case (t, hits) =>
            Obj(Map("text" -> Str(t), "hits" -> Arr(hits.map(hitJson))))
          })))), t0)
      } catch {
        case e: Exception =>
          respond(ex, 422, write(Obj(Map("detail" -> Str(
            Option(e.getMessage).getOrElse(e.getClass.getSimpleName))))), t0)
      }
    }
  })

  /** REVERSE endpoint — the spatial complement the reference lacks:
    * `{points:[{lat, lon}]}` → `{results:[{lat, lon, hit: {...,
    * dist_km} | null}]}` in request order; the whole point list serves
    * as one distributed grid join ([[ScoutEngine.reverse]]). */
  server.createContext("/v1/geocode/reverse", new HttpHandler {
    override def handle(ex: HttpExchange): Unit = {
      val t0 = System.nanoTime()
      if (ex.getRequestMethod != "POST") {
        respond(ex, 405, """{"detail": "Method Not Allowed"}""", t0)
        return
      }
      try {
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        val o = Json.parse(body).asObj
        val pts = o("points").asArr.map { p =>
          val po = p.asObj
          (po("lat") match { case Num(d) => d; case v => sys.error(s"bad lat: $v") },
            po("lon") match { case Num(d) => d; case v => sys.error(s"bad lon: $v") })
        }
        val results = engine.reverse(pts)
        respond(ex, 200, write(Obj(Map("results" -> Arr(
          pts.zip(results).map { case ((la, lo), r) =>
            Obj(Map("lat" -> Num(la), "lon" -> Num(lo),
              "hit" -> r.map { case (h, dist) =>
                val Obj(m) = hitJson(h): @unchecked
                Obj(m - "score" + ("dist_km" -> Num(dist)))
              }.getOrElse(Null)))
          })))), t0)
      } catch {
        case e: Exception =>
          respond(ex, 422, write(Obj(Map("detail" -> Str(
            Option(e.getMessage).getOrElse(e.getClass.getSimpleName))))), t0)
      }
    }
  })

  def start(): ScoutServer = { server.start(); this }
  def stop(): Unit = { server.stop(0); pool.shutdown() }
}

object ScoutServer {

  /** OpenAPI 3.0 document for the four endpoints. The forward example
    * is the reference's worked request (`app.py:75-84`: Monograph
    * Dining, country "my", limit 3) so a client generator or curl user
    * gets the same first query either way. */
  val openApiJson: String =
    """{
      |  "openapi": "3.0.3",
      |  "info": {"title": "scout", "version": "1.0.0"},
      |  "paths": {
      |    "/v1/geocode/forward": {
      |      "post": {
      |        "summary": "Name → lat/lon",
      |        "tags": ["geocoding"],
      |        "requestBody": {"required": true, "content": {"application/json": {
      |          "schema": {"$ref": "#/components/schemas/ForwardReq"},
      |          "examples": {"basic": {
      |            "summary": "Restaurant by country",
      |            "value": {"candidates": [{"text": "Monograph Dining"}],
      |                      "country": "my", "limit": 3}}}}}},
      |        "responses": {
      |          "200": {"description": "Ranked hits", "content": {"application/json": {
      |            "schema": {"$ref": "#/components/schemas/ForwardResp"}}}},
      |          "422": {"description": "Validation error", "content": {"application/json": {
      |            "schema": {"$ref": "#/components/schemas/Error"}}}}}}},
      |    "/v1/geocode/bulk": {
      |      "post": {
      |        "summary": "Batch forward geocode (one distributed job)",
      |        "tags": ["geocoding"],
      |        "requestBody": {"required": true, "content": {"application/json": {
      |          "schema": {"$ref": "#/components/schemas/BulkReq"}}}},
      |        "responses": {
      |          "200": {"description": "Per-query hits in request order",
      |            "content": {"application/json": {
      |              "schema": {"$ref": "#/components/schemas/BulkResp"}}}},
      |          "422": {"description": "Validation error", "content": {"application/json": {
      |            "schema": {"$ref": "#/components/schemas/Error"}}}}}}},
      |    "/v1/geocode/reverse": {
      |      "post": {
      |        "summary": "lat/lon → nearest place",
      |        "tags": ["geocoding"],
      |        "requestBody": {"required": true, "content": {"application/json": {
      |          "schema": {"$ref": "#/components/schemas/ReverseReq"}}}},
      |        "responses": {
      |          "200": {"description": "Nearest hit (or null) per point in request order",
      |            "content": {"application/json": {
      |              "schema": {"$ref": "#/components/schemas/ReverseResp"}}}},
      |          "422": {"description": "Validation error", "content": {"application/json": {
      |            "schema": {"$ref": "#/components/schemas/Error"}}}}}}},
      |    "/healthz": {
      |      "get": {
      |        "summary": "Liveness",
      |        "responses": {"200": {"description": "ok", "content": {"application/json": {
      |          "schema": {"type": "object",
      |            "properties": {"ok": {"type": "boolean"}}}}}}}}}
      |  },
      |  "components": {"schemas": {
      |    "ForwardCandidate": {"type": "object", "required": ["text"],
      |      "properties": {"text": {"type": "string"}}},
      |    "ForwardReq": {"type": "object", "required": ["candidates"],
      |      "properties": {
      |        "candidates": {"type": "array",
      |          "items": {"$ref": "#/components/schemas/ForwardCandidate"}},
      |        "country": {"type": "string", "nullable": true},
      |        "city_hint": {"type": "string", "nullable": true},
      |        "limit": {"type": "integer", "default": 5}}},
      |    "Hit": {"type": "object",
      |      "required": ["name", "lat", "lon", "osm_id", "kind", "score"],
      |      "properties": {
      |        "name": {"type": "string"},
      |        "lat": {"type": "number"},
      |        "lon": {"type": "number"},
      |        "country": {"type": "string", "nullable": true},
      |        "state": {"type": "string", "nullable": true},
      |        "city": {"type": "string", "nullable": true},
      |        "osm_id": {"type": "integer"},
      |        "kind": {"type": "string"},
      |        "score": {"type": "number"}}},
      |    "ForwardResp": {"type": "object", "properties": {
      |      "hits": {"type": "array", "items": {"$ref": "#/components/schemas/Hit"}}}},
      |    "BulkReq": {"type": "object", "required": ["queries"],
      |      "properties": {
      |        "queries": {"type": "array",
      |          "items": {"$ref": "#/components/schemas/ForwardCandidate"}},
      |        "limit": {"type": "integer", "default": 5}}},
      |    "BulkResp": {"type": "object", "properties": {
      |      "results": {"type": "array", "items": {"type": "object", "properties": {
      |        "text": {"type": "string"},
      |        "hits": {"type": "array",
      |          "items": {"$ref": "#/components/schemas/Hit"}}}}}}},
      |    "ReverseReq": {"type": "object", "required": ["points"],
      |      "properties": {"points": {"type": "array", "items": {
      |        "type": "object", "required": ["lat", "lon"], "properties": {
      |          "lat": {"type": "number"}, "lon": {"type": "number"}}}}}},
      |    "ReverseResp": {"type": "object", "properties": {
      |      "results": {"type": "array", "items": {"type": "object", "properties": {
      |        "lat": {"type": "number"}, "lon": {"type": "number"},
      |        "hit": {"nullable": true, "allOf": [
      |          {"$ref": "#/components/schemas/Hit"}]}}}}}},
      |    "Error": {"type": "object",
      |      "properties": {"detail": {"type": "string"}}}
      |  }}
      |}""".stripMargin

  val docsHtml: String =
    """<!doctype html><html><head><meta charset="utf-8"><title>scout — API docs</title>
      |<style>body{font-family:sans-serif;max-width:46em;margin:2em auto;padding:0 1em}
      |code,pre{background:#f4f4f4;padding:2px 4px;border-radius:3px}</style></head><body>
      |<h1>scout <small>1.0.0</small></h1>
      |<p>Machine-readable spec: <a href="/openapi.json">/openapi.json</a></p>
      |<h2>POST /v1/geocode/forward</h2><p>Name &rarr; lat/lon.</p>
      |<pre>curl -s -X POST http://HOST:PORT/v1/geocode/forward \
      |  -d '{"candidates":[{"text":"Monograph Dining"}],"country":"my","limit":3}'</pre>
      |<h2>POST /v1/geocode/bulk</h2>
      |<p>Batch forward geocode: <code>{"queries":[{"text":"..."}],"limit":5}</code></p>
      |<h2>POST /v1/geocode/reverse</h2>
      |<p>lat/lon &rarr; nearest place: <code>{"points":[{"lat":3.15,"lon":101.7}]}</code></p>
      |<h2>GET /healthz</h2><p>Liveness: <code>{"ok": true}</code></p>
      |</body></html>""".stripMargin
}
