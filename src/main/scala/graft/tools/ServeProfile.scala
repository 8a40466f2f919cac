package graft.tools

import graft.query.{ForwardCandidate, ForwardReq}
import graft.queries.Fixtures
import org.apache.spark.sql.SparkSession

/** Serving-path latency profile (VERDICT r7 task 8): per-request
  * wall-clock distributions for `ScoutEngine.forward` on the SCAN tier
  * (token-containment filter over the cached gazetteer) vs the INDEXED
  * tier (trigram posting intersection + re-verify) at a given SF dir.
  *
  * `runMain graft.tools.ServeProfile [sfDir] [nRequests]` — prints a
  * p50/p95/mean table and one JSON line for the record in SCALE.md.
  * The workload is REAL gazetteer names (sampled deterministically by
  * osm_id) issued as full-text and first-token requests — the two
  * request shapes the reference's own test corpus exercises — after a
  * one-pass warmup so the numbers measure serving, not fixture build
  * or codegen.
  */
object ServeProfile {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nReq = if (args.length > 1) args(1).toInt else 60
    val spark = graft.Boot.master(SparkSession.builder(), s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val scanEngine = Fixtures.gazEngine(spark, sfDir)
    val indexedEngine = Fixtures.gazEngineIndexed(spark, sfDir)

    // deterministic request mix from the corpus itself: every 7th
    // gazetteer name (full text) and its first token (partial match —
    // the harder, wider-candidate shape)
    val names = Fixtures.gazPois(spark, sfDir, withWikidata = true)
      .select("osm_id", "name_local").orderBy("osm_id")
      .collect().map(_.getString(1)).filter(_ != null)
    val sampled = names.indices.collect { case i if i % 7 == 0 => names(i) }
    // INTERLEAVE the two shapes so take(nReq) keeps the mix — appending
    // the partial-token shape after all full names would profile only
    // the easy narrow-candidate shape at any realistic corpus size
    val texts = sampled.flatMap(n => Seq(n, n.split("\\s+").head))
      .filter(_.nonEmpty).distinct.take(nReq).toSeq
    require(texts.nonEmpty, s"no usable names under $sfDir")

    // nearest-rank percentile: ceil(p*n)-th smallest (the (p*n).toInt
    // form overstates the tail — p95 of 60 is rank 57, not 58)
    def pct(ms: Seq[Double], p: Double) =
      ms(math.min(ms.size - 1, math.max(0, math.ceil(p * ms.size).toInt - 1)))

    def measure(tag: String, run: String => Int): Seq[Double] = {
      texts.foreach(run) // warmup: fixture build + codegen paid here
      val lat = texts.map { t =>
        val t0 = System.nanoTime()
        val n = run(t)
        ((System.nanoTime() - t0) / 1e6, n)
      }
      val ms = lat.map(_._1).sorted
      println(f"$tag%-8s n=${ms.size} p50=${pct(ms, 0.50)}%.1f ms  " +
        f"p95=${pct(ms, 0.95)}%.1f ms  max=${ms.last}%.1f ms  " +
        f"mean=${ms.sum / ms.size}%.1f ms  hits=${lat.map(_._2).sum}")
      ms
    }

    def request(t: String) = ForwardReq(Seq(ForwardCandidate(t)), limit = 5)
    val scan = measure("scan", t => scanEngine.forward(request(t)).size)
    val indexed = measure("indexed", t => indexedEngine.forward(request(t)).size)
    // diagnostic: how many of the mix actually ride the zero-job path
    // (the rest are wide-candidate/unindexable shapes that job-route)
    val fastN = texts.count(t => indexedEngine.forwardFast(request(t)).isDefined)
    println(s"fast-engaged $fastN/${texts.size}")

    // BULK tier: the same request mix as ONE distributed job
    // (`ScoutEngine.bulk` — the per-request job floor amortizes across
    // the batch); reported as amortized ms per request
    scanEngine.bulk(texts, limit = 5) // warmup
    val t0 = System.nanoTime()
    val bulkHits = scanEngine.bulk(texts, limit = 5).map(_.size).sum
    val bulkMs = (System.nanoTime() - t0) / 1e6
    println(f"bulk     n=${texts.size} total=${bulkMs}%.1f ms  " +
      f"amortized=${bulkMs / texts.size}%.1f ms/req  hits=$bulkHits")

    // REVERSE tier (`ScoutEngine.reverse` — the whole point list as one
    // density-derived grid join): points derived from the corpus itself
    // (every 11th POI's coordinates, jittered off-node), so most find a
    // nearest POI
    val pts = Fixtures.gazPois(spark, sfDir, withWikidata = true)
      .select("osm_id", "lat", "lon").orderBy("osm_id")
      .collect().collect {
        case r if !r.isNullAt(1) && r.getLong(0) % 11 == 0 =>
          (r.getDouble(1) + 0.003, r.getDouble(2) - 0.002)
      }.take(nReq).toSeq
    scanEngine.reverse(pts) // warmup
    val t1 = System.nanoTime()
    val revHits = scanEngine.reverse(pts).count(_.nonEmpty)
    val revMs = (System.nanoTime() - t1) / 1e6
    println(f"reverse  n=${pts.size} total=${revMs}%.1f ms  " +
      f"amortized=${revMs / math.max(1, pts.size)}%.1f ms/req  hits=$revHits")

    // SINGLE-REQUEST reverse tier (round-12 in-process fast path —
    // ScoutEngine.reverseFast): each point as its own request, the
    // shape that paid the ~200 ms job floor before. First pass warms
    // the density-grid cell cache; the measured pass is driver-only.
    pts.foreach(p => scanEngine.reverse(Seq(p))) // warmup: cells fetch + cache
    val revOne = pts.map { p =>
      val t0 = System.nanoTime()
      val n = scanEngine.reverse(Seq(p)).count(_.nonEmpty)
      ((System.nanoTime() - t0) / 1e6, n)
    }
    val revOneMs = revOne.map(_._1).sorted
    println(f"rev-1    n=${revOneMs.size} p50=${pct(revOneMs, 0.50)}%.1f ms  " +
      f"p95=${pct(revOneMs, 0.95)}%.1f ms  max=${revOneMs.last}%.1f ms  " +
      f"mean=${revOneMs.sum / revOneMs.size}%.1f ms  hits=${revOne.map(_._2).sum}")

    println(s"""{"metric":"serve_latency_ms","sf":"$sfDir","n":${scan.size},""" +
      f""""scan_p50":${pct(scan, 0.5)}%.1f,"scan_p95":${pct(scan, 0.95)}%.1f,""" +
      f""""indexed_p50":${pct(indexed, 0.5)}%.1f,"indexed_p95":${pct(indexed, 0.95)}%.1f,""" +
      f""""bulk_amortized":${bulkMs / texts.size}%.1f,""" +
      f""""rev1_p50":${pct(revOneMs, 0.5)}%.1f,"rev1_p95":${pct(revOneMs, 0.95)}%.1f}""")
    spark.stop()
  }
}
