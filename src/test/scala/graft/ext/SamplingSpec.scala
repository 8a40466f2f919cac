package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Properties of the corpus-composition operators (ext/Sampling) and the
  * fixed-point PageRank (ext/Graphs) that the oracle hash can't express:
  * invariants over arbitrary inputs, determinism under repartitioning,
  * and the broadcast/no-corpus-shuffle plan shapes SCALE.md claims.
  */
class SamplingSpec extends SparkSpec {

  import spark.implicits._

  private def corpus = Seq(
    // masses: a=120, b=35, c=40 — b is the UNIQUE minimum (a tie here
    // would let a wrong-min regression pass unnoticed)
    (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L), (4L, "a", 15L),
    (5L, "a", 25L), (6L, "a", 20L), (7L, "b", 30L), (8L, "b", 5L),
    (9L, "c", 40L)).toDF("id", "grp", "w")

  test("temperatureMix keeps the rarest group whole and flattens the rest") {
    val kept = Sampling.temperatureMix(corpus, "grp", "id", col("w"))
    val ppm = kept.select("grp", "keep_ppm").distinct().as[(String, Long)]
      .collect().toMap
    // b has min mass (35): kept at exactly 1e6 ppm → every row survives
    assert(ppm.get("b").forall(_ == 1000000L))
    assert(kept.filter(col("grp") === "b").count() == 2)
    // a (mass 120) keeps at sqrt(35/120) ≈ 540062 ppm; c at sqrt(35/40) ≈ 935414
    assert(ppm.get("a").forall(p => p > 535000L && p < 545000L))
    assert(ppm.get("c").forall(p => p > 930000L && p < 940000L))
  }

  test("temperatureMix membership is stable under repartitioning") {
    val a = Sampling.temperatureMix(corpus, "grp", "id", col("w"))
      .select("id").as[Long].collect().sorted
    val b = Sampling.temperatureMix(corpus.repartition(7), "grp", "id", col("w"))
      .select("id").as[Long].collect().sorted
    assert(a.sameElements(b))
  }

  test("temperatureMix broadcasts the rate table — the corpus is never shuffled") {
    val plan = Sampling.temperatureMix(corpus, "grp", "id", col("w"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"rates should join by broadcast:\n$plan")
  }

  test("packBins: bins partition each shard's id order into contiguous runs") {
    val docs = (1L to 200L).map(i => (i, s"t$i")).toDF("id", "txt")
    val bins = Sampling.packBins(docs, "id", (col("id") % 37 + 1), shards = 4,
      capacity = 100L)
      .orderBy("shard", "bin").collect()
    // every doc lands in exactly one bin
    assert(bins.map(_.getAs[Long]("n_docs")).sum == 200L)
    // contiguity: within a shard, bin id-spans never overlap and ascend
    bins.groupBy(_.getAs[Long]("shard")).foreach { case (_, rows) =>
      rows.sliding(2).foreach {
        case Array(x, y) =>
          assert(x.getAs[Long]("max_id") < y.getAs[Long]("min_id"))
        case _ =>
      }
    }
    // capacity: a bin holds < capacity + its largest doc (prefix-sum
    // packing overshoots by at most one document)
    assert(bins.forall(_.getAs[Long]("sum_tokens") < 100L + 37L))
  }

  test("packBins is deterministic under repartitioning") {
    val docs = (1L to 200L).map(i => (i, s"t$i")).toDF("id", "txt")
    def run(df: org.apache.spark.sql.DataFrame) =
      Sampling.packBins(df, "id", (col("id") % 37 + 1), 4, 100L)
        .orderBy("shard", "bin").collect().toSeq
    assert(run(docs) == run(docs.repartition(11)))
  }

  test("pageRankFixedPoint: symmetric ring graph gives every node equal rank") {
    val n = 12L
    val nodes = (0L until n).toDF("id")
    val edges = (0L until n).map(i => (i, (i + 1) % n)).toDF("src", "dst")
    val ranks = Graphs.pageRankFixedPoint(nodes, edges, 3)
      .select("rank").as[Long].collect()
    assert(ranks.distinct.length == 1) // symmetry → identical fixed-point value
    // mass ≈ conserved on a dangling-free graph (floor-division dust only)
    assert(math.abs(ranks.sum - 1000000000000L) < n * 100)
  }

  test("pageRankFixedPoint concentrates rank on a sink hub") {
    // star: everyone links to node 0; node 0 links to node 1
    val nodes = (0L to 9L).toDF("id")
    val edges = ((1L to 9L).map(i => (i, 0L)) :+ (0L, 1L)).toDF("src", "dst")
    val r = Graphs.pageRankFixedPoint(nodes, edges, 3)
      .as[(Long, Long)].collect().toMap
    assert(r(0L) > r(1L) && r(1L) > r(2L))
    assert(r(2L) == r(9L)) // leaves are symmetric
  }

  test("triangleCounts: K4 gives every node 3 triangles; stars and loops give none") {
    // K4 on {0..3} (4 triangles, each node in 3) + a star hub 10 with
    // leaves 11..15 (wedges galore, zero closures) + a self-loop +
    // a parallel/reversed edge that must collapse
    val k4 = for { a <- 0L to 3L; b <- 0L to 3L if a < b } yield (a, b)
    val star = (11L to 15L).map(i => (10L, i))
    val edges = (k4 ++ star ++ Seq((2L, 2L), (1L, 0L))).toDF("src", "dst")
    val tri = Graphs.triangleCounts(edges).as[(Long, Long)].collect().toMap
    assert(tri == (0L to 3L).map(_ -> 3L).toMap)
  }

  test("triangleCounts counts each triangle once regardless of edge direction mix") {
    // one triangle given with mixed directions and a duplicate edge
    val edges = Seq((5L, 6L), (7L, 6L), (5L, 7L), (6L, 5L)).toDF("src", "dst")
    val tri = Graphs.triangleCounts(edges).as[(Long, Long)].collect().toMap
    assert(tri == Map(5L -> 1L, 6L -> 1L, 7L -> 1L))
  }

  test("labelPropagation: ties break to smallest label, seeds never change") {
    val nodes = (1L to 4L).toDF("id")
    // 1(lbl 5) and 2(lbl 7) both feed 3; 2 feeds seed 1 (must not flip it)
    val edges = Seq((1L, 3L), (2L, 3L), (2L, 1L)).toDF("src", "dst")
    val seeds = Seq((1L, 5L), (2L, 7L)).toDF("id", "lbl")
    val out = Graphs.labelPropagation(nodes, seeds, edges, 2)
      .as[(Long, java.lang.Long)].collect().toMap
    assert(out(1L) == 5L && out(2L) == 7L) // seeds held
    assert(out(3L) == 5L)                  // 1-1 tie → smallest label
    assert(out(4L) == null)                // unreached stays unlabeled
  }

  test("labelPropagation spreads one hop per round along a path") {
    val nodes = (1L to 3L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val seeds = Seq((1L, 9L)).toDF("id", "lbl")
    val one = Graphs.labelPropagation(nodes, seeds, edges, 1)
      .as[(Long, java.lang.Long)].collect().toMap
    assert(one(2L) == 9L && one(3L) == null)
    val two = Graphs.labelPropagation(nodes, seeds, edges, 2)
      .as[(Long, java.lang.Long)].collect().toMap
    assert(two(3L) == 9L)
  }

  test("bloomDecontaminate equals the exact anti-join formulation") {
    val docs = (1L to 60L).map { i =>
      // shared phrases every 5th doc so contamination actually occurs
      val words = if (i % 5 == 0) "alpha beta gamma delta epsilon"
      else s"w${i}a w${i}b w${i}c w${i}d w${i}e"
      (i, words)
    }.toDF("doc_id", "text")
    val testPred = col("doc_id") % 10 === 0
    val bloom = Dedup.bloomDecontaminate(docs, "doc_id", "text", testPred, n = 4)
      .as[Long].collect().sorted
    val pairs = Dedup.contaminationPairs(docs, "doc_id", "text", testPred, n = 4)
      .select("train_id").distinct().as[Long].collect().toSet
    val naive = docs.filter(!testPred).select(col("doc_id")).as[Long]
      .collect().filterNot(pairs).sorted
    assert(bloom.sameElements(naive))
  }

  test("bloomDecontaminate: large held-out set, auto-sized sketch, identical under mis-sizing") {
    // ~500 held-out docs x ~16 distinct 4-shingles each ≈ 8k distinct
    // hashes — far past any guessed constant's comfort zone, and every
    // 7th train doc shares a phrase with some held-out doc
    val docs = (1L to 2000L).map { i =>
      val words =
        if (i % 4 == 0) s"held out corpus entry ${i / 4} with extra shared tail ${i % 28}"
        else if (i % 7 == 0) s"held out corpus entry ${(i % 112) / 4} with extra shared tail ${i % 28}"
        else s"t${i}a t${i}b t${i}c t${i}d t${i}e t${i}f"
      (i, words)
    }.toDF("doc_id", "text")
    val testPred = col("doc_id") % 4 === 0
    def exact: Seq[Long] = {
      val dirty = Dedup.contaminationPairs(docs, "doc_id", "text", testPred, n = 4)
        .select("train_id").distinct().as[Long].collect().toSet
      docs.filter(!testPred).select("doc_id").as[Long]
        .collect().filterNot(dirty).sorted.toSeq
    }
    val want = exact
    // auto-sized (default): byte-identical to the exact anti-join
    val auto = Dedup.bloomDecontaminate(docs, "doc_id", "text", testPred, n = 4)
      .as[Long].collect().sorted.toSeq
    assert(auto == want && want.nonEmpty)
    // deliberately undersized sketch: fpp degrades, correctness doesn't
    // (the exact verify owns semantics; the sketch only prunes)
    val tiny = Dedup.bloomDecontaminate(docs, "doc_id", "text", testPred, n = 4,
      expectedTestShingles = 16L)
      .as[Long].collect().sorted.toSeq
    assert(tiny == want)
  }
}
