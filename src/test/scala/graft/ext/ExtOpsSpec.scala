package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExtOpsSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy cat"), // near-dup of 0
    (2L, "completely different text about spark engines"),
    (3L, "the quick brown fox jumps over the lazy dog") // exact dup of 0
  ).toDF("doc_id", "text")

  test("exact dedup groups identical canon text") {
    val groups = Dedup.exactGroups(docs, "doc_id", "text").collect()
    val dupGroup = groups.find(_.getLong(2) == 2L)
    assert(dupGroup.isDefined, "docs 0 and 3 must share a fingerprint group")
    assert(dupGroup.get.getLong(1) == 0L, "keep-lowest-id policy")
    assert(groups.length == 3)
  }

  test("minhash: identical docs get identical signatures; near-dups agree more") {
    val sig = Dedup.minhashSignature(Dedup.docTokens(docs, "doc_id", "text"), 8)
      .collect().map(r => r.getLong(0) -> (1 to 8).map(r.getLong)).toMap
    assert(sig(0L) == sig(3L), "exact dups -> equal signatures")
    val agree01 = sig(0L).zip(sig(1L)).count { case (a, b) => a == b }
    val agree02 = sig(0L).zip(sig(2L)).count { case (a, b) => a == b }
    assert(agree01 > agree02, s"near-dup agreement $agree01 must beat unrelated $agree02")
  }

  test("minhash LSH pairs surface the near-dup with high estimated similarity") {
    val sig = Dedup.minhashSignature(Dedup.docTokens(docs, "doc_id", "text"), 8)
    val pairs = Dedup.minhashLshPairs(sig, 8, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs.contains((0L, 3L)) && pairs((0L, 3L)) == 1.0)
    assert(pairs.contains((0L, 1L)), "near-dup must collide in at least one band")
  }

  test("simhash: exact dups equal; near-dups within small hamming distance") {
    val sh = Dedup.simhash(Dedup.docTokens(docs, "doc_id", "text"), 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(0L) == sh(3L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sh(0L), sh(1L)) <= hamming(sh(0L), sh(2L)))
  }

  test("jaccard pairs: near-dup scores high, unrelated scores low") {
    val pairs = Dedup.jaccardPairs(Dedup.docTokens(docs, "doc_id", "text"), maxDf = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((0L, 3L)) == 1.0)
    assert(pairs((0L, 1L)) > 0.7)
    assert(!pairs.contains((0L, 2L)) || pairs((0L, 2L)) < 0.2)
  }

  test("shingles: 3-grams are order-sensitive where unigrams are not") {
    val d = Seq((0L, "a b c d"), (1L, "d c b a")).toDF("doc_id", "text")
    val uni = Dedup.docTokens(d, "doc_id", "text")
    val tri = Dedup.docShingles(d, "doc_id", "text", 3)
    val uniSets = uni.collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(1)).toSet)
    assert(uniSets(0L) == uniSets(1L), "unigram sets identical")
    val triSets = tri.collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(1)).toSet)
    assert(triSets(0L).intersect(triSets(1L)).isEmpty, "3-gram sets disjoint")
    assert(triSets(0L) == Set("a b c", "b c d"))
  }

  test("quantized cosine: self-similarity 1, orthogonal 0, antiparallel -1") {
    val e = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)),
      (2L, Array(-1.0f, 0.0f)), (3L, Array(0.5f, 0.0f)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), Similarity.quantize(col("embedding")).as("q"))
    val m = e.as("a").crossJoin(e.as("b"))
      .select(col("a.vec_id").as("i"), col("b.vec_id").as("j"),
        Similarity.cosineQ(col("a.q"), col("b.q")).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(math.abs(m((0L, 0L)) - 1.0) < 1e-12)
    assert(m((0L, 1L)) == 0.0)
    assert(math.abs(m((0L, 2L)) + 1.0) < 1e-12)
    assert(math.abs(m((0L, 3L)) - 1.0) < 1e-12, "scale-invariant")
  }

  test("ANN: LSH top-k results are a subset of brute-force candidates with same scores") {
    val emb = Tables_embeddings()
    val brute = Similarity.bruteForceTopK(
      emb.filter(col("vec_id") < 3), emb, 50)
      .select("query_id", "cand_id", "cosine")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = Similarity.lshTopK(
      emb.filter(col("vec_id") < 3), emb, 5, numPlanes = 8, dim = 64)
      .select("query_id", "cand_id", "cosine").collect()
    lsh.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      brute.get(key).foreach(c => assert(c == r.getDouble(2), s"score mismatch at $key"))
    }
  }

  test("ANN: IVF top-k scores agree with brute force; every vector lands in one list") {
    val emb = Tables_embeddings()
    val brute = Similarity.bruteForceTopK(emb.filter(col("vec_id") < 3), emb, 500)
      .select("query_id", "cand_id", "cosine")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val ivf = Similarity.ivfTopK(emb.filter(col("vec_id") < 3), emb,
      k = 5, nCentroids = 8, nprobe = 2)
      .select("query_id", "cand_id", "cosine").collect()
    assert(ivf.nonEmpty)
    ivf.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(brute(key) == r.getDouble(2), s"score mismatch at $key")
    }
  }

  test("ANN: trained IVF centroids are deterministic and usable") {
    val emb = Tables_embeddings()
    val c1 = Similarity.trainIvfCentroids(emb, nCentroids = 4, iterations = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val c2 = Similarity.trainIvfCentroids(emb, nCentroids = 4, iterations = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(c1 == c2, "k-means training must be run-to-run deterministic")
    assert(c1.values.forall(_.length == 64))
    val trained = Similarity.ivfTopK(emb.filter(col("vec_id") < 3), emb,
      k = 5, nCentroids = 4, nprobe = 2,
      centroids = Some(Similarity.trainIvfCentroids(emb, 4, 2)))
      .collect()
    assert(trained.nonEmpty)
  }

  private def Tables_embeddings() =
    spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")

  test("ANN: packed sign bits set exactly the positive components' bits") {
    val e = Seq((0L, Array.tabulate(64)(j =>
      if (j == 0 || j == 31 || j == 32 || j == 63) 1.0f
      else if (j == 5) -1.0f else 0.0f)))
      .toDF("vec_id", "embedding")
    val words = e.select(
        Similarity.packBits(Similarity.quantize(col("embedding")), 64).as("w"))
      .collect().head.getSeq[Long](0)
    assert(words == Seq((1L << 0) + (1L << 31), (1L << 0) + (1L << 31)),
      s"got $words") // zero and negative components contribute no bits
  }

  test("ANN: BQ with a full-width prefilter equals brute force; narrow prefilter keeps exact scores") {
    val emb = Tables_embeddings()
    val q = emb.filter(col("vec_id") < 3)
    val brute = Similarity.bruteForceTopK(q, emb, 5)
      .select("query_id", "rank", "cand_id", "cosine").orderBy("query_id", "rank")
      .collect()
    val full = Similarity.bqTopK(q, emb, k = 5, dim = 64, nCandidates = 1000)
      .select("query_id", "rank", "cand_id", "cosine").orderBy("query_id", "rank")
      .collect()
    assert(full.sameElements(brute),
      "prefilter wider than the corpus must change nothing")
    val narrowed = Similarity.bqTopK(q, emb, k = 5, dim = 64, nCandidates = 30)
      .select("query_id", "cand_id", "cosine").collect()
    val bruteScores = Similarity.bruteForceTopK(q, emb, 500)
      .select("query_id", "cand_id", "cosine")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(narrowed.nonEmpty)
    narrowed.foreach { r =>
      assert(bruteScores((r.getLong(0), r.getLong(1))) == r.getDouble(2),
        "survivor scores are the exact re-rank values")
    }
  }

  test("embedding near-dup: exact + perturbed dups found, dissimilar vectors not paired") {
    def vec(f: Int => Float) = Array.tabulate(64)(f)
    val base = vec(j => math.sin(j * 1.7).toFloat)
    val emb = Seq(
      (0L, base.toSeq),
      (1L, base.toSeq), // exact dup → cosine 1.0
      (2L, vec(j => if (j < 2) 0f else base(j)).toSeq), // near-dup
      (3L, base.map(-_).toSeq) // antiparallel → cosine -1, never a pair
    ).toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val pairs = Similarity.nearDupPairs(emb, bands = 4, planesPerBand = 8,
        dim = 64, minCosine = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs.get((0L, 1L)).contains(1.0), s"exact dup must score 1.0: $pairs")
    assert(pairs.get((0L, 2L)).exists(_ >= 0.9), s"perturbed dup must pair: $pairs")
    assert(!pairs.keySet.exists(k => k._1 == 3L || k._2 == 3L),
      s"antiparallel vector must never pair: $pairs")
  }

  test("multimodal: histogram features L1-normalize; plumbing preserves rows") {
    val media = Multimodal.fromDocuments(
      Seq((1L, "hello world"), (2L, "")).toDF("doc_id", "text"))
    val feats = Multimodal.extractFeatures(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(feats.keySet == Set(1L, 2L))
    assert(feats(1L).getLong(1) == 11L)
    val hist = feats(1L).getSeq[Double](2)
    assert(math.abs(hist.sum - 1.0) < 1e-12, "L1 normalized")
    assert(feats(2L).getSeq[Double](2).sum == 0.0, "empty payload -> zero histogram")
  }

  test("multimodal: resize re-bins preserving mass; frame sampling covers the payload") {
    val f = Array(0.1, 0.2, 0.3, 0.4, 0.0, 0.0, 0.0, 0.0)
    val r = Multimodal.resizeFeatures(f, 4)
    assert(r.length == 4 && math.abs(r.sum - f.sum) < 1e-12)
    assert(r(0) == 0.1 + 0.2 && r(1) == 0.3 + 0.4)
    assert(Multimodal.resizeFeatures(null, 4).toSeq == Seq(0.0, 0.0, 0.0, 0.0))

    val media = Multimodal.fromDocuments(
      Seq((1L, "abcdefghij")).toDF("doc_id", "text")) // 10 bytes
    val frames = Multimodal.sampleFrames(media, frameSize = 3, stride = 4).collect()
      .map(r => r.getInt(1) -> new String(r.getAs[Array[Byte]](2))).toMap
    assert(frames == Map(0 -> "abc", 1 -> "efg", 2 -> "ij"))
  }

  test("text analysis: token/subword counts, quality, langid mechanism") {
    val df = Seq((1L, "The quick-fox, jumps! Over 2 dogs.")).toDF("doc_id", "text")
    val r = df.select(
      TextAnalysis.tokenCount(col("text")).as("nt"),
      TextAnalysis.subwordCount(col("text")).as("ns"),
      TextAnalysis.fingerprint(col("text")).as("fp"),
      TextAnalysis.langGuess(col("text")).as("lang")).collect()(0)
    assert(r.getInt(0) == 7) // the quick fox jumps over 2 dogs
    assert(r.getInt(1) == 7)
    assert(r.getString(2).length == 32)
    assert(r.getString(3) == "en") // contains 'the'
  }

  test("connected components: min-label clusters, chains, isolated nodes") {
    val nodes = (1L to 8L).toDF("id")
    // component {1,2,3,4} via a chain (needs >1 propagation round),
    // component {6,7}, isolated {5, 8}
    val edges = Seq((2L, 1L), (3L, 2L), (4L, 3L), (6L, 7L)).toDF("a", "b")
    val got = Dedup.connectedComponents(nodes, edges)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 6L, 7L -> 6L, 8L -> 8L))
  }

  test("connected components: distributed propagation loop matches the " +
      "fast path and leaves session conf untouched") {
    val nodes = (1L to 8L).toDF("id")
    val edges = Seq((2L, 1L), (3L, 2L), (4L, 3L), (6L, 7L)).toDF("a", "b")
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    // threshold 0 forces the label-propagation loop on the same graph
    // the fast-path test pins — identical labels by the unique-fixpoint
    // contract, and (the round-9 ADVICE regression) the loop must size
    // its rounds via explicit repartitions, never a session-conf
    // mutation that concurrent queries would observe
    val got = Dedup.connectedComponents(nodes, edges, smallGraphThreshold = 0L)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 6L, 7L -> 6L, 8L -> 8L))
    assert(spark.conf.get("spark.sql.shuffle.partitions") == before)
  }

  test("contamination pairs: shared n-grams between split halves only") {
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon"),   // test (id%2==0)
      (2L, "one two three four"),               // test, no overlap
      (1L, "x alpha beta gamma delta y"),       // train: shares 2 4-grams with doc 0
      (3L, "alpha beta gamma delta epsilon")    // train: shares 2 4-grams with doc 0
    ).toDF("doc_id", "text")
    val got = Dedup.contaminationPairs(docs, "doc_id", "text",
        testPred = col("doc_id") % 2 === 0, n = 4)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((0L, 1L, 1L), (0L, 3L, 2L)))
  }

  test("language ID identifies real multilingual sentences with the real profiles") {
    // genuine sentences, one per profiled language — the profiles are
    // published-frequency function words, not corpus-fit markers, so
    // this is the capability check, not just the mechanism check
    val samples = Seq(
      (1L, "the cat sat on the mat and it is happy to be in the sun", "en"),
      (2L, "der hund und die katze sind nicht mit dem kind zu hause", "de"),
      (3L, "el perro come en la casa de mi amigo por que los gatos duermen", "es"),
      (4L, "le chien est dans la maison et les chats dorment pour une heure", "fr"),
      (5L, "il cane che dorme nella casa per una notte con del pane", "it"),
      (6L, "xyzzy plugh quux", "und"))
    val df = samples.toDF("id", "text", "expected")
      .withColumn("toks", TextAnalysis.tokensCol(col("text")))
    val got = df.select(col("id"), TextAnalysis.langGuessTok(col("toks")).as("g"),
        col("expected")).collect()
    got.foreach(r => assert(r.getString(1) == r.getString(2),
      s"sample ${r.getLong(0)}: guessed ${r.getString(1)}"))
    // trigram half: German sentence scores its 'sch/ein/ich/der/und'
    // profile above the English one
    val tri = Seq((1L, "ich bin ein schneller schoener mensch und der wind ist schoen"))
      .toDF("id", "text")
      .select(TextAnalysis.trigramScores(col("text")).map { case (n, c) => c.as(n) }: _*)
      .collect()(0)
    assert(tri.getLong(1) > tri.getLong(0)) // t_de > t_en
  }

  test("unicode language ID: 12 real UDHR sentences across 6 scripts, each guessed right") {
    val samples = graft.queries.TextQueries.udhrSamples
    val df = samples.map { case (id, lang, text) => (id, lang, text) }
      .toDF("doc_id", "lang", "text")
      .withColumn("guess", TextAnalysis.langGuessU(col("text")))
    val got = df.select("lang", "guess").collect()
      .map(r => r.getString(0) -> r.getString(1))
    got.foreach { case (lang, guess) =>
      assert(guess == lang, s"expected $lang, guessed $guess")
    }
    assert(got.length == 12 &&
      Set("en", "de", "es", "fr", "it", "pt", "nl", "ru", "ar", "zh", "ja", "ko")
        .subsetOf(got.map(_._1).toSet))
    // pure ASCII noise scores nothing
    val und = Seq((1L, "xqzzv 12345 bbb")).toDF("id", "text")
      .select(TextAnalysis.langGuessU(col("text"))).head().getString(0)
    assert(und == "und")
  }

  test("approx_percentile tracks exact percentile (the at-scale path for r13)") {
    val li = spark.read.parquet(sf("sf0.01") + "/lineitem.parquet")
    val row = li.agg(
      expr("percentile(l_extendedprice, 0.5)").as("exact"),
      expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("approx")).collect()(0)
    val (exact, approx) = (row.getDouble(0), row.getDouble(1))
    assert(math.abs(approx - exact) / exact < 0.02, s"approx=$approx exact=$exact")
  }

  test("approx_count_distinct stays within its error bound (bounds-only check)") {
    val li = spark.read.parquet(sf("sf0.01") + "/lineitem.parquet")
    val row = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), 0.05).as("approx")).collect()(0)
    val (exact, approx) = (row.getLong(0), row.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.15,
      s"approx=$approx exact=$exact")
  }

  test("chunkify: windows cover every token, overlap correctly, and respect size") {
    import spark.implicits._
    val text = (1 to 75).map(i => s"tok$i").mkString(" ")
    val docs = Seq((1L, text), (2L, "short doc"), (3L, "")).toDF("doc_id", "text")
    val chunks = TextAnalysis.chunkify(docs, "text", chunkSize = 32, overlap = 8)
      .select("doc_id", "chunk_id", "chunk_tokens")
      .as[(Long, Int, Seq[String])].collect().sortBy(c => (c._1, c._2))
    // empty doc → no chunks; short doc → one short chunk
    assert(!chunks.exists(_._1 == 3L))
    assert(chunks.filter(_._1 == 2L).map(_._3) sameElements Array(Seq("short", "doc")))
    // 75 tokens, step 24 → chunks start at 0/24/48 (72 would add nothing)
    val d1 = chunks.filter(_._1 == 1L)
    assert(d1.map(_._2).toSeq == Seq(0, 1, 2))
    assert(d1.forall(_._3.length <= 32))
    // consecutive chunks overlap by exactly `overlap` tokens
    d1.sliding(2).foreach {
      case Array(a, b) => assert(a._3.takeRight(8) == b._3.take(8))
      case _ =>
    }
    // concatenating steps reconstructs the document exactly
    val rebuilt = d1.head._3 ++ d1.tail.flatMap(_._3.drop(8))
    assert(rebuilt == text.split(" ").toSeq)
  }

  test("PQ ANN: a clone of a SEED vector ranks first at ADC distance exactly 0") {
    // ADC measures query→codeword distances, so a clone's adist equals
    // the QUERY's own quantization error — exactly 0 only when the query
    // is a seed (its codeword is itself). That's the invariant to pin.
    val dim = 8
    def vec(seed: Int) = Array.tabulate(dim)(j =>
      (((seed * dim + j) * 2654435761L) % 1999 - 999).toFloat / 1000f)
    // 10 base vectors + a clone of SEED vector 2 (ks=4 → seeds 0..3)
    val rows = (0 until 10).map(i => (i.toLong, vec(i).toSeq)) :+ (100L, vec(2).toSeq)
    val corpus = rows.toDF("vec_id", "embedding")
    val top = Similarity.pqTopK(
      corpus.filter(col("vec_id") === 2), corpus, k = 3, m = 4, ks = 4, dim = dim)
      .orderBy("rank").collect()
    // the clone codes to the query's own codes; each lookup distance is
    // 0 — it MUST sit in the adist=0 tier (other vectors may share all
    // codes and tie; ties break by cand_id)
    val zeroTier = top.filter(r => r.getLong(r.fieldIndex("adist")) == 0L)
      .map(r => r.getLong(r.fieldIndex("cand_id"))).toSet
    assert(top.head.getLong(top.head.fieldIndex("adist")) == 0L)
    assert(zeroTier.contains(100L), s"clone not in the zero tier: $zeroTier")
  }
}
