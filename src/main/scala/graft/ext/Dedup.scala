package graft.ext

import graft.core.Norm
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, and token-set (n-gram) Jaccard.
  *
  * All hashing is engine-portable BY CONSTRUCTION: the base token hash is
  * the first 8 hex digits of md5 (identical in any engine), and the
  * MinHash family is affine arithmetic over that 32-bit value mod a
  * >2^32 prime — so the DuckDB oracle can recompute every signature
  * bit-for-bit. No reliance on Spark's internal murmur3.
  *
  * Scale shape: token explode → per-doc aggregate is one shuffle keyed by
  * doc_id; LSH banding turns the quadratic pair search into equality
  * joins on (band, bucket) — the standard way to near-dedup 100 TB
  * without an O(n²) cross join.
  */
object Dedup {

  /** 32-bit portable token hash: first 8 hex chars of md5 as a long. */
  def tokenHash(tok: Column): Column =
    conv(substring(md5(tok), 1, 8), 16, 10).cast("long")

  /** Scalar twin of [[tokenHash]] (first 4 md5 bytes as an unsigned
    * 32-bit value — exactly the first-8-hex-chars parse), for the
    * driver-side small-batch routes that must hash bit-identically to
    * the column plan ([[MinHashIndex]]'s driver append). Spec-pinned
    * against the column form. */
  def tokenHashStr(tok: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** MinHash modulus: smallest prime above 2^32 — keeps `a*h + b` within
    * int64 for 32-bit h and 32-bit-ish coefficients. */
  val MinhashPrime: Long = 4294967311L

  /** Deterministic affine coefficients for hash function i. */
  def minhashA(i: Int): Long = 2 * i + 1L          // odd, coprime-ish
  def minhashB(i: Int): Long = 40503L * (i + 1) + 9973L

  /** (id, tok) pairs from a text column: the input relation for every
    * token-based signature below. `distinct = false` skips the dedup
    * shuffle — correct for order/multiplicity-insensitive consumers
    * (MinHash: min over a multiset equals min over its set).
    *
    * Typed flatMap rather than explode-over-array-expression: Catalyst's
    * project collapsing inlines the canon regex chain into per-element
    * lambda positions (measured 7× slowdown — the expression tree held 8
    * copies of regexp_replace); per-row imperative tokenization with the
    * column-parity-tested [[Norm.canonStr]] is narrow, shuffle-free and
    * evaluates the regex exactly once per document. */
  /** The shared canon-token array — column-side (split → filter), so
    * every shingling/tokenizing front-end below stays inside
    * whole-stage codegen; the former typed flatMap paid Row↔object
    * serialization plus a per-doc regex pass outside codegen on every
    * corpus scan of the dedup family. `Norm.canon` (column) ≡
    * `Norm.canonStr` (the flatMap's form) is pinned by NormSpec. */
  private def tokArray(textCol: String): Column =
    filter(split(Norm.canon(col(textCol)), " "), t => t =!= lit(""))

  def docTokens(df: DataFrame, idCol: String, textCol: String,
                distinct: Boolean = true): DataFrame = {
    val t = df.select(col(idCol).cast("long").as("id"),
      explode(tokArray(textCol)).as("tok"))
    if (distinct) t.distinct() else t
  }

  /** Word n-gram shingles (n consecutive tokens joined by space) —
    * the shingling front-end for MinHash near-dup detection. Windows
    * built column-side (sequence → slice → concat_ws), the
    * [[spanHashes]] construction. */
  def docShingles(df: DataFrame, idCol: String, textCol: String, n: Int,
                  distinct: Boolean = true): DataFrame = {
    val t = df.select(col(idCol).cast("long").as("id"), tokArray(textCol).as("t"))
      .filter(size(col("t")) >= n)
      .select(col("id"), explode(
        transform(sequence(lit(1), size(col("t")) - lit(n - 1)),
          i => concat_ws(" ", slice(col("t"), i, lit(n))))).as("tok"))
    if (distinct) t.distinct() else t
  }

  /** MinHash signature: one min per affine permutation over the doc's
    * token-hash set. Output: id, m0..m{n-1}. */
  def minhashSignature(tokens: DataFrame, numHashes: Int): DataFrame = {
    val h = tokenHash(col("tok"))
    val mins = (0 until numHashes).map(i =>
      min((h * minhashA(i) + minhashB(i)) % MinhashPrime).as(s"m$i"))
    tokens.groupBy("id").agg(mins.head, mins.tail: _*)
  }

  /** LSH candidate pairs: docs sharing any band of `rowsPerBand`
    * consecutive signature values. Returns (a, b, est_sim) where est_sim
    * is the fraction of agreeing minhashes — the MinHash estimate of
    * Jaccard similarity.
    *
    * The signature relation must be MATERIALIZED once — the plan reads
    * it 6 times (one per band branch + both sides of the score join),
    * and without materialization the whole tokenize→min aggregate
    * re-runs per read unless AQE exchange reuse happens to fire (the
    * round-2 driver bench measured 5.2s vs 0.75s on the same code
    * depending on whether reuse kicked in). Two routes:
    *
    *  - `indexPath = Some(p)`: signatures persist as a [[MinHashIndex]]
    *    at `p` (staged write, single-rename publish) and pairs serve
    *    from the STORED tables — durable, survives executor loss, and
    *    leaves the index behind for later appends/serving. The route
    *    for any long-lived cluster.
    *  - `indexPath = None` (build-inline): a `localCheckpoint` in
    *    executor-local storage — cheapest for a small one-shot corpus,
    *    but the materialization dies with the executors.
    *
    * Both routes derive band keys from the same [[MinHashIndex.bands]]
    * and produce identical pairs — spec-pinned. */
  def minhashLshPairs(sigIn: DataFrame, numHashes: Int, rowsPerBand: Int,
                      indexPath: Option[String] = None): DataFrame = indexPath match {
    case Some(p) =>
      MinHashIndex.writeFromSignatures(sigIn, p, numHashes, rowsPerBand)
      MinHashIndex.pairs(sigIn.sparkSession, p, numHashes)
    case None => minhashLshPairsInline(sigIn, numHashes, rowsPerBand)
  }

  private def minhashLshPairsInline(sigIn: DataFrame, numHashes: Int,
                                    rowsPerBand: Int): DataFrame = {
    // read by every band branch + both scoring joins: persist (lazy,
    // lineage kept) — the former EAGER localCheckpoint paid one extra
    // full materialization pass before the first real action
    val sig = sigIn.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bands = MinHashIndex.bands(sig, numHashes, rowsPerBand)
    val l = bands.as("l")
    val r = bands.as("r")
    val cand = l.join(r,
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("a"), col("r.id").as("b"))
      .distinct()
    val agree = (0 until numHashes)
      .map(i => when(col(s"sa.m$i") === col(s"sb.m$i"), 1).otherwise(0))
      .reduce(_ + _)
    cand
      .join(sig.as("sa"), col("a") === col("sa.id"))
      .join(sig.as("sb"), col("b") === col("sb.id"))
      .select(col("a"), col("b"),
        round(agree.cast("double") / numHashes, 6).as("est_sim"))
  }

  /** SimHash over `bits` low bits of the portable token hash: bit j of
    * the fingerprint is set iff more token hashes have bit j set than
    * not. Near-dups differ in few bits (Hamming distance). */
  def simhash(tokens: DataFrame, bits: Int): DataFrame = {
    val h = tokenHash(col("tok"))
    val votes = (0 until bits).map(j =>
      sum(when(shiftright(h, j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"v$j"))
    val fp = (0 until bits)
      .map(j => when(col(s"v$j") > 0, 1L << j).otherwise(0L))
      .reduce(_ + _)
    tokens.groupBy("id")
      .agg(votes.head, votes.tail: _*)
      .select(col("id"), fp.as("simhash"))
  }

  /** Exact duplicate groups by content fingerprint: keep-lowest-id
    * policy. One hash-aggregate, no joins. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_docs"))

  /** Connected components over a near-dup pair graph — the step that
    * turns pairwise similarity hits into dedup CLUSTERS (keep one doc
    * per component). Deterministic min-label propagation: every node's
    * label converges to the smallest id in its component, a unique
    * fixpoint independent of iteration/partition order (which is what
    * lets a SQL transitive-closure oracle check it bit-for-bit).
    *
    * Scale shape: each round is one equality join (edges × labels) + a
    * min-aggregate — all hash-partitionable by node id; rounds needed =
    * component diameter (near-dup clusters are shallow; `maxIters`
    * bounds pathological chains). `localCheckpoint` cuts the per-round
    * lineage, and the convergence check is a count, not a collect.
    * GraphX-style large-star/small-star halves the round count at
    * extreme diameters; plain propagation is the right tool for the
    * shallow components LSH emits. */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
                          maxIters: Int = 25,
                          smallGraphThreshold: Long = 1000000L): DataFrame = {
    // materialized ONCE: the edge list is read twice per round (the
    // propagation join + the convergence check), and without the
    // checkpoint every action re-executes the whole upstream pair
    // generation (e.g. the LSH pipeline) per round
    val spark = nodes.sparkSession
    val sym = edges.select(col("a").as("src"), col("b").as("dst"))
      .union(edges.select(col("b").as("src"), col("a").as("dst")))
      .distinct()
      .localCheckpoint(true)
    val edgeCount = sym.count() // one cheap job over the checkpointed edges
    // SMALL-GRAPH fast path: a near-dup edge list that fits on the
    // driver (bounded — 1M edges ≈ 16 MB) resolves by in-process
    // union-find instead of paying rounds × (join + checkpoint +
    // convergence check) of per-JOB scheduling floor. Same contract,
    // exact: roots always link toward the SMALLER id, so each root is
    // its component's min — identical labels to the converged
    // propagation. Nodes outside every edge stay their own component
    // via the left join. The distributed loop below remains the 100 TB
    // path; this is the maxLiteralTerms bounded-driver-state treatment
    // applied to the curation graphs, which are tiny AFTER LSH pruning
    // even when the corpus is not.
    if (edgeCount <= smallGraphThreshold) {
      val parent = new java.util.HashMap[Long, Long]()
      def find(x0: Long): Long = {
        var x = x0
        var p = parent.getOrDefault(x, x)
        while (p != x) { // path-halving; pointers only ever decrease
          val gp = parent.getOrDefault(p, p)
          parent.put(x, gp)
          x = gp
          p = parent.getOrDefault(x, x)
        }
        x
      }
      val es = sym.collect()
      es.foreach { r =>
        val ra = find(r.getLong(0))
        val rb = find(r.getLong(1))
        if (ra != rb) parent.put(math.max(ra, rb), math.min(ra, rb))
      }
      val endpoints = es.iterator.flatMap(r => Iterator(r.getLong(0), r.getLong(1)))
        .toArray.distinct
      import spark.implicits._
      val compDF = endpoints.map(i => (i, find(i))).toSeq.toDF("id", "comp")
      return nodes.select(col("id"))
        .join(org.apache.spark.sql.functions.broadcast(compDF), Seq("id"), "left")
        .select(col("id"),
          coalesce(col("comp"), col("id")).as("comp"))
    }
    // iteration width sized to the MATERIALIZED edge list — the AQE
    // coalescing treatment applied to a loop AQE cannot see across
    // (every round is its own job over checkpointed inputs): label
    // propagation shuffles ~|edges| rows per round, so a small edge set
    // converges in narrow rounds instead of paying rounds × stages ×
    // near-empty tasks at session width; a 100 TB edge list drives the
    // width right back to the session default. Width rides EXPLICIT
    // repartitions on the per-round plans, never a session-conf mutation
    // (concurrent queries on the same SparkSession would silently run at
    // the narrowed width): hash(joinKey, width) on both sides satisfies
    // the join's distribution requirement, so no extra exchange appears.
    val width = math.max(1L, math.min(
      spark.sessionState.conf.numShufflePartitions.toLong,
      edgeCount / 250000L + 1)).toInt
    val symW = sym.repartition(width, col("src")).localCheckpoint(true)
    var labels = nodes.select(col("id"), col("id").as("comp")).localCheckpoint(true)
    var it = 0
    var converged = false
    while (!converged && it < maxIters) {
      val l = labels.repartition(width, col("id"))
      val nbrMin = symW.join(l, symW("src") === l("id"))
        .groupBy(col("dst").as("nid")).agg(min("comp").as("nbr"))
        .repartition(width, col("nid"))
      val l2 = labels.repartition(width, col("id"))
      val next = l2.join(nbrMin, l2("id") === col("nid"), "left")
        .select(col("id"), col("comp"),
          least(col("comp"), coalesce(col("nbr"), col("comp"))).as("comp2"))
        .localCheckpoint(true)
      converged = next.filter(col("comp2") < col("comp")).isEmpty
      labels = next.select(col("id"), col("comp2").as("comp"))
      it += 1
    }
    // silent non-convergence would report one real cluster as several —
    // and the keep-one dedup policy downstream would then KEEP duplicates
    require(converged,
      s"connectedComponents did not converge in $maxIters rounds — a component " +
        s"has diameter > $maxIters; raise maxIters (cost is one join per round)")
    labels
  }

  /** Deterministic split assignment (train/test/val routing): a stable
    * engine-portable hash of (salt, id) modulo 100 against the train
    * percentage. Stable across runs, partitionings, and engines — the
    * property a reproducible corpus split actually needs (a `rand()`
    * split changes membership on every retry). Different salts give
    * independent splits of the same corpus. */
  def splitAssign(id: Column, trainPct: Int, salt: String = "split"): Column =
    when(pmod(tokenHash(concat(lit(salt + ":"), id.cast("string"))), lit(100)) < trainPct,
      "train").otherwise("test")

  /** Train/test decontamination: which held-out (test) documents share
    * word n-grams with which training documents — the standard check
    * before an evaluation set is trusted. Returns
    * (test_id, train_id, n_shared) over DISTINCT shingles.
    *
    * The join key is the 32-bit portable shingle hash, not the shingle
    * string — at corpus scale that divides the shuffled bytes by the
    * shingle length (a false-positive collision needs matching 32-bit
    * hashes, ~n_shingles²/2³² expected spurious pairs; raise to the md5
    * prefix width if that ever matters). Ubiquitous shingles should be
    * df-cut upstream for real corpora (see [[jaccardPairs]]); n-grams
    * of n ≥ 4 are rare enough that the fan-out stays linear. */
  def contaminationPairs(df: DataFrame, idCol: String, textCol: String,
                         testPred: Column, n: Int): DataFrame = {
    val flags = df.select(col(idCol).cast("long").as("id"), testPred.as("is_test"))
    // the self-join below reads `sh` twice, and the shingle generation
    // + distinct shuffle is the dominant cost: persist (lazy, lineage
    // kept) — the former eager localCheckpoint paid one extra pass
    val sh = docShingles(df, idCol, textCol, n)
      .join(flags, "id")
      .select(col("id"), col("is_test"), tokenHash(col("tok")).as("h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sh.filter(col("is_test")).select(col("id").as("test_id"), col("h"))
      .join(sh.filter(!col("is_test")).select(col("id").as("train_id"), col("h")), "h")
      .groupBy("test_id", "train_id")
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Fuzzy decontamination by CONTAINMENT: per held-out document, the
    * fraction of its distinct n-gram shingles that appear ANYWHERE in
    * the training corpus — |shingles(test) ∩ shingles(train)| /
    * |shingles(test)|. Containment (not Jaccard) is the right measure
    * here: a short eval prompt embedded verbatim in one long training
    * page has tiny Jaccard but containment ≈ 1. Returns (test_id,
    * n_shingles, n_shared); thresholding is the caller's policy.
    *
    * Shape at 100 TB: the train side collapses to DISTINCT 32-bit
    * shingle hashes before the join (the corpus's shingle multiset
    * never shuffles), and the test side joins it left-semi — each test
    * shingle contributes at most one row regardless of how many train
    * documents contain it, so the join output is bounded by the test
    * shingle count, not the pair count [[contaminationPairs]] returns. */
  def containmentScores(df: DataFrame, idCol: String, textCol: String,
                        testPred: Column, n: Int): DataFrame = {
    val flags = df.select(col(idCol).cast("long").as("id"), testPred.as("is_test"))
    // feeds the train-hash set AND the test side: persist, not an
    // eager checkpoint (same trade as contaminationPairs)
    val sh = docShingles(df, idCol, textCol, n)
      .join(flags, "id")
      .select(col("id"), col("is_test"), tokenHash(col("tok")).as("h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val trainH = sh.filter(!col("is_test")).select("h").distinct()
    val test = sh.filter(col("is_test"))
    val shared = test.join(trainH, Seq("h"), "left_semi")
      .groupBy(col("id").as("test_id"))
      .agg(count(lit(1)).as("n_shared"))
    test.groupBy(col("id").as("test_id"))
      .agg(count(lit(1)).as("n_shingles"))
      .join(shared, Seq("test_id"), "left")
      .select(col("test_id"), col("n_shingles"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"))
  }

  /** Bloom-sketch pre-filtered decontamination: the KEEP side of
    * [[contaminationPairs]] — train documents sharing NO n-gram shingle
    * with the held-out set, computed without shuffling the full train
    * shingle relation.
    *
    * The Bloom filter over distinct test shingle hashes is built once
    * (a driver-side sketch, ~1.2 bytes/element at 1% fpp — a few GB for
    * 10^10 test shingles, broadcastable) and applied AT THE SCAN to
    * train shingles. Only bloom-POSITIVE shingles enter the exact hash
    * join (false positives are resolved there; false negatives are
    * impossible, so bloom-negative train docs are definitively clean).
    * At 100 TB this turns "shuffle every train shingle" into "shuffle
    * the ~fpp-sized suspect subset" — the sketch moves to the tasks,
    * the data mostly doesn't move at all. The `mightContain` UDF is a
    * deliberate exception to the no-UDF rule: it's a pre-filter whose
    * output feeds an exact verify, never a semantics-bearing step.
    *
    * The sketch is built by `stat.bloomFilter` — a partition-local
    * build + merge aggregation on the EXECUTORS; only the final merged
    * sketch lands on the driver (that is the broadcast source, so it is
    * also the floor). Cost model: a bounded routing probe
    * (`limit(2^20+1).count()` over the already-materialized relation)
    * runs UNLESS the caller's `expectedTestShingles` asserts "large"
    * (> 2^20) — that is the only estimate this function trusts, and it
    * can only err toward the always-correct sketch route. Sketch SIZING
    * uses the estimate when it routed here, else the exact count — an
    * undersized bloom degrades silently (fpp → 1: every train shingle
    * becomes a "suspect" and the exact verify join re-inherits the full
    * shuffle the sketch was built to avoid). Small estimates are
    * deliberately NOT honored for routing: an underestimate would
    * broadcast an arbitrarily large held-out set.
    *
    * Returns the clean train document ids (one `id` column). */
  def bloomDecontaminate(df: DataFrame, idCol: String, textCol: String,
                         testPred: Column, n: Int,
                         expectedTestShingles: Long = -1L,
                         fpp: Double = 0.01): DataFrame = {
    // each side is tokenized exactly once, from only ITS documents; the
    // held-out side (small by construction) is the only relation
    // materialized — the corpus-sized train shingles stream straight
    // from the scan through the bloom filter into the verify join
    val testH = docShingles(df.filter(testPred), idCol, textCol, n)
      .select(tokenHash(col("tok")).as("h")).distinct()
      // read 3x (sizing count + bloom build + verify): persist — the
      // sizing count doubles as the materializing action
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val trainH = docShingles(df.filter(!testPred), idCol, textCol, n)
      .select(col("id"), tokenHash(col("tok")).as("h"))
    // SIZE-AWARE route: the sketch exists to avoid shuffling corpus-
    // sized train shingles against a held-out set too big to broadcast.
    // When the held-out hash set itself is broadcast-sized (≤ ~8 MB of
    // longs), the exact broadcast semi-join IS the prefilter — same
    // rows out (the bloom only ever pruned), minus the sketch build job
    // and the per-shingle non-codegen UDF the hot path paid.
    // ROUTING is never trusted to a caller's a-priori estimate: an
    // underestimate ≤ bound would broadcast an arbitrarily large
    // held-out set (driver OOM), so the broadcast route is gated on a
    // MEASURED bounded count (`limit(bound+1).count()` — stops early,
    // never materializes past the threshold). The estimate is honored
    // only when it asserts "large" (> bound): that skips the probe job
    // and can only err toward the always-correct sketch route.
    val bound = 1L << 20
    val useSketch =
      if (expectedTestShingles > bound) true
      else testH.limit(bound.toInt + 1).count() > bound
    val dirty = (if (!useSketch)
        trainH.join(broadcast(testH), Seq("h"), "left_semi")
      else {
        // sketch SIZING: honor the estimate only when it routed us here
        // (> bound); a contradicted or absent estimate falls back to the
        // exact count — an undersized bloom degrades fpp → 1 silently
        // and the verify join re-inherits the full shuffle.
        val expected =
          if (expectedTestShingles > bound) expectedTestShingles
          else math.max(testH.count(), 1L)
        val bloom = testH.stat.bloomFilter("h", expected, fpp)
        val bloomB = df.sparkSession.sparkContext.broadcast(bloom)
        val mightContain = udf((h: Long) => bloomB.value.mightContain(h))
        trainH
          .filter(mightContain(col("h"))) // sketch pre-filter at the scan
          .join(testH, "h") // exact verify over survivors only
      })
      .select("id").distinct()
    df.filter(!testPred).select(col(idCol).cast("long").as("id")).distinct()
      .join(dirty, Seq("id"), "left_anti")
  }

  /** Snapshot diff: classify every document across two corpus snapshots
    * as added / removed / changed / unchanged — the accounting step an
    * incremental crawl refresh runs before re-curating (only `added` +
    * `changed` need re-processing; `removed` ids retire from the
    * index). Comparison is by content fingerprint (md5 of canon), so a
    * re-crawled byte-identical page is `unchanged` even if fetched
    * anew.
    *
    * Scale shape: one full-outer equality join on the id — both sides
    * shuffle-partitioned by the key they'd be bucketed on in a real
    * deployment — and a narrow fingerprint compare. Nothing quadratic,
    * nothing collected. */
  def snapshotDiff(before: DataFrame, after: DataFrame,
                   idCol: String, textCol: String): DataFrame = {
    def fp(df: DataFrame, as: String) = df.select(
      col(idCol).cast("long").as("id"),
      TextAnalysis.fingerprint(col(textCol)).as(as))
    fp(before, "fp_before").join(fp(after, "fp_after"), Seq("id"), "full_outer")
      .select(col("id"),
        when(col("fp_before").isNull, "added")
          .when(col("fp_after").isNull, "removed")
          .when(col("fp_before") === col("fp_after"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** Token-set Jaccard similarity pairs via an inverted-index join:
    * pairs sharing ≥1 token, sim = |A∩B| / |A|+|B|-|A∩B|. The `maxDf`
    * document-frequency cut drops ubiquitous tokens before the join —
    * at corpus scale this is what keeps the index join subquadratic. */
  def jaccardPairs(tokens: DataFrame, maxDf: Long): DataFrame = {
    val filtered = tokens.join(
      tokens.groupBy("tok").agg(count(lit(1)).as("df"))
        .filter(col("df") <= maxDf).select("tok"),
      "tok")
    val sizes = filtered.groupBy("id").agg(count(lit(1)).as("n_toks"))
    val inter = filtered.as("x")
      .join(filtered.as("y"), col("x.tok") === col("y.tok") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("a"), col("y.id").as("b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.as("na"), col("a") === col("na.id"))
      .join(sizes.as("nb"), col("b") === col("nb.id"))
      .select(col("a"), col("b"),
        round(col("n_inter").cast("double") /
          (col("na.n_toks") + col("nb.n_toks") - col("n_inter")).cast("double"), 6)
          .as("jaccard"))
  }

  /** Positional k-token window hashes — the relational form of exact
    * SUBSTRING dedup (the "is this k-token span repeated anywhere in the
    * corpus?" question; reference pipelines answer it with a single-node
    * suffix array, which has no distributed equivalent). A rolling window
    * hash turns it into one narrow flatMap (one output row per token) and
    * one partial-aggregatable count — no suffix structure, nothing
    * superlinear. Returns (id, pos, whash), pos 1-based; docs shorter
    * than k emit nothing. The hash is the portable md5-based
    * [[tokenHash]], so a SQL oracle recomputes it bit-for-bit. */
  def spanHashes(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k > 0, s"spanHashes needs k > 0, got $k")
    // column-side window construction (split → sequence → slice →
    // concat_ws), all inside whole-stage codegen: the former typed
    // flatMap paid Row↔object serialization plus a per-doc regex pass
    // OUTSIDE codegen — measured ~2x slower on the span-dedup profile.
    df.select(col(idCol).cast("long").as("id"), tokArray(textCol).as("t"))
      .filter(size(col("t")) >= k)
      .select(col("id"), posexplode(
        transform(sequence(lit(1), size(col("t")) - lit(k - 1)),
          i => concat_ws(" ", slice(col("t"), i, lit(k))))))
      .select(col("id"), (col("pos") + 1).cast("long").as("pos"),
        tokenHash(col("col")).as("whash"))
  }

  /** The REMOVAL accounting of exact-substring dedup: for every doc,
    * how many token positions are covered by at least one duplicated
    * k-span (the exact union of overlapping span intervals, computed by
    * exploding each duplicated span into its k positions and counting
    * DISTINCT positions — fan-out is k× the duplicated spans only, and
    * both steps are keyed shuffles). Returns (id, n_removed); docs with
    * no duplicated span are absent (join back against the corpus for
    * zeros). */
  def spanRemovalCounts(spans: DataFrame, k: Int): DataFrame = {
    // read 2x (count + join-back): persist, not eager localCheckpoint —
    // lineage kept for executor-loss recompute, and no extra up-front
    // materialization pass; the ContextCleaner reclaims the blocks once
    // the returned plan is GC'd
    val s = spans.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cnt = s.groupBy("whash").agg(count(lit(1)).as("n_occ"))
    s.join(cnt.filter(col("n_occ") > 1).select("whash"), "whash")
      .select(col("id"),
        explode(sequence(col("pos"), col("pos") + (k - 1))).as("tpos"))
      .distinct()
      .groupBy("id").agg(count(lit(1)).as("n_removed"))
  }

  /** Per-document duplicated-span profile over [[spanHashes]] output:
    * n_spans, how many of the doc's spans recur anywhere in the corpus
    * (its own other positions included — a span repeated within one doc
    * is still training-loss duplication), and the duplicated fraction.
    * Two shuffles, both keyed and partial-aggregatable: span-hash count,
    * then the count joined back (hash equality join) and re-aggregated
    * by doc. The count>1 spans are exactly the removal set of
    * exact-substring dedup. */
  def spanDupProfile(spans: DataFrame): DataFrame = {
    // read 2x (count + join-back): persist — without it the whole
    // tokenize→window→hash subtree re-executes on both join inputs
    val s = spans.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cnt = s.groupBy("whash").agg(count(lit(1)).as("n_occ"))
    s.join(cnt, "whash")
      .groupBy("id")
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("n_occ") > 1, 1L).otherwise(0L)).as("n_dup_spans"))
      .select(col("id"), col("n_spans"), col("n_dup_spans"),
        round(col("n_dup_spans").cast("double") / col("n_spans"), 6).as("dup_ratio"))
  }
}
