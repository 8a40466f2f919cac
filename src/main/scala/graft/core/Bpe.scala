package graft.core

/** Deterministic byte-pair-encoding tokenizer over a COMMITTED merges
  * fixture (`graft/bpe/merges.txt`, trained by
  * `tools/gen_bpe_merges.py` on the documents corpus) — the real
  * subword counter replacing the `subwordCount` regex proxy
  * (VERDICT r14 task 3): a training pipeline budgets sequences by true
  * token counts, and the proxy under-counted exactly the rare words a
  * budget overruns on.
  *
  * Word model: lowercase, words split on `[^a-z0-9]+` (the proxy's
  * split, kept so pack/budget comparisons are apples-to-apples); each
  * word starts as single characters and merges are applied by the
  * canonical BPE encode loop — repeatedly merge ALL occurrences
  * (left-to-right, non-overlapping) of the lowest-rank adjacent pair
  * present, until none applies. Pure JVM, zero deps, object methods
  * compile to static forwarders so generated code calls them directly
  * (same shape as [[Fuzz]] under `WRatioExpression`).
  *
  * Scale shape: the merge table is a ~48-entry in-process map loaded
  * once per executor from the classpath (no broadcast needed — it
  * ships with the jar); per-word results are memoized in a bounded
  * cache, so a Zipf-distributed corpus encodes each distinct word once
  * per executor, not once per occurrence.
  */
object Bpe {

  /** The committed merges in rank order (public: the oracle twin
    * embeds them as a VALUES list to replay the encode in SQL). */
  val merges: IndexedSeq[(String, String)] = {
    val in = getClass.getClassLoader.getResourceAsStream("graft/bpe/merges.txt")
    require(in != null, "missing classpath resource graft/bpe/merges.txt")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().zipWithIndex.map { case (line, i) =>
      val t = line.split("\t", 2)
      require(t.length == 2, s"bad merges line $i: '$line'")
      (t(0), t(1))
    }.toIndexedSeq finally src.close()
  }

  /** rank keyed by "lhs\u0001rhs" — a single-string key (a separator
    * the alnum alphabet can never contain) avoids tuple allocation in
    * the hot pair-scan loop. */
  private val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      m.put(a + "\u0001" + b, i)
    }
    m
  }

  /** Merge count (the fixture's vocabulary budget minus the alphabet). */
  def nMerges: Int = merges.size

  private val NoRank = Int.MaxValue
  private def rankOf(a: String, b: String): Int = {
    val r = ranks.get(a + "\u0001" + b)
    if (r == null) NoRank else r.intValue()
  }

  /** Bounded per-JVM word cache (cleared when full — Zipf corpora
    * re-warm the head instantly; an adversarial all-distinct corpus
    * degrades to uncached encodes, never to unbounded memory). */
  private val CacheCap = 1 << 16
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[String]](1024)

  /** Canonical BPE encode of one word (already lowercase alnum). */
  def encodeWord(word: String): Array[String] = {
    if (word.isEmpty) return Array.empty
    val hit = cache.get(word)
    if (hit != null) return hit
    var seq = new Array[String](word.length)
    var i = 0
    while (i < word.length) { seq(i) = String.valueOf(word.charAt(i)); i += 1 }
    var done = seq.length <= 1
    while (!done) {
      var best = NoRank
      var j = 0
      while (j < seq.length - 1) {
        val r = rankOf(seq(j), seq(j + 1))
        if (r < best) best = r
        j += 1
      }
      if (best == NoRank) done = true
      else {
        // merge all occurrences of the (unique-ranked) best pair,
        // left-to-right non-overlapping
        val out = new Array[String](seq.length)
        var n = 0
        var k = 0
        while (k < seq.length) {
          if (k + 1 < seq.length && rankOf(seq(k), seq(k + 1)) == best) {
            out(n) = seq(k) + seq(k + 1); n += 1; k += 2
          } else {
            out(n) = seq(k); n += 1; k += 1
          }
        }
        seq = java.util.Arrays.copyOf(out, n)
        done = seq.length <= 1
      }
    }
    if (cache.size() >= CacheCap) cache.clear()
    cache.put(word, seq)
    seq
  }

  private val WordSplit = java.util.regex.Pattern.compile("[^a-z0-9]+")

  /** Words of a text under the engine's subword word-model. */
  def words(text: String): Array[String] =
    if (text == null) Array.empty
    else WordSplit.split(text.toLowerCase(java.util.Locale.ROOT))
      .filter(_.nonEmpty)

  /** BPE pieces of a whole text (word pieces concatenated in order). */
  def pieces(text: String): Array[String] = words(text).flatMap(encodeWord)

  /** True token count of a text — the budget number. Static-callable
    * from generated code ([[graft.functions.BpeCountExpression]]). */
  def countTokens(text: String): Int = {
    var n = 0
    for (w <- words(text)) n += encodeWord(w).length
    n
  }
}
