package graft.core

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** F14 — WRatio composite fuzzy similarity (reference: `ranking.py:73-76`
  * via the rapidfuzz library, `pyproject.toml:15`).
  *
  * Re-implemented from the published algorithm: the base similarity is
  * the normalized Indel (insert/delete-only, i.e. LCS-based) ratio — NOT
  * Levenshtein — combined with token-sort / token-set and partial
  * (sliding-window) variants, scaled by length-ratio-dependent weights.
  * Scores are in [0, 100].
  *
  * The reference calls WRatio on pre-normalized strings with no
  * processor (rapidfuzz ≥3 applies none by default), so no internal
  * preprocessing is done here either.
  *
  * All helpers are pure and driver/executor-safe; [[wratioUdf]] wraps the
  * scalar for distributed scoring. Strings are short place names, so the
  * O(n·m) DP is the right tool; the hot path at scale is bounded by the
  * candidate scan cap upstream, not by this function.
  */
object Fuzz {

  /** Length of the longest common subsequence (two-row DP) — the
    * reference implementation and the fallback for strings over 64
    * chars. */
  private[core] def lcsLenDP(a: CharSequence, b: CharSequence): Int = {
    val n = a.length
    val m = b.length
    if (n == 0 || m == 0) return 0
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var i = 1
    while (i <= n) {
      val ca = a.charAt(i - 1)
      var j = 1
      while (j <= m) {
        cur(j) =
          if (ca == b.charAt(j - 1)) prev(j - 1) + 1
          else math.max(prev(j), cur(j - 1))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(m)
  }

  /** Allison–Dix bit-parallel LCS length for |a| ≤ 64: one machine word
    * per row, O(|a| + |b|) word operations instead of O(|a|·|b|) cells —
    * the word-level trick rapidfuzz itself relies on. Equivalence with
    * the DP is property-tested. */
  private[core] def lcsLenBitParallel(a: CharSequence, b: CharSequence): Int = {
    val m = a.length
    // match masks: bit i set in pm(c) iff a(i) == c
    val ascii = new Array[Long](128)
    var other: Map[Char, Long] = null
    var i = 0
    while (i < m) {
      val c = a.charAt(i)
      if (c < 128) ascii(c) |= 1L << i
      else {
        if (other == null) other = Map.empty
        other = other.updated(c, other.getOrElse(c, 0L) | (1L << i))
      }
      i += 1
    }
    var row = 0L
    var j = 0
    val n = b.length
    while (j < n) {
      val c = b.charAt(j)
      val pm = if (c < 128) ascii(c) else if (other != null) other.getOrElse(c, 0L) else 0L
      val x = row | pm
      row = x & ~(x - ((row << 1) | 1L)) // modular arithmetic is the point
      j += 1
    }
    java.lang.Long.bitCount(row)
  }

  private def lcsLen(a: CharSequence, b: CharSequence): Int =
    if (a.length == 0 || b.length == 0) 0
    else if (a.length <= 64) lcsLenBitParallel(a, b)
    else if (b.length <= 64) lcsLenBitParallel(b, a)
    else lcsLenDP(a, b)

  /** Normalized Indel similarity × 100: `2·LCS / (|a|+|b|) · 100`.
    * Both empty → 100 (identical). */
  def ratio(a: String, b: String): Double = {
    val n = a.length + b.length
    if (n == 0) 100.0
    else 200.0 * lcsLen(a, b) / n
  }

  /** Best [[ratio]] alignment of the shorter string against windows of
    * the longer (including clipped windows at both edges).
    *
    * The shorter string's match masks are window-invariant, so they are
    * built ONCE and each window is just the O(window) bit-vector
    * recurrence — no per-window substring or mask allocation. Falls back
    * to the DP form for needles over 64 chars. */
  def partialRatio(a: String, b: String): Double = {
    val (s, l) = if (a.length <= b.length) (a, b) else (b, a)
    if (s.isEmpty) return if (l.isEmpty) 100.0 else 0.0
    val m = s.length
    if (m > 64) return partialRatioDP(s, l)
    val ascii = new Array[Long](128)
    var other: Map[Char, Long] = null
    var k = 0
    while (k < m) {
      val c = s.charAt(k)
      if (c < 128) ascii(c) |= 1L << k
      else {
        if (other == null) other = Map.empty
        other = other.updated(c, other.getOrElse(c, 0L) | (1L << k))
      }
      k += 1
    }
    var best = 0.0
    var i = -(m - 1)
    while (i < l.length && best < 100.0) {
      val from = math.max(0, i)
      val to = math.min(l.length, i + m)
      var row = 0L
      var j = from
      while (j < to) {
        val c = l.charAt(j)
        val pm = if (c < 128) ascii(c) else if (other != null) other.getOrElse(c, 0L) else 0L
        val x = row | pm
        row = x & ~(x - ((row << 1) | 1L))
        j += 1
      }
      val r = 200.0 * java.lang.Long.bitCount(row) / (m + (to - from))
      if (r > best) best = r
      i += 1
    }
    best
  }

  private def partialRatioDP(s: String, l: String): Double = {
    var best = 0.0
    var i = -(s.length - 1)
    while (i < l.length && best < 100.0) {
      val from = math.max(0, i)
      val to = math.min(l.length, i + s.length)
      val r = ratio(s, l.substring(from, to))
      if (r > best) best = r
      i += 1
    }
    best
  }

  private def words(s: String): Array[String] =
    s.split(' ').filter(_.nonEmpty)

  private def sortJoin(s: String): String = words(s).sorted.mkString(" ")

  def tokenSortRatio(a: String, b: String): Double =
    ratio(sortJoin(a), sortJoin(b))

  def tokenSetRatio(a: String, b: String): Double = {
    val sa = words(a).toSet
    val sb = words(b).toSet
    val sect = (sa & sb).toSeq.sorted.mkString(" ")
    val da = (sa -- sb).toSeq.sorted.mkString(" ")
    val db = (sb -- sa).toSeq.sorted.mkString(" ")
    val ab = Seq(sect, da).filter(_.nonEmpty).mkString(" ")
    val ba = Seq(sect, db).filter(_.nonEmpty).mkString(" ")
    math.max(ratio(ab, ba), math.max(ratio(sect, ab), ratio(sect, ba)))
  }

  def tokenRatio(a: String, b: String): Double =
    math.max(tokenSortRatio(a, b), tokenSetRatio(a, b))

  def partialTokenSortRatio(a: String, b: String): Double =
    partialRatio(sortJoin(a), sortJoin(b))

  /** Any shared token aligns perfectly inside the intersection-prefixed
    * join, so a non-empty intersection short-circuits to 100. */
  def partialTokenSetRatio(a: String, b: String): Double = {
    val sa = words(a).toSet
    val sb = words(b).toSet
    if ((sa & sb).nonEmpty) 100.0
    else partialRatio(sa.toSeq.sorted.mkString(" "), sb.toSeq.sorted.mkString(" "))
  }

  def partialTokenRatio(a: String, b: String): Double =
    math.max(partialTokenSortRatio(a, b), partialTokenSetRatio(a, b))

  /** Per-side input cap for [[wratio]]: scoring sees at most this many
    * leading chars. Place names live two orders of magnitude below it,
    * so real inputs are untouched; what it buys is a COST bound — the
    * worst pair costs O(MaxLen²/64) bit-ops instead of O(|a|·|b|)
    * windows, so one pathological 100 KB "name" in a bulk join can no
    * longer stall its task for minutes (the same guard rapidfuzz
    * documents via its `score_cutoff`/processor pipeline for long
    * inputs). The cap is part of the cross-engine F14 definition: the
    * DuckDB twin (`WRatioSql`) and the Python reference
    * (`tools/wratio_ref.py`) truncate identically, so parity holds on
    * EVERY input, not just short ones. */
  val MaxLen = 512

  /** First [[MaxLen]] CODE POINTS of `s` — the truncation unit must be
    * code points, not UTF-16 units: DuckDB's `left()` and Python's
    * slicing both count code points, and a UTF-16 cut could split a
    * surrogate pair, so a unit mismatch would break the documented
    * every-input cross-engine parity on astral text. The fast path
    * (length ≤ MaxLen in UTF-16 units ⇒ ≤ MaxLen code points) skips
    * the scan for all real-world names. */
  private def capLen(s: String): String =
    if (s.length <= MaxLen) s
    else {
      val cp = s.codePointCount(0, s.length)
      if (cp <= MaxLen) s else s.substring(0, s.offsetByCodePoints(0, MaxLen))
    }

  /** The WRatio composite. Empty input on either side → 0. Inputs are
    * capped to [[MaxLen]] code points BEFORE anything else (including
    * the length-ratio weighting) — see [[MaxLen]] for why. */
  def wratio(aIn: String, bIn: String): Double = {
    if (aIn == null || bIn == null || aIn.isEmpty || bIn.isEmpty) return 0.0
    val a = capLen(aIn)
    val b = capLen(bIn)
    val lenRatio =
      math.max(a.length, b.length).toDouble / math.min(a.length, b.length)
    val base = ratio(a, b)
    if (lenRatio < 1.5) {
      math.max(base, 0.95 * tokenRatio(a, b))
    } else {
      val partialScale = if (lenRatio < 8.0) 0.9 else 0.6
      val withPartial = math.max(base, partialScale * partialRatio(a, b))
      math.max(withPartial, 0.95 * partialScale * partialTokenRatio(a, b))
    }
  }

  /** Distributed form for column-wise scoring. */
  val wratioUdf: UserDefinedFunction =
    udf((a: String, b: String) => wratio(if (a == null) "" else a, if (b == null) "" else b))
}
