package graft.functions

import graft.ext.Dedup
import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Count-min sketch as a typed partial-aggregatable UDAF: frequency
  * estimation with FIXED memory. The buffer is a flattened depth×width
  * count matrix (e.g. 4×256 = 8 KB), so the shuffle moves one sketch
  * per partition instead of one row per distinct key — the point of a
  * sketch at 100 TB, where the heavy-hitter candidate space (tokens,
  * URLs, shingles) is corpus-sized but the question ("how often does X
  * occur, roughly?") needs only bounded state. Estimates are one-sided:
  * `estimate ≥ true count` always. The classic ~2N/width overshoot
  * bound assumes pairwise-independent hash rows; these rows are FIXED
  * affine functions of one md5-derived hash (the price of cross-engine
  * reproducibility), so treat the bound as a heuristic for
  * md5-uniform keys, not an adversarial guarantee.
  *
  * Hashing is the same engine-portable affine-over-md5 family as
  * MinHash ([[Dedup.minhashA]]/[[Dedup.minhashB]] mod
  * [[Dedup.MinhashPrime]] mod width) — a DuckDB oracle rebuilds every
  * bucket index and count EXACTLY, so even the sketch's collisions are
  * hash-checkable cross-engine (`ta_cms_heavy`), unlike Spark's
  * built-in `stat.countMinSketch` whose murmur hashing is
  * JVM-implementation-specific.
  *
  * Input is the 32-bit portable hash of the key ([[Dedup.tokenHash]]),
  * not the key itself — hash once upstream, in codegen.
  */
final case class CmsBuf(var counts: Array[Long])

/** Input rows are (hash, weight): CMS is LINEAR, so a weighted update
  * equals `weight` repeated unit updates — build the sketch from an
  * already-aggregated (key, count) relation when one exists (vocab-
  * sized input instead of corpus-occurrence-sized; see `ta_cms_heavy`)
  * and from raw hashes with weight 1 on streams. */
final class CountMin(depth: Int, width: Int)
    extends Aggregator[(java.lang.Long, java.lang.Long), CmsBuf, Seq[Long]] {

  private def bucket(d: Int, h: Long): Int =
    (((h * Dedup.minhashA(d) + Dedup.minhashB(d)) % Dedup.MinhashPrime) % width).toInt

  override def zero: CmsBuf = CmsBuf(Array.empty)

  override def reduce(b: CmsBuf, in: (java.lang.Long, java.lang.Long)): CmsBuf = {
    val (h, w) = in
    if (h == null || w == null) return b // null hash (md5 of null) is skipped
    if (b.counts.isEmpty) b.counts = Array.ofDim[Long](depth * width)
    var d = 0
    while (d < depth) { b.counts(d * width + bucket(d, h)) += w; d += 1 }
    b
  }

  override def merge(x: CmsBuf, y: CmsBuf): CmsBuf = {
    if (x.counts.isEmpty) y
    else if (y.counts.isEmpty) x
    else {
      var i = 0
      while (i < x.counts.length) { x.counts(i) += y.counts(i); i += 1 }
      x
    }
  }

  override def finish(r: CmsBuf): Seq[Long] =
    if (r.counts.isEmpty) Seq.fill(depth * width)(0L) else r.counts.toSeq

  override def bufferEncoder: Encoder[CmsBuf] = ExpressionEncoder[CmsBuf]()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}

object CountMin {

  /** Column form over raw occurrences: `cmsketch(hashCol, 4, 256)`. */
  def cmsketch(hash: Column, depth: Int, width: Int): Column =
    cmsketchWeighted(hash, lit(1L), depth, width)

  /** Weighted column form over pre-aggregated (hash, count) rows. */
  def cmsketchWeighted(hash: Column, weight: Column,
                       depth: Int, width: Int): Column =
    udaf(new CountMin(depth, width)).apply(hash, weight)

  /** Point-estimate lookup against a sketch COLUMN (array produced by
    * [[cmsketch]]): min over depths of the key's bucket count. Pure
    * column arithmetic — usable after a broadcast join of the 1-row
    * sketch relation. */
  def estimate(sketch: Column, hash: Column, depth: Int, width: Int): Column = {
    val perDepth = (0 until depth).map { d =>
      element_at(sketch,
        (((hash * Dedup.minhashA(d) + Dedup.minhashB(d)) % Dedup.MinhashPrime)
          % width).cast("int") + d * width + 1)
    }
    least(perDepth: _*)
  }
}
