package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed UDAF (`Aggregator[IN, BUF, OUT]`) computing the centroid of
  * QUANTIZED embedding vectors: element-wise INT64 sums + a count,
  * finished as the re-quantized integer mean — the same order-free
  * integer arithmetic as `Similarity.trainIvfCentroids`'s posexplode
  * update step (integer sums are associative/commutative, so the result
  * is identical under any partitioning, which is what "reproducible at
  * 100 TB" means for a mean).
  *
  * This is the declared §2.7 UDAF surface (SURVEY.md): where the
  * posexplode formulation turns the mean into relational operators this
  * Aggregator keeps it a single partial-aggregatable function — the
  * right tool when the centroid is one column among many in a wide
  * `groupBy.agg`.
  *
  * Null/empty contract: null or empty input vectors are SKIPPED (they
  * contribute neither sums nor count); an all-null group yields an
  * empty array. Mismatched lengths within a group throw — silently
  * truncating (the dotq lesson, ADVICE round 2) would mask data bugs.
  */
final case class CentroidBuf(var sums: Array[Long], var n: Long)

object VectorCentroid extends Aggregator[Seq[Long], CentroidBuf, Seq[Long]] {
  private type Buf = CentroidBuf
  private def Buf(sums: Array[Long], n: Long): Buf = CentroidBuf(sums, n)

  override def zero: Buf = Buf(Array.empty, 0L)

  override def reduce(b: Buf, a: Seq[Long]): Buf = {
    if (a == null || a.isEmpty) b
    else if (b.n == 0L) Buf(a.toArray, 1L)
    else {
      require(a.length == b.sums.length,
        s"vector length mismatch: ${a.length} vs ${b.sums.length}")
      var i = 0
      while (i < b.sums.length) { b.sums(i) += a(i); i += 1 }
      b.n += 1
      b
    }
  }

  override def merge(x: Buf, y: Buf): Buf = {
    if (x.n == 0L) y
    else if (y.n == 0L) x
    else {
      require(x.sums.length == y.sums.length,
        s"vector length mismatch: ${x.sums.length} vs ${y.sums.length}")
      var i = 0
      while (i < x.sums.length) { x.sums(i) += y.sums(i); i += 1 }
      x.n += y.n
      x
    }
  }

  /** Integer mean, re-quantized with round-half-up — bit-identical to
    * the posexplode path's `round(sum/count)`. */
  override def finish(r: Buf): Seq[Long] =
    if (r.n == 0L) Seq.empty
    else r.sums.toSeq.map(s => math.round(s.toDouble / r.n))

  override def bufferEncoder: Encoder[Buf] = ExpressionEncoder[Buf]()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()

  /** Column form for `groupBy.agg`: `centroid(col("q_emb"))`. */
  def centroid(qEmb: Column): Column = udaf(VectorCentroid).apply(qEmb)
}
