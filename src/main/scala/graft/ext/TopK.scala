package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._

/** Distributed deterministic per-group top-k WITHOUT a per-group global
  * sort.
  *
  * `Window.partitionBy(group).orderBy(...)` ranks every row of a group in
  * ONE task — with few groups (languages, sources) that is a full-corpus
  * sort into a handful of tasks, the classic skew scale-killer. This
  * helper replaces it with:
  *
  *  1. a per-partition streaming prune (typed `mapPartitions`): one
  *     bounded max-heap per group present in the partition, O(groups×k)
  *     memory, no buffering of the partition — and only the k smallest
  *     rows per (partition, group) survive to the ONLY shuffle, so the
  *     exchange carries ≤ partitions×groups×k rows however large the
  *     corpus is;
  *  2. a per-group merge of those survivors — a tiny aggregate.
  *
  * Result is independent of partitioning: both phases order by the same
  * total-ordered sort struct, so the merged top-k equals the global
  * top-k (bounded selection is associative for a total order — the
  * caller must make the struct TOTAL, i.e. include a unique tiebreaker).
  *
  * Ordering contract: the struct fields are compared field-by-field with
  * their natural (`Comparable`) order, nulls first — identical to
  * `sort_array` ascending on a struct. Fields must be atomic orderable
  * types (numbers, strings, timestamps); null fields are supported but a
  * null tiebreaker makes the order non-total.
  */
object TopK {

  private def cmpVal(a: Any, b: Any): Int = (a, b) match {
    case (null, null) => 0
    case (null, _) => -1
    case (_, null) => 1
    case (x: Comparable[_], y) => x.asInstanceOf[Comparable[Any]].compareTo(y)
    case (x, _) => throw new IllegalArgumentException(
      s"topK sort field of unorderable type ${x.getClass.getName}")
  }

  /** sort_array-ascending semantics over struct rows. */
  private def cmpStruct(a: Row, b: Row): Int = {
    var i = 0
    while (i < a.length) {
      val c = cmpVal(a.get(i), b.get(i))
      if (c != 0) return c
      i += 1
    }
    0
  }

  /** Top `k` rows per group by ascending `sortStruct` (a `struct(...)`
    * column whose field order defines the sort; make it total). Output:
    * the group columns, `pos` (0-based rank), and `col` (the struct) —
    * unpack payload fields from `col`. */
  def perGroupTopK(df: DataFrame, groupCols: Seq[String],
                   sortStruct: Column, k: Int): DataFrame = {
    require(k > 0, s"topK needs k > 0, got $k")
    val ng = groupCols.length
    val flat = df.select(groupCols.map(col) :+ sortStruct.as("__s"): _*)
    implicit val enc = Encoders.row(flat.schema)
    val heapOrd: Ordering[Row] = (a: Row, b: Row) =>
      cmpStruct(a.getStruct(ng), b.getStruct(ng))
    val pruned = flat.mapPartitions { rows =>
      // one bounded max-heap per group in this partition: O(groups × k)
      // memory, single streaming pass, nothing buffered
      val heaps = scala.collection.mutable.HashMap
        .empty[Seq[Any], scala.collection.mutable.PriorityQueue[Row]]
      rows.foreach { r =>
        val key = (0 until ng).map(r.get)
        val h = heaps.getOrElseUpdate(key,
          scala.collection.mutable.PriorityQueue.empty[Row](heapOrd))
        if (h.size < k) h.enqueue(r)
        else if (heapOrd.compare(r, h.head) < 0) { h.dequeue(); h.enqueue(r) }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }
    pruned
      .groupBy(groupCols.map(col): _*)
      .agg(slice(sort_array(collect_list(col("__s"))), 1, k).as("__top"))
      .select(groupCols.map(col) :+ posexplode(col("__top")): _*)
  }
}
