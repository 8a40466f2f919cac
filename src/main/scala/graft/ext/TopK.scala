package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed deterministic per-group top-k WITHOUT a per-group global
  * sort.
  *
  * `Window.partitionBy(group).orderBy(...)` ranks every row of a group in
  * ONE task — with few groups (languages, sources) that is a full-corpus
  * sort into a handful of tasks, the classic skew scale-killer. This
  * helper replaces it with two bounded aggregates:
  *
  *  1. per-(input-partition, group): collect + sort + `slice` to k.
  *     Each task buffers at most its own input split (the sum of its
  *     per-group buffers is the partition's rows), and only k rows per
  *     (partition, group) survive to the shuffle;
  *  2. per-group merge of the ≤ partitions×k survivors — a tiny
  *     aggregate no matter how large the corpus.
  *
  * Result is independent of partitioning: both phases order by the same
  * total-ordered sort struct, so the merged top-k equals the global
  * top-k (selection is associative for a total order — the caller must
  * make the struct a TOTAL order, i.e. include a unique tiebreaker).
  */
object TopK {

  /** Top `k` rows per group by ascending `sortStruct` (a `struct(...)`
    * column whose field order defines the sort; make it total). Output:
    * the group columns, `pos` (0-based rank), and `col` (the struct) —
    * unpack payload fields from `col`. */
  def perGroupTopK(df: DataFrame, groupCols: Seq[String],
                   sortStruct: Column, k: Int): DataFrame =
    df.groupBy((spark_partition_id().as("__p") +: groupCols.map(col)): _*)
      .agg(slice(sort_array(collect_list(sortStruct)), 1, k).as("__top"))
      .groupBy(groupCols.map(col): _*)
      .agg(slice(sort_array(flatten(collect_list(col("__top")))), 1, k).as("__top"))
      .select((groupCols.map(col) :+ posexplode(col("__top"))): _*)
}
