package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Change-data-capture apply: the MERGE/upsert half of an incremental
  * pipeline (the diff half is [[Dedup.snapshotDiff]]). Given a base
  * snapshot and a change feed carrying an op column, produce the next
  * snapshot — the semantics of SQL `MERGE WHEN MATCHED UPDATE / WHEN
  * MATCHED [op=delete] DELETE / WHEN NOT MATCHED INSERT`, the refresh
  * step every continuously-crawled corpus or dimension table needs.
  *
  * Shape at 100 TB: one left-anti join of the base against the (much
  * smaller) change-key set, plus a union with the surviving changes —
  * the base shuffles ONCE on the key (or not at all when both sides are
  * bucketed by it; see `BucketingSpec` for the layout), and the change
  * feed is broadcast when it fits. No window, no full-table rewrite
  * logic beyond the one join — the same plan Delta/Iceberg MERGE lowers
  * to, declared directly.
  */
object Cdc {

  /** Apply `changes` (same schema as `base` plus an `op` column) to
    * `base` on key `keyCol`. Rows of `base` whose key appears in
    * `changes` are replaced (op = upsert) or dropped (op = `deleteOp`);
    * change rows with unseen keys are inserts.
    *
    * A change feed must carry at most one row per key. Pass `seqCol`
    * (an ordering column — change sequence number, commit timestamp) to
    * have the feed compacted to latest-per-key HERE; without it the
    * precondition is the caller's (a duplicate-key feed would otherwise
    * emit duplicate keys into the snapshot, and a delete+upsert pair
    * for one key would resurrect the row). The compaction is one window
    * over the (small) feed — the base is untouched. For determinism,
    * `seqCol` must be unique per key; ties fall back to preferring the
    * delete (a delete+upsert at the SAME sequence number is ambiguous —
    * failing toward absence is the conservative read, and deterministic). */
  def applyChanges(base: DataFrame, changes: DataFrame, keyCol: String,
                   opCol: String = "op", deleteOp: String = "D",
                   seqCol: Option[String] = None): DataFrame = {
    val feed = seqCol.fold(changes) { s =>
      changes
        .withColumn("_cdc_rk", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(keyCol)
            .orderBy(col(s).desc,
              when(col(opCol) <=> deleteOp, 0).otherwise(1).asc)))
        .filter(col("_cdc_rk") === 1).drop("_cdc_rk")
    }
    val keep = base.join(feed.select(col(keyCol)), Seq(keyCol), "left_anti")
    // null-safe: a NULL / unmapped op is an upsert, never a silent
    // delete (the plain =!= would drop the row from the union while its
    // key already anti-joined the base row away)
    keep.unionByName(
      feed.filter(!(col(opCol) <=> deleteOp)).drop(opCol +: seqCol.toSeq: _*))
  }
}
