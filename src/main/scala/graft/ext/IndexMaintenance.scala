package graft.ext

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** What a [[IndexMaintenance.run]] decision did: the observability
  * surface a crawl-loop's operator reads instead of shard listings.
  * `action` is one of `"none"`, `"compactSmall"`, `"compact"`. */
case class MaintainReport(
    liveShards: Int, deadFrac: Double, action: String, folded: Seq[Int])

/** WHEN-to-compact policy for the three shard-committed index families
  * ([[TextIndex]], [[MinHashIndex]], [[VectorIndex]]) — the piece the
  * lifecycle APIs left to the caller: `append`/`delete` accrete shards
  * and tombstones forever, `compact`/`compactSmall` reclaim them, but
  * nothing decided WHEN. A long-lived crawl loop calls the family's
  * `maintain` after each ingest generation and gets the LSM-style
  * invariant: live shard count ≤ `maxShards` and index-wide dead-row
  * fraction < `tombstoneFrac`, at amortized cost (the usual call
  * decides "nothing to do" from driver-side listings plus one bounded
  * aggregate).
  *
  * Decision order:
  *  1. dead-row fraction ≥ `tombstoneFrac` → fold-ALL in-root compact
  *     (`compactAllInPlace`) — reclaims the dead mass index-wide and
  *     clears the tombstone shards observed at entry (which otherwise
  *     grow without bound; shard folds can only drop tombstones falling
  *     inside folded shards).
  *  2. live shards > `maxShards` → `compactSmall` with the byte
  *     threshold set AT the (n−maxShards+1)-th smallest shard, so at
  *     least that many fold into one and the count lands back
  *     ≤ `maxShards`. Rewrite cost stays proportional to the small
  *     tail — the whole point of size-tiered folding at 100 TB.
  *  3. otherwise → nothing.
  *
  * CONCURRENCY (round 11, hardened round 12): `maintain` is
  * single-MAINTAINER — and since round 12 that is MECHANICAL, not
  * contractual: both repair routes run under the maintenance lock
  * ([[IndexIO.acquireMaintLock]] — a second maintainer fails loud
  * while the lock is fresh; a crashed maintainer's stale lock ages out
  * after `maintLockMs`), so two racing passes can no longer fold the
  * same source shards into two new shards and serve duplicated rows.
  * `maintain` remains SAFE under concurrent APPENDS — both
  * repair routes stay inside the live root, their `reconcileShards` /
  * `gcStaging` honor the appender lease ([[IndexIO.leasedIds]] /
  * `appendLeaseMs`: a young claim or an actively-written staging dir is
  * a live appender, not crash garbage), and an appender's shard landing
  * mid-maintain is outside the fold set and the observed tombstones, so
  * both writers' work survives. The appender's side of the contract:
  * finish within the lease or re-append under a fresh id. A racing
  * DELETE also lands intact: fold-all clears only the tombstone shards
  * it observed at entry.
  */
private[ext] object IndexMaintenance {

  def run(spark: SparkSession, path: String,
          tables: Seq[String], docTable: String, idCol: String,
          maxShards: Int, tombstoneFrac: Double,
          compactAll: () => Seq[Int],
          compactSmallAt: Long => Seq[Int]): MaintainReport = {
    require(maxShards >= 1, s"maxShards must be >= 1, got $maxShards")
    val live = IndexIO.liveCommittedIds(spark, path)
    require(live.nonEmpty, s"no committed shards under $path")
    // index-wide dead fraction: one bounded aggregate — the doc relation
    // left-joined to the (tiny) distinct tombstone list, counted once
    val deadFrac =
      if (IndexIO.shardIds(spark, s"$path/deletes").isEmpty) 0.0
      else {
        val docs = IndexIO.readCommitted(spark, path, docTable, live).select(col(idCol))
        // routed like the serving path: a small tombstone set rides the
        // driver-side shard read as literals (no join at all); past the
        // bound — a mass takedown, exactly when a forced broadcast could
        // exceed driver/executor memory — fall back to a plain shuffled
        // left join and let the planner pick the build side
        val r = IndexIO.readIdShards(spark, s"$path/deletes", idCol) match {
          case Some(ids) =>
            IndexIO.smallAggHint(spark, path, docTable, live, docs)
              .agg(count(lit(1)).as("total"),
                coalesce(sum(when(col(idCol).isInCollection(ids.toSeq), 1L)), lit(0L))
                  .as("dead"))
              .collect()(0)
          case None =>
            val dels = IndexIO.readTable(spark, path, "deletes")
              .select(col(idCol)).distinct().withColumn("t", lit(1))
            docs.join(dels, Seq(idCol), "left")
              .agg(count(lit(1)).as("total"),
                coalesce(sum(col("t")), lit(0L)).as("dead"))
              .collect()(0)
        }
        val total = r.getLong(0)
        if (total == 0L) 0.0 else r.getLong(1).toDouble / total.toDouble
      }
    if (deadFrac >= tombstoneFrac) {
      val folded = compactAll()
      MaintainReport(live.size - folded.size + 1, deadFrac, "compact", folded)
    } else if (live.size > maxShards) {
      val sizes = live.map(k =>
        tables.map(t => IndexIO.dirBytes(spark, s"$path/$t/shard=$k")).sum).sorted
      val nFold = live.size - maxShards + 1
      val folded = compactSmallAt(sizes(nFold - 1))
      MaintainReport(live.size - folded.size + (if (folded.nonEmpty) 1 else 0),
        deadFrac, "compactSmall", folded)
    } else MaintainReport(live.size, deadFrac, "none", Nil)
  }
}
