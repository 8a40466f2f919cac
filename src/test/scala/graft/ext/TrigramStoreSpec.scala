package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The shard-protocol trigram store ([[TrigramStore]]): live-view
  * equality with the bulk artifact, watermark semantics for updates
  * (the duplicate-free contract the exact-count probe depends on),
  * crash inertness of uncommitted watermarks, snapshot pins, and the
  * fold. */
class TrigramStoreSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("osm_id", LongType),
    StructField("name_local_norm", StringType),
    StructField("name_en_norm", StringType)))

  private def pois(rows: (Long, String, String)*): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2, r._3))),
      schema)

  private def tmp(): String = graft.core.TempDirs.create("graft-trigstore-")

  private def postingSet(df: DataFrame): Set[(String, Int, Long)] =
    df.collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet

  test("write + postings equals the bulk artifact") {
    val p = pois((1L, "monograph dining", "monograph"), (2L, "blue bottle", null))
    val path = tmp() + "/ix"
    TrigramStore.write(p, path)
    assert(postingSet(TrigramStore.postings(spark, path)) ==
      postingSet(graft.etl.TrigramIndex.build(p)))
  }

  test("append supersedes the upserted ids' old postings — no duplicates, rebuild equality") {
    val base = pois((1L, "old cafe", null), (2L, "stable name", null))
    val path = tmp() + "/ix"
    TrigramStore.write(base, path)
    // rename id 1, insert id 3
    val delta = pois((1L, "renamed cafe", null), (3L, "fresh bakery", null))
    TrigramStore.append(delta, path)
    val after = pois((1L, "renamed cafe", null), (2L, "stable name", null),
      (3L, "fresh bakery", null))
    val live = TrigramStore.postings(spark, path)
    assert(postingSet(live) == postingSet(graft.etl.TrigramIndex.build(after)),
      "live view must equal a bulk rebuild over the updated pois")
    // the probe's exact-count contract: no (gram, col, id) duplicates
    val dups = live.groupBy("gram", "col_id", "osm_id")
      .agg(count(lit(1)).as("n")).filter(col("n") > 1).count()
    assert(dups == 0L, "duplicate postings would turn the exact-count probe into false negatives")
  }

  test("delete watermarks remove an id everywhere; a later re-append serves it again") {
    val base = pois((1L, "doomed diner", null), (2L, "survivor", null))
    val path = tmp() + "/ix"
    TrigramStore.write(base, path)
    TrigramStore.delete(spark, path, Seq(1L))
    assert(postingSet(TrigramStore.postings(spark, path)) ==
      postingSet(graft.etl.TrigramIndex.build(pois((2L, "survivor", null)))))
    // re-crawl of a deleted id: the re-append's own watermark is newer
    TrigramStore.append(pois((1L, "reborn diner", null)), path)
    val after = pois((1L, "reborn diner", null), (2L, "survivor", null))
    assert(postingSet(TrigramStore.postings(spark, path)) ==
      postingSet(graft.etl.TrigramIndex.build(after)))
  }

  test("a watermark naming an UNCOMMITTED shard is inert (crash ordering)") {
    val base = pois((1L, "old cafe", null))
    val path = tmp() + "/ix"
    TrigramStore.write(base, path)
    // simulate the append crash window: watermark published, marker
    // never landed — shard 99 does not exist in commits
    import spark.implicits._
    val staging = IndexIO.shardStagingFor(s"$path/deletes")
    Seq((1L, 99L)).toDF("osm_id", "below").coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(staging)
    IndexIO.publishShard(spark, staging, s"$path/deletes/shard=0")
    assert(postingSet(TrigramStore.postings(spark, path)) ==
      postingSet(graft.etl.TrigramIndex.build(base)),
      "a watermark for a shard that never committed must not subtract anything")
  }

  test("pins freeze the served state; compactAll fails pinned reads LOUDLY") {
    val base = pois((1L, "old cafe", null), (2L, "stable name", null))
    val path = tmp() + "/ix"
    TrigramStore.write(base, path)
    val pin0 = TrigramStore.pinNow(spark, path)
    TrigramStore.append(pois((1L, "renamed cafe", null)), path)
    // the pre-append pin still serves the pre-append state (rollback)
    assert(postingSet(TrigramStore.postingsPinned(spark, path, pin0)) ==
      postingSet(graft.etl.TrigramIndex.build(base)))
    val pin1 = TrigramStore.pinNow(spark, path)
    val liveBefore = postingSet(TrigramStore.postings(spark, path))
    val folded = TrigramStore.compactAll(spark, path)
    assert(folded.nonEmpty)
    assert(postingSet(TrigramStore.postings(spark, path)) == liveBefore,
      "fold must not change the served rows")
    assert(IndexIO.shardIds(spark, s"$path/deletes").isEmpty,
      "fold-all applies and clears every observed watermark")
    // both pre-fold pins name folded-away shards: loud, never partial
    val e = intercept[java.io.IOException] {
      TrigramStore.postingsPinned(spark, path, pin1)
    }
    assert(e.getMessage.contains("no longer exist"))
    intercept[java.io.IOException] {
      TrigramStore.postingsPinned(spark, path, pin0)
    }
  }

  test("format gate inherited: a future-format store refuses this binary's mutations") {
    val path = tmp() + "/ix"
    IndexIO.formatOverride = Some(2)
    try TrigramStore.write(pois((1L, "future cafe", null)), path)
    finally IndexIO.formatOverride = None
    IndexIO.resetCachesForTest()
    val e = intercept[java.io.IOException] {
      TrigramStore.append(pois((2L, "straggler", null)), path)
    }
    assert(e.getMessage.contains("newer"))
    val e2 = intercept[java.io.IOException] {
      TrigramStore.delete(spark, path, Seq(1L))
    }
    assert(e2.getMessage.contains("newer"))
  }
}
