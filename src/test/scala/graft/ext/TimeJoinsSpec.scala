package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class TimeJoinsSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s"2024-01-01 $s")

  test("asofBackward: inclusive boundary, latest-prior match, no-match nulls, key isolation") {
    val left = Seq(
      (1L, 1L, ts("09:58:00"), 10.0), // before any right row -> nulls
      (2L, 1L, ts("10:00:00"), 20.0), // equal ts -> inclusive match
      (3L, 1L, ts("10:04:00"), 30.0), // between right rows -> 10:00
      (4L, 1L, ts("10:06:00"), 40.0), // after last -> 10:05
      (5L, 2L, ts("10:04:00"), 50.0)  // other key: only key-2 rights apply
    ).toDF("event_id", "user_id", "ts", "value")
    val right = Seq(
      (1L, ts("09:59:00"), 1.0),
      (1L, ts("10:00:00"), 2.0),
      (1L, ts("10:05:00"), 3.0),
      (2L, ts("10:01:00"), 9.0)
    ).toDF("user_id", "ts", "v")
    val got = TimeJoins.asofBackward(left, right, "user_id", "ts", Seq("v"))
      .select("event_id", "r_ts", "r_v").collect()
      .map(r => r.getLong(0) -> (Option(r.getTimestamp(1)), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap
    assert(got(1L) == ((None, None)))
    assert(got(2L) == ((Some(ts("10:00:00")), Some(2.0))))
    assert(got(3L) == ((Some(ts("10:00:00")), Some(2.0))))
    assert(got(4L) == ((Some(ts("10:05:00")), Some(3.0))))
    assert(got(5L) == ((Some(ts("10:01:00")), Some(9.0))))
  }

  test("asofBackward: NULL payload on the matched row stays NULL; NULL-ts rights never match") {
    val left = Seq((1L, 1L, ts("10:30:00"), 0.0), (2L, 2L, ts("10:30:00"), 0.0))
      .toDF("event_id", "user_id", "ts", "value")
    val right = Seq(
      (1L, Some(ts("09:00:00")), Some(5.0)),
      (1L, Some(ts("10:00:00")), None),     // matched row carries NULL v
      (2L, None, Some(7.0))                 // NULL ts: range-unmatchable
    ).toDF("user_id", "ts", "v")
    val got = TimeJoins.asofBackward(left, right, "user_id", "ts", Seq("v"))
      .select("event_id", "r_ts", "r_v").collect()
      .map(r => r.getLong(0) -> (Option(r.getTimestamp(1)), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap
    // the 10:00 row matches WHOLE — its NULL payload must not be
    // backfilled from the older 09:00 row (the per-column-carry chimera)
    assert(got(1L) == ((Some(ts("10:00:00")), None)))
    // a NULL-ts right row is no match, not a wildcard match
    assert(got(2L) == ((None, None)))
  }

  test("asofBackward: NULL-key rows never match each other (equality-join semantics)") {
    val left = Seq(
      (1L, None, ts("10:30:00"), 0.0),      // NULL-key left: no match ever
      (2L, Some(1L), ts("10:30:00"), 0.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val right = Seq(
      (None, Some(ts("10:00:00")), Some(5.0)),  // NULL-key right: matches nothing
      (Some(1L), Some(ts("10:00:00")), Some(9.0))
    ).toDF("user_id", "ts", "v")
    val got = TimeJoins.asofBackward(left, right, "user_id", "ts", Seq("v"))
      .select("event_id", "r_v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    // `l.key = r.key` (and DuckDB ASOF JOIN) never matches NULL = NULL
    assert(got(1L) == None)
    assert(got(2L) == Some(9.0))
  }

  test("asofBackward: reserved output column names on the left input fail loudly") {
    val right = Seq((1L, ts("10:00:00"), 1.0)).toDF("user_id", "ts", "v")
    for (bad <- Seq("__side", "__match", "r_ts", "r_v")) {
      val left = Seq((1L, ts("10:30:00"), 0.0)).toDF("user_id", "ts", bad)
      val e = intercept[IllegalArgumentException] {
        TimeJoins.asofBackward(left, right, "user_id", "ts", Seq("v"))
      }
      assert(e.getMessage.contains(bad))
    }
  }

  test("intervalJoin: inverted interval yields zero rows, not a bucket explosion") {
    val points = Seq((1L, ts("10:00:00"))).toDF("pid", "p_ts")
    val bad = Seq((9L, ts("10:00:00"), Timestamp.valueOf("1970-01-01 00:00:00")))
      .toDF("iid", "s_ts", "e_ts") // end before start: sequence would descend
    assert(TimeJoins.intervalJoin(points, "p_ts", bad, "s_ts", "e_ts", 60).isEmpty)
  }

  test("property: asofBackward equals the naive range-join argmax on random data") {
    val rng = new scala.util.Random(20260812L)
    // random events over few keys with ts collisions across sides,
    // NULL payloads, and keys that exist on only one side
    val left = (1 to 300).map(i =>
      (i.toLong, (rng.nextInt(8) + 1).toLong, ts(f"${rng.nextInt(12) + 8}%02d:${rng.nextInt(60)}%02d:00"), rng.nextDouble()))
      .toDF("event_id", "user_id", "ts", "value")
    val right = (1 to 200).map { i =>
      (((i % 10) + 1).toLong, ts(f"${rng.nextInt(12) + 8}%02d:${rng.nextInt(60)}%02d:00"),
        if (rng.nextInt(5) == 0) None else Some(rng.nextDouble()))
    }.toDF("user_id", "ts", "v")
      // determinism contract: unique per (key, ts)
      .groupBy("user_id", "ts").agg(first("v").as("v"))
    val got = TimeJoins.asofBackward(left, right, "user_id", "ts", Seq("v"))
      .select("event_id", "r_ts", "r_v").orderBy("event_id").collect().toSeq
    // naive oracle: range join + per-left-row argmax on right ts —
    // quadratic, but unambiguous
    val naive = left.as("l")
      .join(right.as("r"),
        col("l.user_id") === col("r.user_id") && col("l.ts") >= col("r.ts"), "left")
      .groupBy(col("l.event_id").as("event_id"))
      .agg(max(col("r.ts")).as("r_ts"),
        max_by(col("r.v"), col("r.ts")).as("r_v"))
      .orderBy("event_id").collect().toSeq
    assert(got.map(_.toString) == naive.map(_.toString))
  }

  test("property: intervalJoin equals the naive range join on random intervals") {
    val rng = new scala.util.Random(77L)
    val points = (1 to 400).map(i =>
      (i.toLong, ts(f"${rng.nextInt(12) + 8}%02d:${rng.nextInt(60)}%02d:${rng.nextInt(60)}%02d")))
      .toDF("pid", "p_ts")
    val ivals = (1 to 120).map { i =>
      val start = ts(f"${rng.nextInt(12) + 8}%02d:${rng.nextInt(60)}%02d:00")
      val lenSec = rng.nextInt(7200) - 600 // some inverted/empty on purpose
      (i.toLong, start, new Timestamp(start.getTime + lenSec * 1000L))
    }.toDF("iid", "s_ts", "e_ts")
    val got = TimeJoins.intervalJoin(points, "p_ts", ivals, "s_ts", "e_ts", 900)
      .select("pid", "iid").as[(Long, Long)].collect().toSeq
    val naive = points.join(ivals,
        col("p_ts") >= col("s_ts") && col("p_ts") < col("e_ts"))
      .select("pid", "iid").as[(Long, Long)].collect().toSeq
    assert(got.sorted == naive.sorted)
    assert(got.size == got.toSet.size)
  }

  test("intervalJoin: half-open containment across bucket boundaries, no duplicates") {
    val points = Seq(
      (1L, ts("10:00:00")), // == start: included
      (2L, ts("10:29:59")), // inside
      (3L, ts("10:30:00")), // == end: excluded (half-open)
      (4L, ts("11:15:00")), // inside the second, longer interval
      (5L, ts("09:00:00"))  // outside everything
    ).toDF("pid", "p_ts")
    val ivals = Seq(
      (10L, ts("10:00:00"), ts("10:30:00")),
      (20L, ts("10:20:00"), ts("12:00:00")) // spans several 30-min buckets
    ).toDF("iid", "s_ts", "e_ts")
    val got = TimeJoins.intervalJoin(points, "p_ts", ivals, "s_ts", "e_ts", 1800)
      .select("pid", "iid").as[(Long, Long)].collect().toSeq
    assert(got.toSet == Set((1L, 10L), (2L, 10L), (2L, 20L), (3L, 20L), (4L, 20L)))
    assert(got.size == got.toSet.size) // each true match found exactly once
  }
}
