package graft.queries

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import graft.SparkSpec
import org.apache.spark.sql.types.TimestampType

/** Pins the events loader against BOTH Parquet ts encodings the driver
  * has shipped (TIMESTAMP(NANOS) through round 6, TIMESTAMP(MICROS)
  * from round 7) so a future fixture regeneration cannot silently break
  * the 15 events-table queries again (VERDICT r7 headline). The two
  * committed fixtures in src/test/resources carry identical logical
  * rows; `Tables.events` must load both to the same TIMESTAMP values.
  */
class EventsEncodingSpec extends SparkSpec {

  /** Copy a committed fixture into a temp dir under the `events.parquet`
    * name `Tables.events` expects, return the dir. */
  private def stage(resource: String): String = {
    val dir = Files.createTempDirectory("graft-events-enc")
    dir.toFile.deleteOnExit()
    val src = Paths.get(s"src/test/resources/$resource")
    Files.copy(src, dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    dir.toString
  }

  private def load(resource: String) = Tables.events(spark, stage(resource))

  test("nanos and micros fixtures load to identical TIMESTAMP values") {
    val nanos  = load("events_nanos.parquet")
    val micros = load("events_micros.parquet")

    assert(nanos.schema("ts").dataType == TimestampType)
    assert(micros.schema("ts").dataType == TimestampType)
    assert(nanos.schema == micros.schema)

    val cols = nanos.columns.sorted.toSeq
    val a = nanos.select(cols.map(org.apache.spark.sql.functions.col): _*)
      .orderBy("event_id").collect().toSeq
    val b = micros.select(cols.map(org.apache.spark.sql.functions.col): _*)
      .orderBy("event_id").collect().toSeq
    assert(a == b)
    assert(a.size == 5)
  }

  test("micros load does not depend on the legacy nanosAsLong flag") {
    // A fresh-session read of a MICROS file must succeed with the flag
    // unset and must not set it as a side effect.
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    val df = load("events_micros.parquet")
    assert(df.count() == 5)
    // getOption falls back to the conf default ("false") — the loader
    // must not have flipped it to "true" on the micros path.
    assert(!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
  }

  test("normalized ts renders the pinned wall-clock instants (UTC session)") {
    import org.apache.spark.sql.functions._
    val got = load("events_nanos.parquet")
      .orderBy("event_id")
      .select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq(
      "2024-01-01 00:00:00.000000",
      "2024-01-01 00:00:00.123456",
      "2024-01-01 01:00:00.000000",
      "2024-01-01 02:00:00.500000",
      "2024-01-01 03:00:00.999999"))
  }

  test("streaming front-end loads both encodings (schema probe + normalize)") {
    // eventsStream is private; exercise its building blocks on both
    // fixtures: raw schema probe, the layout-agnostic source, then
    // normalizeTs on the stream frame.
    for (res <- Seq("events_nanos.parquet", "events_micros.parquet")) {
      val dir = stage(res)
      val schema = Tables.rawEvents(spark, s"$dir/events.parquet").schema
      val stream = Tables.normalizeTs(
        StreamingQueries.tableStream(spark, dir, "events", schema))
      assert(stream.isStreaming)
      assert(stream.schema("ts").dataType == TimestampType)
      val name = s"enc_probe_${System.nanoTime()}"
      val q = stream.writeStream.format("memory").queryName(name)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      assert(spark.table(name).count() == 5)
    }
  }
}
