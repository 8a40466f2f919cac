package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Delta-refresh cost probe (VERDICT r16 task 1's sf10 bar): a real
  * gazetteer refresh applies a SMALL change feed — the g15/g16 oracle
  * feed deliberately touches 30% of ids uniformly (every id-range
  * partition), which exercises correctness but cannot show the
  * delta-proportional cost. This probe measures the production shape:
  *
  *   base    — full partitioned build (untimed here; the one-time cost)
  *   delta   — [[graft.etl.GazetteerBuilder.refreshDelta]] with a feed
  *             confined to ~0.1% of ids in a few id ranges (renames +
  *             localized inserts + deletes)
  *   rebuild — [[graft.etl.GazetteerBuilder.writeVersioned]] over the
  *             CDC-applied corpus (what the pre-round-17 refresh
  *             journey paid per batch)
  *
  * and prints the rebuild/delta ratio. Done-bar: ≥5× at sf10.
  *
  *   sbt "runMain graft.tools.GazRefreshProbe [sfDir] [passes]"
  */
object GazRefreshProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = if (args.length > 1) args(1).toInt else 3
    val spark = graft.Boot.master(SparkSession.builder(), "local[32]")
      .appName("graft-gaz-refresh-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the g15/g16 raw shape, inlined (Fixtures is queries-private):
    // part ⋈ customer with synthetic tags + wkt
    val part = spark.read.parquet(s"$sfDir/part.parquet")
    val customer = spark.read.parquet(s"$sfDir/customer.parquet")
    val raw = part.join(customer, col("p_partkey") === col("c_custkey"))
      .select(
        col("p_partkey").cast("long").as("id"),
        col("p_name").as("name"),
        map_from_arrays(array(lit("amenity"), lit("name")),
          array(lower(col("p_type")), col("p_name"))).as("tags"),
        concat(lit("POINT("),
          (lit(-180.0) + (col("c_custkey") * 73 % 36000) / 100.0), lit(" "),
          (lit(-85.0) + (col("c_custkey") * 37 % 17000) / 100.0), lit(")"))
          .as("wkt"))

    val maxId = raw.agg(max(col("id"))).head.getLong(0)
    // ~0.1% of ids, CONFINED to the low id range (locality is the
    // production shape: a region re-crawl, a batch of edits)
    val window = math.max(100L, maxId / 1000L)
    def localized(r: DataFrame): DataFrame = r.filter(col("id") <= window)
    val renames = localized(raw).filter(col("id") % 3 === 0)
      .withColumn("name", concat(col("name"), lit(" annex")))
      .withColumn("op", lit("U"))
    val deletes = localized(raw).filter(col("id") % 3 === 1)
      .withColumn("op", lit("D"))
    val inserts = localized(raw).filter(col("id") % 3 === 2)
      .withColumn("id", col("id") + lit(maxId + 1L))
      .withColumn("name", concat(lit("new "), col("name")))
      .withColumn("op", lit("I"))
    // a production CDC feed ARRIVES as a table (a crawl diff, an edit
    // log) — materialize it so the timed refresh reads a delta-sized
    // parquet, not a live join over the whole corpus
    val feedPath = graft.core.TempDirs.create("graft-gazprobe-feed-")
    renames.unionByName(deletes).unionByName(inserts)
      .coalesce(4).write.mode("overwrite").parquet(feedPath)
    val feed = spark.read.parquet(feedPath)
    val feedN = feed.count()

    val root = graft.core.TempDirs.create("graft-gazprobe-") + "/gaz"
    val tBase0 = System.nanoTime()
    graft.etl.GazetteerBuilder.writeVersionedPartitioned(spark, raw, root)
    val baseS = (System.nanoTime() - tBase0) / 1e9

    val applied = graft.ext.Cdc.applyChanges(raw, feed, "id")
    println(f"base build (one-time): $baseS%6.2f s; feed rows: $feedN " +
      f"(~${100.0 * feedN / maxId}%.2f%% of corpus, low-id-range localized)")
    println(f"${"pass"}%4s ${"delta_s"}%8s ${"rebuild_s"}%10s ${"ratio"}%7s")
    val ratios = (1 to passes).map { p =>
      val t0 = System.nanoTime()
      val vd = graft.etl.GazetteerBuilder.refreshDelta(spark, root, feed)
      val deltaS = (System.nanoTime() - t0) / 1e9
      val rroot = graft.core.TempDirs.create("graft-gazprobe-full-") + "/gaz"
      val t1 = System.nanoTime()
      graft.etl.GazetteerBuilder.writeVersioned(spark, applied, rroot)
      val rebuildS = (System.nanoTime() - t1) / 1e9
      // equality guard: the timed delta produced the rebuild's corpus
      val dn = graft.etl.GazetteerBuilder.readPois(spark, vd).count()
      val rn = spark.read.parquet(
        s"${graft.ext.VersionedStore.resolveCurrent(spark, rroot)}/pois").count()
      require(dn == rn, s"delta pois $dn != rebuild pois $rn")
      println(f"$p%4d $deltaS%8.2f $rebuildS%10.2f ${rebuildS / deltaS}%6.1fx")
      rebuildS / deltaS
    }
    val med = ratios.sorted.apply(ratios.size / 2)
    println(f"median rebuild/delta ratio: $med%5.1fx  " +
      s"(bar: >=5x — ${if (med >= 5.0) "MET" else "NOT MET"})")
    spark.stop()
  }
}
