package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[SizedWrite]] contract: output parquet files land NEAR the target
  * size — measured by AQE from runtime shuffle statistics, not guessed
  * — the write is a single pass (one rebalance shuffle, no
  * write-measure-rewrite), data round-trips exactly, and the session's
  * AQE settings are restored afterward. Size assertions are bands, not
  * equalities: the advisory governs shuffle-row bytes and parquet
  * re-compresses, so the contract is "a few well-sized files", never
  * "exactly N bytes". */
class SizedWriteSpec extends SparkSpec {

  import spark.implicits._

  private def fresh(tag: String) = java.nio.file.Files
    .createTempDirectory(s"graft-sized-$tag").toString + "/out"

  // ~200 bytes of md5-hex payload per row: high-entropy, so shuffle
  // bytes and parquet bytes stay the same order of magnitude. 48 range
  // SLICES (not .repartition(48) — CollapseRepartition removes a
  // repartition directly under the rebalance) widen the map side: AQE
  // splits only at map-output chunk boundaries, and this suite's
  // local[4] session would otherwise cap the split at 4 pieces per
  // reduce partition — a test-scale artifact, see the granularity note
  // on [[SizedWrite.parquetSized]].
  private def corpus(n: Int) = spark.range(0, n, 1, 48)
    .select(col("id"),
      concat_ws("", (0 until 6).map(i => md5(concat(col("id"), lit(i)))): _*)
        .as("payload"),
      (col("id") % 4).cast("int").as("part"))

  private def checksum(path: String): (Long, Long) = {
    val df = spark.read.parquet(path)
    val cols = df.columns.sorted.map(c => col(c).cast("string"))
    val r = df.select(
      sum(pmod(xxhash64(cols: _*), lit(100000000000L))).as("h"),
      count(lit(1)).as("n")).collect()(0)
    (r.getLong(1), r.getLong(0))
  }

  test("files land near the target size and the data round-trips exactly") {
    val src = corpus(120000)
    val expected = {
      val cols = src.columns.sorted.map(c => col(c).cast("string"))
      val r = src.select(
        sum(pmod(xxhash64(cols: _*), lit(100000000000L))).as("h"),
        count(lit(1)).as("n")).collect()(0)
      (r.getLong(1), r.getLong(0))
    }
    val out = fresh("band")
    // ~25 MB of payload, 256 KiB target, ratio 1.0 (high-entropy rows)
    SizedWrite.parquetSized(src, out,
      targetFileBytes = 256L << 10, shuffleToFileRatio = 1.0)
    val files = SizedWrite.dataFiles(spark, out)
    val total = files.map(_._2).sum
    val ideal = total / (256.0 * 1024)
    assert(files.size >= (ideal / 3).toInt && files.size <= (ideal * 3).toInt + 1,
      s"${files.size} files for ~${ideal.round} ideal (total=$total B)")
    // no slivers: every file (the possible remainder aside) within a
    // loose band of the target
    val sizes = files.map(_._2).sorted.reverse
    assert(sizes.head <= (256L << 10) * 4,
      s"largest file ${sizes.head} B blew past the target band")
    assert(sizes.dropRight(1).forall(_ >= (256L << 10) / 8),
      s"sliver files: ${sizes.filter(_ < (256L << 10) / 8)}")
    assert(checksum(out) === expected)
  }

  test("a big target coalesces a many-partition relation to one file") {
    val out = fresh("one")
    SizedWrite.parquetSized(corpus(5000).repartition(64), out,
      targetFileBytes = 1L << 30, shuffleToFileRatio = 1.0)
    val files = SizedWrite.dataFiles(spark, out)
    assert(files.size === 1, files.map(_._1))
    assert(spark.read.parquet(out).count() === 5000)
  }

  test("clusterBy partitions the layout and keeps files-per-dir small") {
    val out = fresh("clustered")
    SizedWrite.parquetSized(corpus(120000), out,
      targetFileBytes = 1L << 20, shuffleToFileRatio = 1.0,
      clusterBy = Seq("part"))
    val files = SizedWrite.dataFiles(spark, out)
    val byDir = files.groupBy(f => f._1.substring(0, f._1.lastIndexOf('/')))
    assert(byDir.keySet.map(d => d.substring(d.lastIndexOf('/') + 1)) ===
      Set("part=0", "part=1", "part=2", "part=3"))
    // each ~6 MB dir at a 1 MiB target must land a handful of full
    // files, not one per upstream task
    byDir.foreach { case (d, fs) =>
      assert(fs.size <= 24, s"$d has ${fs.size} files")
    }
    assert(spark.read.parquet(out).count() === 120000)
  }

  test("session AQE settings are restored after the write") {
    val k = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    val before = spark.conf.getOption(k)
    SizedWrite.parquetSized(corpus(1000), fresh("restore"),
      targetFileBytes = 1L << 20)
    assert(spark.conf.getOption(k) === before)
  }
}
