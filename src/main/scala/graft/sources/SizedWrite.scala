package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Output FILE SIZING — the small-files answer for curated-corpus
  * writes. At 100 TB the failure mode is structural, not aesthetic: a
  * 32k-task final stage writes 32k files per partition dir; object
  * stores throttle the resulting LIST/HEAD storms, downstream scans pay
  * a footer read per file, and the metadata store becomes the
  * bottleneck long before the data does. The fix must NOT be a second
  * pass (a "write, measure, rewrite" compaction job reads the corpus
  * twice), and must not be a blind `coalesce(n)` (which caps write
  * parallelism at n and puts a human-guessed constant where a
  * measurement belongs).
  *
  * Mechanism: Spark's REBALANCE hint + AQE advisory partition size.
  * The rebalance inserts one shuffle whose RUNTIME map-output
  * statistics let AQE both coalesce small partitions and split large
  * (or skewed) ones to the advisory size — the partition count is
  * measured per run, not guessed, and write parallelism stays at the
  * data's natural width. Advisory size is in SHUFFLE-row bytes
  * (uncompressed unsafe rows); parquet output lands smaller by roughly
  * `shuffleToFileRatio` (encoding + compression), so the advisory is
  * set to `targetFileBytes * shuffleToFileRatio`. The default ratio 3.0
  * suits text-heavy snappy parquet; binary/high-entropy columns
  * compress less (ratio → 1–2), repetitive telemetry more (4–8) —
  * callers with a known corpus pass their measured ratio. (Shuffle
  * map-output blocks are themselves lz4-compressed, so the advisory
  * governs compressed-shuffle bytes — the ratio folds both
  * compressions together, which is why it is a measured knob and not a
  * constant.)
  *
  * Granularity bound: AQE can split a fat partition only at map-output
  * chunk boundaries, so a stage with M map tasks yields at most M
  * pieces per reduce partition. At production widths (thousands of map
  * tasks) this never binds; a narrow local run targeting tiny files
  * must widen the map side IN THE SOURCE RELATION (range slices, input
  * splits) — a `.repartition(n)` directly under the rebalance is
  * removed by CollapseRepartition and widens nothing (see
  * SizedWriteSpec).
  *
  * With `clusterBy` (hive-partitioned output), rows are rebalanced ON
  * the partition columns so each output directory receives a few full
  * files instead of one sliver from every task — and AQE's
  * skew-splitting inside rebalance keeps one giant partition value from
  * serializing into a single fat task.
  */
object SizedWrite {

  /** Write `df` as parquet at `path`, output files sized toward
    * `targetFileBytes`. `clusterBy` both hive-partitions the layout and
    * clusters the rebalance on those columns. The AQE sizing overrides
    * live on a CLONED session the plan is re-bound to
    * ([[org.apache.spark.sql.GraftBridge]]), so a query (or a second
    * sized write with a different target) running concurrently on the
    * shared session never observes them — there is no set/restore
    * window to race. */
  def parquetSized(df: DataFrame, path: String,
                   targetFileBytes: Long = 512L << 20,
                   shuffleToFileRatio: Double = 3.0,
                   clusterBy: Seq[String] = Nil): Unit = {
    require(targetFileBytes > 0 && shuffleToFileRatio > 0)
    val advisory = math.max(64L << 10, (targetFileBytes * shuffleToFileRatio).toLong)
    val writer = org.apache.spark.sql.GraftBridge.cloneSession(df.sparkSession)
    writer.conf.set("spark.sql.adaptive.enabled", "true")
    writer.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    writer.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
      advisory.toString)
    // the 1 MB default floor would override sub-MB advisory sizes
    // (test scale); at production targets it is a no-op
    writer.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize",
      math.min(1L << 20, math.max(1L, advisory / 4)).toString)
    val bound = org.apache.spark.sql.GraftBridge.withSession(df, writer)
    val balanced =
      if (clusterBy.isEmpty) bound.hint("rebalance")
      else bound.hint("rebalance", clusterBy.map(org.apache.spark.sql.functions.col): _*)
    val w = balanced.write.mode(SaveMode.Overwrite)
    (if (clusterBy.isEmpty) w else w.partitionBy(clusterBy: _*)).parquet(path)
  }

  /** Data-file inventory of a written dataset: (path, bytes) for every
    * parquet part file under `path`, recursive — the measurement half
    * of the sizing contract (specs and ops audits both want it). */
  def dataFiles(spark: org.apache.spark.sql.SparkSession,
                path: String): Seq[(String, Long)] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = scala.collection.mutable.ArrayBuffer[(String, Long)]()
    def walk(p: org.apache.hadoop.fs.Path): Unit =
      fs.listStatus(p).foreach { st =>
        val n = st.getPath.getName
        if (st.isDirectory) { if (!n.startsWith("_") && !n.startsWith(".")) walk(st.getPath) }
        else if (n.endsWith(".parquet")) out += ((st.getPath.toString, st.getLen))
      }
    walk(root)
    out.toSeq
  }
}
