package graft.ext

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MinHash/LSH text-dedup index — the text twin of
  * [[VectorIndex]]: compute signatures ONCE, store them plus their
  * band buckets as tables, and serve candidate-pair queries from the
  * stored layout. [[Dedup.minhashLshPairs]] is the build-inline form;
  * its `localCheckpoint` materialization is the single-JVM shortcut
  * (executor-local storage dies with executors on a real cluster) —
  * this index is the durable replacement for the serving path.
  *
  * Layout is the 100 TB point: `signatures` (id, m0..m{n-1}) range-laid
  * and sorted by id, so the pair-scoring joins read id-clustered row
  * groups; `buckets` (band, bucket, id) range-laid and sorted by
  * (band, bucket), so the LSH self-join shuffles pre-clustered keys and
  * a targeted bucket probe prunes row groups (the [[graft.etl.TrigramIndex]]
  * gram-sorted-postings lever). Publication is one directory rename
  * ([[IndexIO]]) — readers never see signatures from one build paired
  * with buckets from another.
  */
object MinHashIndex {

  /** (id, band, bucket) band keys for a signature relation — the SAME
    * key construction as the inline [[Dedup.minhashLshPairs]], factored
    * so the persisted and inline paths cannot drift. */
  def bands(sig: DataFrame, numHashes: Int, rowsPerBand: Int): DataFrame = {
    val numBands = numHashes / rowsPerBand
    (0 until numBands).map { b =>
      val key = concat_ws("_",
        (lit(b) +: (0 until rowsPerBand).map(r => col(s"m${b * rowsPerBand + r}"))): _*)
      sig.select(col("id"), lit(b).as("band"), key.as("bucket"))
    }.reduce(_ union _)
  }

  /** Build and publish the index from an (id, tok) relation (the
    * [[Dedup.docTokens]] / [[Dedup.docShingles]] shapes). Signatures are
    * written first, then bands are derived from the WRITTEN table (one
    * aggregate runs once; re-using the unmaterialized plan would re-run
    * the tokenize→min aggregate per band branch — the same trap the
    * inline form needs its checkpoint for). */
  def write(tokens: DataFrame, path: String, numHashes: Int,
            rowsPerBand: Int, partitions: Int = 8): Unit = {
    require(numHashes % rowsPerBand == 0,
      s"numHashes=$numHashes must be a multiple of rowsPerBand=$rowsPerBand")
    val spark = tokens.sparkSession
    val staging = IndexIO.stagingFor(path)
    Dedup.minhashSignature(tokens, numHashes)
      .repartitionByRange(partitions, col("id"))
      .sortWithinPartitions("id")
      .write.mode(SaveMode.Overwrite).parquet(s"$staging/signatures")
    val sigStored = spark.read.parquet(s"$staging/signatures")
    bands(sigStored, numHashes, rowsPerBand)
      .repartitionByRange(partitions, col("band"), col("bucket"))
      .sortWithinPartitions("band", "bucket", "id")
      .write.mode(SaveMode.Overwrite).parquet(s"$staging/buckets")
    IndexIO.publish(spark, staging, path)
  }

  /** Append new documents' signatures to a stored index WITHOUT a full
    * rebuild — the incremental-crawl refresh path (the [[VectorIndex.append]]
    * twin). New (id, tok) rows are signed with the same hash family,
    * their band keys derived identically, both tables re-laid-out and
    * republished by one rename. Reading the old tables while writing to
    * staging is safe — the destination is untouched until the rename.
    *
    * Equivalence: append(write(A), B) ≡ write(A ∪ B) bit-for-bit for
    * disjoint id sets (signatures are per-id aggregates; the layout
    * re-sort makes union order immaterial) — spec-pinned. Appending ids
    * already present would produce DUPLICATE signature rows, not merged
    * ones (MinHash of a doc's token set is not incrementally mergeable
    * from two partial token sets unless the split is exact) — callers
    * route re-crawled docs through [[Dedup.snapshotDiff]] and rebuild
    * or retire those ids first. */
  def append(tokens: DataFrame, path: String, numHashes: Int,
             rowsPerBand: Int, partitions: Int = 8): Unit = {
    require(numHashes % rowsPerBand == 0,
      s"numHashes=$numHashes must be a multiple of rowsPerBand=$rowsPerBand")
    val spark = tokens.sparkSession
    val staging = IndexIO.stagingFor(path)
    val oldSig = spark.read.parquet(s"$path/signatures")
    // a numHashes that disagrees with the stored signature width would
    // silently re-band the whole index with different keys; fail loudly
    // against the stored schema instead (id + m0..m{n-1})
    require(oldSig.schema.fieldNames.length - 1 == numHashes,
      s"stored index at $path has ${oldSig.schema.fieldNames.length - 1} " +
        s"minhashes, append called with numHashes=$numHashes")
    Dedup.minhashSignature(tokens, numHashes)
      .unionByName(oldSig)
      .repartitionByRange(partitions, col("id"))
      .sortWithinPartitions("id")
      .write.mode(SaveMode.Overwrite).parquet(s"$staging/signatures")
    val sigStored = spark.read.parquet(s"$staging/signatures")
    bands(sigStored, numHashes, rowsPerBand)
      .repartitionByRange(partitions, col("band"), col("bucket"))
      .sortWithinPartitions("band", "bucket", "id")
      .write.mode(SaveMode.Overwrite).parquet(s"$staging/buckets")
    IndexIO.publish(spark, staging, path)
  }

  /** All candidate pairs from the stored index: docs sharing any band
    * bucket, scored by agreeing-minhash fraction — identical semantics
    * (and identical output) to [[Dedup.minhashLshPairs]] over the same
    * tokens. The bucket self-join is an equality join on the stored
    * (band, bucket) layout; nothing re-tokenizes, nothing checkpoints. */
  def pairs(spark: SparkSession, path: String, numHashes: Int): DataFrame = {
    val sig = spark.read.parquet(s"$path/signatures")
    val bk = spark.read.parquet(s"$path/buckets")
    val cand = bk.as("l").join(bk.as("r"),
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("a"), col("r.id").as("b"))
      .distinct()
    val agree = (0 until numHashes)
      .map(i => when(col(s"sa.m$i") === col(s"sb.m$i"), 1).otherwise(0))
      .reduce(_ + _)
    cand
      .join(sig.as("sa"), col("a") === col("sa.id"))
      .join(sig.as("sb"), col("b") === col("sb.id"))
      .select(col("a"), col("b"),
        round(agree.cast("double") / numHashes, 6).as("est_sim"))
  }
}
