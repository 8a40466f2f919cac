package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end corpus-curation journey as ONE program: exact dedup →
  * near-dup detection (MinHash/LSH) → clustering (connected components)
  * → keep-one-per-cluster → reproducible split assignment — the actual
  * pipeline a training-data team runs over a crawl before anything else
  * touches it.
  *
  * Every stage is the scale-shaped operator it names ([[Dedup]]): one
  * hash aggregate for exact groups, banded equality joins for candidate
  * pairs (never all-pairs), per-round equality join + min-aggregate for
  * components. The composite adds only narrow joins between stages, so
  * the whole program inherits the per-stage 100 TB story.
  */
object Curate {

  /** Tuning knobs; defaults match the dd_* inventory queries. */
  final case class Params(
      shingleN: Int = 3,
      numHashes: Int = 8,
      rowsPerBand: Int = 2,
      simThreshold: Double = 0.5,
      trainPct: Int = 90)

  /** Curated survivors of `docs`: one representative (min id) per
    * exact-duplicate group, then one (min id) per near-duplicate
    * cluster. Output: `doc_id` (the representative), `n_members` (how
    * many ORIGINAL docs collapsed into it, exact dups included — the
    * curation accounting a dataset card reports), `split`
    * (deterministic train/test routing of the survivors). */
  def run(docs: DataFrame, idCol: String, textCol: String,
          p: Params = Params()): DataFrame = {
    val base = docs.select(col(idCol).cast("long").as("id"),
      col(textCol).cast("string").as("text"))

    // 1. exact dedup: fingerprint groups, keep lowest id, remember size
    val exactKeep = base
      .groupBy(TextAnalysis.fingerprint(col("text")).as("fp"))
      .agg(min(col("id")).as("id"), count(lit(1)).as("n_exact"))
      .select("id", "n_exact")
    // read 3x downstream (shingling, the component node set, the member
    // accounting): persist, or the fingerprint scan + keep-join re-runs
    // per reader. Lazy (first reader materializes), lineage kept;
    // blocks are reclaimed by the ContextCleaner once the returned
    // plan is GC'd — the [[Dedup]] twice-read treatment.
    val kept = base.join(exactKeep, "id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // 2. near-dup pairs on the survivors: shingle → MinHash → LSH bands
    val sig = Dedup.minhashSignature(
      Dedup.docShingles(kept, "id", "text", p.shingleN, distinct = false),
      p.numHashes)
    val edges = Dedup.minhashLshPairs(sig, p.numHashes, p.rowsPerBand)
      .filter(col("est_sim") >= p.simThreshold)
      .select("a", "b")

    // 3. clusters → keep-one: label propagation converges to min id per
    // component, so the representative IS the label
    val comps = Dedup.connectedComponents(kept.select("id"), edges)

    // 4. accounting + split: every original doc is counted under its
    // final representative; survivors get the reproducible split
    val members = comps.join(kept.select("id", "n_exact"), "id")
      .groupBy(col("comp").as("doc_id"))
      .agg(sum(col("n_exact")).as("n_members"))
    members.select(
        col("doc_id"),
        col("n_members"),
        Dedup.splitAssign(col("doc_id"), p.trainPct).as("split"))
  }

  /** The WHOLE modern curation journey, [[run]] extended through corpus
    * composition: dedup/cluster/keep-one/split, then decontaminate the
    * train side against the held-out split (Bloom-sketch pre-filter,
    * exact verify — [[Dedup.bloomDecontaminate]]), re-mix the clean
    * train corpus by language at temperature 2
    * ([[Sampling.temperatureMix]]), and pack the result into
    * token-budget bins ([[Sampling.packAssign]]).
    *
    * Returns the TRAINING MANIFEST: one row per surviving train doc —
    * (doc_id, lang, n_members, shard, bin). Every stage decision is
    * portable-hash- or integer-determined, so the manifest is a pure
    * function of the corpus: bit-identical across engines, retries, and
    * partitionings (hash-checked end to end by `dd_curate_full`).
    */
  def runFull(docs: DataFrame, idCol: String, textCol: String,
              langCol: String, p: Params = Params(),
              decontamN: Int = 4, packShards: Int = 8,
              packCapacity: Long = 512L): DataFrame = {
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
      col(textCol).cast("string").as("text"), col(langCol).as("lang"))
    val survivors = run(docs, idCol, textCol, p)
    // read 3x (both decontamination sides + the clean-train join):
    // persist, or the whole curation subtree re-runs per reader
    val sdocs = survivors.join(base, "doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val clean = Dedup.bloomDecontaminate(
        sdocs, "doc_id", "text", testPred = col("split") === "test", decontamN)
      .withColumnRenamed("id", "doc_id")
    // tokenize once: the canon regex chain is the per-row hot cost, and
    // both the mix weight and the pack size consume the same count
    val cleanTrain = sdocs.filter(col("split") === "train").join(clean, "doc_id")
      .withColumn("__ntok", TextAnalysis.tokenCount(col("text")).cast("long"))
    val mixed = Sampling.temperatureMix(cleanTrain, "lang", "doc_id",
      weight = col("__ntok"))
    Sampling.packAssign(mixed, "doc_id", col("__ntok"), packShards, packCapacity)
      .select("doc_id", "lang", "n_members", "shard", "bin")
  }

  /** Materialize the curated corpus: join the [[runFull]] manifest back
    * to the document text and land it as hive-partitioned parquet — one
    * `shard=K` directory per pack shard, FILES SIZED toward
    * `targetFileBytes` ([[graft.sources.SizedWrite]]). This is the
    * journey's last mile and where 100 TB pipelines usually go wrong
    * twice over:
    *
    *   1. LAYOUT — a naive `.write.partitionBy("shard")` fans every
    *      final task across every shard dir (tasks × shards small
    *      files). The rebalance-on-`shard` write keeps each directory
    *      at a few full-size files and splits a skewed shard instead of
    *      serializing it into one fat task.
    *   2. ATOMICITY — a plain `SaveMode.Overwrite` deletes-then-writes:
    *      a training job's manifest resolver arriving mid-publish sees
    *      an empty or partial corpus, and a crashed publish destroys
    *      the previous corpus too. The corpus a trainer consumes is the
    *      LAST artifact that should be outside the commit protocol, so
    *      the write stages under a hidden dir and lands via the same
    *      versioned-pointer publish the persisted indexes use
    *      ([[IndexIO.publishVersioned]]): rename to a fresh `v{N}` no
    *      reader resolves yet, then one atomic CURRENT flip — readers
    *      ([[readPublished]]) always see old-or-new, never torn.
    *
    * Crash garbage (a staging dir or an unreferenced version from a
    * death before the pointer flip) is invisible to readers and is
    * reclaimed by [[gcPublished]]. Returns the published version path.
    */
  def publish(manifest: DataFrame, docs: DataFrame, idCol: String,
              textCol: String, root: String,
              targetFileBytes: Long = 512L << 20,
              shuffleToFileRatio: Double = 3.0): String = {
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
      col(textCol).cast("string").as("text"))
    val spark = manifest.sparkSession
    val staging = IndexIO.shardStagingFor(root)
    graft.sources.SizedWrite.parquetSized(
      manifest.join(base, "doc_id"), staging,
      targetFileBytes, shuffleToFileRatio, clusterBy = Seq("shard"))
    IndexIO.publishVersioned(spark, staging, root)
  }

  /** The corpus the CURRENT pointer names — the trainer-side entry
    * point. Resolves the pointer, gates on the format stamp (a corpus
    * republished by a newer engine must refuse loudly, not misread),
    * and reads the resolved version dir whole; `shard` comes back as a
    * partition column. */
  def readPublished(spark: org.apache.spark.sql.SparkSession,
                    root: String): DataFrame = {
    val resolved = IndexIO.resolveCurrent(spark, root)
    IndexIO.requireSupportedFormat(spark, resolved)
    spark.read.parquet(resolved)
  }

  /** Reclaim rolled-past corpus versions and crash-orphaned staging
    * dirs ([[IndexIO.pruneVersions]] + [[IndexIO.gcStaging]]) — never
    * run as part of publish, so a reader mid-resolve can't have its
    * version deleted out from under it by the very publish it raced. */
  def gcPublished(spark: org.apache.spark.sql.SparkSession, root: String,
                  keepLast: Int = 2): Unit = {
    IndexIO.pruneVersions(spark, root, keepLast)
    IndexIO.gcStaging(spark, root)
  }
}
