package graft.ext

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF vector index — the vector twin of
  * [[graft.etl.TrigramIndex]]: build the coarse-quantizer structure
  * ONCE, write it as tables, and serve every later query batch from
  * the stored layout instead of re-deriving centroids and assignments
  * per query ([[Similarity.ivfTopK]] is the build-inline form).
  *
  * Layout is the 100 TB point: posting lists are range-laid-out and
  * sorted by centroid id, so a query batch that probes `nprobe` lists
  * reads ONLY the row groups covering those ids (min/max pruning —
  * the same lever as the trigram index's gram-sorted postings and the
  * gazetteer's (lat, lon) range layout). The quantized codes are
  * stored IN the posting rows: the serving path never rejoins the raw
  * embeddings.
  */
object VectorIndex {

  /** Build and persist the index: `centroids` (cid, cent_emb) and
    * `postings` (cid, cand_id, c_emb) sorted by cid. `iterations` > 0
    * Lloyd-refines the deterministic seed centroids
    * ([[Similarity.trainIvfCentroids]]). */
  def write(corpus: DataFrame, path: String, nCentroids: Int,
            iterations: Int = 0, partitions: Int = 8): Unit = {
    val cent =
      if (iterations > 0)
        Similarity.trainIvfCentroids(corpus, nCentroids, iterations)
      else corpus.orderBy("vec_id").limit(nCentroids)
        .select(col("vec_id").as("cid"),
          Similarity.quantize(col("embedding")).as("cent_emb"))
    cent.write.mode(SaveMode.Overwrite).parquet(s"$path/centroids")
    // assign against the JUST-WRITTEN centroids: re-using the unmaterialized
    // `cent` plan would re-run its full-corpus TakeOrdered a second time,
    // and reading back also guarantees postings match the persisted table
    val centStored = corpus.sparkSession.read.parquet(s"$path/centroids")
    val q = corpus.select(col("vec_id").as("cand_id"),
      Similarity.quantize(col("embedding")).as("c_emb"))
    Similarity.nearestCentroid(q, centStored, "cand_id", "c_emb")
      .select(col("cid"), col("cand_id"), col("c_emb"))
      .repartitionByRange(partitions, col("cid"))
      .sortWithinPartitions("cid", "cand_id")
      .write.mode(SaveMode.Overwrite).parquet(s"$path/postings")
  }

  /** Serve a (small) query batch from the stored index: assign each
    * query to its `nprobe` nearest centroids, then read ONLY those
    * posting lists — the probed cids are collected to a LITERAL `IN`
    * predicate (a handful of ids for a serving batch), so the filter
    * pushes to the parquet scan and the cid-sorted layout prunes row
    * groups; a join would read every list. Exact re-rank inside the
    * probed lists, ties to the lowest candidate id — identical
    * semantics to [[Similarity.ivfTopK]] with the same centroids. */
  def topK(spark: SparkSession, path: String, queries: DataFrame,
           k: Int, nprobe: Int): DataFrame = {
    val cent = broadcast(spark.read.parquet(s"$path/centroids"))
    val probes = queries
      .select(col("vec_id").as("query_id"),
        Similarity.quantize(col("embedding")).as("q_emb"))
      .crossJoin(cent)
      .select(col("query_id"), col("q_emb"), col("cid"),
        Similarity.cosineQ(col("q_emb"), col("cent_emb")).as("csim"))
      .withColumn("crank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("csim").desc, col("cid").asc)))
      .filter(col("crank") <= nprobe)
      .select("query_id", "q_emb", "cid")
      .localCheckpoint(true) // read twice: cid collect + the probe join
    val cids = probes.select("cid").distinct()
      .collect().map(_.getLong(0)).toSeq
    Similarity.exactReRank(
      spark.read.parquet(s"$path/postings")
        .filter(col("cid").isInCollection(cids))
        .join(probes, Seq("cid")),
      k)
  }
}
