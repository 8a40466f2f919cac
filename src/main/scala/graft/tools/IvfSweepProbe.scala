package graft.tools

import graft.ext.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF list-count / nprobe sweep on the CLUSTERED fixture (VERDICT r16
  * task 7 stretch): `ann_recall_clustered` runs 8 untrained lists
  * against 16 clusters at nprobe=1 and still sees recall 1.00 — the
  * curve never bends in the audited range. This sweep finds the bend:
  * lists ∈ {8, 16, 32} × trained ∈ {seeded, Lloyd-5} × nprobe ∈
  * {1, 2, 4}, reporting mean recall@5 over 20 queries AND the cost
  * axis (mean candidate fraction = probed-list population / corpus),
  * completing SCALE.md's clustered-regime table.
  *
  * The interesting regime: with lists > clusters, a cluster SPLITS
  * across lists and its queries' true neighbors land in sibling lists —
  * nprobe=1 should finally lose recall; Lloyd training should place
  * list boundaries BETWEEN clusters and recover it.
  *
  *   sbt "runMain graft.tools.IvfSweepProbe [sfDir]"
  */
object IvfSweepProbe {

  private val Centers = 16
  private val Pull = 0.85
  private val K = 5
  private val NQueries = 20

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Boot.master(SparkSession.builder(), "local[32]")
      .appName("graft-ivf-sweep")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the queries' clustered fixture, replicated (85% pull toward the
    // embedding of vec_id % 16 — the ann_recall_clustered shape)
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    val centers = e.filter(col("vec_id") < Centers)
      .select(col("vec_id").as("center_id"), col("embedding").as("cemb"))
    val cemb = e.join(broadcast(centers),
        (col("vec_id") % Centers) === col("center_id"))
      .select(col("vec_id"),
        zip_with(col("cemb"), col("embedding"), (c, x) =>
          (lit(Pull) * c.cast("double") +
            lit(1.0 - Pull) * x.cast("double")).cast("float")).as("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val corpusN = cemb.count()
    val q = cemb.filter(col("vec_id") < NQueries)
    val truth = Similarity.bruteForceTopK(q, cemb, K)
      .select(col("query_id"), col("cand_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    truth.count()

    println(s"corpus $corpusN vectors, $Centers clusters, $NQueries queries, recall@$K")
    println(f"${"lists"}%5s ${"train"}%7s ${"nprobe"}%6s ${"recall"}%7s ${"cand_frac"}%10s")
    for (lists <- Seq(8, 16, 32); trained <- Seq(false, true)) {
      val cents =
        if (!trained) cemb.orderBy("vec_id").limit(lists)
          .select(col("vec_id").as("cid"),
            Similarity.quantize(col("embedding")).as("cent_emb"))
        else Similarity.trainIvfCentroids(cemb, lists, iterations = 5)
      val centB = broadcast(cents).persist()
      centB.count()
      // corpus list assignment → per-list populations (the cost axis)
      val assigned = cemb
        .select(col("vec_id"), Similarity.quantize(col("embedding")).as("q_emb"))
        .crossJoin(centB)
        .select(col("vec_id"), col("cid"),
          Similarity.cosineQ(col("q_emb"), col("cent_emb")).as("csim"))
        .groupBy("vec_id")
        .agg(max_by(col("cid"), struct(col("csim"), -col("cid"))).as("cid"))
      val listPop = assigned.groupBy("cid").agg(count(lit(1)).as("pop"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // query probe ranks (which lists each query would scan)
      val qProbes = q
        .select(col("vec_id").as("query_id"),
          Similarity.quantize(col("embedding")).as("q_emb"))
        .crossJoin(centB)
        .select(col("query_id"), col("cid"),
          Similarity.cosineQ(col("q_emb"), col("cent_emb")).as("csim"))
        .withColumn("crank", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("query_id")
            .orderBy(col("csim").desc, col("cid").asc)))
        .filter(col("crank") <= 4)
        .select("query_id", "cid", "crank")
        .collect()
      for (np <- Seq(1, 2, 4)) {
        val retr = Similarity.ivfTopK(q, cemb, K, lists, np,
          centroids = Some(centB))
        val recall = truth.as("t")
          .join(retr.select(col("query_id"), col("cand_id")).as("r"),
            Seq("query_id", "cand_id"), "left_semi")
          .count().toDouble / truth.count()
        val frac = qProbes.filter(_.getInt(2) <= np)
          .groupBy(_.getLong(0)).values
          .map(_.map(r => listPop.getOrElse(r.getLong(1), 0L)).sum.toDouble / corpusN)
        val meanFrac = frac.sum / frac.size
        println(f"$lists%5d ${if (trained) "lloyd5" else "seeded"}%7s $np%6d " +
          f"$recall%7.3f $meanFrac%10.4f")
      }
      centB.unpersist()
    }
    spark.stop()
  }
}
