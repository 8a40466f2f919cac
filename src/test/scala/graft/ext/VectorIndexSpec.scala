package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The persisted IVF index (ext/VectorIndex): result parity with the
  * build-inline form, and the serving-path scan claims — the probed
  * cids reach the parquet scan as a pushed filter over the cid-sorted
  * layout, and the index build is what pays the assignment cost.
  */
class VectorIndexSpec extends SparkSpec {

  private def emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")

  private val path = java.nio.file.Files
    .createTempDirectory("graft-vindex-spec").toString

  test("persisted-index topK equals the build-inline ivfTopK") {
    VectorIndex.write(emb, path, nCentroids = 8)
    val stored = VectorIndex.topK(spark, path,
        emb.filter(col("vec_id") < 5), k = 5, nprobe = 2)
      .select("query_id", "rank", "cand_id", "cosine")
      .orderBy("query_id", "rank").collect()
    val inline = Similarity.ivfTopK(
        emb.filter(col("vec_id") < 5), emb, k = 5, nCentroids = 8, nprobe = 2)
      .select("query_id", "rank", "cand_id", "cosine")
      .orderBy("query_id", "rank").collect()
    assert(stored.nonEmpty && stored.sameElements(inline))
  }

  test("probed cids are pushed to the postings scan as a literal filter") {
    VectorIndex.write(emb, path, nCentroids = 8)
    val df = VectorIndex.topK(spark, path,
      emb.filter(col("vec_id") < 5), k = 5, nprobe = 2)
    val plan = df.queryExecution.executedPlan.toString
    assert("PushedFilters: \\[[^\\]]*[Ii]n\\(cid".r.findFirstIn(plan).isDefined,
      s"cid IN filter not pushed to the postings scan:\n$plan")
  }

  test("trained centroids drop in: write(iterations=2) serves and stays deterministic") {
    VectorIndex.write(emb, path, nCentroids = 4, iterations = 2)
    val a = VectorIndex.topK(spark, path, emb.filter(col("vec_id") < 3),
      k = 3, nprobe = 1).orderBy("query_id", "rank").collect()
    val b = VectorIndex.topK(spark, path, emb.filter(col("vec_id") < 3),
      k = 3, nprobe = 1).orderBy("query_id", "rank").collect()
    assert(a.nonEmpty && a.sameElements(b))
  }
}
