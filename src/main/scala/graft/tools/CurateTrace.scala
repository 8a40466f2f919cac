package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level wall decomposition of the curation journey
  * (dd_curate_full / dd_curate_published): exact dedup → LSH pairs →
  * components → accounting → decontaminate → mix → pack → publish.
  * Each phase is forced with a count so the wall attributes to the
  * stage that computes it (persists make later phases incremental, the
  * same way the one-program query executes them).
  *
  *   sbt "runMain graft.tools.CurateTrace [sfDir] [passes]"
  */
object CurateTrace {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = if (args.length > 1) args(1).toInt else 2
    val spark = graft.Boot.master(SparkSession.builder(), "local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[T](tag: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"  $tag%-26s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    val p = graft.ext.Curate.Params()
    for (pass <- 1 to passes) {
      println(s"pass $pass:")
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .withColumn("lang",
          when(col("doc_id") % 3 === 0, "en")
            .when(col("doc_id") % 3 === 1, "de").otherwise("fr"))
      val base = docs.select(col("doc_id").cast("long").as("id"),
        col("text").cast("string").as("text"))
      val exactKeep = base
        .groupBy(graft.ext.TextAnalysis.fingerprint(col("text")).as("fp"))
        .agg(min(col("id")).as("id"), count(lit(1)).as("n_exact"))
        .select("id", "n_exact")
      val kept = base.join(exactKeep, "id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("exact dedup + keep") { kept.count() }
      val sig = graft.ext.Dedup.minhashSignature(
        graft.ext.Dedup.docShingles(kept, "id", "text", p.shingleN,
          distinct = false), p.numHashes)
      val edges = graft.ext.Dedup.minhashLshPairs(sig, p.numHashes, p.rowsPerBand)
        .filter(col("est_sim") >= p.simThreshold).select("a", "b")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("shingle+minhash+LSH pairs") { edges.count() }
      val comps = t("components") {
        val c = graft.ext.Dedup.connectedComponents(kept.select("id"), edges)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        c.count(); c
      }
      val survivors = t("accounting+split") {
        val m = comps.join(kept.select("id", "n_exact"), "id")
          .groupBy(col("comp").as("doc_id"))
          .agg(sum(col("n_exact")).as("n_members"))
          .select(col("doc_id"), col("n_members"),
            graft.ext.Dedup.splitAssign(col("doc_id"), p.trainPct).as("split"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        m.count(); m
      }
      val baseLang = docs.select(col("doc_id").cast("long").as("doc_id"),
        col("text").cast("string").as("text"), col("lang"))
      val sdocs = survivors.join(baseLang, "doc_id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("sdocs join") { sdocs.count() }
      val clean = t("decontaminate") {
        val c = graft.ext.Dedup.bloomDecontaminate(
          sdocs, "doc_id", "text", testPred = col("split") === "test", 4)
          .withColumnRenamed("id", "doc_id")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        c.count(); c
      }
      val manifest = t("mix+pack") {
        val cleanTrain = sdocs.filter(col("split") === "train").join(clean, "doc_id")
          .withColumn("__ntok",
            graft.ext.TextAnalysis.tokenCount(col("text")).cast("long"))
        val mixed = graft.ext.Sampling.temperatureMix(cleanTrain, "lang", "doc_id",
          weight = col("__ntok"))
        val m = graft.ext.Sampling.packAssign(mixed, "doc_id", col("__ntok"), 8, 512L)
          .select("doc_id", "lang", "n_members", "shard", "bin")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        m.count(); m
      }
      t("publish + read back") {
        val root = graft.core.TempDirs.create("graft-curtrace-") + "/corpus"
        graft.ext.Curate.publish(manifest, docs, "doc_id", "text", root,
          targetFileBytes = 1L << 20)
        graft.ext.Curate.readPublished(spark, root).count()
      }
      Seq(kept, edges, comps, survivors, sdocs, clean, manifest)
        .foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
