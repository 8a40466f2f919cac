package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Step-level breakdown of mm_audio_features at scale (VERDICT r10 task
  * 7): separates WAV synth, persist materialization, decode, and the
  * final sort so the 100× multiple can be attributed before it is
  * fixed. `runMain graft.tools.AudioProfile [sfDir] [passes]`. */
object AudioProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft-sf10")
    val passes = if (args.length > 1) args(1).toInt else 2
    val spark = graft.Boot.master(SparkSession.builder(), s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[T](tag: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"  $tag%-14s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    for (p <- 1 to passes) {
      println(s"pass $p:")
      val docs = t("read") {
        val d = graft.queries.Tables.table(spark, sfDir, "documents")
        d.count(); d
      }
      val media = graft.ext.Multimodal.synthAudioMedia(docs, "doc_id")
      t("synth")(media.count())
      val cached = media.repartition(32, col("media_id")).persist()
      t("persist")(cached.count())
      val feats = graft.ext.Multimodal.extractAudioFeatures(cached)
      t("decode")(feats.count())
      t("decode2")(feats.count())
      t("sorted")(feats.orderBy("media_id").count())
      cached.unpersist()
    }
    spark.stop()
  }
}
