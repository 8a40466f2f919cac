package graft.tools

import graft.queries.{Fixtures, Tables, TextQueries2}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Step-level wall-clock breakdown of the `ta_bm25_evolve` journey —
  * the diagnostic behind the round-10 job-count work (VERDICT r9 task
  * 6). `runMain graft.tools.EvolveProfile [sfDir] [passes]`. */
object EvolveProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = if (args.length > 1) args(1).toInt else 3
    val spark = graft.Boot.master(SparkSession.builder(), s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = Tables.table(spark, sfDir, "documents")

    def t[T](tag: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"  $tag%-10s ${(System.nanoTime() - t0) / 1e6}%8.1f ms")
      r
    }

    for (p <- 1 to passes) {
      println(s"pass $p:")
      val path = t("clone") {
        Fixtures.clonedIndex(spark, sfDir, "tindex-even") { pth =>
          graft.ext.TextIndex.write(d.filter(col("doc_id") % 2 === 0), pth)
        }
      }
      t("append") {
        graft.ext.TextIndex.append(d.filter(col("doc_id") % 2 === 1), path,
          partitions = 1)
      }
      t("delete") {
        graft.ext.TextIndex.delete(
          d.filter(col("doc_id") % 7 === 3).select("doc_id"), path)
      }
      t("serve") {
        graft.ext.TextIndex.bm25TopK(spark, path, TextQueries2.Bm25Terms, 20,
          TextQueries2.Bm25K1, TextQueries2.Bm25B).collect()
      }
    }
    spark.stop()
  }
}
