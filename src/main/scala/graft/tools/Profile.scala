package graft.tools

import graft.queries.Registry
import org.apache.spark.sql.SparkSession

/** Ad-hoc plan/latency profiler: `runMain graft.tools.Profile <query> [sfDir]`
  * prints the formatted physical plan and 3 timed runs. */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = graft.Boot.master(SparkSession.builder(), s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = Registry.all.find(_.name == name).get
    println(q.run(spark, sfDir).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = q.run(spark, sfDir).count()
      println(f"run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    spark.stop()
  }
}
