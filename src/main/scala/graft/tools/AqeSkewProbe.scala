package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measured arms for the AQE-skew-vs-manual-salt question (VERDICT r14
  * task 4; the executable guards live in `AqeSkewSpec`): plant a hot
  * key carrying 60% of lineitem at the given SF, then time
  *
  *   plain        shuffle join, AQE off        (the unmitigated case)
  *   aqe-skew     shuffle join, AQE skew ON    (runtime split)
  *   salted       [[graft.ext.Skew.saltedJoin]], AQE off (manual salt)
  *   salted+aqe   salted join WITH AQE on      (do they fight?)
  *
  * Each arm reports wall, the max task input rows of the join stage
  * (the number a straggler is made of), and a result digest that must
  * match across arms. Usage:
  *   runMain graft.tools.AqeSkewProbe [sfDir] [saltFactor]
  */
object AqeSkewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val saltFactor = if (args.length > 1) args(1).toInt else 8
    val spark = graft.Boot.master(SparkSession.builder(), "local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // warmup

    // repartition(32): skew-split granularity is MAP-OUTPUT chunks, so
    // the fact side must have many mappers (a single small parquet file
    // scans as one task and its partitions are unsplittable) — real
    // deployments always do; see AqeSkewSpec
    def li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .repartition(32)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        when(col("l_orderkey") % 5 < 3, lit(1L))
          .otherwise(col("l_suppkey")).as("suppkey"))
    def supp = spark.read.parquet(s"$sfDir/supplier.parquet")
      .select(col("s_suppkey").as("suppkey"), col("s_name"))

    // max task input rows across the run — the straggler metric
    val maxTaskRows = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        // shuffle-read only: the scan task reads the whole file by
        // design; the straggler question is about the JOIN stage
        val rec = t.taskMetrics match {
          case null => 0L
          case m => m.shuffleReadMetrics.recordsRead
        }
        maxTaskRows.getAndUpdate(v => math.max(v, rec))
      }
    })

    // the digest df IS the executed dataset — the plan readout must come
    // from the same QueryExecution that ran (a fresh .agg would report a
    // never-finalized AQE plan)
    def digestDf(df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sq"))
    def arm(name: String, confs: Map[String, String])(build: => DataFrame): (Long, Double) = {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // one timed steady-state run after a warm run (JIT/codegen)
      digestDf(build).collect()
      maxTaskRows.set(0)
      val t0 = System.nanoTime()
      val agged = digestDf(build)
      val r = agged.collect()(0)
      val d = (r.getLong(0), r.getDouble(1))
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // listener events are async
      val skewed = agged.queryExecution.executedPlan.toString.contains("skew=true")
      println(f"$name%-12s wall=$wall%6.2f s  maxShuffleTaskRows=${maxTaskRows.get()}%,12d  skewPlan=$skewed  digest=$d")
      confs.keys.foreach(spark.conf.unset)
      d
    }

    val noBroadcast = Map("spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val aqeOff = noBroadcast + ("spark.sql.adaptive.enabled" -> "false")
    val aqeSkew = noBroadcast ++ Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "256k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "256k")

    val d1 = arm("plain", aqeOff)(li.join(supp, "suppkey"))
    val d2 = arm("aqe-skew", aqeSkew)(li.join(supp, "suppkey"))
    val d3 = arm("salted", aqeOff)(
      graft.ext.Skew.saltedJoin(li, supp, "suppkey", saltFactor))
    val d4 = arm("salted+aqe", aqeSkew)(
      graft.ext.Skew.saltedJoin(li, supp, "suppkey", saltFactor))
    require(Set(d1, d2, d3, d4).size == 1, s"arms diverged: $d1 $d2 $d3 $d4")
    println("all arms agree")
    spark.stop()
  }
}
