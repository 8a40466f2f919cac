package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DYNAMIC partition pruning — the runtime half of the pruning
  * contract ([[TextTablesSpec]] pins the static half). At 100 TB the
  * dominant fact-table access is a star join whose partition keys are
  * only known AFTER filtering a dimension ("events for the campaign
  * days"): a literal filter can't prune because the days are data, not
  * constants. Catalyst's DPP inserts the dim-side filter result as a
  * runtime `dynamicpruning` subquery into the fact scan's
  * PartitionFilters, so the scan opens only matching directories —
  * without it the join reads the whole fact table and filters after
  * the scan, which at scale is the difference between touching 4
  * partitions and 10,000. This spec pins (1) the pruning expression in
  * the scan, (2) the actually-read partition count from scan metrics,
  * and (3) result equality with the unpruned plan. */
class DynamicPruningSpec extends SparkSpec {

  import spark.implicits._

  test("a star join prunes fact partitions at runtime from the dim filter") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-dpp").toString
    // fact: 20 day-partitions; dim: day → group, filter selects 4 days
    TextTables.writePartitioned(
      spark.range(0, 40000, 1, 8)
        .select(col("id"), (col("id") % 20).cast("int").as("day"),
          md5(col("id").cast("string")).as("payload")),
      s"$dir/fact", "day")
    val dim = (0 until 20).map(d => (d, d % 5)).toDF("d_day", "d_grp")
    dim.write.parquet(s"$dir/dim")

    val fact = spark.read.parquet(s"$dir/fact")
    val dimT = spark.read.parquet(s"$dir/dim")
    val joined = fact.join(dimT.filter(col("d_grp") === 0),
      col("day") === col("d_day"))
    // collect() (not count()) so the INSPECTED QueryExecution is the
    // one that ran — count() plans its own separate execution and the
    // scan metrics below would read zero
    val got = joined.collect().length.toLong
    assert(got === 4 * 2000L)

    val plan = joined.queryExecution.executedPlan
    assert(plan.toString.contains("dynamicpruning"),
      s"no dynamicpruning expression in the fact scan:\n$plan")
    // the fact scan's own metrics: only the 4 matching day-dirs read.
    // collectWithSubqueries does not descend into an adaptive plan's
    // final tree, and AQE's QueryStageExec wrappers are LEAVES hiding
    // their subtree in `plan` — recurse through both
    def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] =
      p.collectWithSubqueries { case s => s }.flatMap {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a +: allNodes(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          q +: allNodes(q.plan)
        case s => Seq(s)
      }
    val scans = allNodes(plan).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
        if s.metadata.get("Location").exists(_.contains("fact")) => s
    }
    assert(scans.nonEmpty, "fact FileSourceScanExec not found")
    val partsRead = scans.head.metrics("numPartitions").value
    assert(partsRead === 4, s"read $partsRead of 20 partitions, wanted 4")

    // equality vs a plan with pruning disabled
    val off = spark.sessionState.conf
    val key = "spark.sql.optimizer.dynamicPartitionPruning.enabled"
    spark.conf.set(key, "false")
    try {
      val unpruned = fact.join(dimT.filter(col("d_grp") === 0),
        col("day") === col("d_day")).count()
      assert(unpruned === got)
    } finally spark.conf.set(key, "true")
  }
}
