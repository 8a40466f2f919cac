package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketed co-located joins — the SCALE.md claim made concrete: writing
  * both join sides bucketed by the key lets the join run with NO shuffle
  * exchange on either side (the physical design for repeated large-large
  * joins at cluster scale).
  */
class BucketingSpec extends SparkSpec {

  test("bucketed tables join without a shuffle exchange") {
    // external tables at explicit temp paths (warehouse.dir is static)
    val wh = java.nio.file.Files.createTempDirectory("graft-warehouse").toString
    // AQE rewrites make the exchange check ambiguous; plain plan here
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val orders = spark.read.parquet(sf("sf0.001") + "/orders.parquet")
      val customer = spark.read.parquet(sf("sf0.001") + "/customer.parquet")
      orders.write.mode("overwrite")
        .bucketBy(4, "o_custkey").sortBy("o_custkey")
        .option("path", s"$wh/orders_b").saveAsTable("orders_b")
      customer.write.mode("overwrite")
        .bucketBy(4, "c_custkey").sortBy("c_custkey")
        .option("path", s"$wh/customer_b").saveAsTable("customer_b")
      // disable broadcast so the join would otherwise shuffle
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"), col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a non-broadcast join:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      // and it still returns the right answer
      val n = joined.count()
      val expected = orders.join(customer, col("o_custkey") === col("c_custkey")).count()
      assert(n == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", 10L * 1024 * 1024)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
