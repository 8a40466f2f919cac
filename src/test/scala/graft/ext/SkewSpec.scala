package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  import spark.implicits._

  test("salted join equals plain join on skewed data") {
    // 10k rows of one hot key + a long tail
    val large = ((1 to 10000).map(_ => ("hot", 1)) ++
      (1 to 100).map(i => (s"k$i", i))).toDF("key", "v")
    val small = (Seq(("hot", 99)) ++ (1 to 100).map(i => (s"k$i", i * 10)))
      .toDF("key", "w")

    val plain = large.join(small, "key")
      .groupBy("key").agg(count(lit(1)).as("n"), sum("w").as("sw"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val salted = Skew.saltedJoin(large, small, "key", saltFactor = 8)
      .groupBy("key").agg(count(lit(1)).as("n"), sum("w").as("sw"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(plain == salted)
    assert(salted("hot")._1 == 10000L)
  }

  test("salt actually spreads the hot key across sub-keys") {
    val large = (1 to 1000).map(_ => ("hot", 1)).toDF("key", "v")
    val saltCounts = large.withColumn("_salt",
        pmod(hash(col("key"), monotonically_increasing_id()), lit(8)))
      .groupBy("_salt").count().collect()
    assert(saltCounts.length > 4, "hot key must land in many salt buckets")
  }

  test("keyHistogram surfaces the skew") {
    val df = ((1 to 500).map(_ => "hot") ++ Seq("a", "b")).toDF("k")
    val top = Skew.keyHistogram(df, col("k")).collect()
    assert(top(0).getString(0) == "hot" && top(0).getLong(1) == 500L)
  }
}
