package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-phase top-k must equal the window formulation it replaced — for
  * any partitioning (the selection is a total-order merge, so the result
  * may not depend on how the input is split). */
class TopKSpec extends SparkSpec {

  import spark.implicits._

  private val rows = (1 to 500).map { i =>
    (s"g${i % 7}", (i * 2654435761L % 97).toLong, i.toLong)
  }

  private def windowed(k: Int) =
    rows.toDF("g", "v", "id")
      .withColumn("rank", row_number().over(
        Window.partitionBy("g").orderBy(col("v").asc, col("id").asc)))
      .filter(col("rank") <= k)
      .select(col("g"), col("v"), col("id"), (col("rank") - 1).cast("int").as("pos"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .toSet

  test("matches the window formulation across partitionings") {
    for (parts <- Seq(1, 3, 32)) {
      val got = TopK.perGroupTopK(
          rows.toDF("g", "v", "id").repartition(parts),
          Seq("g"), struct(col("v"), col("id")), 4)
        .select(col("g"), col("col.v"), col("col.id"), col("pos").cast("int"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
        .toSet
      assert(got == windowed(4), s"mismatch at $parts partitions")
    }
  }

  test("k larger than the group returns the whole group, still ranked") {
    val tiny = Seq(("a", 3L, 1L), ("a", 1L, 2L), ("b", 2L, 3L)).toDF("g", "v", "id")
    val got = TopK.perGroupTopK(tiny, Seq("g"), struct(col("v"), col("id")), 10)
      .select(col("g"), col("col.id").as("id"), col("pos"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set(("a", 2L, 0), ("a", 1L, 1), ("b", 3L, 0)))
  }

  test("descending order via negated sort field") {
    val tiny = Seq(("a", 3L, 1L), ("a", 1L, 2L), ("a", 7L, 3L)).toDF("g", "n", "id")
    val got = TopK.perGroupTopK(tiny, Seq("g"),
        struct((-col("n")).as("negn"), col("id"), col("n")), 2)
      .select(col("col.n").as("n"), col("pos"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got == Set((7L, 0), (3L, 1)))
  }
}
