package graft.functions

import graft.SparkSpec
import graft.ext.Dedup
import org.apache.spark.sql.functions._

/** Count-min sketch UDAF: one-sided error, partition-order invariance,
  * and column-form estimates against a driver-side recomputation. */
class CountMinSpec extends SparkSpec {

  import spark.implicits._

  private val depth = 4
  private val width = 64

  private def occurrences = (1 to 400).map { i =>
    // zipf-ish: token t1 appears 400/1, t2 200, t3 133 ...
    s"t${400 / i}"
  }.toDF("tok").select(col("tok"), Dedup.tokenHash(col("tok")).as("h"))

  test("estimates are one-sided: never below the true count") {
    val occ = occurrences.cache()
    val sketch = occ.agg(CountMin.cmsketch(col("h"), depth, width).as("sketch"))
    val checked = occ.groupBy("tok").agg(count(lit(1)).as("n_true"), max("h").as("h"))
      .crossJoin(broadcast(sketch))
      .select(col("tok"), col("n_true"),
        CountMin.estimate(col("sketch"), col("h"), depth, width).as("n_est"))
      .collect()
    occ.unpersist()
    assert(checked.nonEmpty)
    checked.foreach { r =>
      assert(r.getAs[Long]("n_est") >= r.getAs[Long]("n_true"),
        s"${r.getAs[String]("tok")}: est below truth")
    }
    // the heaviest token's estimate is tight (collisions add at most
    // the mass of colliding lighter tokens)
    val heavy = checked.maxBy(_.getAs[Long]("n_true"))
    assert(heavy.getAs[Long]("n_est") <= heavy.getAs[Long]("n_true") + 100)
  }

  test("sketch is identical under any partitioning (merge is exact)") {
    def sk(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.agg(CountMin.cmsketch(col("h"), depth, width))
        .as[Seq[Long]].head()
    val base = sk(occurrences)
    assert(base.sum == 400L * depth) // every occurrence counted in every row
    assert(base == sk(occurrences.repartition(13)))
    assert(base == sk(occurrences.coalesce(1)))
  }

  test("null hashes are skipped, not crashed on") {
    val withNulls = Seq[(java.lang.Long, String)](
      (1L, "a"), (null, "b"), (2L, "c"), (null, "d"))
      .toDF("h", "x")
    val sk = withNulls.agg(CountMin.cmsketch(col("h"), depth, width))
      .as[Seq[Long]].head()
    assert(sk.sum == 2L * depth) // only the two non-null rows counted
  }

  test("weighted updates over aggregated counts equal unit updates over occurrences") {
    val raw = occurrences
    val agg = raw.groupBy("h").agg(count(lit(1)).as("n"))
    val viaUnits = raw.agg(CountMin.cmsketch(col("h"), depth, width))
      .as[Seq[Long]].head()
    val viaWeights = agg.agg(
      CountMin.cmsketchWeighted(col("h"), col("n"), depth, width))
      .as[Seq[Long]].head()
    assert(viaUnits == viaWeights) // CMS is linear
  }

  test("column-form estimate matches a driver-side sketch replay") {
    val occ = occurrences.collect().map(_.getAs[Long]("h"))
    val counts = Array.ofDim[Long](depth * width)
    def bucket(d: Int, h: Long): Int =
      (((h * Dedup.minhashA(d) + Dedup.minhashB(d)) % Dedup.MinhashPrime) % width).toInt
    occ.foreach(h => (0 until depth).foreach(d => counts(d * width + bucket(d, h)) += 1))
    val est = occurrences.limit(50)
      .crossJoin(broadcast(
        occurrences.agg(CountMin.cmsketch(col("h"), depth, width).as("sketch"))))
      .select(col("h"), CountMin.estimate(col("sketch"), col("h"), depth, width).as("e"))
      .as[(Long, Long)].collect()
    est.foreach { case (h, e) =>
      val expected = (0 until depth).map(d => counts(d * width + bucket(d, h))).min
      assert(e == expected, s"h=$h")
    }
  }
}
