package graft.queries

import graft.SparkSpec

class FixturesSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("fixture memo returns the same instance until cleared, then rebuilds") {
    val a = Fixtures.gazPois(spark, dir, withWikidata = false)
    val b = Fixtures.gazPois(spark, dir, withWikidata = false)
    assert(a eq b) // memoized: one cached gazetteer per (session, dir)
    val n = a.count()
    Fixtures.clear(spark)
    val c = Fixtures.gazPois(spark, dir, withWikidata = false)
    assert(!(a eq c)) // rebuilt after clear (old one unpersisted)
    assert(c.count() == n)
  }
}
