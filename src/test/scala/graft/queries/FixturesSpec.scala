package graft.queries

import graft.SparkSpec

class FixturesSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("clonedIndex: each invocation gets a PRIVATE copy — mutating a " +
      "clone never leaks into the template or a later clone") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.table(spark, dir, "documents")
      .filter(col("doc_id") < 60).select("doc_id", "text")
    def build(p: String): Unit = graft.ext.TextIndex.write(docs, p)
    val c1 = Fixtures.clonedIndex(spark, dir, "fixspec-tindex")(build)
    val c2 = Fixtures.clonedIndex(spark, dir, "fixspec-tindex")(build)
    assert(c1 != c2) // distinct directories per invocation
    val terms = Seq("the", "a", "of")
    def top(p: String) = graft.ext.TextIndex
      .bm25TopK(spark, p, terms, 10, 1.2, 0.75).collect().toSeq
    val before = top(c2)
    // mutate clone 1 heavily: tombstone half the docs
    graft.ext.TextIndex.delete(
      docs.filter(col("doc_id") % 2 === 0).select("doc_id"), c1)
    assert(top(c1) != before, "the mutation must be observable on its own clone")
    // clone 2 and a FRESH clone (from the untouched template) are unaffected
    assert(top(c2) == before)
    val c3 = Fixtures.clonedIndex(spark, dir, "fixspec-tindex")(build)
    assert(top(c3) == before)
  }

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
