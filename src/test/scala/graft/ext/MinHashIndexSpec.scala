package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The persisted MinHash/LSH index (ext/MinHashIndex): result parity
  * with the build-inline [[Dedup.minhashLshPairs]], the staged
  * publish (no partial index visible under the destination), and
  * overwrite-on-rebuild semantics.
  */
class MinHashIndexSpec extends SparkSpec {

  import spark.implicits._

  private val NumHashes = 8

  private def docsDf = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),
    (3L, "pack my box with five dozen liquor jugs"),
    (4L, "the quick brown fox jumps over the lazy dog"),
    (5L, "completely unrelated text about spark plans")
  ).toDF("doc_id", "text")

  private def toks = Dedup.docTokens(docsDf, "doc_id", "text", distinct = false)

  private val path = java.nio.file.Files
    .createTempDirectory("graft-mhindex-spec").toString + "/idx"

  test("persisted pairs equal the build-inline minhashLshPairs") {
    MinHashIndex.write(toks, path, NumHashes, rowsPerBand = 2)
    val stored = MinHashIndex.pairs(spark, path, NumHashes)
      .orderBy("a", "b").collect()
    val inline = Dedup.minhashLshPairs(
        Dedup.minhashSignature(toks, NumHashes), NumHashes, rowsPerBand = 2)
      .orderBy("a", "b").collect()
    assert(stored.nonEmpty && stored.sameElements(inline))
    // the exact-dup pair must be there with a perfect estimate
    val perfect = stored.filter(r => r.getLong(0) == 1L && r.getLong(1) == 4L)
    assert(perfect.length == 1 && perfect.head.getDouble(2) == 1.0)
  }

  test("rebuild overwrites in place; serving sees exactly the new corpus") {
    MinHashIndex.write(toks, path, NumHashes, rowsPerBand = 2)
    // rebuild WITHOUT doc 4: the (1,4) exact-dup pair must vanish
    val toks2 = Dedup.docTokens(
      docsDf.filter(col("doc_id") =!= 4L), "doc_id", "text", distinct = false)
    MinHashIndex.write(toks2, path, NumHashes, rowsPerBand = 2)
    val got = MinHashIndex.pairs(spark, path, NumHashes).collect()
    assert(!got.exists(r => r.getLong(1) == 4L || r.getLong(0) == 4L))
    // no staging residue next to the destination after publish
    val parent = new java.io.File(path).getParentFile
    assert(parent.listFiles.map(_.getName).filter(_.contains("staging")).isEmpty)
  }

  test("band keys: persisted table matches the shared construction") {
    MinHashIndex.write(toks, path, NumHashes, rowsPerBand = 2)
    val sig = spark.read.parquet(s"$path/signatures")
    val derived = MinHashIndex.bands(sig, NumHashes, rowsPerBand = 2)
      .orderBy("band", "bucket", "id").collect()
    val stored = spark.read.parquet(s"$path/buckets")
      .select("id", "band", "bucket")
      .orderBy("band", "bucket", "id").collect()
    assert(stored.sameElements(derived))
  }
}
