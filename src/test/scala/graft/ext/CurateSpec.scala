package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** End-to-end curation composite: exact dups collapse to the lowest id,
  * near-dups cluster and keep one, member accounting sums the originals,
  * split assignment is deterministic. */
class CurateSpec extends SparkSpec {

  import spark.implicits._

  test("curate: exact dups, near-dup cluster, accounting, determinism") {
    val near1 = "the quick brown fox jumps over the lazy dog near the river bank today"
    val near2 = "the quick brown fox jumps over the lazy dog near the river bank tonight"
    val docs = Seq(
      (1L, near1),
      (2L, near1),             // exact dup of 1
      (3L, near2),             // near dup of 1 (one-token change)
      (4L, "completely different text about distributed query engines and columnar storage"),
      (5L, "completely different text about distributed query engines and columnar storage")
    ).toDF("doc_id", "text")

    val out = Curate.run(docs, "doc_id", "text").orderBy("doc_id").collect()
    val byId = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 1 absorbs 2 (exact) and 3 (near): 3 members; 4 absorbs 5: 2 members
    assert(byId == Map(1L -> 3L, 4L -> 2L))
    // split matches the standalone operator (same salt, same hash)
    val expected = Seq(1L, 4L).map(id =>
      Seq(id).toDF("id").select(Dedup.splitAssign(col("id"), 90)).head().getString(0))
    assert(out.map(_.getString(2)).toSeq == expected)
    // determinism: a second run under a different partitioning agrees
    val out2 = Curate.run(docs.repartition(7), "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.toSeq == out2.toSeq)
  }

  test("curate runFull: manifest is train-only, decontaminated, and deterministic") {
    // 40 distinct docs (8+ tokens so 4-gram decontamination has shingles),
    // two languages to exercise the mix stage
    val docs = (1L to 40L).map { i =>
      val lang = if (i % 3 == 0) "xx" else "en"
      (i, s"document $i body w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f", lang)
    }.toDF("doc_id", "text", "lang")

    val manifest = Curate.runFull(docs, "doc_id", "text", "lang")
      .orderBy("doc_id").collect()
    assert(manifest.nonEmpty)
    val ids = manifest.map(_.getAs[Long]("doc_id")).toSet

    // every manifest doc is a train-split survivor
    val splits = Seq(Curate.run(docs, "doc_id", "text"))
      .head.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(ids.forall(id => splits(id) == "train"))

    // no manifest doc shares a 4-gram with the held-out side
    val testPred = col("split") === "test"
    val sdocs = Curate.run(docs, "doc_id", "text")
      .join(docs.select(col("doc_id"), col("text")), "doc_id")
    val pairs = Dedup.contaminationPairs(sdocs, "doc_id", "text",
      testPred = col("doc_id").isin(splits.filter(_._2 == "test").keys.toSeq: _*),
      n = 4).select("train_id").as[Long].collect().toSet
    assert(ids.intersect(pairs).isEmpty)

    // deterministic under repartitioning
    val again = Curate.runFull(docs.repartition(5), "doc_id", "text", "lang")
      .orderBy("doc_id").collect()
    assert(manifest.toSeq == again.toSeq)
  }

  test("curate publish: packed corpus lands hive-partitioned by shard, sized, text joined") {
    val docs = (1L to 40L).map { i =>
      val lang = if (i % 3 == 0) "xx" else "en"
      (i, s"document $i body w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f", lang)
    }.toDF("doc_id", "text", "lang")
    val manifest = Curate.runFull(docs, "doc_id", "text", "lang")
    val out = java.nio.file.Files
      .createTempDirectory("graft-curate-pub").toString + "/corpus"
    val vdir = Curate.publish(manifest, docs, "doc_id", "text", out,
      targetFileBytes = 1L << 20, shuffleToFileRatio = 1.0)
    assert(vdir === IndexIO.resolveCurrent(spark, out))

    val back = Curate.readPublished(spark, out)
    assert(back.columns.sorted.toSeq ===
      Seq("bin", "doc_id", "lang", "n_members", "shard", "text"))
    assert(back.count() === manifest.count())
    // text joined back intact for a spot doc
    val one = back.filter(col("doc_id") === back.agg(min("doc_id"))
      .collect()(0).getLong(0)).collect()(0)
    assert(one.getAs[String]("text").startsWith("document "))
    // hive layout inside the version dir: every dir is a shard=K, each
    // with a bounded file count
    val files = graft.sources.SizedWrite.dataFiles(spark, vdir)
    val dirs = files.map(f => f._1.substring(0, f._1.lastIndexOf('/')))
      .map(d => d.substring(d.lastIndexOf('/') + 1)).distinct
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("shard=")), dirs)
    assert(files.size <= dirs.size * 4,
      s"${files.size} files over ${dirs.size} shard dirs — sliver fan-out")
  }

  test("curate publish is atomic: re-publish flips versions; readers see old-or-new") {
    val docs = (1L to 40L).map { i =>
      val lang = if (i % 3 == 0) "xx" else "en"
      (i, s"document $i body w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f", lang)
    }.toDF("doc_id", "text", "lang")
    val root = java.nio.file.Files
      .createTempDirectory("graft-curate-atomic").toString + "/corpus"
    val manifest = Curate.runFull(docs, "doc_id", "text", "lang")
    Curate.publish(manifest, docs, "doc_id", "text", root,
      targetFileBytes = 1L << 20, shuffleToFileRatio = 1.0)
    val v1Rows = Curate.readPublished(spark, root).count()

    // second publish over a GROWN corpus lands as v2; v1 stays whole
    val docs2 = docs.union(Seq((100L, "entirely new document about graph " +
      "partitioning strategies and shuffle behavior", "en")).toDF("doc_id", "text", "lang"))
    val manifest2 = Curate.runFull(docs2, "doc_id", "text", "lang")
    Curate.publish(manifest2, docs2, "doc_id", "text", root,
      targetFileBytes = 1L << 20, shuffleToFileRatio = 1.0)
    assert(IndexIO.versionIds(spark, root) === Seq(1, 2))
    assert(Curate.readPublished(spark, root).count() === manifest2.count())
    // the superseded version is still a complete corpus until gc
    assert(spark.read.parquet(s"$root/v00001").count() === v1Rows)

    // crash-inject each kill point of the publish path: a death at any
    // of them must leave CURRENT resolving to the old COMPLETE corpus
    val manifest3 = Curate.runFull(docs, "doc_id", "text", "lang")
    var k = 0
    var fired = true
    while (fired && k < 16) {
      fired = CrashSeam.crashedAt(k) {
        Curate.publish(manifest3, docs, "doc_id", "text", root,
          targetFileBytes = 1L << 20, shuffleToFileRatio = 1.0)
      }
      if (fired) {
        val resolved = IndexIO.resolveCurrent(spark, root)
        val back = Curate.readPublished(spark, root)
        assert(back.count() === manifest2.count(),
          s"kill point $k: reader saw a torn corpus under $resolved")
      }
      k += 1
    }
    assert(k > 1, "crash seam never fired — kill points not exercised")

    // a clean retry after the crashes publishes fine and gc reclaims
    // orphans without touching CURRENT
    Curate.publish(manifest3, docs, "doc_id", "text", root,
      targetFileBytes = 1L << 20, shuffleToFileRatio = 1.0)
    val current = IndexIO.resolveCurrent(spark, root)
    Curate.gcPublished(spark, root, keepLast = 1)
    assert(IndexIO.resolveCurrent(spark, root) === current)
    assert(Curate.readPublished(spark, root).count() === manifest3.count())
  }
}
