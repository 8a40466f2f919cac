package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SCHEMA-EVOLUTION contract (VERDICT r15 task 6). A training pipeline
  * adds metadata columns constantly; this pins how the engine reads
  * data written before a column existed.
  *
  * CORPUS TABLES — the policy, demonstrated not assumed:
  *   - a bare `spark.read.parquet(dir)` over a mixed-schema dir infers
  *     from ONE footer: which columns appear is an accident of file
  *     listing order. NEVER the engine's read path for evolvable data.
  *   - `mergeSchema=true` unions all footers (NULL-fill) — correct but
  *     pays a distributed footer sweep per read.
  *   - an EXPLICIT schema (the engine's route: `Tables.table` /
  *     `Fixtures.tableSchema` memo, `IndexIO.readTable`) reads
  *     deterministically: listed columns NULL-fill where absent,
  *     unlisted columns are projected away.
  *
  * INDEX TABLES — evolution is ADDITIVE and writer-declared
  * ([[VectorIndex.append]] `evolveMeta`): the schema memo resolves the
  * NEWEST shard's footer (the widest), old shards serve with NULL for
  * evolved columns, old shard FILES stay byte-identical, and a
  * candFilter over an evolved column drops pre-evolution rows (SQL
  * three-valued logic).
  */
class SchemaEvolutionSpec extends SparkSpec {

  import spark.implicits._

  private def fresh(tag: String) = java.nio.file.Files
    .createTempDirectory(s"graft-evo-$tag").toString

  test("corpus dir evolution: explicit schema and mergeSchema NULL-fill; bare read is footer roulette") {
    val dir = fresh("corpus")
    Seq((1L, "old doc")).toDF("doc_id", "text")
      .write.parquet(s"$dir/p=1")
    Seq((2L, "new doc", "en")).toDF("doc_id", "text", "lang")
      .write.parquet(s"$dir/p=2")

    // mergeSchema: the union schema, NULL where a file predates the column
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet === Set("doc_id", "text", "lang", "p"))
    val r = merged.orderBy("doc_id").collect()
    assert(r(0).isNullAt(r(0).fieldIndex("lang")) &&
      r(1).getString(r(1).fieldIndex("lang")) == "en")

    // explicit schema: deterministic regardless of listing order — the
    // engine's route for evolvable data
    val explicit = spark.read.schema(merged.schema).parquet(dir)
    assert(explicit.filter(col("lang").isNull).count() === 1)
    assert(explicit.filter(col("lang") === "en").count() === 1)

    // bare read: SOME one footer wins — pin only that it is one of the
    // two (the nondeterminism is exactly why it is not the policy)
    val bare = spark.read.parquet(dir).columns.toSet - "p"
    assert(bare == Set("doc_id", "text") || bare == Set("doc_id", "text", "lang"),
      s"unexpected inferred columns: $bare")
  }

  test("vector index metaCols evolution: old shards serve, NULL-drop under evolved filter, files untouched") {
    val path = fresh("vidx") + "/idx"
    val dim = 4
    def vecs(ids: Range) = ids
      .map(i => (i.toLong, Array.tabulate(dim)(d => (i % 7 + d).toFloat)))
      .toDF("vec_id", "embedding")
    VectorIndex.write(vecs(0 until 16), path, nCentroids = 2)

    // fingerprint the v1 shard files BEFORE evolving
    val before = graft.sources.SizedWrite
      .dataFiles(spark, s"$path/postings/shard=0")
      .map { case (p, len) => (p, len,
        java.nio.file.Files.getLastModifiedTime(
          java.nio.file.Paths.get(new java.net.URI(p))).toMillis) }.sortBy(_._1)

    // evolved append: the new batch introduces `label`
    val newBatch = (16 until 32)
      .map(i => (i.toLong, Array.tabulate(dim)(d => (i % 7 + d).toFloat), i.toLong % 3))
      .toDF("vec_id", "embedding", "label")
    VectorIndex.append(newBatch, path, partitions = 1, evolveMeta = Seq("label"))

    // the read schema is the newest shard's: label present, NULL on v1 rows
    val postings = IndexIO.readTable(spark, path, "postings")
    assert(postings.columns.contains("label"))
    assert(postings.filter(col("label").isNull).count() === 16)
    assert(postings.filter(col("label").isNotNull).count() === 16)

    // unfiltered search spans BOTH shards (old index keeps serving)
    val q = vecs(0 until 1)
    val unfiltered = VectorIndex.topK(spark, path, q, k = 8, nprobe = 2)
      .select("cand_id").as[Long].collect().toSet
    assert(unfiltered.exists(_ < 16) && unfiltered.exists(_ >= 16),
      s"unfiltered search must span old and new shards: $unfiltered")

    // filtered on the evolved column: only new-shard survivors (NULL drops)
    val filtered = VectorIndex.topK(spark, path, q, k = 8, nprobe = 2,
        candFilter = Some(col("label") === 0L))
      .select("cand_id").as[Long].collect().toSet
    assert(filtered.nonEmpty && filtered.forall(_ >= 16),
      s"evolved-column filter must NULL-drop v1 rows: $filtered")

    // v1 shard files byte-untouched (append contract holds through evolution)
    val after = graft.sources.SizedWrite
      .dataFiles(spark, s"$path/postings/shard=0")
      .map { case (p, len) => (p, len,
        java.nio.file.Files.getLastModifiedTime(
          java.nio.file.Paths.get(new java.net.URI(p))).toMillis) }.sortBy(_._1)
    assert(after === before, "evolution must not rewrite v1 shard files")

    // compaction folds the mixed schema: evolved column persists,
    // pre-evolution rows keep NULL — semantics survive the fold
    VectorIndex.compact(spark, path)
    val foldedPostings = IndexIO.readTable(spark, path, "postings")
    assert(foldedPostings.filter(col("label").isNull).count() === 16)
    val postFold = VectorIndex.topK(spark, path, q, k = 8, nprobe = 2,
        candFilter = Some(col("label") === 0L))
      .select("cand_id").as[Long].collect().toSet
    assert(postFold === filtered, "fold must preserve evolved-filter semantics")

    // an evolved column may not collide with stored or reserved names
    intercept[IllegalArgumentException] {
      VectorIndex.append(newBatch, path, partitions = 1, evolveMeta = Seq("label"))
    }
    intercept[IllegalArgumentException] {
      VectorIndex.append(newBatch.withColumnRenamed("label", "cid")
        .withColumn("label", lit(0L)), path, partitions = 1, evolveMeta = Seq("cid"))
    }
  }

  test("text/minhash index schemas are CLOSED BY DESIGN: appends project declared inputs, stored tables never widen") {
    // VERDICT r16 task 5 — the contract, stated and executed: the
    // text/minhash stored tables (postings/doclens/stats,
    // signatures/buckets) are DERIVED representations whose columns are
    // fixed by the scoring algebra — there is no metaCols-style seam,
    // by design. Per-doc metadata (quality scores, language, labels)
    // rides the CORPUS table and joins on doc_id at serve time (or
    // VectorIndex metaCols for vector-keyed data). An append whose
    // input carries extra columns must therefore PROJECT them away,
    // leaving every stored schema byte-for-byte invariant — silently
    // widening an index that old binaries fold and serve would be an
    // undeclared format change, exactly what the _FORMAT gate exists
    // to prevent.
    val tpath = fresh("closed-text") + "/idx"
    TextIndex.write(Seq((1L, "fox spark")).toDF("doc_id", "text"), tpath)
    val tBefore = IndexIO.readTable(spark, tpath, "postings").schema
    TextIndex.append(
      Seq((2L, "fox jumps", "en", 0.9)).toDF("doc_id", "text", "lang", "quality"),
      tpath)
    IndexIO.resetCachesForTest() // re-read footers, not the schema memo
    assert(IndexIO.readTable(spark, tpath, "postings").schema === tBefore,
      "a text append with extra input columns must not widen postings")
    assert(TextIndex.bm25TopK(spark, tpath, Seq("fox"), 5, 1.2, 0.75).count() === 2)

    val mpath = fresh("closed-mh") + "/idx"
    val toks = Dedup.docTokens(
      Seq((1L, "fox spark doc")).toDF("doc_id", "text"), "doc_id", "text")
    MinHashIndex.write(toks, mpath, numHashes = 8, rowsPerBand = 2)
    val mBefore = IndexIO.readTable(spark, mpath, "signatures").schema
    // a token feed carrying extra columns (provenance, weights) projects
    val toks2 = Dedup.docTokens(
        Seq((2L, "fox spark doc")).toDF("doc_id", "text"), "doc_id", "text")
      .withColumn("weight", lit(1.0))
    MinHashIndex.append(toks2, mpath, numHashes = 8, rowsPerBand = 2)
    IndexIO.resetCachesForTest()
    assert(IndexIO.readTable(spark, mpath, "signatures").schema === mBefore,
      "a minhash append with extra input columns must not widen signatures")
    assert(MinHashIndex.pairs(spark, mpath, numHashes = 8).count() >= 1,
      "the identical re-texted doc must collide with the original")
  }
}
