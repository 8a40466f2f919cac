package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-composition operators for training-data pipelines: temperature
  * re-sampling of group (domain/language) mixes and sequence packing of
  * documents into fixed token-budget bins.
  *
  * Both are DETERMINISTIC by construction — membership decisions come
  * from the portable md5-derived hash ([[Dedup.tokenHash]]) and exact
  * integer/sqrt arithmetic, never `rand()` — so a retry, a different
  * partitioning, or a different engine reproduces the same corpus
  * bit-for-bit (the same property [[Dedup.splitAssign]] provides for
  * train/test routing).
  */
object Sampling {

  /** Hash-bucketed NEGATIVE SAMPLING for contrastive training pairs:
    * `k` deterministic pseudo-random negatives per query, WITHOUT a
    * query × corpus cross join. Each corpus doc lands in one of
    * `nBuckets` hash buckets; each (query, slot j) probes the bucket
    * `hash(salt:qid:j) mod nBuckets` and keeps the bucket member with
    * the smallest per-(query, slot) hash — so sampling is one EQUALITY
    * join on the bucket id (corpus shuffles once on its bucket; the
    * slot side is queries × k rows), and per-slot work is bounded by
    * the bucket size ≈ corpus/nBuckets regardless of corpus scale.
    *
    * Determinism: every choice flows from the portable md5 hash — a
    * retry, a repartition, or another engine draws the SAME negatives.
    * A self-pair (negative == its own query id) is excluded; an empty
    * probed bucket yields no row for that slot (both engines agree, so
    * this too is deterministic — size `nBuckets` ≪ corpus to make it
    * rare). Output: (qid, slot, neg_id), slot 1-based.
    *
    * `nBuckets ≤ 0` (the default) AUTO-SIZES from the corpus:
    * `max(16, corpusCount / 64)` — bucket size stays ~64 however the
    * corpus grows, so per-slot candidate work is flat at 100 TB instead
    * of inheriting a fixture-pinned constant (the
    * [[Dedup.bloomDecontaminate]] count-don't-guess treatment; the
    * count is one job over the corpus scan). The formula is integer
    * arithmetic on the exact count, so an oracle replays it from the
    * same relation. Pass an explicit `nBuckets` only to pin a layout
    * (or skip the count when cardinality is known a priori). */
  def negativeSample(queryIds: DataFrame, corpus: DataFrame,
                     qidCol: String, docIdCol: String,
                     k: Int, nBuckets: Int = -1,
                     salt: String = "neg"): DataFrame = {
    require(k > 0, s"need k > 0, got $k")
    // stay in Long: a .toInt here would go negative (crash) or silently
    // WRAP to a formula-divergent bucket count past ~2^31 corpus rows —
    // exactly the scales the auto mode exists for
    val buckets: Long =
      if (nBuckets > 0) nBuckets.toLong
      else math.max(AutoMinBuckets, corpus.count() / AutoBucketSize)
    negativeSamplePinned(queryIds, corpus, qidCol, docIdCol, k, buckets, salt)
  }

  /** Auto-size constants for [[negativeSample]]: floor of 16 buckets,
    * target bucket cardinality ~64 docs. Public so an external oracle
    * can replay `max(AutoMinBuckets, count / AutoBucketSize)`. */
  val AutoMinBuckets = 16L
  val AutoBucketSize = 64L

  private def negativeSamplePinned(queryIds: DataFrame, corpus: DataFrame,
                                   qidCol: String, docIdCol: String,
                                   k: Int, nBuckets: Long,
                                   salt: String): DataFrame = {
    require(nBuckets > 0, s"need nBuckets > 0, got $nBuckets")
    val cands = corpus.select(
      col(docIdCol).cast("long").as("neg_id"),
      pmod(Dedup.tokenHash(concat(lit(salt + ":"),
        col(docIdCol).cast("string"))), lit(nBuckets)).as("bucket"))
    val slots = queryIds
      .select(col(qidCol).cast("long").as("qid"))
      .select(col("qid"), explode(sequence(lit(1), lit(k))).as("slot"))
      .withColumn("bucket",
        pmod(Dedup.tokenHash(concat_ws(":", lit(salt), col("qid"), col("slot"))),
          lit(nBuckets)))
    val drawKey = Dedup.tokenHash(
      concat_ws(":", lit(salt), col("qid"), col("slot"), col("neg_id")))
    slots.join(cands, Seq("bucket"))
      .filter(col("neg_id") =!= col("qid"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("qid", "slot")
          .orderBy(drawKey.asc, col("neg_id").asc)))
      .filter(col("rk") === 1)
      .select("qid", "slot", "neg_id")
  }

  /** Temperature-flattening group re-sampler (the "domain mixing" step
    * of corpus assembly, cf. the data-mixture weighting used by large
    * LM corpora): group g is kept at rate `sqrt(min_g n_g / n_g)`, so
    * the rarest group is kept whole and a group 4x its size keeps half
    * — flattening the mix toward (but not past) uniform, without
    * upsampling.
    *
    * The exponent is FIXED at 1/2 (temperature 2) because IEEE-754
    * `sqrt` is correctly rounded and therefore engine-portable, while
    * `pow(x, alpha)` is not (libm implementations differ in the last
    * ulp, which a floor() then amplifies to a membership flip). The
    * keep threshold is materialized per group in integer
    * parts-per-million; membership is `hash(salt:id) mod 1e6 <
    * threshold`.
    *
    * Scale shape: one partial-agg groupBy over the weight column (the
    * group-cardinality relation is domains-sized, i.e. tiny), a
    * broadcast join of the per-group thresholds back onto the corpus,
    * and a narrow filter. Nothing shuffles the corpus.
    *
    * @param weight per-row mass to weight groups by — typically a token
    *               count (mix by token budget), or `lit(1L)` for doc
    *               counts.
    */
  def temperatureMix(docs: DataFrame, group: String, id: String,
                     weight: Column, salt: String = "mix"): DataFrame = {
    val scale = 1000000L
    // zero-mass groups are dropped up front: they'd make min_mass 0 and
    // the sqrt ratio 0/0 = NaN, whose long-cast differs across engines
    val masses = docs.groupBy(col(group)).agg(sum(weight).as("mass"))
      .filter(col("mass") > 0)
    val mn = masses.agg(min("mass").as("min_mass"))
    val rates = masses.crossJoin(broadcast(mn))
      .select(col(group),
        floor(sqrt(col("min_mass").cast("double") / col("mass").cast("double"))
          * scale).cast("long").as("keep_ppm"))
    docs.join(broadcast(rates), group)
      .filter(pmod(Dedup.tokenHash(concat(lit(salt + ":"), col(id).cast("string"))),
        lit(scale)) < col("keep_ppm"))
  }

  /** Sequence packing: assign documents to fixed token-capacity bins by
    * prefix-sum partitioning — doc d goes to bin `floor(start_d /
    * capacity)` where `start_d` is the running token count before d in
    * its shard's id order. Bins are contiguous runs of the shard order;
    * a bin can overshoot capacity by at most one document (the standard
    * streaming-packing approximation — no bin-packing search, one pass).
    *
    * Sharding is the scale knob: each shard is packed independently
    * under a per-shard total order, so the only sort is per-shard. A
    * deployment sizes `shards` proportional to corpus tokens (shard ≈
    * what one packing worker handles); the determinism comes from the
    * hash route + id order, not from task scheduling.
    *
    * Returns one row per (shard, bin): document count, token sum, and
    * the id span [min_id, max_id] of the bin's run.
    */
  def packBins(docs: DataFrame, id: String, tokens: Column,
               shards: Int, capacity: Long): DataFrame =
    packAssign(docs, id, tokens, shards, capacity)
      .groupBy("shard", "bin")
      .agg(count(lit(1)).as("n_docs"), sum("ntok").as("sum_tokens"),
        min(id).as("min_id"), max(id).as("max_id"))

  /** Per-document packing assignment: the (shard, bin) each doc lands
    * in, plus its token count — the manifest form ([[packBins]] is the
    * aggregated report over this). Input columns are passed through. */
  def packAssign(docs: DataFrame, id: String, tokens: Column,
                 shards: Int, capacity: Long): DataFrame = {
    // ROWS frame pinned: the default RANGE frame would merge tied ids
    // into one prefix-sum step, diverging from the documented per-row
    // semantics (and the oracle twins, which pin ROWS explicitly)
    val w = Window.partitionBy("shard").orderBy(col(id))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("shard",
        pmod(Dedup.tokenHash(concat(lit("pack:"), col(id).cast("string"))),
          lit(shards)))
      .withColumn("ntok", tokens.cast("long"))
      .withColumn("start", sum("ntok").over(w) - col("ntok"))
      .withColumn("bin", expr(s"start div $capacity"))
      .drop("start")
  }
}
