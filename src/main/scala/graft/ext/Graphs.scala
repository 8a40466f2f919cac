package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph measures over edge lists. Complements
  * [[Dedup.connectedComponents]] (min-label fixpoint) with a weighted
  * propagation: PageRank — the classic link-quality signal a crawl
  * curation pipeline scores domains/documents with.
  */
object Graphs {

  /** PageRank in FIXED-POINT INT64 arithmetic: total rank mass is 10^12
    * "picoshares", every step is integer division/multiply/sum — so the
    * per-node scores are order-independent and bit-identical across
    * engines, partitionings, and retries (the same reproducibility
    * design as the quantized cosine — float sums would drift with
    * aggregation order and no rounding width is provably safe at the
    * fixpoint boundary).
    *
    * Semantics: r_0 = M/N; r_{i+1}(v) = (M/N)·15/100 + 85/100 · Σ_{u→v}
    * r_i(u)/outdeg(u), all divisions floored. Runs a FIXED iteration
    * count — no convergence-test action per round, and the result is a
    * pure function of (graph, iters). Dangling nodes (no out-edges)
    * leak their mass, the standard simplification; add self-loops
    * upstream if mass conservation matters.
    *
    * Scale shape: per iteration, one equality join (edges ⋈ ranks on
    * src — both sides shuffle-partitioned by the join key, and the edge
    * side's partitioning is REUSED every round) plus one partial-agg
    * groupBy(dst) and a left join back onto the node set. Lineage is
    * cut per iteration (localCheckpoint, like connectedComponents) so
    * plan size stays constant in `iters`.
    */
  def pageRankFixedPoint(nodes: DataFrame, edges: DataFrame,
                         iters: Int): DataFrame = {
    val totalMass = 1000000000000L
    val n = nodes.count()
    require(n > 0, "pageRankFixedPoint: empty node set")
    val unit = totalMass / n
    val base = unit * 15 / 100
    val e = edges
      .join(edges.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
      .localCheckpoint(true) // read every iteration: materialize once
    var ranks = nodes.select(col("id"), lit(unit).as("rank"))
    for (_ <- 1 to iters) {
      val sums = e.join(ranks, e("src") === ranks("id"))
        .select(col("dst"), expr("rank div outdeg").as("contrib"))
        .groupBy("dst").agg(sum("contrib").as("s"))
      ranks = nodes.join(sums, nodes("id") === sums("dst"), "left")
        .select(col("id"), (lit(base) + expr("coalesce(s, 0L) * 85 div 100")).as("rank"))
        .localCheckpoint(true) // constant-size plan per round
    }
    ranks
  }

  /** Synchronous label propagation — semi-supervised class spreading
    * over the link graph (the third iterative primitive beside the
    * min-label fixpoint of [[Dedup.connectedComponents]] and the
    * additive mass of [[pageRankFixedPoint]]): seeds keep their label
    * forever; every other node adopts, each round, the MAJORITY label
    * among its in-neighbors' previous-round labels (parallel edges
    * count as weight), keeping its previous label when no in-neighbor
    * is labeled yet. Ties break to the SMALLEST label — a total order,
    * so the result is a pure function of (graph, seeds, iters),
    * engine- and partitioning-independent.
    *
    * Scale shape per round: one equality join (edges ⋈ labels on src),
    * one two-level hash aggregate — (dst, lbl) counts absorb the
    * message fan-in map-side, then a `min_by` argmax per dst — and a
    * left join back onto the node set; lineage cut per round. The
    * argmax is partial-aggregatable: no per-node sort, no window.
    *
    * `nodes`: (id); `seeds`: (id, lbl) for the labeled subset;
    * `edges`: (src, dst). Returns (id, lbl) with lbl NULL where no
    * label reached the node in `iters` rounds. */
  def labelPropagation(nodes: DataFrame, seeds: DataFrame,
                       edges: DataFrame, iters: Int): DataFrame = {
    val e = edges.localCheckpoint(true) // read every round
    val seeded = nodes.join(seeds.withColumnRenamed("lbl", "seed_lbl"),
        Seq("id"), "left")
      .localCheckpoint(true)
    var labels = seeded.select(col("id"), col("seed_lbl").as("lbl"))
    for (_ <- 1 to iters) {
      val maj = e.join(labels.filter(col("lbl").isNotNull),
          e("src") === col("id"))
        .groupBy(col("dst"), col("lbl")).agg(count(lit(1)).as("c"))
        .groupBy("dst")
        .agg(min_by(col("lbl"), struct((-col("c")).as("nc"), col("lbl")))
          .as("maj_lbl"))
      labels = seeded
        .join(labels.withColumnRenamed("lbl", "prev_lbl")
          .withColumnRenamed("id", "pid"), col("id") === col("pid"))
        .join(maj, col("id") === maj("dst"), "left")
        .select(col("id"),
          coalesce(col("seed_lbl"), col("maj_lbl"), col("prev_lbl")).as("lbl"))
        .localCheckpoint(true) // constant-size plan per round
    }
    labels
  }

  /** Per-node triangle participation counts over the UNDIRECTED
    * simplification of `edges` (self-loops dropped, directions and
    * parallel edges collapsed) — the standard degree-ORIENTED
    * node-iterator: each undirected edge is oriented from its
    * lower-(degree, id) endpoint to the higher, wedges are built only
    * from a node's OUT-edges, and a wedge closes into a triangle when
    * its canonical endpoint pair exists as an undirected edge.
    *
    * The orientation is the 100 TB load-bearing part: out-degrees in
    * the oriented graph are O(√m), so the wedge self-join generates
    * O(m^1.5) rows instead of the naive Σdeg² — a power-law hub with
    * 10⁸ in-links contributes NO wedges from its in-side. Every step is
    * an equality join or a partial-aggregatable count; each triangle is
    * produced exactly once (its unique two-out-edge apex).
    * Returns (id, n_tri) for nodes in ≥1 triangle. */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val und = edges
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .filter(col("u") < col("v"))
      .distinct()
      .localCheckpoint(true) // read 4x: degrees, both orient sides, closure
    val deg = und.select(explode(array(col("u"), col("v"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("d"))
    val oriented = und
      .join(deg.select(col("id").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("id").as("v"), col("d").as("dv")), "v")
      .select(
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("u"))
          .otherwise(col("v")).as("s"),
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("v"))
          .otherwise(col("u")).as("t"))
    val wedges = oriented.as("e1").join(oriented.as("e2"),
        col("e1.s") === col("e2.s") && col("e1.t") < col("e2.t"))
      .select(col("e1.s").as("a"),
        least(col("e1.t"), col("e2.t")).as("b"),
        greatest(col("e1.t"), col("e2.t")).as("c"))
    val tris = wedges.join(und,
      col("b") === col("u") && col("c") === col("v"))
    tris.select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_tri"))
  }
}
