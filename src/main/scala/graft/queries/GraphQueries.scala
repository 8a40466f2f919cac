package graft.queries

import graft.ext.{Dedup, Graphs}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph inventory: link-quality scoring over a deterministic synthetic
  * link graph derived from `documents` (each doc "links to"
  * [[GraphQueries.OutDeg]] hash-chosen docs — the fixture corpus has no
  * real hyperlinks, so the graph is a pure function of doc_ids that
  * both engines rebuild identically, the planted-rows pattern used
  * throughout). The edge derivation has ONE source per engine
  * ([[linkEdges]] / [[edgesSql]]) so gr_pagerank and gr_degrees can
  * never drift onto different graphs.
  */
object GraphQueries {

  private def docs(s: SparkSession, dir: String) = Tables.table(s, dir, "documents")

  private def hashSql(expr: String) = DedupQueries.portableHash(expr)

  private val Iters = 3
  private val OutDeg = 3

  /** The synthetic (src, dst) edge list: dst_k = hash("link:src:k") mod
    * n for k < OutDeg. Parallel edges and self-loops possible — callers
    * decide whether to collapse them. */
  private def linkEdges(d: DataFrame, n: Long): DataFrame =
    d.select(col("doc_id").as("src"),
        explode(array((0 until OutDeg).map(lit): _*)).as("k"))
      .select(col("src"),
        pmod(Dedup.tokenHash(
          concat(lit("link:"), col("src").cast("string"), lit(":"), col("k"))),
          lit(n)).as("dst"))

  /** DuckDB twin of [[linkEdges]] (body of an edge CTE; `n` must be a
    * CTE named n). */
  private val edgesSql =
    s"""SELECT doc_id AS src,
          ${hashSql("'link:' || doc_id || ':' || k")} % (SELECT n FROM n) AS dst
        FROM documents, range(0, $OutDeg) t(k)"""

  /** 3-iteration fixed-point PageRank ([[Graphs.pageRankFixedPoint]] —
    * INT64 picoshare arithmetic, bit-exact cross-engine). The oracle
    * unrolls the same three iterations as chained CTEs. */
  val grPageRank = Q("gr_pagerank",
    (s, dir) => {
      val d = docs(s, dir)
      val n = d.count()
      Graphs.pageRankFixedPoint(d.select(col("doc_id").as("id")),
          linkEdges(d, n), Iters)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    },
    Some {
      val iterCtes = (1 to Iters).map { i =>
        s"""s$i AS (
              SELECT e.dst, sum(r${i - 1}.rank // e.outdeg) AS s
              FROM e JOIN r${i - 1} ON e.src = r${i - 1}.id GROUP BY 1),
            r$i AS (
              SELECT d.doc_id AS id,
                     CAST((SELECT base FROM b) + coalesce(s$i.s, 0) * 85 // 100 AS BIGINT) AS rank
              FROM documents d LEFT JOIN s$i ON d.doc_id = s$i.dst)"""
      }.mkString(",\n")
      s"""WITH n AS (SELECT count(*) AS n FROM documents),
            b AS (SELECT (1000000000000 // n) AS unit,
                         (1000000000000 // n) * 15 // 100 AS base FROM n),
            e0 AS ($edgesSql),
            e AS (
              SELECT src, dst, count(*) OVER (PARTITION BY src) AS outdeg FROM e0),
            r0 AS (
              SELECT doc_id AS id, (SELECT unit FROM b) AS rank FROM documents),
            $iterCtes
          SELECT id AS doc_id, rank FROM r$Iters ORDER BY doc_id"""
    })

  /** Degree / reciprocity profile of the link graph: per-node in-degree
    * (out-degree is OutDeg by construction) and whether the node sits
    * on any reciprocal (u→v ∧ v→u, u ≠ v) PAIR — self-loops are
    * deliberately excluded by the u < v predicate (a page linking to
    * itself is not a mutual link between two pages). One groupBy and
    * one self-join on (src, dst) vs (dst, src); nothing quadratic. */
  val grDegrees = Q("gr_degrees",
    (s, dir) => {
      val d = docs(s, dir)
      val n = d.count()
      // read 3x (in-degree + both self-join sides): materialize once
      val edges = linkEdges(d, n)
        .distinct() // parallel edges collapse for degree/reciprocity
        .localCheckpoint(true)
      val inDeg = edges.groupBy(col("dst").as("doc_id"))
        .agg(count(lit(1)).as("in_deg"))
      val recip = edges.as("e")
        .join(edges.as("r"),
          col("e.src") === col("r.dst") && col("e.dst") === col("r.src") &&
            col("e.src") < col("e.dst"))
        .select(explode(array(col("e.src"), col("e.dst"))).as("doc_id"))
        .distinct()
        .withColumn("reciprocal", lit(true))
      d.select("doc_id")
        .join(inDeg, Seq("doc_id"), "left")
        .join(recip, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("in_deg"), lit(0L)).as("in_deg"),
          coalesce(col("reciprocal"), lit(false)).as("reciprocal"))
        .orderBy("doc_id")
    },
    Some(s"""WITH n AS (SELECT count(*) AS n FROM documents),
             e AS (SELECT DISTINCT * FROM ($edgesSql)),
             ind AS (SELECT dst AS doc_id, count(*) AS in_deg FROM e GROUP BY 1),
             recip AS (
               SELECT DISTINCT unnest([x.src, x.dst]) AS doc_id
               FROM e x JOIN e y ON x.src = y.dst AND x.dst = y.src
               WHERE x.src < x.dst)
           SELECT d.doc_id,
                  coalesce(ind.in_deg, 0) AS in_deg,
                  (recip.doc_id IS NOT NULL) AS reciprocal
           FROM documents d
           LEFT JOIN ind ON d.doc_id = ind.doc_id
           LEFT JOIN recip ON d.doc_id = recip.doc_id
           ORDER BY d.doc_id"""))

  /** Per-node triangle counts over the undirected link graph
    * ([[Graphs.triangleCounts]] — degree-oriented node-iterator: wedges
    * only from oriented out-edges, O(m^1.5) not Σdeg²). The oracle
    * rebuilds the same orientation, wedge join, and closure check. */
  val grTriangles = Q("gr_triangles",
    (s, dir) => {
      val d = docs(s, dir)
      val n = d.count()
      Graphs.triangleCounts(linkEdges(d, n))
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    },
    Some(s"""WITH n AS (SELECT count(*) AS n FROM documents),
             e0 AS ($edgesSql),
             und AS (
               SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
               FROM e0 WHERE src <> dst),
             deg AS (
               SELECT id, count(*) AS d
               FROM (SELECT unnest([u, v]) AS id FROM und) GROUP BY 1),
             o AS (
               SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v)
                           THEN u ELSE v END AS s,
                      CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v)
                           THEN v ELSE u END AS t
               FROM und
               JOIN deg du ON u = du.id
               JOIN deg dv ON v = dv.id),
             w AS (
               SELECT e1.s AS a, least(e1.t, e2.t) AS b, greatest(e1.t, e2.t) AS c
               FROM o e1 JOIN o e2 ON e1.s = e2.s AND e1.t < e2.t),
             tri AS (SELECT a, b, c FROM w JOIN und ON b = u AND c = v)
           SELECT id AS doc_id, count(*) AS n_tri
           FROM (SELECT unnest([a, b, c]) AS id FROM tri)
           GROUP BY 1 ORDER BY doc_id"""))

  private val SeedMod = 17L

  /** 3-round synchronous label propagation
    * ([[Graphs.labelPropagation]]): docs with doc_id % $SeedMod == 0
    * seed label doc_id % 5 (mod-17 seeds × mod-5 labels are coprime, so
    * all five classes occur); everyone else adopts the majority
    * in-neighbor label, smallest-label tiebreak. The oracle unrolls the
    * rounds as chained CTEs with a row_number argmax; unreached nodes
    * surface as -1 on both sides (no NULLs cross the comparator). */
  val grLabelProp = Q("gr_labelprop",
    (s, dir) => {
      val d = docs(s, dir)
      val n = d.count()
      val seeds = d.filter(col("doc_id") % SeedMod === 0)
        .select(col("doc_id").as("id"), (col("doc_id") % 5).as("lbl"))
      Graphs.labelPropagation(d.select(col("doc_id").as("id")), seeds,
          linkEdges(d, n), Iters)
        .select(col("id").as("doc_id"),
          coalesce(col("lbl"), lit(-1L)).as("lbl"))
        .orderBy("doc_id")
    },
    Some {
      val iterCtes = (1 to Iters).map { i =>
        s"""m$i AS (
              SELECT e.dst, l.lbl, count(*) AS c
              FROM e JOIN l${i - 1} l ON e.src = l.id
              WHERE l.lbl IS NOT NULL GROUP BY 1, 2),
            w$i AS (
              SELECT dst, lbl FROM (
                SELECT dst, lbl,
                       row_number() OVER (PARTITION BY dst
                         ORDER BY c DESC, lbl ASC) AS rn
                FROM m$i) WHERE rn = 1),
            l$i AS (
              SELECT d.doc_id AS id,
                     CASE WHEN d.doc_id % $SeedMod = 0 THEN d.doc_id % 5
                          ELSE coalesce(w$i.lbl, p.lbl) END AS lbl
              FROM documents d
              LEFT JOIN w$i ON d.doc_id = w$i.dst
              LEFT JOIN l${i - 1} p ON d.doc_id = p.id)"""
      }.mkString(",\n")
      s"""WITH n AS (SELECT count(*) AS n FROM documents),
            e AS ($edgesSql),
            l0 AS (
              SELECT doc_id AS id,
                     CASE WHEN doc_id % $SeedMod = 0 THEN doc_id % 5 END AS lbl
              FROM documents),
            $iterCtes
          SELECT id AS doc_id, coalesce(lbl, -1) AS lbl
          FROM l$Iters ORDER BY doc_id"""
    })

  val all: Seq[Q] = Seq(grPageRank, grDegrees, grTriangles, grLabelProp)
}
