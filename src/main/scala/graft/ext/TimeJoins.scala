package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series joins Spark has no built-in operator for, composed
  * Spark-first from windows instead of range predicates.
  *
  * An as-of join expressed as `l JOIN r ON l.key = r.key AND l.ts >= r.ts`
  * + a per-row argmax is a multiplicative range join (every left row
  * matches EVERY earlier right row before the reduction) — quadratic per
  * key and a scale killer. The union-scan form below is the classic
  * merge-join shape: ONE shuffle by key, one sort, one linear pass.
  */
object TimeJoins {

  /** Backward as-of join: for every left row, attach the right row with
    * the greatest `ts` at-or-before the left row's `ts` within the same
    * `key` (NULLs when no prior right row exists — left-join semantics).
    *
    * Mechanics: tag both inputs, union them, and take the running
    * last-non-null of the right payload per key ordered by
    * `(ts, side)` — right rows sort BEFORE left rows at equal `ts`, so
    * the match is inclusive. Output carries every left column plus
    * `r_ts` and `r_<payload>` columns.
    *
    * Determinism contract: `right` must be unique per (key, ts) —
    * aggregate it first if needed (multiple right rows at the same
    * instant have no well-defined as-of winner in ANY engine; DuckDB's
    * ASOF JOIN picks arbitrarily there too).
    *
    * Scale shape: one hash shuffle of `left ∪ right` by `key` + an
    * in-partition sort — the same cost as the window it needs, nothing
    * quadratic, no broadcast. Skewed keys fall under the same
    * salting/AQE levers as any single-key window. */
  def asofBackward(left: DataFrame, right: DataFrame, key: String, ts: String,
                   payload: Seq[String]): DataFrame = {
    // the matched row travels as ONE struct: carrying each r_* column
    // through its own last(ignoreNulls) would mix rows whenever a
    // matched right row holds a NULL payload value (its NULL would be
    // "filled" from an OLDER right row — a chimera no engine's as-of
    // join produces). The struct is non-null exactly for right rows, so
    // one last(ignoreNulls) picks one whole row or nothing. NULL-ts
    // right rows are dropped up front: a range comparison never matches
    // them, but ASC ordering would sort them first and leak their
    // payload into every no-match row.
    val reserved = Seq("__side", "__match", "r_ts") ++ payload.map(p => s"r_$p")
    val clash = left.columns.toSeq.intersect(reserved)
    require(clash.isEmpty,
      s"asofBackward reserves column name(s) ${clash.mkString(", ")} on the left input")
    // NULL-key right rows are dropped like NULL-ts ones: an equality
    // predicate `l.key = r.key` (and DuckDB's ASOF JOIN, the r17 oracle)
    // never matches NULL keys, but Window.partitionBy groups NULLs
    // together and would hand a NULL-key left row a NULL-key "match"
    val r2 = right.filter(col(ts).isNotNull && col(key).isNotNull).select(
      col(key), col(ts),
      struct((col(ts).as("r_ts") +: payload.map(p => col(p).as(s"r_$p"))): _*)
        .as("__match"))
      .withColumn("__side", lit(0))
    val l2 = left.withColumn("__side", lit(1))
    val w = Window.partitionBy(key)
      .orderBy(col(ts).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l2.unionByName(r2, allowMissingColumns = true)
      .withColumn("__match", last(col("__match"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((left.columns.map(col) :+ col("__match.r_ts").as("r_ts")) ++
        payload.map(p => col(s"__match.r_$p").as(s"r_$p")): _*)
  }

  /** Bucketized interval (range) join: every `points` row paired with
    * every `intervals` row whose half-open `[start, end)` contains the
    * point's timestamp. Column names must be disjoint across the two
    * inputs (pre-select/rename on the caller side).
    *
    * A naive `p.ts >= i.start AND p.ts < i.end` join has no equality
    * key — Spark executes it as a nested-loop over the whole product.
    * Bucketizing by a fixed width turns it into an EQUALITY join:
    * intervals explode to the buckets they overlap, points carry their
    * single bucket, and the exact predicate re-verifies the matches.
    * Each true match is found exactly once (via the point's own
    * bucket), so no post-join dedup is needed. `widthSec` trades
    * interval fan-out (long intervals explode into more buckets)
    * against bucket selectivity — set it near the typical interval
    * length. */
  def intervalJoin(points: DataFrame, pTs: String,
                   intervals: DataFrame, startTs: String, endTs: String,
                   widthSec: Long): DataFrame = {
    val w = widthSec * 1000000L // bucket arithmetic in unix micros
    val p = points.withColumn("__b", expr(s"unix_micros($pTs) div $w"))
    // end is exclusive: the last covered bucket is the one holding end-1µs.
    // Empty/inverted intervals are dropped BEFORE the explode — they can
    // match nothing, and Spark's sequence(a, b) with b < a generates a
    // DESCENDING range, so one malformed row would otherwise fan out
    // into millions of spurious buckets instead of zero
    val i = intervals
      .filter(col(endTs) > col(startTs))
      .withColumn("__b", explode(expr(
        s"sequence(unix_micros($startTs) div $w, (unix_micros($endTs) - 1) div $w)")))
    p.join(i, Seq("__b"))
      .filter(col(pTs) >= col(startTs) && col(pTs) < col(endTs))
      .drop("__b")
  }
}
