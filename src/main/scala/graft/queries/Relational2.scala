package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second relational battery: grouping sets, correlated subqueries,
  * exact percentiles, pivot-style conditional aggregation, and date
  * arithmetic — rounding out the §2.9 capability surface. SQL-first
  * where the DataFrame API lacks the construct (grouping sets,
  * correlated scalar subqueries), which also exercises `spark.sql`
  * as a product entry point.
  */
object Relational2 {

  private def t(s: SparkSession, dir: String, n: String) = Tables.table(s, dir, n)

  private def withView(s: SparkSession, dir: String, names: String*)(sql: String): DataFrame = {
    names.foreach(n => t(s, dir, n).createOrReplaceTempView(n))
    s.sql(sql)
  }

  /** R11 — explicit GROUPING SETS (beyond rollup/cube). */
  val r11 = Q("r11_grouping_sets",
    (s, dir) => withView(s, dir, "lineitem")(
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows, sum(l_quantity) AS sum_qty
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
         ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""),
    Some("""SELECT l_returnflag, l_linestatus, count(*) AS n_rows, sum(l_quantity) AS sum_qty
            FROM lineitem
            GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
            ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""))

  /** R12 — correlated scalar subquery per outer row. */
  val r12 = Q("r12_correlated_subquery",
    (s, dir) => withView(s, dir, "customer", "orders")(
      """SELECT c_custkey,
                (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders,
                (SELECT round(coalesce(sum(o_totalprice), 0), 2) FROM orders
                 WHERE o_custkey = c_custkey) AS spend
         FROM customer
         WHERE c_custkey < 500
         ORDER BY c_custkey"""),
    Some("""SELECT c_custkey,
                   (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders,
                   (SELECT round(coalesce(sum(o_totalprice), 0), 2) FROM orders
                    WHERE o_custkey = c_custkey) AS spend
            FROM customer
            WHERE c_custkey < 500
            ORDER BY c_custkey"""))

  /** R13 — exact percentiles (Spark `percentile` ≡ DuckDB
    * `quantile_cont`: both linear-interpolate at (n-1)·p; quantities are
    * integral doubles so the interpolated values are exact). */
  val r13 = Q("r13_percentile",
    (s, dir) => t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        round(expr("percentile(l_quantity, 0.5)"), 6).as("p50"),
        round(expr("percentile(l_quantity, 0.9)"), 6).as("p90"),
        round(expr("percentile(l_extendedprice, 0.25)"), 2).as("price_p25"))
      .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag,
                   round(quantile_cont(l_quantity, 0.5), 6) AS p50,
                   round(quantile_cont(l_quantity, 0.9), 6) AS p90,
                   round(quantile_cont(l_extendedprice, 0.25), 2) AS price_p25
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** R14 — pivot as portable conditional aggregation. */
  val r14 = Q("r14_pivot_status",
    (s, dir) => t(s, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(
        count(when(col("o_orderstatus") === "O", 1)).as("n_open"),
        count(when(col("o_orderstatus") === "F", 1)).as("n_filled"),
        count(when(col("o_orderstatus") === "P", 1)).as("n_partial"))
      .orderBy("o_orderpriority"),
    Some("""SELECT o_orderpriority,
                   count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_open,
                   count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_filled,
                   count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_partial
            FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** R15 — date/time arithmetic battery over event timestamps. */
  val r15 = Q("r15_date_arith",
    (s, dir) => t(s, dir, "events")
      .select(
        col("event_id"),
        date_format(col("ts") + expr("INTERVAL 7 DAYS"), "yyyy-MM-dd HH:mm:ss").as("plus7d"),
        datediff(to_date(col("ts")), lit("2024-01-01").cast("date")).as("days_since"),
        month(col("ts")).as("m"),
        dayofmonth(col("ts")).as("d"),
        hour(col("ts")).as("h"),
        date_format(last_day(col("ts")), "yyyy-MM-dd").as("month_end"))
      .orderBy("event_id"),
    Some("""SELECT event_id,
                   strftime(ts + INTERVAL 7 DAY, '%Y-%m-%d %H:%M:%S') AS plus7d,
                   date_diff('day', DATE '2024-01-01', ts::DATE) AS days_since,
                   month(ts) AS m,
                   day(ts) AS d,
                   hour(ts) AS h,
                   strftime(last_day(ts::DATE), '%Y-%m-%d') AS month_end
            FROM events ORDER BY event_id"""))

  /** R16 — salted-join result equality: the skew-mitigation operator
    * (ext/Skew) must produce exactly the plain join's rows; the oracle
    * IS the plain join. */
  val r16 = Q("r16_salted_join",
    (s, dir) => graft.ext.Skew.saltedJoin(
        t(s, dir, "lineitem").withColumnRenamed("l_suppkey", "suppkey"),
        t(s, dir, "supplier").withColumnRenamed("s_suppkey", "suppkey"),
        "suppkey", 8)
      .select(col("l_orderkey"), col("l_linenumber"), col("s_name"))
      .orderBy("l_orderkey", "l_linenumber"),
    Some("""SELECT l_orderkey, l_linenumber, s_name
            FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
            ORDER BY l_orderkey, l_linenumber"""))

  /** R17 — AS-OF join (each view event annotated with the user's latest
    * click at-or-before it): Spark has no asof operator, so this pins
    * the union+running-window composition (`ext/TimeJoins`) against
    * DuckDB's NATIVE `ASOF LEFT JOIN` — two genuinely different
    * implementations of the same semantics. The right side is
    * pre-aggregated to one row per (user, ts) — the determinism
    * contract both engines need. */
  val r17 = Q("r17_asof_join",
    (s, dir) => {
      val ev = t(s, dir, "events")
      val views = ev.filter(col("event_type") === "view")
        .select("event_id", "user_id", "ts", "value")
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy("user_id", "ts").agg(max("value").as("click_value"))
      graft.ext.TimeJoins.asofBackward(views, clicks, "user_id", "ts",
          payload = Seq("click_value"))
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts"),
          col("value"),
          date_format(col("r_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("click_ts"),
          col("r_click_value").as("click_value"))
        .orderBy("event_id")
    },
    Some("""WITH l AS (SELECT event_id, user_id, ts, value FROM events
                       WHERE event_type = 'view'),
                 r AS (SELECT user_id, ts, max(value) AS click_value FROM events
                       WHERE event_type = 'click' GROUP BY 1, 2)
            SELECT l.event_id, l.user_id,
                   strftime(l.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts, l.value,
                   strftime(r.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts, r.click_value
            FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
            ORDER BY l.event_id"""))

  /** R18 — interval (range) join: purchases falling inside the 30-minute
    * window after any signup, WITHOUT an equality key — the pure range
    * case a naive range-predicate join executes as a nested loop. The
    * Spark side routes through the bucketized equality join
    * (`TimeJoins.intervalJoin`); the oracle is the plain inequality
    * join, so the hash match proves bucket+re-verify ≡ the range
    * predicate. */
  val r18 = Q("r18_range_join",
    (s, dir) => {
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("ts").as("p_ts"))
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("event_id").as("signup_id"), col("ts").as("s_ts"),
          expr("ts + INTERVAL 30 MINUTES").as("s_end"))
      graft.ext.TimeJoins.intervalJoin(
          purchases, "p_ts", signups, "s_ts", "s_end", widthSec = 1800)
        .select("purchase_id", "signup_id")
        .orderBy("purchase_id", "signup_id")
    },
    Some("""SELECT p.event_id AS purchase_id, s.event_id AS signup_id
            FROM (SELECT event_id, ts FROM events WHERE event_type = 'purchase') p
            JOIN (SELECT event_id, ts FROM events WHERE event_type = 'signup') s
              ON p.ts >= s.ts AND p.ts < s.ts + INTERVAL 30 MINUTE
            ORDER BY purchase_id, signup_id"""))

  /** R19 — semi-structured extraction: `events.props` is a JSON string;
    * `from_json` with an explicit schema parses it ONCE into a typed
    * struct (codegen'd Jackson parse — the Spark-idiomatic route, vs
    * get_json_object re-parsing per path), then plain typed aggregation.
    * The mean is an explicit sum/count division on both engines (avg()
    * dialect differences don't get a chance to matter). */
  val r19 = Q("r19_json_extract",
    (s, dir) => t(s, dir, "events")
      .withColumn("k",
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT")).getField("k"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        round(sum(col("k")).cast("double") / count(col("k")).cast("double"), 6)
          .as("mean_k"))
      .orderBy("event_type"),
    Some("""SELECT event_type, count(*) AS n,
                   CAST(sum((props->>'k')::INT) AS BIGINT) AS sum_k,
                   min((props->>'k')::INT) AS min_k,
                   max((props->>'k')::INT) AS max_k,
                   round(sum((props->>'k')::INT)::DOUBLE
                         / count((props->>'k')::INT)::DOUBLE, 6) AS mean_k
            FROM events GROUP BY 1 ORDER BY event_type"""))

  /** R20 — SLIDING time windows (1h window, 30min slide): every event
    * lands in exactly two windows. Spark's `window(ts, w, s)` expands
    * the assignment internally; the DuckDB twin materializes the same
    * two window starts per event via unnest — both windows provably
    * contain the event (ts ∈ [tb, tb+30) ⊂ [tb-30, tb+30) ∩ [tb, tb+60)),
    * so no re-filter is needed. */
  val r20 = Q("r20_sliding_window",
    (s, dir) => t(s, dir, "events")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))
      .orderBy("window_start", "event_type"),
    Some("""WITH w AS (
              SELECT unnest([time_bucket(INTERVAL 30 MINUTE, ts),
                             time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE]) AS ws,
                     event_type, value
              FROM events)
            SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, event_type,
                   count(*) AS n_events, round(sum(value), 2) AS sum_value
            FROM w GROUP BY 1, 2 ORDER BY window_start, event_type"""))

  /** R21 — array construction + higher-order functions as a declared
    * capability (they're used internally everywhere; this pins them
    * cross-engine): per-order sorted quantity array, then filter /
    * aggregate / transform over it. The array column is materialized as
    * an ATTRIBUTE before any lambda touches it (the HOF re-evaluation
    * trap: a derived expression inlines into every lambda element). */
  val r21 = Q("r21_array_hof",
    (s, dir) => t(s, dir, "lineitem")
      .filter(col("l_orderkey") < 1000)
      .groupBy("l_orderkey")
      .agg(array_sort(collect_list(col("l_quantity").cast("long"))).as("qtys"))
      .select(col("l_orderkey"),
        // serialized, not raw: the gate's comparator sorts columns by
        // value, and a list cell is unhashable there — the CSV form
        // pins the same content while staying comparable
        array_join(transform(col("qtys"), x => x.cast("string")), ",")
          .as("qtys_csv"),
        size(filter(col("qtys"), x => x > 25)).as("n_big"),
        aggregate(col("qtys"), lit(0L), (acc, x) => acc + x).as("total_qty"),
        element_at(transform(col("qtys"), x => x * 2), 1).as("min_doubled"))
      .orderBy("l_orderkey"),
    Some("""WITH base AS (
              SELECT l_orderkey, list_sort(list(CAST(l_quantity AS BIGINT))) AS qtys
              FROM lineitem WHERE l_orderkey < 1000 GROUP BY 1)
            SELECT l_orderkey,
                   list_aggregate(list_transform(qtys, x -> CAST(x AS VARCHAR)),
                                  'string_agg', ',') AS qtys_csv,
                   CAST(len(list_filter(qtys, x -> x > 25)) AS INT) AS n_big,
                   CAST(list_aggregate(qtys, 'sum') AS BIGINT) AS total_qty,
                   CAST(qtys[1] * 2 AS BIGINT) AS min_doubled
            FROM base ORDER BY l_orderkey"""))

  /** R22 — the TPC-H Q3 shape (shipping-priority top-10): a three-table
    * star join with selective filters on every side, grouped revenue,
    * global top-k. The plan the optimizer should pick — and .explain
    * confirms — pushes all three filters to the scans, broadcasts the
    * filtered customer dim, and finishes with TakeOrderedAndProject
    * (per-partition top-10, never a global sort). Revenue is rounded
    * in-query on both sides (the project-wide double-sum determinism
    * convention, see r2). */
  val r22 = Q("r22_tpch_q3",
    (s, dir) => {
      val cut = to_timestamp(lit("1998-01-01"))
      val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      t(s, dir, "lineitem").filter(col("l_shipdate") > cut)
        .join(t(s, dir, "orders").filter(col("o_orderdate") < cut),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },
    Some("""SELECT l_orderkey, o_orderdate, o_orderpriority,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1998-01-01'
              AND l_shipdate > TIMESTAMP '1998-01-01'
            GROUP BY 1, 2, 3
            ORDER BY revenue DESC, l_orderkey
            LIMIT 10"""))

  /** R23 — latest-record-per-key compaction (the upsert-resolution /
    * CDC-compaction shape every lakehouse table maintenance job runs):
    * one `max_by` over a (ts, id) ordering struct — a partial-aggregatable
    * argmax, so the shuffle carries one row per key and there is NO
    * per-key window sort of the fact table (the oracle reconstructs the
    * same pick with a rank window, the formulation the engine
    * deliberately avoids at scale). */
  val r23 = Q("r23_latest_by_key",
    (s, dir) => t(s, dir, "events")
      .groupBy("user_id", "event_type")
      .agg(max_by(
        struct(col("ts"), col("event_id"), col("value")),
        struct(col("ts"), col("event_id"))).as("last"))
      .select(col("user_id"), col("event_type"),
        col("last.ts").as("last_ts"),
        col("last.event_id").as("last_event_id"),
        col("last.value").as("last_value"))
      .orderBy("user_id", "event_type"),
    Some("""SELECT user_id, event_type, ts AS last_ts,
                   event_id AS last_event_id, value AS last_value
            FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                    ORDER BY ts DESC, event_id DESC) AS rn
                  FROM events)
            WHERE rn = 1
            ORDER BY user_id, event_type"""))

  /** R24 — the navigation/distribution window-function battery
    * (lag/lead/ntile/percent_rank/first_value) per customer ordered by
    * (date, key). These are value-copy and rank functions, not
    * aggregations, so results are engine-exact without rounding tricks;
    * percent_rank (a small rational) still gets the project-wide
    * round-6. The partition key has customer cardinality — thousands of
    * small groups hash-spread across tasks, NOT the few-groups skew
    * shape the two-phase top-k exists for. */
  val r24 = Q("r24_window_funcs",
    (s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        lag("o_totalprice", 1).over(w).as("prev_price"),
        lead("o_totalprice", 1).over(w).as("next_price"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pr"),
        round(col("o_totalprice") - first_value(col("o_totalprice")).over(w), 2)
          .as("delta_from_first"))
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey,
                   lag(o_totalprice, 1) OVER w AS prev_price,
                   lead(o_totalprice, 1) OVER w AS next_price,
                   CAST(ntile(4) OVER w AS INT) AS quartile,
                   round(percent_rank() OVER w, 6) AS pr,
                   round(o_totalprice - first_value(o_totalprice) OVER w, 2)
                     AS delta_from_first
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
            ORDER BY o_orderkey"""))

  /** R25 — the TPC-H Q5 shape (local-supplier volume): a SIX-table join
    * where customer and supplier must share a nation, region-filtered,
    * one year of orders. The plan to want — and `.explain` confirms —
    * broadcasts the three dimension tables (region→nation→supplier
    * chain collapses before touching facts), shuffles only
    * lineitem⋈orders⋈customer on their keys, and the c_nationkey =
    * s_nationkey equi-condition rides the supplier join as a key, not a
    * post-filter. Revenue rounded in-query on both sides (the r2/r22
    * double-sum convention). */
  val r25 = Q("r25_tpch_q5",
    (s, dir) => {
      val lo = to_timestamp(lit("1996-01-01"))
      val hi = to_timestamp(lit("1997-01-01"))
      val nat = t(s, dir, "nation")
        .join(broadcast(t(s, dir, "region").filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders")
            .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },
    Some("""SELECT n_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY 1 ORDER BY revenue DESC, n_name"""))

  val all: Seq[Q] = Seq(r11, r12, r13, r14, r15, r16, r17, r18, r19, r20,
    r21, r22, r23, r24, r25)
}
