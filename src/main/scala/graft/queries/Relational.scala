package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.9 R-inventory: the relational capability surface the
  * engine exposes beyond the reference's own operators (which contain no
  * joins or GROUP BYs at all — §2.3/§2.4). All stock Catalyst; the value
  * here is scale-correct plan shapes: dimension joins broadcast, partial
  * aggregation before shuffles, window top-k instead of global sorts.
  */
object Relational {

  private def t(s: SparkSession, dir: String, n: String) = Tables.table(s, dir, n)

  /** R1 — filter + project with pushdown-friendly predicates; the
    * filters and the 5-column projection must reach the Parquet scan. */
  val r1 = Q("r1_filter_project",
    (s, dir) => t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount")
      .orderBy("l_orderkey", "l_linenumber"),
    Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
              AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
            ORDER BY l_orderkey, l_linenumber"""))

  /** R2 — star join: fact side stays partitioned, dimensions broadcast
    * (nation/region always; customer is left to AQE at real scale). */
  val r2 = Q("r2_join",
    (s, dir) => t(s, dir, "orders")
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .filter(col("o_totalprice") > 150000)
      .select("o_orderkey", "o_totalprice", "c_name", "n_name", "r_name")
      .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey, o_totalprice, c_name, n_name, r_name
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE o_totalprice > 150000
            ORDER BY o_orderkey"""))

  /** R3 — left semi: customers having at least one order. */
  val r3 = Q("r3_semi_join",
    (s, dir) => t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey"),
    Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
            WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
            ORDER BY c_custkey"""))

  /** R3b — left anti: customers with no orders. */
  val r3b = Q("r3_anti_join",
    (s, dir) => t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey"),
    Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
            ORDER BY c_custkey"""))

  /** R4 — grouped aggregation (TPC-H Q1 shape). Partial (map-side)
    * aggregation makes the shuffle carry 4 groups, not 600k rows.
    * Order-sensitive double sums are rounded in-query on both sides;
    * quantity sums are exact (integral doubles). */
  val r4 = Q("r4_agg",
    (s, dir) => t(s, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum("l_quantity").as("sum_qty"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        round(avg("l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus"),
    Some("""SELECT l_returnflag, l_linestatus,
              sum(l_quantity) AS sum_qty,
              round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
              round(avg(l_discount), 6) AS avg_disc,
              count(*) AS count_order
            FROM lineitem GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus"""))

  /** R5 — rollup (grouping sets). NULLS FIRST is explicit in the oracle:
    * DuckDB's default sort order for NULLs differs from Spark's. */
  val r5 = Q("r5_rollup",
    (s, dir) => t(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_rows"), sum("l_quantity").as("sum_qty"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus")),
    Some("""SELECT l_returnflag, l_linestatus, count(*) AS n_rows, sum(l_quantity) AS sum_qty
            FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
            ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""))

  /** R5b — cube, same discipline. */
  val r5b = Q("r5_cube",
    (s, dir) => t(s, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_rows"))
      .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority")),
    Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n_rows
            FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
            ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST"""))

  /** R6 — top-3 orders per customer: partitioned window + rank filter,
    * never a global sort of the fact table. */
  val r6 = Q("r6_window_topk",
    (s, dir) => t(s, dir, "orders")
      .withColumn("rn", row_number().over(
        Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)))
      .filter(col("rn") <= 3)
      .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "rn"),
    Some("""SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
              SELECT o_custkey, o_orderkey, o_totalprice,
                     row_number() OVER (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
              FROM orders) WHERE rn <= 3
            ORDER BY o_custkey, rn"""))

  /** R6b — running aggregate window (frame-based). */
  val r6b = Q("r6_window_running",
    (s, dir) => t(s, dir, "orders")
      .filter(col("o_custkey") < 200)
      .withColumn("running_spend", round(sum("o_totalprice").over(
        Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2))
      .select("o_custkey", "o_orderkey", "running_spend")
      .orderBy("o_custkey", "o_orderkey"),
    Some("""SELECT o_custkey, o_orderkey,
              round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                ORDER BY o_orderdate ASC, o_orderkey ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
            FROM orders WHERE o_custkey < 200
            ORDER BY o_custkey, o_orderkey"""))

  /** R7 — set operations over key sets. */
  val r7 = Q("r7_set_ops",
    (s, dir) => {
      val cust = t(s, dir, "customer")
      val orders = t(s, dir, "orders")
      val building = cust.filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("custkey"))
      val withOrders = orders.select(col("o_custkey").as("custkey")).distinct()
      val machinery = cust.filter(col("c_mktsegment") === "MACHINERY")
        .select(col("c_custkey").as("custkey"))
      building.intersect(withOrders).withColumn("op", lit("building_with_orders"))
        .union(building.except(withOrders).withColumn("op", lit("building_no_orders")))
        .union(building.union(machinery).distinct().withColumn("op", lit("building_or_machinery")))
        .select("op", "custkey")
        .orderBy("op", "custkey")
    },
    Some("""WITH building AS (SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
                 machinery AS (SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'MACHINERY'),
                 with_orders AS (SELECT DISTINCT o_custkey AS custkey FROM orders)
            SELECT 'building_with_orders' AS op, custkey FROM (SELECT custkey FROM building INTERSECT SELECT custkey FROM with_orders)
            UNION ALL
            SELECT 'building_no_orders' AS op, custkey FROM (SELECT custkey FROM building EXCEPT SELECT custkey FROM with_orders)
            UNION ALL
            SELECT 'building_or_machinery' AS op, custkey FROM (SELECT custkey FROM building UNION SELECT custkey FROM machinery)
            ORDER BY op, custkey"""))

  /** R8 — exact distinct aggregation (the approx_count_distinct twin is
    * bounds-asserted in ScalaTest; approximations don't oracle-compare). */
  val r8 = Q("r8_distinct_agg",
    (s, dir) => t(s, dir, "lineitem")
      .agg(
        countDistinct(col("l_partkey")).as("distinct_parts"),
        countDistinct(col("l_suppkey")).as("distinct_supps"),
        count(lit(1)).as("n_rows")),
    Some("""SELECT count(DISTINCT l_partkey) AS distinct_parts,
                   count(DISTINCT l_suppkey) AS distinct_supps,
                   count(*) AS n_rows
            FROM lineitem"""))

  /** R9 — tumbling 1-hour event windows (batch `window()` ≡ DuckDB
    * `date_trunc`); window start serialized as string so both engines
    * hash the same value. */
  val r9 = Q("r9_time_window",
    (s, dir) => t(s, dir, "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))
      .orderBy("window_start", "event_type"),
    Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
                   event_type, count(*) AS n_events, round(sum(value), 2) AS sum_value
            FROM events GROUP BY 1, 2
            ORDER BY window_start, event_type"""))

  /** R10 — scalar function battery: string, date, JSON-in-string. */
  val r10 = Q("r10_scalars",
    (s, dir) => t(s, dir, "events")
      .select(
        col("event_id"),
        upper(col("event_type")).as("type_u"),
        substring(col("event_type"), 1, 3).as("type_3"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .orderBy("event_id"),
    Some("""SELECT event_id, upper(event_type) AS type_u, substr(event_type, 1, 3) AS type_3,
                   strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
            FROM events ORDER BY event_id"""))

  val all: Seq[Q] = Seq(r1, r2, r3, r3b, r4, r5, r5b, r6, r6b, r7, r8, r9, r10)
}
