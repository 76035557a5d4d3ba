package graft.queries

import graft.QueryPack
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * Relational coverage over the TPC-H-ish test tables: aggregation, joins,
 * windows, set ops. The reference has none of these (SURVEY §2.D) — they are
 * the capability extension required by the north star, expressed as plain
 * declarative plans so Catalyst does pushdown/pruning/join-selection.
 *
 * Money math: doubles are cast to exact DECIMAL(18,3) (the data has <= 3
 * decimal places) BEFORE aggregation, so sums are exact and order-independent
 * — summing raw doubles would make the result depend on partitioning, and no
 * rounding width is safe against that at 100 TB. Final values cast back to
 * DOUBLE (exact decimal -> nearest double is deterministic on both engines).
 */
object RelationalQueries extends QueryPack {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 3))
  private def pct(c: Column): Column = c.cast(DecimalType(4, 3))
  private val one = lit(1).cast(DecimalType(4, 3))

  override def queries: Map[String, Q] = Map(
    // TPC-H Q1-style pricing summary: the canonical partial-agg friendly
    // groupBy — map-side combine on 6 groups means ~nothing shuffles.
    "q1_pricing_summary" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      li.filter(col("l_shipdate").cast("date") <= lit(java.sql.Date.valueOf("1998-09-02")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * (one - pct(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          sum(dec(col("l_extendedprice")) * (one - pct(col("l_discount")))
            * (one + pct(col("l_tax")))).cast("double").as("sum_charge"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // TPC-H Q6-style forecast revenue: the pure scan-filter-sum shape —
    // every predicate reaches the parquet scan (PushedFilters), the agg
    // is a single map-side-combined scalar. The simplest query a planner
    // must not mess up.
    "q6_forecast_revenue" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate").cast("date") >= lit(java.sql.Date.valueOf("1996-01-01")) &&
          col("l_shipdate").cast("date") < lit(java.sql.Date.valueOf("1997-01-01")) &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(sum(dec(col("l_extendedprice")) * pct(col("l_discount")))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))),

    // Q5-style join chain: revenue per nation. Only `nation` (25 rows at any
    // sf) is force-broadcast; `customer` scales linearly with sf, so its join
    // is left to Catalyst/AQE — shuffle hash at scale, auto-broadcast when
    // small enough. A forced broadcast there would OOM on a 100 TB run.
    "q5_nation_revenue" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(dec(col("l_extendedprice")) * (one - pct(col("l_discount"))))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("n_name"))
    }),

    // Q10-style: top 10 customers by returned-item revenue.
    "q10_top_returners" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(sum(dec(col("l_extendedprice")) * (one - pct(col("l_discount"))))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey").asc)
        .limit(10)
    }),

    // TPC-H Q3 shape (shipping priority): selective dimension filter on
    // the SMALL side (market segment) -> broadcast into the fact joins,
    // date predicates pushed to both scans, revenue top-k. The classic
    // join-order test: Catalyst must filter customer BEFORE joining.
    "q3_shipping_priority" -> ((s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1995-03-15").cast("timestamp"))
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1995-03-15").cast("timestamp"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(dec(col("l_extendedprice")) * (one - pct(col("l_discount"))))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    }),

    // TPC-H Q18 shape (large-volume orders): HAVING on an aggregate
    // turned into a semi-join — the big-quantity orderkeys reduce FIRST
    // (partial agg on the fact table), then prune the joins. Nothing
    // carries the full lineitem through the customer join.
    "q18_large_orders" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val big = li.groupBy(col("l_orderkey"))
        .agg(sum(dec(col("l_quantity"))).as("total_qty"))
        .filter(col("total_qty") > dec(lit(150)))
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      big.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_orderdate"), col("total_qty").cast("double").as("total_qty"))
        .orderBy(col("total_qty").desc, col("o_orderkey").asc)
        .limit(20)
    }),

    // ROLLUP: hierarchical subtotals (returnflag -> returnflag+linestatus
    // -> grand total) in one pass — partial-agg friendly like any groupBy.
    "q_rollup_pricing" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)),

    // CUBE: all 2^2 grouping-set combinations in one pass (ROLLUP's
    // superset — adds the linestatus-only marginals). Same partial-agg
    // shape; Spark expands the grouping sets before the single shuffle.
    "q_cube_pricing" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)),

    // Running window aggregate: per-customer cumulative order total in
    // date order. One shuffle on the partition key; the frame is the
    // default UNBOUNDED PRECEDING..CURRENT ROW.
    "q_running_order_total" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders")
        .filter(col("o_custkey") < 100)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          sum(dec(col("o_totalprice"))).over(w).cast("double").as("running_total"))
        .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
    }),

    // Subquery semi-join: customers having at least one urgent order —
    // planned as a left-semi hash join, never a per-row subquery.
    "q_urgent_customers" -> ((s, dir) => {
      val urgent = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      t(s, dir, "customer")
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // Set operators: INTERSECT / EXCEPT over two derived key sets (urgent
    // customers vs customers with returned items). Spark plans both as
    // hash semi/anti joins after distinct — one shuffle each, no sort.
    "q_set_ops" -> ((s, dir) => {
      val urgent = t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("cust"))
      val returners = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("cust"))
      val both = urgent.intersect(returners)
      val urgentOnly = urgent.except(returners)
      import s.implicits._
      both.agg(count(lit(1)).as("n")).select(lit("intersect").as("op"), col("n"))
        .unionByName(urgentOnly.agg(count(lit(1)).as("n"))
          .select(lit("except").as("op"), col("n")))
        .orderBy(col("op"))
    }),

    // Date dimension math: fiscal rollup by (year, quarter) with day
    // arithmetic — all codegen'd date intrinsics, no UDFs.
    "q_orders_by_quarter" -> ((s, dir) =>
      t(s, dir, "orders")
        .select(year(col("o_orderdate")).as("yr"),
          quarter(col("o_orderdate")).as("qtr"),
          datediff(to_date(lit("1998-12-31")), col("o_orderdate").cast("date"))
            .as("days_to_cutoff"),
          dec(col("o_totalprice")).as("price"))
        .groupBy(col("yr"), col("qtr"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("days_to_cutoff")).as("total_days"),
          sum(col("price")).cast("double").as("revenue"))
        .orderBy(col("yr"), col("qtr")))
  )

  override def oracleSql: Map[String, String] = Map(
    "q6_forecast_revenue" ->
      """SELECT
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,3)) *
        |    CAST(l_discount AS DECIMAL(4,3))) AS VARCHAR) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem
        |WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
        |  AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,3))) AS VARCHAR) AS DOUBLE) AS sum_qty,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,3))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,3)) * (CAST(1 AS DECIMAL(4,3)) - CAST(l_discount AS DECIMAL(4,3)))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,3)) * (CAST(1 AS DECIMAL(4,3)) - CAST(l_discount AS DECIMAL(4,3))) * (CAST(1 AS DECIMAL(4,3)) + CAST(l_tax AS DECIMAL(4,3)))) AS VARCHAR) AS DOUBLE) AS sum_charge,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q5_nation_revenue" ->
      """SELECT n_name,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,3)) * (CAST(1 AS DECIMAL(4,3)) - CAST(l_discount AS DECIMAL(4,3)))) AS VARCHAR) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,
    "q10_top_returners" ->
      """SELECT c_custkey, c_name,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,3)) * (CAST(1 AS DECIMAL(4,3)) - CAST(l_discount AS DECIMAL(4,3)))) AS VARCHAR) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE l_returnflag = 'R'
        |GROUP BY c_custkey, c_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 10""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,3)) * (CAST(1 AS DECIMAL(4,3)) - CAST(l_discount AS DECIMAL(4,3)))) AS VARCHAR) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-03-15'
        |  AND l_shipdate > TIMESTAMP '1995-03-15'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "q18_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey,
        |    sum(CAST(l_quantity AS DECIMAL(18,3))) AS total_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING sum(CAST(l_quantity AS DECIMAL(18,3))) > 150
        |)
        |SELECT c_custkey, c_name, o_orderkey, o_orderdate,
        |  CAST(CAST(total_qty AS VARCHAR) AS DOUBLE) AS total_qty
        |FROM big
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY total_qty DESC, o_orderkey
        |LIMIT 20""".stripMargin,
    "q_rollup_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,3))) AS VARCHAR) AS DOUBLE) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q_cube_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,3))) AS VARCHAR) AS DOUBLE) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q_running_order_total" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,3)))
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS VARCHAR) AS DOUBLE)
        |    AS running_total
        |FROM orders WHERE o_custkey < 100
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
    "q_urgent_customers" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "q_set_ops" ->
      """WITH urgent AS (
        |  SELECT o_custkey AS cust FROM orders WHERE o_orderpriority = '1-URGENT'
        |), returners AS (
        |  SELECT o_custkey AS cust FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_returnflag = 'R'
        |)
        |SELECT 'intersect' AS op, count(*) AS n FROM
        |  (SELECT cust FROM urgent INTERSECT SELECT cust FROM returners)
        |UNION ALL
        |SELECT 'except' AS op, count(*) AS n FROM
        |  (SELECT cust FROM urgent EXCEPT SELECT cust FROM returners)
        |ORDER BY op""".stripMargin,
    "q_orders_by_quarter" ->
      """SELECT year(o_orderdate) AS yr, quarter(o_orderdate) AS qtr,
        |  count(*) AS n_orders,
        |  CAST(sum(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31')) AS BIGINT) AS total_days,
        |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,3))) AS VARCHAR) AS DOUBLE) AS revenue
        |FROM orders
        |GROUP BY yr, qtr ORDER BY yr, qtr""".stripMargin
  )
}
