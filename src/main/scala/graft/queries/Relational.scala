package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.core.{Num, Tables}

/** Core relational surface: scan/filter/project, hash & broadcast joins,
  * aggregation, windows, rollup, semi/anti joins, set ops, time bucketing.
  *
  * Design notes for 100 TB:
  *  - dimension tables (region/nation) are explicitly `broadcast()` — at
  *    full scale they stay tiny while fact tables grow, so the hint stays
  *    correct and removes a shuffle per join;
  *  - every aggregate uses decimal-exact sums ([[graft.core.Num]]) so
  *    results are independent of partial-aggregation order;
  *  - filters and projections are plain Catalyst expressions → pushed into
  *    the parquet scan (verified via `.explain`: PushedFilters/ReadSchema).
  */
object Relational {
  import Num._

  private def dec(c: Column, s: Int = 4): Column = c.cast(DecimalType(38, s))

  val all: Seq[GraftQuery] = Seq(

    // ------------------------------------------------------------------
    // q01: full-scan hash aggregation (TPC-H Q1 shape).
    GraftQuery(
      "q01_pricing_summary",
      Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(38,6))) AS DOUBLE) AS sum_charge,
               CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) / CAST(COUNT(l_quantity) AS DOUBLE) AS avg_qty,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
      """.trim),
      (spark, dir) => {
        val li = Tables(spark, dir).lineitem
        li.filter(col("l_shipdate") <= lit("2001-09-02 00:00:00").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dsum(col("l_quantity"), 4).as("sum_qty"),
            dsum(col("l_extendedprice"), 4).as("sum_base_price"),
            sum(dec(col("l_extendedprice") * (lit(1) - col("l_discount")), 6))
              .cast(DoubleType).as("sum_disc_price"),
            sum(dec(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 6))
              .cast(DoubleType).as("sum_charge"),
            davg(col("l_quantity"), 4).as("avg_qty"),
            count(lit(1)).as("count_order"))
      }),

    // ------------------------------------------------------------------
    // q02: predicate + projection pushdown (scan reads 4 of 11 columns).
    GraftQuery(
      "q02_filter_project",
      Some("""
        SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '2000-07-01 00:00:00'
          AND l_discount >= 0.05 AND l_quantity < 24
      """.trim),
      (spark, dir) => {
        val li = Tables(spark, dir).lineitem
        li.filter(
            col("l_shipdate") >= lit("2000-01-01 00:00:00").cast("timestamp") &&
            col("l_shipdate") < lit("2000-07-01 00:00:00").cast("timestamp") &&
            col("l_discount") >= 0.05 && col("l_quantity") < 24)
          .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
      }),

    // ------------------------------------------------------------------
    // q03: fact-fact shuffle join + broadcast dimension chain, revenue per
    // nation. customer/orders/lineitem shuffle on their keys; nation is
    // broadcast (25 rows at any scale factor).
    GraftQuery(
      "q03_revenue_by_nation",
      Some("""
        SELECT n.n_name AS nation,
               CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_items
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
      """.trim),
      (spark, dir) => {
        val t = Tables(spark, dir)
        t.lineitem
          .join(t.orders, col("l_orderkey") === col("o_orderkey"))
          .join(t.customer, col("o_custkey") === col("c_custkey"))
          .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name").as("nation"))
          .agg(
            sum(dec(col("l_extendedprice") * (lit(1) - col("l_discount")), 6))
              .cast(DoubleType).as("revenue"),
            count(lit(1)).as("n_items"))
      }),

    // ------------------------------------------------------------------
    // q04: group + deterministic top-k (order by measure desc, key asc).
    GraftQuery(
      "q04_top_customers",
      Some("""
        SELECT c.c_custkey, c.c_name,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS total_spent,
               COUNT(*) AS n_orders
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey, c.c_name
        ORDER BY total_spent DESC, c_custkey ASC
        LIMIT 10
      """.trim),
      (spark, dir) => {
        val t = Tables(spark, dir)
        t.orders
          .join(t.customer, col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_custkey"), col("c_name"))
          .agg(
            dsum(col("o_totalprice"), 4).as("total_spent"),
            count(lit(1)).as("n_orders"))
          .orderBy(col("total_spent").desc, col("c_custkey").asc)
          .limit(10)
      }),

    // ------------------------------------------------------------------
    // q05: rollup (hierarchical grouping sets) over region → nation.
    GraftQuery(
      "q05_rollup_region_nation",
      Some("""
        SELECT r.r_name AS region, n.n_name AS nation,
               COUNT(c.c_custkey) AS n_customers,
               CAST(SUM(CAST(c.c_acctbal AS DECIMAL(38,4))) AS DOUBLE) AS sum_acctbal
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY ROLLUP(region, nation)
      """.trim),
      (spark, dir) => {
        val t = Tables(spark, dir)
        t.customer
          .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
          .select(col("r_name").as("region"), col("n_name").as("nation"),
            col("c_custkey"), col("c_acctbal"))
          .rollup(col("region"), col("nation"))
          .agg(
            count(col("c_custkey")).as("n_customers"),
            dsum(col("c_acctbal"), 4).as("sum_acctbal"))
      }),

    // ------------------------------------------------------------------
    // q06: window functions — top-3 orders per customer by price (unique
    // tie-break on orderkey keeps ranks deterministic).
    GraftQuery(
      "q06_window_top_orders",
      Some("""
        SELECT * FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
          FROM orders) WHERE rn <= 3
      """.trim),
      (spark, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        Tables(spark, dir).orders
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
      }),

    // ------------------------------------------------------------------
    // q07: anti join — customers with no recent orders (NOT EXISTS).
    GraftQuery(
      "q07_customers_without_orders",
      Some("""
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
      """.trim),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val recent = t.orders.filter(
          col("o_orderdate") >= lit("2001-01-01 00:00:00").cast("timestamp"))
        t.customer
          .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey", "c_name", "c_mktsegment")
      }),

    // ------------------------------------------------------------------
    // q08: semi join — parts that actually ship, counted per brand.
    GraftQuery(
      "q08_active_parts_by_brand",
      Some("""
        SELECT p_brand, COUNT(*) AS n_parts
        FROM part p
        WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
        GROUP BY p_brand
      """.trim),
      (spark, dir) => {
        val t = Tables(spark, dir)
        t.part
          .join(t.lineitem, col("p_partkey") === col("l_partkey"), "left_semi")
          .groupBy(col("p_brand"))
          .agg(count(lit(1)).as("n_parts"))
      }),

    // ------------------------------------------------------------------
    // q09: set operations — INTERSECT / EXCEPT over customer key sets.
    GraftQuery(
      "q09_setops_segments",
      Some("""
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 0
        INTERSECT
        SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
        EXCEPT
        SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 450000
      """.trim),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val building = t.customer
          .filter(col("c_mktsegment") === "BUILDING" && col("c_acctbal") > 0)
          .select("c_custkey")
        val open = t.orders.filter(col("o_orderstatus") === "O")
          .select(col("o_custkey").as("c_custkey"))
        val big = t.orders.filter(col("o_totalprice") > 450000)
          .select(col("o_custkey").as("c_custkey"))
        building.intersect(open).except(big)
      }),

    // ------------------------------------------------------------------
    // q10: time bucketing — hourly event rollup (batch twin of the
    // streaming pipeline in graft.streaming).
    GraftQuery(
      "q10_events_hourly",
      Some("""
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
               event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS sum_value,
               COUNT(DISTINCT user_id) AS n_users
        FROM events
        GROUP BY hour_start, event_type
      """.trim),
      (spark, dir) => {
        Tables(spark, dir).events
          .groupBy(
            date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
            col("event_type"))
          .agg(
            count(lit(1)).as("n_events"),
            dsum(col("value"), 4).as("sum_value"),
            countDistinct(col("user_id")).as("n_users"))
      }),

    // ------------------------------------------------------------------
    // q11: order-priority distribution with a correlated existence filter
    // (TPC-H Q4 shape) — date-range + semi join + count.
    GraftQuery(
      "q11_order_priority",
      Some("""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey
                      AND l.l_shipdate > o.o_orderdate)
        GROUP BY o_orderpriority
      """.trim),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val o = t.orders.filter(
          col("o_orderdate") >= lit("1997-01-01 00:00:00").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
        o.join(t.lineitem,
            col("l_orderkey") === col("o_orderkey") && col("l_shipdate") > col("o_orderdate"),
            "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
      }),

    // ------------------------------------------------------------------
    // q12: running/windowed analytics — per-nation account-balance deciles
    // via ntile + per-decile aggregate.
    GraftQuery(
      "q12_balance_deciles",
      Some("""
        SELECT decile,
               COUNT(*) AS n,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(38,4))) AS DOUBLE) AS sum_bal
        FROM (
          SELECT c_acctbal,
                 NTILE(10) OVER (ORDER BY c_acctbal ASC, c_custkey ASC) AS decile
          FROM customer)
        GROUP BY decile
      """.trim),
      (spark, dir) => {
        // global deciles WITHOUT ntile's unpartitioned window (which
        // sorts every row through ONE task): range-partitioned sort +
        // zipWithIndex ranks in parallel (the ExecutiveDedupPipeline /
        // Dedup-vocabulary idiom), then NTILE's bucket arithmetic —
        // first n%k buckets hold ⌈n/k⌉ rows, the rest ⌊n/k⌋ — applied
        // per row. n is one measured driver long. Bit-identical to the
        // oracle's NTILE by construction.
        val sorted = Tables(spark, dir).customer
          .select(col("c_acctbal"), col("c_custkey"))
          .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
        val ranked = spark.createDataFrame(
          sorted.rdd.zipWithIndex.map { case (r, i) =>
            org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1L))
          },
          sorted.schema.add("r", org.apache.spark.sql.types.LongType))
          // pin: the count() below and the final agg would otherwise each
          // re-run the full range sort (ExecutiveDedupPipeline discipline)
          .localCheckpoint()
        val n = ranked.count()
        ranked
          .withColumn("decile", graft.core.Ranks.ntileOfRank(col("r"), n, 10))
          .groupBy(col("decile"))
          .agg(count(lit(1)).as("n"), dsum(col("c_acctbal"), 4).as("sum_bal"))
      }),

    // ------------------------------------------------------------------
    // q13: as-of join — each purchase matched to the user's most recent
    // signup at-or-before it (second granularity; right side deduped per
    // (user, ts) so the match is unique). DuckDB's native ASOF JOIN is the
    // oracle for graft's union+carry-forward implementation.
    GraftQuery(
      "q13_asof_signup",
      Some("""
        WITH e AS (
          SELECT event_id, user_id, date_trunc('second', ts) AS tss, event_type, value
          FROM events),
        signups AS (
          SELECT user_id, tss, MAX(event_id) AS signup_event
          FROM e WHERE event_type = 'signup' GROUP BY user_id, tss),
        purchases AS (
          SELECT event_id, user_id, tss, value FROM e WHERE event_type = 'purchase')
        SELECT p.event_id, p.user_id, p.value, s.signup_event
        FROM purchases p ASOF JOIN signups s
          ON p.user_id = s.user_id AND p.tss >= s.tss
      """.trim),
      (spark, dir) => {
        val e = Tables(spark, dir).events
          .select(col("event_id"), col("user_id"),
            date_trunc("second", col("ts")).as("tss"), col("event_type"), col("value"))
        val signups = e.filter(col("event_type") === "signup")
          .groupBy("user_id", "tss")
          .agg(max("event_id").as("signup_event"))
        val purchases = e.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "tss", "value")
        graft.operators.AsOfJoin
          .asof(purchases, signups, keys = Seq("user_id"), leftTime = "tss", rightTime = "tss")
          .select("event_id", "user_id", "value", "signup_event")
      }),

    // ------------------------------------------------------------------
    // q14: exact linear-interpolated percentiles per segment (same
    // definition as SQL quantile_cont, so results are bit-identical).
    GraftQuery(
      "q14_percentiles",
      Some("""
        SELECT c_mktsegment,
               quantile_cont(c_acctbal, 0.5) AS median_bal,
               quantile_cont(c_acctbal, 0.95) AS p95_bal,
               COUNT(*) AS n
        FROM customer GROUP BY c_mktsegment
      """.trim),
      (spark, dir) => {
        Tables(spark, dir).customer
          .groupBy("c_mktsegment")
          .agg(
            expr("percentile(c_acctbal, 0.5)").as("median_bal"),
            expr("percentile(c_acctbal, 0.95)").as("p95_bal"),
            count(lit(1)).as("n"))
      }),

    // ------------------------------------------------------------------
    // q15: pivot — order counts by status × priority (explicit pivot
    // values keep the output schema static; oracle is the equivalent
    // conditional aggregation).
    GraftQuery(
      "q15_pivot_status",
      Some("""
        SELECT o_orderpriority,
               CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS f,
               CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS o,
               CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS p
        FROM orders GROUP BY o_orderpriority
      """.trim),
      (spark, dir) => {
        Tables(spark, dir).orders
          .groupBy("o_orderpriority")
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(count(lit(1)))
          // absent (priority, status) combos come back NULL from pivot —
          // the oracle's SUM(CASE ...) yields 0, so zero-fill here
          .na.fill(0L)
          .select(col("o_orderpriority"), col("F").as("f"), col("O").as("o"), col("P").as("p"))
      }),

    // ------------------------------------------------------------------
    // q16: SQL front door — the same engine through `spark.sql` over temp
    // views (CTE + IN-subquery + HAVING), proving the registered-view
    // surface works end to end.
    GraftQuery(
      "q16_sql_cte",
      Some("""
        WITH big_orders AS (
          SELECT o_custkey, COUNT(*) AS n_big
          FROM orders WHERE o_totalprice > 200000 GROUP BY o_custkey)
        SELECT c.c_mktsegment, COUNT(*) AS n_customers,
               CAST(SUM(CAST(b.n_big AS DECIMAL(38,0))) AS DOUBLE) AS total_big_orders
        FROM customer c JOIN big_orders b ON c.c_custkey = b.o_custkey
        WHERE c.c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey <= 1)
        GROUP BY c.c_mktsegment HAVING COUNT(*) > 1
      """.trim),
      (spark, dir) => {
        val t = Tables(spark, dir)
        t.orders.createOrReplaceTempView("orders")
        t.customer.createOrReplaceTempView("customer")
        t.nation.createOrReplaceTempView("nation")
        spark.sql("""
          WITH big_orders AS (
            SELECT o_custkey, COUNT(*) AS n_big
            FROM orders WHERE o_totalprice > 200000 GROUP BY o_custkey)
          SELECT c.c_mktsegment, COUNT(*) AS n_customers,
                 CAST(SUM(CAST(b.n_big AS DECIMAL(38,0))) AS DOUBLE) AS total_big_orders
          FROM customer c JOIN big_orders b ON c.c_custkey = b.o_custkey
          WHERE c.c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey <= 1)
          GROUP BY c.c_mktsegment HAVING COUNT(*) > 1""")
      }),

    // ------------------------------------------------------------------
    // q17: correlated scalar subquery (TPC-H Q17 shape) — small-quantity
    // outliers vs the per-part average; Catalyst decorrelates to an
    // aggregate + join, which is the plan a hand-written rewrite produces.
    GraftQuery(
      "q17_small_quantity_revenue",
      Some("""
        SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) / 7.0 AS avg_yearly,
               COUNT(*) AS n_lines
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#3'
          AND l.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
                              WHERE l2.l_partkey = l.l_partkey)
      """.trim),
      (spark, dir) => {
        val t = Tables(spark, dir)
        t.lineitem.createOrReplaceTempView("lineitem")
        t.part.createOrReplaceTempView("part")
        spark.sql("""
          SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) / 7.0 AS avg_yearly,
                 COUNT(*) AS n_lines
          FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
          WHERE p.p_brand = 'Brand#3'
            AND l.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
                                WHERE l2.l_partkey = l.l_partkey)""")
      }),

    // ------------------------------------------------------------------
    // q18: large-volume orders (TPC-H Q18 shape) — IN over a grouped
    // HAVING subquery, then a 3-way join + re-aggregation.
    GraftQuery(
      "q18_large_orders",
      Some("""
        SELECT c.c_custkey, o.o_orderkey,
               CAST(SUM(CAST(l.l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS total_qty
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderkey IN (
          SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
          HAVING SUM(CAST(l_quantity AS DECIMAL(38,4))) > 150)
        GROUP BY c.c_custkey, o.o_orderkey
      """.trim),
      (spark, dir) => {
        val t = Tables(spark, dir)
        val big = t.lineitem.groupBy("l_orderkey")
          .agg(sum(col("l_quantity").cast(DecimalType(38, 4))).as("q"))
          .filter(col("q") > 150)
          .select(col("l_orderkey").as("big_orderkey"))
        t.customer
          .join(t.orders, col("c_custkey") === col("o_custkey"))
          .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
          .join(big, col("o_orderkey") === col("big_orderkey"), "left_semi")
          .groupBy("c_custkey", "o_orderkey")
          .agg(dsum(col("l_quantity"), 4).as("total_qty"))
      }),

    // ------------------------------------------------------------------
    // q19: correlated EXISTS with an inequality (TPC-H Q20/Q21 family) —
    // suppliers whose stockable parts shipped above their own average
    // price at least once.
    GraftQuery(
      "q19_exists_above_avg",
      Some("""
        SELECT s.s_suppkey, s.s_name
        FROM supplier s
        WHERE EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_suppkey = s.s_suppkey
            AND l.l_extendedprice > (SELECT AVG(l2.l_extendedprice) * 1.8
                                     FROM lineitem l2 WHERE l2.l_suppkey = l.l_suppkey))
      """.trim),
      (spark, dir) => {
        val t = Tables(spark, dir)
        t.supplier.createOrReplaceTempView("supplier")
        t.lineitem.createOrReplaceTempView("lineitem")
        spark.sql("""
          SELECT s.s_suppkey, s.s_name
          FROM supplier s
          WHERE EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_suppkey = s.s_suppkey
              AND l.l_extendedprice > (SELECT AVG(l2.l_extendedprice) * 1.8
                                       FROM lineitem l2 WHERE l2.l_suppkey = l.l_suppkey))""")
      })
  )
}
