package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scan / filter / aggregate / window / set-op / scalar-function surface.
  *
  * The reference (qubole/rubix) delegates all relational execution to its
  * host engines and pins the expected SQL surface via its TPC-DS stress
  * corpus (rubix-stress/queries, see SURVEY.md §2.3-2.10). Here that
  * surface is expressed Spark-first over the star-schema testdata, each
  * query paired with a DuckDB oracle. Double outputs follow one of two
  * bit-stability contracts on BOTH sides: plain 2-decimal or integer
  * sums are rounded to 3 decimals (their values sit on the 0.01 grid,
  * far from any rounding boundary), while money-PRODUCT sums and
  * averages ride order-independent fixed-point longs ([[fxSum]]/
  * [[fxAvg]]) because their rounded values land ON .0005 boundaries
  * with ~10% probability per emitted row.
  */
object RelationalQueries {
  private def r3(c: Column): Column = round(c, 3)

  /** Order-independent fixed-point sum for money-PRODUCT expressions
    * (price*(1-disc) etc). Such products carry >2 exact decimal digits,
    * so ~10% of group sums land exactly ON a .0005 rounding boundary and
    * round(sum(double),3) flips with any summation-order last-bit drift
    * (both engines compute identical IEEE bits per ROW, so floor(x*scale)
    * is the same long everywhere; only the sum order varies — longs make
    * it associative). Long capacity: ~1e9 units/row leaves ~9e9 rows per
    * group before overflow; shard the group key past that (same posture
    * as VectorCentroid's documented bound). Plain 2-decimal sums (sum of
    * price) do NOT need this: they land on the 0.01 grid, 50x the
    * accumulated drift away from any boundary. */
  private[operators] def fxSum(e: Column, scale: Int): Column =
    sum(floor(e * scale).cast("long")).cast("double") / scale

  /** Bit-stable average of a 2-decimal column: exact cents sum, then two
    * shared IEEE divides; emitted unrounded (rounding would reintroduce
    * the boundary class this replaces). */
  private def fxAvg(e: Column): Column =
    sum(floor(e * 100).cast("long")).cast("double") / count(lit(1)) / 100

  val defs: Seq[QueryDef] = Seq(

    // ---- TPC-H Q1 style pricing summary: hash agg, partial+final ----
    QueryDef("q01_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),3) AS sum_qty,
        | round(sum(l_extendedprice),3) AS sum_base_price,
        | CAST(sum(CAST(floor(l_extendedprice*(1-l_discount)*10000) AS BIGINT)) AS DOUBLE)/10000 AS sum_disc_price,
        | CAST(sum(CAST(floor(l_extendedprice*(1-l_discount)*(1+l_tax)*10000) AS BIGINT)) AS DOUBLE)/10000 AS sum_charge,
        | round(avg(l_quantity),3) AS avg_qty,
        | CAST(sum(CAST(floor(l_extendedprice*100) AS BIGINT)) AS DOUBLE)/count(*)/100 AS avg_price,
        | CAST(sum(CAST(floor(l_discount*100) AS BIGINT)) AS DOUBLE)/count(*)/100 AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("2000-12-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          r3(sum("l_quantity")).as("sum_qty"),
          r3(sum("l_extendedprice")).as("sum_base_price"),
          fxSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 10000).as("sum_disc_price"),
          fxSum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 10000).as("sum_charge"),
          r3(avg("l_quantity")).as("avg_qty"),
          fxAvg(col("l_extendedprice")).as("avg_price"),
          fxAvg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
    },

    // ---- projection + predicate pushdown to parquet ----
    QueryDef("q02_filter_project",
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1997-03-01 00:00:00'
        |  AND l_discount > 0.05 AND l_quantity < 10""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01") &&
          col("l_shipdate") < lit("1997-03-01") &&
          col("l_discount") > 0.05 && col("l_quantity") < 10)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    },

    // ---- TPC-H Q3 style: 3-way join + top-k by computed measure ----
    QueryDef("q03_top_revenue",
      """SELECT l_orderkey,
        | CAST(sum(CAST(floor(l_extendedprice*(1-l_discount)*10000) AS BIGINT)) AS DOUBLE)/10000 AS revenue,
        | strftime(o_orderdate, '%Y-%m-%d') AS odate, o_orderpriority
        |FROM customer, orders, lineitem
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin) { (s, dir) =>
      val c = Tables.load(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.load(s, dir, "orders").filter(col("o_orderdate") < lit("1998-01-01"))
      val l = Tables.load(s, dir, "lineitem").filter(col("l_shipdate") > lit("1998-01-01"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("odate"), col("o_orderpriority"))
        .agg(fxSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 10000).as("revenue"))
        .select("l_orderkey", "revenue", "odate", "o_orderpriority")
        .orderBy(col("revenue").desc, col("l_orderkey")).limit(10)
    },

    // ---- semi join (EXISTS) ----
    QueryDef("q04_order_priority",
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 30)
        |GROUP BY o_orderpriority""".stripMargin) { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1997-01-01"))
      val l = Tables.load(s, dir, "lineitem").filter(col("l_quantity") > 30)
      o.join(l, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority").agg(count(lit(1)).as("order_count"))
    },

    // ---- TPC-H Q5 style: 6-table star join, broadcast dims ----
    QueryDef("q05_region_revenue",
      """SELECT n_name,
        | CAST(sum(CAST(floor(l_extendedprice*(1-l_discount)*10000) AS BIGINT)) AS DOUBLE)/10000 AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name""".stripMargin) { (s, dir) =>
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1998-01-01"))
      val l = Tables.load(s, dir, "lineitem")
      val su = Tables.load(s, dir, "supplier")
      val n = Tables.load(s, dir, "nation")
      val re = Tables.load(s, dir, "region").filter(col("r_name") === "ASIA")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(re), col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(fxSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 10000).as("revenue"))
    },

    // ---- TPC-H Q6: filter + global agg (no shuffle beyond partial/final) ----
    QueryDef("q06_revenue_forecast",
      """SELECT CAST(sum(CAST(floor(l_extendedprice*l_discount*10000) AS BIGINT)) AS DOUBLE)/10000 AS revenue, count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01") && col("l_shipdate") < lit("1998-01-01") &&
          col("l_discount").between(0.03, 0.07) && col("l_quantity") < 24)
        .agg(fxSum(col("l_extendedprice") * col("l_discount"), 10000).as("revenue"),
          count(lit(1)).as("n"))
    },

    // ---- anti join (NOT EXISTS) ----
    QueryDef("q07_inactive_customers",
      """SELECT c_mktsegment, count(*) AS n_inactive
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "customer")
        .join(Tables.load(s, dir, "orders"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n_inactive"))
    },

    // ---- TPC-H Q13 style: left outer join + nested agg ----
    QueryDef("q08_order_distribution",
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey) t
        |GROUP BY c_count""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "customer")
        .join(Tables.load(s, dir, "orders"),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey").agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count").agg(count(lit(1)).as("custdist"))
    },

    // ---- multi-distinct aggregation (q28 style) ----
    QueryDef("q09_distinct_buckets",
      """SELECT count(DISTINCT l_partkey) AS d_part,
        |       count(DISTINCT l_suppkey) AS d_supp,
        |       count(DISTINCT l_orderkey) AS d_ord,
        |       count(*) AS n
        |FROM lineitem WHERE l_quantity BETWEEN 5 AND 45""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "lineitem").filter(col("l_quantity").between(5, 45))
        .agg(countDistinct(col("l_partkey")).as("d_part"),
          countDistinct(col("l_suppkey")).as("d_supp"),
          countDistinct(col("l_orderkey")).as("d_ord"),
          count(lit(1)).as("n"))
    },

    // ---- TPC-H Q10 style: returned-item top customers. Revenue rides a
    // FIXED-POINT contract: price*(1-disc) has exactly 4 decimal digits
    // (2+2), and both engines compute identical IEEE product bits, so
    // floor(x*1e4) is the same long everywhere; the long sum is order-
    // independent and the final /10000 is one shared IEEE divide. A
    // round(sum(double),3) here IS order-dependent in the last bit and
    // measurably lands on .0005 boundaries (seen at sf0.001 and sf0.1 —
    // the e05-class failure; these small per-customer groups roll the
    // dice ~1500 times per scale). ----
    QueryDef("q10_returned_top_customers",
      """SELECT c_custkey, c_name,
        | CAST(sum(CAST(floor(l_extendedprice*(1-l_discount)*10000) AS BIGINT)) AS DOUBLE)
        |   / 10000 AS revenue
        |FROM customer, orders, lineitem
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin) { (s, dir) =>
      val l = Tables.load(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      l.join(Tables.load(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.load(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(fxSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 10000).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey")).limit(20)
    },

    // ---- rollup ----
    QueryDef("q11_rollup",
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        | round(sum(l_quantity),3) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), r3(sum("l_quantity")).as("sum_qty"))
    },

    // ---- cube ----
    QueryDef("q12_cube",
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        | round(sum(o_totalprice),3) AS total
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), r3(sum("o_totalprice")).as("total"))
    },

    // ---- grouping sets (SQL surface) ----
    QueryDef("q13_grouping_sets",
      """SELECT l_returnflag, l_linestatus, count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "lineitem").createOrReplaceTempView("gs_lineitem")
      s.sql(
        """SELECT l_returnflag, l_linestatus, count(*) AS n
          |FROM gs_lineitem
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin)
    },

    // ---- window: rank / dense_rank / ntile ----
    QueryDef("q14_window_rank",
      """SELECT c_custkey, c_nationkey, c_acctbal,
        | rank()       OVER w AS rnk,
        | dense_rank() OVER w AS drnk,
        | ntile(4)     OVER w AS quartile
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("c_nationkey").orderBy(col("c_acctbal").desc, col("c_custkey"))
      Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"),
          rank().over(w).cast("long").as("rnk"), dense_rank().over(w).cast("long").as("drnk"),
          ntile(4).over(w).cast("long").as("quartile"))
    },

    // ---- window: running sum + moving average ----
    QueryDef("q15_window_running",
      """SELECT event_id, user_id, value,
        | round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),3) AS running_sum,
        | round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN 3 PRECEDING AND CURRENT ROW),3) AS mov_sum,
        | count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS frame_n
        |FROM events""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.load(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("value"),
          r3(sum("value").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))).as("running_sum"),
          r3(sum("value").over(w.rowsBetween(-3, Window.currentRow))).as("mov_sum"),
          count(lit(1)).over(w.rowsBetween(-3, Window.currentRow)).as("frame_n"))
    },

    // ---- window: lag / lead ----
    QueryDef("q16_window_lag_lead",
      """SELECT event_id, user_id,
        | round(value - lag(value, 1, 0.0) OVER w, 3) AS delta,
        | lead(event_type, 1, 'none') OVER w AS next_type
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.load(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          r3(col("value") - lag(col("value"), 1, 0.0).over(w)).as("delta"),
          lead(col("event_type"), 1, "none").over(w).as("next_type"))
    },

    // ---- top-k per group via row_number ----
    QueryDef("q17_topk_per_group",
      """SELECT n_name, s_suppkey, s_acctbal, rn FROM (
        |  SELECT n_name, s_suppkey, s_acctbal,
        |    row_number() OVER (PARTITION BY s_nationkey
        |                       ORDER BY s_acctbal DESC, s_suppkey) AS rn
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey) t
        |WHERE rn <= 3""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("s_nationkey").orderBy(col("s_acctbal").desc, col("s_suppkey"))
      Tables.load(s, dir, "supplier")
        .join(broadcast(Tables.load(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .select(col("n_name"), col("s_suppkey"), col("s_acctbal"),
          row_number().over(w).cast("long").as("rn"))
        .filter(col("rn") <= 3)
    },

    // ---- union all across "channels" (q75 style) ----
    QueryDef("q18_union_channels",
      """SELECT yr, channel, round(sum(amount),3) AS total, count(*) AS n FROM (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, 'orders' AS channel,
        |         o_totalprice AS amount FROM orders
        |  UNION ALL
        |  SELECT CAST(year(l_shipdate) AS BIGINT) AS yr, 'lineitem' AS channel,
        |         l_extendedprice AS amount FROM lineitem) t
        |GROUP BY yr, channel""".stripMargin) { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
        .select(year(col("o_orderdate")).cast("long").as("yr"),
          lit("orders").as("channel"), col("o_totalprice").as("amount"))
      val l = Tables.load(s, dir, "lineitem")
        .select(year(col("l_shipdate")).cast("long").as("yr"),
          lit("lineitem").as("channel"), col("l_extendedprice").as("amount"))
      o.unionAll(l).groupBy("yr", "channel")
        .agg(r3(sum("amount")).as("total"), count(lit(1)).as("n"))
    },

    // ---- intersect ----
    QueryDef("q19_intersect",
      """SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 200000
        |INTERSECT
        |SELECT o_custkey AS custkey FROM orders
        |WHERE o_orderpriority = '1-URGENT'""".stripMargin) { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
      o.filter(col("o_totalprice") > 200000).select(col("o_custkey").as("custkey"))
        .intersect(o.filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey").as("custkey")))
    },

    // ---- except ----
    QueryDef("q20_except",
      """SELECT c_custkey AS custkey FROM customer
        |EXCEPT
        |SELECT o_custkey AS custkey FROM orders""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "customer").select(col("c_custkey").as("custkey"))
        .except(Tables.load(s, dir, "orders").select(col("o_custkey").as("custkey")))
    },

    // ---- string scalar functions ----
    QueryDef("q21_string_funcs",
      """SELECT p_brand, upper(p_type) AS type_u, count(*) AS n,
        | round(avg(length(p_name)),3) AS avg_name_len,
        | max(substr(p_name, 1, 8)) AS max_prefix,
        | min(concat(p_brand, '-', p_type)) AS min_tag
        |FROM part GROUP BY p_brand, upper(p_type)""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "part")
        .groupBy(col("p_brand"), upper(col("p_type")).as("type_u"))
        .agg(count(lit(1)).as("n"),
          r3(avg(length(col("p_name")))).as("avg_name_len"),
          max(substring(col("p_name"), 1, 8)).as("max_prefix"),
          min(concat(col("p_brand"), lit("-"), col("p_type"))).as("min_tag"))
    },

    // ---- date/time functions ----
    QueryDef("q22_date_funcs",
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |       CAST(month(o_orderdate) AS BIGINT) AS mo,
        |       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS mstart,
        |       count(*) AS n, round(sum(o_totalprice),3) AS total
        |FROM orders GROUP BY 1, 2, 3""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mo"),
          date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("mstart"))
        .agg(count(lit(1)).as("n"), r3(sum("o_totalprice")).as("total"))
    },

    // ---- conditional aggregation ----
    QueryDef("q23_case_agg",
      """SELECT l_returnflag,
        | round(sum(CASE WHEN l_quantity < 10 THEN l_extendedprice ELSE 0 END),3) AS small_rev,
        | round(sum(CASE WHEN l_quantity >= 10 AND l_quantity < 30 THEN l_extendedprice ELSE 0 END),3) AS mid_rev,
        | round(sum(CASE WHEN l_quantity >= 30 THEN l_extendedprice ELSE 0 END),3) AS big_rev
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
      val l = Tables.load(s, dir, "lineitem")
      l.groupBy("l_returnflag").agg(
        r3(sum(when(col("l_quantity") < 10, col("l_extendedprice")).otherwise(0))).as("small_rev"),
        r3(sum(when(col("l_quantity") >= 10 && col("l_quantity") < 30, col("l_extendedprice")).otherwise(0))).as("mid_rev"),
        r3(sum(when(col("l_quantity") >= 30, col("l_extendedprice")).otherwise(0))).as("big_rev"))
    },

    // ---- theta (non-equi range) join ----
    QueryDef("q24_theta_join",
      """SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, count(*) AS n
        |FROM part a JOIN part b
        |  ON b.p_size BETWEEN a.p_size - 1 AND a.p_size + 1
        | AND a.p_partkey < b.p_partkey
        |WHERE a.p_type = 'SMALL' AND b.p_type = 'ECONOMY'
        |GROUP BY a.p_brand, b.p_brand""".stripMargin) { (s, dir) =>
      val a = Tables.load(s, dir, "part").filter(col("p_type") === "SMALL")
        .select(col("p_partkey").as("a_key"), col("p_size").as("a_size"), col("p_brand").as("brand_a"))
      val b = Tables.load(s, dir, "part").filter(col("p_type") === "ECONOMY")
        .select(col("p_partkey").as("b_key"), col("p_size").as("b_size"), col("p_brand").as("brand_b"))
      a.join(b, col("b_size").between(col("a_size") - 1, col("a_size") + 1) &&
          col("a_key") < col("b_key"))
        .groupBy("brand_a", "brand_b").agg(count(lit(1)).as("n"))
    },

    // ---- max of every fact column (max_all.sql analog: max IO, min CPU) ----
    QueryDef("q25_max_all",
      """SELECT max(l_orderkey) AS m_orderkey, max(l_partkey) AS m_partkey,
        | max(l_suppkey) AS m_suppkey, max(l_linenumber) AS m_linenumber,
        | max(l_quantity) AS m_quantity, max(l_extendedprice) AS m_extendedprice,
        | max(l_discount) AS m_discount, max(l_tax) AS m_tax,
        | max(l_returnflag) AS m_returnflag, max(l_linestatus) AS m_linestatus,
        | strftime(max(l_shipdate), '%Y-%m-%d') AS m_shipdate, count(*) AS n
        |FROM lineitem""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "lineitem").agg(
        max("l_orderkey").as("m_orderkey"), max("l_partkey").as("m_partkey"),
        max("l_suppkey").as("m_suppkey"), max("l_linenumber").as("m_linenumber"),
        max("l_quantity").as("m_quantity"), max("l_extendedprice").as("m_extendedprice"),
        max("l_discount").as("m_discount"), max("l_tax").as("m_tax"),
        max("l_returnflag").as("m_returnflag"), max("l_linestatus").as("m_linestatus"),
        date_format(max("l_shipdate"), "yyyy-MM-dd").as("m_shipdate"), count(lit(1)).as("n"))
    },

    // ---- math scalar functions ----
    QueryDef("q26_math_funcs",
      """SELECT l_returnflag,
        | round(sum(sqrt(l_extendedprice)),3) AS sum_sqrt,
        | round(sum(abs(l_discount - 0.05)),3) AS sum_absdev,
        | round(sum(ln(l_extendedprice)),3) AS sum_ln,
        | CAST(sum(CAST(floor(l_quantity / 10) AS BIGINT)) AS BIGINT) AS sum_decile
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "lineitem").groupBy("l_returnflag").agg(
        r3(sum(sqrt(col("l_extendedprice")))).as("sum_sqrt"),
        r3(sum(abs(col("l_discount") - 0.05))).as("sum_absdev"),
        r3(sum(log(col("l_extendedprice")))).as("sum_ln"),
        sum(floor(col("l_quantity") / 10)).as("sum_decile"))
    },

    // ---- HAVING ----
    QueryDef("q27_having",
      """SELECT l_partkey, count(*) AS n FROM lineitem
        |GROUP BY l_partkey HAVING count(*) >= 40""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "lineitem").groupBy("l_partkey")
        .agg(count(lit(1)).as("n")).filter(col("n") >= 40)
    },

    // ---- correlated scalar subquery ----
    QueryDef("q28_correlated_subquery",
      """SELECT p_brand, count(*) AS n FROM part
        |WHERE p_retailprice > (SELECT avg(p2.p_retailprice) FROM part p2
        |                       WHERE p2.p_brand = part.p_brand)
        |GROUP BY p_brand""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "part").createOrReplaceTempView("sq_part")
      s.sql(
        """SELECT p_brand, count(*) AS n FROM sq_part
          |WHERE p_retailprice > (SELECT avg(p2.p_retailprice) FROM sq_part p2
          |                       WHERE p2.p_brand = sq_part.p_brand)
          |GROUP BY p_brand""".stripMargin)
    },

    // ---- regexp extraction over JSON-ish payload ----
    QueryDef("q29_regexp_json",
      """SELECT event_type,
        | round(avg(CAST(regexp_extract(props, 'k.: (\d+)', 1) AS BIGINT)),3) AS avg_k,
        | max(CAST(regexp_extract(props, 'k.: (\d+)', 1) AS BIGINT)) AS max_k,
        | count(*) AS n
        |FROM events GROUP BY event_type""".stripMargin) { (s, dir) =>
      val k = regexp_extract(col("props"), "k.: (\\d+)", 1).cast("long")
      Tables.load(s, dir, "events").groupBy("event_type")
        .agg(r3(avg(k)).as("avg_k"), max(k).as("max_k"), count(lit(1)).as("n"))
    },

    // ---- map functions: JSON -> typed map, map_keys/values, map explode ----
    QueryDef("q37_map_funcs",
      """SELECT key, count(*) AS n,
        | CAST(sum(val) AS BIGINT) AS sum_val,
        | CAST(min(val) AS BIGINT) AS min_val,
        | CAST(max(val) AS BIGINT) AS max_val
        |FROM (SELECT unnest(json_keys(props)) AS key,
        |             CAST(json_extract_string(props, '$.k') AS BIGINT) AS val
        |      FROM events)
        |GROUP BY key""".stripMargin) { (s, dir) =>
      val m = from_json(col("props"),
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.LongType))
      Tables.load(s, dir, "events")
        .select(explode(m).as(Seq("key", "val")))
        .groupBy("key")
        .agg(count(lit(1)).as("n"), sum("val").as("sum_val"),
          min("val").as("min_val"), max("val").as("max_val"))
    },

    // ---- pivot (conditional-agg oracle) ----
    QueryDef("q30_pivot",
      """SELECT user_id,
        | CAST(sum(CASE WHEN event_type='click'    THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
        | CAST(sum(CASE WHEN event_type='error'    THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
        | CAST(sum(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
        | CAST(sum(CASE WHEN event_type='signup'   THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
        | CAST(sum(CASE WHEN event_type='view'     THEN 1 ELSE 0 END) AS BIGINT) AS n_view
        |FROM events GROUP BY user_id""".stripMargin) { (s, dir) =>
      val types = Seq("click", "error", "purchase", "signup", "view")
      types.foldLeft(
        Tables.load(s, dir, "events")
          .groupBy("user_id").pivot("event_type", types).count().na.fill(0L)
      ) { case (df, t) => df.withColumnRenamed(t, s"n_$t") }
    },

    // ---- approx distinct (HLL). The sketch itself is engine-specific,
    // so the oracle checks the CONTRACT instead: exact distinct counts
    // (comparable in DuckDB) plus booleans asserting the HLL estimate
    // lands within ±5% of exact (rsd=0.01 -> 5-sigma band, deterministic
    // for a given dataset). An out-of-band estimate flips a boolean and
    // fails the hash gate. ----
    QueryDef("q31_approx_distinct",
      """SELECT l_returnflag,
        | CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        | CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
        | CAST(count(*) AS BIGINT) AS n,
        | true AS parts_in_band, true AS orders_in_band
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
      // Per-key-column two-level agg, NO Expand anywhere: each key column
      // gets its own first-level dedup (map-side partial dedups before the
      // exchange, so the shuffle carries ~distinct (flag,key) pairs), then
      // a tiny final agg computes the exact distinct as a plain count()
      // AND the HLL estimate over the already-distinct keys — valid
      // because HLL depends only on the distinct set. Keeping HLL
      // ImperativeAggregate buffers away from Expand rows matters: the
      // all-in-one-agg form plans a SortAggregate over expanded rows
      // carrying 6KB sketch buffers — measured 31s at sf0.1 vs 1.07s for
      // this shape (the r3 posexplode single-scan was 1.64s: the Generate
      // + wider first-level agg cost more than this form's second scan of
      // a 2-column parquet projection). rsd=0.016 keeps the sketch at
      // 2^13 registers and ±5% at >3 sigma.
      //
      // The r3/r4 full-bench numbers for this query (2.3s/5.0s vs ~1.1s
      // isolated) were NOT this plan: with the default 100-entry codegen
      // cache, an 80-query session evicts compiled classes between the
      // cold and warm passes and this query — with four codegen stages —
      // paid the largest recompile+re-JIT bill. GraftSession now sizes
      // spark.sql.codegen.cache.maxEntries for many-plan sessions; the
      // r5 bench measures 0.9-1.0s warm, matching the isolated number.
      val li = Tables.load(s, dir, "lineitem")
      val parts = li.groupBy("l_returnflag", "l_partkey")
        .agg(count(lit(1)).as("cnt"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("exact_parts"), sum("cnt").as("n"),
          approx_count_distinct(col("l_partkey"), 0.016).as("ap"))
      val orders = li.select("l_returnflag", "l_orderkey").distinct()
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("exact_orders"),
          approx_count_distinct(col("l_orderkey"), 0.016).as("ao"))
      parts.join(orders, "l_returnflag")
        .select(col("l_returnflag"), col("exact_parts"), col("exact_orders"), col("n"),
          (abs(col("ap") - col("exact_parts")) <=
            col("exact_parts") * 0.05).as("parts_in_band"),
          (abs(col("ao") - col("exact_orders")) <=
            col("exact_orders") * 0.05).as("orders_in_band"))
    },

    // ---- multi-CTE star query (q64-style): agg -> window -> join ----
    QueryDef("q35_cte_star",
      """WITH cust_rev AS (
        |  SELECT o_custkey, CAST(year(o_orderdate) AS BIGINT) AS yr,
        |         sum(o_totalprice) AS rev
        |  FROM orders GROUP BY o_custkey, CAST(year(o_orderdate) AS BIGINT)),
        |ranked AS (
        |  SELECT o_custkey, yr, rev,
        |         row_number() OVER (PARTITION BY yr
        |                            ORDER BY rev DESC, o_custkey) AS rn
        |  FROM cust_rev)
        |SELECT r.yr, r.o_custkey, round(r.rev, 3) AS rev, c.c_mktsegment
        |FROM ranked r JOIN customer c ON r.o_custkey = c.c_custkey
        |WHERE r.rn <= 5""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "orders").createOrReplaceTempView("cte_orders")
      Tables.load(s, dir, "customer").createOrReplaceTempView("cte_customer")
      s.sql(
        """WITH cust_rev AS (
          |  SELECT o_custkey, CAST(year(o_orderdate) AS BIGINT) AS yr,
          |         sum(o_totalprice) AS rev
          |  FROM cte_orders GROUP BY o_custkey, CAST(year(o_orderdate) AS BIGINT)),
          |ranked AS (
          |  SELECT o_custkey, yr, rev,
          |         row_number() OVER (PARTITION BY yr
          |                            ORDER BY rev DESC, o_custkey) AS rn
          |  FROM cust_rev)
          |SELECT r.yr, r.o_custkey, round(r.rev, 3) AS rev, c.c_mktsegment
          |FROM ranked r JOIN cte_customer c ON r.o_custkey = c.c_custkey
          |WHERE r.rn <= 5""".stripMargin)
    },

    // ---- IN-subquery + correlated EXISTS combination ----
    QueryDef("q36_exists_in_mix",
      """SELECT p_type, count(*) AS n
        |FROM part
        |WHERE p_size IN (SELECT DISTINCT p_size FROM part
        |                 WHERE p_brand = 'Brand#1')
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_partkey = p_partkey AND l_quantity > 45)
        |GROUP BY p_type""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "part").createOrReplaceTempView("mix_part")
      Tables.load(s, dir, "lineitem").createOrReplaceTempView("mix_lineitem")
      s.sql(
        """SELECT p_type, count(*) AS n
          |FROM mix_part
          |WHERE p_size IN (SELECT DISTINCT p_size FROM mix_part
          |                 WHERE p_brand = 'Brand#1')
          |  AND EXISTS (SELECT 1 FROM mix_lineitem
          |              WHERE l_partkey = p_partkey AND l_quantity > 45)
          |GROUP BY p_type""".stripMargin)
    },

    // ---- interval range join: events within 1h after each signup ----
    QueryDef("q32_interval_join",
      """SELECT s.event_id AS signup_id, count(e.event_id) AS n_follow
        |FROM (SELECT * FROM events WHERE event_type = 'signup') s
        |LEFT JOIN events e
        |  ON e.user_id = s.user_id AND e.ts > s.ts
        | AND e.ts <= s.ts + INTERVAL '1 hour'
        |GROUP BY s.event_id""".stripMargin) { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      val su = ev.filter(col("event_type") === "signup")
        .select(col("event_id").as("signup_id"), col("user_id").as("s_user"), col("ts").as("s_ts"))
      su.join(ev,
          col("user_id") === col("s_user") && col("ts") > col("s_ts") &&
            col("ts") <= col("s_ts") + expr("INTERVAL 1 HOUR"), "left_outer")
        .groupBy("signup_id").agg(count(col("event_id")).as("n_follow"))
    },

    // ---- percentiles: exact interpolated median on the INTEGER column
    // only (l_quantity has ~50 distinct values, so Spark's exact
    // Percentile buffers a 50-entry value->count map per group — bounded
    // at any scale; a+(b-a)*f lands on exact .0/.5 doubles, bit-identical
    // on any engine) + approx percentile on the DOUBLE column checked
    // IN-BAND against a second, coarser sketch (q31 contract: sketches
    // are engine-specific, the band boolean rides the hash gate). No
    // exact percentile touches the near-all-distinct double column
    // anywhere in the plan: both price anchors are GK sketches with
    // accuracy-bounded memory, so the executor-memory profile is flat
    // at 100 TB. Band math: two sketches at eps 1/10000 and 1/500 are
    // each within their rank-eps of the true median, so their values
    // differ by at most the quantile-function spread over rank window
    // ~0.0022 — far inside the 2% relative value band on this data. ----
    QueryDef("q39_percentile",
      """SELECT l_returnflag,
        | round(quantile_cont(l_quantity, 0.5), 3) AS med_qty,
        | round(quantile_cont(l_quantity, 0.9), 3) AS p90_qty,
        | CAST(count(*) AS BIGINT) AS n,
        | true AS price_med_in_band
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(round(expr("percentile(l_quantity, 0.5D)"), 3).as("med_qty"),
          round(expr("percentile(l_quantity, 0.9D)"), 3).as("p90_qty"),
          count(lit(1)).as("n"),
          expr("percentile_approx(l_extendedprice, 0.5D, 10000)").as("ap_fine"),
          expr("percentile_approx(l_extendedprice, 0.5D, 500)").as("ap_coarse"))
        .select(col("l_returnflag"), col("med_qty"), col("p90_qty"), col("n"),
          (abs(col("ap_fine") - col("ap_coarse")) <= col("ap_fine") * 0.02)
            .as("price_med_in_band"))
    },

    // ---- unpivot/melt: wide metrics -> (key, metric, value) rows — the
    // inverse of q30's pivot. Narrow (3 cols) output regardless of how
    // many metrics widen the input, so the shuffle stays thin at scale.
    // Oracle is the UNION ALL expansion (engine-portable semantics). ----
    QueryDef("q40_unpivot",
      """WITH a AS (
        |  SELECT o_orderpriority,
        |    round(sum(o_totalprice), 3) AS sum_price,
        |    CAST(count(*) AS DOUBLE) AS n_orders
        |  FROM orders GROUP BY o_orderpriority)
        |SELECT o_orderpriority, 'sum_price' AS metric, sum_price AS value FROM a
        |UNION ALL
        |SELECT o_orderpriority, 'n_orders' AS metric, n_orders AS value FROM a"""
        .stripMargin) { (s, dir) =>
      Tables.load(s, dir, "orders").groupBy("o_orderpriority")
        .agg(round(sum("o_totalprice"), 3).as("sum_price"),
          count(lit(1)).cast("double").as("n_orders"))
        .unpivot(Array(col("o_orderpriority")),
          Array(col("sum_price"), col("n_orders")), "metric", "value")
    },

    // ---- statistical aggregates (stddev/corr) with an EXACT-moments
    // contract: the emitted columns are integer moments (order-
    // independent long sums, so bit-stable across engines and the part
    // a downstream consumer would reuse), and Spark's stddev_samp/corr
    // are checked IN-BAND against the moment formulas (1e-6 relative).
    // Cents fixed-point makes the price sum exact (TPC-H prices carry 2
    // decimals; both engines IEEE-truncate identically). The band math
    // runs in doubles so no intermediate overflows even where n*ssq
    // would leave the long range. ----
    QueryDef("q41_stats_moments",
      """SELECT l_returnflag,
        | CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        | CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS ssq_qty,
        | CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
        | true AS stddev_in_band, true AS corr_in_band
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
      val qty = col("l_quantity").cast("long")
      val cents = floor(col("l_extendedprice") * 100).cast("long")
      val centsD = cents.cast("double")
      Tables.load(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(qty).as("sum_qty"),
          sum(qty * qty).as("ssq_qty"),
          sum(cents).as("sum_cents"),
          // double moments feed only the band checks (1e-6 tolerance
          // swallows summation-order noise); exact longs are the contract
          sum(qty.cast("double") * centsD).as("cross_d"),
          sum(centsD * centsD).as("ssq_cents_d"),
          stddev_samp(col("l_quantity")).as("sd"),
          corr(col("l_quantity"), col("l_extendedprice")).as("cr"))
        .select(col("l_returnflag"), col("n"), col("sum_qty"), col("ssq_qty"),
          col("sum_cents"),
          (abs(col("sd") - sqrt(
            (col("n").cast("double") * col("ssq_qty") -
              col("sum_qty").cast("double") * col("sum_qty")) /
              (col("n").cast("double") * (col("n") - 1)))) <=
            col("sd") * 1e-6).as("stddev_in_band"),
          // corr is scale-invariant: the cents moments stand in for price
          (abs(col("cr") -
            (col("n").cast("double") * col("cross_d") -
              col("sum_qty").cast("double") * col("sum_cents")) /
            sqrt((col("n").cast("double") * col("ssq_qty") -
                col("sum_qty").cast("double") * col("sum_qty")) *
              (col("n").cast("double") * col("ssq_cents_d") -
                col("sum_cents").cast("double") * col("sum_cents")))) <=
            lit(1e-6)).as("corr_in_band"))
    },

    // ---- distribution window functions: ntile / percent_rank /
    // cume_dist. The window ORDER BY includes o_orderkey so every row
    // has a unique position — ntile assigns by row position, so ties in
    // o_totalprice alone would make its output engine-dependent.
    // percent_rank/cume_dist are single IEEE divisions of the same
    // integers on both engines: bit-stable, no rounding needed. ----
    QueryDef("q42_window_dist",
      """SELECT o_orderkey, o_orderpriority,
        | CAST(ntile(4) OVER w AS BIGINT) AS tile4,
        | percent_rank() OVER w AS pr,
        | cume_dist() OVER w AS cd
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice, o_orderkey)""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          ntile(4).over(w).cast("long").as("tile4"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
    },

    // ---- calendar spine: sequence + explode generates the day range
    // (Spark's Generate vs DuckDB's generate_series), then a left join
    // zero-fills days with no orders — the standard gap-filling shape
    // for time series. The spine is built from a 1-row bounds aggregate
    // cross-joined in (never collected), and both join sides post-agg
    // are tiny relative to the fact table, so the only full-data pass
    // is the daily aggregate itself. ----
    QueryDef("q43_date_spine",
      """WITH b AS (SELECT min(CAST(o_orderdate AS DATE)) AS lo,
        |                  max(CAST(o_orderdate AS DATE)) AS hi FROM orders),
        |spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS d FROM b),
        |daily AS (SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS n_orders,
        |          round(sum(o_totalprice),3) AS sum_price
        |          FROM orders GROUP BY 1)
        |SELECT strftime(s.d, '%Y-%m-%d') AS day,
        |       coalesce(n_orders, 0) AS n_orders,
        |       coalesce(sum_price, 0.0) AS sum_price
        |FROM spine s LEFT JOIN daily USING (d)""".stripMargin) { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
      val daily = o.groupBy(to_date(col("o_orderdate")).as("d"))
        .agg(count(lit(1)).as("n_orders"),
          r3(sum("o_totalprice")).as("sum_price"))
      val spine = o.agg(min(to_date(col("o_orderdate"))).as("lo"),
          max(to_date(col("o_orderdate"))).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"))).as("d"))
      spine.join(daily, Seq("d"), "left")
        .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          coalesce(col("sum_price"), lit(0.0)).as("sum_price"))
    },

    // ---- selective dim-filter join in the big-big shape: the merge
    // hint pins a shuffle join (at 100 TB neither side broadcasts), the
    // case where Spark's runtime bloom filter — enabled in GraftSession —
    // earns its keep by semi-join-reducing the fact scan before the
    // shuffle. Size thresholds keep the rule dormant at toy scale;
    // RuntimeFilterSpec drops them and asserts the bloom actually
    // injects and preserves results. ----
    QueryDef("q44_selective_join",
      """SELECT l_returnflag, count(*) AS n,
        | round(sum(l_extendedprice),3) AS rev
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
      val urgent = Tables.load(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      Tables.load(s, dir, "lineitem")
        .join(urgent.hint("merge"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), r3(sum("l_extendedprice")).as("rev"))
    },

    // ---- MERGE/upsert without a table format: the full-outer-join
    // formulation (match on key → update, unmatched source → insert,
    // unmatched target → keep) every lakehouse MERGE compiles down to.
    // Updates and inserts are derived deterministically from orders so
    // the oracle can rebuild them. One shuffle, hash-partitioned on the
    // merge key on both sides — the canonical upsert shape; per-row
    // price arithmetic is identical IEEE on both engines, so round(,3)
    // is safe (no order-dependent sums anywhere). ----
    QueryDef("q45_merge_upsert",
      """WITH upd AS (
        |  SELECT o_orderkey AS k, 'U' AS status,
        |         round(o_totalprice * 1.1, 3) AS price
        |  FROM orders WHERE o_orderkey % 7 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 100000000 AS k, 'N' AS status,
        |         round(o_totalprice * 0.5, 3) AS price
        |  FROM orders WHERE o_orderkey % 13 = 0)
        |SELECT coalesce(u.k, b.o_orderkey) AS o_orderkey,
        |       coalesce(u.status, b.o_orderstatus) AS status,
        |       coalesce(u.price, round(b.o_totalprice, 3)) AS price,
        |       CASE WHEN b.o_orderkey IS NULL THEN 'insert'
        |            WHEN u.k IS NULL THEN 'keep'
        |            ELSE 'update' END AS action
        |FROM orders b FULL JOIN upd u ON b.o_orderkey = u.k""".stripMargin) { (s, dir) =>
      val base = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val upd = base.filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey").as("k"), lit("U").as("status"),
          round(col("o_totalprice") * 1.1, 3).as("price"))
        .union(base.filter(col("o_orderkey") % 13 === 0)
          .select((col("o_orderkey") + 100000000L).as("k"), lit("N").as("status"),
            round(col("o_totalprice") * 0.5, 3).as("price")))
      base.join(upd, col("o_orderkey") === col("k"), "full_outer")
        .select(coalesce(col("k"), col("o_orderkey")).as("o_orderkey"),
          coalesce(col("status"), col("o_orderstatus")).as("status"),
          coalesce(col("price"), round(col("o_totalprice"), 3)).as("price"),
          when(col("o_orderkey").isNull, "insert")
            .when(col("k").isNull, "keep")
            .otherwise("update").as("action"))
    },

    // ---- LATERAL correlated subquery: per-nation top-2 suppliers by
    // account balance via a LATERAL (... ORDER BY ... LIMIT 2) — the
    // SQL-standard formulation of "top-k per outer row". Catalyst
    // decorrelates it into a window/partial-sort per join group rather
    // than re-executing the inner query per row, so the plan is one
    // shuffle on the correlation key — the same shape q17's explicit
    // window uses, reached from the declarative SQL surface. ----
    QueryDef("q46_lateral_join",
      """SELECT n.n_name, s.s_name, round(s.s_acctbal, 3) AS bal
        |FROM nation n,
        |LATERAL (SELECT s_name, s_acctbal FROM supplier
        |         WHERE s_nationkey = n.n_nationkey
        |         ORDER BY s_acctbal DESC, s_name LIMIT 2) s""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "nation").createOrReplaceTempView("lat_nation")
      Tables.load(s, dir, "supplier").createOrReplaceTempView("lat_supplier")
      s.sql(
        """SELECT n.n_name, s.s_name, round(s.s_acctbal, 3) AS bal
          |FROM lat_nation n,
          |LATERAL (SELECT s_name, s_acctbal FROM lat_supplier
          |         WHERE s_nationkey = n.n_nationkey
          |         ORDER BY s_acctbal DESC, s_name LIMIT 2) s""".stripMargin)
    },

    // ---- event-time RANGE window frame: per-user trailing-1h sliding
    // aggregate, frame bounds in MICROSECONDS (exact integers — no
    // epoch-flooring or double-rounding ambiguity between engines; sums
    // are over scaled longs for the same reason). RANGE frames demand a
    // single ordering column, so the per-user sort is (user, ts_us) —
    // one hash-partition shuffle on user_id then a per-partition sort,
    // the same cost model as every other window here; frame evaluation
    // is the running two-pointer pass, O(n) per partition. ----
    QueryDef("q47_range_frame",
      """SELECT event_id, user_id,
        |  CAST(epoch_us(ts) AS BIGINT) AS ts_us,
        |  CAST(sum(CAST(trunc(value * 1000) AS BIGINT)) OVER w AS BIGINT) AS sum_v,
        |  CAST(count(*) OVER w AS BIGINT) AS n_frame
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(epoch_us(ts) AS BIGINT)
        |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)"""
        .stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("ts_us")
        .rangeBetween(-3600000000L, Window.currentRow)
      Tables.load(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"),
          (col("value") * 1000).cast("long").as("v_fixed"))
        .select(col("event_id"), col("user_id"), col("ts_us"),
          sum("v_fixed").over(w).as("sum_v"),
          count(lit(1)).over(w).as("n_frame"))
    },

    // ---- ordered-selection + boolean aggregates: count_if, bool_and/
    // bool_or, and max_by/min_by (DuckDB arg_max/arg_min). max_by is
    // only deterministic when the ordering key is unique, and
    // o_totalprice ties at sf0.1 — so top_order orders by the composite
    // (price-cents, orderkey) folded into one long (prices carry 2
    // decimals; orderkey < 10^7 at gate scales — at open scale use a
    // struct ordering key instead of the fold). All aggregates are
    // single-pass with map-side partials — same exchange profile as
    // q01. ----
    QueryDef("q48_selective_agg",
      """SELECT o_orderpriority,
        | CAST(count_if(o_totalprice > 150000) AS BIGINT) AS n_big,
        | bool_and(o_totalprice > 0) AS all_pos,
        | bool_or(o_orderstatus = 'F') AS any_final,
        | arg_max(o_orderstatus, o_orderkey) AS last_status,
        | CAST(arg_max(o_orderkey,
        |   CAST(round(o_totalprice * 100) AS BIGINT) * 10000000 + o_orderkey)
        |   AS BIGINT) AS top_order,
        | CAST(arg_min(o_orderkey,
        |   CAST(round(o_totalprice * 100) AS BIGINT) * 10000000 + o_orderkey)
        |   AS BIGINT) AS bottom_order
        |FROM orders GROUP BY o_orderpriority""".stripMargin) { (s, dir) =>
      val priceKey = (round(col("o_totalprice") * 100).cast("long") *
        10000000L + col("o_orderkey"))
      Tables.load(s, dir, "orders").groupBy("o_orderpriority")
        .agg(count_if(col("o_totalprice") > 150000).as("n_big"),
          bool_and(col("o_totalprice") > 0).as("all_pos"),
          bool_or(col("o_orderstatus") === "F").as("any_final"),
          max_by(col("o_orderstatus"), col("o_orderkey")).as("last_status"),
          max_by(col("o_orderkey"), priceKey).as("top_order"),
          min_by(col("o_orderkey"), priceKey).as("bottom_order"))
    },

    // ---- semi-structured VARIANT column (Spark 4's native type for
    // open-schema JSON): parse once into a VARIANT, extract typed fields
    // with variant_get. Unlike q29's from_json-with-schema, VARIANT
    // needs NO declared schema — the 100 TB shape for logs/props columns
    // whose keys drift over time; the binary encoding makes repeated
    // field extraction cheaper than re-parsing JSON text per access.
    // Oracle: DuckDB's json_extract over the same strings; outputs are
    // all exact integers. ----
    QueryDef("q49_variant_json",
      """SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_mod,
        | CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        | CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
        |FROM events GROUP BY 1""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .select(expr("variant_get(parse_json(props), '$.k', 'bigint')").as("k"))
        .groupBy((col("k") % 10).as("k_mod"))
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"), max("k").as("max_k"))
    },

    // ---- native XML (Spark 4 from_xml): serialize order fields into an
    // XML fragment in-query, parse them back with a declared schema, and
    // emit the extracted values. The oracle is the identity over the
    // same fields — any escaping, type-coercion, or field-resolution
    // defect in the XML path breaks the roundtrip and fails the hash.
    // Money rides as exact cents. Per-row codegen'd construction +
    // parse: zero shuffles. ----
    QueryDef("q50_xml_roundtrip",
      """SELECT o_orderkey,
        | o_orderstatus AS status,
        | CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |FROM orders WHERE o_orderkey % 50 = 0""".stripMargin) { (s, dir) =>
      val xml = concat(lit("<order><id>"), col("o_orderkey"),
        lit("</id><status>"), col("o_orderstatus"),
        lit("</status><cents>"),
        round(col("o_totalprice") * 100).cast("long"),
        lit("</cents></order>"))
      Tables.load(s, dir, "orders")
        .filter(col("o_orderkey") % 50 === 0)
        .select(col("o_orderkey"), xml.as("x"))
        .select(col("o_orderkey"),
          expr("from_xml(x, 'id BIGINT, status STRING, cents BIGINT')").as("p"))
        .select(col("o_orderkey"), col("p.status").as("status"),
          col("p.cents").as("cents"))
    },

    // ---- multi-stage event funnel (product analytics): per user, first
    // signup, first click strictly after it, first purchase strictly
    // after that — stage = how deep the user got. Every stage is a
    // min() over exact microsecond longs (deterministic; no window
    // needed), and every agg/join keys on user_id, so the whole funnel
    // reuses ONE hash partitioning: at 100 TB it is three map-side-
    // combined aggs + two narrow joins on the same key, no data ever
    // repartitioned twice. ----
    QueryDef("q51_funnel",
      """WITH s AS (
        |  SELECT user_id, min(epoch_us(ts)) AS t0
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, min(epoch_us(e.ts)) AS t1
        |  FROM events e JOIN s ON e.user_id = s.user_id
        |  WHERE e.event_type = 'click' AND epoch_us(e.ts) > s.t0
        |  GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, min(epoch_us(e.ts)) AS t2
        |  FROM events e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t1
        |  GROUP BY e.user_id)
        |SELECT s.user_id,
        |  CAST(s.t0 AS BIGINT) AS signup_us,
        |  CAST(c.t1 AS BIGINT) AS first_click_us,
        |  CAST(p.t2 AS BIGINT) AS first_purchase_us,
        |  CAST(CASE WHEN p.t2 IS NOT NULL THEN 3
        |            WHEN c.t1 IS NOT NULL THEN 2 ELSE 1 END AS BIGINT) AS stage
        |FROM s LEFT JOIN c ON s.user_id = c.user_id
        |       LEFT JOIN p ON s.user_id = p.user_id""".stripMargin) { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("tus"))
      val s0 = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min("tus").as("t0"))
      val c0 = ev.filter(col("event_type") === "click")
        .join(s0, "user_id").filter(col("tus") > col("t0"))
        .groupBy("user_id").agg(min("tus").as("t1"))
      val p0 = ev.filter(col("event_type") === "purchase")
        .join(c0, "user_id").filter(col("tus") > col("t1"))
        .groupBy("user_id").agg(min("tus").as("t2"))
      s0.join(c0, Seq("user_id"), "left").join(p0, Seq("user_id"), "left")
        .select(col("user_id"), col("t0").as("signup_us"),
          col("t1").as("first_click_us"), col("t2").as("first_purchase_us"),
          when(col("t2").isNotNull, 3L).when(col("t1").isNotNull, 2L)
            .otherwise(1L).as("stage"))
    },

    // ---- recursive CTE (Spark 4's UnionLoop operator): hierarchy walk
    // over the implicit customer tree parent(c) = c div 10 (roots are
    // custkeys 1..9, every other key reaches a root in <= digits-1
    // steps). Each recursion level is one join + filter on the previous
    // frontier — Spark executes the loop with the anchor/recursion
    // plans Catalyst optimized, pushdown intact; depth is bounded by
    // log10(max key), so the 100x-scale story is "one extra level per
    // decimal digit", not a deeper rewrite. The SQL is issued against
    // the parquet path directly (no temp-view registration, so the
    // query stays safe under the concurrent gate arm). ----
    QueryDef("q52_recursive_cte",
      """WITH RECURSIVE chain AS (
        |  SELECT CAST(c_custkey AS BIGINT) AS custkey,
        |         CAST(c_custkey AS BIGINT) AS root, 0 AS depth
        |  FROM customer WHERE c_custkey < 10
        |  UNION ALL
        |  SELECT CAST(c.c_custkey AS BIGINT), chain.root, chain.depth + 1
        |  FROM customer c JOIN chain ON c.c_custkey // 10 = chain.custkey
        |  WHERE c.c_custkey >= 10)
        |SELECT custkey, root, CAST(depth AS INT) AS depth FROM chain""".stripMargin) { (s, dir) =>
      val p = Tables.path(dir, "customer")
      s.sql(
        s"""WITH RECURSIVE chain AS (
           |  SELECT CAST(c_custkey AS BIGINT) AS custkey,
           |         CAST(c_custkey AS BIGINT) AS root, 0 AS depth
           |  FROM parquet.`$p` WHERE c_custkey < 10
           |  UNION ALL
           |  SELECT CAST(c.c_custkey AS BIGINT) AS custkey,
           |         chain.root AS root, chain.depth + 1 AS depth
           |  FROM parquet.`$p` c JOIN chain ON c.c_custkey div 10 = chain.custkey
           |  WHERE c.c_custkey >= 10)
           |SELECT custkey, root, CAST(depth AS INT) AS depth FROM chain""".stripMargin)
    },

    // ---- salted skew join (q34's agg-salting sibling, on the join
    // side): 30% of fact rows are remapped onto ONE hot part key, the
    // worst case for a shuffle join — the hot key's entire fact volume
    // lands on one reducer. The fix demonstrated here is explicit
    // salting: the fact side gets salt = hash(row) % 8, the dim side is
    // replicated once per salt, and the join key becomes (key, salt) —
    // the hot key now spreads over 8 reducers, at the cost of an 8x
    // blow-up of the SMALL side only. The shuffle_hash hint keeps the
    // join a shuffle join (broadcast would hide the skew problem this
    // operator exists to solve; at 100 TB the dim side has outgrown
    // broadcast range). AQE's skewedJoin handles moderate skew
    // post-hoc at runtime; explicit salting is the plan-level tool when
    // one key is pathological and predictable. Oracle = the plain
    // unsalted join (salting must be invisible in the results). ----
    QueryDef("q53_salted_join",
      """WITH f AS (
        |  SELECT CASE WHEN l_partkey % 10 < 3 THEN 1 ELSE l_partkey END AS hot_key,
        |         l_quantity
        |  FROM lineitem)
        |SELECT p.p_brand, count(*) AS n, sum(f.l_quantity) AS sum_qty
        |FROM f JOIN part p ON f.hot_key = p.p_partkey
        |GROUP BY p.p_brand""".stripMargin) { (s, dir) =>
      val salts = 8
      val fact = Tables.load(s, dir, "lineitem")
        .select(expr("CASE WHEN l_partkey % 10 < 3 THEN 1 ELSE l_partkey END")
            .as("hot_key"),
          col("l_quantity"),
          pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(salts))
            .cast("int").as("salt"))
      val dim = Tables.load(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"))
        .withColumn("salt", explode(sequence(lit(0), lit(salts - 1))))
      fact.join(dim.hint("shuffle_hash"),
          fact("hot_key") === dim("p_partkey") && fact("salt") === dim("salt"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("sum_qty"))
    },

    // ---- edit-distance similarity (fuzzy matching): classic unweighted
    // levenshtein over a bounded probe x candidate pair set — both
    // engines implement the same DP recurrence, so the distances are
    // exact integers. The probe side is broadcast (e01's shape); the DP
    // is per-pair CPU bounded by |a|x|b|, so the operator scales with
    // the candidate join's output, not the corpus product. ----
    QueryDef("q54_edit_distance",
      """SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        | CAST(levenshtein(a.text, b.text) AS BIGINT) AS dist
        |FROM documents a, documents b
        |WHERE a.doc_id < 5 AND b.doc_id >= 5 AND b.doc_id < 45
        |  AND a.lang = b.lang""".stripMargin) { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
      val a = d.filter(col("doc_id") < 5)
        .select(col("doc_id").as("a_id"), col("lang"), col("text").as("a_text"))
      val b = d.filter(col("doc_id") >= 5 && col("doc_id") < 45)
        .select(col("doc_id").as("b_id"), col("lang"), col("text").as("b_text"))
      b.join(broadcast(a), Seq("lang"))
        .select(col("a_id"), col("b_id"),
          levenshtein(col("a_text"), col("b_text")).cast("long").as("dist"))
    },

    // ---- statistical outlier detection (3-sigma rule) in EXACT
    // arithmetic: the textbook z-score filter |x - mean| > 3*stddev is
    // all floating point; cross-multiplying removes every division —
    // (x*n - S)^2 > 9*(n*Q - S^2) over exact cent-scaled integers (S =
    // sum, Q = sum of squares). Both sides are exact longs through the
    // final squaring, which runs in IEEE doubles identically on both
    // engines (the long-to-double conversion and one multiply round the
    // same way everywhere). One partial-agg pass for the moments + one
    // broadcast join back — the two-pass shape every streaming-unfriendly
    // exact detector needs. ----
    QueryDef("q55_outliers",
      """WITH s AS (
        |  SELECT event_type, count(*) AS n,
        |    sum(CAST(round(value*100) AS BIGINT)) AS sv,
        |    sum(CAST(round(value*100) AS BIGINT)*CAST(round(value*100) AS BIGINT)) AS qv
        |  FROM events GROUP BY event_type)
        |SELECT e.event_id, e.event_type,
        |  CAST(round(e.value*100) AS BIGINT) AS cents
        |FROM events e JOIN s ON e.event_type = s.event_type
        |WHERE CAST(CAST(round(e.value*100) AS BIGINT)*s.n - s.sv AS DOUBLE)
        |      * CAST(CAST(round(e.value*100) AS BIGINT)*s.n - s.sv AS DOUBLE)
        |      > CAST(9*(s.n*s.qv - s.sv*s.sv) AS DOUBLE)""".stripMargin) { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
        .select(col("event_id"), col("event_type"),
          round(col("value") * 100).cast("long").as("cents"))
      val moments = ev.groupBy("event_type").agg(
        count(lit(1)).as("n"), sum("cents").as("sv"),
        sum(col("cents") * col("cents")).as("qv"))
      ev.join(broadcast(moments), Seq("event_type"))
        .filter(((col("cents") * col("n") - col("sv")).cast("double")
            * (col("cents") * col("n") - col("sv")).cast("double"))
          > (lit(9) * (col("n") * col("qv") - col("sv") * col("sv"))).cast("double"))
        .select(col("event_id"), col("event_type"), col("cents"))
    },

    // ---- equi-width histogram per group, exact integer buckets: bucket
    // = clamp((x - lo) * nb / (hi - lo + 1)) over cent-scaled values
    // with per-group [lo, hi] from one partial-agg pass broadcast back
    // (DuckDB has no width_bucket — the arithmetic IS the operator, and
    // integer division keeps both engines bit-identical). ----
    QueryDef("q56_histogram",
      """WITH r AS (
        |  SELECT event_type,
        |    min(CAST(round(value*100) AS BIGINT)) AS lo,
        |    max(CAST(round(value*100) AS BIGINT)) AS hi
        |  FROM events GROUP BY event_type)
        |SELECT e.event_type,
        |  CAST(least(9, ((CAST(round(e.value*100) AS BIGINT) - r.lo) * 10)
        |    // (r.hi - r.lo + 1)) AS INT) AS bucket,
        |  count(*) AS n
        |FROM events e JOIN r ON e.event_type = r.event_type
        |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
        .select(col("event_type"), round(col("value") * 100).cast("long").as("cents"))
      val range = ev.groupBy("event_type")
        .agg(min("cents").as("lo"), max("cents").as("hi"))
      ev.join(broadcast(range), Seq("event_type"))
        .select(col("event_type"),
          least(lit(9), expr("((cents - lo) * 10) div (hi - lo + 1)"))
            .cast("int").as("bucket"))
        .groupBy("event_type", "bucket")
        .agg(count(lit(1)).as("n"))
    },

    // ---- forward-fill gap fill (q57): IGNORE NULLS running last_value,
    // the standard sparse-series densification (sensor/price carry-
    // forward). The sparse series is derived deterministically (a
    // customer's order price is "observed" only on order keys divisible
    // by 3), then filled per customer in order-key order with
    // last(_, ignoreNulls = true) over a running ROWS frame; rows before
    // a customer's first observation stay NULL, which the hash gate
    // covers explicitly. All-integer (cents). Scale shape: ONE hash
    // exchange on o_custkey + per-partition sort — the frame is a single
    // carry-forward register per partition, no global sort, no second
    // pass. ----
    QueryDef("q57_gap_fill",
      """SELECT o_custkey, o_orderkey,
        |  CASE WHEN o_orderkey % 3 = 0
        |       THEN CAST(round(o_totalprice*100) AS BIGINT) END AS observed_cents,
        |  last_value(CASE WHEN o_orderkey % 3 = 0
        |       THEN CAST(round(o_totalprice*100) AS BIGINT) END IGNORE NULLS)
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_cents
        |FROM orders""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.load(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          when(col("o_orderkey") % 3 === 0,
            round(col("o_totalprice") * 100).cast("long")).as("observed_cents"))
        .withColumn("filled_cents",
          last(col("observed_cents"), ignoreNulls = true).over(w))
    },

    // ---- nested-data round-trip (q58): each customer's orders packed
    // into an ARRAY<STRUCT> (collect_list -> array_sort on the struct's
    // lexicographic field order -> slice to the earliest 3), then
    // posexplode'd back to flat rows — the document-model build/flatten
    // cycle every denormalized training manifest goes through. The
    // nested value is internal; the emitted rows are flat all-integer
    // columns, so the oracle is the plain window-rank formulation.
    // Scale shape: ONE hash exchange on o_custkey for the collect_list;
    // the sort/slice run inside the aggregate buffer per key (bounded
    // by orders-per-customer), and the explode is a zero-shuffle
    // projection. ----
    QueryDef("q58_nested_orders",
      """WITH r AS (SELECT o_custkey, o_orderkey, o_orderdate,
        |    CAST(round(o_totalprice*100) AS BIGINT) AS cents,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey) AS rn
        |  FROM orders)
        |SELECT o_custkey AS c_custkey, CAST(rn AS BIGINT) AS pos,
        |  o_orderkey, epoch_us(o_orderdate) AS odate_us, cents
        |FROM r WHERE rn <= 3""".stripMargin) { (s, dir) =>
      val packed = Tables.load(s, dir, "orders")
        .select(col("o_custkey"), struct(col("o_orderdate"),
          col("o_orderkey"),
          round(col("o_totalprice") * 100).cast("long").as("cents")).as("o"))
        .groupBy(col("o_custkey"))
        .agg(slice(array_sort(collect_list(col("o"))), 1, 3).as("first3"))
      packed
        .select(col("o_custkey").as("c_custkey"),
          posexplode(col("first3")).as(Seq("pos0", "o")))
        .select(col("c_custkey"), (col("pos0") + 1).cast("long").as("pos"),
          col("o.o_orderkey").as("o_orderkey"),
          unix_micros(col("o.o_orderdate")).as("odate_us"),
          col("o.cents").as("cents"))
    },

    // ---- cumulative distinct users per day (q59): COUNT(DISTINCT) over
    // a growing window is quadratic done naively and approximate done
    // with sketches — the exact scalable shape is FIRST-SEEN
    // DECOMPOSITION: a user contributes to distinct-growth only on their
    // first day, so cumulative distinct = running sum of per-day
    // first-seen counts. One shuffle on user_id (the min-date agg, map-
    // side combined), one on the day key (day-cardinality rows), then a
    // running sum over the tiny day table. All-integer, and the same
    // decomposition the oracle runs. ----
    QueryDef("q59_cumulative_distinct",
      """WITH f AS (SELECT user_id,
        |    min(CAST(floor(epoch(ts) / 3600) AS BIGINT)) AS h0
        |  FROM events GROUP BY user_id),
        |n AS (SELECT h0, count(*) AS n_new FROM f GROUP BY h0)
        |SELECT h0 * 3600 AS hour_start_s, CAST(n_new AS BIGINT) AS n_new,
        |  CAST(sum(n_new) OVER (ORDER BY h0 ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |    AS cum_users
        |FROM n""".stripMargin) { (s, dir) =>
      val firstSeen = Tables.load(s, dir, "events")
        .groupBy("user_id")
        .agg(min(expr("unix_seconds(ts) div 3600")).as("h0"))
      val perHour = firstSeen.groupBy("h0").agg(count(lit(1)).as("n_new"))
      val w = Window.orderBy("h0")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // the global running sum is over HOUR-cardinality rows (tens of
      // thousands even for years of data), not events — the single-
      // partition window is metadata-sized by construction
      perHour
        .select((col("h0") * 3600).cast("long").as("hour_start_s"),
          col("n_new").cast("long").as("n_new"),
          sum("n_new").over(w).cast("long").as("cum_users"))
    },

    // ---- deterministic ordered string aggregation (q60): per market
    // segment, the 5 alphabetically-first customer names joined into
    // one string — LISTAGG/STRING_AGG with an explicit ORDER BY, the
    // report-building aggregate that is silently nondeterministic
    // without one (collect_list order is partition-arrival order).
    // Spark side sorts INSIDE the aggregate buffer (array_sort over
    // collect_list, then slice+join); one exchange on the segment key.
    // ----
    QueryDef("q60_string_agg",
      """WITH r AS (SELECT c_mktsegment, c_name,
        |    row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_name) AS rn
        |  FROM customer)
        |SELECT c_mktsegment, count(*) AS n_top,
        |  string_agg(c_name, ',' ORDER BY c_name) AS first5
        |FROM r WHERE rn <= 5 GROUP BY c_mktsegment""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "customer")
        .groupBy("c_mktsegment")
        .agg(slice(array_sort(collect_list(col("c_name"))), 1, 5).as("names"))
        .select(col("c_mktsegment"),
          size(col("names")).cast("long").as("n_top"),
          array_join(col("names"), ",").as("first5"))
    }
  )
}
