package graft.operators

import graft.GraftQuery
import graft.GraftQuery.sql
import graft.sources.Tables
import graft.operators.Det._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TPC-H-shaped relational coverage: scans, filters, projections, hash/sort
  * aggregations, inner/semi/anti/outer joins, correlated and scalar
  * subqueries, HAVING, CASE, IN/BETWEEN/LIKE.
  *
  * The reference app has **no** relational operators (SURVEY.md §2.6 —
  * complete-read claim); this module is the north-star gap-fill, built
  * entirely from declarative `DataFrame` ops so Catalyst gets predicate
  * pushdown, column pruning, join selection, and whole-stage codegen.
  *
  * Scale posture (100 TB): every join keys on the natural distribution keys
  * (orderkey/custkey/partkey); fixed-cardinality dims (`region` 5 rows,
  * `nation` 25 rows) are explicitly `broadcast()`; everything else is left
  * to AQE, which at real scale flips sort-merge → broadcast when a filtered
  * side fits, and splits skewed partitions.
  *
  * All float aggregation goes through [[Det]]: money sums are accumulated
  * as exact decimals (order-independent, so results are identical no matter
  * how many partitions the 100 TB plan splits into) and rounding uses the
  * same IEEE expression in both engines.
  */
object RelationalQueries {

  private val revExpr = "l_extendedprice * (1 - l_discount)"
  private def revCol = col("l_extendedprice") * (lit(1) - col("l_discount"))

  val all: Seq[GraftQuery] = Seq(
    sql(
      "q01_pricing_summary",
      "TPC-H Q1: multi-aggregate pricing summary by returnflag/linestatus",
      s"""SELECT l_returnflag, l_linestatus,
        |       ${s2("l_quantity")} AS sum_qty,
        |       ${s2("l_extendedprice")} AS sum_base_price,
        |       ${s2(revExpr)} AS sum_disc_price,
        |       ${s2("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
        |       ${a4("l_quantity")} AS avg_qty,
        |       ${a4("l_extendedprice")} AS avg_price,
        |       ${a4("l_discount")} AS avg_disc,
        |       count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""") { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= expr("TIMESTAMP_NTZ '2000-09-02'"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum2(col("l_quantity")).as("sum_qty"),
          dsum2(col("l_extendedprice")).as("sum_base_price"),
          dsum2(revCol).as("sum_disc_price"),
          dsum2(revCol * (lit(1) + col("l_tax"))).as("sum_charge"),
          davg4(col("l_quantity")).as("avg_qty"),
          davg4(col("l_extendedprice")).as("avg_price"),
          davg4(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    sql(
      "q02_filter_project",
      "selective filter + computed projection (parquet pushdown path)",
      """SELECT l_orderkey, l_linenumber,
        |       floor((l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100 AS revenue
        |FROM lineitem
        |WHERE l_quantity >= 45 AND l_discount >= 0.08
        |  AND l_shipdate >= TIMESTAMP '1996-01-01'
        |ORDER BY l_orderkey, l_linenumber""") { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_quantity") >= 45 && col("l_discount") >= 0.08 &&
          col("l_shipdate") >= expr("TIMESTAMP_NTZ '1996-01-01'"))
        .select(col("l_orderkey"), col("l_linenumber"), r2(revCol).as("revenue"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    sql(
      "q03_shipping_priority",
      "TPC-H Q3: 3-way join, revenue per order, deterministic top 10",
      s"""SELECT o.o_orderkey,
        |       ${s2("l.l_extendedprice * (1 - l.l_discount)")} AS revenue,
        |       o.o_orderdate, o.o_orderpriority
        |FROM customer c
        |JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 10""") { (s, dir) =>
      val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, dir).filter(col("o_orderdate") < expr("TIMESTAMP_NTZ '1998-01-01'"))
      val l = Tables.lineitem(s, dir)
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum2(revCol).as("revenue"))
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(desc("revenue"), col("o_orderkey"))
        .limit(10)
    },

    sql(
      "q04_order_priority",
      "TPC-H Q4: EXISTS semi-join, count by order priority",
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o.o_orderdate < TIMESTAMP '1997-01-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""") { (s, dir) =>
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= expr("TIMESTAMP_NTZ '1996-01-01'") &&
          col("o_orderdate") < expr("TIMESTAMP_NTZ '1997-01-01'"))
      val l = Tables.lineitem(s, dir)
      o.join(l, col("l_orderkey") === col("o_orderkey") && col("l_shipdate") > col("o_orderdate"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },

    sql(
      "q05_local_supplier_volume",
      "TPC-H Q5: 6-way join through region dim (broadcast), revenue per nation",
      s"""SELECT n.n_name,
        |       ${s2("l.l_extendedprice * (1 - l.l_discount)")} AS revenue
        |FROM customer c
        |JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE r.r_name = 'ASIA'
        |GROUP BY n.n_name
        |ORDER BY n.n_name""") { (s, dir) =>
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      val l = Tables.lineitem(s, dir)
      val su = Tables.supplier(s, dir)
      val n = broadcast(Tables.nation(s, dir))
      val r = broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA"))
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("l_orderkey") === col("o_orderkey"))
        .join(su, col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .join(n, col("s_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(dsum2(revCol).as("revenue"))
        .orderBy("n_name")
    },

    sql(
      "q06_forecast_revenue",
      "TPC-H Q6: single-row filtered aggregate (full pushdown)",
      s"""SELECT ${s2("l_extendedprice * l_discount")} AS revenue,
        |       count(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""") { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= expr("TIMESTAMP_NTZ '1996-01-01'") &&
          col("l_shipdate") < expr("TIMESTAMP_NTZ '1997-01-01'") &&
          col("l_discount").between(0.03, 0.07) && col("l_quantity") < 24)
        .agg(dsum2(col("l_extendedprice") * col("l_discount")).as("revenue"),
          count(lit(1)).as("n_lines"))
    },

    sql(
      "q07_volume_shipping",
      "TPC-H Q7: nation-pair revenue by ship year (two nation dims aliased)",
      s"""SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
        |       CAST(year(l.l_shipdate) AS INT) AS ship_year,
        |       ${s2("l.l_extendedprice * (1 - l.l_discount)")} AS revenue
        |FROM customer c
        |JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
        |JOIN orders o ON o.o_custkey = c.c_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
        |WHERE l.l_shipdate >= TIMESTAMP '1996-01-01' AND l.l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1, 2, 3
        |ORDER BY 1, 2, 3""") { (s, dir) =>
      val n1 = broadcast(Tables.nation(s, dir)
        .select(col("n_nationkey").as("c_nkey"), col("n_name").as("cust_nation")))
      val n2 = broadcast(Tables.nation(s, dir)
        .select(col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation")))
      Tables.customer(s, dir)
        .join(n1, col("c_nationkey") === col("c_nkey"))
        .join(Tables.orders(s, dir), col("o_custkey") === col("c_custkey"))
        .join(Tables.lineitem(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
        .join(n2, col("s_nationkey") === col("s_nkey"))
        .filter(col("l_shipdate") >= expr("TIMESTAMP_NTZ '1996-01-01'") &&
          col("l_shipdate") < expr("TIMESTAMP_NTZ '1998-01-01'"))
        .groupBy(col("cust_nation"), col("supp_nation"),
          year(col("l_shipdate")).as("ship_year"))
        .agg(dsum2(revCol).as("revenue"))
        .orderBy("cust_nation", "supp_nation", "ship_year")
    },

    sql(
      "q09_product_profit",
      "TPC-H Q9-shaped: profit proxy by supplier nation × year (exact decimal sum absorbs the +/- cancellation)",
      s"""SELECT n.n_name, CAST(year(o.o_orderdate) AS INT) AS order_year,
        |       ${s2("l.l_extendedprice * (1 - l.l_discount) - 0.1 * p.p_retailprice * l.l_quantity")} AS profit
        |FROM lineitem l
        |JOIN part p ON l.l_partkey = p.p_partkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE p.p_name LIKE '%widget%'
        |GROUP BY n.n_name, order_year
        |ORDER BY n.n_name, order_year""") { (s, dir) =>
      Tables.lineitem(s, dir)
        .join(Tables.part(s, dir).filter(col("p_name").like("%widget%")),
          col("l_partkey") === col("p_partkey"))
        .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name"), year(col("o_orderdate")).as("order_year"))
        .agg(dsum2(revCol - lit(0.1) * col("p_retailprice") * col("l_quantity")).as("profit"))
        .orderBy("n_name", "order_year")
    },

    sql(
      "q10_returned_items",
      "TPC-H Q10: returned-item revenue per customer, deterministic top 20",
      s"""SELECT c.c_custkey, c.c_name,
        |       ${s2("l.l_extendedprice * (1 - l.l_discount)")} AS revenue,
        |       floor((c.c_acctbal) * 100 + 0.5) / 100 AS c_acctbal, n.n_name
        |FROM customer c
        |JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |WHERE l.l_returnflag = 'R'
        |GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""") { (s, dir) =>
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, dir).filter(col("l_returnflag") === "R"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum2(revCol).as("revenue"))
        .select(col("c_custkey"), col("c_name"), col("revenue"),
          r2(col("c_acctbal")).as("c_acctbal"), col("n_name"))
        .orderBy(desc("revenue"), col("c_custkey"))
        .limit(20)
    },

    sql(
      "q12_priority_mix",
      "conditional aggregation (CASE inside SUM) by order year",
      s"""SELECT CAST(year(o_orderdate) AS INT) AS order_year,
        |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
        |       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_count,
        |       ${a2("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END")} AS avg_finished_price
        |FROM orders
        |GROUP BY order_year
        |ORDER BY order_year""") { (s, dir) =>
      val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      Tables.orders(s, dir)
        .groupBy(year(col("o_orderdate")).as("order_year"))
        .agg(
          sum(when(high, 1).otherwise(0)).cast("long").as("high_count"),
          sum(when(!high, 1).otherwise(0)).cast("long").as("low_count"),
          davg2(when(col("o_orderstatus") === "F", col("o_totalprice"))).as("avg_finished_price"))
        .orderBy("order_year")
    },

    sql(
      "q13_customer_distribution",
      "TPC-H Q13: left outer join + double aggregation (count distribution)",
      """SELECT c_count, count(*) AS custdist
        |FROM (SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        |      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        |      GROUP BY c.c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""") { (s, dir) =>
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(desc("custdist"), desc("c_count"))
    },

    sql(
      "q14_promo_revenue",
      "TPC-H Q14: ratio of conditional to total aggregate (join + CASE)",
      s"""SELECT floor((100.0 * ${sraw("CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END")}
        |             / ${sraw("l.l_extendedprice * (1 - l.l_discount)")}) * 10000 + 0.5) / 10000 AS promo_revenue_pct
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE l.l_shipdate >= TIMESTAMP '1997-01-01' AND l.l_shipdate < TIMESTAMP '1997-07-01'""") { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= expr("TIMESTAMP_NTZ '1997-01-01'") &&
          col("l_shipdate") < expr("TIMESTAMP_NTZ '1997-07-01'"))
        .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
        .agg(r4(lit(100.0) * dsum(when(col("p_type") === "PROMO", revCol).otherwise(0)) / dsum(revCol))
          .as("promo_revenue_pct"))
    },

    sql(
      "q15_top_supplier",
      "TPC-H Q15: max-of-aggregate via scalar subquery over a derived view",
      s"""WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |         ${s2("l_extendedprice * (1 - l_discount)")} AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s.s_suppkey, s.s_name, r.total_revenue
        |FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
        |WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
        |ORDER BY s.s_suppkey""") { (s, dir) =>
      val revenue = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= expr("TIMESTAMP_NTZ '1996-01-01'") &&
          col("l_shipdate") < expr("TIMESTAMP_NTZ '1996-04-01'"))
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(dsum2(revCol).as("total_revenue"))
      val maxRev = revenue.agg(max("total_revenue").as("max_revenue"))
      Tables.supplier(s, dir)
        .join(revenue, col("s_suppkey") === col("supplier_no"))
        .join(broadcast(maxRev), col("total_revenue") === col("max_revenue"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    },

    sql(
      "q17_small_quantity",
      "TPC-H Q17: correlated subquery (per-part avg) as aggregate-then-join",
      s"""SELECT floor((${sraw("l.l_extendedprice")} / 7.0) * 100 + 0.5) / 100 AS avg_yearly
        |FROM lineitem l
        |JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE p.p_brand = 'Brand#13'
        |  AND l.l_quantity < (SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
        |                      WHERE l2.l_partkey = l.l_partkey)""") { (s, dir) =>
      val l = Tables.lineitem(s, dir)
      val avgQty = l.groupBy(col("l_partkey").as("ap_partkey"))
        .agg((lit(0.5) * avg("l_quantity")).as("half_avg_qty"))
      l.join(Tables.part(s, dir).filter(col("p_brand") === "Brand#13"),
          col("p_partkey") === col("l_partkey"))
        .join(avgQty, col("ap_partkey") === col("l_partkey"))
        .filter(col("l_quantity") < col("half_avg_qty"))
        .agg(r2(dsum(col("l_extendedprice")) / 7.0).as("avg_yearly"))
    },

    sql(
      "q18_large_orders",
      "TPC-H Q18: HAVING on grouped sum, join back to dimensions",
      """SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
        |       floor((o.o_totalprice) * 100 + 0.5) / 100 AS o_totalprice,
        |       floor((t.sum_qty) * 100 + 0.5) / 100 AS sum_qty
        |FROM (SELECT l_orderkey, sum(l_quantity) AS sum_qty
        |      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 180) t
        |JOIN orders o ON o.o_orderkey = t.l_orderkey
        |JOIN customer c ON c.c_custkey = o.o_custkey
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 50""") { (s, dir) =>
      // l_quantity is integer-valued, so a double sum is already exact.
      val t = Tables.lineitem(s, dir)
        .groupBy("l_orderkey")
        .agg(sum("l_quantity").as("sum_qty"))
        .filter(col("sum_qty") > 180)
      t.join(Tables.orders(s, dir), col("o_orderkey") === col("l_orderkey"))
        .join(Tables.customer(s, dir), col("c_custkey") === col("o_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"), col("o_orderdate"),
          r2(col("o_totalprice")).as("o_totalprice"),
          r2(col("sum_qty")).as("sum_qty"))
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
        .limit(50)
    },

    sql(
      "q19_discounted_revenue",
      "TPC-H Q19: disjunctive multi-predicate join (OR of conjunction groups)",
      s"""SELECT ${s2("l.l_extendedprice * (1 - l.l_discount)")} AS revenue,
        |       count(*) AS n_lines
        |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 21)
        |   OR (p.p_brand = 'Brand#7' AND p.p_size BETWEEN 10 AND 30 AND l.l_quantity BETWEEN 10 AND 40)
        |   OR (p.p_brand = 'Brand#20' AND p.p_size BETWEEN 20 AND 50 AND l.l_quantity BETWEEN 20 AND 50)""") { (s, dir) =>
      val cond =
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) && col("l_quantity").between(1, 21)) ||
        (col("p_brand") === "Brand#7" && col("p_size").between(10, 30) && col("l_quantity").between(10, 40)) ||
        (col("p_brand") === "Brand#20" && col("p_size").between(20, 50) && col("l_quantity").between(20, 50))
      Tables.lineitem(s, dir)
        .join(Tables.part(s, dir), col("p_partkey") === col("l_partkey"))
        .filter(cond)
        .agg(dsum2(revCol).as("revenue"), count(lit(1)).as("n_lines"))
    },

    sql(
      "q22_acctbal_opportunity",
      "TPC-H Q22-shaped: scalar subquery threshold + anti join, per nation",
      s"""SELECT c.c_nationkey, count(*) AS numcust,
        |       ${s2("c.c_acctbal")} AS totacctbal
        |FROM customer c
        |WHERE c.c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
        |  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        |                  AND o.o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY c.c_nationkey
        |ORDER BY c.c_nationkey""") { (s, dir) =>
      val c = Tables.customer(s, dir)
      // threshold avg: double avg over the full column — the comparison is
      // strict-inequality against well-separated values, not a hash target.
      val threshold = c.filter(col("c_acctbal") > 0.0).agg(avg("c_acctbal").as("avg_bal"))
      val recentOrders = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= expr("TIMESTAMP_NTZ '2000-01-01'"))
      c.join(broadcast(threshold))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(recentOrders, col("o_custkey") === col("c_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("numcust"), dsum2(col("c_acctbal")).as("totacctbal"))
        .orderBy("c_nationkey")
    },

    sql(
      "q75_lateral_topk",
      "correlated LATERAL join: each customer's single most expensive order via a per-row ordered+limited subquery (Spark 4 lateral subquery support; DuckDB LATERAL twin)",
      """SELECT c.c_custkey, o.o_orderkey,
        |       floor(o.o_totalprice * 100 + 0.5) / 100 AS top_price
        |FROM customer c, LATERAL (
        |  SELECT o_orderkey, o_totalprice
        |  FROM orders
        |  WHERE o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey
        |  LIMIT 1) o
        |ORDER BY c.c_custkey""") { (s, dir) =>
      Tables.customer(s, dir).createOrReplaceTempView("customer_l")
      Tables.orders(s, dir).createOrReplaceTempView("orders_l")
      s.sql(
        """SELECT c.c_custkey, o.o_orderkey,
          |       floor(o.o_totalprice * 100 + 0.5) / 100 AS top_price
          |FROM customer_l c, LATERAL (
          |  SELECT o_orderkey, o_totalprice
          |  FROM orders_l
          |  WHERE o_custkey = c.c_custkey
          |  ORDER BY o_totalprice DESC, o_orderkey
          |  LIMIT 1) o
          |ORDER BY c.c_custkey""".stripMargin)
    },

    sql(
      "q74_schema_evolution_union",
      "schema-evolution union: an old-schema batch and a new-schema batch (extra column) combine via unionByName(allowMissingColumns) — missing columns null-fill, then aggregate over the merged view",
      s"""WITH v1 AS (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_orderdate < TIMESTAMP '1997-01-01'),
        |v2 AS (
        |  SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1997-01-01'),
        |u AS (SELECT * FROM v1 UNION ALL BY NAME SELECT * FROM v2)
        |SELECT coalesce(o_orderpriority, 'LEGACY') AS priority,
        |       count(*) AS n, ${s2("o_totalprice")} AS total
        |FROM u GROUP BY priority
        |ORDER BY priority""") { (s, dir) =>
      val orders = Tables.orders(s, dir)
      val cut = expr("TIMESTAMP_NTZ '1997-01-01'")
      val v1 = orders.filter(col("o_orderdate") < cut)
        .select("o_orderkey", "o_totalprice")
      val v2 = orders.filter(col("o_orderdate") >= cut)
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
      v1.unionByName(v2, allowMissingColumns = true)
        .groupBy(coalesce(col("o_orderpriority"), lit("LEGACY")).as("priority"))
        .agg(count(lit(1)).as("n"), dsum2(col("o_totalprice")).as("total"))
        .orderBy("priority")
    },

    sql(
      "q72_bloom_semi_join",
      "bloom-filter semi-join reduction: a 16 KB bitset (custom Aggregator, word-OR merge) broadcast prunes the fact side before the exact join — at 100 TB the dim's raw key set may exceed the broadcast budget while its bloom never does; false positives are removed by the exact join, so the result is exact and oracle-checkable",
      s"""SELECT l.l_returnflag, count(*) AS n_lines, ${s2("l.l_extendedprice")} AS revenue
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_totalprice > 400000
        |GROUP BY l.l_returnflag
        |ORDER BY l.l_returnflag""") { (s, dir) =>
      import graft.functions.{Aggregators, BloomOps}
      val NumBits = 1 << 17
      val NumHashes = 5
      val bloom = udaf(new Aggregators.BloomFilter(NumBits, NumHashes))
      val bigOrders = Tables.orders(s, dir)
        .filter(col("o_totalprice") > 400000)
        .select("o_orderkey")
      val bits = broadcast(bigOrders.agg(bloom(col("o_orderkey")).as("bits")))
      val pruned = Tables.lineitem(s, dir)
        .select("l_orderkey", "l_returnflag", "l_extendedprice")
        .crossJoin(bits)
        .filter(BloomOps.bloomMightContain(col("bits"), col("l_orderkey"), NumBits, NumHashes))
        .drop("bits")
      pruned.join(bigOrders, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_lines"), dsum2(col("l_extendedprice")).as("revenue"))
        .orderBy("l_returnflag")
    },

    sql(
      "u01_merge_upsert",
      "MERGE/upsert (operator Spark core lacks; composed anti-join + left-join + union form): apply a change set (updates, deletes, inserts — derived deterministically from the fixture so both engines see the same changes) to a base table — the corpus-refresh primitive a curation pipeline runs on every ingest. 100 TB posture: one shuffle join on the merge key; the delete side is a semi/anti join (bloom-reducible like q72); inserts are a union, never a rewrite of unchanged rows",
      """WITH upd AS (SELECT o_orderkey, o_totalprice + 1.0 AS new_price
        |             FROM orders WHERE o_orderkey % 100 = 0),
        |del AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 100 = 1),
        |ins AS (SELECT o_orderkey + 100000000 AS o_orderkey, o_orderstatus, o_totalprice
        |        FROM orders WHERE o_orderkey % 100 = 2),
        |merged AS (
        |  SELECT b.o_orderkey, b.o_orderstatus,
        |         coalesce(u.new_price, b.o_totalprice) AS price
        |  FROM orders b
        |  LEFT JOIN upd u USING (o_orderkey)
        |  WHERE b.o_orderkey NOT IN (SELECT o_orderkey FROM del)
        |  UNION ALL
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM ins)
        |SELECT o_orderstatus, count(*) AS n,
        |       CAST(sum(CAST(price AS DECIMAL(24,6))) AS DOUBLE) AS sum_price
        |FROM merged GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""") { (s, dir) =>
      val base = Tables.orders(s, dir)
      val upd = base.filter(col("o_orderkey") % 100 === 0)
        .select(col("o_orderkey"), (col("o_totalprice") + 1.0).as("new_price"))
      val del = base.filter(col("o_orderkey") % 100 === 1).select("o_orderkey")
      val ins = base.filter(col("o_orderkey") % 100 === 2)
        .select((col("o_orderkey") + 100000000L).as("o_orderkey"),
          col("o_orderstatus"), col("o_totalprice").as("price"))
      base.join(del, Seq("o_orderkey"), "left_anti")
        .join(upd, Seq("o_orderkey"), "left")
        .select(col("o_orderkey"), col("o_orderstatus"),
          coalesce(col("new_price"), col("o_totalprice")).as("price"))
        .unionByName(ins)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), dsum(col("price")).as("sum_price"))
        .orderBy("o_orderstatus")
    },

    sql(
      "u04_cdc_apply",
      "CDC changelog apply (sequenced last-writer-wins + tombstones, u01's streaming-shaped sibling): a change log keyed by entity with a monotone sequence compacts to its latest op per key via max_by — 'D' tombstones delete the key, 'U' upserts the value — then one outer join applies the compacted log to the base snapshot. The log derives deterministically from the fixture so both engines see identical changes. Scale posture: compaction is a map-side-combinable keyed aggregation (max_by partials merge), never a per-key window sort; the apply is one equi-join on the key — the Debezium/Delta CDF merge shape at 100 TB",
      s"""WITH log AS (
        |  SELECT o_custkey AS k, CAST(o_orderkey AS BIGINT) AS seq,
        |         CASE WHEN o_orderkey % 13 = 0 THEN 'D' ELSE 'U' END AS op,
        |         o_totalprice AS new_bal
        |  FROM orders),
        |latest AS (
        |  SELECT k, arg_max(op, seq) AS op, arg_max(new_bal, seq) AS new_bal
        |  FROM log GROUP BY k),
        |applied AS (
        |  SELECT b.c_mktsegment, coalesce(l.new_bal, b.c_acctbal) AS bal
        |  FROM customer b LEFT JOIN latest l ON l.k = b.c_custkey
        |  WHERE l.op IS NULL OR l.op = 'U')
        |SELECT c_mktsegment, count(*) AS n_customers,
        |       ${s2("bal")} AS sum_bal
        |FROM applied GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""") { (s, dir) =>
      val log = Tables.orders(s, dir)
        .select(col("o_custkey").as("k"), col("o_orderkey").cast("long").as("seq"),
          when(col("o_orderkey") % 13 === 0, "D").otherwise("U").as("op"),
          col("o_totalprice").as("new_bal"))
      // seq (the order key) is unique, so max_by is tie-free and both
      // engines compact to the same terminal op per key
      val latest = log.groupBy("k")
        .agg(max_by(col("op"), col("seq")).as("op"),
          max_by(col("new_bal"), col("seq")).as("new_bal"))
      Tables.customer(s, dir)
        .join(latest, col("c_custkey") === col("k"), "left")
        .filter(col("op").isNull || col("op") === "U")
        .select(col("c_mktsegment"), coalesce(col("new_bal"), col("c_acctbal")).as("bal"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_customers"), dsum2(col("bal")).as("sum_bal"))
        .orderBy("c_mktsegment")
    },

    sql(
      "u05_snapshot_diff",
      "snapshot diff / reconciliation (the audit primitive BEHIND CDC — u04 applies a changelog, this derives one): two corpus snapshots compare by a single full-outer join on the key and every row classifies as added (new only), removed (old only), changed (both, value differs) or unchanged; the report is per-class row counts plus a key fold so the driver hash pins membership, not just cardinality. Snapshots derive deterministically from the fixture (old = keys % 10 != 3, new = keys % 10 != 7 with prices bumped +100.00 on keys % 10 = 1), so both engines see identical inputs. The +100.00 delta and the equality compare are IEEE-exact in both engines (100.0 is a dyadic rational; x+100.0 == x cannot hold below 2^47). Scale posture: ONE co-partitioned full-outer shuffle join on the key, classification is a projection — at 100 TB this is the nightly snapshot-reconciliation shape, and the same plan works as a partition-pruned incremental diff when snapshots are date-partitioned",
      """WITH old AS (
        |  SELECT o_orderkey AS k, o_totalprice AS v FROM orders WHERE o_orderkey % 10 != 3),
        |new_ AS (
        |  SELECT o_orderkey AS k,
        |         CASE WHEN o_orderkey % 10 = 1 THEN o_totalprice + 100.00 ELSE o_totalprice END AS v
        |  FROM orders WHERE o_orderkey % 10 != 7),
        |classified AS (
        |  SELECT coalesce(o.k, n.k) AS k,
        |         CASE WHEN o.k IS NULL THEN 'added'
        |              WHEN n.k IS NULL THEN 'removed'
        |              WHEN o.v != n.v THEN 'changed'
        |              ELSE 'unchanged' END AS change_type
        |  FROM old o FULL OUTER JOIN new_ n ON o.k = n.k)
        |SELECT change_type, CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(sum(k % 1000003) AS BIGINT) AS key_fold
        |FROM classified GROUP BY change_type
        |ORDER BY change_type""") { (s, dir) =>
      val orders = Tables.orders(s, dir)
      val old = orders.filter(col("o_orderkey") % 10 =!= 3)
        .select(col("o_orderkey").as("k"), col("o_totalprice").as("v"))
      val neu = orders.filter(col("o_orderkey") % 10 =!= 7)
        .select(col("o_orderkey").as("k"),
          when(col("o_orderkey") % 10 === 1, col("o_totalprice") + 100.00)
            .otherwise(col("o_totalprice")).as("v"))
      old.as("o").join(neu.as("n"), col("o.k") === col("n.k"), "full_outer")
        .select(coalesce(col("o.k"), col("n.k")).as("k"),
          when(col("o.k").isNull, "added")
            .when(col("n.k").isNull, "removed")
            .when(col("o.v") =!= col("n.v"), "changed")
            .otherwise("unchanged").as("change_type"))
        .groupBy("change_type")
        .agg(count(lit(1)).cast("long").as("n_rows"),
          sum(col("k") % 1000003L).cast("long").as("key_fold"))
        .orderBy("change_type")
    },

    sql(
      "u06_delete_cascade",
      "referential delete cascade — the right-to-be-forgotten primitive (a deletion-request list must purge the subject's rows AND every downstream fact that references them, with an auditable per-table count): request set = customers with c_custkey % 97 = 0; cascade customer → their orders → those orders' lineitems; report per table the deleted count, surviving count, and a deleted-key fold so the driver hash pins WHICH rows died, not just how many. All integer counts. Scale posture: the request list is small by contract (deletion requests, not a corpus scan) so it broadcasts; orders filter by a broadcast semi-join, lineitem by a keyed semi-join on orderkey that AQE may itself broadcast — never a full-table anti-join materialization, and the same plan writes deletion vectors instead of counts in a real purge. The three report legs are single-row aggregates (scalar crossJoins, the q06 pattern)",
      """WITH del AS (SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0),
        |dord AS (SELECT o_orderkey FROM orders
        |         WHERE o_custkey IN (SELECT c_custkey FROM del)),
        |dlin AS (SELECT l_orderkey, l_linenumber FROM lineitem
        |         WHERE l_orderkey IN (SELECT o_orderkey FROM dord))
        |SELECT 'customer' AS tbl,
        |       CAST((SELECT count(*) FROM del) AS BIGINT) AS n_deleted,
        |       CAST((SELECT count(*) FROM customer) - (SELECT count(*) FROM del) AS BIGINT) AS n_kept,
        |       CAST((SELECT coalesce(sum(c_custkey % 1000003), 0) FROM del) AS BIGINT) AS key_fold
        |UNION ALL
        |SELECT 'lineitem',
        |       CAST((SELECT count(*) FROM dlin) AS BIGINT),
        |       CAST((SELECT count(*) FROM lineitem) - (SELECT count(*) FROM dlin) AS BIGINT),
        |       CAST((SELECT coalesce(sum(l_orderkey * 7 % 1000003 + l_linenumber), 0) FROM dlin) AS BIGINT)
        |UNION ALL
        |SELECT 'orders',
        |       CAST((SELECT count(*) FROM dord) AS BIGINT),
        |       CAST((SELECT count(*) FROM orders) - (SELECT count(*) FROM dord) AS BIGINT),
        |       CAST((SELECT coalesce(sum(o_orderkey % 1000003), 0) FROM dord) AS BIGINT)
        |ORDER BY tbl""") { (s, dir) =>
      val customer = Tables.customer(s, dir)
      val orders = Tables.orders(s, dir)
      val lineitem = Tables.lineitem(s, dir)
      val del = customer.filter(col("c_custkey") % 97 === 0).select("c_custkey")
      val dord = orders
        .join(broadcast(del), col("o_custkey") === col("c_custkey"), "left_semi")
        .select("o_orderkey")
      val dlin = lineitem
        .join(dord, col("l_orderkey") === col("o_orderkey"), "left_semi")
        .select("l_orderkey", "l_linenumber")
      def leg(tbl: String, deleted: DataFrame, fold: Column, total: DataFrame): DataFrame =
        deleted.agg(count(lit(1)).cast("long").as("n_deleted"),
            coalesce(sum(fold), lit(0L)).cast("long").as("key_fold"))
          .crossJoin(total.agg(count(lit(1)).as("n_total")))
          .select(lit(tbl).as("tbl"), col("n_deleted"),
            (col("n_total") - col("n_deleted")).cast("long").as("n_kept"), col("key_fold"))
      leg("customer", del, col("c_custkey") % 1000003L, customer)
        .unionAll(leg("lineitem", dlin,
          col("l_orderkey") * 7L % 1000003L + col("l_linenumber"), lineitem))
        .unionAll(leg("orders", dord, col("o_orderkey") % 1000003L, orders))
        .orderBy("tbl")
    },

    sql(
      "u07_point_in_time",
      "point-in-time snapshot reconstruction — the time-travel read over u02's SCD2 history (u02 BUILDS the interval versions; this answers 'what did every key look like at T?', the query that reconstructs a training set as of a cutoff so retrains are reproducible): per user the single version whose [valid_from, valid_to) interval covers T = 2024-01-15, i.e. the half-open interval filter valid_from <= T < coalesce(valid_to, infinity) — no argmax needed because SCD2 intervals partition each key's timeline by construction. Values pass through untouched. Scale posture: one key-partitioned window builds the intervals (u02's shape) and the covering filter is a projection over it; on a stored SCD2 table this is a partition-prunable scan (valid_from <= T) with no window at all — the nightly-snapshot read path",
      """SELECT user_id, event_id AS version_id,
        |       CAST(ts AS TIMESTAMP) AS valid_from,
        |       CAST(valid_to AS TIMESTAMP) AS valid_to,
        |       value
        |FROM (SELECT user_id, event_id, ts,
        |             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
        |             value
        |      FROM events)
        |WHERE CAST(ts AS TIMESTAMP) <= TIMESTAMP '2024-01-15 00:00:00'
        |  AND (valid_to IS NULL OR CAST(valid_to AS TIMESTAMP) > TIMESTAMP '2024-01-15 00:00:00')
        |ORDER BY user_id, version_id""") { (s, dir) =>
      val at = lit("2024-01-15 00:00:00").cast("timestamp")
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
        .withColumn("valid_to", lead(col("ts"), 1).over(w))
        .filter(col("ts").cast("timestamp") <= at &&
          (col("valid_to").isNull || col("valid_to").cast("timestamp") > at))
        .select(col("user_id"), col("event_id").as("version_id"),
          col("ts").as("valid_from"), col("valid_to"), col("value"))
        .orderBy("user_id", "version_id")
    },

    sql(
      "u08_deletion_vectors",
      "deletion-vector merge-on-read — the lakehouse delete mechanic (Delta deletion vectors / Iceberg positional deletes) that u06's key-based anti-join deliberately is NOT: a delete commit writes only (file_id, position) pairs, and every subsequent read subtracts those POSITIONS from the immutable base files without rewriting a byte — the delete is O(deleted rows) instead of O(table), the difference between a 100 TB copy-on-write rewrite and a KB-sized tombstone file. Modeled faithfully: files are the l_orderkey%16 buckets, position is row_number over the file's (l_orderkey, l_linenumber) order (the physical row order both engines reproduce exactly), the DV holds positions of returned-early rows, and the READ path touches only (file_id, pos) — a left-anti join, never re-evaluating the delete predicate. Output is the per-file maintenance report (live rows, DV cardinality, live revenue) a compaction planner consumes to decide when accumulated DVs justify rewriting a file. Scale posture: the anti-join shuffles on (file_id, pos) but in production the DV side is file-local and TINY (positions, not rows) — per-file broadcast/bitmap-probe with zero shuffle of the base, exactly how the readers implement it; the report is one file-keyed aggregation with map-side partials",
      """WITH base AS (
        |  SELECT l_returnflag, l_shipdate, l_extendedprice, l_discount,
        |         CAST(l_orderkey % 16 AS INTEGER) AS file_id,
        |         CAST(row_number() OVER (PARTITION BY l_orderkey % 16
        |                                 ORDER BY l_orderkey, l_linenumber, l_extendedprice,
        |                                          l_discount, l_shipdate, l_returnflag) AS BIGINT) AS pos
        |  FROM lineitem),
        |dv AS (SELECT file_id, pos FROM base
        |       WHERE l_returnflag = 'R' AND l_shipdate < TIMESTAMP '1996-01-01'),
        |live AS (SELECT b.file_id, b.l_extendedprice, b.l_discount
        |         FROM base b ANTI JOIN dv d ON d.file_id = b.file_id AND d.pos = b.pos)
        |SELECT l.file_id, l.n_live, COALESCE(d.n_deleted, 0) AS n_deleted, l.live_revenue
        |FROM (SELECT file_id, CAST(count(*) AS BIGINT) AS n_live,
        |             floor(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) * 100 + 0.5) / 100 AS live_revenue
        |      FROM live GROUP BY file_id) l
        |LEFT JOIN (SELECT file_id, CAST(count(*) AS BIGINT) AS n_deleted
        |           FROM dv GROUP BY file_id) d USING (file_id)
        |ORDER BY file_id""") { (s, dir) =>
      // position order spans EVERY column the query reads: the fixture's
      // (l_orderkey, l_linenumber) is not unique, and rows tied on the full
      // list are interchangeable in both the predicate and the aggregate,
      // so either engine's tie placement yields the same live multiset.
      // The window exists only because the fixture must DERIVE positions;
      // stored files carry them physically, so at scale each frame is
      // bounded by one file's rows (~128 MB) and parallelism = file count
      val w = Window.partitionBy("file_id").orderBy(
        col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
        col("l_discount"), col("l_shipdate"), col("l_returnflag"))
      // base persists because three branches read it (DV build, anti-join
      // probe, and the anti-join's base side); in production it is the
      // immutable file scan, not a cache
      val base = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_shipdate"), col("l_extendedprice"), col("l_discount"))
        .withColumn("file_id", pmod(col("l_orderkey"), lit(16)).cast("int"))
        .withColumn("pos", row_number().over(w).cast("long"))
        .persist()
      // Materialization barrier (r18 optimization; the g02 lesson): the
      // anti-join probe stage and the two broadcast builds (dv, dvAgg)
      // submit concurrently, and an unfilled cache ran the 16-partition
      // window sort once PER LEG (measured executor 11.5-26 s on 7.5 s
      // cpu). One count fills it; the plan is unchanged (persist was
      // already here).
      base.count()
      val dv = base
        .filter(col("l_returnflag") === "R" &&
          col("l_shipdate") < expr("TIMESTAMP_NTZ '1996-01-01'"))
        .select(col("file_id").as("d_file"), col("pos").as("d_pos"))
      val live = base.join(dv,
          col("file_id") === col("d_file") && col("pos") === col("d_pos"), "left_anti")
        .groupBy("file_id")
        .agg(count(lit(1)).as("n_live"),
          dsum2(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("live_revenue"))
      val dvAgg = dv.groupBy(col("d_file").as("file_id"))
        .agg(count(lit(1)).as("n_deleted"))
      live.join(dvAgg, Seq("file_id"), "left")
        .select(col("file_id"), col("n_live"),
          coalesce(col("n_deleted"), lit(0L)).as("n_deleted"), col("live_revenue"))
        .orderBy("file_id")
    },

    sql(
      "u02_scd2_versioning",
      "SCD type-2 interval versioning (corpus snapshot history): each per-key change event becomes a [valid_from, valid_to) row via lead() over the key's event-time order, open interval = current version — the dataset-versioning primitive behind point-in-time training-set reconstruction (q68's as-of join is the lookup side). Scale posture: one partitioned window per key (user_id), no global sort; values pass through untouched so no float divergence",
      """SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS valid_from,
        |       CAST(lead(ts) OVER w AS TIMESTAMP) AS valid_to,
        |       value, (lead(ts) OVER w IS NULL) AS is_current
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, valid_from, event_id""") { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
        .withColumn("valid_to", lead(col("ts"), 1).over(w))
        .select(col("user_id"), col("event_id"), col("ts").as("valid_from"),
          col("valid_to"), col("value"), col("valid_to").isNull.as("is_current"))
        .orderBy("user_id", "valid_from", "event_id")
    },

    sql(
      "u03_incremental_agg",
      "incremental aggregate maintenance (materialized-view refresh): the corpus splits into a frozen base and a new delta; per-group partial aggregates (count + exact decimal sum) are computed per slice and FOLDED, never recomputing the base — the result equals the full recompute (the oracle), which is the invariant that lets a 100 TB nightly refresh touch only the day's delta. Partials merge because count/sum are algebraic; avg derives from the folded partials",
      s"""SELECT o_orderstatus, count(*) AS n,
        |       ${s2("o_totalprice")} AS sum_price,
        |       ${a2("o_totalprice")} AS avg_price
        |FROM orders GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""") { (s, dir) =>
      val orders = Tables.orders(s, dir)
      val cutoff = lit("1997-01-01").cast("date")
      def partials(df: org.apache.spark.sql.DataFrame) =
        df.groupBy("o_orderstatus")
          .agg(count(lit(1)).as("pn"),
            sum(col("o_totalprice").cast("decimal(24,6)")).as("ps"))
      partials(orders.filter(col("o_orderdate").cast("date") < cutoff))
        .unionByName(partials(orders.filter(col("o_orderdate").cast("date") >= cutoff)))
        .groupBy("o_orderstatus")
        .agg(sum("pn").cast("long").as("n"), sum("ps").as("s"))
        .select(col("o_orderstatus"), col("n"),
          r2(col("s").cast("double")).as("sum_price"),
          r2(col("s").cast("double") / col("n")).as("avg_price"))
        .orderBy("o_orderstatus")
    },

    sql(
      "q78_salted_agg",
      "skew-mitigating two-phase salted aggregation behind the oracle gate: a random salt spreads each hot grouping key over 16 reducers (phase 1), a cheap 16-way second aggregation removes it (phase 2). The final result is salt-assignment-invariant — count/sum partials fold exactly — so the oracle is the plain aggregation; ScaleSpec separately asserts the two-exchange plan shape",
      s"""SELECT l_returnflag, count(*) AS n,
        |       ${s2("l_extendedprice")} AS sum_price
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""") { (s, dir) =>
      Skew.saltedAgg(Tables.lineitem(s, dir), Seq(col("l_returnflag")), salts = 16,
          phase1 = Seq(count(lit(1)).as("pn"),
            sum(col("l_extendedprice").cast("decimal(24,6)")).as("ps")),
          phase2 = Seq(sum("pn").cast("long").as("n"),
            r2(sum("ps").cast("double")).as("sum_price")))
        .orderBy("l_returnflag")
    },

    {
      // Morton interleave of two 10-bit coordinates, emitted once as a
      // Column tree and once as the literally-identical SQL — pure bit
      // arithmetic, so the oracle compare is exact by construction.
      val mortonSql = (0 until 10)
        .map(i => s"((x & ${1L << i}) << $i) | ((y & ${1L << i}) << ${i + 1})")
        .mkString(" | ")
      def mortonCol(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
        (0 until 10).map { i =>
          shiftleft(x.bitwiseAND(lit(1L << i)), i)
            .bitwiseOR(shiftleft(y.bitwiseAND(lit(1L << i)), i + 1))
        }.reduce(_ bitwiseOR _)
      sql(
        "q77_zorder_layout",
        "Z-order (Morton-curve) multi-dimensional layout clustering — the OPTIMIZE ZORDER primitive: interleave the bits of two join/filter dimensions, bucket rows by z-cell, and report each cell's bounding box. The tight per-cell min/max ranges ARE the footer stats a multi-dimensional 100 TB scan prunes by (a z-ordered file covers a small x×y rectangle; a linear sort covers a full stripe of one dimension). Scale posture: the morton key is codegen'd bit arithmetic, the layout pass is one keyed aggregation / repartitionByRange on the key — no global structure",
        s"""WITH xy AS (SELECT l_partkey % 1024 AS x, l_suppkey % 1024 AS y FROM lineitem),
          |m AS (SELECT x, y, ($mortonSql) AS morton FROM xy)
          |SELECT morton >> 10 AS zcell, count(*) AS n,
          |       min(x) AS x_min, max(x) AS x_max, min(y) AS y_min, max(y) AS y_max
          |FROM m GROUP BY zcell
          |ORDER BY zcell""") { (s, dir) =>
        Tables.lineitem(s, dir)
          .select((col("l_partkey") % 1024).as("x"), (col("l_suppkey") % 1024).as("y"))
          .withColumn("morton", mortonCol(col("x"), col("y")))
          .groupBy(shiftright(col("morton"), 10).as("zcell"))
          .agg(count(lit(1)).as("n"),
            min("x").as("x_min"), max("x").as("x_max"),
            min("y").as("y_min"), max("y").as("y_max"))
          .orderBy("zcell")
      }
    },

    sql(
      "q99_zone_maps",
      "zone-map / data-skipping planner report — the file-statistics pruning mechanic (parquet row-group min/max, Delta file stats, ORC stripe indexes) made explicit and testable: rows land in 16 equal key-width 'files' (file_id = key*16 div (max+1), the ingest-ordered range layout a sorted-write produces), each file carries its min/max zone stats for l_orderkey and l_shipdate, and two planner verdicts per file say whether it is skippable for (a) a key-band predicate [m/4, m/2) — which the range layout prunes perfectly, the q77 story in one dimension — and (b) a shipdate cutoff, which this layout prunes NOT AT ALL because shipdate is uncorrelated with the layout key: the report is exactly the evidence a table optimizer reads before deciding to re-cluster (q77's z-order) on the filtered column. All stats exact (integer keys, timestamp min/max, the band bounds data-derived integers — scale-independent). Scale posture: one scalar max (broadcast back), one file-keyed aggregation with map-side partials; output is file-count-sized; at 100 TB this IS the metadata-only planning scan — zone stats live in the footer/manifest and the fact table is never touched at plan time",
      """WITH mk AS (SELECT max(l_orderkey) + 1 AS m FROM lineitem),
        |f AS (SELECT CAST((l_orderkey * 16) // m AS INTEGER) AS file_id,
        |             l_orderkey, l_shipdate, m
        |      FROM lineitem CROSS JOIN mk),
        |z AS (SELECT file_id, CAST(count(*) AS BIGINT) AS n_rows,
        |             CAST(min(l_orderkey) AS BIGINT) AS min_key,
        |             CAST(max(l_orderkey) AS BIGINT) AS max_key,
        |             CAST(min(l_shipdate) AS TIMESTAMP) AS min_ship,
        |             CAST(max(l_shipdate) AS TIMESTAMP) AS max_ship,
        |             min(m) AS m
        |      FROM f GROUP BY file_id)
        |SELECT file_id, n_rows, min_key, max_key, min_ship, max_ship,
        |       (max_key < m // 4 OR min_key >= m // 2) AS skip_key,
        |       (max_ship < TIMESTAMP '1997-01-01') AS skip_date
        |FROM z ORDER BY file_id""") { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val mk = li.agg((max("l_orderkey") + 1).as("m"))
      li.crossJoin(broadcast(mk))
        .select(expr("cast((l_orderkey * 16) div m as int)").as("file_id"),
          col("l_orderkey"), col("l_shipdate"), col("m"))
        .groupBy("file_id")
        .agg(count(lit(1)).as("n_rows"),
          min("l_orderkey").as("min_key"), max("l_orderkey").as("max_key"),
          min("l_shipdate").as("min_ship"), max("l_shipdate").as("max_ship"),
          min("m").as("m"))
        .select(col("file_id"), col("n_rows"), col("min_key"), col("max_key"),
          col("min_ship"), col("max_ship"),
          (col("max_key") < expr("m div 4") || col("min_key") >= expr("m div 2"))
            .as("skip_key"),
          (col("max_ship") < expr("TIMESTAMP_NTZ '1997-01-01'")).as("skip_date"))
        .orderBy("file_id")
    },

    sql(
      "u09_compaction_plan",
      "sorted compaction planning — the OPTIMIZE step that consumes q99's zone-map report: the 16 key-range files bin into 4 contiguous compaction groups by exact integer prefix arithmetic (group = 4*rows_before div total — the sorted bin-packing that PRESERVES the range clustering, so the rewritten files keep prunable zone maps, unlike size-only FFD packing which interleaves key ranges and destroys them), and the plan reports each group's file count, row mass, the contiguous key span it will cover, and its row share in ppm against the ideal quarter. Everything is metadata-sized integers: the planner never reads data rows, only the per-file stats — exactly how table-maintenance services schedule rewrites. Scale posture: file stats are one keyed aggregation (the q99 scan); the prefix-sum window runs over FILE COUNT rows (~800k files at 100 TB — KB-scale state, one partition is correct and cheap because the frame is the manifest, not the data); the emitted plan is group-count-sized",
      """WITH mk AS (SELECT max(l_orderkey) + 1 AS m FROM lineitem),
        |f AS (SELECT CAST((l_orderkey * 16) // m AS INTEGER) AS file_id, l_orderkey
        |      FROM lineitem CROSS JOIN mk),
        |fs AS (SELECT file_id, CAST(count(*) AS BIGINT) AS n_rows,
        |              CAST(min(l_orderkey) AS BIGINT) AS min_key,
        |              CAST(max(l_orderkey) AS BIGINT) AS max_key
        |       FROM f GROUP BY file_id),
        |tot AS (SELECT CAST(sum(n_rows) AS BIGINT) AS total FROM fs),
        |planned AS (
        |  SELECT file_id, n_rows, min_key, max_key, total,
        |         CAST(COALESCE(sum(n_rows) OVER (ORDER BY file_id
        |                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 4 // total
        |              AS BIGINT) AS grp
        |  FROM fs CROSS JOIN tot)
        |SELECT grp, CAST(count(*) AS BIGINT) AS n_files,
        |       CAST(sum(n_rows) AS BIGINT) AS n_rows,
        |       min(min_key) AS min_key, max(max_key) AS max_key,
        |       CAST(CAST(sum(n_rows) AS HUGEINT) * 1000000 // min(total) AS BIGINT) AS rows_ppm
        |FROM planned GROUP BY grp ORDER BY grp""") { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val mk = li.agg((max("l_orderkey") + 1).as("m"))
      val fs = li.crossJoin(broadcast(mk))
        .groupBy(expr("cast((l_orderkey * 16) div m as int)").as("file_id"))
        .agg(count(lit(1)).as("n_rows"),
          min("l_orderkey").as("min_key"), max("l_orderkey").as("max_key"))
      val tot = fs.agg(sum("n_rows").as("total"))
      // the prefix window's frame is the FILE MANIFEST (16 rows here, file
      // count in production) — single-partition by design, metadata-sized
      val wPrefix = Window.orderBy("file_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      fs.crossJoin(broadcast(tot))
        .withColumn("before", coalesce(sum("n_rows").over(wPrefix), lit(0L)))
        .withColumn("grp", expr("before * 4 div total"))
        .groupBy("grp")
        .agg(count(lit(1)).as("n_files"), sum("n_rows").as("n_rows"),
          min("min_key").as("min_key"), max("max_key").as("max_key"),
          expr("cast(sum(n_rows) AS DECIMAL(38,0)) * 1000000 div min(total)").as("rows_ppm"))
        .orderBy("grp")
    },

    sql(
      "q86_column_profile",
      "single-pass column profiling of the orders table — the data-quality primitive every ingestion pipeline runs first: per column, exact null count and exact distinct cardinality, computed in ONE aggregation over the table (Spark's Expand handles the 6 simultaneous COUNT DISTINCTs; one pass over 100 TB, not six) and unpivoted to a row per column. All outputs are exact integers. At 100 TB the exact distincts would usually relax to approx_count_distinct — kept exact here because approximate sketches are engine-specific and this row must replay bit-exactly in the oracle (a06 carries the sketch variant)",
      """WITH s AS (SELECT count(*) AS nr,
        |  count(o_orderkey) AS c1, count(DISTINCT o_orderkey) AS d1,
        |  count(o_custkey) AS c2, count(DISTINCT o_custkey) AS d2,
        |  count(o_orderstatus) AS c3, count(DISTINCT o_orderstatus) AS d3,
        |  count(o_totalprice) AS c4, count(DISTINCT o_totalprice) AS d4,
        |  count(o_orderdate) AS c5, count(DISTINCT o_orderdate) AS d5,
        |  count(o_orderpriority) AS c6, count(DISTINCT o_orderpriority) AS d6
        |  FROM orders)
        |SELECT * FROM (
        |  SELECT 'o_orderkey' AS column_name, CAST(nr - c1 AS BIGINT) AS n_nulls, CAST(d1 AS BIGINT) AS n_distinct FROM s
        |  UNION ALL SELECT 'o_custkey', CAST(nr - c2 AS BIGINT), CAST(d2 AS BIGINT) FROM s
        |  UNION ALL SELECT 'o_orderstatus', CAST(nr - c3 AS BIGINT), CAST(d3 AS BIGINT) FROM s
        |  UNION ALL SELECT 'o_totalprice', CAST(nr - c4 AS BIGINT), CAST(d4 AS BIGINT) FROM s
        |  UNION ALL SELECT 'o_orderdate', CAST(nr - c5 AS BIGINT), CAST(d5 AS BIGINT) FROM s
        |  UNION ALL SELECT 'o_orderpriority', CAST(nr - c6 AS BIGINT), CAST(d6 AS BIGINT) FROM s)
        |ORDER BY column_name""") { (s, dir) =>
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      val aggs = count(lit(1)).as("nr") +:
        cols.zipWithIndex.flatMap { case (c, i) =>
          Seq(count(col(c)).as(s"c$i"), count_distinct(col(c)).as(s"d$i"))
        }
      val stackExpr = cols.zipWithIndex
        .map { case (c, i) => s"'$c', nr - c$i, d$i" }
        .mkString(s"stack(${cols.size}, ", ", ", ")")
      Tables.orders(s, dir)
        .agg(aggs.head, aggs.tail: _*)
        .select(expr(s"$stackExpr AS (column_name, n_nulls, n_distinct)"))
        .orderBy("column_name")
    },

    sql(
      "q08_market_share",
      "TPC-H Q8-shaped national market share: of all PROMO-part revenue sold to ASIA customers, the fraction supplied from EUROPE, per order year — the conditional-share-of-total pattern (CASE inside one sum, ratio of two exact-decimal sums). Scale posture: nation/region dims are fixed-cardinality broadcasts folded into supplier/customer before the fact joins; the fact shuffles once per join key and both sums come out of ONE aggregation, so the share costs no second pass",
      s"""WITH nr AS (SELECT n_nationkey, r_name FROM nation JOIN region ON n_regionkey = r_regionkey),
        |vol AS (
        |  SELECT CAST(year(o.o_orderdate) AS INT) AS order_year,
        |         ${sraw(s"CASE WHEN snr.r_name = 'EUROPE' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END")} AS eu_rev,
        |         ${sraw("l.l_extendedprice * (1 - l.l_discount)")} AS total_rev
        |  FROM lineitem l
        |  JOIN part p ON l.l_partkey = p.p_partkey
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nr cnr ON c.c_nationkey = cnr.n_nationkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN nr snr ON s.s_nationkey = snr.n_nationkey
        |  WHERE cnr.r_name = 'ASIA' AND p.p_type = 'PROMO'
        |  GROUP BY order_year)
        |SELECT order_year, floor((eu_rev / total_rev) * 1000000 + 0.5) / 1000000 AS mkt_share
        |FROM vol ORDER BY order_year""") { (s, dir) =>
      val nations = broadcast(Tables.nation(s, dir)
        .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("r_name")))
      val supDim = Tables.supplier(s, dir)
        .join(nations, col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("r_name").as("supp_region"))
      val asiaCust = Tables.customer(s, dir)
        .join(nations.filter(col("r_name") === "ASIA"),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"))
      Tables.lineitem(s, dir)
        .join(Tables.part(s, dir).filter(col("p_type") === "PROMO").select("p_partkey"),
          col("l_partkey") === col("p_partkey"))
        .join(Tables.orders(s, dir).select("o_orderkey", "o_custkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .join(asiaCust, col("o_custkey") === col("c_custkey"))
        .join(supDim, col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("o_orderdate")).as("order_year"))
        .agg(dsum(when(col("supp_region") === "EUROPE", revCol).otherwise(0)).as("eu_rev"),
          dsum(revCol).as("total_rev"))
        .select(col("order_year"), r6(col("eu_rev") / col("total_rev")).as("mkt_share"))
        .orderBy("order_year")
    },

    sql(
      "q11_important_parts",
      "TPC-H Q11-shaped important stock: parts whose lineitem revenue exceeds 1.5x the per-part average — the scalar-subquery-threshold HAVING pattern, with the threshold relative (avg of the same aggregation) so selectivity is scale-free. No partsupp table in this corpus, so part value = revenue (the Q11 shape — grouped value vs a global scalar — is what's exercised). Scale posture: one keyed aggregation over the fact plus a 1-row broadcast of the global scalar; the threshold join is free",
      s"""WITH pv AS (SELECT l_partkey, ${sraw(revExpr)} AS value
        |            FROM lineitem GROUP BY l_partkey)
        |SELECT l_partkey, floor(value * 100 + 0.5) / 100 AS part_value
        |FROM pv
        |WHERE value > 1.5 * (SELECT ${sraw(revExpr)} / count(DISTINCT l_partkey) FROM lineitem)
        |ORDER BY l_partkey""") { (s, dir) =>
      val pv = Tables.lineitem(s, dir)
        .groupBy("l_partkey").agg(dsum(revCol).as("value"))
      val thr = Tables.lineitem(s, dir)
        .agg((dsum(revCol) / countDistinct(col("l_partkey"))).as("avg_value"))
      pv.crossJoin(broadcast(thr))
        .filter(col("value") > lit(1.5) * col("avg_value"))
        .select(col("l_partkey"), r2(col("value")).as("part_value"))
        .orderBy("l_partkey")
    },

    sql(
      "q16_supplier_variety",
      "TPC-H Q16-shaped supplier variety: distinct supplier count per (brand, type, size) over a size whitelist, excluding low-balance suppliers via NOT IN — the distinct-count-after-anti-join pattern. Scale posture: the exclusion list is a broadcast anti-join before the part join; COUNT DISTINCT shuffles once on the 3-part group key (Spark plans the distinct as a partial-dedup Expand, no second fact pass)",
      """SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 2000)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""") { (s, dir) =>
      val excluded = Tables.supplier(s, dir)
        .filter(col("s_acctbal") < 2000).select(col("s_suppkey"))
      Tables.lineitem(s, dir)
        .join(broadcast(excluded), col("l_suppkey") === col("s_suppkey"), "left_anti")
        .join(Tables.part(s, dir).filter(col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(desc("supplier_cnt"), col("p_brand"), col("p_type"), col("p_size"))
    },

    sql(
      "q20_dominant_supplier",
      "TPC-H Q20-shaped nested-subquery selection: suppliers who shipped a MAJORITY (>50%) of some rod-part's 1998 volume — suppkey IN (grouped subquery with a correlated share threshold), planned as aggregation + partitioned window + semi-join, never a fact self-join. No partsupp table, so availability is replaced by shipped-quantity dominance (the nested-IN + relative-threshold shape is what's exercised). Scale posture: the date filter is a pushed parquet range predicate, the rod filter prunes parts before the fact join, per-part totals ride a window over the already-partkey-partitioned aggregate (no second shuffle), and the final semi-join keys the small supplier table",
      """SELECT s_suppkey, s_name FROM supplier WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM
        |    (SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty,
        |            sum(sum(l_quantity)) OVER (PARTITION BY l_partkey) AS tot
        |     FROM lineitem
        |     WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_shipdate < TIMESTAMP '1999-01-01'
        |       AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%rod%')
        |     GROUP BY l_partkey, l_suppkey)
        |  WHERE qty > 0.5 * tot)
        |ORDER BY s_suppkey""") { (s, dir) =>
      val rods = Tables.part(s, dir)
        .filter(col("p_name").like("%rod%")).select("p_partkey")
      val dominant = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= expr("TIMESTAMP_NTZ '1998-01-01'") &&
          col("l_shipdate") < expr("TIMESTAMP_NTZ '1999-01-01'"))
        .join(rods, col("l_partkey") === col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(sum("l_quantity").as("qty"))
        .withColumn("tot", sum("qty").over(Window.partitionBy("l_partkey")))
        .filter(col("qty") > lit(0.5) * col("tot"))
        .select(col("l_suppkey")).distinct()
      Tables.supplier(s, dir)
        .join(dominant, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    },

    sql(
      "q21_last_shipper",
      "TPC-H Q21-shaped waiting-supplier count: per supplier, lines in finalized multi-supplier orders where NO other supplier shipped later — correlated EXISTS (semi-join) + NOT EXISTS with an inequality residual (anti-join), the double-correlated-self-join pattern (l_shipdate stands in for the receipt/commit columns this corpus lacks). Scale posture: all three lineitem legs and the order filter shuffle on l_orderkey, so the semi and anti joins reuse one exchange layout; at 100 TB the same answer is also computable in a single pass via per-order two-top shipdate window aggregates — the join form is kept because it is the shape under test",
      """SELECT s.s_name, count(*) AS numwait
        |FROM lineitem l1
        |JOIN supplier s ON l1.l_suppkey = s.s_suppkey
        |JOIN orders o ON l1.l_orderkey = o.o_orderkey
        |WHERE o.o_orderstatus = 'F'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > l1.l_shipdate)
        |GROUP BY s.s_name
        |ORDER BY numwait DESC, s_name""") { (s, dir) =>
      val li = Tables.lineitem(s, dir).select("l_orderkey", "l_suppkey", "l_shipdate")
      val l2 = li.select(col("l_orderkey").as("o2"), col("l_suppkey").as("s2"))
      val l3 = li.select(col("l_orderkey").as("o3"), col("l_suppkey").as("s3"),
        col("l_shipdate").as("d3"))
      li.join(Tables.orders(s, dir).filter(col("o_orderstatus") === "F").select("o_orderkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(l2, col("l_orderkey") === col("o2") && col("l_suppkey") =!= col("s2"),
          "left_semi")
        .join(l3, col("l_orderkey") === col("o3") && col("l_suppkey") =!= col("s3") &&
          col("d3") > col("l_shipdate"), "left_anti")
        .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name").agg(count(lit(1)).as("numwait"))
        .orderBy(desc("numwait"), col("s_name"))
    },

    sql(
      "q103_rfm_segments",
      "RFM customer segmentation (the recency/frequency/monetary quartile analysis every commerce warehouse runs): per customer — days since last order relative to the corpus max date, order count, and exact-cent lifetime monetary value (the Det.dsum DECIMAL posture times 100, so money is a BIGINT from the first aggregate on) — then ntile(4) quartile scores on each axis and a rule-based segment label (champions / new / at_risk_loyal / lost / core) over the (r,f,m) cell grid. Determinism contract: every windowed ordering carries a custkey tie-break so ntile's bucket assignment is a total order in both engines (both implement the standard larger-buckets-first ntile); recency is integer day arithmetic on DATE-cast timestamps (the q-family datediff convention); the label CASE compares only integers. Scale posture: the tiling windows are PARTITIONED BY market segment — quartiles-within-segment is both the more honest analysis (cross-segment spend isn't comparable) and the partition-parallel plan (no global sort; the per-segment dimension slice sorts within its own shuffle partition, the same shape as every partitioned window in the w-family); upstream is one orders->customer dim join and a custkey-keyed agg, downstream one coarse cell rollup",
      """WITH mx AS (SELECT max(CAST(o_orderdate AS DATE)) AS maxd FROM orders),
        |rfm AS (
        |  SELECT c.c_mktsegment AS segment, o.o_custkey AS custkey,
        |         CAST(date_diff('day', max(CAST(o.o_orderdate AS DATE)), max(mx.maxd)) AS BIGINT) AS r_days,
        |         CAST(count(*) AS BIGINT) AS f_orders,
        |         CAST(floor(sum(CAST(o.o_totalprice AS DECIMAL(24,6))) * 100) AS BIGINT) AS m_cents
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey CROSS JOIN mx
        |  GROUP BY c.c_mktsegment, o.o_custkey),
        |scored AS (
        |  SELECT segment, custkey, r_days, f_orders, m_cents,
        |         CAST(ntile(4) OVER (PARTITION BY segment ORDER BY r_days, custkey) AS BIGINT) AS r_tile,
        |         CAST(ntile(4) OVER (PARTITION BY segment ORDER BY f_orders DESC, custkey) AS BIGINT) AS f_tile,
        |         CAST(ntile(4) OVER (PARTITION BY segment ORDER BY m_cents DESC, custkey) AS BIGINT) AS m_tile
        |  FROM rfm)
        |SELECT segment, r_tile, f_tile, m_tile,
        |       CASE WHEN r_tile = 1 AND f_tile = 1 AND m_tile = 1 THEN 'champions'
        |            WHEN r_tile = 1 AND f_tile >= 3 THEN 'new'
        |            WHEN r_tile >= 3 AND f_tile = 1 THEN 'at_risk_loyal'
        |            WHEN r_tile = 4 AND f_tile = 4 THEN 'lost'
        |            ELSE 'core' END AS rfm_label,
        |       CAST(count(*) AS BIGINT) AS n_customers,
        |       CAST(sum(f_orders) AS BIGINT) AS n_orders,
        |       CAST(sum(m_cents) AS BIGINT) AS m_cents
        |FROM scored
        |GROUP BY segment, r_tile, f_tile, m_tile
        |ORDER BY segment, r_tile, f_tile, m_tile""") { (s, dir) =>
      val mx = Tables.orders(s, dir)
        .agg(max(col("o_orderdate").cast("date")).as("maxd"))
      val rfm = Tables.orders(s, dir)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .crossJoin(broadcast(mx))
        .groupBy(col("c_mktsegment").as("segment"), col("o_custkey").as("custkey"))
        .agg(
          max(col("o_orderdate").cast("date")).as("lastd"),
          max(col("maxd")).as("maxd"),
          count(lit(1)).cast("long").as("f_orders"),
          // floor on the exact decimal in BOTH dialects: DuckDB's
          // decimal→BIGINT cast rounds while Spark's truncates, so a
          // sub-cent corpus would diverge without the shared floor
          floor(sum(col("o_totalprice").cast("decimal(24,6)")) * 100).cast("long").as("m_cents"))
        .select(col("segment"), col("custkey"),
          datediff(col("maxd"), col("lastd")).cast("long").as("r_days"),
          col("f_orders"), col("m_cents"))
      def tile(order: Column*): Column =
        ntile(4).over(Window.partitionBy("segment").orderBy(order: _*)).cast("long")
      val scored = rfm
        .withColumn("r_tile", tile(col("r_days"), col("custkey")))
        .withColumn("f_tile", tile(desc("f_orders"), col("custkey")))
        .withColumn("m_tile", tile(desc("m_cents"), col("custkey")))
      scored
        .withColumn("rfm_label",
          when(col("r_tile") === 1 && col("f_tile") === 1 && col("m_tile") === 1, lit("champions"))
            .when(col("r_tile") === 1 && col("f_tile") >= 3, lit("new"))
            .when(col("r_tile") >= 3 && col("f_tile") === 1, lit("at_risk_loyal"))
            .when(col("r_tile") === 4 && col("f_tile") === 4, lit("lost"))
            .otherwise(lit("core")))
        .groupBy("segment", "r_tile", "f_tile", "m_tile", "rfm_label")
        .agg(count(lit(1)).cast("long").as("n_customers"),
          sum("f_orders").cast("long").as("n_orders"),
          sum("m_cents").cast("long").as("m_cents"))
        .select(col("segment"), col("r_tile"), col("f_tile"), col("m_tile"),
          col("rfm_label"), col("n_customers"), col("n_orders"), col("m_cents"))
        .orderBy("segment", "r_tile", "f_tile", "m_tile")
    },

    sql(
      "u10_wap_audit",
      "write-audit-publish gate (the Iceberg WAP / Delta-constraints commit protocol u01-u09 presuppose: a staged batch is NOT visible until a battery of integrity audits passes, and the publish decision is itself data): the staged batch is synthesized deterministically in both dialects (the t23/p02 discipline) — every 97th order key as the incoming delta, plus four planted violations that each trip exactly one audit (a duplicated primary key, an orphan o_custkey=-1 foreign key, a NULL o_orderdate, a negative o_totalprice). Five audits run against the stage: pk_duplicates (keys with >1 row), fk_orphans (anti-join to customer), null_orderdate, negative_price, and size_bound (batch must stay under 5% of the base table — the fat-finger/backfill-gone-wrong guard, exact integer cross-multiply n*20 > base so no ratio float). The report is one row per audit (violation count + pass bit) plus the publish row folding them: publish passes iff every audit does — the bit a commit service reads before swapping snapshot pointers. All counts exact integers. Scale posture: every audit is batch-sized except fk_orphans, which anti-joins the batch (broadcast — it is bounded by the 5%% gate itself) against the dimension; the base table contributes ONE count(*); the verdict fold is 5 rows. At 100 TB this is exactly why WAP works: audits cost O(batch), not O(table)",
      """WITH base AS (SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
        |              FROM orders WHERE o_orderkey % 97 = 0),
        |mo AS (SELECT min(o_orderkey) AS mk, min(o_custkey) AS mc FROM base),
        |staged AS (
        |  SELECT * FROM base
        |  UNION ALL SELECT mk, mc, 1.0, TIMESTAMP '2024-01-01 00:00:00' FROM mo
        |  UNION ALL SELECT -1, -1, 1.0, TIMESTAMP '2024-01-01 00:00:00' FROM mo
        |  UNION ALL SELECT -2, mc, 1.0, NULL FROM mo
        |  UNION ALL SELECT -3, mc, -1.0, TIMESTAMP '2024-01-01 00:00:00' FROM mo),
        |checks AS (
        |  SELECT 'pk_duplicates' AS check_name, CAST(count(*) AS BIGINT) AS n_violations
        |  FROM (SELECT o_orderkey FROM staged GROUP BY o_orderkey HAVING count(*) > 1)
        |  UNION ALL
        |  SELECT 'fk_orphans', CAST(count(*) AS BIGINT) FROM staged s
        |  WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = s.o_custkey)
        |  UNION ALL
        |  SELECT 'null_orderdate', CAST(count(*) AS BIGINT) FROM staged WHERE o_orderdate IS NULL
        |  UNION ALL
        |  SELECT 'negative_price', CAST(count(*) AS BIGINT) FROM staged WHERE o_totalprice < 0
        |  UNION ALL
        |  SELECT 'size_bound',
        |         CAST(CASE WHEN (SELECT count(*) FROM staged) * 20 > (SELECT count(*) FROM orders)
        |              THEN 1 ELSE 0 END AS BIGINT)),
        |rep AS (
        |  SELECT check_name, n_violations FROM checks
        |  UNION ALL
        |  SELECT 'publish', CAST(sum(n_violations) AS BIGINT) FROM checks)
        |SELECT check_name, n_violations,
        |       CAST(CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS BIGINT) AS passed
        |FROM rep ORDER BY check_name""") { (s, dir) =>
      val orders = Tables.orders(s, dir)
      val base = orders.filter(col("o_orderkey") % 97 === 0)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
      val mo = base.agg(min("o_orderkey").as("mk"), min("o_custkey").as("mc"))
      val ts0 = to_timestamp(lit("2024-01-01 00:00:00"))
      val staged = base
        .unionAll(mo.select(col("mk"), col("mc"), lit(1.0), ts0))
        .unionAll(mo.select(lit(-1L), lit(-1L), lit(1.0), ts0))
        .unionAll(mo.select(lit(-2L), col("mc"), lit(1.0), lit(null).cast("timestamp")))
        .unionAll(mo.select(lit(-3L), col("mc"), lit(-1.0), ts0))
        // staged is batch-sized (1/97th of orders + 4 planted rows) and
        // feeds all five audits; un-materialized, each audit re-ran the
        // base filter AND the four min-scalar subqueries — 50 orders scan
        // nodes in the audited before-plan, 22 s executor on 1.1 s cpu
        // (r18 optimization). In production WAP the staged batch is a
        // TABLE; the checkpoint just models that.
        .coalesce(1).localCheckpoint(true)
      def one(name: String, v: org.apache.spark.sql.DataFrame) =
        v.select(lit(name).as("check_name"), col("v").as("n_violations"))
      val pk = one("pk_duplicates", staged.groupBy("o_orderkey").count()
        .filter(col("count") > 1).agg(count(lit(1)).cast("long").as("v")))
      val fk = one("fk_orphans", staged.join(
          Tables.customer(s, dir).select(col("c_custkey")),
          staged("o_custkey") === col("c_custkey"), "left_anti")
        .agg(count(lit(1)).cast("long").as("v")))
      val nl = one("null_orderdate",
        staged.filter(col("o_orderdate").isNull).agg(count(lit(1)).cast("long").as("v")))
      val ng = one("negative_price",
        staged.filter(col("o_totalprice") < 0).agg(count(lit(1)).cast("long").as("v")))
      val sz = one("size_bound", staged.agg(count(lit(1)).as("ns"))
        .crossJoin(orders.agg(count(lit(1)).as("nb")))
        .select(when(col("ns") * 20 > col("nb"), 1L).otherwise(0L).as("v")))
      // the publish row folds the same five audit rows the report lists —
      // checkpointing the 5-row frame runs each audit once, not twice
      val checks = pk.unionAll(fk).unionAll(nl).unionAll(ng).unionAll(sz)
        .coalesce(1).localCheckpoint(true)
      checks
        .unionAll(checks.agg(sum("n_violations").cast("long").as("v"))
          .select(lit("publish").as("check_name"), col("v").as("n_violations")))
        .select(col("check_name"), col("n_violations"),
          when(col("n_violations") === 0, 1L).otherwise(0L).as("passed"))
        .orderBy("check_name")
    },

    sql(
      "q105_assoc_rules",
      "market-basket association-rule mining (A-priori shape): baskets are each order's DISTINCT brand set; directional rules a→b with integer-ppm support, confidence and lift, kept at support ≥ 2% of baskets. The Spark side never self-joins the basket table — baskets group once, and the 2-combinations explode MAP-SIDE from each order's sorted item array (flatten(transform(slice))), so pair generation costs zero extra shuffle beyond the basket groupBy; item supports and the basket count are broadcast back onto the pair aggregate. At 100 TB this is the textbook A-priori layout: one shuffle to form baskets, combinations local, dimension-sized (|items|²) rule table; the per-basket pair explode is B(B−1)/2, bounded here by the BRAND grain itself — TPC-H has exactly 25 brands, so a basket holds <= 25 items and emits <= 300 pairs at every scale factor (corpora without a dimension bound take the g12 edgeJaccard(basketCap=...) discipline instead) — the oracle keeps the classical self-join formulation to prove the combination kernel equivalent. All metrics are integer ppm via flooring division on non-negative operands (Spark div = DuckDB // there); lift_ppm = 1e6·n_ab·N / (n_a·n_b) is widened through DECIMAL(38,0) (HUGEINT in the oracle) before the flooring divide and cast back to BIGINT — enforced, not just documented, because Spark's non-ANSI BIGINT multiply wraps silently at the corpus sizes where n_ab·N overflows, while DuckDB errors (r13 hardening per ADVICE)",
      """WITH ob AS (SELECT DISTINCT l_orderkey AS o, p_brand AS b
        |            FROM lineitem JOIN part ON l_partkey = p_partkey),
        |n AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS n_orders FROM ob),
        |isup AS (SELECT b, CAST(count(*) AS BIGINT) AS n_b FROM ob GROUP BY b),
        |pairs AS (SELECT x.b AS pa, y.b AS pb, CAST(count(*) AS BIGINT) AS n_ab
        |          FROM ob x JOIN ob y ON x.o = y.o AND x.b < y.b GROUP BY x.b, y.b),
        |rules AS (
        |  SELECT pa AS antecedent, pb AS consequent, n_ab FROM pairs
        |  UNION ALL
        |  SELECT pb, pa, n_ab FROM pairs)
        |SELECT r.antecedent, r.consequent, r.n_ab AS n_both,
        |       ia.n_b AS n_ante, ic.n_b AS n_cons,
        |       (1000000 * r.n_ab) // n.n_orders AS support_ppm,
        |       (1000000 * r.n_ab) // ia.n_b AS confidence_ppm,
        |       CAST((CAST(1000000 AS HUGEINT) * r.n_ab * n.n_orders)
        |            // (CAST(ia.n_b AS HUGEINT) * ic.n_b) AS BIGINT) AS lift_ppm
        |FROM rules r JOIN isup ia ON ia.b = r.antecedent
        |             JOIN isup ic ON ic.b = r.consequent
        |             CROSS JOIN n
        |WHERE (1000000 * r.n_ab) // n.n_orders >= 20000
        |ORDER BY antecedent, consequent""") { (s, dir) =>
      val ob = Tables.lineitem(s, dir)
        .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("o"), col("p_brand").as("b"))
        .distinct()
      val baskets = ob.groupBy("o").agg(sort_array(collect_set(col("b"))).as("items"))
      val nOrders = baskets.agg(count(lit(1)).cast("long").as("n_orders"))
      val isup = ob.groupBy(col("b")).agg(count(lit(1)).cast("long").as("n_b"))
      // 2-combinations generated locally from each basket's sorted item
      // array: element i pairs with every later element (slice is 1-based,
      // transform's index 0-based, hence i + 2).
      val pairs = baskets
        .select(explode(expr(
          "flatten(transform(items, (x, i) -> " +
            "transform(slice(items, i + 2, size(items)), y -> struct(x AS pa, y AS pb))))"))
          .as("p"))
        .groupBy(col("p.pa").as("pa"), col("p.pb").as("pb"))
        .agg(count(lit(1)).cast("long").as("n_ab"))
      val rules = pairs.select(col("pa").as("antecedent"), col("pb").as("consequent"), col("n_ab"))
        .unionAll(pairs.select(col("pb").as("antecedent"), col("pa").as("consequent"), col("n_ab")))
      rules
        .join(broadcast(isup.withColumnRenamed("b", "antecedent").withColumnRenamed("n_b", "n_ante")), "antecedent")
        .join(broadcast(isup.withColumnRenamed("b", "consequent").withColumnRenamed("n_b", "n_cons")), "consequent")
        .crossJoin(broadcast(nOrders))
        .withColumn("support_ppm", expr("(1000000 * n_ab) div n_orders"))
        .filter(col("support_ppm") >= 20000)
        .select(col("antecedent"), col("consequent"), col("n_ab").as("n_both"),
          col("n_ante"), col("n_cons"), col("support_ppm"),
          expr("(1000000 * n_ab) div n_ante").as("confidence_ppm"),
          expr("(cast(1000000 AS DECIMAL(38,0)) * n_ab * n_orders) div (cast(n_ante AS DECIMAL(38,0)) * n_cons)")
            .cast("long").as("lift_ppm"))
        .orderBy("antecedent", "consequent")
    },

    sql(
      "u11_snapshot_expiry",
      "snapshot-expiry / orphan-file GC planning — the retention half of table maintenance beside u09's compaction half (Iceberg expire_snapshots / Delta VACUUM dry-run): the snapshot log is synthesized deterministically from the data (p02/u09 discipline) — one snapshot per o_orderdate month, each committing 4 data files (the month's orders sliced by o_orderkey % 4, so file row-masses are DATA-derived, not invented), each file later rewritten at removed_ym = ym + 2 + file_id % 3 (files outliving max_ym stay live). Retention keeps the trailing 5-month window; the plan lists every EXPIRED snapshot with its file count, written row mass, and — the actual GC decision — how many of its files are deletable because no RETAINED snapshot still references them (file referenced over [ym, removed_ym), retained window (max_ym−5, max_ym], so deletable ⇔ removed_ym ≤ max_ym−5). All integer month arithmetic; the month watermark comes from a broadcast 1-row max, NOT a global window — retention-by-watermark is how production services actually expire, and it keeps the plan off the global-window whitelist. Scale posture: one keyed aggregation over the data to size files, then pure manifest-sized arithmetic — the GC planner never re-reads data rows",
      """WITH mo AS (SELECT year(o_orderdate) * 12 + month(o_orderdate) AS ym,
        |                  CAST(o_orderkey % 4 AS BIGINT) AS k FROM orders),
        |mx AS (SELECT CAST(max(ym) AS BIGINT) AS max_ym FROM mo),
        |fs AS (SELECT CAST(ym AS BIGINT) AS ym, k, CAST(ym * 4 + k AS BIGINT) AS file_id,
        |              CAST(count(*) AS BIGINT) AS n_rows
        |       FROM mo GROUP BY ym, k),
        |fl AS (SELECT fs.ym, fs.file_id, fs.n_rows,
        |              fs.ym + 2 + fs.file_id % 3 AS removed_ym, max_ym
        |       FROM fs CROSS JOIN mx)
        |SELECT ym AS snap_ym, CAST(count(*) AS BIGINT) AS n_files,
        |       CAST(sum(n_rows) AS BIGINT) AS n_rows_written,
        |       CAST(sum(CASE WHEN removed_ym <= max_ym - 5 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_deletable_files,
        |       CAST(sum(CASE WHEN removed_ym <= max_ym - 5 THEN n_rows ELSE 0 END) AS BIGINT)
        |         AS n_rows_reclaimed
        |FROM fl WHERE ym <= max_ym - 5
        |GROUP BY ym ORDER BY ym""") { (s, dir) =>
      val mo = Tables.orders(s, dir)
        .select((year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).cast("long").as("ym"),
          (col("o_orderkey") % 4).cast("long").as("k"))
      val mx = mo.agg(max("ym").as("max_ym"))
      val fs = mo.groupBy("ym", "k")
        .agg(count(lit(1)).cast("long").as("n_rows"))
        .withColumn("file_id", (col("ym") * 4 + col("k")).cast("long"))
      fs.crossJoin(broadcast(mx))
        .withColumn("removed_ym", col("ym") + 2 + col("file_id") % 3)
        .filter(col("ym") <= col("max_ym") - 5)
        .groupBy(col("ym").as("snap_ym"))
        .agg(count(lit(1)).cast("long").as("n_files"),
          sum("n_rows").cast("long").as("n_rows_written"),
          sum(when(col("removed_ym") <= col("max_ym") - 5, 1L).otherwise(0L))
            .cast("long").as("n_deletable_files"),
          sum(when(col("removed_ym") <= col("max_ym") - 5, col("n_rows")).otherwise(0L))
            .cast("long").as("n_rows_reclaimed"))
        .orderBy("snap_ym")
    },

    sql(
      "u12_skipping_report",
      "data-skipping effectiveness audit — the report that tells a lakehouse operator whether q99's zone maps and u09's clustering actually pay: for a deterministic 4-predicate workload (orderkey ranges of varied width/offset, derived from max-key arithmetic), score each predicate against the 16-file zone-map manifest — files skipped (file max < lo or min > hi), rows the engine would still scan, rows that actually match, skip ratio and scan WASTE in ppm (rows scanned but discarded — the number that motivates re-clustering). Exactly what table-maintenance advisors compute before recommending an OPTIMIZE. Scale posture: the manifest pass is u09's single keyed aggregation; predicate × file scoring is a 4×16 broadcast nested loop over METADATA; the exact matched counts are one broadcast-predicate pass over the data (4-row broadcast, one scan for all predicates); flooring division on non-negative integers throughout",
      """WITH mk AS (SELECT CAST(max(l_orderkey) + 1 AS BIGINT) AS m FROM lineitem),
        |fs AS (SELECT CAST((l_orderkey * 16) // m AS BIGINT) AS file_id,
        |              CAST(count(*) AS BIGINT) AS n_rows,
        |              CAST(min(l_orderkey) AS BIGINT) AS min_key,
        |              CAST(max(l_orderkey) AS BIGINT) AS max_key
        |       FROM lineitem CROSS JOIN mk GROUP BY file_id),
        |preds AS (SELECT CAST(t.i AS BIGINT) AS pred_id,
        |                 (t.i * m) // 6 AS lo,
        |                 (t.i * m) // 6 + m // (2 * (t.i + 1)) AS hi
        |          FROM range(0, 4) t(i) CROSS JOIN mk),
        |pf AS (SELECT p.pred_id, p.lo, p.hi, f.n_rows,
        |              CASE WHEN f.max_key < p.lo OR f.min_key > p.hi THEN 1 ELSE 0 END AS skipped
        |       FROM preds p CROSS JOIN fs f),
        |scan AS (SELECT pred_id, lo, hi,
        |                CAST(count(*) AS BIGINT) AS n_files,
        |                CAST(sum(skipped) AS BIGINT) AS n_skipped,
        |                CAST(sum(CASE WHEN skipped = 0 THEN n_rows ELSE 0 END) AS BIGINT)
        |                  AS rows_scanned
        |         FROM pf GROUP BY pred_id, lo, hi),
        |mt AS (SELECT p.pred_id, CAST(count(*) AS BIGINT) AS rows_matched
        |       FROM preds p JOIN lineitem l ON l.l_orderkey BETWEEN p.lo AND p.hi
        |       GROUP BY p.pred_id)
        |SELECT s.pred_id, s.lo, s.hi, s.n_files, s.n_skipped, s.rows_scanned,
        |       coalesce(mt.rows_matched, 0) AS rows_matched,
        |       (s.n_skipped * 1000000) // s.n_files AS skip_ppm,
        |       ((s.rows_scanned - coalesce(mt.rows_matched, 0)) * 1000000)
        |         // greatest(s.rows_scanned, 1) AS waste_ppm
        |FROM scan s LEFT JOIN mt ON mt.pred_id = s.pred_id
        |ORDER BY s.pred_id""") { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val mk = li.agg((max("l_orderkey") + 1).cast("long").as("m"))
      val fs = li.crossJoin(broadcast(mk))
        .groupBy(expr("cast((l_orderkey * 16) div m as bigint)").as("file_id"))
        .agg(count(lit(1)).cast("long").as("n_rows"),
          min("l_orderkey").cast("long").as("min_key"),
          max("l_orderkey").cast("long").as("max_key"))
      val preds = s.range(0, 4).toDF("i").crossJoin(broadcast(mk))
        .select(col("i").as("pred_id"),
          expr("(i * m) div 6").as("lo"),
          expr("(i * m) div 6 + m div (2 * (i + 1))").as("hi"))
      val scan = preds.crossJoin(fs)
        .withColumn("skipped",
          when(col("max_key") < col("lo") || col("min_key") > col("hi"), 1L).otherwise(0L))
        .groupBy("pred_id", "lo", "hi")
        .agg(count(lit(1)).cast("long").as("n_files"),
          sum("skipped").cast("long").as("n_skipped"),
          sum(when(col("skipped") === 0, col("n_rows")).otherwise(0L))
            .cast("long").as("rows_scanned"))
      val mt = li.crossJoin(broadcast(preds))
        .filter(col("l_orderkey").between(col("lo"), col("hi")))
        .groupBy("pred_id").agg(count(lit(1)).cast("long").as("rows_matched"))
      scan.join(mt, Seq("pred_id"), "left")
        .withColumn("rows_matched", coalesce(col("rows_matched"), lit(0L)))
        .select(col("pred_id"), col("lo"), col("hi"), col("n_files"), col("n_skipped"),
          col("rows_scanned"), col("rows_matched"),
          expr("(n_skipped * 1000000) div n_files").as("skip_ppm"),
          expr("((rows_scanned - rows_matched) * 1000000) div greatest(rows_scanned, 1)")
            .as("waste_ppm"))
        .orderBy("pred_id")
    },

    sql(
      "q107_bom_rollup",
      "hierarchical (BOM-style) subtree rollup — the recursive-CTE surface Spark lacks natively: parts form a synthetic 10-ary hierarchy (parent = partkey div 10, the p02 synthesize-then-process discipline), and every INTERNAL node reports its subtree size and exact-decimal subtree retailprice — the bill-of-materials / org-chart rollup every warehouse ships as WITH RECURSIVE. The oracle IS a genuine recursive CTE (the registry's first — g03/g04 unroll bounded rounds instead); the Spark side computes the same transitive closure as 12 narrow digit-chain projections (anc → anc div 10 until 0; 12 rounds exhaust any partkey < 10^12, far past every fixture and documented as the 100 TB bound) unioned WITHOUT a shuffle — the only shuffle in the plan is the final rollup groupBy, because each closure level is a map-side projection of the part scan. Depth is the decimal digit count (length of the key's string form — identical in both engines for positive integers). Scale posture: closure is O(N × depth) 16 B rows feeding ONE keyed aggregation; no iteration-over-shuffles, no driver-side recursion",
      """WITH RECURSIVE anc AS (
        |  SELECT p_partkey AS node, CAST(p_partkey AS BIGINT) AS anc FROM part
        |  UNION ALL
        |  SELECT node, anc // 10 FROM anc WHERE anc // 10 >= 1),
        |roll AS (
        |  SELECT a.anc, CAST(count(*) AS BIGINT) AS n_desc,
        |         floor((CAST(sum(CAST(p.p_retailprice AS DECIMAL(24,6))) AS DOUBLE)) * 100 + 0.5) / 100
        |           AS subtree_price
        |  FROM anc a JOIN part p ON p.p_partkey = a.node
        |  GROUP BY a.anc)
        |SELECT r.anc AS node, CAST(length(CAST(r.anc AS VARCHAR)) AS BIGINT) AS depth,
        |       r.n_desc, r.subtree_price
        |FROM roll r JOIN part x ON x.p_partkey = r.anc
        |WHERE r.n_desc > 1
        |ORDER BY node""") { (s, dir) =>
      val part = Tables.part(s, dir)
        .select(col("p_partkey").cast("long").as("node"), col("p_retailprice"))
      var level = part.select(col("node"), col("node").as("anc"))
      var closure = level
      for (_ <- 1 to 12) {
        level = level.filter(expr("anc div 10") >= 1)
          .select(col("node"), expr("anc div 10").as("anc"))
        closure = closure.unionAll(level)
      }
      closure.join(part, "node")
        .groupBy("anc")
        .agg(count(lit(1)).cast("long").as("n_desc"),
          dsum2(col("p_retailprice")).as("subtree_price"))
        .join(part.select(col("node").as("anc")), Seq("anc"), "left_semi")
        .filter(col("n_desc") > 1)
        .select(col("anc").as("node"),
          length(col("anc").cast("string")).cast("long").as("depth"),
          col("n_desc"), col("subtree_price"))
        .orderBy("node")
    },

    sql(
      "q108_growth_periods",
      "period-over-period revenue comparison (MoM / YoY growth per order priority) — the BI dashboard primitive beside q101's OLS trend: monthly revenue lands on exact integer cents (floor(price·100 + 0.5) snap, order-independent BIGINT sum), and each month LEFT-joins its CALENDAR predecessor (ym − 1) and year-ago month (ym − 12) — calendar-correct where lag() would silently skip missing months — leaving honest NULLs when no comparison period exists. Growth is (cur − prev)/prev as ONE sign-safe IEEE division on the exact cent deltas, rounded 4dp by the shared Det formula (q100's pattern: an integer div would diverge trunc-vs-floor on every DOWN month, and this fixture has plenty). Scale posture: one keyed aggregation to month grain, then self-joins on a dimension-sized (priority × month) frame — the data is touched once",
      """WITH m AS (SELECT o_orderpriority AS priority,
        |                  year(o_orderdate) * 12 + month(o_orderdate) AS ym,
        |                  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |                    AS rev_cents
        |           FROM orders GROUP BY 1, 2)
        |SELECT c.priority AS priority, CAST(c.ym AS BIGINT) AS ym, c.rev_cents AS rev_cents,
        |       floor((CAST(c.rev_cents - p.rev_cents AS DOUBLE) / p.rev_cents) * 10000 + 0.5)
        |         / 10000 AS mom_growth,
        |       floor((CAST(c.rev_cents - y.rev_cents AS DOUBLE) / y.rev_cents) * 10000 + 0.5)
        |         / 10000 AS yoy_growth
        |FROM m c LEFT JOIN m p ON p.priority = c.priority AND p.ym = c.ym - 1
        |         LEFT JOIN m y ON y.priority = c.priority AND y.ym = c.ym - 12
        |ORDER BY c.priority, c.ym""") { (s, dir) =>
      val m = Tables.orders(s, dir)
        .groupBy(col("o_orderpriority").as("priority"),
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).cast("long").as("ym"))
        .agg(sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
          .cast("long").as("rev_cents"))
      def growth(cur: Column, prev: Column): Column =
        floor((cur - prev).cast("double") / prev * 10000 + lit(0.5)) / 10000
      m.as("c")
        .join(m.select(col("priority"), col("ym"), col("rev_cents").as("prev_m")).as("p"),
          col("p.priority") === col("c.priority") && col("p.ym") === col("c.ym") - 1, "left")
        .join(m.select(col("priority"), col("ym"), col("rev_cents").as("prev_y")).as("y"),
          col("y.priority") === col("c.priority") && col("y.ym") === col("c.ym") - 12, "left")
        .select(col("c.priority").as("priority"), col("c.ym").as("ym"),
          col("c.rev_cents").as("rev_cents"),
          growth(col("c.rev_cents"), col("prev_m")).as("mom_growth"),
          growth(col("c.rev_cents"), col("prev_y")).as("yoy_growth"))
        .orderBy("priority", "ym")
    },

    sql(
      "q109_abc_analysis",
      "ABC / Pareto inventory classification per brand — the 80/20 revenue-concentration report every supply-chain dashboard carries: each brand's parts rank by exact-cent discounted revenue (floor(price·(1−disc)·100 + 0.5) per row — one IEEE expression, then order-independent BIGINT sums), the running share assigns class A ≤ 70% / B ≤ 90% / C by the EXACT INTEGER cross-multiplication cum·100 ≤ tot·k (no division ever happens at a class boundary — the q85 trick), and the report rolls up per (brand, class) with integer-ppm revenue share. Ranking ties break on partkey, so the classification is a total order in both engines. Scale posture: one fact-scan aggregation to (brand, part) grain, then brand-PARTITIONED windows over a dimension-sized frame (no global sort) and a keyed rollup — the q103 window discipline",
      """WITH pr AS (SELECT p.p_brand AS brand, l.l_partkey AS pk,
        |                   CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
        |                                 AS BIGINT)) AS BIGINT) AS rev_cents
        |            FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |            GROUP BY 1, 2),
        |w AS (SELECT brand, pk, rev_cents,
        |             CAST(sum(rev_cents) OVER (PARTITION BY brand ORDER BY rev_cents DESC, pk
        |                                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents,
        |             CAST(sum(rev_cents) OVER (PARTITION BY brand) AS BIGINT) AS tot_cents
        |      FROM pr),
        |cl AS (SELECT brand, rev_cents,
        |              CASE WHEN cum_cents * 100 <= tot_cents * 70 THEN 'A'
        |                   WHEN cum_cents * 100 <= tot_cents * 90 THEN 'B'
        |                   ELSE 'C' END AS abc, tot_cents
        |       FROM w)
        |SELECT brand, abc, CAST(count(*) AS BIGINT) AS n_parts,
        |       CAST(sum(rev_cents) AS BIGINT) AS class_rev_cents,
        |       CAST((sum(rev_cents) * 1000000) // min(tot_cents) AS BIGINT) AS share_ppm
        |FROM cl GROUP BY brand, abc ORDER BY brand, abc""") { (s, dir) =>
      val pr = Tables.lineitem(s, dir)
        .join(Tables.part(s, dir), col("p_partkey") === col("l_partkey"))
        .groupBy(col("p_brand").as("brand"), col("l_partkey").as("pk"))
        .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100 + lit(0.5))
          .cast("long")).cast("long").as("rev_cents"))
      val wCum = Window.partitionBy("brand").orderBy(col("rev_cents").desc, col("pk"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wTot = Window.partitionBy("brand")
      pr.withColumn("cum_cents", sum("rev_cents").over(wCum).cast("long"))
        .withColumn("tot_cents", sum("rev_cents").over(wTot).cast("long"))
        .withColumn("abc",
          when(col("cum_cents") * 100 <= col("tot_cents") * 70, "A")
            .when(col("cum_cents") * 100 <= col("tot_cents") * 90, "B")
            .otherwise("C"))
        .groupBy("brand", "abc")
        .agg(count(lit(1)).cast("long").as("n_parts"),
          sum("rev_cents").cast("long").as("class_rev_cents"),
          expr("(sum(rev_cents) * 1000000) div min(tot_cents)").as("share_ppm"))
        .orderBy("brand", "abc")
    },

    sql(
      "u13_cdc_generate",
      "CDC changelog GENERATION — the inverse of u04's apply, closing the CDC loop (u05 classifies a snapshot pair, u04 applies a log; this derives the APPLYABLE log from the pair — what a CDF/outbox emitter actually publishes): u05's exact snapshot derivations (textually pinned; the round-trip spec makes the coupling load-bearing) diff by one full-outer key join, and every non-unchanged row becomes a change record — I for added (with the new value), U for changed (new value), D for removed (NULL value) — sequenced by the key itself, which is unique and monotone, so the log needs NO global row_number window to be totally ordered. The round-trip property is spec-enforced: compacting and applying this log onto the OLD snapshot via u04's max_by machinery reproduces the NEW snapshot row-for-row. Scale posture: ONE co-partitioned full-outer join (u05's shape) and a projection; the emitted log is delta-sized, not snapshot-sized",
      """WITH old AS (
        |  SELECT o_orderkey AS k, o_totalprice AS v FROM orders WHERE o_orderkey % 10 != 3),
        |new_ AS (
        |  SELECT o_orderkey AS k,
        |         CASE WHEN o_orderkey % 10 = 1 THEN o_totalprice + 100.00 ELSE o_totalprice END AS v
        |  FROM orders WHERE o_orderkey % 10 != 7),
        |log AS (
        |  SELECT coalesce(o.k, n.k) AS k,
        |         CASE WHEN o.k IS NULL THEN 'I'
        |              WHEN n.k IS NULL THEN 'D'
        |              WHEN o.v != n.v THEN 'U'
        |              ELSE '' END AS op,
        |         n.v AS new_v
        |  FROM old o FULL OUTER JOIN new_ n ON o.k = n.k)
        |SELECT CAST(k AS BIGINT) AS seq, CAST(k AS BIGINT) AS k, op,
        |       CASE WHEN op = 'D' THEN NULL ELSE new_v END AS new_v
        |FROM log WHERE op != ''
        |ORDER BY k""") { (s, dir) =>
      val orders = Tables.orders(s, dir)
      val old = orders.filter(col("o_orderkey") % 10 =!= 3)
        .select(col("o_orderkey").as("k"), col("o_totalprice").as("v"))
      val neu = orders.filter(col("o_orderkey") % 10 =!= 7)
        .select(col("o_orderkey").as("k"),
          when(col("o_orderkey") % 10 === 1, col("o_totalprice") + 100.00)
            .otherwise(col("o_totalprice")).as("v"))
      old.as("o").join(neu.as("n"), col("o.k") === col("n.k"), "full_outer")
        .select(coalesce(col("o.k"), col("n.k")).as("k0"),
          when(col("o.k").isNull, "I")
            .when(col("n.k").isNull, "D")
            .when(col("o.v") =!= col("n.v"), "U")
            .otherwise("").as("op"),
          col("n.v").as("nv"))
        .filter(col("op") =!= "")
        .select(col("k0").cast("long").as("seq"), col("k0").cast("long").as("k"), col("op"),
          when(col("op") === "D", lit(null).cast("double")).otherwise(col("nv")).as("new_v"))
        .orderBy("k")
    },

    sql(
      "q112_ship_latency",
      "order→ship fulfillment-latency profile per order priority — the operational SLA table (count, min, exact median, exact p90, max of l_shipdate − o_orderdate in integer micros) every fulfillment dashboard opens with, and the latency-percentile SHAPE q91's signup→purchase entry established, here on the trade fact tables: latencies are exact integer micros (epoch_us differences — negative values legal and kept, the synthetic corpus ships some lines before the order date and an honest profile shows that instead of clamping), ranks come from a priority-partitioned window ordered by the latency value (rank identity among ties is arbitrary but the VALUE at any sorted position is deterministic, so the percentile cells are engine-independent without a tie-break column), and the median/p90 positions use the exact integer formulas (n+1) div 2, n div 2 + 1, (9n+9) div 10 — flooring division on non-negative rank arithmetic, both median legs emitted so even-n medians need no float averaging. Scale posture: one orderkey-keyed join (bloom-reducible), one priority-partitioned sort window (5 partitions here, partition-parallel at any cardinality), one priority rollup — no global sort; at extreme per-priority cardinality the exact window swaps for a09's pre-aggregated value-domain crossing or the q38 sketch, both already in the registry",
      """WITH lat AS (SELECT o.o_orderpriority AS priority,
        |                   epoch_us(CAST(l.l_shipdate AS TIMESTAMP))
        |                   - epoch_us(CAST(o.o_orderdate AS TIMESTAMP)) AS us
        |            FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
        |rk AS (SELECT priority, us,
        |              CAST(row_number() OVER (PARTITION BY priority ORDER BY us) AS BIGINT) AS i,
        |              CAST(count(*) OVER (PARTITION BY priority) AS BIGINT) AS n
        |       FROM lat)
        |SELECT priority, max(n) AS n_lines,
        |       CAST(min(us) AS BIGINT) AS min_us,
        |       CAST(max(CASE WHEN i = (n + 1) // 2 THEN us END) AS BIGINT) AS median_lo_us,
        |       CAST(max(CASE WHEN i = n // 2 + 1 THEN us END) AS BIGINT) AS median_hi_us,
        |       CAST(max(CASE WHEN i = (9 * n + 9) // 10 THEN us END) AS BIGINT) AS p90_us,
        |       CAST(max(us) AS BIGINT) AS max_us
        |FROM rk GROUP BY priority
        |ORDER BY priority""") { (s, dir) =>
      val lat = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderpriority").as("priority"),
          (unix_micros(col("l_shipdate").cast("timestamp"))
            - unix_micros(col("o_orderdate").cast("timestamp"))).as("us"))
      val w = Window.partitionBy("priority").orderBy("us")
      val wn = Window.partitionBy("priority")
      lat
        .withColumn("i", row_number().over(w).cast("long"))
        .withColumn("n", count(lit(1)).over(wn).cast("long"))
        .groupBy("priority")
        .agg(max("n").as("n_lines"),
          min("us").cast("long").as("min_us"),
          max(when(expr("i = (n + 1) div 2"), col("us"))).cast("long").as("median_lo_us"),
          max(when(expr("i = n div 2 + 1"), col("us"))).cast("long").as("median_hi_us"),
          max(when(expr("i = (9 * n + 9) div 10"), col("us"))).cast("long").as("p90_us"),
          max("us").cast("long").as("max_us"))
        .orderBy("priority")
    },

    sql(
      "u14_overlap_audit",
      "clustering-health file-overlap audit — the metric a re-clustering decision actually reads (u12 scores a WORKLOAD against one layout; this scores the LAYOUT itself: a file whose key range overlaps many siblings defeats min/max skipping for every predicate, and total overlap is what Delta/Iceberg clustering advisors track round over round): the same 16-file synthetic manifest built under two layouts — RANGE (u12's (key*16) div m file assignment: ranges provably disjoint, each file overlaps 0 siblings) and HASH (key % 16: every file spans nearly the whole key domain and overlaps all 15 siblings) — and per (layout, file) the row count, min/max key, and the count of sibling files whose [min,max] interval intersects (a.min <= b.max AND b.min <= a.max, the gaps-and-islands interval test from q80). The range rows reading 0 and the hash rows reading 15 IS the re-cluster evidence, stated as data. Scale posture: manifests are keyed aggregations (u09's shape); the overlap join is |files|² over METADATA rows — dimension-sized, never data-sized",
      """WITH mk AS (SELECT CAST(max(l_orderkey) + 1 AS BIGINT) AS m FROM lineitem),
        |fr AS (SELECT 'range' AS layout, CAST((l_orderkey * 16) // m AS BIGINT) AS file_id,
        |              CAST(count(*) AS BIGINT) AS n_rows,
        |              CAST(min(l_orderkey) AS BIGINT) AS min_key,
        |              CAST(max(l_orderkey) AS BIGINT) AS max_key
        |       FROM lineitem CROSS JOIN mk GROUP BY 2),
        |fh AS (SELECT 'hash' AS layout, CAST(l_orderkey % 16 AS BIGINT) AS file_id,
        |              CAST(count(*) AS BIGINT) AS n_rows,
        |              CAST(min(l_orderkey) AS BIGINT) AS min_key,
        |              CAST(max(l_orderkey) AS BIGINT) AS max_key
        |       FROM lineitem GROUP BY 2),
        |fs AS (SELECT * FROM fr UNION ALL SELECT * FROM fh),
        |ov AS (SELECT a.layout, a.file_id, CAST(count(*) AS BIGINT) AS n_overlaps
        |       FROM fs a JOIN fs b
        |         ON b.layout = a.layout AND b.file_id != a.file_id
        |        AND a.min_key <= b.max_key AND b.min_key <= a.max_key
        |       GROUP BY 1, 2)
        |SELECT f.layout, f.file_id, f.n_rows, f.min_key, f.max_key,
        |       COALESCE(ov.n_overlaps, 0) AS n_overlaps
        |FROM fs f LEFT JOIN ov ON ov.layout = f.layout AND ov.file_id = f.file_id
        |ORDER BY f.layout, f.file_id""") { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val mk = li.agg((max("l_orderkey") + 1).cast("long").as("m"))
      def manifest(layout: String, fileId: org.apache.spark.sql.Column) =
        li.crossJoin(broadcast(mk))
          .groupBy(fileId.as("file_id"))
          .agg(count(lit(1)).cast("long").as("n_rows"),
            min("l_orderkey").cast("long").as("min_key"),
            max("l_orderkey").cast("long").as("max_key"))
          .select(lit(layout).as("layout"), col("file_id"), col("n_rows"),
            col("min_key"), col("max_key"))
      val fs = manifest("range", expr("cast((l_orderkey * 16) div m as bigint)"))
        .unionAll(manifest("hash", expr("cast(l_orderkey % 16 as bigint)")))
        .persist()
      fs.count()
      val ov = fs.as("a")
        .join(fs.as("b"),
          col("b.layout") === col("a.layout") && col("b.file_id") =!= col("a.file_id") &&
            col("a.min_key") <= col("b.max_key") && col("b.min_key") <= col("a.max_key"))
        .groupBy(col("a.layout").as("layout"), col("a.file_id").as("file_id"))
        .agg(count(lit(1)).cast("long").as("n_overlaps"))
      val out = fs.join(ov, Seq("layout", "file_id"), "left")
        .select(col("layout"), col("file_id"), col("n_rows"), col("min_key"), col("max_key"),
          coalesce(col("n_overlaps"), lit(0L)).as("n_overlaps"))
        .orderBy("layout", "file_id")
        .persist()
      out.count()
      fs.unpersist(blocking = false)
      out
    },

    sql(
      "q115_invoice_reconciliation",
      "order-header vs line-detail money reconciliation audit (the financial-close data-quality check every warehouse runs nightly: does o_totalprice equal Σ extendedprice·(1−discount)·(1+tax) per order?): per priority class, counts of reconciled (|Δ| ≤ 1 cent), over- and under-stated headers, headers with NO detail rows (the referential-integrity leak, counted separately — a lineless order's Δ is its whole total and would poison the over bucket), net and max-abs drift in cents. Money determinism is the established cents-grid idiom: each LINE's three-factor product is one fixed-association IEEE chain floor'd to cents BEFORE summing (per-row integerization makes the per-order sum an order-independent BIGINT — summing doubles first would be shuffle-order-dependent), the header total floors once; every downstream comparison/rollup is exact integer arithmetic on (possibly negative) deltas with abs/sum only. On this synthetic corpus the generator does NOT enforce the TPC-H invariant, so the audit reports real drift — which is the production use: quantify, bucket, and bound the mismatch, don't assume it away. Scale posture: one orderkey-keyed partial-agg sum over lineitem (map-side combinable), one orderkey equi-join to headers, one dimension-sized priority rollup — no window, no skew surface beyond the natural orderkey hash",
      """WITH lc AS (SELECT l_orderkey,
        |                  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS line_cents
        |           FROM lineitem GROUP BY 1),
        |oc AS (SELECT o_orderkey, o_orderpriority,
        |              CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS total_cents
        |       FROM orders),
        |d AS (SELECT o.o_orderpriority AS priority,
        |             o.total_cents - COALESCE(l.line_cents, 0) AS delta,
        |             CASE WHEN l.l_orderkey IS NULL THEN 1 ELSE 0 END AS orphan
        |      FROM oc o LEFT JOIN lc l ON l.l_orderkey = o.o_orderkey)
        |SELECT priority, CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(sum(orphan) AS BIGINT) AS n_lineless,
        |       CAST(sum(CASE WHEN orphan = 0 AND abs(delta) <= 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_reconciled,
        |       CAST(sum(CASE WHEN orphan = 0 AND delta > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_over,
        |       CAST(sum(CASE WHEN orphan = 0 AND delta < -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_under,
        |       CAST(sum(delta) AS BIGINT) AS net_delta_cents,
        |       CAST(max(abs(delta)) AS BIGINT) AS max_abs_delta_cents
        |FROM d GROUP BY priority ORDER BY priority""") { (s, dir) =>
      val lc = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey").as("o_orderkey"))
        .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * (lit(1) + col("l_tax")) * 100 + lit(0.5)).cast("long")).cast("long").as("line_cents"))
      val d = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_orderpriority").as("priority"),
          floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("total_cents"))
        .join(lc, Seq("o_orderkey"), "left")
        .select(col("priority"),
          (col("total_cents") - coalesce(col("line_cents"), lit(0L))).as("delta"),
          when(col("line_cents").isNull, 1L).otherwise(0L).as("orphan"))
      d.groupBy("priority")
        .agg(count(lit(1)).cast("long").as("n_orders"),
          sum("orphan").cast("long").as("n_lineless"),
          sum(when(col("orphan") === 0 && abs(col("delta")) <= 1, 1L).otherwise(0L))
            .cast("long").as("n_reconciled"),
          sum(when(col("orphan") === 0 && col("delta") > 1, 1L).otherwise(0L))
            .cast("long").as("n_over"),
          sum(when(col("orphan") === 0 && col("delta") < -1, 1L).otherwise(0L))
            .cast("long").as("n_under"),
          sum("delta").cast("long").as("net_delta_cents"),
          max(abs(col("delta"))).cast("long").as("max_abs_delta_cents"))
        .orderBy("priority")
    },

    sql(
      "q116_scd2_intervals",
      "slowly-changing-dimension type-2 build, loader-grade — u02 versions EVERY raw event; this is the dim-loader's actual pipeline on top of that idea: grain compaction (last-write-wins within the load grain), NO-OP COLLAPSE (repeat values must not open spurious versions — the bug that bloats naive SCD2 dims), and dense version numbers (each attribute change opens a new validity interval and closes the prior one; point-in-time joins then hit exactly one version): the change stream is synthesized deterministically from the data (the p02/u09/u13 discipline) — per (custkey, order-month ym = year*12+month) the month's FINAL priority via max_by over the unique orderkey (last-write-wins per grain, the real loader semantic), no-op repeats collapsed by a lag-compare change flag, version numbers from a running sum of flags, intervals [valid_from, valid_to) closed by the NEXT version's open month via lead, the current row closed at the 999999 sentinel with is_current = 1 (all-integer, no NULL in the hash surface). All three windows partition by custkey — partition-parallel, never global. Scale posture: one (cust, ym)-keyed argmax aggregation over the corpus, then custkey-partitioned windows on the month-grain frame (orders-of-magnitude smaller than the fact table) — the standard MERGE-free SCD2 batch build; at 100 TB the dim build shuffles once on custkey and every window rides that partitioning",
      """WITH m AS (SELECT o_custkey AS c, CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS ym,
        |                  max_by(o_orderpriority, o_orderkey) AS val
        |           FROM orders GROUP BY 1, 2),
        |ch AS (SELECT c, ym, val,
        |              CASE WHEN lag(val) OVER (PARTITION BY c ORDER BY ym) IS NULL
        |                        OR lag(val) OVER (PARTITION BY c ORDER BY ym) != val THEN 1 ELSE 0 END AS chg
        |       FROM m),
        |ver AS (SELECT c, ym, val,
        |               CAST(sum(chg) OVER (PARTITION BY c ORDER BY ym
        |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS version
        |        FROM ch),
        |seg AS (SELECT c, version, val, min(ym) AS valid_from FROM ver GROUP BY 1, 2, 3),
        |iv AS (SELECT c, version, val, valid_from,
        |              coalesce(lead(valid_from) OVER (PARTITION BY c ORDER BY version), 999999) AS valid_to
        |       FROM seg)
        |SELECT c AS custkey, version, val AS segment_value, valid_from, valid_to,
        |       CAST(CASE WHEN valid_to = 999999 THEN 1 ELSE 0 END AS BIGINT) AS is_current
        |FROM iv ORDER BY custkey, version""") { (s, dir) =>
      val wOrd = Window.partitionBy("c").orderBy("ym")
      val wVer = Window.partitionBy("c").orderBy("version")
      val m = Tables.orders(s, dir)
        .select(col("o_custkey").as("c"),
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).cast("long").as("ym"),
          col("o_orderpriority").as("p"), col("o_orderkey").as("k"))
        .groupBy("c", "ym")
        .agg(expr("max_by(p, k)").as("val"))
      val ver = m
        .withColumn("chg",
          when(lag("val", 1).over(wOrd).isNull || lag("val", 1).over(wOrd) =!= col("val"), 1L)
            .otherwise(0L))
        .withColumn("version",
          sum("chg").over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("long"))
      ver.groupBy("c", "version", "val")
        .agg(min("ym").as("valid_from"))
        .withColumn("valid_to",
          coalesce(lead("valid_from", 1).over(wVer), lit(999999L)))
        .select(col("c").as("custkey"), col("version"), col("val").as("segment_value"),
          col("valid_from"), col("valid_to"),
          when(col("valid_to") === 999999L, 1L).otherwise(0L).cast("long").as("is_current"))
        .orderBy("custkey", "version")
    },

    sql(
      "q117_cohort_ltv",
      "cohort lifetime-value curve — the MONEY companion to q83's retention matrix (retention counts who comes back; LTV is what finance actually plans against: how much cumulative revenue a signup cohort has produced by month N, per member — the payback-period / CAC-ceiling table): customers cohort by first-order month (ym = year*12+month, the u11 grain), each (cohort, age-in-months) cell reports active customers, exact-cent revenue (per-ORDER floor-to-cents before any sum, the q115 idiom, so every rollup is an order-independent BIGINT), the running cumulative revenue, and cum div cohort_size per-member cents (flooring division on non-negative integers). The cumulative is a cohort-PARTITIONED running-sum window ordered by age — partition-parallel by construction, never global (the q113 concern does not arise: cohorts are the partition key). Scale posture: one custkey-keyed min (first order), one custkey equi-join back to the fact rows, one (cohort, age)-keyed rollup with map-side combine, windows over the |cohorts|x|ages| dimension frame — fact-table work is two keyed passes, everything after is dimension-sized",
      """WITH o AS (SELECT o_custkey AS c, CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS ym,
        |                  CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders),
        |f AS (SELECT c, min(ym) AS cym FROM o GROUP BY c),
        |sz AS (SELECT cym, CAST(count(*) AS BIGINT) AS cohort_size FROM f GROUP BY cym),
        |cell AS (SELECT f.cym, o.ym - f.cym AS age, CAST(count(DISTINCT o.c) AS BIGINT) AS n_active,
        |                CAST(sum(o.cents) AS BIGINT) AS rev
        |         FROM o JOIN f ON f.c = o.c GROUP BY 1, 2),
        |cum AS (SELECT cym, age, n_active, rev,
        |               CAST(sum(rev) OVER (PARTITION BY cym ORDER BY age
        |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_rev
        |        FROM cell)
        |SELECT cym AS cohort_ym, age AS age_months, s.cohort_size, n_active,
        |       rev AS revenue_cents, cum_rev AS cum_revenue_cents,
        |       CAST(cum_rev // s.cohort_size AS BIGINT) AS cum_per_user_cents
        |FROM cum JOIN sz s USING (cym) ORDER BY cohort_ym, age_months""") { (s, dir) =>
      val o = Tables.orders(s, dir)
        .select(col("o_custkey").as("c"),
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).cast("long").as("ym"),
          floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("cents"))
      val f = o.groupBy("c").agg(min("ym").as("cym"))
      val sz = f.groupBy("cym").agg(count(lit(1)).cast("long").as("cohort_size"))
      val w = Window.partitionBy("cym").orderBy("age")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      o.join(f, "c")
        .groupBy(col("cym"), (col("ym") - col("cym")).as("age"))
        .agg(countDistinct("c").cast("long").as("n_active"),
          sum("cents").cast("long").as("rev"))
        .withColumn("cum_rev", sum("rev").over(w).cast("long"))
        .join(sz, "cym")
        .select(col("cym").as("cohort_ym"), col("age").as("age_months"),
          col("cohort_size"), col("n_active"), col("rev").as("revenue_cents"),
          col("cum_rev").as("cum_revenue_cents"),
          expr("cum_rev div cohort_size").as("cum_per_user_cents"))
        .orderBy("cohort_ym", "age_months")
    },

    sql(
      "q118_hhi_concentration",
      "Herfindahl-Hirschman supplier-concentration index per (region, ship-year) — the antitrust-standard market-structure scalar beside a13's Gini (inequality of a distribution) and q114's top-decile share (tail mass): HHI = Σ share_i² rewards few-large-players structure specifically, which is why procurement-risk and market-power dashboards report it (10000-point scale convention; here exact ppm). Exactness: per-supplier revenue is the q115 cents-grid sum (per-ROW floor of extendedprice·(1−discount)·100 before any aggregation), then hhi_ppm = Σ cents_i² · 1e6 div (Σ cents)² with the squared sums HUGEINT/DECIMAL(38,0)-widened (cents² ~1e26 at the advertised scale), plus the top-1 share — zero floats anywhere. Scale posture: one (region, year, supplier)-keyed cents rollup over the fact table (map-side combinable; supplier→nation→region are broadcast dims), then a dimension-sized (region×year) fold — the corpus pass is the only data-scale work",
      """WITH rev AS (SELECT r.r_name AS region, CAST(year(l.l_shipdate) AS BIGINT) AS yr, s.s_suppkey,
        |                    CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
        |             FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |             JOIN nation n ON n.n_nationkey = s.s_nationkey
        |             JOIN region r ON r.r_regionkey = n.n_regionkey
        |             GROUP BY 1, 2, 3)
        |SELECT region, yr, CAST(count(*) AS BIGINT) AS n_suppliers,
        |       CAST(sum(cents) AS BIGINT) AS total_cents,
        |       CAST(sum(CAST(cents AS HUGEINT) * cents) * 1000000
        |            // (CAST(sum(cents) AS HUGEINT) * sum(cents)) AS BIGINT) AS hhi_ppm,
        |       CAST(CAST(max(cents) AS HUGEINT) * 1000000 // sum(cents) AS BIGINT) AS top_share_ppm
        |FROM rev GROUP BY region, yr ORDER BY region, yr""") { (s, dir) =>
      val rev = Tables.lineitem(s, dir)
        .join(broadcast(Tables.supplier(s, dir)), col("s_suppkey") === col("l_suppkey"))
        .join(broadcast(Tables.nation(s, dir)), col("n_nationkey") === col("s_nationkey"))
        .join(broadcast(Tables.region(s, dir)), col("r_regionkey") === col("n_regionkey"))
        .groupBy(col("r_name").as("region"), year(col("l_shipdate")).cast("long").as("yr"),
          col("s_suppkey"))
        .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100 + lit(0.5))
          .cast("long")).cast("long").as("cents"))
      rev.groupBy("region", "yr")
        .agg(count(lit(1)).cast("long").as("n_suppliers"),
          sum("cents").cast("long").as("total_cents"),
          sum(expr("cast(cents as decimal(38,0)) * cents")).as("sq"),
          max("cents").as("mx"))
        .select(col("region"), col("yr"), col("n_suppliers"), col("total_cents"),
          expr("(sq * 1000000) div (cast(total_cents as decimal(38,0)) * total_cents)")
            .cast("long").as("hhi_ppm"),
          expr("(cast(mx as decimal(38,0)) * 1000000) div total_cents")
            .cast("long").as("top_share_ppm"))
        .orderBy("region", "yr")
    },

    sql(
      "q119_apriori_triples",
      "A-priori level-3 frequent itemsets (r14 verdict #5 — the canonical frequent-itemset ITERATION q105 stops short of): frequent brand triples at minsup 4000 ppm, with candidate 3-itemsets generated from the LEVEL-2 frequent pairs and support-pruned between levels — the downward-closure step that makes A-priori A-priori (every (k−1)-subset of a frequent k-set is frequent, so triples touching an infrequent pair are never counted). One minsup across both levels (monotonicity breaks under mixed thresholds; q105's 2% pair threshold is a different entry's contract). The Spark side prunes BEFORE the counting shuffle: 3-combinations explode MAP-SIDE from each order's sorted brand array (the q105 kernel one level up — i<j<k via nested slice/transform, <= C(25,3) per basket bounded by the 25-brand dimension), then three BROADCAST semi-joins against the dimension-sized frequent-pair set drop non-candidate triples inside the scan stage, so the only shuffle carries surviving candidates; the oracle keeps the classical three-way self-join + pair joins to prove the kernel equivalent. Output carries the admitting pair supports (n_ab/n_ac/n_bc — the pruning evidence) beside the triple support; all metrics integer ppm via flooring division on non-negative operands. Scale posture: one basket shuffle + one candidate-keyed count, frequent pairs a broadcast (bounded by the item dimension, the A-priori contract); PipelineOpsSpec plants a pair-frequent-but-triple-infrequent basket set pinning the between-level prune",
      """WITH ob AS (SELECT DISTINCT l_orderkey AS o, p_brand AS b
        |            FROM lineitem JOIN part ON l_partkey = p_partkey),
        |n AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS n_orders FROM ob),
        |pairs AS (SELECT x.b AS pa, y.b AS pb, CAST(count(*) AS BIGINT) AS n_ab
        |          FROM ob x JOIN ob y ON x.o = y.o AND x.b < y.b GROUP BY 1, 2),
        |fp AS (SELECT pa, pb, n_ab FROM pairs, n WHERE (1000000 * n_ab) // n_orders >= 4000),
        |trip AS (SELECT x.b AS a, y.b AS b, z.b AS c, CAST(count(*) AS BIGINT) AS n_abc
        |         FROM ob x JOIN ob y ON x.o = y.o AND x.b < y.b
        |                   JOIN ob z ON y.o = z.o AND y.b < z.b
        |         GROUP BY 1, 2, 3)
        |SELECT t.a AS item_a, t.b AS item_b, t.c AS item_c,
        |       ab.n_ab, ac.n_ab AS n_ac, bc.n_ab AS n_bc, t.n_abc,
        |       (1000000 * t.n_abc) // n.n_orders AS support_ppm
        |FROM trip t
        |JOIN fp ab ON ab.pa = t.a AND ab.pb = t.b
        |JOIN fp ac ON ac.pa = t.a AND ac.pb = t.c
        |JOIN fp bc ON bc.pa = t.b AND bc.pb = t.c
        |CROSS JOIN n
        |WHERE (1000000 * t.n_abc) // n.n_orders >= 4000
        |ORDER BY item_a, item_b, item_c""") { (s, dir) =>
      val ob = Tables.lineitem(s, dir)
        .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("o"), col("p_brand").as("b"))
        .distinct()
      val baskets = ob.groupBy("o").agg(sort_array(collect_set(col("b"))).as("items"))
      val nOrders = baskets.agg(count(lit(1)).cast("long").as("n_orders"))
      val pairs = baskets
        .select(explode(expr(
          "flatten(transform(items, (x, i) -> " +
            "transform(slice(items, i + 2, size(items)), y -> struct(x AS pa, y AS pb))))"))
          .as("p"))
        .groupBy(col("p.pa").as("pa"), col("p.pb").as("pb"))
        .agg(count(lit(1)).cast("long").as("n_ab"))
      val fp = pairs.crossJoin(broadcast(nOrders))
        .filter(expr("(1000000 * n_ab) div n_orders >= 4000"))
        .select("pa", "pb", "n_ab")
      // 3-combinations i<j<k from the sorted basket: x at 0-based i, y at
      // j within the post-x slice (original i+1+j), z after y — slice is
      // 1-based, hence i+2 / i+j+3
      val trips = baskets
        .select(explode(expr(
          "flatten(flatten(transform(items, (x, i) -> " +
            "transform(slice(items, i + 2, size(items)), (y, j) -> " +
            "transform(slice(items, i + j + 3, size(items)), " +
            "z -> struct(x AS a, y AS b, z AS c))))))")).as("t"))
        .select(col("t.a").as("a"), col("t.b").as("b"), col("t.c").as("c"))
      // downward-closure prune BEFORE the counting shuffle: all three
      // member pairs must be level-2 frequent; the pair table is
      // dimension-bounded, so the joins broadcast and stay map-side
      val cand = trips
        .join(broadcast(fp.select(col("pa").as("a"), col("pb").as("b"), col("n_ab"))),
          Seq("a", "b"))
        .join(broadcast(fp.select(col("pa").as("a"), col("pb").as("c"), col("n_ab").as("n_ac"))),
          Seq("a", "c"))
        .join(broadcast(fp.select(col("pa").as("b"), col("pb").as("c"), col("n_ab").as("n_bc"))),
          Seq("b", "c"))
      cand.groupBy("a", "b", "c", "n_ab", "n_ac", "n_bc")
        .agg(count(lit(1)).cast("long").as("n_abc"))
        .crossJoin(broadcast(nOrders))
        .withColumn("support_ppm", expr("(1000000 * n_abc) div n_orders"))
        .filter(col("support_ppm") >= 4000)
        .select(col("a").as("item_a"), col("b").as("item_b"), col("c").as("item_c"),
          col("n_ab"), col("n_ac"), col("n_bc"), col("n_abc"), col("support_ppm"))
        .orderBy("item_a", "item_b", "item_c")
    },

    sql(
      "q120_fifo_matching",
      "FIFO lot matching (first-in-first-out inventory costing — the warehouse/accounting primitive every ERP closes the books with, and the classic hard case for set-oriented engines because the naive form is a per-part sequential scan): per part, receipt lots (non-returned lines) and issue demands (returned lines) each get cumulative-quantity intervals [lo, hi) in (shipdate, orderkey, linenumber) arrival order — two part-partitioned running sums — and the sequential matching becomes a declarative INTERVAL INTERSECTION: lot l satisfies issue s for greatest(0, least(l.hi, s.hi) - greatest(l.lo, s.lo)) units exactly when the intervals overlap, which replaces the row-at-a-time loop with one part-keyed join (the q70 range shape riding the equi-key). Allocated cost = matched_units * lot_cents div lot_qty (flooring per slice — allocation can under-report a lot's cents by at most lot_qty-1 sub-cent remainders, the documented grain). Per-part rollup: lots, issues, supply/demand units, matched units, FIFO cost cents, and the unmatched remainder on both sides (demand past supply AND stock left over). Output = every part with at least one issue (left join — shortage must be reported, not omitted). Scale posture: two part-partitioned windows + one part-keyed join; per-part candidate pairs are bounded because each issue interval overlaps a CONTIGUOUS lot run (matched pairs <= lots + issues per part, though the equi-join evaluates the rectangle — bounded by TPC-H's fixed lines-per-part contract, the g12 basket argument; for unbounded part histories the cumulative axis IS the secondary bucket key, and it is WIRED: fifoMatching(bucketUnits = W) explodes each interval to its <= q/W + 1 touched buckets, joins on (part, bucket), and keeps each pair exactly once in its intersection-start bucket — SkewSpec plants a 200-lot/200-issue long-history part and pins evaluated pairs collapsing rectangle -> strips with output bit-identical; default-off so this oracle replays the rectangle)",
      """WITH l AS (SELECT l_partkey AS part, l_returnflag AS f,
        |                  CAST(l_quantity AS BIGINT) AS q,
        |                  CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
        |                  l_shipdate, l_orderkey, l_linenumber
        |           FROM lineitem),
        |lots AS (SELECT part, q, cents,
        |                CAST(sum(q) OVER (PARTITION BY part ORDER BY l_shipdate, l_orderkey, l_linenumber
        |                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS hi
        |         FROM l WHERE f <> 'R'),
        |iss AS (SELECT part, q,
        |               CAST(sum(q) OVER (PARTITION BY part ORDER BY l_shipdate, l_orderkey, l_linenumber
        |                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS hi
        |        FROM l WHERE f = 'R'),
        |m AS (SELECT i.part,
        |             least(lo.hi, i.hi) - greatest(lo.hi - lo.q, i.hi - i.q) AS units,
        |             lo.cents, lo.q AS lot_q
        |      FROM iss i JOIN lots lo ON lo.part = i.part
        |                            AND lo.hi - lo.q < i.hi AND i.hi - i.q < lo.hi),
        |ml AS (SELECT part, CAST(sum(units) AS BIGINT) AS matched_units,
        |              CAST(sum(units * cents // lot_q) AS BIGINT) AS fifo_cost_cents
        |       FROM m GROUP BY part),
        |la AS (SELECT part, CAST(count(*) AS BIGINT) AS n_lots, CAST(sum(q) AS BIGINT) AS supply_units
        |       FROM lots GROUP BY part),
        |ia AS (SELECT part, CAST(count(*) AS BIGINT) AS n_issues, CAST(sum(q) AS BIGINT) AS demand_units
        |       FROM iss GROUP BY part)
        |SELECT ia.part, ia.n_issues, CAST(coalesce(la.n_lots, 0) AS BIGINT) AS n_lots,
        |       ia.demand_units, CAST(coalesce(la.supply_units, 0) AS BIGINT) AS supply_units,
        |       CAST(coalesce(ml.matched_units, 0) AS BIGINT) AS matched_units,
        |       CAST(coalesce(ml.fifo_cost_cents, 0) AS BIGINT) AS fifo_cost_cents,
        |       ia.demand_units - CAST(coalesce(ml.matched_units, 0) AS BIGINT) AS short_units,
        |       CAST(coalesce(la.supply_units, 0) - coalesce(ml.matched_units, 0) AS BIGINT) AS leftover_units
        |FROM ia LEFT JOIN la ON la.part = ia.part LEFT JOIN ml ON ml.part = ia.part
        |ORDER BY ia.part""") { (s, dir) => fifoMatching(s, dir) },

    sql(
      "q121_k_anonymity",
      "k-anonymity audit over a quasi-identifier projection (the data-governance gate beside t34's PII scrub — scrubbing direct identifiers is not enough: Sweeney's result is that (zip, birthdate, sex) re-identifies most of a population, so before a 'de-identified' extract ships, the release reviewer reads THIS table: the minimum equivalence-class size IS the dataset's k, and every class below the k=5 floor is a re-identification handle whose rows must be suppressed or coarsened): quasi-identifiers = (nation, account-balance band of 1000) — the band via floor(x/1000) on the DOUBLE (legitimately negative balances floor identically in both engines; integer div would not), per nation the class count, the sub-k class count, rows they hold (= the suppression cost of enforcing k), flooring-ppm suppression rate, and min class size. Exact integers after the one floor. Scale posture: one QI-keyed count (map-side combinable — QI cardinality is nation x ~11 bands) then a nation-keyed rollup; the audit is dimension-sized regardless of corpus size, which is why it can run on every release",
      """WITH q AS (SELECT c_nationkey AS nation,
        |                  CAST(floor(c_acctbal / 1000) AS BIGINT) AS band
        |           FROM customer),
        |cls AS (SELECT nation, band, CAST(count(*) AS BIGINT) AS sz
        |        FROM q GROUP BY nation, band)
        |SELECT CAST(nation AS BIGINT) AS nation,
        |       CAST(sum(sz) AS BIGINT) AS n_customers,
        |       CAST(count(*) AS BIGINT) AS n_classes,
        |       CAST(sum(CASE WHEN sz < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating_classes,
        |       CAST(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT) AS n_suppressed,
        |       CAST(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) * 1000000 // sum(sz) AS BIGINT) AS suppression_ppm,
        |       CAST(min(sz) AS BIGINT) AS k_anonymity
        |FROM cls GROUP BY nation ORDER BY nation""") { (s, dir) =>
      val cls = Tables.customer(s, dir)
        .select(col("c_nationkey").cast("long").as("nation"),
          floor(col("c_acctbal") / 1000).cast("long").as("band"))
        .groupBy("nation", "band").agg(count(lit(1)).cast("long").as("sz"))
      cls.groupBy("nation")
        .agg(sum("sz").cast("long").as("n_customers"),
          count(lit(1)).cast("long").as("n_classes"),
          sum(when(col("sz") < 5, 1L).otherwise(0L)).cast("long").as("n_violating_classes"),
          sum(when(col("sz") < 5, col("sz")).otherwise(0L)).cast("long").as("n_suppressed"),
          min("sz").cast("long").as("k_anonymity"))
        .select(col("nation"), col("n_customers"), col("n_classes"),
          col("n_violating_classes"), col("n_suppressed"),
          expr("(n_suppressed * 1000000) div n_customers").as("suppression_ppm"),
          col("k_anonymity"))
        .orderBy("nation")
    },

    sql(
      "q122_stock_aging",
      "stock-aging report over the FIFO ledger (the balance-sheet companion q120's matcher feeds — ERPs close the month with BOTH: FIFO costing says what consumed stock COST, aging says how stale the UNCONSUMED stock is, the slow-mover/write-down signal): q120's cumulative-quantity intervals give each lot's FIFO leftover in closed form WITHOUT the pair join — demand D consumes the first D units of supply, so lot [hi-q, hi) keeps exactly hi - min(hi, greatest(D, hi - q)) units (0 when fully consumed, q when untouched, the partial head split otherwise); leftover units age from the lot's shipdate against the CORPUS max shipdate (the report's as-of date, derived not configured), bucket into the standard 0-30/31-60/61-90/90+ ledger bands, and roll up with pro-rata value leftover * cents div q (q120's flooring grain). Output: the zero-filled 4-band grid (q83/q111 discipline — an empty band is a finding, not a missing row) with lot counts, units, and cents. Scale posture: the same two part-partitioned windows q120 pays + ONE part-keyed demand join (no interval pair join at all — the closed form needs only D) + a 4-key map-side rollup; the as-of scalar is a broadcast 1-row max",
      """WITH l AS (SELECT l_partkey AS part, l_returnflag AS f,
        |                  CAST(l_quantity AS BIGINT) AS q,
        |                  CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
        |                  l_shipdate, l_orderkey, l_linenumber
        |           FROM lineitem),
        |lots AS (SELECT part, q, cents, l_shipdate,
        |                CAST(sum(q) OVER (PARTITION BY part ORDER BY l_shipdate, l_orderkey, l_linenumber
        |                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS hi
        |         FROM l WHERE f <> 'R'),
        |dem AS (SELECT part, CAST(sum(q) AS BIGINT) AS d FROM l WHERE f = 'R' GROUP BY part),
        |aod AS (SELECT max(l_shipdate) AS mx FROM l),
        |lv AS (SELECT lo.part, lo.q, lo.cents, lo.hi,
        |              lo.hi - least(lo.hi, greatest(coalesce(dem.d, 0), lo.hi - lo.q)) AS leftover,
        |              CAST(date_diff('day', CAST(lo.l_shipdate AS DATE), CAST(aod.mx AS DATE)) AS BIGINT) AS age
        |       FROM lots lo LEFT JOIN dem ON dem.part = lo.part CROSS JOIN aod),
        |b AS (SELECT CASE WHEN age <= 30 THEN 0 WHEN age <= 60 THEN 1
        |                  WHEN age <= 90 THEN 2 ELSE 3 END AS age_bucket,
        |             leftover, CAST(leftover * cents // q AS BIGINT) AS val
        |      FROM lv WHERE leftover > 0),
        |agg AS (SELECT age_bucket, CAST(count(*) AS BIGINT) AS n_lots,
        |               CAST(sum(leftover) AS BIGINT) AS leftover_units,
        |               CAST(sum(val) AS BIGINT) AS leftover_cents
        |        FROM b GROUP BY age_bucket)
        |SELECT g.age_bucket, CAST(coalesce(agg.n_lots, 0) AS BIGINT) AS n_lots,
        |       CAST(coalesce(agg.leftover_units, 0) AS BIGINT) AS leftover_units,
        |       CAST(coalesce(agg.leftover_cents, 0) AS BIGINT) AS leftover_cents
        |FROM (SELECT CAST(range AS BIGINT) AS age_bucket FROM range(0, 4)) g
        |LEFT JOIN agg ON agg.age_bucket = g.age_bucket
        |ORDER BY g.age_bucket""") { (s, dir) =>
      import s.implicits._
      val (lots, iss) = fifoIntervals(s, dir)
      val dem = iss.groupBy("part").agg(sum("q").cast("long").as("d"))
      // the as-of date reads ALL lines (a return can be the newest event)
      val asof = Tables.lineitem(s, dir).agg(max("l_shipdate").as("mx"))
      val lv = lots.join(dem, Seq("part"), "left")
        .crossJoin(broadcast(asof))
        .select(col("part"), col("q"), col("cents"),
          (col("hi") - least(col("hi"),
            greatest(coalesce(col("d"), lit(0L)), col("hi") - col("q")))).as("leftover"),
          datediff(col("mx").cast("date"), col("l_shipdate").cast("date"))
            .cast("long").as("age"))
      val agg = lv.filter(col("leftover") > 0)
        .select(
          when(col("age") <= 30, 0L).when(col("age") <= 60, 1L)
            .when(col("age") <= 90, 2L).otherwise(3L).as("age_bucket"),
          col("leftover"), expr("(leftover * cents) div q").as("val"))
        .groupBy("age_bucket")
        .agg(count(lit(1)).cast("long").as("n_lots"),
          sum("leftover").cast("long").as("leftover_units"),
          sum("val").cast("long").as("leftover_cents"))
      Seq(0L, 1L, 2L, 3L).toDF("age_bucket")
        .join(agg, Seq("age_bucket"), "left")
        .na.fill(0L, Seq("n_lots", "leftover_units", "leftover_cents"))
        .select(col("age_bucket"), col("n_lots"), col("leftover_units"),
          col("leftover_cents"))
        .orderBy("age_bucket")
    }
  )

  /** q120's interval derivation: per part, receipt lots and issue demands
    * with cumulative-quantity upper bounds `hi` (intervals are [hi−q, hi))
    * in (shipdate, orderkey, linenumber) arrival order.
    */
  private def fifoIntervals(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val l = Tables.lineitem(s, dir)
      .select(col("l_partkey").as("part"), col("l_returnflag").as("f"),
        col("l_quantity").cast("long").as("q"),
        floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long").as("cents"),
        col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    val w = Window.partitionBy("part")
      .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lots = l.filter(col("f") =!= "R")
      .withColumn("hi", sum("q").over(w).cast("long"))
      .select(col("part"), col("q"), col("cents"), col("hi"), col("l_shipdate"))
    val iss = l.filter(col("f") === "R")
      .withColumn("hi", sum("q").over(w).cast("long"))
      .select(col("part"), col("q"), col("hi"))
    (lots, iss)
  }

  /** The lot × issue intersection join, in both plan shapes. `bucketUnits
    * <= 0` (default — the oracle replays this) is the plain part-keyed
    * equi-join, which evaluates each part's full lots × issues rectangle
    * (bounded at every TPC-H SF by the fixed lines-per-part contract, the
    * g12 argument). `bucketUnits = W > 0` is the q70 bucket discipline on
    * the CUMULATIVE-UNITS axis — the "secondary bucket key" the r15
    * verdict asked to wire: each interval [hi−q, hi) explodes to the
    * buckets it touches (⌈q/W⌉+1 ≤ 2 at TPC-H quantities with W ≥ 64, and
    * q/W-proportional generally — the fan-out is interval-width-bounded,
    * never history-bounded), the join runs on (part, bucket), and each
    * overlapping pair is kept exactly once, in the bucket holding its
    * intersection START (both intervals cover it by definition), so the
    * per-part rectangle becomes per-strip products. Zero-width intervals
    * (q = 0, impossible under TPC-H's q ≥ 1) match nothing in either
    * shape — the rectangle gives them units = 0, the bucket path drops
    * them pre-join; aggregates agree (SkewSpec pins output equality).
    */
  private def fifoPairs(lots: DataFrame, iss: DataFrame, bucketUnits: Long): DataFrame = {
    val overlap = col("lo.hi") - col("lo.q") < col("i.hi") &&
      col("i.hi") - col("i.q") < col("lo.hi")
    if (bucketUnits <= 0)
      iss.as("i").join(lots.as("lo"), col("lo.part") === col("i.part") && overlap)
    else {
      def banded(df: DataFrame) = df.filter(col("q") > 0)
        .withColumn("bkt",
          explode(expr(s"sequence((hi - q) div $bucketUnits, (hi - 1) div $bucketUnits)")))
      banded(iss).as("i").join(banded(lots).as("lo").hint("shuffle_hash"),
        col("lo.part") === col("i.part") && col("lo.bkt") === col("i.bkt") && overlap
          && expr(s"greatest(lo.hi - lo.q, i.hi - i.q) div $bucketUnits") === col("i.bkt"))
    }
  }

  /** Evaluated-pair volume — the quantity the bucket key bounds. An
    * equi-join evaluates each key group's cross product, so the rectangle
    * form tests Σ_part (lots × issues) pairs while the bucketed form tests
    * Σ_(part, bkt) strip products; this computes those counts WITHOUT
    * running the join (exposed for SkewSpec's planted long-history
    * collapse measurement, the wedgeCandidates pattern).
    */
  private[graft] def fifoEvaluatedPairs(s: SparkSession, dir: String,
      bucketUnits: Long = 0): Long = {
    val (lots, iss) = fifoIntervals(s, dir)
    val keys: DataFrame => DataFrame =
      if (bucketUnits <= 0) df => df.select("part")
      else df => df.filter(col("q") > 0).select(col("part"),
        explode(expr(s"sequence((hi - q) div $bucketUnits, (hi - 1) div $bucketUnits)")).as("bkt"))
    val keyCols = if (bucketUnits <= 0) Seq("part") else Seq("part", "bkt")
    val lk = keys(lots).groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("nl"))
    val ik = keys(iss).groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("ni"))
    lk.join(ik, keyCols)
      .agg(coalesce(sum(col("nl") * col("ni")), lit(0L)).cast("long"))
      .head().getLong(0)
  }

  /** q120's body — see the registry doc; [[fifoPairs]] documents the
    * `bucketUnits` knob (default-off rectangle; the oracle replays it).
    */
  private[graft] def fifoMatching(s: SparkSession, dir: String,
      bucketUnits: Long = 0): DataFrame = {
    val (lots, iss) = fifoIntervals(s, dir)
    val m = fifoPairs(lots, iss, bucketUnits)
      .select(col("i.part").as("part"),
        (least(col("lo.hi"), col("i.hi"))
          - greatest(col("lo.hi") - col("lo.q"), col("i.hi") - col("i.q"))).as("units"),
        col("lo.cents").as("cents"), col("lo.q").as("lot_q"))
      .groupBy("part")
      .agg(sum("units").cast("long").as("matched_units"),
        sum(expr("(units * cents) div lot_q")).cast("long").as("fifo_cost_cents"))
    val la = lots.groupBy("part")
      .agg(count(lit(1)).cast("long").as("n_lots"), sum("q").cast("long").as("supply_units"))
    val ia = iss.groupBy("part")
      .agg(count(lit(1)).cast("long").as("n_issues"), sum("q").cast("long").as("demand_units"))
    ia.join(la, Seq("part"), "left").join(m, Seq("part"), "left")
      .na.fill(0L, Seq("n_lots", "supply_units", "matched_units", "fifo_cost_cents"))
      .select(col("part"), col("n_issues"), col("n_lots"), col("demand_units"),
        col("supply_units"), col("matched_units"), col("fifo_cost_cents"),
        (col("demand_units") - col("matched_units")).as("short_units"),
        (col("supply_units") - col("matched_units")).as("leftover_units"))
      .orderBy("part")
  }
}
