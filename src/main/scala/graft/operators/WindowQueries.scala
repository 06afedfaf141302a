package graft.operators

import graft.GraftQuery
import graft.GraftQuery.{rowsOnly, sql}
import graft.sources.Tables
import graft.operators.Det._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window/analytic functions, grouping sets, and set operations —
  * SURVEY.md §2.6 gap-fill ("no window functions, no set operations" in the
  * reference).
  *
  * Scale posture: every window here is partitioned by a high-cardinality key
  * (custkey), so state is distributed; the one global window (ntile over all
  * orders) is documented as a single-ordered operation — at 100 TB the same
  * question is answered with approx_percentile instead (see q33 doc).
  *
  * Running sums inside window frames accumulate in frame order, which both
  * engines share — but we still sum decimals, so frame evaluation strategy
  * (DuckDB segment trees vs Spark streaming frames) cannot shift a cent.
  */
object WindowQueries {

  val all: Seq[GraftQuery] = Seq(
    sql(
      "q30_topk_per_group",
      "row_number window: top-3 orders per customer, unique tie-break",
      """SELECT c_custkey, o_orderkey, rnk,
        |       floor((o_totalprice) * 100 + 0.5) / 100 AS o_totalprice
        |FROM (SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
        |             row_number() OVER (PARTITION BY o_custkey
        |                                ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |      FROM orders)
        |WHERE rnk <= 3
        |ORDER BY c_custkey, rnk""") { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey")).orderBy(desc("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 3)
        .select(col("o_custkey").as("c_custkey"), col("o_orderkey"), col("rnk"),
          r2(col("o_totalprice")).as("o_totalprice"))
        .orderBy("c_custkey", "rnk")
    },

    sql(
      "q31_running_total",
      "cumulative window frame: running spend per customer over order time",
      """SELECT o_custkey, o_orderkey,
        |       floor((CAST(sum(CAST(o_totalprice AS DECIMAL(24,6)))
        |                   OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)) * 100 + 0.5) / 100
        |         AS running_spend
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""") { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, dir)
        .withColumn("running_spend",
          r2(sum(col("o_totalprice").cast("decimal(24,6)")).over(w).cast("double")))
        .select("o_custkey", "o_orderkey", "running_spend")
        .orderBy("o_custkey", "o_orderkey")
    },

    sql(
      "q32_order_gaps",
      "lag window: days between consecutive orders per customer",
      """SELECT o_custkey, o_orderkey,
        |       date_diff('day',
        |         CAST(lag(o_orderdate) OVER (PARTITION BY o_custkey
        |                                     ORDER BY o_orderdate, o_orderkey) AS DATE),
        |         CAST(o_orderdate AS DATE)) AS gap_days
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""") { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("gap_days",
          datediff(col("o_orderdate").cast("date"), lag(col("o_orderdate"), 1).over(w).cast("date")).cast("long"))
        .select("o_custkey", "o_orderkey", "gap_days")
        .orderBy("o_custkey", "o_orderkey")
    },

    sql(
      "q33_price_deciles",
      "global ntile window: order-price deciles (at 100 TB this becomes approx_percentile; exact global ordering kept here for the oracle)",
      s"""SELECT decile, count(*) AS n_orders,
        |       floor((min(o_totalprice)) * 100 + 0.5) / 100 AS min_price,
        |       floor((max(o_totalprice)) * 100 + 0.5) / 100 AS max_price,
        |       ${s2("o_totalprice")} AS sum_price
        |FROM (SELECT o_totalprice,
        |             ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
        |      FROM orders)
        |GROUP BY decile
        |ORDER BY decile""") { (s, dir) =>
      val w = Window.orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("decile", ntile(10).over(w).cast("long"))
        .groupBy("decile")
        .agg(count(lit(1)).as("n_orders"),
          r2(min("o_totalprice")).as("min_price"),
          r2(max("o_totalprice")).as("max_price"),
          dsum2(col("o_totalprice")).as("sum_price"))
        .orderBy("decile")
    },

    rowsOnly(
      "q38_price_deciles_approx",
      "at-scale twin of q33: decile boundaries from a mergeable quantile sketch (approx_percentile, accuracy 10000) — no global sort, one map-side-combinable aggregation; no oracle: sketch estimates are engine-specific — AggregatorSpec asserts <2% boundary error vs exact deciles")(
      (s, dir) => {
        Tables.orders(s, dir)
          .agg(approx_percentile(col("o_totalprice"),
            array((1 to 9).map(i => lit(i / 10.0)): _*), lit(10000)).as("bounds"))
          .select(posexplode(col("bounds")).as(Seq("i", "bound")))
          .select((col("i") + 1).cast("long").as("decile"), r2(col("bound")).as("approx_bound"))
          .orderBy("decile")
      }),

    sql(
      "q34_rollup",
      "ROLLUP grouping sets with subtotals and grand total",
      s"""SELECT l_returnflag, l_linestatus,
        |       ${s2("l_quantity")} AS sum_qty, count(*) AS n_lines
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""") { (s, dir) =>
      Tables.lineitem(s, dir)
        .rollup("l_returnflag", "l_linestatus")
        .agg(dsum2(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n_lines"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
    },

    sql(
      "q35_cube",
      "CUBE grouping sets with grouping() indicators",
      s"""SELECT l_returnflag, l_linestatus,
        |       CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid,
        |       ${s2("l_extendedprice")} AS sum_price
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""") { (s, dir) =>
      Tables.lineitem(s, dir)
        .cube("l_returnflag", "l_linestatus")
        .agg(grouping_id().as("gid"), dsum2(col("l_extendedprice")).as("sum_price"))
        .select(col("l_returnflag"), col("l_linestatus"), col("gid").cast("long").as("gid"),
          col("sum_price"))
        .orderBy(col("gid"), asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
    },

    sql(
      "q36_set_ops",
      "UNION / INTERSECT / EXCEPT over customer key sets",
      """SELECT c_custkey FROM (
        |  (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |   UNION
        |   SELECT c_custkey FROM customer WHERE c_acctbal > 4000.0)
        |  INTERSECT
        |  SELECT DISTINCT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
        |  EXCEPT
        |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
        |ORDER BY c_custkey""") { (s, dir) =>
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      val a = c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val b = c.filter(col("c_acctbal") > 4000.0).select("c_custkey")
      val f = o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("c_custkey")).distinct()
      val m = c.filter(col("c_mktsegment") === "MACHINERY").select("c_custkey")
      a.union(b).distinct().intersect(f).except(m).orderBy("c_custkey")
    },

    sql(
      "q50_pivot",
      "pivot: event-type counts as columns per user (relational transpose)",
      """SELECT user_id,
        |       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
        |       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |       CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        |       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        |FROM events
        |GROUP BY user_id
        |ORDER BY user_id""") { (s, dir) =>
      graft.sources.Tables.events(s, dir)
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L) // absent pivot cells surface as nulls outside the agg
        .orderBy("user_id")
    },

    sql(
      "q51_unpivot",
      "unpivot/melt: wide per-flag sums back to long form",
      """SELECT l_returnflag, metric, floor((value) * 100 + 0.5) / 100 AS value
        |FROM (SELECT l_returnflag,
        |             CAST(sum(CAST(l_quantity AS DECIMAL(24,6))) AS DOUBLE) AS qty,
        |             CAST(sum(CAST(l_extendedprice AS DECIMAL(24,6))) AS DOUBLE) AS price
        |      FROM lineitem GROUP BY l_returnflag)
        |UNPIVOT (value FOR metric IN (qty, price))
        |ORDER BY l_returnflag, metric""") { (s, dir) =>
      graft.sources.Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(dsum(col("l_quantity")).as("qty"), dsum(col("l_extendedprice")).as("price"))
        .unpivot(Array(col("l_returnflag")), Array(col("qty"), col("price")), "metric", "value")
        .select(col("l_returnflag"), col("metric"), r2(col("value")).as("value"))
        .orderBy("l_returnflag", "metric")
    },

    sql(
      "q37_percentiles",
      "exact continuous percentiles of account balance per market segment",
      """SELECT c_mktsegment,
        |       floor((quantile_cont(c_acctbal, 0.5)) * 10000 + 0.5) / 10000 AS median_bal,
        |       floor((quantile_cont(c_acctbal, 0.9)) * 10000 + 0.5) / 10000 AS p90_bal
        |FROM customer
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""") { (s, dir) =>
      Tables.customer(s, dir)
        .groupBy("c_mktsegment")
        .agg(
          r4(expr("percentile(c_acctbal, 0.5)")).as("median_bal"),
          r4(expr("percentile(c_acctbal, 0.9)")).as("p90_bal"))
        .orderBy("c_mktsegment")
    },

    sql(
      "q79_percentile_cutoff",
      "distribution-based cutoff selection via percent_rank: keep the top decile per group and report the induced score threshold — the 'train on the best 10% by quality score' filtering primitive. The window orders by (score, unique key), so percent_rank = (i-1)/(n-1) is tie-free and deterministic; the window is PARTITIONED (per group — per group × bucket at 100 TB with an approx threshold instead)",
      """WITH r AS (SELECT o_orderpriority AS g, o_totalprice,
        |                  percent_rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS pr
        |           FROM orders)
        |SELECT g AS o_orderpriority,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(count(CASE WHEN pr >= 0.9 THEN 1 END) AS BIGINT) AS top_decile_n,
        |       floor(min(CASE WHEN pr >= 0.9 THEN o_totalprice END) * 100 + 0.5) / 100 AS p90_threshold
        |FROM r GROUP BY g ORDER BY o_orderpriority""") { (s, dir) =>
      val w = Window.partitionBy("g").orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, dir)
        .select(col("o_orderpriority").as("g"), col("o_totalprice"), col("o_orderkey"))
        .withColumn("pr", percent_rank().over(w))
        .groupBy("g")
        .agg(count(lit(1)).cast("long").as("n"),
          count(when(col("pr") >= 0.9, 1)).cast("long").as("top_decile_n"),
          r2(min(when(col("pr") >= 0.9, col("o_totalprice")))).as("p90_threshold"))
        .select(col("g").as("o_orderpriority"), col("n"), col("top_decile_n"),
          col("p90_threshold"))
        .orderBy("o_orderpriority")
    },

    sql(
      "q89_share_of_parent",
      "hierarchical percent-of-parent over ROLLUP(region, nation): order revenue at nation grain with each nation's share of its region, region rows with their share of the grand total, and the grand-total row at share 1 — the drill-down report pattern (rollup produces all levels in ONE aggregation; shares come from joining each level to its parent level, never re-scanning the fact). Scale posture: the fact aggregates once; the rollup output is dimension-sized (31 rows here, bounded by |region|x|nation| always), so every parent join is a broadcast and share arithmetic is free",
      """WITH rl AS (
        |  SELECT r_name, n_name,
        |         CAST(GROUPING(r_name) AS INT) AS gr, CAST(GROUPING(n_name) AS INT) AS gn,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(24,6))) AS DOUBLE) AS rev
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY ROLLUP(r_name, n_name)),
        |tot AS (SELECT rev AS total_rev FROM rl WHERE gr = 1 AND gn = 1),
        |regions AS (SELECT r_name, rev AS region_rev FROM rl WHERE gr = 0 AND gn = 1)
        |SELECT rl.r_name, rl.n_name, floor(rl.rev * 100 + 0.5) / 100 AS revenue,
        |       floor((rl.rev / regions.region_rev) * 1000000 + 0.5) / 1000000 AS share_of_parent
        |FROM rl JOIN regions ON rl.r_name = regions.r_name WHERE rl.gn = 0
        |UNION ALL
        |SELECT r_name, NULL, floor(rev * 100 + 0.5) / 100,
        |       floor((rev / total_rev) * 1000000 + 0.5) / 1000000
        |FROM rl, tot WHERE gr = 0 AND gn = 1
        |UNION ALL
        |SELECT NULL, NULL, floor(total_rev * 100 + 0.5) / 100, CAST(1.0 AS DOUBLE) FROM tot
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""") { (s, dir) =>
      val rl = Tables.orders(s, dir)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
        // Column-overload rollup: the String-varargs form re-resolves its
        // keys through the Dataset plan-id path and falsely flags a
        // multi-join child as an ambiguous self-join (Spark 4.1).
        .rollup(col("r_name"), col("n_name"))
        .agg(dsum(col("o_totalprice")).as("rev"))
        // level flags from null-ness, not grouping(): region/nation names are
        // never null in the dims, and grouping(col) after a multi-join child
        // trips Spark's ambiguous-self-join resolver (the col resolves into
        // the pre-rollup child). Matches the oracle's GROUPING() exactly
        // because no data-level NULL exists in either key.
        .withColumn("gr", when(col("r_name").isNull, 1).otherwise(0))
        .withColumn("gn", when(col("n_name").isNull, 1).otherwise(0))
      // Parent lookup as partitioned windows over the dimension-sized rollup
      // output (no self-join, no second fact pass): each nation partition
      // (r_name) contains its region subtotal row, and the gn=1 partition
      // contains the grand-total row.
      rl.withColumn("region_rev",
          max(when(col("gn") === 1, col("rev"))).over(Window.partitionBy("r_name")))
        .withColumn("total_rev",
          max(when(col("gr") === 1, col("rev"))).over(Window.partitionBy("gn")))
        .select(col("r_name"), col("n_name"), r2(col("rev")).as("revenue"),
          when(col("gn") === 0, r6(col("rev") / col("region_rev")))
            .when(col("gr") === 0 && col("gn") === 1, r6(col("rev") / col("total_rev")))
            .otherwise(lit(1.0)).as("share_of_parent"))
        .orderBy(asc_nulls_first("r_name"), asc_nulls_first("n_name"))
    },

    sql(
      "q93_range_frame",
      "value-RANGE window frame — trailing 90-day spend per customer at every order (the moving-window aggregate ROWS frames cannot express: the frame is bounded by the ORDER key's VALUE, so it widens and narrows with order density instead of counting rows): per order, the sum and count of the same customer's orders dated within the preceding 89 days inclusive. Both engines frame on epoch seconds (Spark rangeBetween over unix_timestamp, DuckDB RANGE over the timestamp with a second-granular interval) so peer sets are identical by construction; the frame sum is decimal-exact (the q31 contract — RANGE frames are evaluated by segment trees in DuckDB and streaming frame scans in Spark, and only decimal addition makes that strategy difference invisible). Scale posture: one shuffle partitioned by the high-cardinality custkey; per-partition state is a bounded sliding frame (90 days of one customer's orders), never the whole partition — the standard distributed time-window analytic",
      """SELECT o_custkey, o_orderkey,
        |       CAST(count(*) OVER w AS BIGINT) AS n_orders_90d,
        |       floor(CAST(sum(CAST(o_totalprice AS DECIMAL(24,6))) OVER w AS DOUBLE) * 100 + 0.5) / 100
        |         AS spend_90d
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
        |             RANGE BETWEEN INTERVAL 7689600 SECOND PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""") { (s, dir) =>
      // 89 days of seconds: the frame includes the current day, so a
      // "90-day trailing window" reaches back 89 * 86400 s from the
      // current order's timestamp. Framing on the long epoch value (not
      // datediff) keeps the contract exact even for corpora with
      // non-midnight timestamps.
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(unix_timestamp(col("o_orderdate")))
        .rangeBetween(-89L * 86400L, 0L)
      Tables.orders(s, dir)
        .withColumn("n_orders_90d", count(lit(1)).over(w).cast("long"))
        .withColumn("spend_90d",
          r2(sum(col("o_totalprice").cast("decimal(24,6)")).over(w).cast("double")))
        .select("o_custkey", "o_orderkey", "n_orders_90d", "spend_90d")
        .orderBy("o_custkey", "o_orderkey")
    },

    sql(
      "q96_rank_family",
      "relative-rank window functions with PEERS — percent_rank and cume_dist of each order's month within its priority class (the rank family q30's row_number cannot express: row_number forces ties apart, while these two define themselves BY the tie group — cume_dist counts the whole peer group as reached, percent_rank counts rows strictly below — so the ORDER key is deliberately low-cardinality, the order month, to make peer handling the thing under test). Both are rank arithmetic over integer counts ((rank-1)/(n-1), peers_reached/n) evaluated by the same IEEE division in both engines, rounded r6. Scale posture: one shuffle partitioned by priority class, linear per-partition rank scan — peers accumulate in counts, never in buffered rows",
      """SELECT o_orderkey, o_orderpriority,
        |       floor((percent_rank() OVER w) * 1000000 + 0.5) / 1000000 AS pr,
        |       floor((cume_dist() OVER w) * 1000000 + 0.5) / 1000000 AS cd
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY date_trunc('month', CAST(o_orderdate AS TIMESTAMP)))
        |ORDER BY o_orderkey""") { (s, dir) =>
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(date_trunc("month", col("o_orderdate").cast("timestamp")))
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_orderpriority"),
          r6(percent_rank().over(w)).as("pr"),
          r6(cume_dist().over(w)).as("cd"))
        .orderBy("o_orderkey")
    },

    sql(
      "q97_argmax",
      "group-argmax WITHOUT a window — per priority class the (orderkey, price) of the most and least expensive order, computed as max/min over a lexicographic struct in ONE map-side-combinable aggregation (the scale-correct replacement for the q30 row_number-top-1 idiom: a window shuffles and sorts every row of every partition; struct-argmax partial-aggregates to one candidate per mapper, so the shuffle carries |groups| rows regardless of corpus size — max_by/arg_max semantics with the tie PINNED: equal prices resolve to the smallest orderkey on both extremes, which bare max_by leaves unspecified in both engines, hence the negated-key struct). Oracle mirrors the exact struct comparison as window-free arg extraction via row_number only for readability — values are identical because the tie rule is total",
      """WITH ranked AS (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_orderpriority
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rmax,
        |         row_number() OVER (PARTITION BY o_orderpriority
        |                            ORDER BY o_totalprice ASC, o_orderkey) AS rmin
        |  FROM orders)
        |SELECT o_orderpriority,
        |       max(CASE WHEN rmax = 1 THEN o_orderkey END) AS max_orderkey,
        |       floor(max(CASE WHEN rmax = 1 THEN o_totalprice END) * 100 + 0.5) / 100 AS max_price,
        |       max(CASE WHEN rmin = 1 THEN o_orderkey END) AS min_orderkey,
        |       floor(max(CASE WHEN rmin = 1 THEN o_totalprice END) * 100 + 0.5) / 100 AS min_price
        |FROM ranked
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""") { (s, dir) =>
      // lexicographic struct max: (price asc, -orderkey asc) ⇒ greatest
      // price, ties to the SMALLEST key; min side mirrors with (price,
      // orderkey) — one aggregation, no window, partial-combinable
      Tables.orders(s, dir)
        .groupBy("o_orderpriority")
        .agg(
          max(struct(col("o_totalprice").as("p"), (-col("o_orderkey")).as("nk"))).as("mx"),
          min(struct(col("o_totalprice").as("p"), col("o_orderkey").as("k"))).as("mn"))
        .select(col("o_orderpriority"),
          (-col("mx.nk")).cast("long").as("max_orderkey"), r2(col("mx.p")).as("max_price"),
          col("mn.k").as("min_orderkey"), r2(col("mn.p")).as("min_price"))
        .orderBy("o_orderpriority")
    }
  )
}
