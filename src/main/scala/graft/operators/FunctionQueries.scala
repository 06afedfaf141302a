package graft.operators

import graft.GraftQuery
import graft.GraftQuery.sql
import graft.sources.Tables
import graft.operators.Det._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalar-function library coverage: string, date, math, null-handling, and
  * pattern predicates — the function surface SURVEY.md §2.6 notes the
  * reference lacks (its only scalar ops are `String.format` and
  * `Math.round`). All functions used here are codegen'd Spark builtins; no
  * UDFs anywhere, so every query stays inside whole-stage codegen.
  */
object FunctionQueries {

  val all: Seq[GraftQuery] = Seq(
    sql(
      "q42_string_funcs",
      "string functions: split/upper/length/concat + ordered set aggregation",
      """SELECT split_part(p_name, ' ', 1) AS color,
        |       count(*) AS n_parts,
        |       CAST(min(length(p_name)) AS BIGINT) AS min_name_len,
        |       max(upper(p_type)) AS max_type,
        |       array_to_string(list_sort(list_distinct(list(p_brand))), ',') AS brands
        |FROM part
        |GROUP BY color
        |ORDER BY color""") { (s, dir) =>
      Tables.part(s, dir)
        .groupBy(split(col("p_name"), " ").getItem(0).as("color"))
        .agg(count(lit(1)).as("n_parts"),
          min(length(col("p_name"))).cast("long").as("min_name_len"),
          max(upper(col("p_type"))).as("max_type"),
          concat_ws(",", sort_array(collect_set(col("p_brand")))).as("brands"))
        .orderBy("color")
    },

    sql(
      "q43_date_arithmetic",
      "date functions: datediff, interval comparison, calendar extraction",
      """SELECT CAST(year(o.o_orderdate) AS INT) AS order_year,
        |       CAST(quarter(o.o_orderdate) AS INT) AS order_quarter,
        |       count(*) AS n_lines,
        |       CAST(sum(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY THEN 1 ELSE 0 END) AS BIGINT) AS late_lines,
        |       floor((sum(date_diff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE))) * 1.0 / count(*)) * 10000 + 0.5) / 10000 AS avg_ship_delay
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY order_year, order_quarter
        |ORDER BY order_year, order_quarter""") { (s, dir) =>
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .groupBy(year(col("o_orderdate")).as("order_year"),
          quarter(col("o_orderdate")).as("order_quarter"))
        .agg(count(lit(1)).as("n_lines"),
          sum(when(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAY"), 1).otherwise(0))
            .cast("long").as("late_lines"),
          r4(sum(datediff(col("l_shipdate").cast("date"), col("o_orderdate").cast("date"))) * lit(1.0)
            / count(lit(1))).as("avg_ship_delay"))
        .orderBy("order_year", "order_quarter")
    },

    sql(
      "q44_math_funcs",
      "math functions: sqrt/ln/pow/mod/abs under exact aggregation — the 4 DECIMAL(24,6) sums cost ≈4× a double sum (Det.scala), the deliberate price of cross-engine bit-exactness; linear in rows and fully distributed, so ~2.3 s at sf0.1 is the expected constant, not a plan defect",
      s"""SELECT l_returnflag,
        |       ${s2("sqrt(l_extendedprice)")} AS sum_sqrt_price,
        |       ${a4("ln(1 + l_discount)")} AS avg_log_disc,
        |       CAST(sum(CAST(l_quantity AS BIGINT) % 7) AS BIGINT) AS sum_qty_mod7,
        |       ${s2("pow(l_discount, 2)")} AS sum_disc_sq,
        |       floor((max(abs(l_extendedprice - l_quantity * 100))) * 100 + 0.5) / 100 AS max_abs_diff
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""") { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(
          dsum2(sqrt(col("l_extendedprice"))).as("sum_sqrt_price"),
          davg4(log(lit(1) + col("l_discount"))).as("avg_log_disc"),
          sum(col("l_quantity").cast("long") % 7).cast("long").as("sum_qty_mod7"),
          dsum2(pow(col("l_discount"), 2)).as("sum_disc_sq"),
          r2(max(abs(col("l_extendedprice") - col("l_quantity") * 100))).as("max_abs_diff"))
        .orderBy("l_returnflag")
    },

    sql(
      "q45_price_buckets",
      "CASE bucketing into a categorical dimension",
      s"""SELECT CASE WHEN o_totalprice < 10000 THEN 'small'
        |            WHEN o_totalprice < 100000 THEN 'medium'
        |            ELSE 'large' END AS bucket,
        |       count(*) AS n_orders,
        |       ${s2("o_totalprice")} AS total_value
        |FROM orders
        |GROUP BY bucket
        |ORDER BY bucket""") { (s, dir) =>
      Tables.orders(s, dir)
        .groupBy(when(col("o_totalprice") < 10000, "small")
          .when(col("o_totalprice") < 100000, "medium")
          .otherwise("large").as("bucket"))
        .agg(count(lit(1)).as("n_orders"), dsum2(col("o_totalprice")).as("total_value"))
        .orderBy("bucket")
    },

    sql(
      "q47_null_handling",
      "NULLIF / COALESCE / conditional null counting",
      s"""SELECT l_returnflag,
        |       CAST(count(*) - count(nullif(l_discount, 0.0)) AS BIGINT) AS n_zero_disc,
        |       ${a4("nullif(l_discount, 0.0)")} AS avg_nonzero_disc,
        |       ${a4("coalesce(nullif(l_discount, 0.0), 0.05)")} AS avg_imputed_disc
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""") { (s, dir) =>
      val nz = nullif(col("l_discount"), lit(0.0))
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(
          (count(lit(1)) - count(nz)).cast("long").as("n_zero_disc"),
          davg4(nz).as("avg_nonzero_disc"),
          davg4(coalesce(nz, lit(0.05))).as("avg_imputed_disc"))
        .orderBy("l_returnflag")
    },

    sql(
      "q48_string_projection",
      "row-level string pipeline: lpad/translate/reverse/repeat/substr",
      """SELECT p_partkey,
        |       concat('P-', lpad(CAST(p_partkey AS VARCHAR), 6, '0')) AS part_tag,
        |       upper(substr(p_name, 1, 4)) AS name_head,
        |       reverse(p_brand) AS brand_rev,
        |       translate(p_type, 'AEIOU', 'aeiou') AS type_tr,
        |       repeat(left(p_name, 1), 3) AS initial3,
        |       CAST(length(p_name) AS BIGINT) AS name_len
        |FROM part
        |WHERE p_partkey < 100
        |ORDER BY p_partkey""") { (s, dir) =>
      Tables.part(s, dir)
        .filter(col("p_partkey") < 100)
        .select(col("p_partkey"),
          concat(lit("P-"), lpad(col("p_partkey").cast("string"), 6, "0")).as("part_tag"),
          upper(substring(col("p_name"), 1, 4)).as("name_head"),
          reverse(col("p_brand")).as("brand_rev"),
          translate(col("p_type"), "AEIOU", "aeiou").as("type_tr"),
          repeat(substring(col("p_name"), 1, 1), 3).as("initial3"),
          length(col("p_name")).cast("long").as("name_len"))
        .orderBy("p_partkey")
    },

    sql(
      "q52_statistics",
      "statistical aggregates (variance/stddev/correlation) from exact decimal co-moments — the shared-formula form both engines evaluate identically",
      """SELECT l_returnflag, n,
        |       floor((sqrt((n * sxx - sx * sx) / (n * (n - 1)))) * 10000 + 0.5) / 10000 AS stddev_qty,
        |       floor(((n * sxy - sx * sy) / (n * (n - 1))) * 10000 + 0.5) / 10000 AS covar_qty_disc,
        |       floor(((n * sxy - sx * sy)
        |              / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))) * 1000000 + 0.5) / 1000000 AS corr_qty_disc
        |FROM (SELECT l_returnflag, count(*) AS n,
        |             CAST(sum(CAST(l_quantity AS DECIMAL(24,6))) AS DOUBLE) AS sx,
        |             CAST(sum(CAST(l_discount AS DECIMAL(24,6))) AS DOUBLE) AS sy,
        |             CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(24,6))) AS DOUBLE) AS sxx,
        |             CAST(sum(CAST(l_discount * l_discount AS DECIMAL(24,6))) AS DOUBLE) AS syy,
        |             CAST(sum(CAST(l_quantity * l_discount AS DECIMAL(24,6))) AS DOUBLE) AS sxy
        |      FROM lineitem GROUP BY l_returnflag)
        |ORDER BY l_returnflag""") { (s, dir) =>
      val x = col("l_quantity")
      val y = col("l_discount")
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          dsum(x).as("sx"), dsum(y).as("sy"),
          dsum(x * x).as("sxx"), dsum(y * y).as("syy"), dsum(x * y).as("sxy"))
        .select(col("l_returnflag"), col("n"),
          r4(sqrt((col("n") * col("sxx") - col("sx") * col("sx")) / (col("n") * (col("n") - 1))))
            .as("stddev_qty"),
          r4((col("n") * col("sxy") - col("sx") * col("sy")) / (col("n") * (col("n") - 1)))
            .as("covar_qty_disc"),
          Det.r6((col("n") * col("sxy") - col("sx") * col("sy")) /
            (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
              sqrt(col("n") * col("syy") - col("sy") * col("sy"))))
            .as("corr_qty_disc"))
        .orderBy("l_returnflag")
    },

    sql(
      "q87_chi_square",
      "χ² contingency analysis of order priority × status (the categorical-independence primitive behind feature selection and drift detection), with every cell's contribution computed in EXACT integer arithmetic: the textbook (O−E)²/E becomes (O·N − rt·ct)²·1e6 div (N·rt·ct) — observed counts, row/column totals and N are integers, the numerator rides DECIMAL(38,0)/HUGEINT (~1e26 worst-case here), and the per-cell floor makes the scaled contribution engine-exact (the χ²·1e6 total is the sum of well-defined cell terms, not a float accumulation). Expected counts reported on the same 1e6 grid. Scale posture: one keyed count over the fact table, then all totals derive from the tiny cell table (|priorities|×|statuses|) via broadcast-sized windows — N-row data is touched once",
      """WITH cells AS (SELECT o_orderpriority AS pri, o_orderstatus AS st,
        |                      CAST(count(*) AS BIGINT) AS o
        |               FROM orders GROUP BY 1, 2),
        |tot AS (SELECT pri, st, o,
        |               sum(o) OVER (PARTITION BY pri) AS rt,
        |               sum(o) OVER (PARTITION BY st) AS ct,
        |               sum(o) OVER () AS n
        |        FROM cells)
        |SELECT pri AS o_orderpriority, st AS o_orderstatus, o AS observed,
        |       CAST(CAST(rt AS HUGEINT) * ct * 1000000 // n AS BIGINT) AS expected_scaled,
        |       CAST((CAST(o AS HUGEINT) * n - CAST(rt AS HUGEINT) * ct)
        |            * (CAST(o AS HUGEINT) * n - CAST(rt AS HUGEINT) * ct)
        |            * 1000000 // (CAST(n AS HUGEINT) * rt * ct) AS BIGINT) AS chi2_contrib_scaled
        |FROM tot
        |ORDER BY pri, st""") { (s, dir) =>
      val cells = Tables.orders(s, dir)
        .groupBy(col("o_orderpriority").as("pri"), col("o_orderstatus").as("st"))
        .agg(count(lit(1)).as("o"))
      // N as a broadcast cross-join of the 1-row grand total, not a
      // partition-less window: a global WindowExec is a single-partition
      // sort (the shape PlanAudit forbids), while the cells table is tiny
      // post-aggregation so the 1-row broadcast is free.
      cells
        .withColumn("rt", sum("o").over(Window.partitionBy("pri")))
        .withColumn("ct", sum("o").over(Window.partitionBy("st")))
        .crossJoin(broadcast(cells.agg(sum("o").as("n"))))
        .select(col("pri").as("o_orderpriority"), col("st").as("o_orderstatus"),
          col("o").as("observed"),
          expr("cast(rt AS DECIMAL(38,0)) * ct * 1000000 div n").as("expected_scaled"),
          expr("""(cast(o AS DECIMAL(38,0)) * n - cast(rt AS DECIMAL(38,0)) * ct)
                 |* (cast(o AS DECIMAL(38,0)) * n - cast(rt AS DECIMAL(38,0)) * ct)
                 |* 1000000 div (cast(n AS DECIMAL(38,0)) * rt * ct)""".stripMargin)
            .as("chi2_contrib_scaled"))
        .orderBy("o_orderpriority", "o_orderstatus")
    },

    sql(
      "q49_pattern_filter",
      "LIKE / regexp / IN / BETWEEN predicate combinations",
      """SELECT p_partkey, p_name, p_type, p_size
        |FROM part
        |WHERE (p_name LIKE '%bolt%' AND p_size BETWEEN 10 AND 40)
        |   OR (regexp_matches(p_name, '^(blue|red) ') AND p_type IN ('PROMO','ECONOMY'))
        |ORDER BY p_partkey""") { (s, dir) =>
      Tables.part(s, dir)
        .filter((col("p_name").like("%bolt%") && col("p_size").between(10, 40)) ||
          (col("p_name").rlike("^(blue|red) ") && col("p_type").isin("PROMO", "ECONOMY")))
        .select("p_partkey", "p_name", "p_type", "p_size")
        .orderBy("p_partkey")
    },

    sql(
      "q76_listagg",
      "ordered string aggregation: listagg WITHIN GROUP (Spark 4 builtin) == DuckDB string_agg with ORDER BY",
      """SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations,
        |       count(*) AS n
        |FROM nation
        |GROUP BY n_regionkey
        |ORDER BY n_regionkey""") { (s, dir) =>
      Tables.nation(s, dir)
        .groupBy("n_regionkey")
        .agg(expr("listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)").as("nations"),
          count(lit(1)).as("n"))
        .orderBy("n_regionkey")
    }
  )
}
