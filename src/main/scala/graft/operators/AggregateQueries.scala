package graft.operators

import graft.GraftQuery
import graft.GraftQuery.{rowsOnly, sql}
import graft.functions.Aggregators
import graft.sources.Tables
import graft.operators.Det._
import org.apache.spark.sql.functions._

/** Custom-aggregate coverage: typed `Aggregator` UDAFs (top-k, reservoir)
  * and approximate sketches (`approx_count_distinct` HLL++,
  * `approx_percentile`). Sketch outputs are engine-specific, so those
  * queries are rows-only with accuracy asserted in ScalaTest against exact
  * values.
  */
object AggregateQueries {

  val all: Seq[GraftQuery] = Seq(
    sql(
      "a01_topk_aggregator",
      "typed Aggregator UDAF: bounded-state top-2 order prices per customer",
      """SELECT o_custkey,
        |       floor((max(CASE WHEN rn = 1 THEN o_totalprice END)) * 100 + 0.5) / 100 AS top1,
        |       floor((max(CASE WHEN rn = 2 THEN o_totalprice END)) * 100 + 0.5) / 100 AS top2
        |FROM (SELECT o_custkey, o_totalprice,
        |             row_number() OVER (PARTITION BY o_custkey
        |                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |      FROM orders)
        |WHERE rn <= 2
        |GROUP BY o_custkey
        |ORDER BY o_custkey""") { (s, dir) =>
      val top2 = udaf(new Aggregators.TopK(2))
      Tables.orders(s, dir)
        .groupBy("o_custkey")
        .agg(top2(col("o_totalprice")).as("tops"))
        .select(col("o_custkey"),
          r2(try_element_at(col("tops"), lit(1))).as("top1"),
          r2(try_element_at(col("tops"), lit(2))).as("top2"))
        .orderBy("o_custkey")
    },

    rowsOnly(
      "a02_approx_distinct",
      "HLL++ sketch (approx_count_distinct); no oracle: sketch estimates are engine-specific — AggregatorSpec asserts <5% relative error vs exact")(
      (s, dir) => {
        Tables.lineitem(s, dir)
          .groupBy("l_returnflag")
          .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
            approx_count_distinct(col("l_orderkey")).as("approx_orders"))
          .orderBy("l_returnflag")
      }),

    sql(
      "a03_reservoir_sample",
      "typed Aggregator UDAF: O(k)-state bottom-k priority sample per segment. The priority is a splitmix/murmur-style integer hash — pure mod-2^64 arithmetic, so the oracle reproduces it exactly in DuckDB HUGEINT (the multiply by 0xff51afd7ed558ccd is split into 32-bit halves to stay inside INT128)",
      """WITH d AS (SELECT DISTINCT c_mktsegment, CAST(c_custkey AS BIGINT) AS k FROM customer),
        |p1 AS (SELECT c_mktsegment, k,
        |              (CAST(k AS HUGEINT) * 11400714819323198485 + 42) % 18446744073709551616 AS m1 FROM d),
        |p2 AS (SELECT c_mktsegment, k, xor(m1, m1 >> 33) AS h1 FROM p1),
        |p3 AS (SELECT c_mktsegment, k,
        |              (h1 * 3981806797 + ((h1 * 4283543511) % 4294967296) * 4294967296)
        |              % 18446744073709551616 AS m2 FROM p2),
        |p4 AS (SELECT c_mktsegment, k, xor(m2, m2 >> 33) AS h2 FROM p3),
        |topk AS (SELECT c_mktsegment, k,
        |                row_number() OVER (PARTITION BY c_mktsegment
        |                                   ORDER BY h2 % 9223372036854775808) AS rn FROM p4)
        |SELECT c_mktsegment,
        |       CAST(row_number() OVER (PARTITION BY c_mktsegment ORDER BY k) AS BIGINT) AS sample_idx,
        |       k AS sampled_key
        |FROM (SELECT c_mktsegment, k FROM topk WHERE rn <= 10)
        |ORDER BY c_mktsegment, sample_idx""") { (s, dir) =>
      val sample = udaf(new Aggregators.ReservoirSample(k = 10, seed = 42L))
      Tables.customer(s, dir)
        .groupBy("c_mktsegment")
        .agg(sample(col("c_custkey")).as("sampled"))
        .select(col("c_mktsegment"), posexplode(col("sampled")).as(Seq("pos", "sampled_key")))
        .select(col("c_mktsegment"),
          (col("pos") + 1).cast("long").as("sample_idx"), col("sampled_key"))
        .orderBy("c_mktsegment", "sample_idx")
    },

    rowsOnly(
      "a05_stratified_sample",
      "seeded stratified sampling (sampleBy on c_mktsegment, per-stratum fractions) — the train/eval split primitive; no oracle: Bernoulli draws depend on engine RNG and partition layout — AggregatorSpec asserts per-stratum rates and same-session determinism")(
      (s, dir) => {
        val fractions = Map(
          "AUTOMOBILE" -> 0.5, "BUILDING" -> 0.25, "FURNITURE" -> 0.1,
          "HOUSEHOLD" -> 0.05, "MACHINERY" -> 0.02)
        Tables.customer(s, dir)
          .stat.sampleBy("c_mktsegment", fractions, seed = 42L)
          .groupBy("c_mktsegment").agg(count(lit(1)).as("n_sampled"))
          .orderBy("c_mktsegment")
      }),

    rowsOnly(
      "a04_approx_percentile",
      "quantile sketch (approx_percentile); no oracle: sketch estimates are engine-specific — AggregatorSpec asserts <2% error vs exact percentile")(
      (s, dir) => {
        Tables.orders(s, dir)
          .agg(approx_percentile(col("o_totalprice"), lit(0.5), lit(1000)).as("approx_median"),
            approx_percentile(col("o_totalprice"), lit(0.99), lit(1000)).as("approx_p99"))
      })
  )
}
