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

    rowsOnly(
      "a03_reservoir_sample",
      "typed Aggregator UDAF: O(k)-state reservoir sample per segment; no oracle: seeded sampling is engine-specific — AggregatorSpec asserts size-k and domain membership")(
      (s, dir) => {
        val sample = udaf(new Aggregators.ReservoirSample(k = 10, seed = 42L))
        Tables.customer(s, dir)
          .groupBy("c_mktsegment")
          .agg(sample(col("c_custkey")).as("sampled"))
          .select(col("c_mktsegment"), size(col("sampled")).cast("long").as("n_sampled"))
          .orderBy("c_mktsegment")
      }),

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
