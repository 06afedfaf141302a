package graft.operators

import graft.GraftQuery
import graft.GraftQuery.rowsOnly
import graft.model.StockTrade
import graft.sources.TradeSource
import graft.operators.Det._
import org.apache.spark.sql.functions._

/** Batch queries over the reproduced StockTrade stream (reference data
  * model, SURVEY.md §1). Trades are engine-generated (no DuckDB-visible
  * input table), so these are rows-only entries; their invariants — price
  * within ±20% of the per-ticker mean, 2-decimal rounding, quantity in
  * [1,10000], SELL ratio ≈ 0.4, JSON round-trip identity — are asserted in
  * the ScalaTest suite against the reference's declared distributions.
  */
object TradeQueries {

  private val N = 100000L

  val all: Seq[GraftQuery] = Seq(
    rowsOnly(
      "tr00_pipeline_throughput",
      "full reference pipeline (generate → envelope encode → permissive decode → per-ticker windowed stats) over 1M trades — the throughput headline vs the reference's ~12 rec/s envelope (BASELINE.md); no oracle: input is generated in-engine — TradeGeneratorSpec/CodecSpec/StreamingSpec gate each stage")(
      (s, dir) => {
        // 1M trades for the sf0.1 bench; a lighter volume for the
        // correctness pass (its output is scale-independent: 25 tickers)
        val n = if (dir.endsWith("0.1")) 1000000L else 100000L
        val trades = TradeSource.trades(s, n).toDF()
        val decoded = graft.streaming.Envelope.decode(graft.streaming.Envelope.encode(trades))
        graft.streaming.TradePipeline.tickerStats(decoded, window_ = "10 seconds")
          .select(col("tickerSymbol"), col("n_trades"), col("sum_qty"),
            r2(col("vwap")).as("vwap"))
      }),

    rowsOnly(
      "tr01_trade_stats",
      "per-ticker stats over the seeded distributed generator (S1 reproduction); no oracle: input is generated in-engine, not a fixture table — TradeGeneratorSpec asserts the distribution contract")(
      (s, dir) => {
        TradeSource.trades(s, N).toDF()
          .groupBy("tickerSymbol")
          .agg(count(lit(1)).as("n_trades"),
            r2(min("price")).as("min_price"),
            r2(max("price")).as("max_price"),
            sum("quantity").as("sum_qty"),
            r4(sum(when(col("tradeType") === StockTrade.SELL, 1).otherwise(0)) * lit(1.0) / count(lit(1)))
              .as("sell_share"))
          .orderBy("tickerSymbol")
      }),

    rowsOnly(
      "tr02_trade_roundtrip",
      "JSON wire round-trip (C1+C2): to_json → from_json loses nothing; no oracle: generated input — CodecSpec asserts the round-trip and permissive-decode contract. Perf note (r04 4.7s-both-takes investigated): warm intrinsic cost is 0.44s wall / 1.7s executor / 1.1s CPU over 4 stages (QueryTime stage attribution) — ~11µs/row through the double Jackson pass; to_json/from_json are CodegenFallback so the kernel is interpreted, and under shared-host CPU steal a 32-way interpreted stage serializes, which is what r04's bench window hit (a later window showed the inverse: tr00 9.6s while tr02 1.7s). Not a plan defect")(
      (s, dir) => {
        val trades = TradeSource.trades(s, N).toDF()
        val wire = trades.select(to_json(struct(trades.columns.map(col): _*)).as("json"))
        val back = wire.select(from_json(col("json"), StockTrade.schema).as("t")).select("t.*")
        back.groupBy("tradeType")
          .agg(count(lit(1)).as("n"),
            count(when(col("tickerSymbol").isNull || col("price").isNull ||
              col("quantity").isNull || col("id").isNull, 1)).as("n_nulls"))
          .orderBy("tradeType")
      }),

    rowsOnly(
      "tr03_trade_display",
      "display projection (C3): reference toString format as a column; no oracle: generated input — TradeGeneratorSpec asserts the format string against the reference")(
      (s, dir) => {
        TradeSource.trades(s, 1000).toDF()
          .select(col("id"),
            format_string("ID %d: %s %d shares of %s for $%.02f",
              col("id"), col("tradeType"), col("quantity"), col("tickerSymbol"), col("price"))
              .as("display"))
          .orderBy("id")
          .limit(20)
      })
  )
}
