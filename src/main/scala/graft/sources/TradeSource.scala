package graft.sources

import graft.model.{StockTrade, TradeGenerator}
import org.apache.spark.sql.{Column, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed synthetic trade source — the reference's generator (S1) made
  * deterministic and parallel.
  *
  * Batch: `spark.range` rows map to records through the PURE hash-indexed
  * draw ([[TradeGenerator.at]]) expressed as codegen'd Column arithmetic —
  * no typed lambda, no per-partition PRNG state. The dataset is a function
  * of (n, seed) alone: any partition count, executor placement, or retry
  * yields identical records (r9; previously the values depended on the
  * partition count through per-partition sequential seeds), and the whole
  * generation stays inside whole-stage codegen. Ids are the range values
  * (globally unique, monotone) rather than the reference's per-instance
  * counter (`StockTradeGenerator.java:56`).
  *
  * Streaming: the `rate` source replaces the reference's
  * `Thread.sleep(100)` rate limiting (S2, `KinesisSync.java:135`) — 10
  * rows/s reproduces its ≤10 rec/s envelope declaratively; backpressure and
  * batch sizing come from the micro-batch engine instead of sleeps. Rows
  * derive from the same [[TradeGenerator.at]] keyed by the rate source's
  * monotone `value`, so the stream is deterministic in the row index,
  * independent of batch boundaries, and value-identical to the batch
  * generator at equal ids.
  */
object TradeSource {
  import TradeGenerator.{MaxQuantity, Pow53, ProbabilitySell, StockPrices}

  def trades(spark: SparkSession, n: Long, partitions: Int = 32, seed: Long = 42L): Dataset[StockTrade] = {
    import spark.implicits._
    import graft.functions.HashFunctions.priorityHash
    val syms = array(StockPrices.map(p => lit(p._1)): _*)
    val means = array(StockPrices.map(p => lit(p._2)): _*)
    def u(p: Column): Column = (p % Pow53).cast("double") / lit(Pow53.toDouble)
    val idx = (col("p0") % StockPrices.length).cast("int") + 1 // element_at is 1-based
    val deviation = (u(col("p1")) - lit(0.5)) * lit(2.0) * lit(TradeGenerator.MaxDeviation)
    spark.range(0, n, 1, partitions)
      .select((col("id") + 1).as("tid"))
      .select(col("tid"),
        priorityHash(col("tid") * 4, seed).as("p0"),
        priorityHash(col("tid") * 4 + 1, seed).as("p1"),
        priorityHash(col("tid") * 4 + 2, seed).as("p2"),
        priorityHash(col("tid") * 4 + 3, seed).as("p3"))
      .select(
        element_at(syms, idx).as("tickerSymbol"),
        when(u(col("p2")) < ProbabilitySell, StockTrade.SELL)
          .otherwise(StockTrade.BUY).as("tradeType"),
        (floor(element_at(means, idx) * (lit(1.0) + deviation) * lit(100.0) + lit(0.5)) / 100.0)
          .as("price"),
        (col("p3") % MaxQuantity + 1).as("quantity"),
        col("tid").as("id"))
      .as[StockTrade]
  }

  /** Streaming trades at the reference's production rate (S1+S2). */
  def tradeStream(spark: SparkSession, rowsPerSecond: Int = 10, seed: Long = 42L): Dataset[StockTrade] = {
    import spark.implicits._
    spark.readStream
      .format("rate")
      .option("rowsPerSecond", rowsPerSecond)
      .load()
      .select(col("value"))
      .as[Long]
      .map(i => TradeGenerator.at(i + 1, seed))
  }
}
