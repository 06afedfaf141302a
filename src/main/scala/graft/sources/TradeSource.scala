package graft.sources

import graft.model.{StockTrade, TradeGenerator}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamReader

/** Distributed synthetic trade source — the reference's generator (S1) made
  * deterministic and parallel.
  *
  * Batch: `spark.range` partitions each run an independently-seeded
  * [[TradeGenerator]] (seed = base + partitionId), so the dataset is
  * reproducible for a fixed (n, partitions, seed) regardless of executor
  * placement — unlike the reference's unseeded singleton generator. Ids are
  * taken from the range (globally unique, monotone) instead of the
  * generator's per-instance counter (reference: `StockTradeGenerator.java:56`).
  *
  * Streaming: the `rate` source replaces the reference's
  * `Thread.sleep(100)` rate limiting (S2, `KinesisSync.java:135`) — 10
  * rows/s reproduces its ≤10 rec/s envelope declaratively; backpressure and
  * batch sizing come from the micro-batch engine instead of sleeps.
  */
object TradeSource {

  def trades(spark: SparkSession, n: Long, partitions: Int = 32, seed: Long = 42L): Dataset[StockTrade] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).mapPartitions { it =>
      val gen = new TradeGenerator(seed + TaskContext.getPartitionId())
      it.map(i => gen.next().copy(id = i + 1))
    }
  }

  /** Streaming trades at the reference's production rate (S1+S2).
    *
    * Each row's generator is seeded from the rate source's monotone
    * `value` (splitmix-style), NOT per-partition: a per-partition seed
    * would restart the PRNG sequence every micro-batch, replaying the
    * same trade prefix each trigger. Per-row derivation makes the stream
    * deterministic in the row index and independent of batch boundaries.
    */
  def tradeStream(spark: SparkSession, rowsPerSecond: Int = 10, seed: Long = 42L): Dataset[StockTrade] = {
    import spark.implicits._
    spark.readStream
      .format("rate")
      .option("rowsPerSecond", rowsPerSecond)
      .load()
      .select(col("value"))
      .as[Long]
      .map { i =>
        var h = (i + 1) * 0x9e3779b97f4a7c15L + seed
        h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
        new TradeGenerator(h).next().copy(id = i + 1)
      }
  }
}
