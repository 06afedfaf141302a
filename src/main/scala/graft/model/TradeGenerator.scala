package graft.model

import scala.util.Random

/** Deterministic reimplementation of the reference's synthetic trade source
  * (reference: `StockTradeGenerator.java:62-83`), with an injectable seed so
  * tests and distributed generation are reproducible (the reference uses an
  * unseeded `java.util.Random`, `StockTradeGenerator.java:55`).
  *
  * Distributions reproduced exactly:
  *   - ticker: uniform over the 25-entry price dictionary
  *     (`StockTradeGenerator.java:19-43`)
  *   - price: `mean * (1 + U(-0.2, +0.2))` rounded to 2 decimals
  *     (`StockTradeGenerator.java:47,66-70`)
  *   - tradeType: SELL with probability 0.4 (`StockTradeGenerator.java:53,73-76`)
  *   - quantity: uniform integer in [1, 10000] (`StockTradeGenerator.java:50,79`)
  *   - id: strictly increasing from `firstId` (`StockTradeGenerator.java:56,82`)
  */
final class TradeGenerator(seed: Long, firstId: Long = 1L) {
  import TradeGenerator._

  private val random = new Random(seed)
  private var nextId: Long = firstId

  def next(): StockTrade = {
    val (symbol, mean) = StockPrices(random.nextInt(StockPrices.length))
    val deviation = (random.nextDouble() - 0.5) * 2.0 * MaxDeviation
    val price = math.round(mean * (1 + deviation) * 100.0) / 100.0
    val tradeType = if (random.nextDouble() < ProbabilitySell) StockTrade.SELL else StockTrade.BUY
    val quantity = random.nextInt(MaxQuantity) + 1L
    val id = nextId
    nextId += 1
    StockTrade(symbol, tradeType, price, quantity, id)
  }

  def take(n: Int): Seq[StockTrade] = Seq.fill(n)(next())
}

object TradeGenerator {

  /** Ticker → mean price dictionary (reference: `StockTradeGenerator.java:19-43`).
    * Note the dotted symbols `BRK.A` / `RDS.A` — legal values, and the reason
    * ticker columns must never be treated as struct paths without backticks.
    */
  val StockPrices: IndexedSeq[(String, Double)] = IndexedSeq(
    "AAPL" -> 119.72, "XOM" -> 91.56, "GOOG" -> 527.83, "BRK.A" -> 223999.88,
    "MSFT" -> 42.36, "WFC" -> 54.21, "JNJ" -> 99.78, "WMT" -> 85.91,
    "CHL" -> 66.96, "GE" -> 24.64, "NVS" -> 102.46, "PG" -> 85.05,
    "JPM" -> 57.82, "RDS.A" -> 66.72, "CVX" -> 110.43, "PFE" -> 33.07,
    "FB" -> 74.44, "VZ" -> 49.09, "PTR" -> 111.08, "BUD" -> 120.39,
    "ORCL" -> 43.40, "KO" -> 41.23, "T" -> 34.64, "DIS" -> 101.73,
    "AMZN" -> 370.56
  )

  val MaxDeviation = 0.2
  val MaxQuantity = 10000
  val ProbabilitySell = 0.4

  val Symbols: IndexedSeq[String] = StockPrices.map(_._1)
}
