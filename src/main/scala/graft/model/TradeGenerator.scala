package graft.model

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
  *
  * r9: the draw source moved from a sequential `scala.util.Random` stream to
  * HASH-INDEXED draws ([[TradeGenerator.at]]): trade `id` plus a seed fully
  * determine the record through four splitmix priority-hash streams. Same
  * distributions (uniform/Bernoulli from uniform 63-bit hashes — the
  * reference's contract is its distributions, its unseeded RNG stream was
  * never reproducible), but generation becomes embarrassingly parallel (no
  * sequential PRNG state — any partitioning of the id range yields identical
  * records) and every draw replays bit-exactly in DuckDB HUGEINT, which puts
  * the tr01-tr03 registry entries behind the hash-exact oracle gate.
  */
final class TradeGenerator(seed: Long, firstId: Long = 1L) {
  private var nextId: Long = firstId

  def next(): StockTrade = {
    val t = TradeGenerator.at(nextId, seed)
    nextId += 1
    t
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

  /** 2^53 — the largest power of two whose multiples are all exact doubles;
    * `(hash % Pow53) / Pow53` is a uniform double in [0, 1) computed with a
    * single correctly-rounded division, identical in the JVM and DuckDB.
    */
  val Pow53: Long = 1L << 53

  /** The pure hash-indexed draw: `(id, seed) → StockTrade`, no sequential
    * state. Four independent priority-hash streams (keyed `id*4 + stream`)
    * drive ticker, price deviation, trade type, and quantity; all floating
    * arithmetic is a fixed left-to-right IEEE sequence so the DuckDB oracle
    * (`TradeQueries.tradesSql`) reproduces every record bit-exactly.
    */
  def at(id: Long, seed: Long): StockTrade = {
    import graft.functions.HashOps.priorityHash
    val p0 = priorityHash(id * 4, seed)
    val p1 = priorityHash(id * 4 + 1, seed)
    val p2 = priorityHash(id * 4 + 2, seed)
    val p3 = priorityHash(id * 4 + 3, seed)
    val (symbol, mean) = StockPrices((p0 % StockPrices.length).toInt)
    val deviation = ((p1 % Pow53).toDouble / Pow53.toDouble - 0.5) * 2.0 * MaxDeviation
    // floor(x*100 + 0.5)/100, NOT math.round: round computes the exact
    // floor(x + 0.5) (post-JDK8), while the codegen'd batch path
    // (TradeSource.trades) and the DuckDB replay (TradeQueries.tradesSql)
    // both evaluate the fp expression floor(x*100 + 0.5)/100 — on draws
    // where the double add of +0.5 rounds across an integer boundary the
    // two differ by one cent. All three implementations must share the
    // same IEEE operation sequence (the Det contract) for the
    // "value-identical at equal ids" claim below to hold.
    val price = math.floor(mean * (1 + deviation) * 100.0 + 0.5) / 100.0
    val tradeType =
      if ((p2 % Pow53).toDouble / Pow53.toDouble < ProbabilitySell) StockTrade.SELL
      else StockTrade.BUY
    val quantity = p3 % MaxQuantity + 1L
    StockTrade(symbol, tradeType, price, quantity, id)
  }
}
