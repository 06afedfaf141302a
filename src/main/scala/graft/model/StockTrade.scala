package graft.model

import org.apache.spark.sql.types._

/** The single domain record of the reference app, reproduced as an immutable
  * case class over a fixed Spark schema.
  *
  * Field names are wire-exact with the Jackson JSON output of the reference
  * POJO (reference: `StockTrade.java:28-32`), so `to_json`/`from_json` round
  * trips are byte-compatible modulo key ordering.
  *
  * `tradeType` is the enum name string (`BUY` | `SELL`) — Jackson serializes
  * enum names (reference: `StockTrade.java:23-26`).
  */
final case class StockTrade(
    tickerSymbol: String,
    tradeType: String,
    price: Double,
    quantity: Long,
    id: Long
) {

  /** Human-readable projection, format-exact with the reference's
    * `toString()` (reference: `StockTrade.java:82-85`).
    */
  def display: String =
    "ID %d: %s %d shares of %s for $%.02f".format(id, tradeType, quantity, tickerSymbol, price)
}

object StockTrade {
  val BUY = "BUY"
  val SELL = "SELL"

  /** Spark schema of the JSON wire record. Used by `from_json` in PERMISSIVE
    * mode, which matches the reference's lenient Jackson config
    * (`FAIL_ON_UNKNOWN_PROPERTIES = false`, `StockTrade.java:17`): unknown
    * fields are ignored, garbage decodes to nulls (`StockTrade.java:77-78`).
    */
  val schema: StructType = StructType(Seq(
    StructField("tickerSymbol", StringType),
    StructField("tradeType", StringType),
    StructField("price", DoubleType),
    StructField("quantity", LongType),
    StructField("id", LongType)
  ))
}
