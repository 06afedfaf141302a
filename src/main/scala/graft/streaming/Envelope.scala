package graft.streaming

import graft.model.StockTrade
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The Kinesis record envelope, engine-side (SURVEY.md §1.2).
  *
  * Mirrors the connector's fixed output schema: `partitionKey` (the
  * reference partitions by ticker, `KinesisSync.java:158`), `data` (JSON
  * bytes, `KinesisSync.java:161`), `sequenceNumber`,
  * `approximateArrivalTimestamp`, `shardId`. Encoding/decoding are pure
  * column expressions so both directions stay inside whole-stage codegen.
  */
object Envelope {

  val schema: StructType = StructType(Seq(
    StructField("partitionKey", StringType),
    StructField("data", BinaryType),
    StructField("sequenceNumber", StringType),
    StructField("approximateArrivalTimestamp", TimestampType),
    StructField("shardId", StringType)
  ))

  /** Number of simulated shards. The reference creates exactly 1 shard
    * (`KinesisSync.java:49-54`); we default to more and hash the partition
    * key the way Kinesis does conceptually (key → shard), because the
    * single-shard layout is the reference's scalability bug, not a
    * semantic (SURVEY.md §2.1 quirk note).
    */
  val DefaultShards = 4

  /** trades → wire envelope (producer side, K1: JSON bytes + key=ticker). */
  def encode(trades: DataFrame, shards: Int = DefaultShards): DataFrame =
    trades.select(
      col("tickerSymbol").as("partitionKey"),
      to_json(struct(trades.columns.map(col): _*)).cast("binary").as("data"),
      col("id").cast("string").as("sequenceNumber"),
      current_timestamp().as("approximateArrivalTimestamp"),
      concat(lit("shardId-"), lpad(pmod(hash(col("tickerSymbol")), lit(shards)).cast("string"), 12, "0"))
        .as("shardId"))

  /** envelope → typed trade columns (consumer side, C2/C4).
    *
    * PERMISSIVE `from_json` matches the reference's lenient Jackson config
    * (`FAIL_ON_UNKNOWN_PROPERTIES=false`, `StockTrade.java:17`): unknown
    * JSON fields are dropped, garbage payloads decode to all-null rows
    * (`StockTrade.java:77-78` returns null on any IOException).
    */
  def decode(envelope: DataFrame): DataFrame =
    envelope.select(
      col("sequenceNumber"),
      col("approximateArrivalTimestamp"),
      from_json(col("data").cast("string"), StockTrade.schema).as("t"))
      .select(col("sequenceNumber"), col("approximateArrivalTimestamp"), col("t.*"))

  /** The consumer's log-line projection (K4: `Seq No: {} - {payload}`,
    * `KinesisSync.java:119-122` prints payload bytes as a string).
    */
  def consumerLogLine: Column =
    format_string("Seq No: %s - %s", col("sequenceNumber"), col("data").cast("string"))
}
