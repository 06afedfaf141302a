package graft

import graft.model.StockTrade
import graft.sources.TradeSource
import graft.streaming.Envelope
import org.apache.spark.sql.functions._

/** Wire-format fidelity: JSON round trip (C1+C2) and the reference's
  * permissive decode semantics (`StockTrade.java:17,77-78`).
  */
class CodecSpec extends SparkSpec {
  import spark.implicits._

  test("to_json → from_json round trip is the identity on trades") {
    val trades = TradeSource.trades(spark, 2000, partitions = 4)
    val back = Envelope.decode(Envelope.encode(trades.toDF()))
      .select("tickerSymbol", "tradeType", "price", "quantity", "id")
      .as[StockTrade]
    assert(back.collect().sortBy(_.id).toSeq == trades.collect().sortBy(_.id).toSeq)
  }

  test("unknown JSON fields are ignored (FAIL_ON_UNKNOWN_PROPERTIES=false)") {
    val json = """{"tickerSymbol":"AAPL","tradeType":"BUY","price":1.5,"quantity":2,"id":9,"mystery":"x"}"""
    val row = Seq(json).toDF("data")
      .select(from_json(col("data"), StockTrade.schema).as("t")).select("t.*")
      .as[StockTrade].head()
    assert(row == StockTrade("AAPL", "BUY", 1.5, 2, 9))
  }

  test("garbage payload decodes to nulls, not an error (StockTrade.java:77-78)") {
    val rows = Seq("not json at all").toDF("data")
      .select(from_json(col("data"), StockTrade.schema).as("t")).select("t.*")
      .collect()
    assert(rows.length == 1 && rows.head.toSeq.forall(_ == null))
  }

  test("envelope carries key=ticker and stable shard assignment") {
    val env = Envelope.encode(TradeSource.trades(spark, 500).toDF())
    val bad = env.filter(col("partitionKey").isNull || !col("shardId").startsWith("shardId-")).count()
    assert(bad == 0)
    // same key → same shard
    val shardsPerKey = env.groupBy("partitionKey")
      .agg(countDistinct("shardId").as("n")).filter(col("n") > 1).count()
    assert(shardsPerKey == 0)
  }

  test("consumer log line matches the reference format (KinesisSync.java:119-122)") {
    val env = Envelope.encode(TradeSource.trades(spark, 1).toDF())
    val line = env.select(Envelope.consumerLogLine.as("l")).as[String].head()
    assert(line.matches("Seq No: \\d+ - \\{.*\\}"))
  }

  test("encodeFast is byte-identical to the Jackson encoder over the full generated domain") {
    // 200k trades cover every ticker (incl. BRK.A's ~1e5-scale prices,
    // the Double.toString stress case) and the whole quantity range; a
    // single differing byte in `data` — or any other envelope column —
    // fails. This equality is what licenses tr00's fast producer path.
    val trades = TradeSource.trades(spark, 200000).toDF()
    val jackson = Envelope.encode(trades)
      .select(col("partitionKey"), col("data").cast("string").as("j"),
        col("sequenceNumber"), col("shardId"))
    val fast = Envelope.encodeFast(trades)
      .select(col("partitionKey").as("pk2"), col("data").cast("string").as("f"),
        col("sequenceNumber").as("sq2"), col("shardId").as("sh2"))
    // null-safe inequality (<=>): a systematically-null fast column would
    // make plain =!= yield NULL rows the filter drops, masking the diff;
    // the join-cardinality assert below catches dropped/duplicated keys
    val joined = jackson.join(fast, col("sequenceNumber") === col("sq2"))
    assert(joined.count() == 200000L, "encodeFast must keep every sequenceNumber exactly once")
    val diffs = joined
      .filter(!(col("j") <=> col("f")) || !(col("partitionKey") <=> col("pk2")) ||
        !(col("shardId") <=> col("sh2")))
      .count()
    assert(diffs == 0, s"$diffs rows diverge between encodeFast and to_json")
    // and the fast bytes still decode through the real PERMISSIVE consumer
    val decoded = Envelope.decode(Envelope.encodeFast(trades))
    assert(decoded.filter(col("tickerSymbol").isNull).count() == 0)
  }

  test("encodeFast fails loudly on a null trade field instead of nulling the payload") {
    // concat null-propagates; without the raise_error guard a generator
    // drift introducing a null field would silently null every payload
    val trades = TradeSource.trades(spark, 10).toDF()
      .withColumn("price", when(col("id") === 5, lit(null).cast("double")).otherwise(col("price")))
    val ex = intercept[Exception] {
      Envelope.encodeFast(trades).select("data").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("encodeFast: null trade field")),
      s"expected the encodeFast precondition error, got: $ex")
  }
}
