package graft

import graft.operators.RangeJoin
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** The banded range join must be pair-for-pair identical to the naive
  * inequality join it replaces (which Spark would plan as a per-key
  * cartesian) — including boundary semantics: (leftTs - W, leftTs].
  */
class RangeJoinSpec extends SparkSpec {

  test("banded range join == naive inequality join, boundaries included") {
    val ev = Tables.events(spark, sf0001)
    val w = 5L * 60 * 1000000
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("pts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        unix_micros(col("ts").cast("timestamp")).as("cts"))

    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("purchase_id", "click_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    val banded = pairs(RangeJoin.preceding(purchases, clicks,
      key = "user_id", leftTsUs = "pts", rightTsUs = "cts", windowUs = w))
    val naive = pairs(purchases.join(clicks, Seq("user_id"))
      .filter(col("cts") <= col("pts") && col("cts") > col("pts") - w))
    assert(naive.nonEmpty, "fixture should produce in-window pairs")
    assert(banded == naive,
      s"missing=${naive.diff(banded).take(5)} extra=${banded.diff(naive).take(5)}")
  }
}
