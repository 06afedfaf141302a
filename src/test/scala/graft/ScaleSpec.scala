package graft

import java.nio.file.Files

import graft.operators.Skew
import graft.sources.Tables
import graft.streaming.Sinks
import org.apache.spark.sql.functions._

/** Scale-mechanism equivalence: salted operators produce identical results
  * to their unsalted forms, and the idempotent sink survives batch replay.
  */
class ScaleSpec extends SparkSpec {

  test("salted aggregation == plain aggregation") {
    val li = Tables.lineitem(spark, sf0001)
    val plain = li.groupBy("l_returnflag")
      .agg(sum("l_quantity").as("s"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val salted = Skew.saltedAgg(li, Seq(col("l_returnflag")), salts = 16,
      phase1 = Seq(sum("l_quantity").as("s"), count(lit(1)).as("n")),
      phase2 = Seq(sum("s").as("s"), sum("n").cast("long").as("n")))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(salted == plain)
  }

  test("salted broadcast join == plain join") {
    val li = Tables.lineitem(spark, sf0001).select("l_orderkey", "l_partkey", "l_quantity")
    val part = Tables.part(spark, sf0001).select("p_partkey", "p_brand")
      .withColumnRenamed("p_partkey", "l_partkey")
    val plain = li.join(part, "l_partkey").count()
    val salted = Skew.saltedBroadcastLeft(li, part, "l_partkey", salts = 8).count()
    assert(salted == plain)
  }

  test("idempotent sink: replaying a batch overwrites, not duplicates") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-sink").toString
    // simulate the foreachBatch body being invoked twice for batch 0
    val batch = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    def writeOnce(): Unit = {
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      batch.withColumn("batch_id", lit(0L))
        .write.mode("overwrite").partitionBy("batch_id").parquet(out)
    }
    writeOnce(); writeOnce() // replay
    assert(spark.read.parquet(out).count() == 2)
  }

  test("streaming idempotent parquet sink writes batch partitions") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-sink2").toString
    val cp = Files.createTempDirectory("graft-sink2-cp").toString
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long](spark)
    ms.addData(1L to 100L)
    val q = Sinks.idempotentParquet(ms.toDF(), out, cp,
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
    q.awaitTermination(60000)
    val df = spark.read.parquet(out)
    assert(df.count() == 100 && df.columns.contains("batch_id"))
  }
}
