package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Exactly-once-shaped sinks (SURVEY.md §7 M5).
  *
  * The reference's producers are at-least-once with swallowed errors (K1)
  * or at-most-once fire-and-forget (K3). Structured Streaming gives
  * at-least-once per micro-batch on retry; [[idempotentParquet]] upgrades
  * that to effective exactly-once by making the write idempotent: each
  * micro-batch lands in a `batch_id=<id>` partition directory that is
  * atomically overwritten if the batch replays — the standard
  * `foreachBatch` + dynamic-partition-overwrite recipe.
  */
object Sinks {

  def idempotentParquet(df: DataFrame, path: String, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("2 seconds")): StreamingQuery =
    df.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.withColumn("batch_id", org.apache.spark.sql.functions.lit(batchId))
          .write
          // writer-scoped: does NOT flip the session-global overwrite mode
          .option("partitionOverwriteMode", "dynamic")
          .mode("overwrite")
          .partitionBy("batch_id")
          .parquet(path)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()

  /** Deployment-scale streaming-state configuration: RocksDB state store
    * (off-heap, spillable — required once keyed state outgrows executor
    * heap at 100 TB) plus changelog checkpointing. Local test runs keep
    * the default in-memory provider; this is the switch a cluster deploy
    * flips.
    */
  def configureRocksDbState(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
  }
}
