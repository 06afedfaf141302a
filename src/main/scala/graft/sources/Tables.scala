package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet corpus (TESTDATA.md).
  *
  * All scans go through here so scale-oriented settings apply uniformly:
  * parquet gives us vectorized reads, predicate pushdown, and column pruning
  * for free as long as callers keep plans declarative (no early actions).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  /** `events.parquet` stores `ts` as INT64 TIMESTAMP(NANOS) which Spark's
    * parquet reader rejects by default. We read nanos as long (legacy flag)
    * and convert to `timestamp_ntz` (session TZ is UTC, matching the naive
    * nanosecond timestamps DuckDB sees), truncating ns → µs exactly like
    * DuckDB's `CAST(ts AS TIMESTAMP)`.
    *
    * Deliberate session-level side effect: `nanosAsLong` is an SQLConf, not
    * a per-reader option, so this flips it for the whole session. In this
    * engine `events` is the only nano-timestamped input, and the flag is
    * harmless for non-nano reads; a mixed-precision deployment would set it
    * at session build and convert each nano column explicitly as done here.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events")
      .withColumn("ts", expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
