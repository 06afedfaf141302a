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
  /** Normalizes the `ts` event-time column to `timestamp_ntz` regardless of
    * how the corpus generation encoded it. The driver has shipped `events.ts`
    * as INT64 TIMESTAMP(NANOS) (read as long under the legacy flag) and as
    * plain `timestamp[us]` (read as TIMESTAMP_NTZ) across regenerations, and
    * TESTDATA.md says the corpus may be regenerated at any time — so the
    * engine tolerates every encoding permanently, branching on the LOADED
    * type rather than hard-coding one layout:
    *
    *   - `LongType`          → legacy nanos-as-long; truncate ns → µs exactly
    *                           like DuckDB's `CAST(ts AS TIMESTAMP)`
    *   - `TimestampNTZType`  → already the canonical form; no-op
    *   - `TimestampType`     → session TZ is UTC, so the cast is an identity
    *                           re-tag, not a wall-clock shift
    *
    * Every ingest site (batch [[events]], the streaming reader, the layout
    * rewriter, the probe-corpus generator, test fixtures) MUST route through
    * this one helper; round 7 lost 30 queries to two sites duplicating the
    * nanos assumption when the corpus silently moved to µs.
    */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) =>
        // Magnitude tripwire (round-9 advisory): a bigint ts passes the
        // FixtureContract type check whether it holds nanoseconds or
        // microseconds, and treating µs as ns would silently shift every
        // timestamp 1000× — the exact silent-drift class this helper exists
        // to kill. Plausible nanosecond epochs (years 2000–2100) live in
        // [9.4e17, 4.1e18]; µs (~1.7e15), ms, and seconds all fall below
        // 1e17, so one codegen'd per-row bound turns a unit drift into a
        // loud error on batch AND streaming frames with no extra job.
        df.withColumn("ts", expr(
          """cast(timestamp_micros(
            |  CASE WHEN ts IS NOT NULL AND ts < 100000000000000000
            |       THEN CAST(raise_error(concat(
            |              'events.ts: INT64 value ', CAST(ts AS STRING),
            |              ' is below the plausible nanosecond epoch range - the corpus likely ',
            |              'regenerated with micro/milli/second units in a plain bigint. ',
            |              'Update FixtureContract + Tables.normalizeEventTs (see FIXTURES.md).'))
            |            AS BIGINT)
            |       ELSE ts END div 1000) as timestamp_ntz)""".stripMargin))
      case Some(TimestampNTZType) => df
      case Some(TimestampType) => df.withColumn("ts", col("ts").cast("timestamp_ntz"))
      case other => throw new IllegalStateException(
        s"events.ts has unsupported type $other — expected INT64 nanos, timestamp, or timestamp_ntz; " +
          "corpus schema drifted again? See FIXTURES.md and Tables.normalizeEventTs.")
    }
  }

  /** Loads `events` with [[normalizeEventTs]] applied. The legacy
    * `nanosAsLong` SQLConf stays set so that a corpus regenerated with
    * TIMESTAMP(NANOS) (as in rounds ≤6) still loads instead of being
    * rejected by the vectorized reader; the flag is a no-op for µs files.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(load(spark, dir, "events"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
