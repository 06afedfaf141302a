package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Production file layout for the fixture corpus — SURVEY §9's policy made
  * real instead of plan-inspected:
  *
  *   - **Partition dirs on the coarse filter/source column** each table's
  *     queries actually prune by (`c_mktsegment`, `l_returnflag`,
  *     `o_orderpriority`, `event_type`, `lang`) — all existing, non-null,
  *     non-numeric string columns, so the read-back schema is identical
  *     (the partition column moves to the end; nothing is added).
  *   - **Multiple bounded files per partition** via `maxRecordsPerFile` —
  *     the sf0.1 targets below are the ~1 MiB-scale analog of the
  *     128-256 MiB files the 100 TB plan prescribes, and they remove the
  *     single-row-group scan floor every bench before r7 ran under
  *     (one file = one task = ~1 core per scan stage).
  *   - **Z-order within lineitem**: rows ordered by the q77 Morton key of
  *     (ship-date day, partkey) before the write, so each file's footer
  *     min/max covers a tight rectangle of the two highest-selectivity
  *     scan dimensions instead of a full stripe of one.
  *
  * Small dims (region/nation/supplier/part) stay single-file — partitioning
  * a 5-row table into directories only costs listing round-trips.
  *
  * `events.parquet` is rewritten through [[Tables.normalizeEventTs]] so the
  * layout corpus always stores the canonical `timestamp_ntz` (µs) form, no
  * matter which `ts` encoding the source corpus generation used (legacy
  * INT64 nanos vs timestamp[us] — both have shipped). `Tables.events` is a
  * no-op on the read-back, so engine queries are unaffected; only DuckDB-side
  * casts can differ for a nanos source, which is why layout equivalence is
  * gated by [[graft.LayoutCheck]]'s Spark-vs-Spark compare instead of the
  * SQL oracle.
  */
object Layout {

  /** (partition column, target records per file) per table; None = no
    * partition dirs. Record targets size sf0.1 files at roughly 0.5-2 MiB —
    * scale-model of the 128-256 MiB production target.
    */
  private val policy: Map[String, (Option[String], Int)] = Map(
    "region" -> (None, 1 << 30),
    "nation" -> (None, 1 << 30),
    "supplier" -> (None, 1 << 30),
    "part" -> (None, 10000),
    "customer" -> (Some("c_mktsegment"), 4000),
    "orders" -> (Some("o_orderpriority"), 15000),
    "lineitem" -> (Some("l_returnflag"), 50000),
    "events" -> (Some("event_type"), 10000),
    "documents" -> (Some("lang"), 1000),
    "embeddings" -> (None, 500))

  /** The hive partition key per table, where the layout has one — shared
    * with [[FixtureContract]] so its column-order tolerance accepts exactly
    * the relocation `partitionBy` causes and nothing else.
    */
  val partitionCol: Map[String, String] =
    policy.collect { case (t, (Some(c), _)) => t -> c }

  /** 10-bit × 10-bit Morton interleave — the q77 kernel, reused for the
    * physical lineitem ordering (RelationalQueries.scala q77 documents the
    * pruning math; here it decides real file boundaries).
    */
  private def morton(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
    (0 until 10).map { b =>
      (shiftleft(shiftright(x, b).bitwiseAND(1), 2 * b) +
        shiftleft(shiftright(y, b).bitwiseAND(1), 2 * b + 1))
    }.reduce(_ + _)

  def writeLayout(spark: SparkSession, inDir: String, outDir: String): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.names.foreach { t =>
      val raw = spark.read.parquet(s"$inDir/$t.parquet")
      val df = if (t == "events") Tables.normalizeEventTs(raw) else raw
      val (partCol, recordsPerFile) = policy(t)
      val prepared: DataFrame = t match {
        case "lineitem" =>
          // z-cell ordering: bucket the 10-bit (ship-day, partkey) grid
          // like q77, range-partition by cell so parallel writer tasks own
          // contiguous z-ranges, and sort within partitions so every file
          // covers one tight z-span (tight per-file min/max on BOTH dims).
          val withZ = df
            .withColumn("__zx", (datediff(col("l_shipdate"), lit("1992-01-01")) % 1024).cast("int"))
            .withColumn("__zy", (col("l_partkey") % 1024).cast("int"))
            .withColumn("__z", morton(col("__zx"), col("__zy")))
          withZ
            .repartitionByRange(8, col("l_returnflag"), col("__z"))
            .sortWithinPartitions(col("l_returnflag"), col("__z"))
            .drop("__zx", "__zy", "__z")
        case "events" | "orders" | "customer" | "documents" =>
          // enough writer tasks that each partition dir gets >1 file at
          // sf0.1 (with maxRecordsPerFile as the hard size bound)
          df.repartition(4, col(partCol.get))
        case _ => df.coalesce(1)
      }
      val writer = prepared.write
        .mode(SaveMode.Overwrite)
        .option("maxRecordsPerFile", recordsPerFile)
      partCol match {
        case Some(c) => writer.partitionBy(c).parquet(s"$outDir/$t.parquet")
        case None => writer.parquet(s"$outDir/$t.parquet")
      }
    }
  }
}
