package graft

import org.apache.spark.sql.SparkSession

/** Standalone re-measure tool: times one registry query N times outside the
  * full bench, with the same session settings and noop materialization.
  * In-bench single-shot timings swing severalfold with JIT first-touch and
  * host load (see BENCH_DETAIL.json's per-take records); this is the
  * arbiter for whether a per-query "regression" is real.
  *
  * Usage: `sbt "runMain graft.QueryTime <query_name> [takes]"`
  * (SPARK_GRAFT_SF_DIR selects the corpus; defaults to sf0.1)
  */
object QueryTime {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: QueryTime <query_name> [takes]")
    val name = args(0)
    val takes = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    (1 to takes).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      // stop the clock BEFORE dropping caches — Bench.timeOnce does the
      // same, so the two tools measure the same quantity
      val elapsed = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"[querytime] $name take $i: $elapsed%.2f s")
    }
    spark.stop()
  }
}
