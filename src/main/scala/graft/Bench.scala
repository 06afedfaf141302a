package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: times every registry query at the target scale
  * factor and emits ONE JSON line for the driver
  * (`{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`).
  *
  * Queries run in registry order; each is materialized with a count().
  * Session settings mirror the 100 TB posture scaled to one host:
  * shuffle partitions = cores (not 200), AQE on (runtime join re-planning
  * + skew splitting), broadcast threshold left at default so AQE's
  * runtime stats decide.
  */
object Bench {
  def main(args: Array[String]): Unit = {
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
    // Pay one-time session costs (codegen compiler init, parquet footer
    // reads, shuffle service spin-up) before any query is timed.
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().collect()
    val results = SparkEntry.registry.map { q =>
      val t0 = System.nanoTime()
      try q.fn(spark, sfDir).count()
      catch { case e: Throwable => System.err.println(s"[bench] ${q.name}: ${e.getMessage}") }
      q.name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
