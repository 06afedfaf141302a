package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Per-round benchmark: times every registry query at the target scale
  * factor and emits ONE compact JSON line for the driver
  * (`{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`).
  *
  * Emission contract: the driver captures only the LAST ~2000 characters
  * of stdout, so the final line must stay well under that. The full
  * per-query map (120+ entries ≈ 3.7 KB) cannot fit — it goes to
  * `BENCH_DETAIL.json` in the working directory; the final line carries
  * the total plus a fixed headline subset.
  *
  * Materialization is a `noop`-format write, not `count()`: under a count
  * Catalyst prunes every unreferenced column, so projection-only queries
  * (t01, t08, q48, ...) would skip the very expressions being benchmarked,
  * and `EliminateSorts` would drop final orderBys. The noop sink consumes
  * every row and column at full width and writes nothing.
  *
  * Session settings mirror the 100 TB posture scaled to one host:
  * shuffle partitions = cores (not 200), AQE on (runtime join re-planning
  * + skew splitting), broadcast threshold left at default so AQE's
  * runtime stats decide.
  */
object Bench {

  /** Representative queries for the compact final line: one per module
    * (relational agg/join, window, event, text, dedup production path,
    * similarity exact+approx, multimodal, custom aggregate, trade
    * pipeline headline).
    */
  private val Headline = Seq(
    "q01_pricing_summary", "q05_local_supplier_volume", "q09_product_profit",
    "q31_running_total", "q60_tumbling_window", "q68_asof_attribution",
    "t03_language_id", "t10_tfidf", "d01_exact_dedup", "d04_lsh_near_dups",
    "s01_knn_bruteforce", "s04_knn_lsh", "m04_multimodal_join",
    "a01_topk_aggregator", "tr00_pipeline_throughput")

  private def r3(v: Double): String =
    BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString

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
    // reads, shuffle service spin-up, noop-sink classloading) AND first-
    // touch JIT of the hot expression families (decimal aggregation,
    // window functions, JSON codec, typed generation) before any query is
    // timed — otherwise several seconds of Janino/JIT warmup land in
    // whichever query first exercises each path.
    locally {
      import org.apache.spark.sql.expressions.Window
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .limit(50000)
      li.groupBy("l_returnflag")
        .agg(org.apache.spark.sql.functions.sum(col("l_quantity").cast("decimal(24,6)")).cast("double").as("s"))
        .write.format("noop").mode("overwrite").save()
      li.withColumn("rn", row_number().over(
          Window.partitionBy("l_returnflag").orderBy("l_orderkey")))
        .write.format("noop").mode("overwrite").save()
      val trades = graft.sources.TradeSource.trades(spark, 50000L).toDF()
      graft.streaming.Envelope.decode(graft.streaming.Envelope.encode(trades))
        .write.format("noop").mode("overwrite").save()
    }
    // Best-of-2 per query: single-shot timings on this shared VM swing
    // ~2-4× with JIT first-touch, GC, and host contention (r03 showed
    // unchanged trivial plans "regressing" 0.5 s → 8 s). Take 1 doubles
    // as the JIT/codegen warm-up for take 2; the min is the number with
    // signal. Both takes land in BENCH_DETAIL.json for the record.
    // driver-side GC time attribution: a query whose wall time is mostly
    // GC pause is a victim of accumulated session state, not a bad plan
    def gcMillis(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
        .map(_.getCollectionTime).sum
    }
    def timeOnce(q: GraftQuery): (Double, Double, Boolean) = {
      val g0 = gcMillis()
      val t0 = System.nanoTime()
      val ok =
        try { q.fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable => System.err.println(s"[bench] ${q.name}: ${e.getMessage}"); false }
      val elapsed = (System.nanoTime() - t0) / 1e9
      // queries that persist() intermediates (d04's band keys) would
      // otherwise leak cached blocks into every later query's GC budget;
      // each query is timed standalone, so drop caches between them
      spark.catalog.clearCache()
      (elapsed, (gcMillis() - g0) / 1e3, ok)
    }
    val takes = SparkEntry.registry.map { q =>
      val (t1, g1, ok1) = timeOnce(q); val (t2, g2, ok2) = timeOnce(q)
      // a failed take must not win the min: a fast crash would otherwise
      // report a broken query as its best time. A query failing BOTH takes
      // reports the max (so breakage reads as a regression, not a win) and
      // lands in the errors list.
      val best = (ok1, ok2) match {
        case (true, true) => math.min(t1, t2)
        case (true, false) => t1
        case (false, true) => t2
        case (false, false) => math.max(t1, t2)
      }
      (q.name, best, t1, t2, g1, g2, ok1 && ok2)
    }
    val errors = takes.collect { case (n, _, _, _, _, _, false) => n }
    val results = takes.map { case (n, best, _, _, _, _, _) => n -> best }
    val total = results.map(_._2).sum
    def json(entries: Seq[(String, Double)]): String =
      entries.map { case (k, v) => "\"" + k + "\":" + r3(v) }.mkString("{", ",", "}")
    val detailTakes = takes
      .map { case (n, _, t1, t2, g1, g2, _) =>
        "\"" + n + "\":[" + r3(t1) + "," + r3(t2) + "," + r3(g1) + "," + r3(g2) + "]" }
      .mkString("{", ",", "}")
    val errJson = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    // Standalone arbiter pass: this host's in-window best-of-2 still swings
    // ~30% with correlated weather (r4 tr02, r5 m01/m02 were both "repro-
    // ducible" regressions that vanished standalone), so the 10 most
    // expensive queries get a third, fully-warm take with stage-metric
    // attribution. wall >> executor/cores ⇒ scheduler/host latency;
    // executor >> cpu ⇒ JIT/interpreter first-touch; recorded here so
    // regress-vs-noise triage reads one artifact instead of a judge round.
    @volatile var execMs = 0L
    @volatile var cpuNs = 0L
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        execMs += e.stageInfo.taskMetrics.executorRunTime
        cpuNs += e.stageInfo.taskMetrics.executorCpuTime
      }
    })
    val byName = SparkEntry.registry.map(q => q.name -> q).toMap
    val standalone = results.sortBy(-_._2).take(10).map { case (n, _) =>
      execMs = 0L; cpuNs = 0L
      val t0 = System.nanoTime()
      try byName(n).fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench-standalone] $n: ${e.getMessage}") }
      val wall = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      try { // drain the async listener bus before reading the counters (QueryTime pattern)
        val sc = spark.sparkContext
        val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
        bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
      } catch { case _: ReflectiveOperationException => Thread.sleep(300) }
      "\"" + n + "\":[" + r3(wall) + "," + r3(execMs / 1e3) + "," + r3(cpuNs / 1e9) + "]"
    }.mkString("{", ",", "}")
    Files.writeString(Paths.get("BENCH_DETAIL.json"),
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","timing":"best_of_2","n_queries":${results.size},"errors":$errJson,"queries":${json(results)},"takes":$detailTakes,"standalone":$standalone,"sf":"$sfDir"}""")
    val head = results.filter { case (k, _) => Headline.contains(k) }
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","n_queries":${results.size},"n_errors":${errors.size},"queries":${json(head)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
