package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase profiler for tr00 (r9 verdict #2): attributes executor CPU across
  * the pipeline's four stages — hash-indexed generation
  * (TradeSource.trades), the Jackson encode (Envelope.encode), the
  * PERMISSIVE decode (Envelope.decode), and the windowed per-ticker stats
  * (TradePipeline.tickerStats) — to settle whether r9's in-bench 2.40 s
  * (vs r8's 0.73) was the new generator or something else.
  *
  * Each phase materializes its prefix of the pipeline to a noop sink, so
  * phase deltas are the incremental cost of the added stage (prefixes are
  * recomputed, not cached — caching would change what is being measured;
  * generation is pure codegen'd Column arithmetic, so the recompute is the
  * cheap part by construction).
  */
object ProfileTr00 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var execMs = 0L
    @volatile var cpuNs = 0L
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        execMs += e.stageInfo.taskMetrics.executorRunTime
        cpuNs += e.stageInfo.taskMetrics.executorCpuTime
      }
    })
    def drain(): Unit = try {
      val sc = spark.sparkContext
      val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
      bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
    } catch { case _: ReflectiveOperationException => Thread.sleep(300) }
    def phase[T](name: String)(f: => T): T = {
      drain(); execMs = 0L; cpuNs = 0L
      val t0 = System.nanoTime()
      val r = f
      val wall = (System.nanoTime() - t0) / 1e9
      drain()
      println(f"[profile] $name%-28s wall=$wall%6.2f s exec=${execMs / 1e3}%7.2f s cpu=${cpuNs / 1e9}%7.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val n = 1000000L
    (1 to (if (args.nonEmpty) args(0).toInt else 3)).foreach { take =>
      println(s"=== take $take ===")
      phase("generate (noop)") {
        noop(graft.sources.TradeSource.trades(spark, n).toDF())
      }
      phase("generate+encodeJackson (noop)") {
        noop(graft.streaming.Envelope.encode(
          graft.sources.TradeSource.trades(spark, n).toDF()))
      }
      phase("generate+encodeFast (noop)") {
        noop(graft.streaming.Envelope.encodeFast(
          graft.sources.TradeSource.trades(spark, n).toDF()))
      }
      phase("generate+encFast+decode (noop)") {
        noop(graft.streaming.Envelope.decode(graft.streaming.Envelope.encodeFast(
          graft.sources.TradeSource.trades(spark, n).toDF())))
      }
      phase("full tr00 (noop)") {
        val decoded = graft.streaming.Envelope.decode(graft.streaming.Envelope.encodeFast(
          graft.sources.TradeSource.trades(spark, n).toDF()))
        noop(graft.streaming.TradePipeline.tickerStats(decoded, window_ = "10 seconds")
          .select(col("tickerSymbol"), col("n_trades"), col("sum_qty"), col("vwap")))
      }
    }
    spark.stop()
  }
}
