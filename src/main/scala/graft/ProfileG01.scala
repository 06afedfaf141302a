package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase profiler for g01 (r8 verdict #5): attributes executor CPU to the
  * edge-derivation DataFrame job, the RDD pack/partition step, and the
  * 2-iteration rank loop, to answer whether the 7-15 s executor CPU is
  * relational edge build, RDD serde, or loop arithmetic.
  *
  * r9 findings (sf0.1, warm takes, `sbt "runMain graft.ProfileG01 3"`):
  * relational edge build ~2.6-2.8 s cpu, RDD pack+partition+persist ~2 s
  * (including a re-run of the relational plan in this harness — the real
  * query runs it once), nodeDeg ~0.5 s, the rank loop ~1.3-1.4 s. The
  * "edge+degree DF variant" phase keeps the measured negative result:
  * pre-distincting (l_orderkey, l_suppkey) + forcing broadcast(orders)
  * reads 8-10 s — 3× worse — because the pre-distinct is an extra
  * fact-sized shuffle and AQE already broadcasts the projected orders
  * side. Conclusion recorded in g01's scaladoc: the cost is the one
  * fact-table pass, not RDD serde, and the pass is already minimal.
  */
object ProfileG01 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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

    (1 to (if (args.nonEmpty) args(0).toInt else 3)).foreach { take =>
      println(s"=== take $take ===")
      import spark.implicits._
      import org.apache.spark.HashPartitioner
      import org.apache.spark.storage.StorageLevel
      val s = spark; val dir = sfDir
      val e0 = graft.sources.Tables.orders(s, dir)
        .join(graft.sources.Tables.lineitem(s, dir), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").cast("long").as("c"),
          (col("l_suppkey").cast("long") + 1000000L).as("s"))
        .distinct()
      val edgesDf = e0.select(col("c").as("src"), col("s").as("dst"))
        .unionAll(e0.select(col("s").as("src"), col("c").as("dst")))
      val eUpper = phase("lineitem count")(graft.sources.Tables.lineitem(s, dir).count())
      val part = new HashPartitioner(
        math.max(8L, math.min(1024L, eUpper / 250000L)).toInt)
      val DegBits = 21
      val DegMask = (1L << DegBits) - 1
      val degDf = edgesDf.groupBy("src").agg(count(lit(1)).cast("long").as("d"))
      // phase A: the relational edge+degree build materialized to a noop
      // sink (no RDD conversion) — isolates Catalyst-side cost
      phase("edge+degree DF (noop)") {
        edgesDf.join(degDf, "src").write.format("noop").mode("overwrite").save()
      }
      // variant: pre-distinct the (orderkey, suppkey) pairs before the
      // join and force-broadcast the 2-column orders projection
      val e0v = graft.sources.Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_suppkey")).distinct()
        .join(broadcast(graft.sources.Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_custkey"))),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").cast("long").as("c"),
          (col("l_suppkey").cast("long") + 1000000L).as("s"))
        .distinct()
      val edgesV = e0v.select(col("c").as("src"), col("s").as("dst"))
        .unionAll(e0v.select(col("s").as("src"), col("c").as("dst")))
      val degV = edgesV.groupBy("src").agg(count(lit(1)).cast("long").as("d"))
      phase("edge+degree DF variant") {
        edgesV.join(degV, "src").write.format("noop").mode("overwrite").save()
      }
      // phase B: same plan through .rdd + pack + partitionBy + persist
      val edgeRdd = edgesDf.join(degDf, "src")
        .select(col("src"), col("dst"), col("d")).as[(Long, Long, Long)].rdd
        .map { case (src, dst, d) => (src, (dst << DegBits) | d) }
        .partitionBy(part).persist(StorageLevel.MEMORY_AND_DISK)
      phase("edgeRdd build+persist")(edgeRdd.count())
      val nodeDeg = edgeRdd.mapValues(_ & DegMask).reduceByKey(part, (a, _) => a)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val n = phase("nodeDeg derive")(nodeDeg.count())
      val base = 150000000000L / n
      var ranks = nodeDeg.mapValues(_ => 1000000000000L / n)
      phase("2-iter rank loop + top20") {
        for (_ <- 1 to 2) {
          val contrib = edgeRdd.zipPartitions(ranks, preservesPartitioning = false) {
            (es, rs) =>
              val rank = scala.collection.mutable.LongMap.empty[Long]
              rs.foreach { kv => rank(kv._1) = kv._2 }
              val acc = scala.collection.mutable.LongMap.empty[Long]
              es.foreach { case (src, packed) =>
                val r = rank(src)
                acc(packed >>> DegBits) = acc.getOrElse(packed >>> DegBits, 0L) + r / (packed & DegMask)
              }
              acc.iterator
          }.reduceByKey(part, _ + _)
          ranks = nodeDeg.zipPartitions(contrib, preservesPartitioning = true) {
            (ns, cs) =>
              val m = scala.collection.mutable.LongMap.empty[Long]
              cs.foreach { kv => m(kv._1) = kv._2 }
              ns.map { kv => (kv._1, base + (85L * m.getOrElse(kv._1, 0L)) / 100L) }
          }
        }
        val out = ranks.toDF("node", "rank_scaled")
          .orderBy(desc("rank_scaled"), col("node"))
          .limit(20)
        out.write.format("noop").mode("overwrite").save()
      }
      edgeRdd.unpersist(); nodeDeg.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
