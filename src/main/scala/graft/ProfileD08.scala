package graft

import graft.functions.VectorFunctions.cosineSim
import graft.sources.Tables
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway phase-level profiler for d08 (driver-bound wall time). */
object ProfileD08 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = spark
    @volatile var jobs = 0
    s.sparkContext.addSparkListener(new SparkListener {
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs += 1
    })
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    var t0 = System.nanoTime()
    def lap(name: String): Unit = {
      println(f"[d08] $name%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s  (jobs so far: $jobs)")
      t0 = System.nanoTime()
    }

    (1 to 3).foreach { take =>
      jobs = 0
      t0 = System.nanoTime()
      val threshold = 0.3
      val e = Tables.embeddings(s, dir)
      val a = e.select(col("label"), col("vec_id").as("id_a"), col("embedding").as("e_a"))
      val b = e.select(col("label"), col("vec_id").as("id_b"), col("embedding").as("e_b"))
      val pairs = a.join(b, "label")
        .filter(col("id_a") < col("id_b"))
        .filter(cosineSim(col("e_a"), col("e_b")) > threshold)
        .select("id_a", "id_b")
      val edges = pairs
        .select(explode(array(
          struct(col("id_a").as("u"), col("id_b").as("v")),
          struct(col("id_b").as("u"), col("id_a").as("v")))).as("e"))
        .select(col("e.u").as("u"), col("e.v").as("v"))
        .persist()
      edges.count()
      lap("edges+count")
      val nV = e.count()
      lap("vcount")
      s.conf.set("spark.sql.shuffle.partitions", "1")
      s.conf.set("spark.sql.adaptive.enabled", "false")
      s.conf.set("spark.sql.codegen.wholeStage", "false")

      def materialize(df: org.apache.spark.sql.DataFrame) = {
        val rdd = df.rdd.persist()
        (s.createDataFrame(rdd, df.schema), rdd)
      }
      var (labels, labelsRdd) = materialize(
        e.select(col("vec_id").as("node"), col("vec_id").as("lbl"))
          .union(edges.select(col("u").as("node"), col("v").as("lbl")))
          .groupBy("node").agg(min("lbl").as("lbl")))
      lap("seed-build")
      def jump(l: org.apache.spark.sql.DataFrame) =
        l.select(col("node"), col("lbl").as("mid"))
          .join(l.select(col("node").as("mid"), col("lbl")), "mid")
          .select(col("node"), col("lbl"))
      def step(l: org.apache.spark.sql.DataFrame) =
        edges.join(l.select(col("node").as("v"), col("lbl")), "v")
          .select(col("u").as("node"), col("lbl"))
          .union(jump(l))
          .groupBy("node").agg(min("lbl").as("lbl"))
      var prevSum = Long.MinValue
      var converged = false
      var i = 0
      while (!converged && i < 20) {
        val (mid, midRdd) = materialize(step(labels))
        val (next, nextRdd) = materialize(step(mid))
        lap(s"round-$i build")
        val nextSum = next.agg(sum("lbl")).head().getLong(0)
        lap(s"round-$i action")
        labelsRdd.unpersist(); midRdd.unpersist()
        labels = next; labelsRdd = nextRdd
        converged = nextSum == prevSum
        prevSum = nextSum
        i += 2
      }
      edges.unpersist()
      val out = labels.select(col("node").as("doc_id"), col("lbl").as("cluster_id"))
        .orderBy("doc_id").persist()
      out.count()
      labelsRdd.unpersist()
      lap("final")
      println(s"[d08] take $take done: converged after $i rounds, $jobs jobs, nV=$nV")
      s.conf.set("spark.sql.shuffle.partitions", "32")
      s.conf.set("spark.sql.adaptive.enabled", "true")
      s.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
