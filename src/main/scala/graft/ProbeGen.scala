package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Nonlinearity-probe corpus: a K× replication of a fixture corpus with
  * entity-disjoint replicas, for measuring how the scale-sensitive
  * operators' cost grows with corpus size (r6 verdict #7 — a 10× corpus
  * should cost ~10×, not 100×).
  *
  * Replication must not distort the workload's JOIN/DUP structure, only
  * scale it — each replica is made DISJOINT from the others:
  *   - ids (doc/event/user/order/cust/supp keys) are offset per replica, so
  *     the g01/d08 graphs become K disjoint copies (linear work is then the
  *     correct expectation) and per-user streaming state grows K×;
  *   - document text gets a replica-salted prefix on every 5th token: every
  *     10-token shingle window crosses a salted token, so MinHash/SimHash
  *     similarity across replicas collapses to ~0 while pairs WITHIN a
  *     replica keep their original similarity (the same positional salting
  *     is applied to both members). Without this, d04's banded join would
  *     see every band bucket grow K× denser and pair candidates K²× — a
  *     data distortion, not an algorithmic nonlinearity.
  *   - event timestamps are kept (densification: K× events per window),
  *     which scales q71's per-user spine count and st06's key space
  *     linearly with K.
  *
  * Usage: `sbt "runMain graft.ProbeGen <inDir> <outDir> <K> [hub]"`.
  *
  * `hub` mode (r14 verdict #3): entity-disjoint replication holds every
  * node's degree CONSTANT by construction, which is exactly why the
  * 10×/100× tiers structurally cannot surface per-key quadratic growth —
  * the g05/g14 wedge middle's failure class. In hub mode ONE part (the
  * input corpus's highest-order-count part, deterministic) keeps its id
  * UN-offset across lineitem replicas, so its co-purchase degree grows
  * ~K× (each replica contributes a disjoint partner set) while every
  * other degree stays constant: wedges centered on the hub grow ~K², the
  * hub-growth signal the capped-vs-uncapped probe row measures (see
  * [[WedgeProbe]] and README's probe table).
  */
object ProbeGen {
  def main(args: Array[String]): Unit = {
    require(args.length == 3 || (args.length == 4 && args(3) == "hub"),
      "usage: ProbeGen <inDir> <outDir> <K> [hub]")
    val (inDir, outDir, k) = (args(0), args(1), args(2).toInt)
    val hubMode = args.length == 4
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val off = 10000000L // replica id offset; far above any fixture key

    def replicate(t: String)(perReplica: (DataFrame, Int) => DataFrame): Unit = {
      val base = spark.read.parquet(s"$inDir/$t.parquet")
      val out = (0 until k).map(i => perReplica(base, i)).reduce(_ unionAll _)
      // single file per table, mirroring the canonical corpus layout (and
      // st06's single-batch replay contract)
      out.coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$outDir/$t.parquet")
      println(s"[probegen] $t x$k")
    }

    replicate("documents") { (df, i) =>
      // EVERY token is replica-salted: d04's LSH runs 16 bands × 2 rows,
      // which catches j≈0.4 pairs with ~94% probability — an every-5th-token
      // salt left 2/5 of the 3-gram shingles intact across replicas
      // (j≈0.4), and the first probe run measured the resulting candidate
      // explosion as a phantom 58× cpu "nonlinearity". Prefixing all
      // tokens sends cross-replica similarity to 0 while keeping each
      // replica's internal pair structure exactly isomorphic to the
      // original (one shared prefix per replica shifts shingle VALUES,
      // not their equality relations or counts).
      df.withColumn("doc_id", col("doc_id") + lit(i * off))
        .withColumn("text",
          array_join(transform(split(col("text"), " "),
            tok => concat(lit(s"r${i}x"), tok)), " "))
    }
    replicate("embeddings") { (df, i) =>
      // label blocks are replica-local (+100·i): d08's candidate pairs are
      // blocked on label equality, so identical vectors across replicas
      // must not share a block (they'd form cosine-1.0 pairs, K²× growth)
      df.withColumn("vec_id", col("vec_id") + lit(i * off))
        .withColumn("label", col("label") + lit(i * 100))
    }
    replicate("events") { (df, i) =>
      // normalize ts to the canonical timestamp_ntz form so the probe corpus
      // is encoding-stable regardless of the source corpus generation
      graft.sources.Tables.normalizeEventTs(df)
        .withColumn("event_id", col("event_id") + lit(i * off))
        .withColumn("user_id", col("user_id") + lit(i * off))
    }
    replicate("orders") { (df, i) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(i * off))
        .withColumn("o_custkey", col("o_custkey") + lit(i * off))
    }
    // hub mode: the shared-hub part id = the max-DEGREE node of the
    // support-2 co-purchase graph (NOT the most-orders part — at sf0.1
    // that part has zero support-2 edges, so replicating it grows
    // nothing). Tie-break smallest key. A driver-side scalar, the
    // loop-control collect class.
    val hubKey: Long =
      if (!hubMode) -1L
      else {
        val ob = spark.read.parquet(s"$inDir/lineitem.parquet")
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
        val pairs = ob.as("a")
          .join(ob.as("b"), col("a.o") === col("b.o") && col("a.p") < col("b.p"))
          .groupBy(col("a.p").as("u"), col("b.p").as("v"))
          .agg(count(lit(1)).as("s")).filter(col("s") >= 2)
        pairs.select(col("u").as("x")).unionAll(pairs.select(col("v").as("x")))
          .groupBy("x").agg(count(lit(1)).as("d"))
          .orderBy(col("d").desc, col("x"))
          .limit(1).collect()(0).getAs[Number]("x").longValue()
      }
    if (hubMode) println(s"[probegen] hub mode: shared part $hubKey")

    replicate("lineitem") { (df, i) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(i * off))
        // replicas stay suppkey-disjoint at any K, but the +1e6 supplier
        // node offset in g01's trade graph is only collision-free below
        // K=10 (at K=100, replica-99 supplier nodes reach 1.09e7 and land
        // inside replica-1's customer id space) — so the 100x probe tier
        // excludes the trade-graph queries (g01/g09); the co-purchase
        // family (partkey ids, offset i*off) is collision-free at any K
        .withColumn("l_suppkey", col("l_suppkey") + lit(i * off / 100))
        .withColumn("l_partkey",
          if (hubMode)
            when(col("l_partkey") === hubKey, lit(hubKey))
              .otherwise(col("l_partkey") + lit(i * off))
          else col("l_partkey") + lit(i * off))
    }
    // remaining tables copied as-is (dims; not on any probe query's path)
    for (t <- Seq("region", "nation", "customer", "supplier", "part")) {
      spark.read.parquet(s"$inDir/$t.parquet")
        .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$outDir/$t.parquet")
      println(s"[probegen] $t copied")
    }
    println(s"[probegen] wrote ${k}x probe corpus: $inDir -> $outDir")
    spark.stop()
  }
}

/** Capped-vs-uncapped wedge-join probe (r14 verdict #3's "done" row):
  * times g14's [[graft.operators.GraphQueries.adamicAdar]] at a given
  * `middleCap` over `SPARK_GRAFT_SF_DIR` — point it at a [[ProbeGen]]
  * `hub`-mode corpus to measure how the planted hub's ~K² wedge growth
  * responds to the cap (QueryTime can't express the capped variant: the
  * registry entry is contractually uncapped so its oracle replays).
  * Session/timing shape mirrors [[QueryTime]] (noop sink, warm takes,
  * wall seconds on stdout).
  *
  * Usage: `runMain graft.WedgeProbe <middleCap> [takes]`.
  */
object WedgeProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: WedgeProbe <middleCap> [takes]")
    val middleCap = args(0).toInt
    val takes = if (args.length > 1) args(1).toInt else 3
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
    // candidate volume is the quantity the cap bounds — report it beside
    // wall time (at probe scales fixed session costs can drown the join)
    val cands = graft.operators.GraphQueries
      .wedgeCandidates(spark, sfDir, middleCap).count()
    println(s"[wedgeprobe] g14 cap=$middleCap wedge candidates: $cands")
    (1 to takes).foreach { i =>
      val t0 = System.nanoTime()
      graft.operators.GraphQueries.adamicAdar(spark, sfDir, middleCap)
        .write.format("noop").mode("overwrite").save()
      val elapsed = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"[wedgeprobe] g14 cap=$middleCap take $i: $elapsed%.2f s wall")
    }
    spark.stop()
  }
}

/** g15 `broadcastRanks` A/B (r15 verdict #1): times [[graft.operators
  * .GraphQueries.hitsRanking]] in both knob positions — `true` broadcasts
  * the node-sized rank tables into the cached edge list (the measured
  * bench plan), `false` runs the rank joins shuffle-hash co-partitioned
  * on the edge key (the plan that survives a 1e9-node corpus where an
  * O(V) broadcast would materialize on the driver). Session/timing shape
  * mirrors [[WedgeProbe]].
  *
  * Usage: `runMain graft.HitsProbe <true|false> [takes]`.
  */
object HitsProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: HitsProbe <true|false> [takes]")
    val broadcastRanks = args(0).toBoolean
    val takes = if (args.length > 1) args(1).toInt else 3
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
    (1 to takes).foreach { i =>
      val t0 = System.nanoTime()
      graft.operators.GraphQueries.hitsRanking(spark, sfDir, broadcastRanks)
        .write.format("noop").mode("overwrite").save()
      val elapsed = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"[hitsprobe] g15 broadcastRanks=$broadcastRanks take $i: $elapsed%.2f s wall")
    }
    spark.stop()
  }
}

/** m14 `batchShards` A/B (r16 verdict #1): times [[graft.operators
  * .MultimodalQueries.aspectBuckets]] in both knob positions — `0` is the
  * oracle-replayed global per-bucket assembly (7-key windows), `S > 0`
  * assembles within (bucket, splitmix-shard) partitions (the plan that
  * survives a corpus where corpus/7 rows per window partition cannot).
  * Also prints the max assembly-partition row count each position
  * funnels (the quantity the knob bounds). Session/timing shape mirrors
  * [[HitsProbe]].
  *
  * Usage: `runMain graft.AspectProbe <batchShards> [takes]`.
  */
object AspectProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: AspectProbe <batchShards> [takes]")
    val batchShards = args(0).toLong
    val takes = if (args.length > 1) args(1).toInt else 3
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
    val maxPart = graft.operators.MultimodalQueries
      .aspectBatchMaxPartition(spark, sfDir, batchShards)
    println(s"[aspectprobe] m14 batchShards=$batchShards max assembly partition rows: $maxPart")
    (1 to takes).foreach { i =>
      val t0 = System.nanoTime()
      graft.operators.MultimodalQueries.aspectBuckets(spark, sfDir, batchShards)
        .write.format("noop").mode("overwrite").save()
      val elapsed = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"[aspectprobe] m14 batchShards=$batchShards take $i: $elapsed%.2f s wall")
    }
    spark.stop()
  }
}
