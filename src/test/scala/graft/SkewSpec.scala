package graft

import java.nio.file.Files

import graft.operators.DedupQueries
import graft.functions.{HashFunctions, TextFunctions}
import org.apache.spark.sql.functions._

/** Measured banding-join skew defence (r12 verdict #4: "measure the
  * df-cap + AQE claim instead of arguing it").
  *
  * SURVEY §9 claims d04's stop-gram/flood skew is handled by the df-cap
  * prefilter plus AQE's skew split. This suite PLANTS the skew — a flood
  * of identical documents whose signatures collide in every band, the
  * worst case for a banding join (quadratic candidate blowup concentrated
  * in single buckets) — and pins both defences:
  *
  *  1. the df-cap (`lshNearDups(bucketCap=...)`) drops exactly the flood
  *     buckets: candidate volume collapses from O(flood²) to the
  *     background level with ZERO recall loss outside the flood;
  *  2. AQE's skew-join handling, at deployment-shaped thresholds, splits
  *     the oversized banding-join partition (plan shows `skew=true` on
  *     the sort-merge join) — the runtime defence for floods that survive
  *     a mis-set cap.
  *
  * The measured numbers (candidate counts, split engagement) are recorded
  * in README's skew-defence note.
  */
class SkewSpec extends SparkSpec {

  /** 64 identical docs (the flood), 200 distinct background docs, one
    * true near-dup pair (j = 16/18 ≈ 0.89) outside the flood.
    */
  private lazy val plantedDir: String = {
    import spark.implicits._
    val flood = (0 until 64).map(i =>
      (1000L + i, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
    val background = (0 until 200).map(i =>
      (2000L + i, (0 until 12).map(j => s"bg${i}w$j").mkString(" ")))
    val base = (0 until 20).map(j => s"near$j")
    val nearDup = Seq(
      (3000L, base.mkString(" ")),
      (3001L, (base.dropRight(1) :+ "nearX").mkString(" ")))
    val dir = Files.createTempDirectory("graft-skew").toString
    (flood ++ background ++ nearDup).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("planted"))
      .withColumn("n_chars", length(col("text")))
      .repartition(8)
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("df-cap prefilter drops exactly the flood buckets (zero recall loss outside the flood)") {
    val uncapped = pairSet(DedupQueries.lshNearDups(spark, plantedDir))
    val capped = pairSet(DedupQueries.lshNearDups(spark, plantedDir, bucketCap = 32))
    val floodIds = (1000L until 1064L).toSet
    val floodPairs = uncapped.filter { case (a, b) => floodIds(a) && floodIds(b) }
    // the flood contributes its full quadratic pair set when uncapped
    assert(floodPairs.size === 64 * 63 / 2,
      s"expected C(64,2)=2016 flood pairs, got ${floodPairs.size}")
    // the planted near-dup outside the flood is found by BOTH runs
    assert(uncapped.contains((3000L, 3001L)) && capped.contains((3000L, 3001L)),
      "planted near-dup pair must survive the cap")
    // the cap removes the flood pairs and NOTHING else
    assert(capped === uncapped -- floodPairs,
      "df-cap must drop exactly the flood-internal pairs")
    info(s"candidate-pair volume: uncapped=${uncapped.size}, capped=${capped.size} " +
      s"(flood contribution ${floodPairs.size})")
  }

  test("AQE skew-join split engages on the flood bucket at deployment-shaped thresholds") {
    // A bigger flood for the runtime test: partition-level skew needs a
    // single reduce partition to dominate, and a flood class lands on 16
    // (band,key) buckets — so shuffle partitions ≫ 16 (each flood bucket
    // alone in its partition) and a 512-doc flood (512 band rows per
    // flood partition vs ~50-row background partitions).
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-skew-aqe").toString
    val flood = (0 until 512).map(i =>
      (1000L + i, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
    val background = (0 until 200).map(i =>
      (9000L + i, (0 until 12).map(j => s"aq${i}w$j").mkString(" ")))
    (flood ++ background).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("planted"))
      .withColumn("n_chars", length(col("text")))
      .repartition(8)
      .write.parquet(s"$dir/documents.parquet")
    // fresh session: AQE + skew-join thresholds scaled to the planted
    // corpus the way the 100 TB config scales them to real partitions
    // (factor/threshold/advisory are the knobs SURVEY §9 names)
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "64")
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // the exact d04 banding-join shape (band keys -> self-join on
    // (band, key)), built lazily so the optimizer — not a cache scan —
    // owns the exchanges the skew rule rewrites
    val toks = TextFunctions.tokens(col("text"))
    val banded = graft.sources.Tables.documents(s, dir)
      .select(col("doc_id"),
        posexplode(HashFunctions.shingleMinHashBands(toks, k = 32, n = 3, bands = 16, rows = 2))
          .as(Seq("band", "key")))
    val joined = banded
      .join(banded.select(col("band"), col("key"), col("doc_id").as("id_b")), Seq("band", "key"))
      .filter(col("doc_id") < col("id_b"))
    // execute THIS frame's own QueryExecution without collecting the
    // ~2M-row join output (a count() would plan a separate aggregate
    // query and leave joined's adaptive plan unfinal)
    val n = joined.queryExecution.toRdd.count()
    // 16 all-band collisions for every flood pair
    assert(n >= 16L * (512L * 511 / 2), s"flood must dominate the join: $n rows")
    val plan = joined.queryExecution.executedPlan.toString
    val skewJoins = "skew=true".r.findAllIn(plan).size
    assert(skewJoins > 0,
      s"expected the banding self-join to be rewritten with skew=true; plan:\n$plan")
    info(s"AQE rewrote the banding join with skew=true ($skewJoins join leg(s) split); " +
      s"join rows=$n")
  }
}
