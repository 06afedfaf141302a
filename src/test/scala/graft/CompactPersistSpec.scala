package graft

import java.nio.file.{Files, Paths}

import graft.operators.DedupQueries
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** The compact-cache convention (r10 verdict #2): a small expensive result
  * cached at full shuffle parallelism charges every downstream stage the
  * full near-empty task count (cached plans keep their materialized
  * partitioning — AQE shuffle coalescing does not apply to cache scans).
  * The fix pattern lives in [[DedupQueries.persistCompact]]; these tests
  * pin BOTH the helper's behavior and the convention that every
  * copurchasePairs consumer goes through it, so a future graph query
  * cannot regress the way r10's g06 did.
  */
class CompactPersistSpec extends SparkSpec {

  test("persistCompact re-partitions to the data-derived cacheParts count") {
    import spark.implicits._
    // a deliberately wide plan: 123 rows spread over 8 partitions
    val wide = (1 to 123).toDF("x").repartition(8)
    val (compact, parts) = DedupQueries.persistCompact(wide)
    try {
      assert(parts === DedupQueries.cacheParts(123L))
      assert(compact.rdd.getNumPartitions === parts)
      assert(compact.storageLevel !== StorageLevel.NONE, "compact frame must stay cached")
      assert(compact.as[Int].collect().sorted === (1 to 123).toArray)
    } finally compact.unpersist(blocking = false)
  }

  test("persistCompact drops the wide copy once the compact cache is filled") {
    import spark.implicits._
    val wide = (1 to 10).toDF("x").repartition(8)
    val (compact, _) = DedupQueries.persistCompact(wide)
    try {
      // unpersist(blocking = false) is async; the LOGICAL mark is immediate
      assert(wide.storageLevel === StorageLevel.NONE, "wide copy must be unpersisted")
    } finally compact.unpersist(blocking = false)
  }

  test("every copurchasePairs consumer uses persistCompact (source convention)") {
    // the graph family (and its copurchasePairs machinery) moved to
    // GraphQueries.scala in r13; scan both files so a future call site in
    // either module stays under the convention
    val src = Seq("GraphQueries", "DedupQueries").map { f =>
      new String(Files.readAllBytes(
        Paths.get(s"src/main/scala/graft/operators/$f.scala")), "UTF-8")
    }.mkString("\n")
    val calls = "copurchasePairs\\(s, dir\\)".r.findAllMatchIn(src).toList
    assert(calls.nonEmpty, "expected copurchasePairs call sites in GraphQueries")
    val bare = calls.filterNot { m =>
      src.lastIndexOf("persistCompact(", m.start) == m.start - "persistCompact(".length
    }
    val lines = bare.map(m => src.substring(0, m.start).count(_ == '\n') + 1)
    assert(bare.isEmpty,
      s"copurchasePairs call(s) at concatenated-source line(s) $lines bypass persistCompact — " +
        "cache the thresholded edge list through the shared helper (r10 g06 regression class)")
  }
}
