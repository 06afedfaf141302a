package graft

import graft.sources.{FixtureContract, Tables}

/** Schema-drift tripwire (r7 verdict #6): when the driver regenerates
  * /root/testdata, the FIRST failure anyone sees must name the drifted
  * column — not 30 erroring registry queries with DATATYPE_MISMATCH
  * stack traces. One test per table, independent, so a single drifted
  * table reads as exactly one red line.
  */
class FixtureContractSpec extends SparkSpec {
  // the raw read needs the legacy flag in case the corpus reverts to nanos
  Tables.names.foreach { t =>
    test(s"$t matches the FIXTURES.md schema contract") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val drift = FixtureContract.diffTable(spark, sf0001, t)
      assert(drift.isEmpty, "\nSCHEMA DRIFT — corpus regenerated?\n" +
        drift.mkString("  ", "\n  ", "\n") +
        "Update FIXTURES.md + Tables loaders (see Tables.normalizeEventTs).")
    }
  }

  test("a Layout-written (partitioned) corpus passes the contract — the " +
    "trailing partition column is tolerated, not reported as order drift") {
    // r8 advisory: partitionBy moves c_mktsegment/o_orderpriority/
    // l_returnflag/event_type/lang to the END of the read-back schema;
    // the tripwire must not cry wolf on its own layout corpus.
    val out = java.nio.file.Files.createTempDirectory("graft-layout-contract").toString
    try {
      graft.sources.Layout.writeLayout(spark, sf0001, out)
      val drift = FixtureContract.diff(spark, out)
      assert(drift.isEmpty, "\nfalse SCHEMA DRIFT on a layout corpus:\n" +
        drift.mkString("  ", "\n  ", "\n"))
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(out)).iterator().asScala.toSeq
        .sortBy(-_.getNameCount).foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("normalizeEventTs: nanos-magnitude longs normalize; micros-magnitude " +
    "longs raise instead of silently shifting 1000x") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val nanos = 1700000000000000000L // 2023-11-14T22:13:20 in ns
    val ok = Tables.normalizeEventTs(Seq(nanos).toDF("ts"))
      .select(col("ts").cast("string")).head.getString(0)
    assert(ok == "2023-11-14 22:13:20", s"nanos branch mis-normalized: $ok")
    val micros = nanos / 1000 // same instant encoded as µs in a plain bigint
    val e = intercept[Exception] {
      Tables.normalizeEventTs(Seq(micros).toDF("ts")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("plausible nanosecond epoch range")),
      s"expected the magnitude tripwire, got: ${msgs(e).mkString(" | ")}")
  }

  test("a NON-partition column relocated to the end still reports drift") {
    // r9 advisory: the trailing tolerance must accept only the table's
    // actual hive partition key (Layout.partitionCol) — a corpus
    // regenerated with e.g. doc_id written last is silent drift for the
    // positional Row fixtures, not a layout signature
    val out = java.nio.file.Files.createTempDirectory("graft-tail-contract").toString
    try {
      spark.read.parquet(s"$sf0001/documents.parquet")
        .select("text", "lang", "source", "n_chars", "doc_id") // doc_id ≠ partition col "lang"
        .write.parquet(s"$out/documents.parquet")
      val drift = FixtureContract.diffTable(spark, out, "documents")
      assert(drift.exists(_.contains("column order")),
        s"non-partition trailing column not detected; got: $drift")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(out)).iterator().asScala.toSeq
        .sortBy(-_.getNameCount).foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("a genuinely permuted (non-trailing) column order still reports drift") {
    // guard the tolerance itself: reordering two mid-schema columns must
    // stay a loud failure — only the partitionBy trailing shape is allowed
    val out = java.nio.file.Files.createTempDirectory("graft-perm-contract").toString
    try {
      spark.read.parquet(s"$sf0001/documents.parquet")
        .select("doc_id", "lang", "text", "source", "n_chars") // text<->lang swapped
        .write.parquet(s"$out/documents.parquet")
      val drift = FixtureContract.diffTable(spark, out, "documents")
      assert(drift.exists(_.contains("column order")),
        s"mid-schema permutation not detected; got: $drift")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(out)).iterator().asScala.toSeq
        .sortBy(-_.getNameCount).foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }
}
