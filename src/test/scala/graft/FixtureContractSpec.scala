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
}
