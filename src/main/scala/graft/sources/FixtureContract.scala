package graft.sources

import org.apache.spark.sql.SparkSession

/** Schema contract for the driver-generated corpus (FIXTURES.md) — the
  * round-8 tripwire for silent regenerations. Round 7 lost 30 registry
  * queries and 159 tests because `events.ts` moved from INT64
  * TIMESTAMP(NANOS) to `timestamp[us]` between rounds with no loud failure
  * anywhere; this object makes the drift ONE named diagnostic instead.
  *
  * Each column lists the ACCEPTED Spark type names (`DataType.simpleString`)
  * for the raw `spark.read.parquet` schema. Time-typed columns accept every
  * encoding the driver has ever shipped (legacy nanos-as-long ⇒ `bigint`,
  * `timestamp`, `timestamp_ntz`) because TESTDATA.md allows regeneration at
  * any time — [[Tables.normalizeEventTs]] canonicalizes at load. Anything
  * outside these sets is real drift the engine has never seen.
  */
object FixtureContract {

  private val ts: Set[String] = Set("bigint", "timestamp", "timestamp_ntz")

  val contract: Map[String, Seq[(String, Set[String])]] = Map(
    "region" -> Seq("r_regionkey" -> Set("int"), "r_name" -> Set("string")),
    "nation" -> Seq("n_nationkey" -> Set("int"), "n_name" -> Set("string"),
      "n_regionkey" -> Set("int")),
    "customer" -> Seq("c_custkey" -> Set("bigint"), "c_name" -> Set("string"),
      "c_nationkey" -> Set("int"), "c_acctbal" -> Set("double"),
      "c_mktsegment" -> Set("string")),
    "supplier" -> Seq("s_suppkey" -> Set("bigint"), "s_name" -> Set("string"),
      "s_nationkey" -> Set("int"), "s_acctbal" -> Set("double")),
    "part" -> Seq("p_partkey" -> Set("bigint"), "p_name" -> Set("string"),
      "p_brand" -> Set("string"), "p_type" -> Set("string"),
      "p_size" -> Set("int"), "p_retailprice" -> Set("double")),
    "orders" -> Seq("o_orderkey" -> Set("bigint"), "o_custkey" -> Set("bigint"),
      "o_orderstatus" -> Set("string"), "o_totalprice" -> Set("double"),
      "o_orderdate" -> (ts + "date"), "o_orderpriority" -> Set("string")),
    "lineitem" -> Seq("l_orderkey" -> Set("bigint"), "l_partkey" -> Set("bigint"),
      "l_suppkey" -> Set("bigint"), "l_linenumber" -> Set("int"),
      "l_quantity" -> Set("double"), "l_extendedprice" -> Set("double"),
      "l_discount" -> Set("double"), "l_tax" -> Set("double"),
      "l_returnflag" -> Set("string"), "l_linestatus" -> Set("string"),
      "l_shipdate" -> (ts + "date")),
    "events" -> Seq("event_id" -> Set("bigint"), "ts" -> ts,
      "user_id" -> Set("bigint"), "event_type" -> Set("string"),
      "value" -> Set("double"), "props" -> Set("string")),
    "documents" -> Seq("doc_id" -> Set("bigint"), "text" -> Set("string"),
      "lang" -> Set("string"), "source" -> Set("string"),
      "n_chars" -> Set("bigint")),
    "embeddings" -> Seq("vec_id" -> Set("bigint"),
      "embedding" -> Set("array<float>"), "label" -> Set("int")))

  /** Drift lines for one table's loaded schema vs the contract; empty = ok.
    * Column ORDER is part of the contract (positional Row fixtures depend on
    * it), with ONE tolerated exception: a single contract column relocated to
    * the end of the read-back schema, which is what parquet `partitionBy`
    * does to the partition key in the Layout corpus. Any other permutation
    * still reports drift.
    */
  def diffTable(spark: SparkSession, dir: String, table: String): Seq[String] = {
    val expected = contract(table)
    val actual =
      try spark.read.parquet(s"$dir/$table.parquet")
        .schema.fields.map(f => f.name -> f.dataType.simpleString).toSeq
      catch { case e: Throwable => return Seq(s"$table: unreadable (${e.getMessage})") }
    val actualMap = actual.toMap
    val missing = expected.collect { case (n, _) if !actualMap.contains(n) =>
      s"$table.$n: MISSING (contract ${expected.toMap.apply(n).mkString("|")})" }
    val extra = actual.collect { case (n, t) if !expected.exists(_._1 == n) =>
      s"$table.$n: UNEXPECTED column of type $t" }
    val mismatched = expected.collect {
      case (n, accepted) if actualMap.contains(n) && !accepted(actualMap(n)) =>
        s"$table.$n: type ${actualMap(n)} not in accepted {${accepted.mkString(", ")}}" }
    val orderDrift = {
      val expNames = expected.map(_._1)
      val actNames = actual.map(_._1).filter(expNames.contains)
      val aligned = expNames.filter(actNames.contains)
      // THE table's hive partition key (Layout.partitionCol) relocated to
      // the END is the partitioned-layout signature (parquet partitionBy
      // appends the partition key to the read-back schema); tolerate
      // exactly that shape — any OTHER column at the end (e.g. a corpus
      // regenerated with doc_id written last) is exactly the silent drift
      // the positional Row fixtures need reported.
      val trailingPartitionCol = actNames.nonEmpty &&
        Layout.partitionCol.get(table).contains(actNames.last) &&
        actNames == (aligned.filterNot(_ == actNames.last) :+ actNames.last)
      if (actNames == aligned || trailingPartitionCol) Nil
      else Seq(s"$table: column order ${actNames.mkString(",")} != contract ${expNames.mkString(",")}")
    }
    missing ++ extra ++ mismatched ++ orderDrift
  }

  /** All drift lines for a corpus dir; empty = corpus matches the contract. */
  def diff(spark: SparkSession, dir: String): Seq[String] =
    Tables.names.flatMap(t => diffTable(spark, dir, t))
}
