package graft

import java.nio.file.Files

import graft.sources.{Formats, Tables}
import org.apache.spark.sql.functions._

/** Storage-layer evidence: multi-format round trips, partitioned writes
  * with partition pruning, and bucketed tables joining without a shuffle —
  * the co-location mechanisms the 100 TB posture depends on.
  */
class StorageSpec extends SparkSpec {

  private def sample = Tables.lineitem(spark, sf0001)
    .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice", "l_returnflag")
    .limit(1000)

  test("parquet/orc/csv/json round trips preserve rows and values") {
    val src = sample
    val want = src.collect().map(_.toSeq).toSet
    val schema = src.schema
    Formats.supported.foreach { fmt =>
      val dir = Files.createTempDirectory(s"graft-$fmt").toString
      Formats.write(src, fmt, dir)
      val got = Formats.read(spark, fmt, dir, schema).collect().map(_.toSeq).toSet
      assert(got == want, s"$fmt round trip diverged")
    }
  }

  test("parquet compression codecs round-trip and are codec-stamped on disk") {
    val src = sample
    val want = src.collect().map(_.toSeq).toSet
    Seq("snappy" -> "snappy", "zstd" -> "zstd", "gzip" -> "gz").foreach { case (codec, ext) =>
      val dir = Files.createTempDirectory(s"graft-codec-$codec").toString
      src.write.mode("overwrite").option("compression", codec).parquet(dir)
      val files = new java.io.File(dir).listFiles().map(_.getName).filter(_.endsWith(".parquet"))
      assert(files.nonEmpty && files.forall(_.contains(s".$ext.")),
        s"$codec: files not codec-stamped: ${files.mkString(",")}")
      val got = spark.read.parquet(dir).collect().map(_.toSeq).toSet
      assert(got == want, s"$codec round trip diverged")
    }
  }

  test("maxRecordsPerFile bounds output file sizes (small-files / huge-files control)") {
    val dir = Files.createTempDirectory("graft-maxrec").toString
    sample.coalesce(1)
      .write.mode("overwrite").option("maxRecordsPerFile", 300).parquet(dir)
    val files = new java.io.File(dir).listFiles().map(_.getName).filter(_.endsWith(".parquet"))
    assert(files.length >= 4, s"1000 rows at 300/file should split into >=4 files, got ${files.length}")
    files.foreach { f =>
      val n = spark.read.parquet(s"$dir/$f").count()
      assert(n <= 300, s"$f holds $n rows > maxRecordsPerFile")
    }
  }

  test("file-provenance metadata column records source file per row") {
    val df = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("_metadata.file_name").as("src_file"))
    val names = df.select("src_file").distinct().collect().map(_.getString(0))
    assert(names.length == 1 && names.head == "documents.parquet",
      s"unexpected provenance: ${names.mkString(",")}")
    assert(df.count() == Tables.documents(spark, sf0001).count())
  }

  test("partitioned parquet write → scan prunes partitions on the filter") {
    val dir = Files.createTempDirectory("graft-part").toString
    Tables.events(spark, sf0001)
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val scan = spark.read.parquet(dir).filter(col("event_type") === "click")
    // executed file index must only touch the click partition
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), s"no partition filters in:\n$plan")
    val clicks = scan.count()
    val expected = Tables.events(spark, sf0001).filter(col("event_type") === "click").count()
    assert(clicks == expected)
  }

  test("bucketed tables join without a shuffle exchange") {
    spark.conf.set("spark.sql.adaptive.enabled", "false") // stable plan text
    // the fixture tables are broadcast-sized; disable broadcast so the
    // planner actually exercises the bucketed sort-merge path
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      Tables.orders(spark, sf0001)
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("b_orders")
      Tables.lineitem(spark, sf0001)
        .select(col("l_orderkey"), col("l_quantity"))
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("b_lineitem")

      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected sort-merge join:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == Tables.lineitem(spark, sf0001).count())
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("z-ordered files carry tighter per-file x+y bounds than natural-order files") {
    // The layout claim behind q77: range-partitioning + sorting on the
    // Morton key makes each FILE cover a small x×y rectangle, so the
    // min/max footer stats prune multi-dimensional predicates. Written
    // both ways, the z-ordered layout's mean per-file (x span + y span)
    // must be well under the natural layout's.
    val li = Tables.lineitem(spark, sf("sf0.01"))
      .select((col("l_partkey") % 1024).as("x"), (col("l_suppkey") % 1024).as("y"))
    val morton = (0 until 10).map { i =>
      shiftleft(col("x").bitwiseAND(lit(1L << i)), i)
        .bitwiseOR(shiftleft(col("y").bitwiseAND(lit(1L << i)), i + 1))
    }.reduce(_ bitwiseOR _)
    val dirPath = Files.createTempDirectory("graft-zorder")
    val dir = dirPath.toString
    try {
      li.withColumn("m", morton)
        .repartitionByRange(16, col("m")).sortWithinPartitions("m")
        .write.mode("overwrite").parquet(s"$dir/zorder")
      li.repartition(16).write.mode("overwrite").parquet(s"$dir/natural")
      def meanFileSpan(path: String): Double = {
        val spans = spark.read.parquet(path)
          .withColumn("f", input_file_name())
          .groupBy("f")
          .agg((max("x") - min("x") + max("y") - min("y")).as("span"))
          .collect().map(_.getAs[Long]("span"))
        spans.sum.toDouble / spans.length
      }
      val (z, nat) = (meanFileSpan(s"$dir/zorder"), meanFileSpan(s"$dir/natural"))
      assert(z < nat * 0.7, s"z-order span $z not clearly tighter than natural $nat")
    } finally {
      // ~sf0.01 of parquet per run otherwise leaks in the system tmp dir
      import scala.reflect.io.Directory
      new Directory(dirPath.toFile).deleteRecursively()
    }
  }
}
