package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Batch source/sink formats (SURVEY.md §2.1 sources, generalized): one
  * reader/writer pair per storage format the distribution ships —
  * columnar (parquet, orc) and text (csv, json). Schema is always applied
  * explicitly on read: text formats don't carry types, and schema
  * inference is a full extra pass at 100 TB.
  *
  * Columnar formats keep vectorized reads + predicate pushdown + column
  * pruning; the text formats exist for interchange, not analytics — the
  * format comparison test documents the fidelity differences (e.g. CSV
  * has no array/map types, JSON loses timestamp_ntz nanos by default).
  */
object Formats {

  val supported: Seq[String] = Seq("parquet", "orc", "csv", "json")

  def write(df: DataFrame, format: String, path: String): Unit = {
    val w = df.write.mode("overwrite").format(format)
    (format match {
      case "csv" => w.option("header", "true")
      case _ => w
    }).save(path)
  }

  def read(spark: SparkSession, format: String, path: String, schema: StructType): DataFrame = {
    val r = spark.read.format(format).schema(schema)
    (format match {
      case "csv" => r.option("header", "true")
      case _ => r
    }).load(path)
  }
}
