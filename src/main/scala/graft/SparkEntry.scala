package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is assembled from per-module registries; each module covers one
  * slice of the SURVEY §2 inventory (relational gap-fill, events/streaming
  * analogue, text analysis, dedup, similarity, multimodal, trade stream).
  */
object SparkEntry {

  /** Full capability inventory. Order is stable (module order, then
    * declaration order) so round-over-round diffs are readable.
    */
  val registry: Seq[GraftQuery] =
    RelationalQueries.all ++ WindowQueries.all ++ EventQueries.all ++
      FunctionQueries.all ++ TextQueries.all ++ SimilarityQueries.all ++
      DedupQueries.all ++ GraphQueries.all ++ MultimodalQueries.all ++ TradeQueries.all ++
      AggregateQueries.all ++ StreamingQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Q5-shaped 6-way join through the broadcast region/nation dims.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q05_local_supplier_volume")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops (those
    * are asserted in the ScalaTest suite instead).
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
