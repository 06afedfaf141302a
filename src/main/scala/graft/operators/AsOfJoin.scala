package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Backward as-of join — an operator Spark lacks natively, composed from
  * built-ins per the preference order (SURVEY.md: compose > custom plan).
  *
  * Each left row is matched to the single right row with the greatest
  * `rightTs <= leftTs` for the same key (LEFT OUTER semantics: unmatched
  * left rows keep a null match), i.e. DuckDB's `ASOF LEFT JOIN`.
  *
  * Implementation: tag both inputs, union, and take a running
  * `last(right_payload, ignoreNulls)` over a (key)-partitioned,
  * time-ordered window — right rows sort before left rows at equal
  * timestamps so `<=` matches apply. This is ONE shuffle on the join key
  * and linear per-partition state: no range-explosion, no per-key sort
  * beyond the window's, and perfectly skew-splittable by AQE — the shape
  * that survives a 100 TB event table, unlike an inequality join
  * (O(n·m) per key) or a per-key collect.
  */
object AsOfJoin {

  /** @param tieBreak right-side column ordering concurrent right rows at
    *                 the same (key, ts); the greatest wins.
    */
  def backward(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, tieBreak: String): DataFrame = {
    val lStruct = StructType(left.schema.fields)
    val rStruct = StructType(right.schema.fields)

    val l = left.select(
      col(key).as("__k"), col(leftTs).as("__t"), lit(1).as("__side"),
      struct(left.columns.map(col): _*).as("__l"),
      lit(null).cast(rStruct).as("__r"))
    val r = right.select(
      col(key).as("__k"), col(rightTs).as("__t"), lit(0).as("__side"),
      lit(null).cast(lStruct).as("__l"),
      struct(right.columns.map(col): _*).as("__r"))

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"), asc_nulls_first(s"__r.$tieBreak"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__l").as("left"), col("__match").as("right"))
  }

  /** Nearest as-of join: each left row matches the right row minimizing
    * |rightTs − leftTs| within `toleranceUs` microseconds (LEFT OUTER —
    * no candidate in tolerance keeps a null match). Equidistant
    * backward/forward candidates resolve BACKWARD; concurrent right rows
    * at the matched timestamp resolve to the greatest `tieBreak` on the
    * backward side and the least on the forward side (the window's scan
    * order — document, don't fight it). Same single-shuffle union+window
    * shape as [[backward]]: the forward candidate is a `first(...)` over
    * the mirrored frame of the SAME window, not a second shuffle, so cost
    * and skew behavior are identical to the backward join's.
    */
  def nearest(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, tieBreak: String,
      toleranceUs: Long): DataFrame = {
    val lStruct = StructType(left.schema.fields)
    val rStruct = StructType(right.schema.fields)

    val l = left.select(
      col(key).as("__k"), col(leftTs).as("__t"), lit(1).as("__side"),
      struct(left.columns.map(col): _*).as("__l"),
      lit(null).cast(rStruct).as("__r"))
    val r = right.select(
      col(key).as("__k"), col(rightTs).as("__t"), lit(0).as("__side"),
      lit(null).cast(lStruct).as("__l"),
      struct(right.columns.map(col): _*).as("__r"))

    // right rows sort before left rows at equal timestamps, so an
    // equal-ts right row lands in the BACKWARD frame with Δ = 0
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"), asc_nulls_first(s"__r.$tieBreak"))
    val prevF = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val nextF = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val t = (c: String) => unix_micros(col(c).cast("timestamp"))
    val dPrev = t("__t") - unix_micros(col(s"__prev.$rightTs").cast("timestamp"))
    val dNext = unix_micros(col(s"__next.$rightTs").cast("timestamp")) - t("__t")
    l.unionByName(r)
      .withColumn("__prev", last(col("__r"), ignoreNulls = true).over(prevF))
      .withColumn("__next", first(col("__r"), ignoreNulls = true).over(nextF))
      .filter(col("__side") === 1)
      .withColumn("__match",
        when(col("__prev").isNotNull && dPrev <= toleranceUs &&
          (col("__next").isNull || dNext > toleranceUs || dPrev <= dNext), col("__prev"))
          .when(col("__next").isNotNull && dNext <= toleranceUs, col("__next")))
      .select(col("__l").as("left"), col("__match").as("right"))
  }
}
