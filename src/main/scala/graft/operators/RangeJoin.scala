package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded range join — an operator Spark lacks natively (its planner turns
  * a pure inequality join into BroadcastNestedLoop/cartesian).
  *
  * Matches every left row to the right rows with the same key and
  * `rightTs` in `(leftTs - window, leftTs]` — the "all events in the
  * preceding W" shape (attribution windows, feature lookback, sessions).
  * Contrast [[AsOfJoin]], which keeps only the latest such row.
  *
  * Scale shape: right rows are bucketed at `floor(ts / window)`; a left
  * row's window can only span two adjacent buckets, so the left side is
  * exploded to exactly two probe keys and the join becomes a plain
  * equi-join on `(key, bucket)` plus a residual range filter. Cost is one
  * shuffle of 2|L| + |R| rows regardless of window size — never the
  * key-cartesian a naive `l.key = r.key AND r.ts BETWEEN ...` join plans
  * as. Each (left, right) pair meets in exactly one bucket (the right
  * row's), so no post-join dedup is needed.
  */
object RangeJoin {

  /** @param left      left rows; every column is carried through
    * @param right     right rows; every column is carried through
    * @param key       equi-join key column present on both sides
    * @param leftTsUs  left event-time column, microseconds since epoch
    * @param rightTsUs right event-time column, microseconds since epoch
    * @param windowUs  lookback width in microseconds (exclusive lower bound)
    */
  def preceding(left: DataFrame, right: DataFrame, key: String,
      leftTsUs: String, rightTsUs: String, windowUs: Long): DataFrame = {
    require(windowUs > 0, "window must be positive")
    val bucketedRight = right.withColumn("__bkt", floor(col(rightTsUs) / windowUs))
    val probes = left.withColumn("__bkt",
      explode(array(floor(col(leftTsUs) / windowUs), floor(col(leftTsUs) / windowUs) - 1)))
    probes.join(bucketedRight, Seq(key, "__bkt"))
      .filter(col(rightTsUs) <= col(leftTsUs) &&
        col(rightTsUs) > col(leftTsUs) - windowUs)
      .drop("__bkt")
  }
}
