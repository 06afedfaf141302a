package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY.md §7 M5).
  *
  * AQE's skew-join splitting handles most hot keys at runtime; these
  * explicit forms exist for the cases AQE can't restructure:
  *
  *   - [[saltedAgg]]: two-phase aggregation for hot *grouping* keys — a
  *     random salt spreads one key over `salts` reducers, then a second
  *     (cheap, `salts`-way) aggregation removes the salt. Any
  *     algebraic aggregate (sum/count/min/max) composes.
  *   - [[saltedBroadcastLeft]]: replicate-broadcast pattern for a skewed
  *     join where the small side fits in memory — every hot-key row on the
  *     big side picks a random replica id, the small side is exploded
  *     `salts`× with all replica ids, and the join key becomes
  *     (key, replica).
  *
  * Partial aggregation already absorbs most grouping skew map-side; salting
  * matters when the distinct-count per hot key is itself huge (partials
  * don't collapse) or when the downstream operator is a join.
  */
object Skew {

  /** Two-phase (salted) aggregation: `sum`-shaped aggregates only need the
    * per-phase expressions supplied. Example:
    * {{{
    * saltedAgg(df, Seq(col("k")), 16,
    *   phase1 = Seq(sum("v").as("s"), count(lit(1)).as("n")),
    *   phase2 = Seq(sum("s").as("s"), sum("n").as("n")))
    * }}}
    */
  def saltedAgg(df: DataFrame, keys: Seq[Column], salts: Int,
      phase1: Seq[Column], phase2: Seq[Column]): DataFrame =
    df.withColumn("__salt", (rand(seed = 42) * salts).cast("int"))
      .groupBy(keys :+ col("__salt"): _*)
      .agg(phase1.head, phase1.tail: _*)
      .groupBy(keys: _*)
      .agg(phase2.head, phase2.tail: _*)

  /** Salted broadcast join: big (skewed) side vs small side on `key`. */
  def saltedBroadcastLeft(big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    val saltedBig = big.withColumn("__replica", (rand(seed = 42) * salts).cast("int"))
    val replicated = small
      .withColumn("__replica", explode(sequence(lit(0), lit(salts - 1)).cast("array<int>")))
    saltedBig.join(broadcast(replicated), Seq(key, "__replica"))
      .drop("__replica")
  }
}
