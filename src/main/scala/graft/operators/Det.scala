package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic cross-engine rounding.
  *
  * `round(x, 2)` is NOT portable between Spark and DuckDB: Spark rounds the
  * shortest decimal representation of the double (`BigDecimal.valueOf`),
  * DuckDB rounds the exact binary value — so a sum that lands on an exact
  * `.xx5` tie (common with 2-decimal money inputs) rounds up in Spark and
  * down in DuckDB. Instead we evaluate the *same* IEEE-754 expression
  * `floor(x * 10^d + 0.5) / 10^d` in both dialects; identical inputs and
  * identical operation order give bit-identical doubles, so the driver's
  * hash compare can never hit a tie-break divergence.
  *
  * The oracle SQL writes the formula literally, e.g.
  * `floor((sum(x)) * 100 + 0.5) / 100`.
  */
object Det {
  /** 2-decimal deterministic round (money). */
  def r2(c: Column): Column = floor(c * 100 + lit(0.5)) / 100

  /** 4-decimal deterministic round (ratios/averages). */
  def r4(c: Column): Column = floor(c * 10000 + lit(0.5)) / 10000

  /** 6-decimal deterministic round (similarities). */
  def r6(c: Column): Column = floor(c * 1000000 + lit(0.5)) / 1000000

  /** Order-independent sum of a money expression, exposed as double.
    *
    * `sum(double)` is order-sensitive: Spark's parallel partial aggregates
    * and DuckDB's sequential scan accumulate in different orders, so large
    * group sums differ by ulps — and ~0.1% of groups then round to a
    * different cent. Casting the summand to DECIMAL(24,6) first makes the
    * sum exact (the fixture's money values have ≤6 true decimal digits, so
    * the cast itself is exact), and the final DECIMAL→DOUBLE conversion is
    * a single correctly-rounded step in both engines (unscaled value stays
    * below 2^53).
    *
    * SQL twin: `CAST(sum(CAST(e AS DECIMAL(24,6))) AS DOUBLE)`.
    */
  def dsum(c: Column): Column = sum(c.cast("decimal(24,6)")).cast("double")

  /** Exact-sum + deterministic 2dp round; SQL twin is [[Det.s2]]. */
  def dsum2(c: Column): Column = r2(dsum(c))

  /** Order-independent mean via exact sum / non-null count, rounded 4dp. */
  def davg4(c: Column): Column = r4(dsum(c) / count(c))

  /** Order-independent mean rounded 2dp. */
  def davg2(c: Column): Column = r2(dsum(c) / count(c))

  // SQL fragments mirrored exactly by the Column helpers above.
  def sraw(e: String): String = s"CAST(sum(CAST($e AS DECIMAL(24,6))) AS DOUBLE)"
  def s2(e: String): String = s"floor((${sraw(e)}) * 100 + 0.5) / 100"
  def a4(e: String): String = s"floor((${sraw(e)} / count($e)) * 10000 + 0.5) / 10000"
  def a2(e: String): String = s"floor((${sraw(e)} / count($e)) * 100 + 0.5) / 100"
}
