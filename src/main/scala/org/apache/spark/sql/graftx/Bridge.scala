package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge.
  *
  * Spark 4 moved the classic `new Column(expr)` constructor behind
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is `private[sql]`.
  * Extension libraries that ship custom Catalyst expressions (our vector /
  * hash functions) need exactly these two conversions, so this object lives
  * inside the `org.apache.spark.sql` package tree to reach them — the same
  * technique Spark connector/extension projects use. Nothing else in the
  * codebase touches Spark internals.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
