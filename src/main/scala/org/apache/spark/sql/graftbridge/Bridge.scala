package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to Spark's `private[sql]` Column <-> Expression seam,
  * needed to expose custom Catalyst expressions as user-facing Columns in
  * Spark 4 (the `new Column(expr)` constructor is gone and
  * `ExpressionUtils` is package-private). Lives under org.apache.spark.sql
  * solely for access; contains no logic.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
