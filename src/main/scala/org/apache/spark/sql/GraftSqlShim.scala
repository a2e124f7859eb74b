package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge for registering custom Catalyst expressions as Columns.
  * `classic.ExpressionUtils` is `private[sql]` in Spark 4.x, so extension
  * libraries conventionally expose it through a same-package shim.
  */
object GraftSqlShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
