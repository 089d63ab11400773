package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between the public Column API and Catalyst expressions.
  *
  * Spark 4 moved Column onto the connect-compatible ColumnNode API and
  * made the classic converters `private[sql]`; extension libraries that
  * ship custom Catalyst expressions use a same-package shim like this
  * (the standard pattern across open-source Spark connectors). Only used
  * by graft.functions.VectorExpressions.
  */
object GraftShim {
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
}
