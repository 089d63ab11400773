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

  /** Dataset from a (resolved) logical plan — the DatasetFactory
    * pattern custom-plan libraries use; `Dataset.ofRows` is
    * `private[sql]`. */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** A DataFrame's ANALYZED plan (resolved attributes, stable ids). */
  def analyzedPlan(df: DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed
}
