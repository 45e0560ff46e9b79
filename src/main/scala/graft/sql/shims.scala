package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Bridge between the public Column API and Catalyst Expressions.
 * Spark 4 made `Column(expr)` private in favor of ColumnNode plumbing;
 * `org.apache.spark.sql.classic.ExpressionUtils` is `private[sql]`, so this
 * one-file shim lives in the spark.sql package to re-export the two
 * conversions the graft engine needs.
 */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
