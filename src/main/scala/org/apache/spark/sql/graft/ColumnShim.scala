package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge from Catalyst `Expression` to the public `Column` API.
  *
  * Spark 4 unified `Column` around ColumnNode, so user libraries that
  * implement native (codegen'd) expressions need this one-liner inside
  * the `org.apache.spark.sql` package to lift them into DataFrame-land.
  * This is the standard extension-library pattern; no Spark internals
  * are modified.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
