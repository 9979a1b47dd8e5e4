package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Bridge between graft's Catalyst expressions and the public Column API.
 * `ExpressionUtils` is private[sql] in Spark 4.x, so this one-file shim
 * lives in an org.apache.spark.sql subpackage (standard extension-library
 * technique; uses only the public Apache Spark source).
 */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /**
   * Eagerly convert a Column to its Catalyst expression tree. Unlike
   * `expression` (which returns a lazy `ColumnNodeExpression` wrapper that
   * only DataFrame entry points unwrap), the result is a plain analyzable
   * tree — required when the expression is returned from a
   * FunctionRegistry builder, where no unwrapping pass runs.
   */
  def catalyst(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
