package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the private[sql] Column <-> Expression converters (Spark 4
  * moved them behind `classic.ExpressionUtils`). Standard extension-library
  * pattern: a single object in the org.apache.spark.sql package scope.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
