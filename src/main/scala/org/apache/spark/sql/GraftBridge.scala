package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's private[sql] Column <-> Expression converters,
  * needed to expose custom Catalyst expressions (graft.plans.*) through
  * the public Column API. Lives in the spark.sql package on purpose;
  * keep it minimal.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
