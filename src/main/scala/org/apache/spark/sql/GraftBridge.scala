package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into Spark's private[sql] Column <-> Expression converters
  * and the Dataset factory, needed to expose custom Catalyst
  * expressions and logical operators (graft.plans.*) through the
  * public DataFrame API. Lives in the spark.sql package on purpose;
  * keep it minimal.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Eagerly convert a Column to its Catalyst expression tree.
    *
    * `expression` returns a LAZY ColumnNodeExpression wrapper, which
    * the Dataset API converts during its own plan construction — but a
    * hand-built LogicalPlan never goes through that conversion, so the
    * wrapper would survive analysis unresolved (and is not even
    * serializable). Custom operators must use this converter instead.
    */
  def catalyst(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** Wrap a custom LogicalPlan as a DataFrame (analyzer + optimizer +
    * planner run lazily as for any Dataset).
    */
  def dataset(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
