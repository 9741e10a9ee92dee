package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public Column API and Catalyst expressions.
  *
  * Spark 4 hides `ExpressionUtils` behind `private[sql]`; this shim lives
  * in a subpackage of `org.apache.spark.sql` purely to re-export the two
  * conversions the graft engine needs for its native expressions
  * (e.g. graft.functions.DotProduct). No Spark internals are modified.
  */
object ColumnShim {
  def column(e: Expression): Column  = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame from a raw logical plan (`Dataset.ofRows` is private[sql]) —
    * how graft's custom logical operators (graft.plans) enter the API. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
