package org.apache.spark.sql.graft

import graft.functions.DotProduct
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration of the engine's native expressions, so
  * `spark.sql("... graft_dot(a, b) ...")` works alongside the Column API
  * (graft.functions.VectorFunctions).
  *
  * Two entry points, matching Spark's two registration idioms:
  *  - [[GraftFunctions.register]]: imperative, for an existing session
  *  - [[GraftExtensions]]: `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`
  *    at session build time (the library-deployment path on a cluster)
  */
object GraftFunctions {
  private def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, s"graft_dot takes 2 arguments, got ${exprs.length}")
    DotProduct(exprs(0), exprs(1))
  }

  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      builder)

  def register(spark: SparkSession): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction("graft_dot", builder, "built-in")

  /** Apply registrations to an arbitrary registry (the `private[sql]`
    * registry types are why this lives in the shim package). */
  def registerInto(registry: FunctionRegistry): Unit =
    registry.createOrReplaceTempFunction("graft_dot", builder, "built-in")
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftFunctions.description)
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
  }
}
