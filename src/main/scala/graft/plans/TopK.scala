package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.plans.logical.Sort
import org.apache.spark.sql.graft.ColumnShim

/** Column-API entry point for the custom top-k-per-group operator.
  *
  * {{{
  * // top 3 orders per customer by price (ties broken by orderkey)
  * TopK.perGroup(orders, 3, Seq("o_custkey"),
  *   Seq(orders("o_totalprice").desc, orders("o_orderkey").asc))
  * }}}
  *
  * Resolve order columns against the input frame (`df("c").desc`, not
  * `col("c").desc`) so the expressions bind to the analyzed plan.
  */
object TopK {
  def perGroup(df: DataFrame, k: Int, groupCols: Seq[String],
      orderCols: Seq[Column],
      spillThreshold: Int = TopKPerGroup.DefaultSpillThreshold): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    // run the sort columns through the analyzer (a throwaway Sort plan) so
    // the lazy column-node wrappers become real catalyst SortOrders
    val sorted = df.sort(orderCols: _*).queryExecution.analyzed.asInstanceOf[Sort]
    val child = sorted.child
    val groupExprs = groupCols.map { n =>
      child.output.find(_.name.equalsIgnoreCase(n)).getOrElse(
        throw new IllegalArgumentException(
          s"group column '$n' not in ${child.output.map(_.name).mkString(", ")}"))
    }
    ColumnShim.ofRows(spark,
      TopKPerGroup(k, groupExprs, sorted.order, child, spillThreshold))
  }
}
