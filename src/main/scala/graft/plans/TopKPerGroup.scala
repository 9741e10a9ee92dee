package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

import scala.collection.mutable

/** Logical top-k-per-group: retain the first `k` rows of each group in
  * `order`. Spark's stock formulation (`row_number().over(window) <= k`)
  * fully sorts every group; this operator keeps a bounded k-heap per
  * group — O(n log k) work and O(groups x k) memory, the shape that wins
  * when groups are large and k is small (top-k per user over a 100 TB
  * event log).
  *
  * Registered by [[graft.plans.TopKStrategy]] (injected via
  * `org.apache.spark.sql.graft.GraftExtensions` or used directly through
  * [[graft.plans.TopK.perGroup]]).
  */
case class TopKPerGroup(
    k: Int,
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

case class TopKPerGroupExec(
    k: Int,
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  /** Co-locate each group on one partition; Spark inserts the hash
    * exchange (or reuses an existing partitioning) to satisfy this.
    * Empty `groupExprs` = global top-k: `ClusteredDistribution(Nil)` fails
    * Spark's internal require, so demand AllTuples (single partition)
    * instead — the k-heap then runs once over the whole input. */
  override def requiredChildDistribution: Seq[Distribution] =
    (if (groupExprs.isEmpty) AllTuples else ClusteredDistribution(groupExprs)) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    // locals only — codegen'd projection/ordering must be built per
    // partition on the executor, and the closure must not capture `this`
    val (kLocal, groupLocal, orderLocal, attrs) = (k, groupExprs, order, child.output)
    child.execute().mapPartitions({ rows =>
      val groupProj = UnsafeProjection.create(groupLocal, attrs)
      val ordering = RowOrdering.create(orderLocal, attrs)
      val k = kLocal
      val heaps = mutable.LinkedHashMap.empty[InternalRow, mutable.PriorityQueue[InternalRow]]
      // keep the WORST retained row on top so it's evicted first
      val evictionOrd: Ordering[InternalRow] = ordering
      rows.foreach { r =>
        val heap = heaps.getOrElseUpdate(groupProj(r).copy(),
          mutable.PriorityQueue.empty(evictionOrd))
        if (heap.size < k) heap.enqueue(r.copy())
        else if (ordering.lt(r, heap.head)) { heap.dequeue(); heap.enqueue(r.copy()) }
      }
      heaps.iterator.flatMap { case (_, heap) => heap.dequeueAll.reverseIterator }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(k, groups, order, child) =>
      TopKPerGroupExec(k, groups, order, planLater(child)) :: Nil
    case _ => Nil
  }
}
