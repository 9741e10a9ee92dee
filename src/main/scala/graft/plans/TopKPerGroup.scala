package graft.plans

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException, File, FileInputStream, FileOutputStream}

import org.apache.spark.TaskContext
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

/** Logical top-k-per-group: retain the first `k` rows of each group in
  * `order`. Spark's stock formulation (`row_number().over(window) <= k`)
  * fully sorts every group; this operator keeps a bounded k-heap per
  * group — O(n log k) work and O(groups x k) memory, the shape that wins
  * when groups are large and k is small (top-k per user over a 100 TB
  * event log).
  *
  * Memory contract: the per-partition heap state is `groups x k` retained
  * rows. Past `spillThreshold` retained rows the operator spills sorted
  * runs to local disk and streams a k-way merge, so a high-cardinality
  * group key on a skewed partition degrades to sequential disk I/O
  * instead of OOM (the same guarantee Spark's sort-based window exec
  * gives, without paying its full per-group sort in the common case).
  *
  * Registered by [[graft.plans.TopKStrategy]] (injected via
  * `org.apache.spark.sql.graft.GraftExtensions` or used directly through
  * [[graft.plans.TopK.perGroup]]).
  */
case class TopKPerGroup(
    k: Int,
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    child: LogicalPlan,
    spillThreshold: Int = TopKPerGroup.DefaultSpillThreshold) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  require(spillThreshold > 0, s"spillThreshold must be positive, got $spillThreshold")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

object TopKPerGroup {
  /** Retained-row cap per partition before spilling (~1M rows; at a
    * typical 100B/row that is ~100MB of heap — comfortably inside an
    * executor's working memory at 32 tasks/host). */
  val DefaultSpillThreshold: Int = 1 << 20
}

case class TopKPerGroupExec(
    k: Int,
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    child: SparkPlan,
    spillThreshold: Int,
    partial: Boolean = false) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  /** Final mode: co-locate each group on one partition; Spark inserts
    * the hash exchange (or reuses an existing partitioning) to satisfy
    * this. Empty `groupExprs` = global top-k: `ClusteredDistribution
    * (Nil)` fails Spark's internal require, so demand AllTuples (single
    * partition) instead — the k-heap then runs once over the whole
    * input.
    *
    * PARTIAL mode (r12): no distribution requirement — the same k-heap
    * runs per input partition BEFORE the exchange, so at most
    * groups-in-partition × k rows survive to the shuffle (the map-side
    * combine of top-k; previously EVERY scored row shuffled — measured
    * n·NQueries records on the ANN queries). Partial-then-final is
    * exactly top-k because the final heap over per-partition survivors
    * selects the same rows the global heap would — PROVIDED the order
    * is total (every call site tie-breaks to a unique key, which the
    * oracle-determinism discipline already required of them). */
  override def requiredChildDistribution: Seq[Distribution] =
    (if (partial) UnspecifiedDistribution
     else if (groupExprs.isEmpty) AllTuples
     else ClusteredDistribution(groupExprs)) :: Nil

  override def nodeName: String =
    if (partial) "TopKPerGroupPartialExec" else "TopKPerGroupExec"

  override protected def doExecute(): RDD[InternalRow] = {
    // locals only — codegen'd projection/ordering must be built per
    // partition on the executor, and the closure must not capture `this`
    val (kLocal, groupLocal, orderLocal, attrs, spillAt) =
      (k, groupExprs, order, child.output, spillThreshold)
    child.execute().mapPartitions({ rows =>
      val groupProj = UnsafeProjection.create(groupLocal, attrs)
      val ordering = RowOrdering.create(orderLocal, attrs)
      val toUnsafe = UnsafeProjection.create(attrs.map(_.dataType).toArray)
      val k = kLocal
      // keep the WORST retained row on top so it's evicted first
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      var retained = 0
      val spills = ArrayBuffer.empty[File]

      // One spill = one run of groups sorted by group-key bytes, each with
      // its current top-k rows. Merging later is then a streaming k-way
      // merge over group-sorted runs: memory O(runs + k x runs) per group.
      def spill(): Unit = {
        // spills land under spark.local.dir (the executor's provisioned
        // scratch volume), not java.io.tmpdir, and count toward the task's
        // diskBytesSpilled so the UI shows them
        val file = org.apache.spark.graft.SpillShim.createSpillFile("graft-topk-spill")
        val out = new DataOutputStream(
          new BufferedOutputStream(new FileOutputStream(file), 1 << 16))
        try {
          val entries = heaps.iterator
            .map { case (g, h) => (g.getBytes, h) }.toArray
          java.util.Arrays.sort(entries,
            (a: (Array[Byte], mutable.PriorityQueue[InternalRow]),
             b: (Array[Byte], mutable.PriorityQueue[InternalRow])) =>
              java.util.Arrays.compareUnsigned(a._1, b._1))
          entries.foreach { case (gb, heap) =>
            out.writeInt(gb.length); out.write(gb)
            out.writeInt(heap.size)
            heap.foreach { r =>
              val u = r match {
                case ur: UnsafeRow => ur
                case other => toUnsafe(other)
              }
              val b = u.getBytes
              out.writeInt(b.length); out.write(b)
            }
          }
        } finally out.close()
        org.apache.spark.graft.SpillShim.incDiskBytesSpilled(file.length())
        spills += file
        heaps.clear()
        retained = 0
      }

      rows.foreach { r =>
        val gk = groupProj(r) // reused buffer: copy only on insert
        heaps.get(gk) match {
          case Some(heap) =>
            if (heap.size < k) { heap.enqueue(r.copy()); retained += 1 }
            else if (ordering.lt(r, heap.head)) { heap.dequeue(); heap.enqueue(r.copy()) }
          case None =>
            val heap = mutable.PriorityQueue.empty(ordering)
            heap.enqueue(r.copy())
            heaps.put(gk.copy(), heap)
            retained += 1
        }
        if (retained >= spillAt) spill()
      }

      if (spills.isEmpty)
        heaps.iterator.flatMap { case (_, heap) => heap.dequeueAll.reverseIterator }
      else {
        if (heaps.nonEmpty) spill()
        val files = spills.toSeq
        Option(TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => files.foreach(_.delete())))
        new TopKMergeIterator(files, k, ordering, attrs.length)
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

/** Streaming k-way merge over group-sorted spill runs: for each distinct
  * group key (unsigned-lexicographic over its UnsafeRow bytes — any total
  * order consistent with equality works, binary is free), gather the ≤ k
  * retained rows of every run that saw the group, re-select the top k,
  * emit. Holds `runs` file buffers plus one group's candidates in memory.
  */
private final class TopKMergeIterator(
    files: Seq[File],
    k: Int,
    ordering: Ordering[InternalRow],
    numFields: Int) extends Iterator[InternalRow] {

  private final class Run(file: File) {
    private val in = new DataInputStream(
      new BufferedInputStream(new FileInputStream(file), 1 << 16))
    var groupBytes: Array[Byte] = _
    var rows: Array[UnsafeRow] = _
    def advance(): Boolean =
      try {
        val gl = in.readInt()
        groupBytes = new Array[Byte](gl); in.readFully(groupBytes)
        val n = in.readInt()
        rows = Array.fill(n) {
          val rl = in.readInt()
          val b = new Array[Byte](rl); in.readFully(b)
          val ur = new UnsafeRow(numFields)
          ur.pointTo(b, rl)
          ur
        }
        true
      } catch { case _: EOFException => in.close(); false }
  }

  private val runOrder: Ordering[Run] =
    (a: Run, b: Run) => java.util.Arrays.compareUnsigned(a.groupBytes, b.groupBytes)
  // scala PriorityQueue pops the MAX of its ordering; reverse → min group first
  private val queue = mutable.PriorityQueue.empty[Run](runOrder.reverse)
  files.foreach { f => val r = new Run(f); if (r.advance()) queue.enqueue(r) }

  private var pending: Iterator[InternalRow] = Iterator.empty

  private def fillNext(): Unit = {
    while (!pending.hasNext && queue.nonEmpty) {
      val first = queue.dequeue()
      val g = first.groupBytes
      val candidates = ArrayBuffer.empty[UnsafeRow]
      candidates ++= first.rows
      if (first.advance()) queue.enqueue(first)
      while (queue.nonEmpty &&
          java.util.Arrays.compareUnsigned(queue.head.groupBytes, g) == 0) {
        val r = queue.dequeue()
        candidates ++= r.rows
        if (r.advance()) queue.enqueue(r)
      }
      val heap = mutable.PriorityQueue.empty(ordering)
      candidates.foreach { c =>
        if (heap.size < k) heap.enqueue(c)
        else if (ordering.lt(c, heap.head)) { heap.dequeue(); heap.enqueue(c) }
      }
      pending = heap.dequeueAll.reverseIterator
    }
  }

  override def hasNext: Boolean = { fillNext(); pending.hasNext }
  override def next(): InternalRow = { fillNext(); pending.next() }
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(k, groups, order, child, spillAt) =>
      // two-phase: per-partition partial heap (no distribution demand,
      // runs before the exchange) under the clustering final heap —
      // the aggregation partial/final split applied to top-k
      TopKPerGroupExec(k, groups, order,
        TopKPerGroupExec(k, groups, order, planLater(child), spillAt,
          partial = true),
        spillAt) :: Nil
    case _ => Nil
  }
}
