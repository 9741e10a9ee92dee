package org.apache.spark.sql.graft

import graft.sources.cdc.CdcPushdownSupport
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{AttributeSet, Expression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.DataSourceStrategy
import org.apache.spark.sql.execution.datasources.v2.StreamingDataSourceV2ScanRelation

/** Streaming DSv2 pushdown for the `maxscale-cdc` source.
  *
  * Spark 4.1's micro-batch planner does NOT drive the DSv2 pushdown
  * interfaces: `MicroBatchExecution` builds the scan with a bare
  * `newScanBuilder(options).build()` (no `pushFilters`, no
  * `pruneColumns` — verified against the shipped bytecode), so a
  * streaming source never hears about the query's filters or projection
  * through the standard route. At changelog scale that forfeits the two
  * cheapest wins there are: dropping rows before they are decoded, and
  * skipping the typed cast for columns nobody reads.
  *
  * This rule closes the gap from the session side. It runs in the "User
  * Provided Optimizers" batch — AFTER `PushDownPredicates` and
  * `ColumnPruning` have collapsed each micro-batch's plan into the
  * canonical `Project(Filter(relation))` shape — and INFORMS the live
  * [[CdcPushdownSupport]] stream of (a) the filter conjuncts Spark will
  * evaluate above the scan and (b) the set of output columns the plan
  * actually references. It never rewrites the plan: the Filter stays
  * exactly where it is and re-checks every emitted row, so the stream's
  * wire predicate only has to be exact in the drop direction, and a
  * stale or missing notification (e.g. the very first optimization of a
  * just-started stream) degrades to unfiltered-but-correct.
  *
  * Registered automatically by the source provider on first use via
  * `spark.experimental.extraOptimizations` (re-read by the optimizer on
  * every execution, including each streaming micro-batch), and available
  * to `spark.sql.extensions` deployments through [[GraftExtensions]].
  */
object CdcStreamingPushdown extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // collect the best (most-informed) shape per relation: pre-order
    // traversal sees Project(Filter(r)) before its nested Filter(r), so
    // first-match-wins keeps the parent's projection information
    val seen = scala.collection.mutable.Map.empty[
      StreamingDataSourceV2ScanRelation,
      (Option[Expression], Option[AttributeSet])]
    def note(r: StreamingDataSourceV2ScanRelation, cond: Option[Expression],
        refs: Option[AttributeSet]): Unit =
      if (r.stream.isInstanceOf[CdcPushdownSupport] && !seen.contains(r))
        seen(r) = (cond, refs)
    plan.foreach {
      case p @ Project(_, f @ Filter(cond, r: StreamingDataSourceV2ScanRelation)) =>
        note(r, Some(cond), Some(p.references ++ f.references))
      case f @ Filter(cond, r: StreamingDataSourceV2ScanRelation) =>
        note(r, Some(cond), None) // unknown parent: decode everything
      case p @ Project(_, r: StreamingDataSourceV2ScanRelation) =>
        note(r, None, Some(p.references))
      case r: StreamingDataSourceV2ScanRelation =>
        note(r, None, None) // bare scan: no filters, full decode
      case _ => ()
    }
    seen.foreach { case (r, (cond, refs)) =>
      val filters = cond.toSeq
        .flatMap(splitConjunctivePredicates)
        // nested-field pushdown is meaningless here (flat wire rows)
        .flatMap(DataSourceStrategy.translateFilter(_, supportNestedPredicatePushdown = false))
      val referenced = refs.map(_.map(_.name).toSet)
      r.stream.asInstanceOf[CdcPushdownSupport].pushRuntime(filters, referenced)
    }
    plan // mutation-only: the plan itself is never changed
  }

  /** Idempotently hook the rule into an already-built session (the
    * source provider calls this on first use; `extraOptimizations` is
    * re-read per execution, so this also covers streams started later). */
  def register(spark: SparkSession): Unit = synchronized {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(this))
      spark.experimental.extraOptimizations = cur :+ this
  }
}
