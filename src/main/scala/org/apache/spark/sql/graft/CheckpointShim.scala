package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.Dataset
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Eager local checkpoint that PRESERVES the final (post-AQE) physical
  * plan's output partitioning and ordering.
  *
  * Why not `Dataset.localCheckpoint`: under AQE the checkpoint's
  * `LogicalRDD` is built from `AdaptiveSparkPlanExec.outputPartitioning`
  * BEFORE the adaptive plan is finalized — `UnknownPartitioning(0)` —
  * so a frame that was explicitly `repartition(k1,k2)` +
  * `sortWithinPartitions(k1,k2)` for a co-located self-join loses both
  * properties and every downstream join re-exchanges AND re-sorts it
  * (measured on the ndgate build: the r18 plan check showed
  * Exchange+Sort under both SMJ sides of the checkpointed band table).
  * Why not `persist`: the DataFrame cache re-encodes every row through
  * the in-memory columnar builder, whose per-value compressibility
  * pass was 60-80% of the ndgate `bands` stage wall at sf10 (thread
  * dumps, guide §7.3).
  *
  * This shim does exactly what `Dataset.checkpoint` does — materialize
  * `queryExecution.toRdd` (with the same defensive per-row `copy()`,
  * since operators reuse row buffers) under a local checkpoint, then
  * wrap it in a `LogicalRDD` — but reads partitioning/ordering from
  * `finalPhysicalPlan` AFTER materialization, when AQE has committed
  * to them. Lives in `org.apache.spark.sql.graft` for the classic
  * `Dataset.ofRows` accessor — the same access trick as
  * [[ListenerBus]].
  */
object CheckpointShim {

  def localCheckpointKeepLayout(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[Dataset[_]]
    val qe = ds.queryExecution
    val rdd = qe.toRdd.map(_.copy())
    rdd.localCheckpoint()
    rdd.count() // materialize NOW — the adaptive plan is final after this
    val finalPlan = qe.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.finalPhysicalPlan
      case p => p
    }
    val session = ds.sparkSession
    Dataset.ofRows(session,
      LogicalRDD(qe.analyzed.output, rdd, finalPlan.outputPartitioning,
        finalPlan.outputOrdering, isStreaming = false)(session))
  }

  /** Deterministic release of [[localCheckpointKeepLayout]]'s blocks:
    * the rows live on the `LogicalRDD`'s backing RDD, NOT in the
    * CacheManager — `Dataset.unpersist` is a no-op for them. */
  def release(df: DataFrame): Unit =
    try df.queryExecution.analyzed match {
      case l: LogicalRDD => l.rdd.unpersist(blocking = false); ()
      case _ => ()
    } catch { case _: Throwable => () }
}
