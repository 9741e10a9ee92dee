package graft.sources.cdc

import org.apache.spark.sql.connector.metric.{CustomMetric, CustomSumMetric, CustomTaskMetric}

/** DSv2 custom metrics for the CDC scan — the pushdown work is only
  * trustworthy if it is measurable ("measure, don't guess"): the SQL UI
  * / metrics listeners see, per micro-batch, how many wire rows the
  * pushed predicate dropped before decode vs how many were decoded and
  * emitted. Aggregation is a plain sum over task updates. */
final class CdcWireFilteredRowsMetric extends CustomSumMetric {
  override def name(): String = CdcMetrics.FilteredRows
  override def description(): String =
    "wire rows dropped by the pushed predicate before decode"
}

final class CdcDecodedRowsMetric extends CustomSumMetric {
  override def name(): String = CdcMetrics.DecodedRows
  override def description(): String =
    "wire rows decoded and emitted by the CDC readers"
}

/** Executor-side per-task value (shipped back with task completion). */
final case class CdcTaskMetric(metricName: String, metricValue: Long)
    extends CustomTaskMetric {
  override def name(): String = metricName
  override def value(): Long = metricValue
}

object CdcMetrics {
  val FilteredRows = "cdcWireFilteredRows"
  val DecodedRows = "cdcDecodedRows"
  def supported: Array[CustomMetric] =
    Array(new CdcWireFilteredRowsMetric, new CdcDecodedRowsMetric)
}
