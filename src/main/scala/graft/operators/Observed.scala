package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Zero-extra-pass pipeline metrics via Spark's `observe` API — the
  * idiomatic way to count what a curation run kept and dropped WITHOUT a
  * second aggregation job: the counters ride the same physical plan
  * (accumulator-backed), so at 100 TB the audit is free. Batch readers
  * consume them through a `QueryExecutionListener`; streaming readers get
  * them per micro-batch in `StreamingQueryProgress.observedMetrics` —
  * both paths are spec-pinned against a direct aggregation.
  */
object Observed {

  /** Name under which curation metrics are observed. */
  val CurationMetrics = "graft_curation"

  /** Attach keep/drop counters to a `q_dedup_verdict`-shaped frame
    * (columns: is_exact_dup, is_near_dup, is_contaminated, verdict). */
  def curationMetrics(verdicts: DataFrame): DataFrame =
    verdicts.observe(
      CurationMetrics,
      count(lit(1)).as("rows"),
      sum(when(col("verdict") === "drop_exact", 1L).otherwise(0L)).as("n_drop_exact"),
      sum(when(col("verdict") === "drop_neardup", 1L).otherwise(0L)).as("n_drop_neardup"),
      sum(when(col("verdict") === "drop_contam", 1L).otherwise(0L)).as("n_drop_contam"),
      sum(when(col("verdict") === "keep", 1L).otherwise(0L)).as("n_keep"))

  /** Name under which ingest quality metrics are observed. */
  val IngestMetrics = "graft_ingest"

  /** Attach arrival-quality counters to a documents-shaped stream
    * (doc_id, text): row count plus empty/oversize text counts — the
    * per-micro-batch health line an ingest dashboard plots. */
  def ingestMetrics(docs: DataFrame, maxChars: Int = 1 << 20): DataFrame =
    docs.observe(
      IngestMetrics,
      count(lit(1)).as("rows"),
      sum(when(length(col("text")) === 0, 1L).otherwise(0L)).as("n_empty"),
      sum(when(length(col("text")) > maxChars, 1L).otherwise(0L)).as("n_oversize"))
}
