package graft.operators

import graft.{Q, QueryPack, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC-semantics operators (SURVEY.md §2.2 q_cdc_*).
  *
  * These are the batch twins of what a consumer of the reference connector
  * (reference `examples/main.cpp:29-43`) computes downstream of `read()`:
  * materializing latest-state from a changelog keyed by the per-row
  * GTID/sequence metadata (reference `cdc_connector.h:199-208`).
  *
  * Scale notes: q_cdc_snapshot is a single hash-partitioned window over
  * `user_id` — one shuffle on the key, no sort-merge beyond the per-key
  * window sort. At 100 TB this is the canonical "compact the changelog"
  * job; skewed users would be handled by AQE skew-split since the window
  * partition key is the shuffle key.
  */
object Cdc extends QueryPack {

  /** Latest event per user_id — "apply the CDC stream" materialization.
    *
    * Tiebreak on event_id DESC; the oracle orders by µs-truncated ts so
    * DuckDB's ns-precision parquet read agrees with Spark's µs timestamps.
    */
  val qCdcSnapshot: Q = Q(
    "q_cdc_snapshot",
    Some("""
      SELECT user_id,
             event_id   AS last_event_id,
             event_type AS last_event_type,
             value      AS last_value
      FROM (
        SELECT *, row_number() OVER (
          PARTITION BY user_id
          ORDER BY date_trunc('microseconds', ts) DESC, event_id DESC) AS rn
        FROM events)
      WHERE rn = 1
      ORDER BY user_id
      """.stripMargin.trim)
  ) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val w  = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    ev.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(
        col("user_id"),
        col("event_id").as("last_event_id"),
        col("event_type").as("last_event_type"),
        col("value").as("last_value"))
      .orderBy(col("user_id"))
  }

  override def all: Seq[Q] = Seq(qCdcSnapshot)
}
