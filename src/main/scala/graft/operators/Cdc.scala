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

  /** GTID reconstruction: mirrors `Row::gtid()` =
    * `domain-server_id-sequence` (reference `cdc_connector.h:199-208`).
    * The events table carries no replication metadata, so domain/server_id
    * are fixed and event_id plays the sequence — same string shape the
    * reference concatenates.
    */
  val qCdcGtid: Q = Q(
    "q_cdc_gtid",
    Some("""
      SELECT event_id,
             concat_ws('-', '0', '3000', CAST(event_id AS VARCHAR)) AS gtid,
             event_type
      FROM events
      ORDER BY event_id
      """.stripMargin.trim)
  ) { (s, dir) =>
    Tables.events(s, dir)
      .select(
        col("event_id"),
        concat_ws("-", lit("0"), lit("3000"), col("event_id").cast("string"))
          .as("gtid"),
        col("event_type"))
      .orderBy("event_id")
  }

  /** The reference's string-typed row discipline (`cdc_connector.cpp:80-115`):
    * raw mode flattens every value to a string with JSON null -> "" (the
    * reference conflates them); typed mode casts per the declared SQL type
    * with null staying NULL (our documented improvement, SURVEY.md §1.2).
    */
  val qCdcTypedCast: Q = Q(
    "q_cdc_typed_cast",
    Some("""
      SELECT event_id,
             COALESCE(json_extract_string(props, '$.k'), '') AS raw_k,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS typed_k,
             CAST(event_id AS VARCHAR) AS raw_event_id,
             CAST(CAST(value AS DECIMAL(12,2)) AS VARCHAR) AS raw_value
      FROM events
      ORDER BY event_id
      """.stripMargin.trim)
  ) { (s, dir) =>
    Tables.events(s, dir)
      .select(
        col("event_id"),
        coalesce(get_json_object(col("props"), "$.k"), lit("")).as("raw_k"),
        get_json_object(col("props"), "$.k").cast("long").as("typed_k"),
        col("event_id").cast("string").as("raw_event_id"),
        col("value").cast("decimal(12,2)").cast("string").as("raw_value"))
      .orderBy("event_id")
  }

  override def all: Seq[Q] = Seq(qCdcSnapshot, qCdcGtid, qCdcTypedCast)
}
