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

  /** SCD Type-2 history from the changelog: each event becomes a
    * versioned row with a validity interval [valid_from, valid_to), open
    * (NULL) for the current version — the other canonical CDC
    * materialization besides latest-state (reference consumers build this
    * downstream of `read()` exactly like the snapshot).
    *
    * Validity bounds are emitted as epoch-µs BIGINTs: Spark reads the ns
    * parquet clock at µs (Tables.events), DuckDB at ns — both floor to µs
    * (`unix_micros` / `epoch_us(CAST ts)`), so the hashes agree.
    *
    * Scale: one hash shuffle on user_id + per-key sort (same shape as
    * q_cdc_snapshot); `lead` is a single-pass frame, no self-join — the
    * naive interval self-join alternative would be O(n²) per key.
    */
  val qScd2: Q = Q(
    "q_scd2",
    Some("""
      SELECT user_id, event_id, value,
             epoch_us(CAST(ts AS TIMESTAMP)) AS valid_from_us,
             epoch_us(CAST(lead(ts) OVER w AS TIMESTAMP)) AS valid_to_us,
             CASE WHEN lead(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_current
      FROM events
      WINDOW w AS (PARTITION BY user_id
                   ORDER BY date_trunc('microseconds', ts), event_id)
      ORDER BY user_id, event_id
      """.stripMargin.trim)
  ) { (s, dir) =>
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .select(
        col("user_id"), col("event_id"), col("value"),
        unix_micros(col("ts")).as("valid_from_us"),
        unix_micros(lead(col("ts"), 1).over(w)).as("valid_to_us"),
        when(lead(col("ts"), 1).over(w).isNull, 1).otherwise(0)
          .as("is_current"))
      .orderBy("user_id", "event_id")
  }

  /** Incremental snapshot maintenance: compact the old half of the
    * changelog into a base snapshot, compact the new half into a delta,
    * then merge with delta-wins coalesce — the incremental-view-
    * maintenance shape that turns "recompact 100 TB nightly" into
    * "compact today's delta and merge".
    *
    * Scale: both compactions are the q_cdc_snapshot window (hash shuffle
    * on user_id); the merge is a full-outer join on the same key, so with
    * the base stored bucketed by user_id (StorageSpec shape) the merge
    * needs no extra shuffle of the big side. The cutoff scalar is a
    * 1-row broadcast, not a driver collect.
    */
  val qCdcMerge: Q = Q(
    "q_cdc_merge",
    Some("""
      WITH c AS (SELECT CAST(floor(max(event_id) / 2.0) AS BIGINT) AS cut
                 FROM events),
      base AS (SELECT user_id, event_id, value FROM (
          SELECT e.user_id, e.event_id, e.value,
                 row_number() OVER (PARTITION BY e.user_id
                   ORDER BY date_trunc('microseconds', e.ts) DESC,
                            e.event_id DESC) AS rn
          FROM events e, c WHERE e.event_id <= c.cut) WHERE rn = 1),
      delta AS (SELECT user_id, event_id, value FROM (
          SELECT e.user_id, e.event_id, e.value,
                 row_number() OVER (PARTITION BY e.user_id
                   ORDER BY date_trunc('microseconds', e.ts) DESC,
                            e.event_id DESC) AS rn
          FROM events e, c WHERE e.event_id > c.cut) WHERE rn = 1)
      SELECT COALESCE(d.user_id, b.user_id) AS user_id,
             COALESCE(d.event_id, b.event_id) AS last_event_id,
             COALESCE(d.value, b.value) AS last_value,
             CASE WHEN d.event_id IS NOT NULL THEN 'delta' ELSE 'base'
             END AS src
      FROM base b FULL OUTER JOIN delta d ON b.user_id = d.user_id
      ORDER BY user_id
      """.stripMargin.trim)
  ) { (s, dir) =>
    val ev  = Tables.events(s, dir)
    val cut = ev.agg(floor(max(col("event_id")) / 2.0).cast("long").as("cut"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    def compact(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("value"))
    val evc   = ev.crossJoin(broadcast(cut))
    val base  = compact(evc.filter(col("event_id") <= col("cut")))
    val delta = compact(evc.filter(col("event_id") > col("cut")))
    base.select(col("user_id"), col("event_id").as("b_event_id"),
        col("value").as("b_value"))
      .join(
        delta.select(col("user_id"), col("event_id").as("d_event_id"),
          col("value").as("d_value")),
        Seq("user_id"), "full_outer")
      .select(
        col("user_id"),
        coalesce(col("d_event_id"), col("b_event_id")).as("last_event_id"),
        coalesce(col("d_value"), col("b_value")).as("last_value"),
        when(col("d_event_id").isNotNull, "delta").otherwise("base")
          .as("src"))
      .orderBy("user_id")
  }

  /** Typed per-table view over a NORMALIZED changelog
    * ([[graft.sources.cdc.NormalizedCdc.typedView]]): the events table is
    * first re-shaped into the normalized row (six metadata columns +
    * `payload` JSON + `_table` — what `schemaMode=normalized` streams),
    * then typedView projects the payload back through the §1.3 SQL-type
    * map. The oracle is the round-trip identity: encode→decode must hand
    * back exactly the source columns.
    *
    * Scale: a pure projection — payload encode (`to_json`) and decode
    * (`from_json`) are both codegen'd row-local expressions; no shuffle,
    * no state. At 100 TB the cost is one pass over the changelog, which
    * is the floor for any format conversion.
    */
  val qCdcTypedView: Q = Q(
    "q_cdc_typed_view",
    Some("""
      SELECT CAST(0 AS BIGINT) AS domain,
             CAST(3000 AS BIGINT) AS server_id,
             event_id AS sequence,
             CAST(1 AS BIGINT) AS event_number,
             epoch_us(CAST(ts AS TIMESTAMP)) AS "timestamp",
             event_type,
             user_id,
             event_type AS etype,
             value
      FROM events
      ORDER BY sequence
      """.stripMargin.trim)
  ) { (s, dir) =>
    import graft.sources.cdc.{CdcField, NormalizedCdc}
    val norm = Tables.events(s, dir).select(
      lit(0L).as("domain"),
      lit(3000L).as("server_id"),
      col("event_id").as("sequence"),
      lit(1L).as("event_number"),
      unix_micros(col("ts")).as("timestamp"),
      col("event_type"),
      to_json(struct(col("user_id"), col("event_type").as("etype"),
        col("value"))).as("payload"),
      lit("db.events").as("_table"))
    val wire = Seq(
      CdcField("domain", "bigint"), CdcField("server_id", "bigint"),
      CdcField("sequence", "bigint"), CdcField("event_number", "bigint"),
      CdcField("timestamp", "bigint"), CdcField("event_type", "varchar(32)"),
      CdcField("user_id", "bigint"), CdcField("etype", "varchar(32)"),
      CdcField("value", "double"))
    NormalizedCdc.typedView(norm, "db.events", wire)
      .orderBy("sequence")
  }

  override def all: Seq[Q] =
    Seq(qCdcSnapshot, qCdcGtid, qCdcTypedCast, qScd2, qCdcMerge, qCdcTypedView)
}
