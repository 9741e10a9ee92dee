package graft.streaming

import graft.sources.cdc.CdcProtocolException
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryException}

/** Keeps a CDC consumer alive across source-table DDL.
  *
  * The reference adopts a new in-band schema and keeps reading within one
  * connection (cdc_connector.cpp:339-344) — "DDL doesn't kill the
  * consumer". Spark plans have a fixed schema, so the source's controlled
  * answer to a mid-stream re-schema is to fail the query (CdcTailer); this
  * wrapper restores the reference's property at the query level: on that
  * specific failure it re-infers the schema (a fresh probe connection sees
  * the post-DDL schema), rebuilds the reader, and restarts the caller's
  * query. Resume is loss-free by construction — the committed-GTID
  * watermark under the checkpoint floors the replay, and Spark's offset
  * log re-plans the uncommitted batch over the server's GTID replay.
  *
  * {{{
  * CdcAutoRestart.runWithSchemaRestarts(spark, Map(
  *     "host" -> h, "port" -> p, "user" -> u, "password" -> pw,
  *     "table" -> "db.t"),
  *   df => df.writeStream.foreachBatch(sink _)
  *     .option("checkpointLocation", ckpt).start())
  * }}}
  *
  * Blocks until the query stops cleanly (returns the number of schema
  * restarts) or fails for any non-re-schema reason (rethrows).
  *
  * Caveat: each restart decodes the re-planned range under the NEW
  * schema. Events from before the DDL stay readable when every planned
  * column still exists by name (widenings, column adds, re-orders — see
  * CdcReplayReader's in-band tolerance); a replay straddling a column
  * DROP of a still-planned column fails permanently, which is the honest
  * outcome (those events cannot fill the new schema).
  */
object CdcAutoRestart {

  /** True when the failure chain is the source's mid-stream re-schema (or
    * planning-vs-stream schema drift) signal. */
  def isSchemaChange(t: Throwable): Boolean =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(16).exists {
      c => c.isInstanceOf[CdcProtocolException] &&
        (c.getMessage.contains("schema change") || c.getMessage.contains("schema drift"))
    }

  def runWithSchemaRestarts(
      spark: SparkSession,
      options: Map[String, String],
      startQuery: DataFrame => StreamingQuery,
      maxRestarts: Int = 16): Int = {
    var restarts = 0
    while (true) {
      // fresh load() = fresh schema inference probe → post-DDL schema
      val df = spark.readStream.format("maxscale-cdc").options(options).load()
      val q = startQuery(df)
      try {
        q.awaitTermination()
        return restarts
      } catch {
        case e: StreamingQueryException if isSchemaChange(e) =>
          restarts += 1
          if (restarts > maxRestarts) throw e
      }
    }
    restarts // unreachable
  }
}
