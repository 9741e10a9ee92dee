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
    val s = supervise(spark, options, startQuery, maxRestarts)
    s.awaitTermination()
    s.restarts
  }

  /** Non-blocking supervisor: the restart loop of
    * [[runWithSchemaRestarts]] on its own daemon thread, returning a
    * handle immediately — the shape a real consumer embeds (the blocking
    * variant forces every caller to hand-roll a thread plus shared
    * failure/restart-count state, which is exactly the boilerplate the
    * e2e specs used to carry). `startQuery` is invoked once per
    * (re)start with a freshly-inferred DataFrame; stop through the
    * HANDLE (stopping the inner query directly also ends the loop —
    * a clean stop is never treated as a restartable failure). */
  def supervise(
      spark: SparkSession,
      options: Map[String, String],
      startQuery: DataFrame => StreamingQuery,
      maxRestarts: Int = 16): CdcSupervised =
    new CdcSupervised(spark, options, startQuery, maxRestarts)
}

/** Handle on a supervised CDC query (see [[CdcAutoRestart.supervise]]):
  * live across schema restarts, terminated by [[stop]], a clean inner
  * stop, or a non-re-schema failure (rethrown by [[awaitTermination]]).
  */
final class CdcSupervised private[streaming] (
    spark: SparkSession,
    options: Map[String, String],
    startQuery: DataFrame => StreamingQuery,
    maxRestarts: Int) {

  @volatile private var stopping = false
  @volatile private var restartCount = 0
  @volatile private var failureRef: Throwable = _
  @volatile private var current: StreamingQuery = _
  private val done = new java.util.concurrent.CountDownLatch(1)

  private val loop = new Thread(() => {
    try {
      var running = true
      while (running && !stopping) {
        // fresh load() = fresh schema inference probe → post-DDL schema
        val df = spark.readStream.format("maxscale-cdc").options(options).load()
        val q = startQuery(df)
        current = q
        if (stopping) q.stop() // raced a stop() during (re)start
        try {
          q.awaitTermination()
          running = false // clean stop (ours or the caller's)
        } catch {
          case e: StreamingQueryException
              if CdcAutoRestart.isSchemaChange(e) && !stopping =>
            restartCount += 1
            if (restartCount > maxRestarts) throw e
        }
      }
    } catch { case t: Throwable => failureRef = t }
    finally done.countDown()
  }, "graft-cdc-supervisor")
  loop.setDaemon(true)
  loop.start()

  /** The live inner query, if one is currently running — changes across
    * restarts; for per-batch interaction (progress, explain). */
  def currentQuery: Option[StreamingQuery] = Option(current)

  /** Schema restarts performed so far. */
  def restarts: Int = restartCount

  /** The terminal non-re-schema failure, when one happened. */
  def failure: Option[Throwable] = Option(failureRef)

  def isActive: Boolean = done.getCount > 0

  /** Stop the supervisor and its current query; returns once the loop
    * has fully terminated. */
  def stop(): Unit = {
    stopping = true
    val q = current
    if (q != null) try q.stop() catch { case _: Exception => () }
    done.await()
  }

  /** Block until the supervisor terminates (clean stop or terminal
    * failure); rethrows the failure, mirroring
    * `StreamingQuery.awaitTermination`. Returns false on timeout. */
  def awaitTermination(timeoutMs: Long = Long.MaxValue): Boolean = {
    val ended = done.await(timeoutMs,
      java.util.concurrent.TimeUnit.MILLISECONDS)
    if (ended && failureRef != null) throw failureRef
    ended
  }
}
