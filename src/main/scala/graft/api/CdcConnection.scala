package graft.api

import graft.sources.cdc._

import scala.collection.immutable.ListMap

/** Drop-in Scala twin of the reference's `CDC::Connection` / `CDC::Row`
  * API (cdc_connector.h:40-256) for users migrating imperative consumer
  * loops; the Spark-native surface (readStream.format("maxscale-cdc") +
  * graft.streaming.StreamOps) is the scale path, this facade is the
  * 1:1 contract:
  *
  * {{{
  * val c = new CdcConnection(host, port, user, password, timeoutSeconds = 10)
  * if (c.connect("db.table", gtid = "")) {
  *   var row = c.read()
  *   while (row.isDefined) { println(row.get.value("id")); row = c.read() }
  *   println(c.error)
  * }
  * c.close()
  * }}}
  *
  * Divergences (each documented in SURVEY.md §1):
  *  - `Row.value(name)` on a missing column throws instead of undefined
  *    behavior (reference has no bounds check, cdc_connector.h:188-192).
  *  - timeout returns None from `read()` with `error == CDC.Timeout`,
  *    matching the code (cdc_connector.cpp:490), not the header comment.
  */
object CDC {
  /** Reference `CDC::TIMEOUT` (cdc_connector.h:32). */
  val Timeout = "Request timed out"
}

final class CdcRow private[api] (
    keys: IndexedSeq[String],
    types: IndexedSeq[String],
    values: IndexedSeq[String]) {

  /** Field count (reference `length()`, cdc_connector.h:164-167). */
  def length: Int = keys.length
  /** Value by index (reference cdc_connector.h:176-179). */
  def value(i: Int): String = values(i)
  /** Value by name; throws on unknown name — the reference's UB fixed
    * (cdc_connector.h:188-192). */
  def value(name: String): String = {
    val i = keys.indexOf(name)
    if (i < 0) throw new NoSuchElementException(s"no column '$name'")
    values(i)
  }
  /** Column name by index (reference `key(i)`, cdc_connector.h:215-218). */
  def key(i: Int): String = keys(i)
  /** Declared SQL type by index (reference `type(i)`, cdc_connector.h:225-228). */
  def sqlType(i: Int): String = types(i)
  /** `domain-server_id-sequence` (reference `gtid()`, cdc_connector.h:199-208). */
  def gtid: String = s"${value("domain")}-${value("server_id")}-${value("sequence")}"
}

final class CdcConnection(
    address: String,
    port: Int,
    user: String,
    password: String,
    timeoutSeconds: Int = 10) {

  private var client: CdcClient = _
  private var err: String = ""
  private var keys: IndexedSeq[String] = Vector.empty
  private var types: IndexedSeq[String] = Vector.empty
  private var rawSchema: String = ""
  private var firstRow: Option[CdcRow] = None
  private var connected = false

  /** Reference `connect(table, gtid)` (cdc_connector.cpp:147-223): TCP +
    * auth + register + REQUEST-DATA + first-message pre-read. Returns
    * false and sets `error` on failure — no exceptions, like the
    * reference. */
  def connect(table: String, gtid: String = ""): Boolean = {
    err = ""
    try {
      client = new CdcClient(address, port, user, password, timeoutSeconds * 1000)
      client.connect()
      client.requestData(table, Option(gtid).filter(_.nonEmpty))
      // pre-read until the first data row (schema arrives first), exactly
      // the reference's connect-time validation (cdc_connector.cpp:214-218)
      var pre: Option[CdcRow] = None
      var spin = 0
      while (pre.isEmpty && spin < 2) {
        readInternal() match {
          case Some(r) => pre = Some(r)
          case None if err.nonEmpty && err != CDC.Timeout =>
            client.close(); client = null // no socket leak on failed connect
            return false
          case None => spin += 1
        }
      }
      if (pre.isEmpty) {
        // reference: connect succeeds only if the pre-read yields a row
        // (cdc_connector.cpp:214-218) — a dead/quiet stream fails connect
        // with the timeout error rather than reporting a live connection
        if (err.isEmpty) err = CDC.Timeout
        client.close(); client = null
        return false
      }
      firstRow = pre
      connected = true
      true
    } catch {
      case e: Exception =>
        err = Option(e.getMessage).getOrElse(e.toString)
        if (client != null) { client.close(); client = null }
        false
    }
  }

  /** Reference `read()` (cdc_connector.cpp:321-360): one row, replaying
    * the pre-read first; None + `error` on timeout/failure. */
  def read(): Option[CdcRow] = {
    if (!connected) { err = "not connected"; return None }
    if (firstRow.isDefined) {
      val r = firstRow
      firstRow = None
      return r
    }
    readInternal()
  }

  private def readInternal(): Option[CdcRow] =
    try client.readMessage() match {
      case CdcSchemaMsg(fields, raw) =>
        // adopt (first or re-schema) and recurse to the next message,
        // like the reference (cdc_connector.cpp:339-344)
        keys = fields.map(_.name).toVector
        types = fields.map(_.sqlType).toVector
        rawSchema = raw
        readInternal()
      case m: CdcRowMsg =>
        // this row is being DELIVERED to the caller: reference A10 — a
        // schema key absent from the JSON is an error (process_row,
        // cdc_connector.cpp:288-319)
        m.requireComplete()
        // raw-mode value semantics: null→"" (cdc_connector.cpp:106-107)
        err = ""
        Some(new CdcRow(keys, types, m.values.toVector))
      case CdcTimeout => err = CDC.Timeout; None
      case CdcClosed  => err = "connection closed"; None
    } catch {
      case e: Exception =>
        err = Option(e.getMessage).getOrElse(e.toString)
        None
    }

  /** Raw schema JSON (reference `schema()`, cdc_connector.h:93-96). */
  def schema: String = rawSchema
  /** Last error, "" if none (reference `error()`, cdc_connector.h:103-106). */
  def error: String = err
  /** name → declared SQL type (reference `fields()`, cdc_connector.h:113-123);
    * insertion-ordered like the stream's column order. */
  def fields: Map[String, String] = ListMap(keys.zip(types): _*)

  /** Reference `close()` (cdc_connector.cpp:225-235); idempotent. */
  def close(): Unit = {
    if (client != null) { client.close(); client = null }
    connected = false
  }
}
