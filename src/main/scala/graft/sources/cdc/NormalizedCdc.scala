package graft.sources.cdc

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, ReportsSourceMetrics, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.types.{DataType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `schemaMode=normalized`: N DIFFERENT-schema tables in one streaming
  * query, fanned in to a normalized changelog.
  *
  * Uniform multi-table mode (`tables=db.a,db.b`, [[MultiCdc]]) exists
  * for same-schema shards; the next consumer ask is "every table of
  * this database in one stream" — inherently heterogeneous. A union
  * schema cannot work (Spark plans carry one fixed row shape), so the
  * normalized row keeps what every MaxScale CDC stream shares and
  * packs the rest:
  *
  *   domain, server_id, sequence,          -- GTID (replay/offsets)
  *   event_number, timestamp, event_type,  -- event metadata
  *   payload STRING,                       -- table columns as a JSON object
  *   _table STRING                         -- provenance
  *
  * The six metadata columns are injected by the server into every
  * table's stream (reference cdc_connector.cpp:250-286 reads them from
  * the avro schema's leading fields), which is what makes this shape
  * universal. Consumers unpack `payload` per table with
  * `get_json_object`/`from_json` after routing on `_table` — the
  * standard normalized-changelog consumption pattern.
  *
  * Everything operational is inherited from the uniform composite:
  * one checkpoint, one [[MultiGtidOffset]] line, per-table
  * committed-GTID watermarks, per-table admission-control split,
  * Trigger.AvailableNow per-table anchors, `_table`-pushdown table
  * pruning, and executor-side GTID-range replay (the data plane never
  * touches the driver). Payload encoding happens executor-side in the
  * replay readers.
  */
object NormalizedCdc {
  /** Server-injected metadata columns every CDC stream carries, in
    * their wire order. */
  val Meta: Seq[String] =
    Seq("domain", "server_id", "sequence", "event_number", "timestamp",
      "event_type")

  val PayloadColumn = "payload"

  /** Validate per-table probes: each table must carry the six metadata
    * columns (the GTID trio drives replay; the rest are the normalized
    * row), declared with the SAME SQL types everywhere — plan-time
    * failure, not row-decode surprise. */
  private[sources] def validate(fieldsByTable: Seq[(String, Seq[CdcField])]): Unit = {
    fieldsByTable.foreach { case (t, fs) =>
      val names = fs.map(_.name)
      val missing = Meta.filterNot(names.contains)
      if (missing.nonEmpty) throw new CdcProtocolException(
        s"maxscale-cdc: schemaMode=normalized needs the server metadata " +
          s"columns; '$t' is missing [${missing.mkString(",")}]")
    }
    val metaOf: Seq[CdcField] => Seq[CdcField] =
      fs => Meta.map(n => fs.find(_.name == n).get)
    val (t0, f0) = fieldsByTable.head
    val base = metaOf(f0)
    fieldsByTable.tail.foreach { case (t, fs) =>
      val m = metaOf(fs)
      if (m != base) throw new CdcProtocolException(
        s"maxscale-cdc: metadata columns must share one declared type; " +
          s"'$t' differs from '$t0': $m vs $base")
    }
  }

  /** Validate a MID-STREAM evolved wire schema (DDL absorbed without a
    * query restart): the normalized row only depends structurally on the
    * six server metadata columns, so any evolution that keeps them —
    * column adds, drops, renames, reorders of USER columns — is
    * tolerable; the payload simply reflects the new shape from the next
    * row on. Losing a metadata column (or changing its declared type)
    * would break replay positioning and the fixed output schema — that
    * stays a loud restart-the-query failure. */
  private[sources] def validateEvolved(table: String,
      planned: Seq[CdcField], evolved: Seq[CdcField]): Unit = {
    val missing = Meta.filterNot(n => evolved.exists(_.name == n))
    if (missing.nonEmpty) throw new CdcProtocolException(
      s"maxscale-cdc: mid-stream schema change on '$table' dropped the " +
        s"server metadata columns [${missing.mkString(",")}] — the " +
        "normalized changelog cannot absorb this; restart the query")
    val metaOf: Seq[CdcField] => Seq[CdcField] =
      fs => Meta.map(n => fs.find(_.name == n).get)
    if (metaOf(evolved) != metaOf(planned)) throw new CdcProtocolException(
      s"maxscale-cdc: mid-stream schema change on '$table' re-declared a " +
        s"metadata column (${metaOf(planned)} vs ${metaOf(evolved)}) — " +
        "restart the query")
  }

  /** The normalized output schema for a set of per-table probes. */
  private[sources] def schemaFor(fieldsByTable: Seq[(String, Seq[CdcField])],
      typed: Boolean): StructType = {
    validate(fieldsByTable)
    val metaFields = Meta.map(n => fieldsByTable.head._2.find(_.name == n).get)
    SqlTypes.toStructType(metaFields, typed)
      .add(PayloadColumn, StringType, nullable = false)
      .add(MultiCdc.TableColumn, StringType, nullable = false)
  }

  /** Typed per-table view over a normalized changelog frame (stream or
    * batch — a pure DataFrame transform): routes on `_table` and projects
    * `payload` back onto the table's wire schema via `from_json` with the
    * §1.3 SQL-type mapping, so consumers stop hand-parsing payload JSON.
    * Output column order is WIRE order (metadata columns ride through
    * from the normalized frame; user columns unpack from the payload),
    * i.e. exactly the shape uniform mode would stream for this table.
    *
    * Raw/typed discipline matches uniform mode (reference
    * `json_to_string`, cdc_connector.cpp:80-115): typed mode maps each
    * declared SQL type (JSON null / absent key → SQL NULL — a pre-DDL
    * row under an added column reads as NULL, the null-extension
    * contract); raw mode keeps every user column a string with the
    * reference's null→"" conflation. Binary columns take the wire
    * text's UTF-8 bytes, exactly like the replay readers' cast path
    * ([[SqlTypes.cast]]); timestamps parse against UTC, the same fixed
    * zone the cast path uses.
    */
  def typedView(df: org.apache.spark.sql.DataFrame, table: String,
      wireFields: Seq[CdcField], typed: Boolean = true): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{coalesce, col, encode, from_json, lit}
    validate(Seq(table -> wireFields))
    val user = wireFields.filterNot(f => Meta.contains(f.name))
    val parseSchema = StructType(user.map { f =>
      val dt = if (typed) SqlTypes.toSpark(f.sqlType) else StringType
      // binary parses as text first (JSON carries the wire string; the
      // typed value is its UTF-8 bytes, not base64 — SqlTypes.cast parity)
      val parseDt = dt match {
        case org.apache.spark.sql.types.BinaryType => StringType
        case other => other
      }
      org.apache.spark.sql.types.StructField(f.name, parseDt, nullable = true)
    })
    val parsed = from_json(col(PayloadColumn), parseSchema,
      java.util.Map.of("timeZone", "UTC"))
    val cols = wireFields.map { f =>
      val md = new org.apache.spark.sql.types.MetadataBuilder()
        .putString("cdc.sqlType", f.sqlType).build()
      if (Meta.contains(f.name)) col(f.name)
      else {
        val dt = if (typed) SqlTypes.toSpark(f.sqlType) else StringType
        val c = parsed.getField(f.name)
        val castC = dt match {
          case org.apache.spark.sql.types.BinaryType => encode(c, "UTF-8")
          case _ => c
        }
        (if (typed) castC else coalesce(castC, lit(""))).as(f.name, md)
      }
    }
    df.filter(col(MultiCdc.TableColumn) === table).select(cols: _*)
  }

  /** [[typedView]] with the wire schema PROBED from the server — the
    * consumer convenience: one call turns the normalized stream into
    * this table's typed changelog view. */
  def typedView(df: org.apache.spark.sql.DataFrame, opts: CdcOptions,
      table: String): org.apache.spark.sql.DataFrame =
    typedView(df, table, CdcProbe.schemaFields(opts, table), opts.typed)

  /** Minimal JSON string escape (quote, backslash, control chars) —
    * the wire values arrived as decoded JSON scalars, so this is the
    * only re-encoding needed. */
  private[sources] def jsonEscape(sb: java.lang.StringBuilder, s: String): Unit = {
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"'  => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case ctrl if ctrl < ' ' => sb.append(f"\\u${ctrl.toInt}%04x")
        case other => sb.append(other)
      }
      i += 1
    }
  }
}

/** Executor-side wire-row → normalized-row conversion for one table.
  * Serialized into the reader factory; all lookups precomputed to
  * index arithmetic.
  */
final case class WireNormalizer(
    table: String,
    wireFields: Seq[CdcField],
    typed: Boolean,
    required: StructType) extends Serializable {

  /** Output-column plan: wire index for a metadata column, -1 for
    * `payload`, -2 for `_table`. */
  private val outWireIdx: Array[Int] = required.fields.map { f =>
    f.name match {
      case NormalizedCdc.PayloadColumn => -1
      case MultiCdc.TableColumn        => -2
      case n                           => wireFields.indexWhere(_.name == n)
    }
  }
  private val outDts: Array[DataType] = required.fields.map(_.dataType)

  /** Wire indices of the table-specific (non-metadata) columns, in wire
    * order — the payload keys. */
  private val payloadIdx: Array[Int] = wireFields.zipWithIndex
    .filterNot { case (f, _) => NormalizedCdc.Meta.contains(f.name) }
    .map(_._2).toArray
  /** Pre-rendered `"name":` fragments (names come from the server's
    * schema — escape anyway, never trust the wire). */
  private val payloadKey: Array[String] = payloadIdx.map { i =>
    val sb = new java.lang.StringBuilder
    sb.append('"')
    NormalizedCdc.jsonEscape(sb, wireFields(i).name)
    sb.append("\":")
    sb.toString
  }
  /** Whether column j's declared SQL type admits an UNQUOTED JSON
    * literal (numeric / boolean); the value text is still checked
    * against the literal grammar per row — a corrupt wire value must
    * degrade to a quoted string, not break the payload's JSON. */
  private val payloadNumeric: Array[Boolean] = payloadIdx.map { i =>
    SqlTypes.toSpark(wireFields(i).sqlType) match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.FloatType | org.apache.spark.sql.types.DoubleType |
           _: org.apache.spark.sql.types.DecimalType => true
      case _ => false
    }
  }
  private val payloadBool: Array[Boolean] = payloadIdx.map { i =>
    SqlTypes.toSpark(wireFields(i).sqlType) == org.apache.spark.sql.types.BooleanType
  }

  private def isJsonNumber(s: String): Boolean = {
    // JSON number grammar: -?int(.frac)?(exp)? — hand-rolled to keep
    // the per-row hot path regex-free
    var i = 0
    val n = s.length
    if (n == 0) return false
    if (s.charAt(i) == '-') i += 1
    val dStart = i
    while (i < n && s.charAt(i).isDigit) i += 1
    if (i == dStart) return false
    if (i < n && s.charAt(i) == '.') {
      i += 1
      val fStart = i
      while (i < n && s.charAt(i).isDigit) i += 1
      if (i == fStart) return false
    }
    if (i < n && (s.charAt(i) == 'e' || s.charAt(i) == 'E')) {
      i += 1
      if (i < n && (s.charAt(i) == '+' || s.charAt(i) == '-')) i += 1
      val eStart = i
      while (i < n && s.charAt(i).isDigit) i += 1
      if (i == eStart) return false
    }
    i == n
  }

  private def payloadJson(values: Array[String], nulls: Array[Boolean]): UTF8String = {
    val sb = new java.lang.StringBuilder(64)
    sb.append('{')
    var k = 0
    while (k < payloadIdx.length) {
      if (k > 0) sb.append(',')
      sb.append(payloadKey(k))
      val i = payloadIdx(k)
      if (nulls(i) || values(i) == null) sb.append("null")
      else {
        val v = values(i)
        if (payloadNumeric(k) && isJsonNumber(v)) sb.append(v)
        else if (payloadBool(k) && (v == "1" || v.equalsIgnoreCase("true")))
          sb.append("true")
        else if (payloadBool(k) && (v == "0" || v.equalsIgnoreCase("false")))
          sb.append("false")
        else {
          sb.append('"')
          NormalizedCdc.jsonEscape(sb, v)
          sb.append('"')
        }
      }
      k += 1
    }
    sb.append('}')
    UTF8String.fromString(sb.toString)
  }

  private val tag: UTF8String = UTF8String.fromString(table)

  def toRow(values: Array[String], nulls: Array[Boolean]): InternalRow = {
    val out = new Array[Any](outWireIdx.length)
    var j = 0
    while (j < outWireIdx.length) {
      out(j) = outWireIdx(j) match {
        case -1 => payloadJson(values, nulls)
        case -2 => tag
        case i =>
          if (typed) SqlTypes.cast(values(i), nulls(i), outDts(j))
          else UTF8String.fromString(values(i))
      }
      j += 1
    }
    new GenericInternalRow(out)
  }
}

/** A single-table replay partition plus its table's normalizer key. */
final case class NormalizedCdcPartition(inner: InputPartition, table: String)
    extends InputPartition

/** Creates replay readers that emit NORMALIZED rows: the inner
  * [[CdcReplayReader]] does the GTID-range replay/dedupe/reconnect work
  * and hands each wire row to the table's [[WireNormalizer]]. Per-table
  * wire predicates (metadata-column conjuncts compiled against each
  * table's own schema) drop rows before any payload is built. Runtime
  * filters (batch DPP) arrive riding the partition
  * ([[RuntimeFilteredCdcPartition]], compiled per table by the inner
  * planner) and AND into the static predicate. */
class NormalizedCdcReaderFactory(
    normalizers: Map[String, WireNormalizer],
    preds: Map[String, WirePred]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case NormalizedCdcPartition(RuntimeFilteredCdcPartition(rp: CdcReplayPartition, rt), t) =>
        val static = preds.getOrElse(t, null)
        new CdcReplayReader(rp, Array.empty, typed = true,
          pred = if (static == null) rt else WirePred.AndP(static, rt),
          normalizer = normalizers(t))
      case NormalizedCdcPartition(rp: CdcReplayPartition, t) =>
        new CdcReplayReader(rp, Array.empty, typed = true,
          pred = preds.getOrElse(t, null),
          normalizer = normalizers(t))
      case other => throw new IllegalArgumentException(
        s"unexpected partition type ${other.getClass}")
    }
}

/** Bounded one-shot pull of N heterogeneous tables into the normalized
  * changelog shape — the batch twin of [[NormalizedCdcMicroBatchStream]]
  * (`spark.read.format("maxscale-cdc").option("schemaMode",
  * "normalized")`), completing the {uniform, normalized} × {batch,
  * stream} matrix. The bootstrap story this serves: snapshot a whole
  * database's history as ONE DataFrame, then follow with the normalized
  * stream from the same per-table anchors.
  *
  * Planning delegates to one single-table [[CdcBatch]] per included
  * table, so every batch-planning behavior is inherited: anchor-at-quiet
  * or composite-`endGtid` bounds, zero-driver-I/O sequence-cut slices
  * for explicit bounds, bounded position sampling otherwise, parallel
  * executor-side replay. Partitions come back tagged with their table
  * and materialize through its [[WireNormalizer]].
  *
  * Filter routing matches the streaming twin: `_table`-only conjuncts
  * (static or runtime) prune whole tables at plan time — an excluded
  * table gets no probe connection and no replay; metadata-only conjuncts
  * compile per table against its own wire schema and drop rows before
  * payload encoding; `payload` conjuncts stay with Spark.
  */
final class NormalizedCdcBatch(
    required: StructType,
    opts: CdcOptions,
    pushed: Array[org.apache.spark.sql.sources.Filter],
    runtime: () => Array[org.apache.spark.sql.sources.Filter] = () => Array.empty)
    extends org.apache.spark.sql.connector.read.Batch {

  private val tables = opts.allTables
  private val multi = tables.size > 1

  /** One schema probe per table, concurrent — deferred to first
    * planning so `_table` pruning can exclude a table before it is
    * ever probed. Frozen at first access: runtime filters arriving
    * later only ever NARROW the set, so this is a superset and
    * [[planInputPartitions]] re-filters per plan. */
  private lazy val fieldsByTable: Seq[(String, Seq[CdcField])] = {
    val included = tables.filter(this.included)
    val probed = CdcConcurrent.map(included)(t => t -> CdcProbe.schemaFields(opts, t))
    NormalizedCdc.validate(probed)
    probed
  }
  private lazy val wireStructs: Map[String, StructType] = fieldsByTable.map {
    case (t, fs) => t -> SqlTypes.toStructType(fs, opts.typed)
  }.toMap

  private val tagSchema = StructType(Seq(org.apache.spark.sql.types
    .StructField(MultiCdc.TableColumn, StringType, nullable = false)))
  private val (tableConjuncts, restConjuncts) =
    pushed.partition(_.references.forall(_ == MultiCdc.TableColumn))
  private val metaConjuncts = restConjuncts.filter(
    _.references.forall(NormalizedCdc.Meta.contains))
  private val tablePred: WirePred =
    CdcWireFilters.compileAll(tableConjuncts.toSeq, tagSchema, typed = true)

  private def runtimeMetaConjuncts =
    runtime().filter(f => !f.references.forall(_ == MultiCdc.TableColumn) &&
      f.references.forall(NormalizedCdc.Meta.contains))

  /** Runtime `_table` predicate, compiled once per distinct filter()
    * delivery (runtime filters only ever arrive a handful of times per
    * query, but included() runs per table per re-plan). */
  private var rtPredFor: Seq[org.apache.spark.sql.sources.Filter] = null
  private var rtPred: WirePred = null
  private def runtimeTablePred: WirePred = synchronized {
    val tf = runtime().filter(_.references.forall(_ == MultiCdc.TableColumn)).toSeq
    if (tf != rtPredFor) {
      rtPredFor = tf
      rtPred = CdcWireFilters.compileAll(tf, tagSchema, typed = true)
    }
    rtPred
  }

  private def included(t: String): Boolean = {
    val row = Array(t); val noNull = Array(false)
    val rt = runtimeTablePred
    (tablePred == null || tablePred.eval(row, noNull)) &&
      (rt == null || rt.eval(row, noNull))
  }

  /** Parsed (and table-validated) composite endGtid, once — `endFor`
    * runs per table (the same memoization as [[CdcBatch.endComposite]],
    * so the two batch planners' bound semantics stay aligned). */
  private lazy val endComposite: Option[MultiGtidOffset] =
    opts.endGtid.filter(_ => multi).map { s =>
      require(s.contains('='),
        s"maxscale-cdc: multi-table endGtid must use the composite " +
          s"'db.a=0-1-5,db.b=-' form, got '$s'")
      opts.compositeOf(s)
    }

  private def endFor(t: String): Option[Gtid] = opts.endGtid match {
    case None => None
    case Some(s) if !multi => Some(Gtid.parse(s))
    case Some(_) => endComposite.flatMap(_.of(t))
  }

  /** Single-table planner for one table: the inner batch sees plain
    * per-table bounds (resolved here from the composite forms) and
    * compiles runtime metadata conjuncts against ITS wire schema, so
    * the riding partition predicates are already per-table. */
  private def innerFor(t: String): CdcBatch =
    // normalized stays TRUE: the inner planner's probe tailers then
    // tolerate mid-stream re-schema (payload rows are schema-free)
    new CdcBatch(wireStructs(t), wireStructs(t),
      opts.copy(table = t, tables = Seq.empty,
        startingGtid = opts.startFor(t).map(_.toString),
        endGtid = endFor(t).map(_.toString)),
      pushed = Array.empty,
      runtime = () => runtimeMetaConjuncts)

  override def planInputPartitions(): Array[InputPartition] =
    // re-filter on every plan: BatchScanExec re-plans partitions after a
    // runtime filter() fires, and a `_table` DPP filter must prune the
    // delegate HERE (fieldsByTable froze the static superset)
    CdcConcurrent.map(fieldsByTable.map(_._1).filter(included)) { t =>
      innerFor(t).planInputPartitions()
        .map(p => NormalizedCdcPartition(p, t): InputPartition)
    }.flatten.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new NormalizedCdcReaderFactory(
      fieldsByTable.map { case (t, fs) =>
        t -> WireNormalizer(t, fs, opts.typed, required)
      }.toMap,
      fieldsByTable.map { case (t, _) =>
        t -> CdcWireFilters.compileAll(
          metaConjuncts.toSeq, wireStructs(t), opts.typed)
      }.filter(_._2 != null).toMap)
}

/** One [[CdcMicroBatchStream]] per (heterogeneous) table behind the
  * composite [[MultiGtidOffset]] — the normalized twin of
  * [[MultiCdcMicroBatchStream]]. Delegates plan replay descriptors
  * against their OWN wire schema; only the reader factory differs.
  *
  * The output schema cannot carry N wire schemas, so the stream
  * re-probes each table at construction (one connection per table,
  * concurrent — the same cost as planning-time inference) and fails
  * loudly on drift against the planning schema, the single-table
  * restart contract.
  */
class NormalizedCdcMicroBatchStream(
    schema: StructType, required: StructType, opts: CdcOptions,
    checkpointLocation: String,
    pushed: Array[org.apache.spark.sql.sources.Filter] = Array.empty)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow with ReportsSourceMetrics
    with CdcPushdownSupport {

  private val tables = opts.allTables

  private val fieldsByTable: Seq[(String, Seq[CdcField])] =
    CdcConcurrent.map(tables)(t => t -> CdcProbe.schemaFields(opts, t))
  locally {
    val now = NormalizedCdc.schemaFor(fieldsByTable, opts.typed)
    def shape(s: StructType) = s.fields.map(f => (f.name, f.dataType)).toSeq
    if (shape(now) != shape(schema)) throw new CdcProtocolException(
      s"schema drift between planning and stream start: normalized schema " +
        s"was ${shape(schema)}, probes now give ${shape(now)} — restart " +
        "the query")
  }
  private val wireStructs: Map[String, StructType] = fieldsByTable.map {
    case (t, fs) => t -> SqlTypes.toStructType(fs, opts.typed)
  }.toMap

  /** `_table`-only conjuncts prune whole tables at plan time (no
    * tailer, no connection, frozen offset — same contract as the
    * uniform composite); metadata-only conjuncts compile per table
    * against that table's wire schema and drop rows before payload
    * encoding. Everything else stays with Spark (all filters are
    * residual). */
  private val tagSchema = StructType(Seq(org.apache.spark.sql.types
    .StructField(MultiCdc.TableColumn, StringType, nullable = false)))
  private val (tableConjuncts, restConjuncts) =
    pushed.partition(_.references.forall(_ == MultiCdc.TableColumn))
  private val metaConjuncts = restConjuncts.filter(
    _.references.forall(NormalizedCdc.Meta.contains))
  private val tablePred: WirePred =
    CdcWireFilters.compileAll(tableConjuncts.toSeq, tagSchema, typed = true)

  @volatile private var runtimeTablePred: WirePred = null
  @volatile private var runtimeMetaConjuncts:
    Seq[org.apache.spark.sql.sources.Filter] = Nil
  override def pushRuntime(
      filters: Seq[org.apache.spark.sql.sources.Filter],
      referenced: Option[Set[String]]): Unit = {
    CdcPushdownProbe.lastRuntimeFilters = filters.map(_.toString)
    CdcPushdownProbe.lastRuntimeReferenced = referenced
    val (tf, rf) =
      filters.partition(_.references.forall(_ == MultiCdc.TableColumn))
    runtimeTablePred = CdcWireFilters.compileAll(tf, tagSchema, typed = true)
    runtimeMetaConjuncts =
      rf.filter(_.references.forall(NormalizedCdc.Meta.contains))
  }

  private def predFor(t: String): WirePred = {
    val static = CdcWireFilters.compileAll(
      metaConjuncts.toSeq, wireStructs(t), opts.typed)
    val runtime = CdcWireFilters.compileAll(
      runtimeMetaConjuncts, wireStructs(t), opts.typed)
    (static, runtime) match {
      case (null, r) => r
      case (s, null) => s
      case (s, r)    => WirePred.AndP(s, r)
    }
  }

  private def included(t: String): Boolean = {
    val row = Array(t); val noNull = Array(false)
    (tablePred == null || tablePred.eval(row, noNull)) &&
      (runtimeTablePred == null || runtimeTablePred.eval(row, noNull))
  }

  private def subCheckpoint(t: String): String =
    checkpointLocation + "/table-" + java.net.URLEncoder.encode(t, "UTF-8")

  /** `domainMode=vector` composes here (r10 verdict item 4's second
    * half — the multi-master HETEROGENEOUS database): delegates become
    * per-table [[DomainVectorMicroBatchStream]]s behind a
    * [[MultiVectorOffset]] instead of single-triple streams behind a
    * [[MultiGtidOffset]]; everything else (per-table checkpoint scopes,
    * `_table` pruning, per-table wire predicates, the normalizing data
    * plane) is offset-shape-agnostic and identical. */
  private val vector = opts.domainVector

  private val streams: Seq[(String, MicroBatchStream with SupportsAdmissionControl
      with SupportsTriggerAvailableNow with ReportsSourceMetrics)] =
    tables.map { t =>
      // normalized stays TRUE: the delegate's tailer then ABSORBS
      // mid-stream DDL re-schema (validateEvolved + GTID re-location)
      // instead of failing the query — the one divergence from uniform
      // mode's documented fail-and-restart (SURVEY.md §1.3), closed
      // because normalized payload rows are schema-free
      t -> (if (vector)
        new DomainVectorMicroBatchStream(
          wireStructs(t), opts.copy(table = t, tables = Seq.empty,
            startingGtid = MultiVectorOffset.startFor(opts.startingGtid, tables, t)),
          subCheckpoint(t), wireStructs(t))
      else
        new CdcMicroBatchStream(
          wireStructs(t), opts.copy(table = t, tables = Seq.empty,
            startingGtid = opts.startFor(t).map(_.toString)),
          subCheckpoint(t), wireStructs(t)))
    }

  private def idleOf(s: MicroBatchStream): Unit = s match {
    case c: CdcMicroBatchStream          => c.idle()
    case d: DomainVectorMicroBatchStream => d.idle()
    case _ => ()
  }

  /** This table's slice of a composite offset, in the delegate's own
    * offset shape (GtidOffset or DomainVectorOffset). */
  private def posOf(o: Offset, t: String): Offset = o match {
    case m: MultiGtidOffset    => GtidOffset(m.of(t))
    case m: MultiVectorOffset  => m.of(t)
    case g: GtidOffset         => g
    case v: DomainVectorOffset => v
    case other => throw new IllegalArgumentException(
      s"unexpected offset type ${other.getClass}")
  }

  private def composite(entries: Seq[(String, Offset)]): Offset =
    if (vector)
      MultiVectorOffset(entries.map { case (t, o) =>
        t -> o.asInstanceOf[DomainVectorOffset] })
    else
      MultiGtidOffset(entries.map { case (t, o) =>
        t -> o.asInstanceOf[GtidOffset].gtid })

  override def initialOffset(): Offset =
    composite(streams.map { case (t, s) => t -> s.initialOffset() })

  override def prepareForTriggerAvailableNow(): Unit =
    streams.foreach(_._2.prepareForTriggerAvailableNow())

  override def deserializeOffset(json: String): Offset =
    if (vector) MultiVectorOffset.fromJson(json)
    else MultiGtidOffset.fromJson(json)

  override def getDefaultReadLimit: ReadLimit =
    ReadLimit.maxRows(opts.maxEventsPerBatch)

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val max = limit match {
      case r: ReadMaxRows => math.min(r.maxRows(), Int.MaxValue).toInt
      case _ => opts.maxEventsPerBatch
    }
    val nIncluded = math.max(1, tables.count(included))
    val perTable = math.max(1, max / nIncluded)
    composite(streams.map { case (t, s) =>
      t -> (if (!included(t)) { idleOf(s); posOf(start, t) }
            else s.latestOffset(posOf(start, t), ReadLimit.maxRows(perTable)))
    })
  }

  override def latestOffset(): Offset = throw new IllegalStateException(
    "latestOffset(Offset, ReadLimit) should be called instead of this method")

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    streams.flatMap { case (t, s) =>
      if (!included(t)) Array.empty[InputPartition]
      else s.planInputPartitions(posOf(start, t), posOf(end, t))
        .map(p => NormalizedCdcPartition(p, t): InputPartition)
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new NormalizedCdcReaderFactory(
      fieldsByTable.map { case (t, fs) =>
        t -> WireNormalizer(t, fs, opts.typed, required)
      }.toMap,
      tables.map(t => t -> predFor(t)).filter(_._2 != null).toMap)

  override def commit(end: Offset): Unit =
    streams.foreach { case (t, s) => s.commit(posOf(end, t)) }

  override def stop(): Unit = streams.foreach(_._2.stop())

  override def metrics(latestConsumedOffset: java.util.Optional[Offset]): java.util.Map[String, String] = {
    val m = new java.util.HashMap[String, String]()
    streams.foreach { case (t, s) =>
      m.put(s"$t.included", included(t).toString)
      s.metrics(java.util.Optional.empty[Offset]()).forEach((k, v) =>
        m.put(s"$t.$k", v))
    }
    m
  }
}
