package graft.sources.cdc

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, ReportsSourceMetrics, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String

/** Multi-table mode (`tables=db.a,db.b`): several same-schema tables —
  * the sharded-upstream shape — in ONE streaming query.
  *
  * The reference client binds one db.table per connection
  * (cdc_connector.h:52-58, REQUEST-DATA takes a single table), so the
  * wire protocol stays one-connection-per-table here too; what this
  * removes is the per-table QUERY overhead on the consumer side: one
  * checkpoint, one composite offset, one DataFrame with a `_table`
  * provenance column instead of N queries to operate and monitor.
  */
object MultiCdc {
  /** Name of the appended provenance column in multi-table mode. */
  val TableColumn = "_table"

  /** Multi-table mode exists for same-schema shards — fail loudly at
    * plan time (not row-decode time) when a table's wire schema
    * differs. Shared by schema inference and the bootstrap's probes. */
  private[cdc] def requireSameSchema(
      fieldsByTable: Seq[(String, Seq[CdcField])]): Unit = {
    val (t0, base) = fieldsByTable.head
    fieldsByTable.tail.foreach { case (t, f) =>
      if (f != base) throw new CdcProtocolException(
        s"maxscale-cdc: tables must share one schema; '$t' differs from " +
          s"'$t0': $f vs $base")
    }
  }
}

/** Driver-side fan-out over independent per-table probes (schema
  * inference, anchors, batch planning): each probe opens its own
  * connection and blocks up to its quiet deadline, so sequential
  * probing would cost N tables × quiet-wait. First failure aborts the
  * rest (shutdownNow interrupts queued and running probes). */
private[cdc] object CdcConcurrent {
  def map[A, B](items: Seq[A], maxThreads: Int = 8)(f: A => B): Seq[B] = {
    if (items.size <= 1) return items.map(f)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(items.size, maxThreads))
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    try
      scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(
          items.map(a => scala.concurrent.Future(f(a)))),
        scala.concurrent.duration.Duration.Inf) // f's deadlines bound this
    catch { case t: Throwable => pool.shutdownNow(); throw t }
    finally pool.shutdown()
  }
}

/** Composite offset: one GTID position per subscribed table, serialized
  * on ONE line (Spark's OffsetSeqLog is line-oriented) as
  * `db.a=0-1-5,db.b=-` with [[GtidOffset.StartJson]] for stream-start.
  * Entry order follows the `tables` option, so equal positions always
  * serialize identically (Spark compares offsets by their JSON). */
final case class MultiGtidOffset(gtids: Seq[(String, Option[Gtid])]) extends Offset {
  override def json(): String =
    gtids.map { case (t, g) =>
      s"$t=${g.map(_.toString).getOrElse(GtidOffset.StartJson)}"
    }.mkString(",")

  def of(table: String): Option[Gtid] =
    gtids.collectFirst { case (t, g) if t == table => g }.flatten
}

object MultiGtidOffset {
  def fromJson(s: String): MultiGtidOffset =
    // trim each entry: checkpoint round-trips never carry spaces, but
    // the composite form doubles as the user-facing startingGtid/endGtid
    // syntax, where "db.a=0-1-5, db.b=-" is the natural spelling
    MultiGtidOffset(s.split(',').toSeq.map(_.trim).filter(_.nonEmpty).map { part =>
      val i = part.lastIndexOf('=')
      require(i > 0, s"malformed multi-table offset entry '$part'")
      part.substring(0, i).trim -> GtidOffset.fromJson(part.substring(i + 1).trim).gtid
    })
}

/** One [[CdcMicroBatchStream]] per table, composed behind a composite
  * offset. Each delegate keeps its own tailer, committed-GTID watermark
  * (under a per-table subdirectory of the checkpoint) and admission
  * control; the row budget of each batch is split evenly across tables.
  * Partitions are tagged with their table so the reader can append the
  * `_table` column — the data plane is otherwise exactly the single-table
  * executor-replay path.
  */
class MultiCdcMicroBatchStream(
    schema: StructType, required: StructType, opts: CdcOptions,
    checkpointLocation: String,
    pushed: Array[org.apache.spark.sql.sources.Filter] = Array.empty)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow with ReportsSourceMetrics
    with CdcPushdownSupport {

  require(schema.fields.lastOption.exists(_.name == MultiCdc.TableColumn),
    s"multi-table schema must end in the ${MultiCdc.TableColumn} column")
  private val baseSchema = StructType(schema.fields.dropRight(1))
  /** Whether the (possibly pruned) output still carries `_table`. */
  private val appendTable: Boolean =
    required.fieldNames.contains(MultiCdc.TableColumn)
  /** Whether any base column survived the prune; when false (a
    * `_table`-only projection) the reader emits the tag alone — the
    * inner reader still runs, but only to frame rows / drive replay. */
  private val emitBase: Boolean =
    required.fields.exists(_.name != MultiCdc.TableColumn)
  /** The pruned base-row schema each delegate decodes; a `_table`-only
    * projection still decodes one base column for row framing (its
    * values are discarded — see [[TaggedCdcReaderFactory]]). */
  private val baseRequired: StructType = {
    val base = StructType(
      required.fields.filterNot(_.name == MultiCdc.TableColumn))
    if (base.fields.isEmpty) StructType(baseSchema.fields.take(1)) else base
  }
  private val tables = opts.allTables

  /** Pushed `_table` conjuncts become PLAN-TIME table pruning: an
    * excluded table gets no tailer, no connection, no partitions, and a
    * frozen offset (its composite-offset entry never advances — the safe
    * direction: dropping the filter later replays from the freeze point,
    * duplicating rather than losing). Base-column conjuncts compile into
    * the per-row wire predicate the tagged readers apply. */
  private val tagSchema = StructType(Seq(org.apache.spark.sql.types
    .StructField(MultiCdc.TableColumn,
      org.apache.spark.sql.types.StringType, nullable = false)))
  private val (tableConjuncts, rowConjuncts) =
    pushed.partition(_.references.forall(_ == MultiCdc.TableColumn))
  private val tablePred: WirePred =
    CdcWireFilters.compileAll(tableConjuncts.toSeq, tagSchema, typed = true)
  private val rowPred: WirePred =
    CdcWireFilters.compileAll(rowConjuncts.toSeq, baseSchema, opts.typed)

  /** Runtime pushdown (the operative path — see CdcStreamingPushdown):
    * split exactly like the static conjuncts. All advisory: a raced
    * batch runs unpruned, never incorrectly. */
  @volatile private var runtimeTablePred: WirePred = null
  @volatile private var runtimeRowPred: WirePred = null
  @volatile private var runtimeMask: Array[Boolean] = null
  override def pushRuntime(
      filters: Seq[org.apache.spark.sql.sources.Filter],
      referenced: Option[Set[String]]): Unit = {
    CdcPushdownProbe.lastRuntimeFilters = filters.map(_.toString)
    CdcPushdownProbe.lastRuntimeReferenced = referenced
    val (tf, rf) =
      filters.partition(_.references.forall(_ == MultiCdc.TableColumn))
    runtimeTablePred = CdcWireFilters.compileAll(tf, tagSchema, typed = true)
    runtimeRowPred = CdcWireFilters.compileAll(
      rf.filterNot(_.references.contains(MultiCdc.TableColumn)),
      baseSchema, opts.typed)
    runtimeMask = referenced match {
      case Some(refs) if !baseRequired.fields.forall(f => refs.contains(f.name)) =>
        baseRequired.fields.map(f => refs.contains(f.name))
      case _ => null
    }
  }

  private def included(t: String): Boolean = {
    val row = Array(t); val noNull = Array(false)
    (tablePred == null || tablePred.eval(row, noNull)) &&
      (runtimeTablePred == null || runtimeTablePred.eval(row, noNull))
  }

  /** Per-table checkpoint scope for the committed-GTID watermark file —
    * URL-encoded so `db.table` never introduces path separators. */
  private def subCheckpoint(t: String): String =
    checkpointLocation + "/table-" + java.net.URLEncoder.encode(t, "UTF-8")

  private val streams: Seq[(String, CdcMicroBatchStream)] = tables.map { t =>
    // resolve a composite startingGtid to THIS table's entry before the
    // copy narrows the options to single-table mode
    t -> new CdcMicroBatchStream(
      baseSchema, opts.copy(table = t, tables = Seq.empty,
        startingGtid = opts.startFor(t).map(_.toString)), subCheckpoint(t),
      baseRequired)
  }

  private def gtidOf(o: Offset, t: String): GtidOffset = o match {
    case m: MultiGtidOffset => GtidOffset(m.of(t))
    case g: GtidOffset      => g // degenerate: never produced here
    case other => throw new IllegalArgumentException(
      s"unexpected offset type ${other.getClass}")
  }

  override def initialOffset(): Offset =
    MultiGtidOffset(streams.map { case (t, s) =>
      t -> s.initialOffset().asInstanceOf[GtidOffset].gtid
    })

  /** Trigger.AvailableNow: every delegate anchors its own 'now' (first
    * quiet moment of its table's stream); the composite then drains to
    * the per-table targets and stops. */
  override def prepareForTriggerAvailableNow(): Unit =
    streams.foreach(_._2.prepareForTriggerAvailableNow())

  override def deserializeOffset(json: String): Offset =
    MultiGtidOffset.fromJson(json)

  override def getDefaultReadLimit: ReadLimit =
    ReadLimit.maxRows(opts.maxEventsPerBatch)

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val max = limit match {
      case r: ReadMaxRows => math.min(r.maxRows(), Int.MaxValue).toInt
      case _ => opts.maxEventsPerBatch
    }
    val nIncluded = math.max(1, tables.count(included))
    val perTable = math.max(1, max / nIncluded)
    MultiGtidOffset(streams.map { case (t, s) =>
      // excluded tables freeze at their current position and idle their
      // tailer: no connection, no buffered backlog. (Runtime `_table`
      // pruning arrives with the first batch's optimization, so batch 0
      // may tail every table once — unoptimized, never incorrect.)
      t -> (if (!included(t)) { s.idle(); gtidOf(start, t).gtid }
            else s.latestOffset(gtidOf(start, t), ReadLimit.maxRows(perTable))
              .asInstanceOf[GtidOffset].gtid)
    })
  }

  override def latestOffset(): Offset = throw new IllegalStateException(
    "latestOffset(Offset, ReadLimit) should be called instead of this method")

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    streams.flatMap { case (t, s) =>
      if (!included(t)) Array.empty[InputPartition]
      else s.planInputPartitions(gtidOf(start, t), gtidOf(end, t))
        .map(p => TaggedCdcPartition(p, t): InputPartition)
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory = {
    val pred = (rowPred, runtimeRowPred) match {
      case (null, r) => r
      case (s, null) => s
      case (s, r)    => WirePred.AndP(s, r)
    }
    new TaggedCdcReaderFactory(
      baseSchema, baseRequired, opts.typed, appendTable, emitBase, pred,
      runtimeMask)
  }

  override def commit(end: Offset): Unit =
    streams.foreach { case (t, s) => s.commit(gtidOf(end, t)) }

  override def stop(): Unit = streams.foreach(_._2.stop())

  /** Per-table driver-side metrics (delegate maps, table-prefixed keys)
    * plus the composite pruning state. */
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

/** A single-table partition plus the table it came from. */
final case class TaggedCdcPartition(inner: InputPartition, table: String)
    extends InputPartition

/** Delegates to the single-table reader (pruned to `baseRequired`) and,
  * when the projection kept `_table`, appends the constant table value —
  * a mutable JoinedRow over the inner row, the standard append-a-column
  * source pattern (rows are projected/copied by the scan exec before
  * buffering). A `_table`-only projection (`emitBase` false) emits the
  * tag alone: the inner reader still frames rows and drives GTID
  * replay, but its one decoded framing column is discarded so the row
  * width matches `readSchema()`. */
class TaggedCdcReaderFactory(baseSchema: StructType, baseRequired: StructType,
    typed: Boolean, appendTable: Boolean, emitBase: Boolean = true,
    rowPred: WirePred = null, mask: Array[Boolean] = null)
    extends PartitionReaderFactory {
  private val projection: Array[Int] =
    if (baseRequired == baseSchema) null
    else baseRequired.fields.map(f => baseSchema.fieldIndex(f.name))
  private val inner =
    new CdcPartitionReaderFactory(baseRequired, typed, projection, rowPred, mask)

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case TaggedCdcPartition(p, t) =>
        val r = inner.createReader(p)
        if (!appendTable) r
        else {
          val tag = new GenericInternalRow(
            Array[Any](UTF8String.fromString(t)))
          if (!emitBase)
            new PartitionReader[InternalRow] {
              override def next(): Boolean = r.next()
              override def get(): InternalRow = tag
              override def currentMetricsValues(): Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
                r.currentMetricsValues()
              override def close(): Unit = r.close()
            }
          else
            new PartitionReader[InternalRow] {
              private val joined = new JoinedRow
              override def next(): Boolean = r.next()
              override def get(): InternalRow = joined(r.get(), tag)
              override def currentMetricsValues(): Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
                r.currentMetricsValues()
              override def close(): Unit = r.close()
            }
        }
      case other => throw new IllegalArgumentException(
        s"unexpected partition type ${other.getClass}")
    }
}
