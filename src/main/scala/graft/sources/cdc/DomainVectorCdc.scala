package graft.sources.cdc

import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, ReportsSourceMetrics, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

/** `domainMode=vector` micro-batch stream: per-domain watermark offsets
  * ([[DomainVectorOffset]], MariaDB `gtid_slave_pos` semantics) over one
  * table — the INTERLEAVED multi-domain changelog a multi-master
  * deployment produces, which the single-triple stream must fail fast on
  * (no single GTID totally orders two live domains).
  *
  * The reference's resume token is one triple (`gtid()`,
  * cdc_connector.h:199-208), so this is an extension, not a parity
  * feature. It stays loss-free over the single-GTID wire protocol
  * because the driver OBSERVES log-arrival order: the offset's entries
  * are kept sorted by the arrival of each domain's watermark event, and
  * a (re)start requests `entries.head` — every pending event of every
  * domain sits at-or-after that log position, and per-domain dedupe
  * drops the re-delivered overlap (see [[DomainVectorOffset]]).
  *
  * Data plane: one [[CdcReplayPartition]] per domain slice (plus
  * within-domain adaptive splits — sequences are per-domain, so the
  * backlog-aware arithmetic cuts of [[GtidRangeCuts]] stay meaningful),
  * each executor replaying its domain's `(start_d, end_d]` and skipping
  * foreign-domain events in the interleave. At 1000 executors the
  * parallelism is #domains × within-domain splits, and no row touches
  * the driver.
  *
  * Exactly-once: per-domain floors make each batch a vector range —
  * recovery re-plans replay the logged `(startVec, endVec]` against the
  * server with no tailer state needed (end entries are observed events,
  * so every slice terminates).
  */
class DomainVectorMicroBatchStream(schema: StructType, opts: CdcOptions,
    checkpointLocation: String, required: StructType = null,
    pushed: Array[Filter] = Array.empty)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow
    with ReportsSourceMetrics with CdcPushdownSupport {

  require(opts.allTables.size == 1,
    "maxscale-cdc: domainMode=vector is single-table (combine with " +
      "'tables=' is not supported)")
  require(!opts.normalized,
    "maxscale-cdc: domainMode=vector with schemaMode=normalized is not " +
      "supported yet — use one mode per query")

  /** Wire fields are always the full table schema (replay needs the GTID
    * trio regardless of projection). */
  private val fields: Seq[CdcField] =
    schema.fields.toSeq.map { f =>
      val t = if (f.metadata.contains("cdc.sqlType"))
        f.metadata.getString("cdc.sqlType") else f.dataType.simpleString
      CdcField(f.name, t)
    }

  private val outSchema: StructType =
    if (required == null) schema else required
  private val projection: Array[Int] =
    if (outSchema == schema) null
    else outSchema.fields.map(f => schema.fieldIndex(f.name))

  private val wirePred: WirePred =
    CdcWireFilters.compileAll(pushed.toSeq, schema, opts.typed)

  @volatile private var runtimePred: WirePred = null
  @volatile private var runtimeMask: Array[Boolean] = null
  override def pushRuntime(
      filters: Seq[Filter], referenced: Option[Set[String]]): Unit = {
    CdcPushdownProbe.lastRuntimeFilters = filters.map(_.toString)
    CdcPushdownProbe.lastRuntimeReferenced = referenced
    runtimePred = CdcWireFilters.compileAll(filters, schema, opts.typed)
    runtimeMask = referenced match {
      case Some(refs) if !outSchema.fields.forall(f => refs.contains(f.name)) =>
        outSchema.fields.map(f => refs.contains(f.name))
      case _ => null
    }
  }

  /** `startingGtid` in vector mode: absent (stream start) or the
    * explicit `v:d-s-q,...` form — a bare triple is ambiguous about the
    * other domains' positions, the dangerous direction. */
  private val startVector: DomainVectorOffset = opts.startingGtid match {
    case None => DomainVectorOffset.Start
    case Some(s) =>
      require(s.startsWith("v:"),
        s"maxscale-cdc: domainMode=vector needs a 'v:d-s-q,...' " +
          s"startingGtid (a bare GTID says nothing about the other " +
          s"domains), got '$s'")
      DomainVectorOffset.fromJson(s)
  }

  /** Last committed vector (checkpoint-persisted) — the tailer's resume
    * floor. Never behind `startVector` on any domain. */
  @volatile private var resumeHint: DomainVectorOffset = {
    val committed = CommittedGtidFile.readVector(checkpointLocation)
    if (committed.covers(startVector)) committed
    else if (startVector.covers(committed)) startVector
    else DomainVectorOffset( // disjoint domains: union, committed first
      committed.entries ++ startVector.entries
        .filterNot(g => committed.of(g.domain).isDefined))
  }

  @volatile private var tailer: CdcTailer = _
  private def ensureTailer(): CdcTailer = synchronized {
    if (tailer == null) {
      tailer = new CdcTailer(opts.host, opts.port, opts.user, opts.password,
        opts.table, fields, resumeAfter = None, opts.timeoutMs,
        maxBuffered = math.max(2 * opts.maxEventsPerBatch, 10000),
        domainVector = true, resumeVector = resumeHint.entries)
      tailer.start()
    }
    tailer
  }

  override def initialOffset(): Offset = startVector

  /** Trigger.AvailableNow: 'now' anchors at the stream's first quiet
    * moment as the full per-domain VECTOR — every batch is then clamped
    * per domain, and domains first seen after the anchor are excluded,
    * so the query drains exactly the pre-existing interleaved backlog
    * and stops. */
  @volatile private var availableNowTarget: Seq[Gtid] = Nil
  @volatile private var availableNowPrepared = false
  override def prepareForTriggerAvailableNow(): Unit = {
    val t = ensureTailer()
    t.awaitQuiet(math.max(60000L, 4L * opts.timeoutMs))
    availableNowTarget = t.vectorSnapshot
    availableNowPrepared = true
  }

  override def deserializeOffset(json: String): Offset =
    DomainVectorOffset.fromJson(json)

  override def getDefaultReadLimit: ReadLimit =
    ReadLimit.maxRows(opts.maxEventsPerBatch)

  /** End of the last batch this stream planned (offsets advance ahead of
    * commits, exactly like the single-triple stream). */
  @volatile private var lastPlannedEnd: DomainVectorOffset = null

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val startVec = start.asInstanceOf[DomainVectorOffset]
    val t = ensureTailer()
    t.checkFatal()
    val max = limit match {
      case r: ReadMaxRows => math.min(r.maxRows(), Int.MaxValue).toInt
      case _ => opts.maxEventsPerBatch
    }
    // floor at the furthest of Spark's own start and our planned end —
    // after a crash between Spark's commit log and our watermark file
    // the local state can lag Spark's durable position
    val after =
      if (lastPlannedEnd != null && lastPlannedEnd.covers(startVec))
        lastPlannedEnd
      else startVec
    // AvailableNow: never plan past the anchored target vector; an
    // initially-empty changelog (empty target) plans nothing and the
    // query terminates with zero batches
    val clamp = if (availableNowPrepared) {
      if (availableNowTarget.isEmpty) return after
      availableNowTarget
    } else Nil
    val end = DomainVectorOffset(t.cappedEndVector(after.entries, max, clamp))
    lastPlannedEnd = end
    end
  }

  override def latestOffset(): Offset = throw new IllegalStateException(
    "latestOffset(Offset, ReadLimit) should be called instead of this method")

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[DomainVectorOffset]
    val e = end.asInstanceOf[DomainVectorOffset]
    val t = ensureTailer()
    t.checkFatal()
    // one slice set per domain that advanced; the replayPartitions
    // budget is allocated PROPORTIONALLY to each domain's sequence span
    // (a batch that is 99% one domain should not hand half its
    // connections to the other), floored at one connection per domain.
    // Within a domain: observed-position splits when the tailer covers
    // the range, backlog-aware sequence cuts on recovery.
    val advanced = e.entries.filter(g => s.of(g.domain).forall(g > _))
    if (advanced.isEmpty) return Array.empty
    val spans = advanced.map { endD =>
      endD -> math.max(1L,
        endD.sequence - s.of(endD.domain).map(_.sequence).getOrElse(0L))
    }
    val totalSpan = spans.map(_._2).sum.toDouble
    advanced.flatMap { endD =>
      val startD = s.of(endD.domain)
      val share = spans.find(_._1 == endD).map(_._2).getOrElse(1L) / totalSpan
      val nD = math.max(1, math.round(opts.replayPartitions * share).toInt)
      t.splitDomainRange(endD.domain, startD, endD, nD,
          opts.catchupSpanPerConnection).map { case (lo, hi) =>
        CdcReplayPartition(opts.host, opts.port, opts.user, opts.password,
          opts.table, fields, lo.map(_.toString), hi.toString,
          opts.timeoutMs, domainFilter = Some(endD.domain)): InputPartition
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val pred = (wirePred, runtimePred) match {
      case (null, r) => r
      case (s, null) => s
      case (s, r)    => WirePred.AndP(s, r)
    }
    new CdcPartitionReaderFactory(outSchema, opts.typed, projection, pred,
      runtimeMask)
  }

  /** Monotone vector commit: no domain's watermark ever regresses (the
    * file write enforces the same partial order). */
  override def commit(end: Offset): Unit = {
    val e = end.asInstanceOf[DomainVectorOffset]
    if (e.entries.nonEmpty) {
      CommittedGtidFile.advanceVector(checkpointLocation, e)
      if (e.covers(resumeHint)) resumeHint = e
      if (tailer != null) tailer.trimToVector(e.entries)
    }
  }

  override def stop(): Unit = synchronized {
    if (tailer != null) tailer.shutdown()
  }

  override def metrics(latestConsumedOffset: java.util.Optional[Offset]): java.util.Map[String, String] = {
    val m = new java.util.HashMap[String, String]()
    val t = tailer
    m.put("bufferedEvents", if (t == null) "0" else t.bufferedCount.toString)
    m.put("committedGtidVector", resumeHint.json())
    m.put("domains", resumeHint.entries.size.toString)
    m.put("pushdownFilterActive", (runtimePred != null || wirePred != null).toString)
    m.put("decodeSkipActive", (runtimeMask != null).toString)
    m
  }
}
