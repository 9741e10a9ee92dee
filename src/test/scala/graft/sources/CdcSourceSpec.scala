package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.cdc.{CdcMicroBatchStream, CdcOptions, CdcProtocolException, CdcReplayPartition, CdcPartitionReaderFactory, GtidOffset, MaxScaleCdcTableProvider}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}
import org.apache.spark.sql.types._
import org.scalatest.concurrent.Eventually.{eventually, interval, timeout}
import org.scalatest.time.{Seconds, Span}

import MockMaxScaleServer.{Schema, event}
import scala.jdk.CollectionConverters._

object CdcSourceSpec {
  /** Cross-restart sink for the foreachBatch resume test, keyed by batchId:
    * foreachBatch is at-least-once per batch, so a re-delivered batch
    * overwrites its slot — exactly the idempotence contract Spark asks of
    * sinks. Exactly-once then means: batch slices are disjoint and their
    * union is the full stream. */
  val collected = new scala.collection.concurrent.TrieMap[Long, Seq[Int]]()
}

/** End-to-end `readStream.format("maxscale-cdc")` against the mock server:
  * typed/raw modes, offset progression, checkpointed GTID resume with no
  * duplicates, mid-stream re-schema failure (SURVEY.md §5 item 4). */
class CdcSourceSpec extends SparkSpec {

  private def reader(srv: MockMaxScaleServer, mode: String = "typed",
      gtid: Option[String] = None): DataFrame = {
    var r = spark.readStream.format("maxscale-cdc")
      .option("host", "127.0.0.1")
      .option("port", srv.port)
      .option("user", "u").option("password", "p")
      .option("table", "db.t")
      .option("timeoutSeconds", 1)
      .option("mode", mode)
    gtid.foreach(g => r = r.option("startingGtid", g))
    r.load()
  }

  test("typed mode: inferred schema maps declared SQL types") {
    val srv = new MockMaxScaleServer(Schema, Seq(event(1, "insert", 1, "a")))
    try {
      val df = reader(srv)
      assert(df.schema("id").dataType == IntegerType)
      assert(df.schema("name").dataType == StringType)
      assert(df.schema("sequence").dataType == IntegerType)
      assert(df.schema("name").metadata.getString("cdc.sqlType") == "varchar(64)")
    } finally srv.close()
  }

  test("end-to-end micro-batch delivery, then live pushes") {
    val srv = new MockMaxScaleServer(Schema, Seq(
      event(1, "insert", 10, "alice"), event(2, "insert", 11, "bob")))
    try {
      val q = reader(srv).writeStream.format("memory")
        .queryName("cdc_e2e").outputMode("append").start()
      try {
        eventually(timeout(Span(20, Seconds)), interval(Span(1, Seconds))) {
          q.processAllAvailable()
          assert(spark.table("cdc_e2e").count() == 2)
        }
        srv.push(event(3, "update", 10, "alice2"))
        eventually(timeout(Span(20, Seconds)), interval(Span(1, Seconds))) {
          q.processAllAvailable()
          assert(spark.table("cdc_e2e").count() == 3)
        }
        val rows = spark.table("cdc_e2e").orderBy("sequence").collect()
        assert(rows.map(_.getAs[Int]("id")).toSeq == Seq(10, 11, 10))
        assert(rows.last.getAs[String]("event_type") == "update")
      } finally q.stop()
    } finally srv.close()
  }

  test("raw mode keeps strings and conflates null with empty, like the reference") {
    val srv = new MockMaxScaleServer(Schema, Seq(event(1, "insert", 7, null)))
    try {
      val df = reader(srv, mode = "raw")
      assert(df.schema.fields.forall(_.dataType == StringType))
      val q = df.writeStream.format("memory")
        .queryName("cdc_raw").outputMode("append").start()
      try {
        eventually(timeout(Span(20, Seconds)), interval(Span(1, Seconds))) {
          q.processAllAvailable()
          assert(spark.table("cdc_raw").count() == 1)
        }
        val r = spark.table("cdc_raw").head()
        assert(r.getAs[String]("id") == "7")
        assert(r.getAs[String]("name") == "") // null→"" (cpp:106-107)
      } finally q.stop()
    } finally srv.close()
  }

  test("typed mode: JSON null becomes SQL NULL (documented improvement)") {
    val srv = new MockMaxScaleServer(Schema, Seq(event(1, "insert", 7, null)))
    try {
      val q = reader(srv).writeStream.format("memory")
        .queryName("cdc_null").outputMode("append").start()
      try {
        eventually(timeout(Span(20, Seconds)), interval(Span(1, Seconds))) {
          q.processAllAvailable()
          assert(spark.table("cdc_null").count() == 1)
        }
        assert(spark.table("cdc_null").head().isNullAt(
          spark.table("cdc_null").schema.fieldIndex("name")))
      } finally q.stop()
    } finally srv.close()
  }

  test("column pruning: ScanBuilder honors pruneColumns; projected stream " +
      "delivers correct values with GTID replay intact") {
    val srv = new MockMaxScaleServer(Schema, Seq(
      event(1, "insert", 10, "alice"), event(2, "insert", 11, "bob")))
    try {
      // unit: the DSv2 contract — readSchema shrinks to the required set
      val optMap = new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        Map("host" -> "127.0.0.1", "port" -> srv.port.toString,
          "user" -> "u", "password" -> "p", "table" -> "db.t",
          "timeoutSeconds" -> "1").asJava)
      val provider = new MaxScaleCdcTableProvider
      val schema = provider.inferSchema(optMap)
      val table = provider.getTable(schema, Array.empty,
          optMap.asCaseSensitiveMap())
        .asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsRead]
      val sb = table.newScanBuilder(optMap)
      sb.asInstanceOf[org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns]
        .pruneColumns(StructType(Seq(schema("id"), schema("name"))))
      assert(sb.build().readSchema().fieldNames.toSeq == Seq("id", "name"),
        "pruneColumns must shrink readSchema")
      // and an empty prune (count-only query) still frames rows
      val sb2 = table.newScanBuilder(optMap)
      sb2.asInstanceOf[org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns]
        .pruneColumns(StructType(Nil))
      assert(sb2.build().readSchema().fields.length == 1)

      // e2e: a projecting query delivers the right values even though the
      // pruned row no longer carries the GTID columns the replay uses
      val q = reader(srv).select("id", "name").writeStream.format("memory")
        .queryName("cdc_pruned").outputMode("append").start()
      try {
        eventually(timeout(Span(20, Seconds)), interval(Span(1, Seconds))) {
          q.processAllAvailable()
          assert(spark.table("cdc_pruned").count() == 2)
        }
        assert(spark.table("cdc_pruned").schema.fieldNames.toSeq ==
          Seq("id", "name"))
        val rows = spark.table("cdc_pruned").orderBy("id")
          .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
        assert(rows == Seq((10, "alice"), (11, "bob")))
      } finally q.stop()
    } finally srv.close()
  }

  test("filter pushdown: event_type predicate reaches the source (probe), " +
      "rows stay correct, GTID offsets advance over filtered events") {
    val srv = new MockMaxScaleServer(Schema, Seq(
      event(1, "insert", 10, "alice"),
      event(2, "update_after", 10, "alice2"),
      event(3, "insert", 11, "bob"),
      event(4, "delete", 10, "alice2")))
    try {
      graft.sources.cdc.CdcPushdownProbe.lastRuntimeFilters = Nil
      graft.sources.cdc.CdcPushdownProbe.lastRuntimeReferenced = None
      val q = reader(srv)
        .where("event_type = 'insert'")
        .select("id", "name")
        .writeStream.format("memory").queryName("cdc_filtered")
        .outputMode("append").start()
      try {
        eventually(timeout(Span(20, Seconds)), interval(Span(1, Seconds))) {
          q.processAllAvailable()
          assert(spark.table("cdc_filtered").count() == 2)
        }
        assert(spark.table("cdc_filtered").orderBy("id")
          .collect().map(r => (r.getInt(0), r.getString(1))).toSeq ==
          Seq((10, "alice"), (11, "bob")))
        // the session-side rule really delivered the predicate + the
        // referenced-column set to the live stream (behavior alone can't
        // show it — the filter stays residual in the plan)
        assert(graft.sources.cdc.CdcPushdownProbe.lastRuntimeFilters
          .exists(_.contains("event_type")),
          s"expected event_type in runtime-pushed filters, got " +
            s"${graft.sources.cdc.CdcPushdownProbe.lastRuntimeFilters}")
        graft.sources.cdc.CdcPushdownProbe.lastRuntimeReferenced.foreach {
          refs =>
            assert(refs.contains("id") && refs.contains("name") &&
              refs.contains("event_type"), s"referenced set wrong: $refs")
            assert(!refs.contains("timestamp"),
              s"timestamp is never read but appears in $refs")
        }
        // the batch ranges covered the filtered tail event too: offsets
        // track wire GTIDs, not emitted rows
        eventually(timeout(Span(20, Seconds))) {
          q.processAllAvailable()
          val end = q.lastProgress.sources.head.endOffset
          assert(end != null && end.contains("0-1-4"),
            s"end offset should reach the filtered seq 4, got $end")
        }
        // driver-side source metrics report the engaged pushdown
        eventually(timeout(Span(20, Seconds))) {
          q.processAllAvailable()
          val m = q.lastProgress.sources.head.metrics
          assert(m != null && m.get("pushdownFilterActive") == "true",
            s"source metrics missing pushdown state: $m")
        }
      } finally q.stop()
    } finally srv.close()
  }

  test("checkpointed GTID resume: restart continues with no duplicates") {
    // memory sink can't recover from a checkpoint; foreachBatch can
    val ckpt = Files.createTempDirectory("cdc_ckpt").toString
    val srv = new MockMaxScaleServer(Schema,
      (1L to 3L).map(i => event(i, "insert", i.toInt, s"n$i")))
    try {
      def start() = reader(srv).writeStream
        .foreachBatch { (df: DataFrame, bid: Long) =>
          CdcSourceSpec.collected(bid) =
            df.select("sequence").collect().map(_.getInt(0)).toSeq
          ()
        }
        .option("checkpointLocation", ckpt).start()

      def delivered: Seq[Int] =
        CdcSourceSpec.collected.values.flatten.toSeq.sorted

      CdcSourceSpec.collected.clear()
      val q1 = start()
      try {
        eventually(timeout(Span(20, Seconds)), interval(Span(1, Seconds))) {
          q1.processAllAvailable()
          assert(delivered == Seq(1, 2, 3))
        }
      } finally q1.stop()

      // new events arrive while the query is down
      srv.push(event(4, "insert", 4, "n4"))
      srv.push(event(5, "insert", 5, "n5"))

      val q2 = start()
      try {
        // the server replays 1-5 inclusively from the checkpoint GTID;
        // batch GTID ranges must cover 4,5 exactly once and never
        // re-assign 1-3 to a NEW batch (a re-delivered batchId overwrites
        // its slot above, which is the sink idempotence Spark contracts)
        eventually(timeout(Span(20, Seconds)), interval(Span(1, Seconds))) {
          q2.processAllAvailable()
          assert(delivered == Seq(1, 2, 3, 4, 5))
        }
      } finally q2.stop()
    } finally srv.close()
  }

  test("startingGtid option starts mid-stream") {
    val srv = new MockMaxScaleServer(Schema,
      (1L to 4L).map(i => event(i, "insert", i.toInt, s"n$i")))
    try {
      // REQUEST-DATA replays from 0-1-2 inclusive; startingGtid is the
      // "already processed" position, so delivery begins AFTER it.
      val q = reader(srv, gtid = Some("0-1-2")).writeStream.format("memory")
        .queryName("cdc_gtid").outputMode("append").start()
      try {
        eventually(timeout(Span(20, Seconds)), interval(Span(1, Seconds))) {
          q.processAllAvailable()
          assert(spark.table("cdc_gtid").count() == 2)
        }
        val seqs = spark.table("cdc_gtid").orderBy("sequence")
          .collect().map(_.getAs[Int]("sequence")).toSeq
        assert(seqs == Seq(3, 4))
      } finally q.stop()
    } finally srv.close()
  }

  test("maxEventsPerBatch admission control splits the backlog into capped batches") {
    val srv = new MockMaxScaleServer(Schema,
      (1L to 10L).map(i => event(i, "insert", i.toInt, s"n$i")))
    try {
      val batchSizes = new java.util.concurrent.ConcurrentLinkedQueue[Integer]()
      val q = spark.readStream.format("maxscale-cdc")
        .option("host", "127.0.0.1").option("port", srv.port)
        .option("user", "u").option("password", "p")
        .option("table", "db.t").option("timeoutSeconds", 1)
        .option("maxEventsPerBatch", 3)
        .load()
        .writeStream.foreachBatch { (df: DataFrame, _: Long) =>
          val n = df.count().toInt
          if (n > 0) batchSizes.add(n)
          ()
        }.start()
      try {
        eventually(timeout(Span(30, Seconds)), interval(Span(1, Seconds))) {
          q.processAllAvailable()
          assert(batchSizes.asScala.map(_.toInt).sum == 10)
        }
        assert(batchSizes.asScala.forall(_ <= 3),
          s"a batch exceeded the cap: $batchSizes")
        assert(batchSizes.size >= 4) // 10 events / cap 3 → at least 4 batches
      } finally q.stop()
    } finally srv.close()
  }

  test("tailer reconnects from the last GTID when the server drops the stream") {
    // server closes the connection after every 2 events; the tailer must
    // reconnect with REQUEST-DATA from the last GTID and dedupe the
    // inclusive replay — delivering 1..6 exactly once
    val srv = new MockMaxScaleServer(Schema,
      (1L to 6L).map(i => event(i, "insert", i.toInt, s"n$i")),
      closeAfterEvents = Some(2))
    try {
      val q = reader(srv).writeStream.format("memory")
        .queryName("cdc_reconnect").outputMode("append").start()
      try {
        eventually(timeout(Span(30, Seconds)), interval(Span(1, Seconds))) {
          q.processAllAvailable()
          assert(spark.table("cdc_reconnect").count() == 6)
        }
        val seqs = spark.table("cdc_reconnect").orderBy("sequence")
          .collect().map(_.getAs[Int]("sequence")).toSeq
        assert(seqs == (1 to 6))
      } finally q.stop()
    } finally srv.close()
  }

  private def javaSerializedSize(o: AnyRef): Int = {
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(o); oos.close()
    bos.size()
  }

  private def streamFor(srv: MockMaxScaleServer, extra: Map[String, String] = Map.empty)
      : (CdcMicroBatchStream, String) = {
    val m = new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      (Map("host" -> "127.0.0.1", "port" -> srv.port.toString,
        "user" -> "u", "password" -> "p", "table" -> "db.t",
        "timeoutSeconds" -> "1") ++ extra).asJava)
    val schema = new MaxScaleCdcTableProvider().inferSchema(m)
    val ckpt = Files.createTempDirectory("cdc_unit_ckpt").toString
    (new CdcMicroBatchStream(schema, CdcOptions(m), ckpt), ckpt)
  }

  test("Trigger.AvailableNow: drains the backlog in capped batches, then " +
      "stops; a later run picks up from the checkpoint") {
    // the catch-up shape: a backfill job runs to 'now' and exits, cron
    // re-runs it later — Spark wraps the admission-controlled stream in
    // its AvailableNow wrapper, which must compose with GTID offsets
    val srv = new MockMaxScaleServer(Schema,
      (1L to 25L).map(i => event(i, "insert", i.toInt, s"n$i")))
    val ckpt = Files.createTempDirectory("cdc_avnow").toString
    val got = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    def runOnce(): Unit = {
      val q = reader(srv).writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (df: DataFrame, _: Long) =>
          df.select("id").collect().foreach(r => got.add(r.getInt(0)))
        }.start()
      assert(q.awaitTermination(60000), "AvailableNow query did not stop")
    }
    try {
      // cap batches at 10 events: the 25-event backlog needs >=3 batches,
      // proving the wrapper iterates instead of one-shotting
      val qsrv = srv
      val q = spark.readStream.format("maxscale-cdc")
        .option("host", "127.0.0.1").option("port", qsrv.port)
        .option("user", "u").option("password", "p")
        .option("table", "db.t").option("timeoutSeconds", 1)
        .option("maxEventsPerBatch", 10)
        .load().writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (df: DataFrame, _: Long) =>
          df.select("id").collect().foreach(r => got.add(r.getInt(0)))
        }.start()
      assert(q.awaitTermination(60000), "AvailableNow query did not stop")
      assert(got.asScala.toSet == (1 to 25).toSet, s"backlog not drained: $got")
      assert(q.recentProgress.count(_.numInputRows > 0) >= 3,
        "expected the 25-event backlog to drain in >=3 capped batches")

      // events arriving after the run are NOT consumed until the next run
      srv.push(event(26, "insert", 26, "n26"))
      srv.push(event(27, "insert", 27, "n27"))
      assert(!got.contains(26))
      runOnce()
      assert(got.asScala.toSet == (1 to 27).toSet,
        s"second run should resume from the checkpoint: $got")
    } finally srv.close()
  }

  test("Trigger.AvailableNow on an initially-empty changelog: prepare " +
      "anchors at 'nothing' and later events are never planned") {
    // the clamp must distinguish "no clamp" from "clamp to nothing":
    // before r8 an empty-at-prepare changelog left availableNowTarget at
    // None, so events arriving after query start were planned and
    // termination depended on the stream going quiet a second time
    val srv = new MockMaxScaleServer(Schema, Seq.empty)
    try {
      val (stream, _) = streamFor(srv)
      try {
        stream.prepareForTriggerAvailableNow() // quiet immediately: empty
        srv.push(event(1, "insert", 1, "late"))
        srv.push(event(2, "insert", 2, "later"))
        // wait until the tailer has demonstrably BUFFERED the late
        // events — only then does "not planned" prove the clamp
        eventually(timeout(Span(20, Seconds)), interval(Span(1, Seconds))) {
          assert(stream.metrics(java.util.Optional.empty())
            .get("bufferedEvents").toInt >= 2)
        }
        val end = stream.latestOffset(GtidOffset.Start,
          stream.getDefaultReadLimit)
        // the offset never advances past the (empty) anchor…
        assert(end.asInstanceOf[GtidOffset].gtid.isEmpty,
          s"late events leaked into an AvailableNow run anchored at empty: $end")
        // …and an empty offset range plans zero partitions (termination)
        assert(stream.planInputPartitions(GtidOffset.Start,
          GtidOffset(None)).isEmpty)
      } finally stream.stop()
    } finally srv.close()
  }

  test("reader-level pushdown units: wire predicate drops rows before " +
      "decode, decode mask nulls unreferenced columns") {
    import graft.sources.cdc.{CdcWireFilters, WirePred}
    val srv = new MockMaxScaleServer(Schema, Seq(
      event(1, "insert", 10, "alice"),
      event(2, "update_after", 10, "alice2"),
      event(3, "insert", 11, "bob")))
    try {
      val (stream, _) = streamFor(srv)
      try {
        var end = stream.latestOffset(GtidOffset.Start, stream.getDefaultReadLimit)
        eventually(timeout(Span(20, Seconds)), interval(Span(1, Seconds))) {
          end = stream.latestOffset(GtidOffset.Start, stream.getDefaultReadLimit)
          assert(end.asInstanceOf[GtidOffset].gtid.exists(_.sequence == 3))
        }
        val parts = stream.planInputPartitions(GtidOffset.Start, end)
        val schema = new MaxScaleCdcTableProvider().inferSchema(
          new org.apache.spark.sql.util.CaseInsensitiveStringMap(
            Map("host" -> "127.0.0.1", "port" -> srv.port.toString,
              "user" -> "u", "password" -> "p", "table" -> "db.t",
              "timeoutSeconds" -> "1").asJava))
        val pred = CdcWireFilters.compileAll(
          Seq(org.apache.spark.sql.sources.EqualTo("event_type", "insert")),
          schema, typed = true)
        assert(pred != null)
        // mask: only sequence + id decoded; name (last col) masked out
        val mask = schema.fields.map(f => f.name == "sequence" || f.name == "id")
        val factory = new CdcPartitionReaderFactory(
          schema, typed = true, projection = null, pred = pred, mask = mask)
        val idIdx = schema.fieldIndex("id")
        val nameIdx = schema.fieldIndex("name")
        val got = scala.collection.mutable.ArrayBuffer.empty[(Int, Boolean)]
        parts.foreach { p =>
          val r = factory.createReader(p)
          try while (r.next()) got += ((r.get().getInt(idIdx),
            r.get().isNullAt(nameIdx)))
          finally r.close()
        }
        // the update_after row never surfaced; masked name came out null
        assert(got.toSeq == Seq((10, true), (11, true)), s"got $got")
        // task metrics: 1 filtered, 2 decoded across the range's readers
        val metrics = parts.map { p =>
          val r = factory.createReader(p)
          try { while (r.next()) (); r.currentMetricsValues() }
          finally r.close()
        }.flatten
        def total(n: String) =
          metrics.filter(_.name == n).map(_.value).sum
        assert(total(graft.sources.cdc.CdcMetrics.FilteredRows) == 1,
          s"filtered-rows metric: ${metrics.toSeq}")
        assert(total(graft.sources.cdc.CdcMetrics.DecodedRows) == 2,
          s"decoded-rows metric: ${metrics.toSeq}")
      } finally stream.stop()
    } finally srv.close()
  }

  test("data plane stays off the driver: partitions are O(1) replay descriptors") {
    val n = 5000
    val srv = new MockMaxScaleServer(Schema,
      (1L to n.toLong).map(i => event(i, "insert", i.toInt, s"name_$i")))
    try {
      val (stream, _) = streamFor(srv)
      try {
        var end = stream.latestOffset(GtidOffset.Start, stream.getDefaultReadLimit)
        eventually(timeout(Span(20, Seconds)), interval(Span(1, Seconds))) {
          end = stream.latestOffset(GtidOffset.Start, stream.getDefaultReadLimit)
          assert(end.asInstanceOf[GtidOffset].gtid.exists(_.sequence == n))
        }
        val parts = stream.planInputPartitions(GtidOffset.Start, end)
        assert(parts.nonEmpty && parts.forall(_.isInstanceOf[CdcReplayPartition]))
        // the task binary must not scale with batch rows: a 5000-event
        // batch serializes to the same few hundred bytes as an empty one
        assert(parts.map(javaSerializedSize(_)).sum < 4096,
          s"replay descriptors too large: ${parts.map(javaSerializedSize(_)).toSeq}")

        // executor-side replay: a fresh reader re-reads the range from the
        // server and yields every event exactly once
        val schema = new MaxScaleCdcTableProvider().inferSchema(
          new org.apache.spark.sql.util.CaseInsensitiveStringMap(
            Map("host" -> "127.0.0.1", "port" -> srv.port.toString,
              "user" -> "u", "password" -> "p", "table" -> "db.t",
              "timeoutSeconds" -> "1").asJava))
        val factory = new CdcPartitionReaderFactory(schema, typed = true)
        val seqs = scala.collection.mutable.ArrayBuffer.empty[Int]
        parts.foreach { p =>
          val r = factory.createReader(p)
          try while (r.next()) seqs += r.get().getInt(2) // sequence column
          finally r.close()
        }
        assert(seqs.sorted == (1 to n))
      } finally stream.stop()
    } finally srv.close()
  }

  test("replayPartitions=3 splits a batch into disjoint contiguous GTID ranges") {
    val n = 90
    val srv = new MockMaxScaleServer(Schema,
      (1L to n.toLong).map(i => event(i, "insert", i.toInt, s"n$i")))
    try {
      val (stream, _) = streamFor(srv, Map("replayPartitions" -> "3"))
      try {
        var end = stream.latestOffset(GtidOffset.Start, stream.getDefaultReadLimit)
        eventually(timeout(Span(20, Seconds)), interval(Span(1, Seconds))) {
          end = stream.latestOffset(GtidOffset.Start, stream.getDefaultReadLimit)
          assert(end.asInstanceOf[GtidOffset].gtid.exists(_.sequence == n))
        }
        val parts = stream.planInputPartitions(GtidOffset.Start, end)
          .map(_.asInstanceOf[CdcReplayPartition])
        assert(parts.length == 3, parts.toSeq)
        // contiguous: each chunk starts where the previous ended
        assert(parts.head.startExclusive.isEmpty)
        parts.sliding(2).foreach { case Array(a, b) =>
          assert(b.startExclusive.contains(a.endInclusive)) }
        assert(parts.last.endInclusive == s"0-1-$n")
      } finally stream.stop()
    } finally srv.close()
  }

  test("catch-up re-plan: a range the tailer has not buffered still splits " +
      "into N>1 arithmetic subranges, exactly-once") {
    // The recovery/backfill shape (VERDICT r7 #2): after a restart Spark
    // re-plans the last uncommitted batch from its logged (start, end]
    // range BEFORE the fresh tailer has re-buffered those positions.
    // Previously that fell back to one serial chunk — one connection
    // drains the whole backlog however many executors are idle. Now the
    // planner cuts the range by sequence arithmetic (the bounded batch
    // planner's zero-wire-I/O cuts) and each subrange replays in
    // parallel.
    val n = 60
    val srv = new MockMaxScaleServer(Schema,
      (1L to n.toLong).map(i => event(i, "insert", i.toInt, s"n$i")))
    try {
      // catchupSpanPerConnection=1 pins the parallel-cut machinery at
      // fixture scale; the default 2^17 threshold would (correctly) keep
      // this 60-event span serial — AdaptiveSplitSpec pins that policy
      val (stream, _) = streamFor(srv, Map("replayPartitions" -> "4",
        "catchupSpanPerConnection" -> "1"))
      try {
        import graft.sources.cdc.{CdcSplitProbe, Gtid}
        val before = CdcSplitProbe.arithmeticFallbacks
        // play Spark's restart role: the offset log names the range; the
        // tailer (started inside planInputPartitions) cannot have
        // buffered any position yet when splitRanges runs
        val end = GtidOffset(Some(Gtid(0, 1, n.toLong)))
        val parts = stream.planInputPartitions(GtidOffset.Start, end)
          .map(_.asInstanceOf[CdcReplayPartition])
        assert(CdcSplitProbe.arithmeticFallbacks == before + 1,
          "expected the sequence-arithmetic fallback path")
        assert(parts.length == 4, parts.toSeq)
        // contiguous and covering: each chunk starts where the previous
        // ended, the last ends at the logged offset
        assert(parts.head.startExclusive.isEmpty)
        parts.sliding(2).foreach { case Array(a, b) =>
          assert(b.startExclusive.contains(a.endInclusive)) }
        assert(parts.last.endInclusive == s"0-1-$n")
        // strict semantics: streaming ends are observed events, so no
        // subrange may complete-on-quiet (silent truncation direction)
        assert(parts.forall(!_.completeOnQuiet))

        // replay every subrange executor-style: exactly-once union
        val factory = stream.createReaderFactory()
        val seqs = scala.collection.mutable.ArrayBuffer.empty[Int]
        parts.foreach { p =>
          val r = factory.createReader(p)
          try while (r.next()) seqs += r.get().getInt(2) // sequence column
          finally r.close()
        }
        assert(seqs.sorted.toSeq == (1 to n))
      } finally stream.stop()
    } finally srv.close()
  }

  test("e2e with replayPartitions=2: all events exactly once") {
    val srv = new MockMaxScaleServer(Schema,
      (1L to 40L).map(i => event(i, "insert", i.toInt, s"n$i")))
    try {
      val q = spark.readStream.format("maxscale-cdc")
        .option("host", "127.0.0.1").option("port", srv.port)
        .option("user", "u").option("password", "p")
        .option("table", "db.t").option("timeoutSeconds", 1)
        .option("replayPartitions", 2)
        .load()
        .writeStream.format("memory").queryName("cdc_par")
        .outputMode("append").start()
      try {
        eventually(timeout(Span(30, Seconds)), interval(Span(1, Seconds))) {
          q.processAllAvailable()
          assert(spark.table("cdc_par").count() == 40)
        }
        val seqs = spark.table("cdc_par").orderBy("sequence")
          .collect().map(_.getAs[Int]("sequence")).toSeq
        assert(seqs == (1 to 40))
      } finally q.stop()
    } finally srv.close()
  }

  test("mid-stream re-schema fails the query with a restart instruction") {
    val schema2 = Schema.replace("\"length\":64", "\"length\":128")
    val srv = new MockMaxScaleServer(Schema,
      Seq(event(1, "insert", 1, "a"), event(2, "insert", 2, "b")),
      midStreamSchemaAfter = Some((1, schema2)))
    try {
      val q = reader(srv).writeStream.format("memory")
        .queryName("cdc_reschema").outputMode("append").start()
      val e = intercept[StreamingQueryException] {
        q.processAllAvailable()
        q.awaitTermination(30000)
      }
      def chain(t: Throwable): Seq[Throwable] =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
      // depending on which connection triggers the mock's DDL swap first,
      // the change is detected mid-stream ("schema change") or between
      // planning and stream start ("schema drift") — both demand a restart
      // and both are recognized by graft.streaming.CdcAutoRestart
      assert(chain(e).exists(c => c.isInstanceOf[CdcProtocolException] &&
        (c.getMessage.contains("schema change") ||
          c.getMessage.contains("schema drift"))))
    } finally srv.close()
  }

  test("crash matrix: commit-log/GTID-file orderings neither duplicate nor lose events") {
    // Spark's per-batch sequence is offsetLog.add -> run batch ->
    // commitLog.add -> source.commit (our CommittedGtidFile.advance).
    // A kill can land in either window:
    //   A) after commitLog.add, before source.commit  -> the GTID file is
    //      BEHIND Spark's durable start on restart;
    //   B) after offsetLog.add, before commitLog.add  -> Spark re-plans the
    //      logged batch range on restart (file behind the planned end).
    // Both must yield disjoint, gap-free batch ranges downstream.
    spark.sparkContext // CommittedGtidFile resolves fs() off the active session
    val srv = new MockMaxScaleServer(Schema,
      (1L to 10L).map(i => event(i, "insert", i.toInt, s"n$i")))
    val ckpt = Files.createTempDirectory("cdc-crash-matrix").toString
    try {
      val opts = CdcOptions("127.0.0.1", srv.port, "u", "p", "db.t", None,
        timeoutSeconds = 1, typed = true, maxEventsPerBatch = 1000,
        replayPartitions = 1)
      val schema = new MaxScaleCdcTableProvider().inferSchema(
        new org.apache.spark.sql.util.CaseInsensitiveStringMap(Map(
          "host" -> "127.0.0.1", "port" -> srv.port.toString,
          "user" -> "u", "password" -> "p", "table" -> "db.t",
          "timeoutSeconds" -> "1").asJava))
      import graft.sources.cdc.{CommittedGtidFile, Gtid}

      def readBatch(s: CdcMicroBatchStream, start: GtidOffset, end: GtidOffset): Seq[Int] = {
        val factory = s.createReaderFactory()
        s.planInputPartitions(start, end).toSeq.flatMap { p =>
          val r = factory.createReader(p)
          val out = Seq.newBuilder[Int]
          try while (r.next()) out += r.get().getInt(2) // sequence column
          finally r.close()
          out.result()
        }
      }
      def gtidOf(o: org.apache.spark.sql.connector.read.streaming.Offset): GtidOffset =
        o.asInstanceOf[GtidOffset]

      // ---- epoch 1: plan + read 1..10; crash in window A (no source.commit)
      val s1 = new CdcMicroBatchStream(schema, opts, ckpt)
      try {
        val start1 = gtidOf(s1.initialOffset())
        val end1 = eventually(timeout(Span(20, Seconds)), interval(Span(100, org.scalatest.time.Milliseconds))) {
          val e = gtidOf(s1.latestOffset(start1, s1.getDefaultReadLimit))
          assert(e.gtid.exists(_.sequence == 10)); e
        }
        assert(readBatch(s1, start1, end1) == (1 to 10))
        // CRASH A: commitLog.add happened (end1 is Spark's durable start),
        // source.commit did not -> the GTID file never advanced
        assert(CommittedGtidFile.read(ckpt).isEmpty)

        // ---- restart: Spark hands start = end1; stale local state must not
        // plan a backwards batch or resurrect 1..10
        val s2 = new CdcMicroBatchStream(schema, opts, ckpt)
        try {
          val idle = gtidOf(s2.latestOffset(end1, s2.getDefaultReadLimit))
          assert(idle.gtid.exists(_ >= end1.gtid.get),
            s"planned end $idle regressed behind start $end1")
          assert(readBatch(s2, end1, idle).isEmpty, "empty idle batch expected")
          (11L to 15L).foreach(i => srv.push(event(i, "insert", i.toInt, s"n$i")))
          val end2 = eventually(timeout(Span(20, Seconds))) {
            val e = gtidOf(s2.latestOffset(end1, s2.getDefaultReadLimit))
            assert(e.gtid.exists(_.sequence == 15)); e
          }
          assert(readBatch(s2, end1, end2) == (11 to 15), "window-A restart duplicated or lost")
          s2.commit(end2)
          assert(CommittedGtidFile.read(ckpt).contains(Gtid(0, 1, 15)))
          // a stale commit re-delivered after restart must not regress the file
          s2.commit(end1)
          assert(CommittedGtidFile.read(ckpt).contains(Gtid(0, 1, 15)),
            "stale commit regressed the committed-GTID watermark")
        } finally s2.stop()
      } finally s1.stop()

      // ---- window B: offsetLog recorded (end1, end2]; commitLog didn't.
      // A restarted stream must re-deliver EXACTLY that range from the
      // server (recovery re-plan), byte-for-byte the same slice.
      val s3 = new CdcMicroBatchStream(schema, opts, ckpt)
      try {
        val e1 = GtidOffset(Some(Gtid(0, 1, 10)))
        val e2 = GtidOffset(Some(Gtid(0, 1, 15)))
        assert(readBatch(s3, e1, e2) == (11 to 15), "window-B re-plan drifted")
        // and the stream continues past the re-plan with no gap
        (16L to 18L).foreach(i => srv.push(event(i, "insert", i.toInt, s"n$i")))
        val end3 = eventually(timeout(Span(20, Seconds))) {
          val e = gtidOf(s3.latestOffset(e2, s3.getDefaultReadLimit))
          assert(e.gtid.exists(_.sequence == 18)); e
        }
        assert(readBatch(s3, e2, end3) == (16 to 18))
      } finally s3.stop()
    } finally srv.close()
  }

  test("PySpark surface pin: short name, option keys/defaults, offset JSON") {
    // python/README.md documents this exact surface for PySpark users —
    // if any assertion here changes, the doc (and the SWIG-parity facade's
    // gtid interchange) must change with it.
    import org.apache.spark.sql.execution.datasources.DataSource
    val cls = DataSource.lookupDataSource("maxscale-cdc", spark.sessionState.conf)
    assert(cls == classOf[MaxScaleCdcTableProvider],
      s"short name resolved to $cls")

    // option keys are case-insensitive; defaults per README
    val m = new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      Map("HOST" -> "h", "Table" -> "db.t").asJava)
    val opts = CdcOptions(m)
    assert(opts.host == "h" && opts.table == "db.t")
    assert(opts.port == 4001)
    assert(opts.timeoutSeconds == 10)           // reference default
    assert(opts.typed)                          // mode=typed is the default
    assert(opts.maxEventsPerBatch == 100000)
    assert(opts.replayPartitions == 1)
    assert(opts.startingGtid.isEmpty)
    assert(opts.endGtid.isEmpty)                // batch-only bound, off by default
    assert(opts.tables.isEmpty && opts.allTables == Seq("db.t"))

    // composite per-table GTID forms (multi-table mode): startingGtid /
    // endGtid entries as db.x=gtid with `-` = stream start / anchor
    val multi = CdcOptions(new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      Map("host" -> "h", "tables" -> "db.a,db.b",
        "startingGtid" -> "db.a=0-1-5,db.b=-").asJava))
    assert(multi.startFor("db.a").map(_.toString) == Some("0-1-5"))
    assert(multi.startFor("db.b").isEmpty)
    // plain form applies the same position to every table
    val uniform = CdcOptions(new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      Map("host" -> "h", "tables" -> "db.a,db.b",
        "startingGtid" -> "0-1-9").asJava))
    assert(uniform.startFor("db.a") == uniform.startFor("db.b") &&
      uniform.startFor("db.a").map(_.toString) == Some("0-1-9"))
    // composite form in single-table mode is a loud error
    val bad = intercept[IllegalArgumentException] {
      CdcOptions(new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        Map("host" -> "h", "table" -> "db.t",
          "startingGtid" -> "db.t=0-1-5").asJava)).startFor("db.t")
    }
    assert(bad.getMessage.contains("multi-table"))
    val missing = intercept[IllegalArgumentException] {
      CdcOptions(new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        Map("host" -> "h").asJava))
    }
    assert(missing.getMessage.contains("'table'"))

    // checkpoint offsets are human-auditable GTID strings, interchangeable
    // with startingGtid and the Python facade's connect(table, gtid=...)
    assert(GtidOffset.fromJson("0-1-42").json() == "0-1-42")
    assert(GtidOffset.Start.json() == "-")      // stream-start sentinel
    assert(GtidOffset.fromJson("-") == GtidOffset.Start)
    assert(GtidOffset.fromJson("").json() == "-")

    // composite offsets round-trip, including awkward-but-legal table
    // names ('=' inside the name: the value-side parse is rightmost-'=')
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val names = Seq("db.t", "d=b.t2", "a-b.c_d", "x.y").distinct
        .take(1 + rnd.nextInt(4))
      val off = graft.sources.cdc.MultiGtidOffset(names.map { t =>
        t -> (if (rnd.nextBoolean()) None
              else Some(graft.sources.cdc.Gtid(
                rnd.nextInt(4).toLong, rnd.nextInt(1000).toLong,
                1L + rnd.nextInt(1 << 20))))
      })
      assert(graft.sources.cdc.MultiGtidOffset.fromJson(off.json()) == off,
        s"composite offset round-trip broke for ${off.json()}")
    }
  }
}
