package graft.sources

import graft.SparkSpec
import graft.sources.cdc.{CdcClient, CdcProtocolException, CdcReplayPartition, CdcReplayReader, SqlTypes}

import scala.util.Random

import MockMaxScaleServer.{Schema, event}

/** Randomized fault-injection soak of the replay reader's reconnect /
  * quiet-completion state machine (`CdcReplayReader`): sockets dropped at
  * arbitrary points, N times, must never duplicate or lose a row, and a
  * server that stops making progress must fail LOUDLY past the reconnect
  * budget — never hang, never silently truncate. Seeds are pinned so a
  * failure replays exactly.
  *
  * The invariants under test (reference semantics: GTID replay is
  * inclusive of the requested position, cdc_connector.cpp:199-213, so a
  * resume always re-delivers the last-seen row and the reader must dedupe
  * it without counting it as progress):
  *  - exactly-once: delivered sequences are strictly increasing and equal
  *    the planted range, no matter where connections die;
  *  - budget resets on progress: any number of drops is survivable as
  *    long as each connection delivers at least one NEW row;
  *  - budget exhausts loudly: 4 consecutive zero-progress connections
  *    fail with a CdcProtocolException naming the range.
  */
class CdcSoakSpec extends SparkSpec {

  private def fieldsAndTypes = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val fields = CdcClient.parseSchemaFields(mapper.readTree(Schema))
    (fields, SqlTypes.toStructType(fields, typed = true).fields.map(_.dataType))
  }

  private def drain(r: CdcReplayReader): Seq[Int] = {
    val out = Seq.newBuilder[Int]
    try while (r.next()) out += r.get().getInt(2)
    finally r.close()
    out.result()
  }

  test("soak: random mid-range drops, exactly-once delivery (6 pinned seeds)") {
    val N = 400
    val events = (1L to N).map(i => event(i, "insert", i.toInt, s"n$i"))
    val (fields, dts) = fieldsAndTypes
    for (seed <- 1 to 6) {
      val rng = new Random(seed)
      // each dropped connection delivers >= 2 wire rows: the inclusive
      // replay duplicate of the resume position plus at least one NEW row,
      // so every connection makes progress and the budget keeps resetting
      // (the zero-progress path is soaked separately below)
      val schedule = Seq.fill(12)(2 + rng.nextInt(49))
      val srv = new MockMaxScaleServer(Schema, events, dropSchedule = schedule)
      try {
        val part = CdcReplayPartition("127.0.0.1", srv.port, "u", "p", "db.t",
          fields, startExclusive = None, endInclusive = s"0-1-$N",
          timeoutMs = 2000)
        val got = drain(new CdcReplayReader(part, dts, typed = true))
        assert(got == (1 to N),
          s"seed=$seed schedule=$schedule: lost/duplicated rows " +
            s"(got ${got.length}, dataConns=${srv.dataConnCount})")
      } finally srv.close()
    }
  }

  test("soak: drops during a resumed replay (non-empty startExclusive)") {
    // the resume path dedupes BELOW the range start as well as below
    // lastEmitted; drops must not let re-delivered history leak through
    val N = 200
    val events = (1L to N).map(i => event(i, "insert", i.toInt, s"n$i"))
    val (fields, dts) = fieldsAndTypes
    for (seed <- 1 to 3) {
      val rng = new Random(1000 + seed)
      val schedule = Seq.fill(8)(2 + rng.nextInt(30))
      val srv = new MockMaxScaleServer(Schema, events, dropSchedule = schedule)
      try {
        val part = CdcReplayPartition("127.0.0.1", srv.port, "u", "p", "db.t",
          fields, startExclusive = Some("0-1-50"), endInclusive = s"0-1-$N",
          timeoutMs = 2000)
        val got = drain(new CdcReplayReader(part, dts, typed = true))
        assert(got == (51 to N), s"seed=$seed schedule=$schedule: got $got")
      } finally srv.close()
    }
  }

  test("soak: drops + quiet completion of a user-named bound") {
    // endInclusive is a user-named DOMAIN position past the data; the
    // reader completes on a VERIFIED quiet stream. Drops during active
    // replay must not corrupt delivery, and the verification reconnect
    // must still terminate the read.
    val N = 60
    val events = (1L to N).map(i => event(i, "insert", i.toInt, s"n$i"))
    val (fields, dts) = fieldsAndTypes
    for (seed <- 1 to 3) {
      val rng = new Random(2000 + seed)
      // 3 drops early in the replay: all consumed while data still flows,
      // leaving the full reconnect budget for the quiet-verification step
      val schedule = Seq.fill(3)(2 + rng.nextInt(15))
      val srv = new MockMaxScaleServer(Schema, events, dropSchedule = schedule)
      try {
        val part = CdcReplayPartition("127.0.0.1", srv.port, "u", "p", "db.t",
          fields, startExclusive = None, endInclusive = "0-1-100",
          timeoutMs = 500, completeOnQuiet = true)
        val got = drain(new CdcReplayReader(part, dts, typed = true))
        assert(got == (1 to N), s"seed=$seed schedule=$schedule: got $got")
      } finally srv.close()
    }
  }

  test("soak: 4 consecutive zero-progress connections exhaust the budget loudly") {
    // schema-only connections (drop before the first row): no progress, so
    // the budget never resets and the 4th failure must surface — the
    // alternative is an infinite reconnect loop against a wedged server
    val events = (1L to 10L).map(i => event(i, "insert", i.toInt, s"n$i"))
    val (fields, dts) = fieldsAndTypes
    val srv = new MockMaxScaleServer(Schema, events,
      dropSchedule = Seq(0, 0, 0, 0))
    try {
      val part = CdcReplayPartition("127.0.0.1", srv.port, "u", "p", "db.t",
        fields, startExclusive = None, endInclusive = "0-1-10",
        timeoutMs = 1000)
      val e = intercept[CdcProtocolException] {
        drain(new CdcReplayReader(part, dts, typed = true))
      }
      assert(e.getMessage.contains("failed"), e.getMessage)
      assert(e.getMessage.contains("0-1-10"), e.getMessage)
    } finally srv.close()
  }

  test("soak: budget RESETS on progress — more total drops than the budget " +
      "survive when interleaved with delivery") {
    // 10 drops against a budget of 3: survivable because every connection
    // delivers rows between failures; proves the budget is per-stall, not
    // per-query (a per-query budget would make long replays fragile)
    val N = 100
    val events = (1L to N).map(i => event(i, "insert", i.toInt, s"n$i"))
    val (fields, dts) = fieldsAndTypes
    val schedule = Seq.fill(10)(3) // every connection: 1 dup + 2 new rows
    val srv = new MockMaxScaleServer(Schema, events, dropSchedule = schedule)
    try {
      val part = CdcReplayPartition("127.0.0.1", srv.port, "u", "p", "db.t",
        fields, startExclusive = None, endInclusive = s"0-1-$N",
        timeoutMs = 2000)
      val got = drain(new CdcReplayReader(part, dts, typed = true))
      assert(got == (1 to N))
      assert(srv.dataConnCount >= 11, s"expected all 10 drops consumed, " +
        s"dataConns=${srv.dataConnCount}")
    } finally srv.close()
  }

  test("soak e2e: a heterogeneous normalized stream survives randomized " +
      "drops across its per-table connections, exactly once") {
    // drops land on arbitrary connections — schema probes, per-table
    // tailers, replay readers — and the composed source must still
    // deliver every event of every table exactly once
    val schemaB = Schema.replace("\"name\":\"id\"", "\"name\":\"bid\"")
    val rng = new Random(77) // shared: Seq.fill re-evaluates its argument
    val srv = new MockMaxScaleServer(Schema,
      tableSchemas = Map("db.a" -> Schema, "db.b" -> schemaB),
      dropSchedule = Seq.fill(8)(3 + rng.nextInt(8)))
    (1L to 40L).foreach { i =>
      srv.pushTo("db.a", event(i, "insert", i.toInt, s"a$i"))
      srv.pushTo("db.b",
        s"""{"domain":0,"server_id":1,"sequence":$i,"event_number":1,""" +
          s""""timestamp":${1700000000 + i},"event_type":"insert",""" +
          s""""bid":${i.toInt},"name":"b$i"}""")
    }
    val ckpt = java.nio.file.Files.createTempDirectory("norm_soak").toString
    try {
      val got = java.util.concurrent.ConcurrentHashMap
        .newKeySet[(String, Int)]()
      val q = spark.readStream.format("maxscale-cdc")
        .option("host", "127.0.0.1").option("port", srv.port)
        .option("user", "u").option("password", "p")
        .option("tables", "db.a,db.b")
        .option("schemaMode", "normalized")
        .option("timeoutSeconds", 1)
        .load()
        .select("_table", "sequence")
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.collect().foreach(r => {
            val added = got.add((r.getString(0), r.getInt(1)))
            assert(added, s"duplicate delivery: ${(r.getString(0), r.getInt(1))}")
          })
        }
        .start()
      try {
        q.processAllAvailable()
        val want = (1 to 40).flatMap(i =>
          Seq(("db.a", i), ("db.b", i))).toSet
        assert(scala.jdk.CollectionConverters.SetHasAsScala(got).asScala.toSet
          == want, s"got ${got.size()} of ${want.size} events")
      } finally q.stop()
    } finally {
      srv.close()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ckpt))
    }
  }

  test("soak e2e: a bounded DSv2 batch read survives randomized drops " +
      "across its parallel range slices") {
    val N = 300
    val events = (1L to N).map(i => event(i, "insert", i.toInt, s"n$i"))
    val rng = new Random(42)
    val schedule = Seq.fill(9)(2 + rng.nextInt(20))
    val srv = new MockMaxScaleServer(Schema, events, dropSchedule = schedule)
    try {
      val df = spark.read.format("maxscale-cdc")
        .option("host", "127.0.0.1").option("port", srv.port)
        .option("user", "u").option("password", "p")
        .option("table", "db.t").option("timeoutSeconds", 1)
        .option("endGtid", s"0-1-$N")
        .load()
      val got = df.select("sequence").collect().map(_.getInt(0)).sorted.toSeq
      assert(got == (1 to N),
        s"schedule=$schedule dataConns=${srv.dataConnCount}: " +
          s"got ${got.length} rows")
    } finally srv.close()
  }
}
