package graft.sources

import graft.SparkSpec
import graft.sources.cdc.CdcBootstrap

import MockMaxScaleServer.{Schema, event}

/** The snapshot/follow seam: one stable anchor partitions the changelog
  * into a repeatable bounded batch and a stream that starts exactly
  * where the batch ended — no gap, no overlap, even with events landing
  * between the two reads. */
class CdcBootstrapSpec extends SparkSpec {

  private def opts(srv: MockMaxScaleServer): Map[String, String] = Map(
    "host" -> "127.0.0.1", "port" -> srv.port.toString,
    "user" -> "u", "password" -> "p",
    "table" -> "db.t", "timeoutSeconds" -> "1")

  test("anchor probes to the last produced GTID; respects startingGtid") {
    val srv = new MockMaxScaleServer(Schema,
      (1L to 7L).map(i => event(i, "insert", i.toInt, s"n$i")))
    try {
      assert(CdcBootstrap.anchor(opts(srv)) == Some("0-1-7"))
      // resume-positioned probe with nothing new anchors AT the resume
      assert(CdcBootstrap.anchor(opts(srv) + ("startingGtid" -> "0-1-7"))
        == Some("0-1-7"))
    } finally srv.close()
  }

  test("snapshotAndFollow: events landing between snapshot and stream " +
      "start are seen exactly once, by the stream") {
    val srv = new MockMaxScaleServer(Schema,
      (1L to 10L).map(i => event(i, "insert", i.toInt, s"n$i")))
    try {
      val (snapshot, follow) = CdcBootstrap.snapshotAndFollow(spark, opts(srv))
      // the seam moment: new events arrive AFTER the anchor was chosen
      // but BEFORE either side runs
      (11L to 15L).foreach(i => srv.push(event(i, "insert", i.toInt, s"n$i")))

      val snapRows = snapshot.orderBy("sequence").collect()
      assert(snapRows.map(_.getAs[Int]("sequence")).toSeq == (1 to 10),
        "snapshot must stop at the anchor, not re-anchor past it")
      // bounded range ⇒ repeatable: a second action sees the same rows
      assert(snapshot.count() == 10)

      val q = follow.writeStream.format("memory")
        .queryName("cdc_bootstrap_follow").outputMode("append").start()
      try {
        q.processAllAvailable()
        val streamed = spark.table("cdc_bootstrap_follow")
          .orderBy("sequence").collect()
        assert(streamed.map(_.getAs[Int]("sequence")).toSeq == (11 to 15),
          "stream must start exactly after the anchor")
      } finally q.stop()
    } finally srv.close()
  }

  test("multi-table seam: per-table anchors, one empty-at-anchor table; " +
      "seam events land in the stream only") {
    val schemas = Map("db.a" -> Schema, "db.b" -> Schema)
    val srv = new MockMaxScaleServer(Schema, Nil, tableSchemas = schemas)
    try {
      (1L to 4L).foreach(i => srv.pushTo("db.a", event(i, "insert", i.toInt, s"a$i")))
      // db.b is EMPTY at anchor time
      val o = Map(
        "host" -> "127.0.0.1", "port" -> srv.port.toString,
        "user" -> "u", "password" -> "p",
        "tables" -> "db.a,db.b", "timeoutSeconds" -> "1")
      assert(CdcBootstrap.anchors(o).toMap ==
        Map("db.a" -> Some("0-1-4"), "db.b" -> None))
      val (snapshot, follow) = CdcBootstrap.snapshotAndFollow(spark, o)
      // the seam moment: both tables gain events after anchoring
      srv.pushTo("db.a", event(5, "insert", 5, "a5"))
      srv.pushTo("db.b", event(1, "insert", 1, "b1"))

      val snapCounts = snapshot.groupBy("_table").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(snapCounts == Map("db.a" -> 4L),
        s"snapshot must hold the anchored slices only, got $snapCounts")

      val q = follow.writeStream.format("memory")
        .queryName("cdc_bootstrap_multi").outputMode("append").start()
      try {
        q.processAllAvailable()
        val streamed = spark.table("cdc_bootstrap_multi")
          .select("_table", "sequence").collect()
          .map(r => (r.getString(0), r.getInt(1))).toSet
        assert(streamed == Set(("db.a", 5), ("db.b", 1)),
          "stream must carry exactly the post-anchor events")
      } finally q.stop()
    } finally srv.close()
  }

  test("composite startingGtid positions each table independently") {
    val schemas = Map("db.a" -> Schema, "db.b" -> Schema)
    val srv = new MockMaxScaleServer(Schema, Nil, tableSchemas = schemas)
    try {
      (1L to 5L).foreach(i => srv.pushTo("db.a", event(i, "insert", i.toInt, s"a$i")))
      (1L to 5L).foreach(i => srv.pushTo("db.b", event(i, "insert", i.toInt, s"b$i")))
      val df = spark.read.format("maxscale-cdc")
        .option("host", "127.0.0.1").option("port", srv.port)
        .option("user", "u").option("password", "p")
        .option("tables", "db.a,db.b").option("timeoutSeconds", 1)
        .option("startingGtid", "db.a=0-1-3,db.b=-")
        .load()
      val got = df.select("_table", "sequence").collect()
        .map(r => (r.getString(0), r.getInt(1))).toSet
      assert(got == (Set(4, 5).map(("db.a", _)) ++
        Set(1, 2, 3, 4, 5).map(("db.b", _))),
        s"per-table starts not honored: $got")
    } finally srv.close()
  }

  test("one probe pass per table: the snapshot/follow loads reuse the " +
      "probed schema and open no inference connections") {
    val srv = new MockMaxScaleServer(Schema,
      (1L to 5L).map(i => event(i, "insert", i.toInt, s"n$i")))
    try {
      val before = srv.requestCount("db.t")
      val (snapshot, follow) = CdcBootstrap.snapshotAndFollow(spark, opts(srv))
      // exactly two connections: the schema pre-read + the anchor tailer
      assert(srv.requestCount("db.t") == before + 2,
        s"loads opened extra probes: ${srv.requestCount("db.t") - before}")
      assert(snapshot.schema.fieldNames.contains("sequence"))
      assert(snapshot.count() == 5)
      assert(follow.isStreaming)
    } finally srv.close()
  }

  test("user-specified schema (a prior inference) skips the probe, and " +
      "the replay validates it against the server's in-band schema") {
    val srv = new MockMaxScaleServer(Schema,
      (1L to 6L).map(i => event(i, "insert", i.toInt, s"n$i")))
    try {
      def rd = spark.read.format("maxscale-cdc")
        .option("host", "127.0.0.1").option("port", srv.port)
        .option("user", "u").option("password", "p")
        .option("table", "db.t").option("timeoutSeconds", 1)
      val inferred = rd.load().schema // one probe
      val before = srv.requestCount("db.t")
      val df = rd.schema(inferred).option("endGtid", "0-1-4").load()
      assert(srv.requestCount("db.t") == before, "schema() still probed")
      assert(df.count() == 4) // the one replay connection
      assert(srv.requestCount("db.t") == before + 1)
    } finally srv.close()
  }

  test("capstone: wire -> bootstrap -> CdcSink latest-state table, the " +
      "follow stream keeping it current — the full migration story") {
    // a consumer of the reference maintaining a latest-state table
    // switches to: snapshot seeds the table once, the follow stream
    // keeps it current, with the seam guaranteeing exactly-once
    val srv = new MockMaxScaleServer(Schema, Seq(
      event(1, "insert", 1, "a1"), event(2, "insert", 2, "b1"),
      event(3, "update_after", 1, "a2"), event(4, "insert", 3, "c1"),
      event(5, "update_after", 2, "b2")))
    val dir = java.nio.file.Files.createTempDirectory("graft-capstone")
    try {
      val (snapshot, follow) = CdcBootstrap.snapshotAndFollow(spark, opts(srv))
      // history, exactly once: the snapshot seeds the state table
      graft.streaming.CdcSink.applyChangelog(
        snapshot, s"$dir/state", keyCol = "id", orderCols = Seq("sequence"))
      val seeded = graft.streaming.CdcSink.readState(spark, s"$dir/state")
        .collect().map(r => r.getAs[Int]("id") -> r.getAs[String]("name")).toMap
      assert(seeded == Map(1 -> "a2", 2 -> "b2", 3 -> "c1"))

      val q = follow.writeStream
        .option("checkpointLocation", s"$dir/ckpt")
        .foreachBatch(graft.streaming.CdcSink.writer(
          s"$dir/state", keyCol = "id", orderCols = Seq("sequence")))
        .start()
      try {
        // live seam traffic: an update to an existing key + a new key
        srv.push(event(6, "update_after", 1, "a3"))
        srv.push(event(7, "insert", 4, "d1"))
        q.processAllAvailable()
        val state = graft.streaming.CdcSink.readState(spark, s"$dir/state")
          .collect().map(r => r.getAs[Int]("id") -> r.getAs[String]("name")).toMap
        assert(state == Map(1 -> "a3", 2 -> "b2", 3 -> "c1", 4 -> "d1"))
      } finally q.stop()
    } finally {
      srv.close()
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }

  test("empty changelog: pinned-empty snapshot, stream from the start") {
    val srv = new MockMaxScaleServer(Schema, Nil)
    try {
      assert(CdcBootstrap.anchor(opts(srv)).isEmpty)
      val (snapshot, follow) = CdcBootstrap.snapshotAndFollow(spark, opts(srv))
      srv.push(event(1, "insert", 1, "late"))
      // the pinned-empty snapshot cannot re-anchor onto the late event
      assert(snapshot.count() == 0)
      assert(snapshot.schema.fieldNames.contains("sequence"))
      val q = follow.writeStream.format("memory")
        .queryName("cdc_bootstrap_empty").outputMode("append").start()
      try {
        q.processAllAvailable()
        assert(spark.table("cdc_bootstrap_empty").count() == 1)
      } finally q.stop()
    } finally srv.close()
  }
}
