package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** `spark.read.format("maxscale-cdc").option("schemaMode","normalized")`
  * — the bounded one-shot pull of N heterogeneous tables into the
  * normalized changelog shape (batch twin of the normalized stream,
  * completing the {uniform, normalized} × {batch, stream} matrix).
  */
class NormalizedBatchSpec extends SparkSpec {
  import spark.implicits._

  private val ordersSchema =
    """{"namespace":"MaxScaleChangeDataSchema.avro","type":"record","name":"ChangeRecord","fields":[
      |{"name":"domain","type":"int","real_type":"int","length":-1},
      |{"name":"server_id","type":"int","real_type":"int","length":-1},
      |{"name":"sequence","type":"int","real_type":"int","length":-1},
      |{"name":"event_number","type":"int","real_type":"int","length":-1},
      |{"name":"timestamp","type":"int","real_type":"int","length":-1},
      |{"name":"event_type","type":"string","real_type":"varchar","length":32},
      |{"name":"order_id","type":"int","real_type":"int","length":-1},
      |{"name":"user_id","type":"int","real_type":"int","length":-1},
      |{"name":"total","type":"int","real_type":"int","length":-1}
      |]}""".stripMargin.replace("\n", "")

  // note: metadata wire ORDER differs (timestamp before event_number) —
  // the normalized shape must absorb per-table column order
  private val eventsSchema =
    """{"namespace":"MaxScaleChangeDataSchema.avro","type":"record","name":"ChangeRecord","fields":[
      |{"name":"domain","type":"int","real_type":"int","length":-1},
      |{"name":"server_id","type":"int","real_type":"int","length":-1},
      |{"name":"sequence","type":"int","real_type":"int","length":-1},
      |{"name":"timestamp","type":"int","real_type":"int","length":-1},
      |{"name":"event_number","type":"int","real_type":"int","length":-1},
      |{"name":"event_type","type":"string","real_type":"varchar","length":32},
      |{"name":"event_id","type":"int","real_type":"int","length":-1},
      |{"name":"user_id","type":"int","real_type":"int","length":-1},
      |{"name":"etype","type":"string","real_type":"varchar","length":16}
      |]}""".stripMargin.replace("\n", "")

  private def order(seq: Long, orderId: Int, userId: Int, total: Int): String =
    s"""{"domain":0,"server_id":1,"sequence":$seq,"event_number":1,""" +
      s""""timestamp":${1700000000 + seq},"event_type":"insert",""" +
      s""""order_id":$orderId,"user_id":$userId,"total":$total}"""

  private def ev(seq: Long, eventId: Int, userId: Int, etype: String): String =
    s"""{"domain":0,"server_id":1,"sequence":$seq,"event_number":1,""" +
      s""""timestamp":${1700000000 + seq},"event_type":"insert",""" +
      s""""event_id":$eventId,"user_id":$userId,"etype":"$etype"}"""

  private def mkServer(): MockMaxScaleServer = {
    val srv = new MockMaxScaleServer(MockMaxScaleServer.Schema,
      tableSchemas = Map("db.orders" -> ordersSchema,
        "db.events" -> eventsSchema))
    srv.pushTo("db.orders", order(1, 100, 1, 50))
    srv.pushTo("db.orders", order(2, 101, 2, 75))
    srv.pushTo("db.events", ev(1, 900, 1, "view"))
    srv.pushTo("db.events", ev(2, 901, 2, "click"))
    srv.pushTo("db.events", ev(3, 902, 1, "purchase"))
    srv
  }

  private def read(srv: MockMaxScaleServer) =
    spark.read.format("maxscale-cdc")
      .option("host", "127.0.0.1").option("port", srv.port)
      .option("user", "u").option("password", "p")
      .option("tables", "db.orders,db.events")
      .option("schemaMode", "normalized")
      .option("timeoutSeconds", 1)

  test("heterogeneous tables pull into one normalized DataFrame") {
    val srv = mkServer()
    try {
      val df = read(srv).load()
      assert(df.schema.fieldNames.toSeq == Seq("domain", "server_id",
        "sequence", "event_number", "timestamp", "event_type", "payload",
        "_table"))
      val got = df
        .select(col("_table"), col("sequence"),
          get_json_object(col("payload"), "$.user_id").cast("int").as("uid"))
        .as[(String, Int, Int)].collect().toSet
      assert(got == Set(
        ("db.orders", 1, 1), ("db.orders", 2, 2),
        ("db.events", 1, 1), ("db.events", 2, 2), ("db.events", 3, 1)),
        s"got $got")
      // payloads hold exactly the table-specific columns, in wire order
      val pay = df.where(col("_table") === "db.orders" && col("sequence") === 1)
        .select("payload").as[String].collect().head
      assert(pay == """{"order_id":100,"user_id":1,"total":50}""", pay)
    } finally srv.close()
  }

  test("composite endGtid bounds each table independently; '-' anchors") {
    val srv = mkServer()
    try {
      val df = read(srv)
        .option("endGtid", "db.orders=0-1-1,db.events=-")
        .load()
      val got = df.select(col("_table"), col("sequence"))
        .as[(String, Int)].collect().toSet
      assert(got == Set(("db.orders", 1),
        ("db.events", 1), ("db.events", 2), ("db.events", 3)), s"got $got")
    } finally srv.close()
  }

  test("_table pushdown prunes the excluded table at plan time") {
    val srv = mkServer()
    try {
      // load() owes one inference probe per table (the normalized schema
      // needs every table's metadata columns validated); PLANNING with a
      // `_table` filter must then open nothing at all for the excluded
      // table — no planning probe, no anchor tailer, no replay
      val df = read(srv).load()
      val before = srv.requestCount("db.events")
      val got = df.where(col("_table") === "db.orders")
        .select("sequence").as[Int].collect().toSet
      assert(got == Set(1, 2))
      assert(srv.requestCount("db.events") == before,
        "pruned table was still probed/replayed at plan time")
    } finally srv.close()
  }

  test("metadata filters drop rows wire-side in each table's own column order") {
    val srv = mkServer()
    try {
      // sequence >= 2 compiles against BOTH wire layouts (different
      // metadata positions); correctness = exact surviving set
      val got = read(srv).load()
        .where(col("sequence") >= 2)
        .select(col("_table"), col("sequence")).as[(String, Int)]
        .collect().toSet
      assert(got == Set(("db.orders", 2), ("db.events", 2), ("db.events", 3)),
        s"got $got")
    } finally srv.close()
  }

  test("column pruning to payload-only still replays (GTID framing intact)") {
    val srv = mkServer()
    try {
      val pays = read(srv).load()
        .where(col("_table") === "db.events")
        .select(get_json_object(col("payload"), "$.etype").as("t"))
        .as[String].collect().toSet
      assert(pays == Set("view", "click", "purchase"))
    } finally srv.close()
  }

  test("whole-database bootstrap: normalized snapshotAndFollow partitions " +
      "the heterogeneous changelog with no gap, no overlap") {
    val srv = mkServer()
    try {
      val (snapshot, follow) = graft.sources.cdc.CdcBootstrap.snapshotAndFollow(
        spark, Map(
          "host" -> "127.0.0.1", "port" -> srv.port.toString,
          "user" -> "u", "password" -> "p",
          "tables" -> "db.orders,db.events",
          "schemaMode" -> "normalized", "timeoutSeconds" -> "1"))
      assert(snapshot.schema.fieldNames.toSeq == Seq("domain", "server_id",
        "sequence", "event_number", "timestamp", "event_type", "payload",
        "_table"))
      // the seam moment: both tables gain events after anchoring
      srv.pushTo("db.orders", order(3, 102, 3, 99))
      srv.pushTo("db.events", ev(4, 903, 3, "view"))

      val snap = snapshot.select(col("_table"), col("sequence"))
        .as[(String, Int)].collect().toSet
      assert(snap == Set(("db.orders", 1), ("db.orders", 2),
        ("db.events", 1), ("db.events", 2), ("db.events", 3)), s"snap=$snap")

      val q = follow
        .select(col("_table"), col("sequence"),
          get_json_object(col("payload"), "$.user_id").cast("int").as("uid"))
        .writeStream.format("memory").queryName("norm_bootstrap")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        val streamed = spark.table("norm_bootstrap")
          .select("_table", "sequence", "uid")
          .as[(String, Int, Int)].collect().toSet
        assert(streamed == Set(("db.orders", 3, 3), ("db.events", 4, 3)),
          s"stream must carry exactly the post-anchor events: $streamed")
      } finally q.stop()
    } finally srv.close()
  }

  test("SupportsRuntimeFiltering: a post-planning `_table` filter() " +
      "prunes the delegate at the re-plan — no probe, no replay") {
    val srv = mkServer()
    try {
      val df = read(srv).load()
      val scanExec = df.queryExecution.executedPlan.collectLeaves().head
        .asInstanceOf[org.apache.spark.sql.execution.datasources.v2.BatchScanExec]
      val scan = scanExec.scan
        .asInstanceOf[org.apache.spark.sql.connector.read.SupportsRuntimeFiltering]
      assert(scan.filterAttributes().map(_.describe()).contains("_table"))
      // what a DPP subquery delivers after the other join side evaluates;
      // BatchScanExec then re-plans partitions on the SAME batch
      scan.filter(Array[org.apache.spark.sql.sources.Filter](
        org.apache.spark.sql.sources.EqualTo("_table", "db.orders")))
      val batch = scan.toBatch()
      val before = srv.requestCount("db.events")
      val parts = batch.planInputPartitions()
      val factory = batch.createReaderFactory()
      val got = scala.collection.mutable.Set[(String, Int)]()
      parts.foreach { p =>
        val r = factory.createReader(p)
        try while (r.next()) {
          val row = r.get()
          got += ((row.getUTF8String(7).toString, row.getInt(2)))
        } finally r.close()
      }
      assert(got == Set(("db.orders", 1), ("db.orders", 2)), s"got $got")
      assert(srv.requestCount("db.events") == before,
        "runtime-pruned table was still probed/replayed")
    } finally srv.close()
  }

  test("runtime `_table` filter arriving AFTER an unfiltered plan still " +
      "prunes the re-plan (the frozen probe superset is re-filtered)") {
    val srv = mkServer()
    try {
      val df = read(srv).load()
      val scanExec = df.queryExecution.executedPlan.collectLeaves().head
        .asInstanceOf[org.apache.spark.sql.execution.datasources.v2.BatchScanExec]
      val scan = scanExec.scan
        .asInstanceOf[org.apache.spark.sql.connector.read.SupportsRuntimeFiltering]
      val batch = scan.toBatch()
      // plan once with no runtime filter: both tables planned
      val unfiltered = batch.planInputPartitions()
      assert(unfiltered.nonEmpty)
      // the DPP filter lands; BatchScanExec re-plans the SAME batch —
      // the already-probed superset must be re-filtered, not replayed
      scan.filter(Array[org.apache.spark.sql.sources.Filter](
        org.apache.spark.sql.sources.EqualTo("_table", "db.events")))
      val parts = batch.planInputPartitions()
      val factory = batch.createReaderFactory()
      val got = scala.collection.mutable.Set[Int]()
      parts.foreach { p =>
        val r = factory.createReader(p)
        try while (r.next()) {
          val row = r.get()
          assert(row.getUTF8String(7).toString == "db.events",
            "pruned table leaked into the re-plan")
          got += row.getInt(2)
        } finally r.close()
      }
      assert(got == Set(1, 2, 3), s"got $got")
    } finally srv.close()
  }

  test("normalized batch ≡ normalized stream over the same changelog") {
    val srv = mkServer()
    val ckpt = java.nio.file.Files.createTempDirectory("norm_twin").toString
    try {
      val batch = read(srv).load()
        .select("_table", "sequence", "payload")
        .as[(String, Int, String)].collect().toSet
      val got = java.util.concurrent.ConcurrentHashMap
        .newKeySet[(String, Int, String)]()
      val q = spark.readStream.format("maxscale-cdc")
        .option("host", "127.0.0.1").option("port", srv.port)
        .option("user", "u").option("password", "p")
        .option("tables", "db.orders,db.events")
        .option("schemaMode", "normalized")
        .option("timeoutSeconds", 1)
        .load()
        .select("_table", "sequence", "payload")
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.as[(String, Int, String)].collect().foreach(got.add)
        }
        .start()
      try {
        q.processAllAvailable()
        assert(scala.jdk.CollectionConverters.SetHasAsScala(got).asScala.toSet
          == batch, "batch and stream disagree on the normalized rows")
      } finally q.stop()
    } finally {
      srv.close()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ckpt))
    }
  }
}
