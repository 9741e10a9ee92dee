package graft.streaming

import graft.SparkSpec
import graft.sources.MockMaxScaleServer
import org.apache.spark.sql.functions._
import org.scalatest.concurrent.Eventually.{eventually, interval, timeout}
import org.scalatest.time.{Seconds, Span}

/** Multi-table CDC composition (VERDICT r5 item 8): the reference client
  * is one-table-per-connection (`cdc_connector.h:52-58` — a Connection
  * binds one db.table), and real consumers run several. This spec closes
  * the realism gap: TWO `maxscale-cdc` streams from two independent mock
  * MaxScale servers (an orders changelog and an events changelog),
  * composed by ONE checkpointed streaming query — a stream-stream
  * equi-join on user_id — including a stop → push-while-down → restart
  * cycle proving both sources' GTID offsets resume from the one
  * checkpoint.
  */
class MultiTableCdcSpec extends SparkSpec {
  import spark.implicits._
  import scala.jdk.CollectionConverters._

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

  private def cdcStream(srv: MockMaxScaleServer, table: String) =
    spark.readStream.format("maxscale-cdc")
      .option("host", "127.0.0.1").option("port", srv.port)
      .option("user", "u").option("password", "p")
      .option("table", table).option("timeoutSeconds", 1)
      .load()

  test("tables=a,b: ONE source carries both tables with a composite GTID " +
      "offset, _table provenance, and per-table resume across a restart") {
    import MockMaxScaleServer.{Schema, event}
    // one server, two same-schema shard tables with independent changelogs
    val srv = new MockMaxScaleServer(Schema,
      tableSchemas = Map("db.t1" -> Schema, "db.t2" -> Schema))
    srv.pushTo("db.t1", event(1, "insert", 1, "a1"))
    srv.pushTo("db.t2", event(1, "insert", 100, "b1"))
    srv.pushTo("db.t2", event(2, "insert", 101, "b2"))
    val ckpt = java.nio.file.Files.createTempDirectory("graft-multi-cdc").toString
    val got = java.util.concurrent.ConcurrentHashMap
      .newKeySet[(String, Int, Int, String)]()

    def startQuery() =
      spark.readStream.format("maxscale-cdc")
        .option("host", "127.0.0.1").option("port", srv.port)
        .option("user", "u").option("password", "p")
        .option("tables", "db.t1,db.t2").option("timeoutSeconds", 1)
        .load()
        .select(col("_table"), col("sequence"), col("id"), col("name"))
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.as[(String, Int, Int, String)].collect().foreach(got.add)
        }
        .start()

    try {
      val q1 = startQuery()
      try {
        eventually(timeout(Span(30, Seconds)), interval(Span(1, Seconds))) {
          q1.processAllAvailable()
          assert(got.asScala.toSet == Set(
            ("db.t1", 1, 1, "a1"), ("db.t2", 1, 100, "b1"),
            ("db.t2", 2, 101, "b2")), s"initial multi-table rows: $got")
        }
      } finally q1.stop()

      // BOTH tables advance while the query is down; the single composite
      // offset must resume each table from its own committed GTID
      srv.pushTo("db.t1", event(2, "update_after", 1, "a2"))
      srv.pushTo("db.t2", event(3, "update_after", 100, "b3"))
      val q2 = startQuery()
      try {
        eventually(timeout(Span(30, Seconds)), interval(Span(1, Seconds))) {
          q2.processAllAvailable()
          assert(got.contains(("db.t1", 2, 1, "a2")) &&
            got.contains(("db.t2", 3, 100, "b3")),
            s"post-restart rows missing: $got")
        }
        // set semantics absorb at-least-once replay; exactly these five
        // logical rows, each tagged with its source table
        assert(got.asScala.toSet == Set(
          ("db.t1", 1, 1, "a1"), ("db.t1", 2, 1, "a2"),
          ("db.t2", 1, 100, "b1"), ("db.t2", 2, 101, "b2"),
          ("db.t2", 3, 100, "b3")), s"unexpected rows: $got")
      } finally q2.stop()
    } finally srv.close()
  }

  test("multi-table column pruning: a [_table, name] projection and a " +
      "_table-only projection both deliver correct, correctly-shaped rows") {
    import MockMaxScaleServer.{Schema, event}
    val srv = new MockMaxScaleServer(Schema,
      tableSchemas = Map("db.t1" -> Schema, "db.t2" -> Schema))
    srv.pushTo("db.t1", event(1, "insert", 1, "a1"))
    srv.pushTo("db.t2", event(1, "insert", 100, "b1"))
    def stream() =
      spark.readStream.format("maxscale-cdc")
        .option("host", "127.0.0.1").option("port", srv.port)
        .option("user", "u").option("password", "p")
        .option("tables", "db.t1,db.t2").option("timeoutSeconds", 1)
        .load()
    try {
      // mixed projection: some base columns pruned, _table kept
      val q1 = stream().select(col("_table"), col("name"))
        .writeStream.format("memory").queryName("mt_pruned")
        .outputMode("append").start()
      try {
        eventually(timeout(Span(30, Seconds)), interval(Span(1, Seconds))) {
          q1.processAllAvailable()
          assert(spark.table("mt_pruned").count() == 2)
        }
        assert(spark.table("mt_pruned").schema.fieldNames.toSeq ==
          Seq("_table", "name"))
        assert(spark.table("mt_pruned").as[(String, String)].collect().toSet ==
          Set(("db.t1", "a1"), ("db.t2", "b1")))
      } finally q1.stop()

      // _table-only projection: no base column survives the prune; the
      // emitted row must be exactly one column wide (the regression this
      // pins: a forced framing column must NOT leak into the output)
      val q2 = stream().select(col("_table"))
        .writeStream.format("memory").queryName("mt_tag_only")
        .outputMode("append").start()
      try {
        eventually(timeout(Span(30, Seconds)), interval(Span(1, Seconds))) {
          q2.processAllAvailable()
          assert(spark.table("mt_tag_only").count() == 2)
        }
        assert(spark.table("mt_tag_only").schema.fieldNames.toSeq == Seq("_table"))
        assert(spark.table("mt_tag_only").as[String].collect().toSet ==
          Set("db.t1", "db.t2"))
      } finally q2.stop()
    } finally srv.close()
  }

  test("multi-table _table filter prunes the excluded table's delegate: " +
      "tailer idled, offset frozen, no further connections, correct rows") {
    import MockMaxScaleServer.{Schema, event}
    val srv = new MockMaxScaleServer(Schema,
      tableSchemas = Map("db.t1" -> Schema, "db.t2" -> Schema))
    srv.pushTo("db.t1", event(1, "insert", 1, "a1"))
    srv.pushTo("db.t1", event(2, "insert", 2, "a2"))
    srv.pushTo("db.t2", event(1, "insert", 100, "b1"))
    try {
      val df = spark.readStream.format("maxscale-cdc")
        .option("host", "127.0.0.1").option("port", srv.port)
        .option("user", "u").option("password", "p")
        .option("tables", "db.t1,db.t2").option("timeoutSeconds", 1)
        .load()
      val q = df.where(col("_table") === "db.t1")
        .select(col("_table"), col("id"), col("name"))
        .writeStream.format("memory").queryName("mt_table_pruned")
        .outputMode("append").start()
      try {
        // batch 0 may legitimately tail every table once: runtime `_table`
        // pruning arrives with the first batch's optimization. Settle first.
        eventually(timeout(Span(30, Seconds)), interval(Span(1, Seconds))) {
          q.processAllAvailable()
          assert(spark.table("mt_table_pruned").count() == 2)
        }
        assert(spark.table("mt_table_pruned")
          .as[(String, Int, String)].collect().toSet ==
          Set(("db.t1", 1, "a1"), ("db.t1", 2, "a2")))
        q.processAllAvailable() // ensure a post-pushdown batch idled db.t2
        val t2Conns = srv.requestCount("db.t2")
        val t2Frozen = q.lastProgress.sources.head.endOffset

        // from here on: db.t1 keeps flowing, db.t2 is never contacted
        // again and its composite-offset entry never advances
        srv.pushTo("db.t1", event(3, "insert", 3, "a3"))
        srv.pushTo("db.t2", event(2, "insert", 101, "b2")) // must stay unseen
        eventually(timeout(Span(30, Seconds)), interval(Span(1, Seconds))) {
          q.processAllAvailable()
          assert(spark.table("mt_table_pruned").count() == 3)
        }
        assert(spark.table("mt_table_pruned")
          .as[(String, Int, String)].collect().toSet ==
          Set(("db.t1", 1, "a1"), ("db.t1", 2, "a2"), ("db.t1", 3, "a3")))
        assert(srv.requestCount("db.t2") == t2Conns,
          s"db.t2 was re-contacted despite the _table filter " +
            s"(${srv.requestCount("db.t2")} vs $t2Conns)")
        def t2Entry(off: String): String =
          off.split(',').find(_.startsWith("db.t2=")).getOrElse("?")
        assert(t2Entry(q.lastProgress.sources.head.endOffset) ==
          t2Entry(t2Frozen),
          s"db.t2's offset advanced: ${q.lastProgress.sources.head.endOffset}" +
            s" vs frozen $t2Frozen")
        // source metrics expose the per-table pruning state
        val m = q.lastProgress.sources.head.metrics
        assert(m != null && m.get("db.t2.included") == "false" &&
          m.get("db.t1.included") == "true",
          s"per-table inclusion metrics wrong: $m")
      } finally q.stop()
    } finally srv.close()
  }

  test("Trigger.AvailableNow in multi-table mode drains every table's " +
      "backlog and stops") {
    import MockMaxScaleServer.{Schema, event}
    val srv = new MockMaxScaleServer(Schema,
      tableSchemas = Map("db.t1" -> Schema, "db.t2" -> Schema))
    (1 to 4).foreach(i => srv.pushTo("db.t1", event(i, "insert", i, s"a$i")))
    (1 to 3).foreach(i => srv.pushTo("db.t2", event(i, "insert", 100 + i, s"b$i")))
    val got = java.util.concurrent.ConcurrentHashMap.newKeySet[(String, Int)]()
    try {
      val q = spark.readStream.format("maxscale-cdc")
        .option("host", "127.0.0.1").option("port", srv.port)
        .option("user", "u").option("password", "p")
        .option("tables", "db.t1,db.t2").option("timeoutSeconds", 1)
        .load()
        .select(col("_table"), col("id"))
        .writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.as[(String, Int)].collect().foreach(got.add)
        }.start()
      assert(q.awaitTermination(60000), "AvailableNow query did not stop")
      assert(got.asScala.toSet ==
        ((1 to 4).map(i => ("db.t1", i)) ++
          (1 to 3).map(i => ("db.t2", 100 + i))).toSet,
        s"backlogs not drained: $got")
    } finally srv.close()
  }

  test("schemaMode=normalized: heterogeneous tables fan in to one " +
      "normalized changelog with per-table resume across a restart") {
    // VERDICT r7 #4: uniform multi-table mode requires same-schema
    // shards; real consumers' next ask is N different-schema tables in
    // ONE query. The orders and events schemas differ in their data
    // columns (and even in metadata wire ORDER — events has timestamp
    // before event_number), which the normalized shape absorbs.
    val srv = new MockMaxScaleServer(MockMaxScaleServer.Schema,
      tableSchemas = Map("db.orders" -> ordersSchema,
        "db.events" -> eventsSchema))
    srv.pushTo("db.orders", order(1, 100, 1, 50))
    srv.pushTo("db.events", ev(1, 900, 1, "view"))
    // ev() splices the value into wire JSON verbatim — this is the
    // JSON-escaped form of vi"ew<newline>; the payload must re-escape it
    srv.pushTo("db.events", ev(2, 901, 3, "vi\\\"ew\\n"))
    val ckpt = java.nio.file.Files.createTempDirectory("graft-norm-cdc").toString
    val got = java.util.concurrent.ConcurrentHashMap
      .newKeySet[(String, Int, String, Int)]()

    def startQuery() =
      spark.readStream.format("maxscale-cdc")
        .option("host", "127.0.0.1").option("port", srv.port)
        .option("user", "u").option("password", "p")
        .option("tables", "db.orders,db.events")
        .option("schemaMode", "normalized")
        .option("timeoutSeconds", 1)
        .load()
        // get_json_object proves each payload is well-formed JSON and
        // that a cross-table key (user_id) extracts uniformly
        .select(col("_table"), col("sequence"), col("payload"),
          get_json_object(col("payload"), "$.user_id").cast("int").as("uid"))
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.as[(String, Int, String, Int)].collect().foreach(got.add)
        }
        .start()

    try {
      // the inferred schema is the fixed normalized-changelog shape
      val df0 = spark.readStream.format("maxscale-cdc")
        .option("host", "127.0.0.1").option("port", srv.port)
        .option("user", "u").option("password", "p")
        .option("tables", "db.orders,db.events")
        .option("schemaMode", "normalized")
        .option("timeoutSeconds", 1).load()
      assert(df0.schema.fieldNames.toSeq == Seq("domain", "server_id",
        "sequence", "event_number", "timestamp", "event_type", "payload",
        "_table"))
      assert(df0.schema("sequence").dataType ==
        org.apache.spark.sql.types.IntegerType)
      assert(df0.schema("payload").dataType ==
        org.apache.spark.sql.types.StringType)

      val q1 = startQuery()
      try {
        eventually(timeout(Span(30, Seconds)), interval(Span(1, Seconds))) {
          q1.processAllAvailable()
          assert(got.asScala.toSet == Set(
            ("db.orders", 1,
              """{"order_id":100,"user_id":1,"total":50}""", 1),
            ("db.events", 1,
              """{"event_id":900,"user_id":1,"etype":"view"}""", 1),
            ("db.events", 2,
              """{"event_id":901,"user_id":3,"etype":"vi\"ew\n"}""", 3)),
            s"initial normalized rows: $got")
        }
      } finally q1.stop()

      // both tables advance while the query is down; the composite
      // offset resumes each table from its own committed GTID
      srv.pushTo("db.orders", order(2, 101, 2, 70))
      srv.pushTo("db.events", ev(3, 902, 2, "purchase"))
      val q2 = startQuery()
      try {
        eventually(timeout(Span(30, Seconds)), interval(Span(1, Seconds))) {
          q2.processAllAvailable()
          assert(got.asScala.exists(r => r._1 == "db.orders" && r._2 == 2) &&
            got.asScala.exists(r => r._1 == "db.events" && r._2 == 3),
            s"post-restart rows missing: $got")
        }
        assert(got.size == 5, s"expected exactly 5 logical rows: $got")
      } finally q2.stop()
    } finally srv.close()
  }

  test("two maxscale-cdc streams compose into one checkpointed joined view " +
      "that survives a restart") {
    val srvOrders = new MockMaxScaleServer(ordersSchema, Seq(
      order(1, 100, 1, 50), order(2, 101, 2, 70)))
    val srvEvents = new MockMaxScaleServer(eventsSchema, Seq(
      ev(1, 900, 1, "view"), ev(2, 901, 3, "view")))
    val ckpt = java.nio.file.Files.createTempDirectory("graft-two-cdc").toString
    // driver-side collector: foreachBatch is at-least-once under replay,
    // so assertions use set semantics keyed by (event_id, order_id)
    val got = java.util.concurrent.ConcurrentHashMap.newKeySet[(Int, Int, Int)]()

    def startQuery() = {
      val orders = cdcStream(srvOrders, "db.orders")
        .select(col("order_id"), col("user_id").as("o_user"), col("total"))
      val events = cdcStream(srvEvents, "db.events")
        .select(col("event_id"), col("user_id").as("e_user"), col("etype"))
      events.join(orders, col("e_user") === col("o_user"))
        .select(col("event_id"), col("order_id"), col("total"))
        .writeStream
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.as[(Int, Int, Int)].collect().foreach(got.add)
        }
        .start()
    }

    try {
      val q1 = startQuery()
      try {
        // phase 1: the initial changelogs join — user 1's event meets
        // user 1's order; users 2 (no event) and 3 (no order) don't
        eventually(timeout(Span(30, Seconds)), interval(Span(1, Seconds))) {
          q1.processAllAvailable()
          assert(got.contains((900, 100, 50)), s"initial join missing: $got")
        }
        assert(!got.asScala.exists(_._1 == 901), "user-3 event joined nothing yet")

        // phase 2: a live order for user 3 arrives — the buffered event
        // 901 now matches (stream-stream state holds the unmatched side)
        srvOrders.push(order(3, 102, 3, 90))
        eventually(timeout(Span(30, Seconds)), interval(Span(1, Seconds))) {
          q1.processAllAvailable()
          assert(got.contains((901, 102, 90)), s"late order join missing: $got")
        }
      } finally q1.stop()

      // phase 3: both tables advance WHILE THE QUERY IS DOWN; the restart
      // resumes both sources' GTID offsets from the one checkpoint
      srvEvents.push(ev(3, 902, 2, "purchase")) // matches pre-existing order 101
      srvOrders.push(order(4, 103, 4, 10))
      srvEvents.push(ev(4, 903, 4, "view")) // matches the new order 103
      val q2 = startQuery()
      try {
        eventually(timeout(Span(30, Seconds)), interval(Span(1, Seconds))) {
          q2.processAllAvailable()
          assert(got.contains((902, 101, 70)), s"resumed event join missing: $got")
          assert(got.contains((903, 103, 10)), s"post-restart two-sided join missing: $got")
        }
      } finally q2.stop()

      // exactly the four legitimate pairs, ever — no cross-user joins
      assert(got.asScala.toSet == Set((900, 100, 50), (901, 102, 90),
        (902, 101, 70), (903, 103, 10)), s"unexpected pairs: $got")
    } finally {
      srvOrders.close()
      srvEvents.close()
    }
  }
}
