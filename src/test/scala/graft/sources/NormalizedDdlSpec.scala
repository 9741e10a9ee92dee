package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.cdc.{CdcField, NormalizedCdc}
import org.apache.spark.sql.functions._
import org.scalatest.concurrent.Eventually.{eventually, interval, timeout}
import org.scalatest.time.{Seconds, Span}

object NormalizedDdlSpec {
  /** batchId-keyed sink slots (idempotent overwrite on re-delivery); batch
    * ids continue across restarts of the same checkpoint, so the union of
    * slots is the exactly-once delivery picture. */
  val collected =
    new scala.collection.concurrent.TrieMap[Long, Seq[(String, Int, String)]]()
}

/** `schemaMode=normalized` + DDL: normalized rows are schema-free (six
  * metadata columns + payload JSON), so a mid-stream column-add DDL is
  * ABSORBED — the in-band schema message re-points the normalizer and
  * tailing continues, NO query restart. This closes the one semantic
  * divergence from the reference, which re-schemas within one connection
  * (cdc_connector.cpp:339-344); uniform mode keeps the documented
  * fail-and-restart (SURVEY.md §1.3, CdcAutoRestartSpec).
  *
  * Also pins [[NormalizedCdc.typedView]]: the typed per-table projection
  * of the normalized payload ≡ what uniform mode would stream for that
  * table.
  */
class NormalizedDdlSpec extends SparkSpec {
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
      |{"name":"total","type":"int","real_type":"int","length":-1}
      |]}""".stripMargin.replace("\n", "")

  /** ALTER TABLE db.orders ADD COLUMN coupon varchar(16). */
  private val ordersSchemaV2 = ordersSchema.replace(
    """{"name":"total","type":"int","real_type":"int","length":-1}""",
    """{"name":"total","type":"int","real_type":"int","length":-1},""" +
      """{"name":"coupon","type":"string","real_type":"varchar","length":16}""")

  private def order(seq: Long, orderId: Int, total: Int): String =
    s"""{"domain":0,"server_id":1,"sequence":$seq,"event_number":1,""" +
      s""""timestamp":${1700000000 + seq},"event_type":"insert",""" +
      s""""order_id":$orderId,"total":$total}"""

  private def orderV2(seq: Long, orderId: Int, total: Int, coupon: String): String =
    s"""{"domain":0,"server_id":1,"sequence":$seq,"event_number":1,""" +
      s""""timestamp":${1700000000 + seq},"event_type":"insert",""" +
      s""""order_id":$orderId,"total":$total,"coupon":"$coupon"}"""

  test("ALTER TABLE ADD COLUMN mid-stream: NO query restart; pre-DDL " +
      "payloads lack the key, post-DDL payloads carry it; per-table resume " +
      "stays exact across a checkpoint kill") {
    val srv = new MockMaxScaleServer(MockMaxScaleServer.Schema,
      tableSchemas = Map("db.orders" -> ordersSchema))
    srv.pushTo("db.orders", order(1, 100, 50))
    srv.pushTo("db.orders", order(2, 101, 75))
    val ckpt = Files.createTempDirectory("norm_ddl").toString
    NormalizedDdlSpec.collected.clear()
    def startQuery() = spark.readStream.format("maxscale-cdc")
      .option("host", "127.0.0.1").option("port", srv.port)
      .option("user", "u").option("password", "p")
      .option("table", "db.orders")
      .option("schemaMode", "normalized")
      .option("timeoutSeconds", 1)
      .load()
      .select("_table", "sequence", "payload")
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, bid: Long) =>
        NormalizedDdlSpec.collected(bid) =
          df.as[(String, Int, String)].collect().toSeq
        ()
      }
      .start()
    def payloads: Map[Int, String] =
      NormalizedDdlSpec.collected.values.flatten
        .map { case (_, seq, pay) => seq -> pay }.toMap
    try {
      val q = startQuery()
      try {
        q.processAllAvailable()
        assert(payloads.keySet == Set(1, 2))
        assert(!payloads(1).contains("coupon"))

        // the DDL lands IN-BAND (a schema line in the changelog), then
        // post-DDL traffic carries the new column
        srv.pushTo("db.orders", ordersSchemaV2)
        srv.pushTo("db.orders", orderV2(3, 102, 99, "SAVE10"))
        srv.pushTo("db.orders", orderV2(4, 103, 20, "SAVE20"))

        eventually(timeout(Span(30, Seconds)), interval(Span(1, Seconds))) {
          assert(q.exception.isEmpty, s"query failed: ${q.exception}")
          q.processAllAvailable()
          assert(payloads.keySet == Set(1, 2, 3, 4))
        }
        // the SAME query is still running — the DDL was absorbed
        assert(q.isActive, "query restarted/failed on an absorbable DDL")
        assert(payloads(2) == """{"order_id":101,"total":75}""")
        assert(payloads(3) ==
          """{"order_id":102,"total":99,"coupon":"SAVE10"}""")
        assert(payloads(4) ==
          """{"order_id":103,"total":20,"coupon":"SAVE20"}""")
      } finally q.stop()

      // checkpoint kill + post-DDL traffic while down: the restarted query
      // resumes from the committed per-table position, exactly-once, and
      // keeps decoding under the evolved schema
      srv.pushTo("db.orders", orderV2(5, 104, 10, "SAVE30"))
      val q2 = startQuery()
      try {
        eventually(timeout(Span(30, Seconds)), interval(Span(1, Seconds))) {
          assert(q2.exception.isEmpty, s"resumed query failed: ${q2.exception}")
          q2.processAllAvailable()
          assert(payloads.keySet == Set(1, 2, 3, 4, 5))
        }
        assert(payloads(5) ==
          """{"order_id":104,"total":10,"coupon":"SAVE30"}""")
        // exactly-once: every (table, seq) delivered exactly once across
        // both runs (batchId slots make re-delivered batches idempotent;
        // distinct raw deliveries must not exceed the slot picture)
        val all = NormalizedDdlSpec.collected.values.flatten.toSeq
        assert(all.size == all.distinct.size,
          s"duplicate delivery across restart: $all")
      } finally q2.stop()
    } finally {
      srv.close()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ckpt))
    }
  }

  test("DDL absorption survives executor-side REPLAY of a range that " +
      "spans the DDL: one batch carries pre- and post-DDL rows, each in " +
      "its governing version's shape") {
    val srv = new MockMaxScaleServer(MockMaxScaleServer.Schema,
      tableSchemas = Map("db.orders" -> ordersSchema))
    // the whole story is already in the changelog BEFORE the stream
    // starts: v1 rows, the DDL, v2 rows — one deep catch-up batch
    srv.pushTo("db.orders", order(1, 100, 50))
    srv.pushTo("db.orders", order(2, 101, 75))
    srv.pushTo("db.orders", ordersSchemaV2)
    srv.pushTo("db.orders", orderV2(3, 102, 99, "SAVE10"))
    val ckpt = Files.createTempDirectory("norm_ddl_replay").toString
    try {
      val got = java.util.concurrent.ConcurrentHashMap
        .newKeySet[(Int, String)]()
      val q = spark.readStream.format("maxscale-cdc")
        .option("host", "127.0.0.1").option("port", srv.port)
        .option("user", "u").option("password", "p")
        .option("table", "db.orders")
        .option("schemaMode", "normalized")
        .option("timeoutSeconds", 1)
        .load()
        .select("sequence", "payload")
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.as[(Int, String)].collect().foreach(got.add)
        }
        .start()
      try {
        q.processAllAvailable()
        val bySeq = scala.jdk.CollectionConverters.SetHasAsScala(got)
          .asScala.toMap
        assert(bySeq.keySet == Set(1, 2, 3))
        assert(!bySeq(1).contains("coupon"), bySeq(1))
        assert(!bySeq(2).contains("coupon"), bySeq(2))
        assert(bySeq(3) == """{"order_id":102,"total":99,"coupon":"SAVE10"}""")
      } finally q.stop()
    } finally {
      srv.close()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ckpt))
    }
  }

  test("normalized BATCH pull absorbs an in-log DDL the same way") {
    val srv = new MockMaxScaleServer(MockMaxScaleServer.Schema,
      tableSchemas = Map("db.orders" -> ordersSchema))
    srv.pushTo("db.orders", order(1, 100, 50))
    srv.pushTo("db.orders", ordersSchemaV2)
    srv.pushTo("db.orders", orderV2(2, 101, 75, "SAVEX"))
    try {
      val got = spark.read.format("maxscale-cdc")
        .option("host", "127.0.0.1").option("port", srv.port)
        .option("user", "u").option("password", "p")
        .option("table", "db.orders")
        .option("schemaMode", "normalized")
        .option("timeoutSeconds", 1)
        .load()
        .select("sequence", "payload").as[(Int, String)].collect().toMap
      assert(got.keySet == Set(1, 2))
      assert(got(1) == """{"order_id":100,"total":50}""")
      assert(got(2) == """{"order_id":101,"total":75,"coupon":"SAVEX"}""")
    } finally srv.close()
  }

  test("DROP COLUMN and a type change absorb mid-stream the same way: " +
      "NO restart, each row in its governing version's shape") {
    // ALTER TABLE db.orders DROP COLUMN total, MODIFY order_id varchar(8):
    // normalized rows are schema-free, so ANY evolution keeping the six
    // metadata columns absorbs — not just the column-add case
    val ordersSchemaV3 = ordersSchema.replace(
      """{"name":"order_id","type":"int","real_type":"int","length":-1},""" +
        """{"name":"total","type":"int","real_type":"int","length":-1}""",
      """{"name":"order_id","type":"string","real_type":"varchar","length":8}""")
    def orderV3(seq: Long, orderId: String): String =
      s"""{"domain":0,"server_id":1,"sequence":$seq,"event_number":1,""" +
        s""""timestamp":${1700000000 + seq},"event_type":"insert",""" +
        s""""order_id":"$orderId"}"""
    val srv = new MockMaxScaleServer(MockMaxScaleServer.Schema,
      tableSchemas = Map("db.orders" -> ordersSchema))
    srv.pushTo("db.orders", order(1, 100, 50))
    val ckpt = Files.createTempDirectory("norm_ddl_drop").toString
    NormalizedDdlSpec.collected.clear()
    try {
      val q = spark.readStream.format("maxscale-cdc")
        .option("host", "127.0.0.1").option("port", srv.port)
        .option("user", "u").option("password", "p")
        .option("table", "db.orders")
        .option("schemaMode", "normalized")
        .option("timeoutSeconds", 1)
        .load()
        .select("_table", "sequence", "payload")
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, bid: Long) =>
          NormalizedDdlSpec.collected(bid) =
            df.as[(String, Int, String)].collect().toSeq
          ()
        }
        .start()
      def payloads: Map[Int, String] =
        NormalizedDdlSpec.collected.values.flatten
          .map { case (_, seq, pay) => seq -> pay }.toMap
      try {
        q.processAllAvailable()
        assert(payloads.keySet == Set(1))
        srv.pushTo("db.orders", ordersSchemaV3)
        srv.pushTo("db.orders", orderV3(2, "A-7"))
        eventually(timeout(Span(30, Seconds)), interval(Span(1, Seconds))) {
          assert(q.exception.isEmpty, s"query failed: ${q.exception}")
          q.processAllAvailable()
          assert(payloads.keySet == Set(1, 2))
        }
        assert(q.isActive, "query restarted/failed on an absorbable DDL")
        // pre-DDL row keeps the dropped column and the int type; the
        // post-DDL row lacks it and carries the re-typed value
        assert(payloads(1) == """{"order_id":100,"total":50}""")
        assert(payloads(2) == """{"order_id":"A-7"}""")
      } finally q.stop()
    } finally {
      srv.close()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ckpt))
    }
  }

  test("a DDL that drops a METADATA column still fails loudly") {
    val broken = ordersSchema.replace(
      """{"name":"sequence","type":"int","real_type":"int","length":-1},""", "")
    val srv = new MockMaxScaleServer(MockMaxScaleServer.Schema,
      tableSchemas = Map("db.orders" -> ordersSchema))
    srv.pushTo("db.orders", order(1, 100, 50))
    srv.pushTo("db.orders", broken)
    srv.pushTo("db.orders", order(2, 101, 75))
    val ckpt = Files.createTempDirectory("norm_ddl_bad").toString
    try {
      val q = spark.readStream.format("maxscale-cdc")
        .option("host", "127.0.0.1").option("port", srv.port)
        .option("user", "u").option("password", "p")
        .option("table", "db.orders")
        .option("schemaMode", "normalized")
        .option("timeoutSeconds", 1)
        .load()
        .writeStream.option("checkpointLocation", ckpt)
        .format("memory").queryName("norm_ddl_bad")
        .start()
      try {
        val e = intercept[Exception] {
          q.processAllAvailable()
          // the tailer's fatal surfaces at the next offset poll
          q.awaitTermination(20000)
          throw new IllegalStateException(
            "query survived a metadata-column drop")
        }
        assert(e.toString.contains("metadata columns") ||
          Option(q.exception).flatten.exists(
            _.toString.contains("metadata columns")),
          s"wrong failure: $e / ${q.exception}")
      } finally q.stop()
    } finally {
      srv.close()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ckpt))
    }
  }

  // ------------------------------------------------------------ typedView

  private val richSchema =
    """{"namespace":"MaxScaleChangeDataSchema.avro","type":"record","name":"ChangeRecord","fields":[
      |{"name":"domain","type":"int","real_type":"int","length":-1},
      |{"name":"server_id","type":"int","real_type":"int","length":-1},
      |{"name":"sequence","type":"int","real_type":"int","length":-1},
      |{"name":"event_number","type":"int","real_type":"int","length":-1},
      |{"name":"timestamp","type":"int","real_type":"int","length":-1},
      |{"name":"event_type","type":"string","real_type":"varchar","length":32},
      |{"name":"name","type":"string","real_type":"varchar","length":64},
      |{"name":"price","type":"string","real_type":"decimal(10,2)","length":-1},
      |{"name":"ok","type":"int","real_type":"bool","length":-1},
      |{"name":"born","type":"string","real_type":"datetime","length":-1},
      |{"name":"data","type":"string","real_type":"blob","length":-1}
      |]}""".stripMargin.replace("\n", "")

  private val richWire = Seq(
    CdcField("domain", "int"), CdcField("server_id", "int"),
    CdcField("sequence", "int"), CdcField("event_number", "int"),
    CdcField("timestamp", "int"), CdcField("event_type", "varchar(32)"),
    CdcField("name", "varchar(64)"), CdcField("price", "decimal(10,2)"),
    CdcField("ok", "bool"), CdcField("born", "datetime"),
    CdcField("data", "blob"))

  private def rich(seq: Long, name: String, price: String, ok: String,
      born: String, data: String): String =
    s"""{"domain":0,"server_id":1,"sequence":$seq,"event_number":1,""" +
      s""""timestamp":${1700000000 + seq},"event_type":"insert",""" +
      s""""name":${if (name == null) "null" else s""""$name""""},""" +
      s""""price":$price,"ok":$ok,""" +
      s""""born":${if (born == null) "null" else s""""$born""""},""" +
      s""""data":"$data"}"""

  private def richServer(): MockMaxScaleServer = {
    val srv = new MockMaxScaleServer(richSchema)
    srv.push(rich(1, "alpha", "12.34", "true", "2024-03-01 10:00:00", "abc"))
    srv.push(rich(2, null, "0.5", "false", null, ""))
    // name arrives JSON-escaped on the wire (decodes to `q"uo\te`): the
    // payload re-escape + from_json decode must round-trip it
    srv.push(rich(3, "q\\\"uo\\\\te", "99999999.99", "false",
      "2024-12-31 23:59:59.123456", "x y"))
    srv
  }

  private def comparable(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq.map {
      case b: Array[Byte] => new String(b, java.nio.charset.StandardCharsets.UTF_8)
      case other => other
    }.toVector).toSet

  test("typedView(normalized stream) ≡ uniform-mode typed stream, per " +
      "table, across the §1.3 type map (varchar/decimal/bool/datetime/blob)") {
    val srv = richServer()
    val dir = Files.createTempDirectory("typed_view")
    try {
      def base(fmt: org.apache.spark.sql.streaming.DataStreamReader) = fmt
        .option("host", "127.0.0.1").option("port", srv.port)
        .option("user", "u").option("password", "p")
        .option("table", "db.t").option("timeoutSeconds", 1)
      val uniform = base(spark.readStream.format("maxscale-cdc")).load()
      val normalized = base(spark.readStream.format("maxscale-cdc"))
        .option("schemaMode", "normalized").load()
      val typedView = NormalizedCdc.typedView(normalized, "db.t", richWire)

      // schemas agree, name for name, type for type
      assert(typedView.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
        uniform.schema.fields.map(f => (f.name, f.dataType)).toSeq,
        s"${typedView.schema} vs ${uniform.schema}")
      assert(typedView.schema("price").metadata.getString("cdc.sqlType") ==
        "decimal(10,2)")

      val q1 = uniform.writeStream
        .option("checkpointLocation", s"$dir/u")
        .format("memory").queryName("tv_uniform").outputMode("append").start()
      val q2 = typedView.writeStream
        .option("checkpointLocation", s"$dir/n")
        .format("memory").queryName("tv_normalized").outputMode("append").start()
      try {
        q1.processAllAvailable(); q2.processAllAvailable()
        val u = comparable(spark.table("tv_uniform"))
        val n = comparable(spark.table("tv_normalized"))
        assert(u.nonEmpty && u == n, s"uniform=$u\nnormalized=$n")
      } finally { q1.stop(); q2.stop() }
    } finally {
      srv.close()
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }

  test("typedView raw mode keeps the reference's null→\"\" conflation " +
      "(cdc_connector.cpp:106-107) — batch twin") {
    val srv = richServer()
    try {
      def base(fmt: org.apache.spark.sql.DataFrameReader) = fmt
        .option("host", "127.0.0.1").option("port", srv.port)
        .option("user", "u").option("password", "p")
        .option("table", "db.t").option("timeoutSeconds", 1)
        .option("mode", "raw")
      val uniform = base(spark.read.format("maxscale-cdc")).load()
      val normalized = base(spark.read.format("maxscale-cdc"))
        .option("schemaMode", "normalized").load()
      val view = NormalizedCdc.typedView(normalized, "db.t", richWire,
        typed = false)
      assert(view.schema.fields.forall(_.dataType ==
        org.apache.spark.sql.types.StringType))
      assert(comparable(view) == comparable(uniform))
      // the conflation, explicitly: row 2's name/born are JSON null
      val r2 = view.where(col("sequence") === "2")
        .select("name", "born").as[(String, String)].collect().head
      assert(r2 == (("", "")))
    } finally srv.close()
  }
}
