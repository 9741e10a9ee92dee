package graft.streaming

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicReference

import graft.SparkSpec
import graft.sources.MockMaxScaleServer
import graft.sources.MockMaxScaleServer.{Schema, event}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery
import org.scalatest.concurrent.Eventually.{eventually, interval, timeout}
import org.scalatest.time.{Seconds, Span}

object CdcAutoRestartSpec {
  /** batchId-keyed sink slots (idempotent overwrite on re-delivery); batch
    * ids continue across restarts of the same checkpoint, so the union of
    * slots is the exactly-once delivery picture. */
  val collected = new scala.collection.concurrent.TrieMap[Long, Seq[Int]]()
}

/** The reference keeps consuming through a DDL by adopting the new in-band
  * schema (cdc_connector.cpp:339-344). Spark's fixed-schema plans force a
  * restart instead; CdcAutoRestart must make that restart automatic and
  * loss-free. */
class CdcAutoRestartSpec extends SparkSpec {

  test("DDL mid-stream: query restarts with the new schema, no event lost") {
    val schema2 = Schema.replace("\"length\":64", "\"length\":128")
    // DDL lands after 2 events; events 3-5 arrive under the new schema
    val srv = new MockMaxScaleServer(Schema,
      (1L to 2L).map(i => event(i, "insert", i.toInt, s"n$i")),
      midStreamSchemaAfter = Some((2, schema2)))
    val ckpt = Files.createTempDirectory("cdc_auto_restart").toString
    try {
      CdcAutoRestartSpec.collected.clear()
      val qRef = new AtomicReference[StreamingQuery]
      val nameType = new AtomicReference[String]
      val restartsRef = new AtomicReference[Integer](-1)
      val failure = new AtomicReference[Throwable]

      val runner = new Thread(() => {
        try restartsRef.set(CdcAutoRestart.runWithSchemaRestarts(spark,
          Map("host" -> "127.0.0.1", "port" -> srv.port.toString,
            "user" -> "u", "password" -> "p", "table" -> "db.t",
            "timeoutSeconds" -> "1"),
          df => {
            nameType.set(df.schema("name").metadata.getString("cdc.sqlType"))
            val q = df.writeStream
              .foreachBatch { (b: DataFrame, bid: Long) =>
                CdcAutoRestartSpec.collected(bid) =
                  b.select("sequence").collect().map(_.getInt(0)).toSeq
                ()
              }
              .option("checkpointLocation", ckpt).start()
            qRef.set(q)
            q
          }))
        catch { case t: Throwable => failure.set(t) }
      }, "auto-restart-runner")
      runner.setDaemon(true)
      runner.start()

      def delivered: Seq[Int] =
        CdcAutoRestartSpec.collected.values.flatten.toSeq.sorted

      eventually(timeout(Span(30, Seconds)), interval(Span(1, Seconds))) {
        assert(failure.get() == null, s"runner failed: ${failure.get()}")
        Option(qRef.get()).foreach(_.processAllAvailable())
        assert(delivered == Seq(1, 2))
        assert(nameType.get() == "varchar(64)")
      }

      // the push triggers the in-band re-schema (written before event 3):
      // the running query fails, CdcAutoRestart re-infers and resumes
      srv.push(event(3, "insert", 3, "n3"))
      srv.push(event(4, "insert", 4, "n4"))
      srv.push(event(5, "insert", 5, "n5"))

      eventually(timeout(Span(60, Seconds)), interval(Span(1, Seconds))) {
        assert(failure.get() == null, s"runner failed: ${failure.get()}")
        assert(delivered == Seq(1, 2, 3, 4, 5), s"delivered=$delivered")
        // the restarted query adopted the post-DDL schema
        assert(nameType.get() == "varchar(128)")
      }

      // clean stop ends the restart loop and reports the restart count
      qRef.get().stop()
      runner.join(30000)
      assert(!runner.isAlive)
      assert(failure.get() == null, s"runner failed: ${failure.get()}")
      assert(restartsRef.get() >= 1)
    } finally srv.close()
  }

  test("consumer journey: DDL adds a column mid-stream — the restarted " +
      "query feeds a latest-state table that carries the new column, " +
      "old rows null-extended") {
    // the full path a reference consumer walks across a DDL: typed CDC
    // stream -> CdcSink latest-state table; ALTER TABLE ADD COLUMN lands
    // mid-stream; the query auto-restarts under the widened schema and
    // the state table evolves in place. The replayed boundary event
    // (inclusive GTID replay of committed 0-1-2, whose JSON predates the
    // column) must pass through the resume dedupe without tripping the
    // missing-key delivery error.
    val schemaV2 = Schema.replace(
      """{"name":"name","type":"string","real_type":"varchar","length":64}""",
      """{"name":"name","type":"string","real_type":"varchar","length":64},""" +
        """{"name":"score","type":"int","real_type":"int","length":-1}""")
    def eventV2(seq: Long, eventType: String, id: Int, name: String, score: Int) =
      s"""{"domain":0,"server_id":1,"sequence":$seq,"event_number":1,""" +
        s""""timestamp":${1700000000 + seq},"event_type":"$eventType",""" +
        s""""id":$id,"name":"$name","score":$score}"""

    val srv = new MockMaxScaleServer(Schema,
      Seq(event(1, "insert", 1, "a1"), event(2, "insert", 2, "b1")),
      midStreamSchemaAfter = Some((2, schemaV2)))
    val dir = Files.createTempDirectory("cdc_journey")
    val stateDir = s"$dir/state"
    try {
      // ONE public-API call — the supervisor owns the restart loop and
      // its thread; no hand-rolled runner/AtomicReference boilerplate
      val sup = CdcAutoRestart.supervise(spark,
        Map("host" -> "127.0.0.1", "port" -> srv.port.toString,
          "user" -> "u", "password" -> "p", "table" -> "db.t",
          "timeoutSeconds" -> "1"),
        df => df.writeStream
          .option("checkpointLocation", s"$dir/ckpt")
          .foreachBatch(CdcSink.writer(stateDir, keyCol = "id",
            orderCols = Seq("sequence")))
          .start())

      // phase 1: pre-DDL state materializes without a score column
      eventually(timeout(Span(30, Seconds)), interval(Span(1, Seconds))) {
        assert(sup.failure.isEmpty, s"supervisor failed: ${sup.failure}")
        sup.currentQuery.foreach(_.processAllAvailable())
        val st = CdcSink.readState(spark, stateDir)
        assert(!st.columns.contains("score"))
        assert(st.select("id", "name").collect()
          .map(r => r.getInt(0) -> r.getString(1)).toMap ==
          Map(1 -> "a1", 2 -> "b1"))
      }

      // phase 2: the DDL fires in-band before event 3; post-DDL traffic
      // updates an old key and inserts new ones
      srv.push(eventV2(3, "insert", 3, "c1", 30))
      srv.push(eventV2(4, "update_after", 1, "a2", 10))
      srv.push(eventV2(5, "insert", 4, "d1", 40))

      eventually(timeout(Span(60, Seconds)), interval(Span(1, Seconds))) {
        assert(sup.failure.isEmpty, s"supervisor failed: ${sup.failure}")
        val st = CdcSink.readState(spark, stateDir)
        assert(st.columns.contains("score"), "state table did not evolve")
        val got = st.select("id", "name", "score").collect()
          .map(r => r.getInt(0) -> ((r.getString(1),
            if (r.isNullAt(2)) null else Integer.valueOf(r.getInt(2))))).toMap
        assert(got == Map(
          1 -> ("a2", Integer.valueOf(10)),   // updated post-DDL
          2 -> ("b1", null),                  // pre-DDL row, null-extended
          3 -> ("c1", Integer.valueOf(30)),
          4 -> ("d1", Integer.valueOf(40))), s"state=$got")
      }

      assert(sup.isActive && sup.restarts >= 1)
      sup.stop()
      assert(!sup.isActive)
      assert(sup.failure.isEmpty, s"supervisor failed: ${sup.failure}")
    } finally {
      srv.close()
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }

  test("non-schema failures are not swallowed") {
    val srv = new MockMaxScaleServer(Schema, Nil, rejectAuth = true)
    try {
      intercept[Exception] {
        CdcAutoRestart.runWithSchemaRestarts(spark,
          Map("host" -> "127.0.0.1", "port" -> srv.port.toString,
            "user" -> "u", "password" -> "bad", "table" -> "db.t",
            "timeoutSeconds" -> "1"),
          df => df.writeStream.format("memory").queryName("nope").start())
      }
    } finally srv.close()
  }
}
