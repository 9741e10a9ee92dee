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
