package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The sink half of the CDC pipeline: changelog stream in, maintained
  * latest-state parquet table out, via foreachBatch + idempotent merge. */
class CdcSinkSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  private def freshDir(): String = {
    val d = java.nio.file.Files
      .createTempDirectory(SparkSpec.localDir.toPath, "cdc-sink-")
    java.nio.file.Files.delete(d)
    d.toString
  }

  test("stream -> foreachBatch sink equals full recompaction of the log") {
    val dir = freshDir()
    val in = MemoryStream[Ev](spark)
    val q = in.toDF().writeStream
      .foreachBatch(CdcSink.writer(dir, "user_id", Seq("ts", "event_id")))
      .start()
    try {
      in.addData(
        Ev(1, 1, ts(0), "insert"), Ev(2, 2, ts(1), "insert"),
        Ev(3, 1, ts(2), "update"))
      q.processAllAvailable()
      in.addData(
        Ev(4, 2, ts(3), "update"), Ev(5, 3, ts(4), "insert"))
      q.processAllAvailable()

      val state = CdcSink.readState(spark, dir)
        .select("user_id", "event_id", "event_type")
        .as[(Long, Long, String)].collect().toSet
      // latest per user across BOTH batches
      assert(state == Set(
        (1L, 3L, "update"), (2L, 4L, "update"), (3L, 5L, "insert")))
    } finally q.stop()
  }

  test("merge is idempotent under batch retry and old-batch replay") {
    val dir = freshDir()
    val newer = Seq(
      Ev(10, 1, ts(5), "update"), Ev(11, 2, ts(6), "update"))
      .toDF()
    val older = Seq(Ev(1, 1, ts(0), "insert")).toDF()

    CdcSink.applyChangelog(newer, dir, "user_id", Seq("ts", "event_id"))
    val after1 = CdcSink.readState(spark, dir).collect().toSet

    // foreachBatch retry: the exact same batch applied again
    CdcSink.applyChangelog(newer, dir, "user_id", Seq("ts", "event_id"))
    assert(CdcSink.readState(spark, dir).collect().toSet == after1)

    // out-of-order replay of an OLDER version must not regress the table
    CdcSink.applyChangelog(older, dir, "user_id", Seq("ts", "event_id"))
    val after3 = CdcSink.readState(spark, dir)
      .select("user_id", "event_id").as[(Long, Long)].collect().toMap
    assert(after3(1L) == 10L, s"older replay regressed user 1: $after3")
  }

  test("wire to table: maxscale-cdc source -> CdcSink materializes state") {
    import graft.sources.MockMaxScaleServer
    import MockMaxScaleServer.{Schema, event}
    val dir = freshDir()
    val srv = new MockMaxScaleServer(Schema, Seq(
      event(1, "insert", 1, "v1"),
      event(2, "insert", 2, "w1"),
      event(3, "update_after", 1, "v2")))
    try {
      val cdc = spark.readStream.format("maxscale-cdc")
        .option("host", "127.0.0.1").option("port", srv.port)
        .option("user", "u").option("password", "p")
        .option("table", "db.t").option("timeoutSeconds", 1)
        .load()
      val q = cdc.writeStream
        .foreachBatch(CdcSink.writer(dir, "id", Seq("sequence")))
        .start()
      try {
        org.scalatest.concurrent.Eventually.eventually(
          org.scalatest.concurrent.Eventually.timeout(
            org.scalatest.time.Span(20, org.scalatest.time.Seconds))) {
          q.processAllAvailable()
          val state = CdcSink.readState(spark, dir)
            .select("id", "name", "event_type")
            .as[(Int, String, String)].collect().toSet
          assert(state == Set(
            (1, "v2", "update_after"), (2, "w1", "insert")))
        }
      } finally q.stop()
    } finally srv.close()
  }

  test("swap is atomic-ish: a table always exists after the first batch") {
    val dir = freshDir()
    CdcSink.applyChangelog(
      Seq(Ev(1, 1, ts(0), "insert")).toDF(), dir, "user_id",
      Seq("ts", "event_id"))
    // no .next-/.old- residue after a clean apply
    val parent = java.nio.file.Paths.get(dir).getParent
    import scala.jdk.CollectionConverters._
    val residue = java.nio.file.Files.list(parent).iterator().asScala
      .map(_.getFileName.toString)
      .filter(n => n.contains(".next-") || n.contains(".old-")).toList
    assert(residue.isEmpty, s"leftover swap dirs: $residue")
    assert(CdcSink.readState(spark, dir).count() == 1)
  }
}
