package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.sources.cdc.{CommittedGtidFile, Gtid, GtidOffset, MultiGtidOffset}

import MockMaxScaleServer.{Schema, event}

/** Checkpoint-format compatibility across source generations.
  *
  * Two formats live under a query checkpoint: the offset-log entries
  * (single-table `0-1-7` / `-`, composite `db.a=0-1-5,db.b=-`) and the
  * committed-GTID watermark file (`graft-cdc-committed-gtid`, raw GTID
  * bytes). The single-table spellings predate the composite generation
  * and MUST keep parsing — a consumer upgrading the library resumes
  * yesterday's checkpoint with it. Composite offsets only exist for
  * multi-table queries, which the earlier generation could not start, so
  * there is no reverse-migration case; changing a query's table SET is a
  * new query (new checkpoint) by Spark's own source-evolution rules, and
  * feeding a single-table checkpoint to a multi-table query fails loudly
  * (pinned below), not silently from position zero.
  */
class CdcCheckpointCompatSpec extends SparkSpec {

  test("first-generation offset spellings parse unchanged") {
    assert(GtidOffset.fromJson("0-1-7").gtid.contains(Gtid(0, 1, 7)))
    assert(GtidOffset.fromJson("-").gtid.isEmpty)
    assert(GtidOffset.fromJson("").gtid.isEmpty)
    // round-trip stability: today's writer emits the same bytes the old
    // reader wrote — THE forward-compat guarantee for the offset log
    assert(GtidOffset(Some(Gtid(0, 1, 7))).json() == "0-1-7")
    assert(GtidOffset(None).json() == "-")
  }

  test("a first-generation watermark file (raw GTID bytes) reads and " +
      "stays monotone under today's writer") {
    val ckpt = Files.createTempDirectory("cdc_compat_wm").toString
    spark.sparkContext // CommittedGtidFile resolves fs() off the active session
    try {
      // the old writer: gtid.toString, no trailing newline; also accept
      // a newline-terminated variant (hand-edited or tool-written files)
      Files.write(Paths.get(ckpt, "graft-cdc-committed-gtid"),
        "0-1-12\n".getBytes("UTF-8"))
      assert(CommittedGtidFile.read(ckpt).contains(Gtid(0, 1, 12)))
      // monotonicity holds against legacy bytes: a stale advance is a
      // no-op, a forward advance rewrites in the same format
      CommittedGtidFile.advance(ckpt, Gtid(0, 1, 5))
      assert(CommittedGtidFile.read(ckpt).contains(Gtid(0, 1, 12)))
      CommittedGtidFile.advance(ckpt, Gtid(0, 1, 20))
      assert(CommittedGtidFile.read(ckpt).contains(Gtid(0, 1, 20)))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(ckpt))
  }

  test("e2e: a restarted stream over a first-generation checkpoint " +
      "resumes the wire from the legacy watermark and replans exactly") {
    // the upgrade moment: Spark's offset/commit logs say batch 0 ended at
    // 0-1-3 (Spark's own format, Spark's own compat) and the SOURCE slice
    // of the checkpoint holds the earlier generation's raw-bytes
    // watermark. Today's source must (a) parse those bytes and resume the
    // tailer's wire connection AT the watermark — not from the start of
    // the changelog — and (b) plan the next batch gap-free above it.
    import scala.jdk.CollectionConverters._
    import graft.sources.cdc.{CdcMicroBatchStream, CdcOptions}
    import org.scalatest.concurrent.Eventually.{eventually, interval, timeout}
    import org.scalatest.time.{Seconds, Span}
    spark.sparkContext // CommittedGtidFile resolves fs() off the active session
    val srv = new MockMaxScaleServer(Schema,
      (1L to 6L).map(i => event(i, "insert", i.toInt, s"n$i")))
    val ckpt = Files.createTempDirectory("cdc_compat_resume").toString
    try {
      Files.write(Paths.get(ckpt, "graft-cdc-committed-gtid"),
        "0-1-3".getBytes("UTF-8"))
      val schema = new cdc.MaxScaleCdcTableProvider().inferSchema(
        new org.apache.spark.sql.util.CaseInsensitiveStringMap(Map(
          "host" -> "127.0.0.1", "port" -> srv.port.toString,
          "user" -> "u", "password" -> "p", "table" -> "db.t",
          "timeoutSeconds" -> "1").asJava))
      val opts = CdcOptions("127.0.0.1", srv.port, "u", "p", "db.t", None,
        timeoutSeconds = 1, typed = true, maxEventsPerBatch = 1000,
        replayPartitions = 1)
      val s = new CdcMicroBatchStream(schema, opts, ckpt)
      try {
        val start = GtidOffset(Some(Gtid(0, 1, 3))) // Spark's durable start
        val end = eventually(timeout(Span(20, Seconds)),
            interval(Span(100, org.scalatest.time.Milliseconds))) {
          val e = s.latestOffset(start, s.getDefaultReadLimit)
            .asInstanceOf[GtidOffset]
          assert(e.gtid.exists(_.sequence == 6)); e
        }
        // (a) the legacy bytes reached the wire: the tailer's REQUEST-DATA
        // carried the watermark as its replay position
        assert(srv.lastRequestData == "REQUEST-DATA db.t 0-1-3",
          s"tailer did not resume at the legacy watermark: " +
            s"'${srv.lastRequestData}'")
        // (b) the replanned batch is exactly (3, 6]
        val factory = s.createReaderFactory()
        val got = s.planInputPartitions(start, end).toSeq.flatMap { p =>
          val r = factory.createReader(p)
          val out = Seq.newBuilder[Int]
          try while (r.next()) out += r.get().getInt(2)
          finally r.close()
          out.result()
        }
        assert(got == Seq(4, 5, 6), s"replanned batch not (3,6]: $got")
      } finally s.stop()
    } finally {
      srv.close()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ckpt))
    }
  }

  test("a single-table offset fed to a multi-table query fails loudly") {
    val e = intercept[IllegalArgumentException] {
      MultiGtidOffset.fromJson("0-1-7")
    }
    assert(e.getMessage.contains("malformed multi-table offset"))
  }

  test("composite offsets round-trip byte-stable in table-option order") {
    val o = MultiGtidOffset(Seq(
      "db.a" -> Some(Gtid(0, 1, 5)), "db.b" -> None))
    assert(o.json() == "db.a=0-1-5,db.b=-")
    assert(MultiGtidOffset.fromJson(o.json()) == o)
  }
}
