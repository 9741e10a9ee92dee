package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.cdc.{CdcField, CdcSplitProbe, CdcTailer, Gtid, GtidRangeCuts}
import org.scalatest.concurrent.Eventually.{eventually, interval, timeout}
import org.scalatest.time.{Seconds, Span}

/** A changelog that crosses a replication-domain switch (MariaDB failover
  * onto a server configured with a different `gtid_domain_id`; the GTID
  * grammar `domain-server_id-sequence` is the reference's own,
  * cdc_connector.h:197-208).
  *
  * GTID order is `(domain, sequence, serverId)` ([[Gtid]]) — total, so a
  * switch onto a HIGHER domain keeps the log monotone and everything
  * (dedupe, resume, observed-position cuts) stays exact. What is NOT
  * meaningful across the switch is SEQUENCE ARITHMETIC: domains restart
  * their sequences, so interpolated cuts must collapse to serial replay
  * ([[GtidRangeCuts.sequenceCuts]]'s domain guard) in both the bounded
  * batch planner and the streaming catch-up fallback. A switch that
  * breaks monotonicity has no order to replay against — loud failure.
  */
class MultiDomainGtidSpec extends SparkSpec {
  import spark.implicits._

  private def ev(domain: Long, seq: Long, id: Int): String =
    s"""{"domain":$domain,"server_id":${domain + 1},"sequence":$seq,""" +
      s""""event_number":1,"timestamp":${1700000000 + seq},""" +
      s""""event_type":"insert","id":$id,"name":"n$domain-$seq"}"""

  test("sequenceCuts collapses to ONE serial chunk when start/end domains " +
      "differ (interpolated sequences are per-domain)") {
    val start = Some(Gtid(0, 1, 50))
    val end = Gtid(1, 2, 100)
    assert(GtidRangeCuts.sequenceCuts(start, end, 8) == Seq((start, end)))
    // same-domain control: still cuts in parallel
    assert(GtidRangeCuts.sequenceCuts(Some(Gtid(1, 2, 0)), end, 4).size == 4)
  }

  test("streaming catch-up fallback goes serial across a domain switch " +
      "(splitRanges arithmetic path)") {
    // un-started tailer: positions buffer empty ⇒ splitRanges cannot cover
    // the range and takes the sequence-arithmetic fallback — exactly the
    // recovery-re-plan / deep-catch-up shape
    val fields = Seq(CdcField("domain", "int"), CdcField("server_id", "int"),
      CdcField("sequence", "int"), CdcField("id", "int"))
    val t = new CdcTailer("127.0.0.1", 1, "u", "p", "db.t", fields,
      resumeAfter = None, timeoutMs = 1000)
    val before = CdcSplitProbe.arithmeticFallbacks
    val got = t.splitRanges(Some(Gtid(0, 1, 5)), Gtid(1, 2, 40), 4,
      spanPerConnection = 1L)
    assert(CdcSplitProbe.arithmeticFallbacks == before + 1)
    assert(got == Seq((Some(Gtid(0, 1, 5)), Gtid(1, 2, 40))))
    // same-domain control: the fallback still parallelizes
    val same = t.splitRanges(Some(Gtid(1, 2, 0)), Gtid(1, 2, 40), 4,
      spanPerConnection = 1L)
    assert(same.size == 4, same.toString)
  }

  test("bounded batch across the switch: serial replay, exactly-once — " +
      "old-domain events above the start, all new-domain events to the end") {
    val srv = new MockMaxScaleServer(MockMaxScaleServer.Schema,
      (1L to 4L).map(ev(0, _, 1)) ++ (1L to 4L).map(ev(1, _, 2)))
    try {
      val got = spark.read.format("maxscale-cdc")
        .option("host", "127.0.0.1").option("port", srv.port)
        .option("user", "u").option("password", "p")
        .option("table", "db.t")
        .option("startingGtid", "0-1-2")
        .option("endGtid", "1-2-3")
        .option("endGtidObserved", "true")
        .option("replayPartitions", "4")
        .option("timeoutSeconds", 1)
        .load()
        .select("domain", "sequence").as[(Int, Int)].collect().toSeq
      // (0-1-2, 1-2-3]: domain-0 events 3,4 then domain-1 events 1,2,3 —
      // sequence RESTARTED in the new domain and must not be mis-excluded
      assert(got.sorted == Seq((0, 3), (0, 4), (1, 1), (1, 2), (1, 3)),
        s"got $got")
      assert(got.size == got.distinct.size, s"duplicates: $got")
    } finally srv.close()
  }

  test("live stream rides through a monotone domain switch exactly-once") {
    val srv = new MockMaxScaleServer(MockMaxScaleServer.Schema,
      (1L to 3L).map(ev(0, _, 1)))
    val ckpt = Files.createTempDirectory("multidomain_stream").toString
    try {
      val got = java.util.concurrent.ConcurrentHashMap
        .newKeySet[(Int, Int)]()
      val q = spark.readStream.format("maxscale-cdc")
        .option("host", "127.0.0.1").option("port", srv.port)
        .option("user", "u").option("password", "p")
        .option("table", "db.t")
        .option("startingGtid", "0-1-1")
        .option("replayPartitions", "4")
        .option("timeoutSeconds", 1)
        .load()
        .selectExpr("domain", "sequence")
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.as[(Int, Int)].collect().foreach(got.add)
        }
        .start()
      try {
        q.processAllAvailable()
        // failover: domain 1 takes over, sequences restart
        (1L to 3L).foreach(s => srv.push(ev(1, s, 2)))
        eventually(timeout(Span(30, Seconds)), interval(Span(1, Seconds))) {
          assert(q.exception.isEmpty, s"query failed: ${q.exception}")
          q.processAllAvailable()
          val gotS = scala.jdk.CollectionConverters.SetHasAsScala(got).asScala
          assert(gotS == Set((0, 2), (0, 3), (1, 1), (1, 2), (1, 3)),
            s"got $gotS")
        }
      } finally q.stop()
    } finally {
      srv.close()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ckpt))
    }
  }

  test("a NON-monotone domain switch (lower domain id) fails fast — " +
      "interleaved domains have no total order") {
    val srv = new MockMaxScaleServer(MockMaxScaleServer.Schema,
      Seq(ev(2, 1, 1), ev(2, 2, 1), ev(1, 5, 2)))
    val ckpt = Files.createTempDirectory("multidomain_bad").toString
    try {
      val q = spark.readStream.format("maxscale-cdc")
        .option("host", "127.0.0.1").option("port", srv.port)
        .option("user", "u").option("password", "p")
        .option("table", "db.t")
        .option("timeoutSeconds", 1)
        .load()
        .writeStream.option("checkpointLocation", ckpt)
        .format("memory").queryName("multidomain_bad")
        .start()
      try {
        val e = intercept[Exception] {
          q.processAllAvailable()
          q.awaitTermination(20000)
          throw new IllegalStateException("query survived a domain regression")
        }
        assert(e.toString.contains("no total order") ||
          Option(q.exception).flatten.exists(
            _.toString.contains("no total order")),
          s"wrong failure: $e / ${q.exception}")
      } finally q.stop()
    } finally {
      srv.close()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ckpt))
    }
  }

  test("a JSON-null GTID value raises the real positioning error, not a " +
      "misleading A10 missing-key error for an unrelated column") {
    // `name` is ABSENT (would be the A10 key) while `domain` is present
    // but null — the old null+empty heuristic blamed `name`; the explicit
    // absence record (CdcRowMsg.missingIdx) lets the GTID guard name the
    // actual problem
    val bad = s"""{"domain":null,"server_id":1,"sequence":9,""" +
      s""""event_number":1,"timestamp":1700000009,"event_type":"insert",""" +
      s""""id":7}"""
    val srv = new MockMaxScaleServer(MockMaxScaleServer.Schema, Seq(bad))
    val ckpt = Files.createTempDirectory("gtid_null").toString
    try {
      val q = spark.readStream.format("maxscale-cdc")
        .option("host", "127.0.0.1").option("port", srv.port)
        .option("user", "u").option("password", "p")
        .option("table", "db.t")
        .option("timeoutSeconds", 1)
        .load()
        .writeStream.option("checkpointLocation", ckpt)
        .format("memory").queryName("gtid_null")
        .start()
      try {
        val e = intercept[Exception] {
          q.processAllAvailable()
          q.awaitTermination(20000)
          throw new IllegalStateException("query survived a null GTID")
        }
        val all = e.toString +
          Option(q.exception).flatten.map(_.toString).getOrElse("")
        assert(all.contains("null/empty GTID column"), s"wrong failure: $all")
        assert(!all.contains("No value for key found"),
          s"misleading A10 error: $all")
      } finally q.stop()
    } finally {
      srv.close()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ckpt))
    }
  }
}
