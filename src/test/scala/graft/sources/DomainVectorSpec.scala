package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.cdc._
import org.scalatest.concurrent.Eventually.{eventually, interval, timeout}
import org.scalatest.time.{Seconds, Span}
import scala.jdk.CollectionConverters._

/** `domainMode=vector`: per-domain watermark offsets (gtid_slave_pos
  * semantics) over an INTERLEAVED multi-domain changelog — the
  * multi-master MariaDB shape the single-triple stream fails fast on.
  * The reference's resume token is one triple (cdc_connector.h:199-208),
  * so this is an extension; reference semantics are untouched for
  * single-domain streams (`domainMode=single` default).
  */
class DomainVectorSpec extends SparkSpec {
  import spark.implicits._

  private def ev(domain: Long, seq: Long, id: Int): String =
    s"""{"domain":$domain,"server_id":${domain + 1},"sequence":$seq,""" +
      s""""event_number":1,"timestamp":${1700000000 + seq},""" +
      s""""event_type":"insert","id":$id,"name":"n$domain-$seq"}"""

  /** Interleaved two-domain log: d0:1, d1:1, d0:2, d1:2, ... */
  private def interleaved(n: Int): Seq[String] =
    (1 to n).flatMap(i => Seq(ev(0, i, i), ev(1, i, 100 + i)))

  test("offset: json round-trip preserves LOAD-BEARING entry order; " +
      "covers() is the per-domain partial order") {
    val v = DomainVectorOffset(Seq(Gtid(1, 2, 5), Gtid(0, 1, 9)))
    assert(v.json() == "v:1-2-5,0-1-9")
    assert(DomainVectorOffset.fromJson(v.json()) == v)
    assert(DomainVectorOffset.fromJson("v:-") == DomainVectorOffset.Start)
    assert(v.requestPoint.contains(Gtid(1, 2, 5)))
    assert(v.covers(DomainVectorOffset(Seq(Gtid(0, 1, 9)))))
    assert(v.covers(DomainVectorOffset(Seq(Gtid(0, 1, 3), Gtid(1, 2, 5)))))
    assert(!v.covers(DomainVectorOffset(Seq(Gtid(0, 1, 10)))))
    assert(!v.covers(DomainVectorOffset(Seq(Gtid(7, 1, 1)))))
    intercept[IllegalArgumentException] {
      DomainVectorOffset(Seq(Gtid(0, 1, 1), Gtid(0, 2, 2)))
    }
  }

  test("tailer: interleaved domains are ACCEPTED (no total-order guard), " +
      "per-domain watermarks advance, head is the earliest last-arrival") {
    val srv = new MockMaxScaleServer(MockMaxScaleServer.Schema, interleaved(3))
    try {
      val fields = CdcClient.parseSchemaFields(
        new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(MockMaxScaleServer.Schema))
      val t = new CdcTailer("127.0.0.1", srv.port, "u", "p", "db.t",
        fields, resumeAfter = None, timeoutMs = 2000, domainVector = true)
      t.start()
      try {
        eventually(timeout(Span(10, Seconds)), interval(Span(1, Seconds))) {
          t.checkFatal()
          assert(t.bufferedCount == 6)
        }
        // last events arrived d0:3 then d1:3 → snapshot order (d0, d1)
        assert(t.vectorSnapshot == Seq(Gtid(0, 1, 3), Gtid(1, 2, 3)))
        assert(t.vectorHead.contains(Gtid(0, 1, 3)))
      } finally t.shutdown()
    } finally srv.close()
  }

  test("tailer: cappedEndVector takes an admission-bounded prefix and " +
      "keeps untouched domains' entries at the front") {
    val srv = new MockMaxScaleServer(MockMaxScaleServer.Schema, interleaved(4))
    try {
      val fields = CdcClient.parseSchemaFields(
        new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(MockMaxScaleServer.Schema))
      val t = new CdcTailer("127.0.0.1", srv.port, "u", "p", "db.t",
        fields, resumeAfter = None, timeoutMs = 2000, domainVector = true)
      t.start()
      try {
        eventually(timeout(Span(10, Seconds)), interval(Span(1, Seconds))) {
          t.checkFatal(); assert(t.bufferedCount == 8)
        }
        // 3 events from scratch: d0:1, d1:1, d0:2 → vector (d1@1, d0@2)
        val capped = t.cappedEndVector(Nil, 3)
        assert(capped == Seq(Gtid(1, 2, 1), Gtid(0, 1, 2)), capped.toString)
        // floor past d0 entirely: only d1 advances
        val after = Seq(Gtid(0, 1, 4), Gtid(1, 2, 2))
        val capped2 = t.cappedEndVector(after, 1)
        assert(capped2 == Seq(Gtid(0, 1, 4), Gtid(1, 2, 3)), capped2.toString)
      } finally t.shutdown()
    } finally srv.close()
  }

  test("e2e stream over an interleaved log: exactly-once, all domains") {
    val n = 20
    val srv = new MockMaxScaleServer(MockMaxScaleServer.Schema, interleaved(n))
    try {
      val q = spark.readStream.format("maxscale-cdc")
        .option("host", "127.0.0.1").option("port", srv.port)
        .option("user", "u").option("password", "p")
        .option("table", "db.t").option("timeoutSeconds", 1)
        .option("domainMode", "vector")
        .option("replayPartitions", 4)
        .load()
        .writeStream.format("memory").queryName("dv_e2e")
        .outputMode("append").start()
      try {
        eventually(timeout(Span(30, Seconds)), interval(Span(1, Seconds))) {
          q.processAllAvailable()
          assert(spark.table("dv_e2e").count() == 2L * n)
        }
        // live pushes keep interleaving
        srv.push(ev(1, n + 1, 999)); srv.push(ev(0, n + 1, 998))
        eventually(timeout(Span(30, Seconds)), interval(Span(1, Seconds))) {
          q.processAllAvailable()
          assert(spark.table("dv_e2e").count() == 2L * n + 2)
        }
        val got = spark.table("dv_e2e").select("domain", "sequence")
          .as[(Int, Int)].collect().toSeq
        assert(got.size == got.distinct.size, "duplicates delivered")
        assert(got.filter(_._1 == 0).map(_._2).sorted == (1 to n + 1))
        assert(got.filter(_._1 == 1).map(_._2).sorted == (1 to n + 1))
      } finally q.stop()
    } finally srv.close()
  }

  test("kill/resume across a checkpoint mid-interleave: exactly-once") {
    val srv = new MockMaxScaleServer(MockMaxScaleServer.Schema, interleaved(5))
    val ckpt = Files.createTempDirectory("dv_resume").toString
    try {
      val got = java.util.concurrent.ConcurrentHashMap.newKeySet[(Int, Int)]()
      val counts = new java.util.concurrent.ConcurrentHashMap[(Int, Int), Integer]()
      def start() = spark.readStream.format("maxscale-cdc")
        .option("host", "127.0.0.1").option("port", srv.port)
        .option("user", "u").option("password", "p")
        .option("table", "db.t").option("timeoutSeconds", 1)
        .option("domainMode", "vector")
        .load()
        .selectExpr("domain", "sequence")
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.as[(Int, Int)].collect().foreach { r =>
            got.add(r); counts.merge(r, 1, (a, b) => a + b)
          }
        }
        .start()
      val q1 = start()
      try {
        eventually(timeout(Span(30, Seconds)), interval(Span(1, Seconds))) {
          q1.processAllAvailable(); assert(got.size == 10)
        }
      } finally q1.stop()
      // new interleaved events while the query is DOWN — including a
      // lower-domain event after a higher-domain one
      srv.push(ev(1, 6, 206)); srv.push(ev(0, 6, 106))
      srv.push(ev(1, 7, 207)); srv.push(ev(0, 7, 107))
      val q2 = start()
      try {
        eventually(timeout(Span(30, Seconds)), interval(Span(1, Seconds))) {
          q2.processAllAvailable(); assert(got.size == 14)
        }
        assert((0 to 1).forall(d =>
          got.asScala.filter(_._1 == d).map(_._2).toSeq.sorted == (1 to 7)),
          got.asScala.toSeq.sorted.toString)
        // exactly-once, not just at-least-once: no row delivered twice
        assert(counts.values.asScala.forall(_ == 1),
          counts.asScala.filter(_._2 > 1).toString)
      } finally q2.stop()
    } finally srv.close()
  }

  test("bounded batch pull with a vector endGtid spans the interleave " +
      "with zero driver wire I/O and per-domain partitions") {
    val srv = new MockMaxScaleServer(MockMaxScaleServer.Schema, interleaved(6))
    try {
      val before = srv.requestCount("db.t")
      val df = spark.read.format("maxscale-cdc")
        .option("host", "127.0.0.1").option("port", srv.port)
        .option("user", "u").option("password", "p")
        .option("table", "db.t").option("timeoutSeconds", 1)
        .option("startingGtid", "v:0-1-2,1-2-3")
        .option("endGtid", "v:1-2-5,0-1-6")
        .option("endGtidObserved", "true")
        .load()
      val got = df.select("domain", "sequence").as[(Int, Int)].collect().toSeq
      // (d0: 3..6, d1: 4..5] — per-domain ranges, exactly once
      assert(got.sorted == Seq((0, 3), (0, 4), (0, 5), (0, 6), (1, 4), (1, 5)),
        got.sorted.toString)
      // bounded planning opened no driver probe beyond schema inference
      assert(srv.requestCount("db.t") == before + 1 + 2,
        "expected schema probe + one replay connection per domain")
    } finally srv.close()
  }

  test("bounded vector pull allocates connections span-proportionally: " +
      "a 99%-one-domain backlog does not hand half the budget to the " +
      "near-empty domain") {
    val srv = new MockMaxScaleServer(MockMaxScaleServer.Schema, Nil)
    try {
      val df = spark.read.format("maxscale-cdc")
        .option("host", "127.0.0.1").option("port", srv.port)
        .option("user", "u").option("password", "p")
        .option("table", "db.t").option("timeoutSeconds", 1)
        .option("endGtid", "v:0-1-1000000,1-2-10")
        .option("replayPartitions", 8)
        .load()
      // planning only (no execution): d0's 1M-sequence span should claim
      // ~the whole 8-connection budget (adaptiveN caps it at 7 =
      // span/131072), d1's 10-span floor gets 1 — the flat /nDomains
      // split would have planned 4 + 1 = 5 (ADVICE r10)
      assert(df.rdd.getNumPartitions == 8, df.rdd.getNumPartitions.toString)
    } finally srv.close()
  }

  test("connection-drop soak: an interleaved stream rides through " +
      "injected drops exactly-once (vectorHead resume + per-domain dedupe)") {
    // every dropped connection forces the tailer (or a replay reader) to
    // reconnect; the tailer re-requests from the VECTOR HEAD's log
    // position, which re-delivers events at-or-below the other domains'
    // watermarks — the per-domain floors must drop exactly the overlap.
    // Schedule entries all >=5: forward progress resets the reconnect
    // budget, so no reader can exhaust it.
    val n = 120
    val srv = new MockMaxScaleServer(MockMaxScaleServer.Schema,
      interleaved(n), dropSchedule = Seq(5, 9, 17, 23, 31, 41))
    try {
      val got = java.util.concurrent.ConcurrentHashMap.newKeySet[(Int, Int)]()
      val counts = new java.util.concurrent.ConcurrentHashMap[(Int, Int), Integer]()
      val q = spark.readStream.format("maxscale-cdc")
        .option("host", "127.0.0.1").option("port", srv.port)
        .option("user", "u").option("password", "p")
        .option("table", "db.t").option("timeoutSeconds", 1)
        .option("domainMode", "vector")
        .option("maxEventsPerBatch", 50)
        .option("replayPartitions", 3)
        .load()
        .selectExpr("domain", "sequence")
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.as[(Int, Int)].collect().foreach { r =>
            got.add(r); counts.merge(r, 1, (a, b) => a + b)
          }
        }
        .start()
      try {
        eventually(timeout(Span(60, Seconds)), interval(Span(1, Seconds))) {
          assert(q.exception.isEmpty, s"query failed: ${q.exception}")
          q.processAllAvailable()
          assert(got.size == 2 * n, s"delivered ${got.size} of ${2 * n}")
        }
        assert((0 to 1).forall(d =>
          got.asScala.filter(_._1 == d).map(_._2).toSeq.sorted == (1 to n)))
        assert(counts.values.asScala.forall(_ == 1),
          s"duplicates: ${counts.asScala.filter(_._2 > 1)}")
        assert(srv.dataConnCount > 6,
          "the drop schedule never fired — the soak tested nothing")
      } finally q.stop()
    } finally srv.close()
  }

  test("Trigger.AvailableNow drains exactly the pre-existing interleaved " +
      "backlog per domain and stops; a later run resumes past it") {
    val srv = new MockMaxScaleServer(MockMaxScaleServer.Schema, interleaved(8))
    val ckpt = Files.createTempDirectory("dv_availnow").toString
    try {
      val got = java.util.concurrent.ConcurrentHashMap.newKeySet[(Int, Int)]()
      def run(): Unit = {
        val q = spark.readStream.format("maxscale-cdc")
          .option("host", "127.0.0.1").option("port", srv.port)
          .option("user", "u").option("password", "p")
          .option("table", "db.t").option("timeoutSeconds", 1)
          .option("domainMode", "vector")
          .option("maxEventsPerBatch", 5) // several clamped batches
          .load()
          .selectExpr("domain", "sequence")
          .writeStream.option("checkpointLocation", ckpt)
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
            df.as[(Int, Int)].collect().foreach(got.add)
          }
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        assert(q.awaitTermination(60000), "AvailableNow did not terminate")
      }
      run()
      assert(got.size == 16, s"first drain delivered ${got.size}")
      // events arriving AFTER the first drain
      srv.push(ev(0, 9, 9)); srv.push(ev(1, 9, 109)); srv.push(ev(0, 10, 10))
      run()
      assert((0 to 1).forall(d => got.asScala.filter(_._1 == d).map(_._2)
        .toSeq.sorted == (1 to (if (d == 0) 10 else 9))),
        got.asScala.toSeq.sorted.toString)
    } finally srv.close()
  }

  test("runtime pushdown reaches a vector-mode stream (probe): predicate " +
      "+ referenced columns delivered, rows correct") {
    val srv = new MockMaxScaleServer(MockMaxScaleServer.Schema,
      Seq(ev(0, 1, 1), ev(1, 1, 101), ev(0, 2, 2), ev(1, 2, 102)))
    try {
      CdcPushdownProbe.lastRuntimeFilters = Nil
      CdcPushdownProbe.lastRuntimeReferenced = None
      val q = spark.readStream.format("maxscale-cdc")
        .option("host", "127.0.0.1").option("port", srv.port)
        .option("user", "u").option("password", "p")
        .option("table", "db.t").option("timeoutSeconds", 1)
        .option("domainMode", "vector")
        .load()
        .where("domain = 1")
        .select("sequence", "id")
        .writeStream.format("memory").queryName("dv_pushdown")
        .outputMode("append").start()
      try {
        eventually(timeout(Span(30, Seconds)), interval(Span(1, Seconds))) {
          q.processAllAvailable()
          assert(spark.table("dv_pushdown").count() == 2)
        }
        assert(CdcPushdownProbe.lastRuntimeFilters.exists(_.contains("domain")),
          s"expected domain in runtime-pushed filters: " +
            s"${CdcPushdownProbe.lastRuntimeFilters}")
        CdcPushdownProbe.lastRuntimeReferenced.foreach { refs =>
          assert(refs.contains("sequence") && refs.contains("id"), refs)
          assert(!refs.contains("name"), s"name is never read: $refs")
        }
      } finally q.stop()
    } finally srv.close()
  }

  test("CdcBootstrap refuses domainMode=vector at the API boundary") {
    val e = intercept[IllegalArgumentException] {
      CdcBootstrap.anchor(Map("host" -> "127.0.0.1", "port" -> "1",
        "user" -> "u", "password" -> "p", "table" -> "db.t",
        "domainMode" -> "vector"))
    }
    assert(e.getMessage.contains("single GTID"), e.getMessage)
  }

  test("replay-semantics self-check: a server that filters replay by " +
      "(domain, sequence) comparison instead of log position FAILS LOUDLY " +
      "on vector resume; the log-position mock passes the same resume") {
    // log: d0:1, d1:1, d0:2, d1:2, d0:3, d1:3 — resume vector with head
    // d1 (earliest last-arrival would be d0 live; here we hand the
    // tailer an explicit vector whose head is the d1 watermark, so the
    // d0 overlap events sit after it in the log)
    val log = interleaved(3)
    val vector = Seq(Gtid(1, 2, 2), Gtid(0, 1, 3))
    val fields = CdcClient.parseSchemaFields(
      new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(MockMaxScaleServer.Schema))
    // (1) misbehaving server: comparison-filtered replay never re-sends
    // domain 0 (0 < head's domain 1) — the tailer must detect the
    // missing overlap at first quiet and fail, naming the domain
    val bad = new MockMaxScaleServer(MockMaxScaleServer.Schema, log,
      gtidComparisonReplay = true)
    try {
      val t = new CdcTailer("127.0.0.1", bad.port, "u", "p", "db.t",
        fields, resumeAfter = None, timeoutMs = 1000, domainVector = true,
        resumeVector = vector)
      t.start()
      try {
        val e = eventually(timeout(Span(15, Seconds)), interval(Span(1, Seconds))) {
          intercept[CdcProtocolException] { t.checkFatal() }
        }
        assert(e.getMessage.contains("self-check failed"), e.getMessage)
        assert(e.getMessage.contains("NOT replaying by log position"), e.getMessage)
        assert(e.getMessage.contains("0"), e.getMessage)
      } finally t.shutdown()
    } finally bad.close()
    // (2) the honest log-position server passes the identical resume:
    // overlap re-delivered and deduped, only the pending suffix surfaces
    val good = new MockMaxScaleServer(MockMaxScaleServer.Schema, log)
    try {
      val t = new CdcTailer("127.0.0.1", good.port, "u", "p", "db.t",
        fields, resumeAfter = None, timeoutMs = 1000, domainVector = true,
        resumeVector = vector)
      t.start()
      try {
        eventually(timeout(Span(15, Seconds)), interval(Span(1, Seconds))) {
          t.checkFatal()
          // past the vector: d1:3 only (d0:3 is AT its watermark)
          assert(t.bufferedCount == 1, t.vectorSnapshot.toString)
        }
        t.checkFatal()
      } finally t.shutdown()
    } finally good.close()
  }

  // ------------------------------------------- domainMode=vector × tables=

  test("MultiVectorOffset: one-line json round-trip; per-table vectors " +
      "keep their own arrival order; absent table = stream start") {
    val mv = MultiVectorOffset(Seq(
      "db.a" -> DomainVectorOffset(Seq(Gtid(1, 2, 5), Gtid(0, 1, 9))),
      "db.b" -> DomainVectorOffset.Start))
    assert(mv.json() == "db.a=v:1-2-5,0-1-9;db.b=v:-")
    assert(MultiVectorOffset.fromJson(mv.json()) == mv)
    assert(mv.of("db.a").entries == Seq(Gtid(1, 2, 5), Gtid(0, 1, 9)))
    assert(mv.of("db.nope") == DomainVectorOffset.Start)
    assert(!mv.json().contains('\n'))
  }

  test("vector x tables: two shards, each an interleaved two-domain log — " +
      "one query, _table provenance, every (table, domain) complete") {
    val n = 8
    val schemas = Map("db.a" -> MockMaxScaleServer.Schema,
      "db.b" -> MockMaxScaleServer.Schema)
    val srv = new MockMaxScaleServer(MockMaxScaleServer.Schema, Nil,
      tableSchemas = schemas)
    try {
      interleaved(n).foreach(e => srv.pushTo("db.a", e))
      interleaved(n).foreach(e => srv.pushTo("db.b", e))
      val q = spark.readStream.format("maxscale-cdc")
        .option("host", "127.0.0.1").option("port", srv.port)
        .option("user", "u").option("password", "p")
        .option("tables", "db.a,db.b").option("timeoutSeconds", 1)
        .option("domainMode", "vector")
        .load()
        .selectExpr("_table", "domain", "sequence")
        .writeStream.format("memory").queryName("mv_e2e")
        .outputMode("append").start()
      try {
        eventually(timeout(Span(30, Seconds)), interval(Span(1, Seconds))) {
          q.processAllAvailable()
          assert(spark.table("mv_e2e").count() == 4L * n)
        }
        // live interleaved pushes on both shards keep flowing
        srv.pushTo("db.a", ev(1, n + 1, 901)); srv.pushTo("db.b", ev(0, n + 1, 902))
        eventually(timeout(Span(30, Seconds)), interval(Span(1, Seconds))) {
          q.processAllAvailable()
          assert(spark.table("mv_e2e").count() == 4L * n + 2)
        }
        val got = spark.table("mv_e2e").as[(String, Int, Int)].collect().toSeq
        assert(got.size == got.distinct.size, "duplicates delivered")
        for (t <- Seq("db.a", "db.b"); d <- 0 to 1) {
          val want = if (t == "db.a" && d == 1 || t == "db.b" && d == 0)
            (1 to n + 1) else (1 to n)
          assert(got.filter(r => r._1 == t && r._2 == d).map(_._3).sorted == want,
            s"$t domain $d incomplete")
        }
      } finally q.stop()
    } finally srv.close()
  }

  test("vector x tables: kill/resume across a checkpoint — per-table AND " +
      "per-domain watermarks both resume, exactly-once") {
    val schemas = Map("db.a" -> MockMaxScaleServer.Schema,
      "db.b" -> MockMaxScaleServer.Schema)
    val srv = new MockMaxScaleServer(MockMaxScaleServer.Schema, Nil,
      tableSchemas = schemas)
    val ckpt = Files.createTempDirectory("mv_resume").toString
    try {
      interleaved(4).foreach(e => srv.pushTo("db.a", e))
      interleaved(4).foreach(e => srv.pushTo("db.b", e))
      val got = java.util.concurrent.ConcurrentHashMap.newKeySet[(String, Int, Int)]()
      val counts = new java.util.concurrent.ConcurrentHashMap[(String, Int, Int), Integer]()
      def start() = spark.readStream.format("maxscale-cdc")
        .option("host", "127.0.0.1").option("port", srv.port)
        .option("user", "u").option("password", "p")
        .option("tables", "db.a,db.b").option("timeoutSeconds", 1)
        .option("domainMode", "vector")
        .load()
        .selectExpr("_table", "domain", "sequence")
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.as[(String, Int, Int)].collect().foreach { r =>
            got.add(r); counts.merge(r, 1, (a, b) => a + b)
          }
        }
        .start()
      val q1 = start()
      try {
        eventually(timeout(Span(30, Seconds)), interval(Span(1, Seconds))) {
          q1.processAllAvailable(); assert(got.size == 16)
        }
      } finally q1.stop()
      // while DOWN: each shard gets an interleave with a LOWER-domain
      // event after a higher-domain one — the shape a single-triple
      // resume would lose; db.b additionally runs one domain ahead so
      // the per-table vectors diverge and a shared watermark would skip
      srv.pushTo("db.a", ev(1, 5, 915)); srv.pushTo("db.a", ev(0, 5, 905))
      srv.pushTo("db.b", ev(1, 5, 925)); srv.pushTo("db.b", ev(1, 6, 926))
      srv.pushTo("db.b", ev(0, 5, 906))
      val q2 = start()
      try {
        eventually(timeout(Span(30, Seconds)), interval(Span(1, Seconds))) {
          q2.processAllAvailable(); assert(got.size == 21)
        }
        assert(got.asScala.filter(r => r._1 == "db.a" && r._2 == 0)
          .map(_._3).toSeq.sorted == (1 to 5))
        assert(got.asScala.filter(r => r._1 == "db.a" && r._2 == 1)
          .map(_._3).toSeq.sorted == (1 to 5))
        assert(got.asScala.filter(r => r._1 == "db.b" && r._2 == 0)
          .map(_._3).toSeq.sorted == (1 to 5))
        assert(got.asScala.filter(r => r._1 == "db.b" && r._2 == 1)
          .map(_._3).toSeq.sorted == (1 to 6))
        // exactly-once, not just at-least-once: no row delivered twice
        assert(counts.values.asScala.forall(_ == 1),
          counts.asScala.filter(_._2 > 1).toString)
        // the composite checkpoint kept per-table watermark scopes
        // (under the source's scoped dir, e.g. <ckpt>/sources/0/table-*)
        val tableDirs = java.nio.file.Files.walk(java.nio.file.Paths.get(ckpt))
          .filter(p => p.getFileName.toString.startsWith("table-"))
          .count()
        assert(tableDirs == 2, s"expected 2 per-table watermark scopes, got $tableDirs")
      } finally q2.stop()
    } finally srv.close()
  }

  test("vector x normalized: a heterogeneous multi-master database — two " +
      "different-schema tables, each an interleaved two-domain log, one " +
      "normalized stream; kill/resume exactly-once") {
    // db.a: (id, name); db.b: (bid, name) — a union schema cannot exist,
    // so this is the composition the r10 verdict called the realistic
    // production shape (multi-master deployment of a whole database)
    val schemaB = MockMaxScaleServer.Schema.replace("\"name\":\"id\"", "\"name\":\"bid\"")
    def evB(domain: Long, seq: Long, bid: Int): String =
      s"""{"domain":$domain,"server_id":${domain + 1},"sequence":$seq,""" +
        s""""event_number":1,"timestamp":${1700000000 + seq},""" +
        s""""event_type":"insert","bid":$bid,"name":"m$domain-$seq"}"""
    val srv = new MockMaxScaleServer(MockMaxScaleServer.Schema,
      tableSchemas = Map("db.a" -> MockMaxScaleServer.Schema, "db.b" -> schemaB))
    val ckpt = Files.createTempDirectory("mvn_resume").toString
    try {
      val n = 4
      interleaved(n).foreach(e => srv.pushTo("db.a", e))
      (1 to n).foreach { i =>
        srv.pushTo("db.b", evB(0, i, i)); srv.pushTo("db.b", evB(1, i, 100 + i))
      }
      val got = java.util.concurrent.ConcurrentHashMap
        .newKeySet[(String, Int, Int, String)]()
      val counts = new java.util.concurrent.ConcurrentHashMap[(String, Int, Int, String), Integer]()
      // full normalized rows (all six meta columns + payload) for the
      // typed-view assertion below
      val full = java.util.concurrent.ConcurrentHashMap
        .newKeySet[(String, Int, Int, Int, Int, Int, String, String)]()
      def start() = spark.readStream.format("maxscale-cdc")
        .option("host", "127.0.0.1").option("port", srv.port)
        .option("user", "u").option("password", "p")
        .option("tables", "db.a,db.b")
        .option("schemaMode", "normalized")
        .option("domainMode", "vector")
        .option("timeoutSeconds", 1)
        .load()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.select("_table", "domain", "sequence", "payload")
            .as[(String, Int, Int, String)].collect().foreach { r =>
            got.add(r); counts.merge(r, 1, (a, b) => a + b)
          }
          df.select("_table", "domain", "server_id", "sequence",
              "event_number", "timestamp", "event_type", "payload")
            .as[(String, Int, Int, Int, Int, Int, String, String)]
            .collect().foreach(full.add)
          ()
        }
        .start()
      val q1 = start()
      try {
        eventually(timeout(Span(30, Seconds)), interval(Span(1, Seconds))) {
          q1.processAllAvailable(); assert(got.size == 4 * n)
        }
        // payload routed per table: db.b rows carry bid, not id
        assert(got.asScala.filter(_._1 == "db.b").forall(_._4.contains("\"bid\"")))
        assert(got.asScala.filter(_._1 == "db.a").forall(_._4.contains("\"id\"")))
      } finally q1.stop()
      // while DOWN: per-shard interleaves with a lower-domain event
      // after a higher-domain one — the single-triple-resume loss shape
      srv.pushTo("db.a", ev(1, n + 1, 911)); srv.pushTo("db.a", ev(0, n + 1, 901))
      srv.pushTo("db.b", evB(1, n + 1, 921)); srv.pushTo("db.b", evB(0, n + 1, 902))
      val q2 = start()
      try {
        eventually(timeout(Span(30, Seconds)), interval(Span(1, Seconds))) {
          q2.processAllAvailable(); assert(got.size == 4 * n + 4)
        }
        for (t <- Seq("db.a", "db.b"); d <- 0 to 1)
          assert(got.asScala.filter(r => r._1 == t && r._2 == d)
            .map(_._3).toSeq.sorted == (1 to n + 1), s"$t domain $d")
        assert(counts.values.asScala.forall(_ == 1),
          counts.asScala.filter(_._2 > 1).toString)
      } finally q2.stop()

      // per-table AND per-domain watermarks RESUMED: the last committed
      // composite offset holds BOTH tables, each with BOTH domain floors
      // at sequence n+1 — structural proof that the kill/resume advanced
      // every watermark (row-level exactly-once above could also pass by
      // accident of replay dedup; this cannot)
      val lastOff = new java.io.File(s"$ckpt/offsets").listFiles()
        .filter(_.getName.forall(_.isDigit)).maxBy(_.getName.toLong)
      val offLine = {
        val src = scala.io.Source.fromFile(lastOff)
        try src.getLines().find(_.contains("=v:")).get finally src.close()
      }
      val mv = MultiVectorOffset.fromJson(offLine)
      for (tb <- Seq("db.a", "db.b"); d <- 0L to 1L)
        assert(mv.of(tb).of(d).exists(_.sequence == n + 1),
          s"watermark not at head for $tb domain $d: ${mv.of(tb)}")

      // payload typed views green: the per-table typed projection parses
      // every routed payload — ids/bids typed INT with the generators'
      // exact values, names non-null, across both domains and the resume
      val rowsDf = full.asScala.toSeq.toDF("_table", "domain", "server_id",
        "sequence", "event_number", "timestamp", "event_type", "payload")
      val meta = Seq(CdcField("domain", "int"), CdcField("server_id", "int"),
        CdcField("sequence", "int"), CdcField("event_number", "int"),
        CdcField("timestamp", "int"), CdcField("event_type", "varchar(32)"))
      val ta = NormalizedCdc.typedView(rowsDf, "db.a",
        meta ++ Seq(CdcField("id", "int"), CdcField("name", "varchar(64)")))
      val tb = NormalizedCdc.typedView(rowsDf, "db.b",
        meta ++ Seq(CdcField("bid", "int"), CdcField("name", "varchar(64)")))
      assert(ta.schema("id").dataType == org.apache.spark.sql.types.IntegerType)
      val aRows = ta.select("domain", "sequence", "id", "name")
        .as[(Int, Int, Int, String)].collect()
      val bRows = tb.select("domain", "sequence", "bid", "name")
        .as[(Int, Int, Int, String)].collect()
      assert(aRows.length == 2 * (n + 1) && bRows.length == 2 * (n + 1))
      assert(aRows.forall(r => r._4 != null && r._4.nonEmpty))
      assert(aRows.map(_._3).toSet ==
        ((1 to n).toSet ++ (101 to 100 + n).toSet + 901 + 911),
        aRows.map(_._3).toSeq.sorted.toString)
      assert(bRows.map(_._3).toSet ==
        ((1 to n).toSet ++ (101 to 100 + n).toSet + 902 + 921),
        bRows.map(_._3).toSeq.sorted.toString)
    } finally {
      srv.close()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ckpt))
    }
  }

  test("single-domain semantics unchanged: the default mode still fails " +
      "fast on an order-breaking interleave") {
    val srv = new MockMaxScaleServer(MockMaxScaleServer.Schema,
      Seq(ev(1, 1, 1), ev(0, 1, 2)))
    try {
      val q = spark.readStream.format("maxscale-cdc")
        .option("host", "127.0.0.1").option("port", srv.port)
        .option("user", "u").option("password", "p")
        .option("table", "db.t").option("timeoutSeconds", 1)
        .load()
        .writeStream.format("memory").queryName("dv_single")
        .outputMode("append").start()
      try {
        val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
          q.processAllAvailable()
        }
        assert(e.getMessage.contains("interleaved replication domains") ||
          Option(e.getCause).exists(_.getMessage
            .contains("interleaved replication domains")), e.getMessage)
      } finally q.stop()
    } finally srv.close()
  }

}
