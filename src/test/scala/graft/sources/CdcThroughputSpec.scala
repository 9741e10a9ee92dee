package graft.sources

import graft.api.CdcConnection
import graft.sources.cdc._
import org.scalatest.funsuite.AnyFunSuite

import MockMaxScaleServer.{Schema, event}

/** Wire throughput of the protocol client and the facade loop — the
  * reference's only performance surface is rows/s through the socket
  * (BASELINE.md: no published numbers; this records ours). Floors are
  * deliberately conservative (shared box) — the test's value is catching
  * an accidental 100x regression (per-byte reads, quadratic buffering),
  * not micro-benchmarking. */
class CdcThroughputSpec extends AnyFunSuite {

  private val N = 50000

  test(s"client decodes $N events at production rate") {
    val events = (1L to N).map(i => event(i, "insert", (i % 1000).toInt, s"name_$i"))
    val srv = new MockMaxScaleServer(Schema, events)
    try {
      val c = new CdcClient("127.0.0.1", srv.port, "u", "p", 5000)
      c.connect()
      c.requestData("db.t", None)
      assert(c.readMessage().isInstanceOf[CdcSchemaMsg])
      val t0 = System.nanoTime()
      var n = 0
      var last = 0L
      while (n < N) {
        c.readMessage() match {
          case r: CdcRowMsg => n += 1; last = r.values(2).toLong
          case CdcTimeout   => ()
          case other        => fail(s"unexpected $other")
        }
      }
      val secs = (System.nanoTime() - t0) / 1e9
      val rate = N / secs
      info(f"client rate: $rate%.0f rows/s over $N rows")
      assert(last == N)
      assert(rate > 5000, f"suspiciously slow wire decode: $rate%.0f rows/s")
      c.close()
    } finally srv.close()
  }

  test(s"executor replay reader sustains wire rate over a $N-event range") {
    // ingest is no longer bounded by driver serialization: the reader
    // pulls its GTID range straight off the server socket
    val events = (1L to N).map(i => event(i, "insert", (i % 1000).toInt, s"name_$i"))
    val srv = new MockMaxScaleServer(Schema, events)
    try {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val fields = CdcClient.parseSchemaFields(mapper.readTree(Schema))
      val dts = SqlTypes.toStructType(fields, typed = true).fields.map(_.dataType)
      val part = CdcReplayPartition("127.0.0.1", srv.port, "u", "p", "db.t",
        fields, startExclusive = None, endInclusive = s"0-1-$N", timeoutMs = 5000)
      val r = new CdcReplayReader(part, dts, typed = true)
      val t0 = System.nanoTime()
      var n = 0
      var lastSeq = 0
      try while (r.next()) { n += 1; lastSeq = r.get().getInt(2) }
      finally r.close()
      val rate = n / ((System.nanoTime() - t0) / 1e9)
      info(f"replay reader rate: $rate%.0f rows/s over $n rows")
      assert(n == N && lastSeq == N)
      assert(rate > 5000, f"suspiciously slow replay ingest: $rate%.0f rows/s")
    } finally srv.close()
  }

  test(s"filtered replay sustains the wire floor: the pushed predicate " +
      "skips decode, so selective filters must not slow the hot loop") {
    // 90% of events fail the predicate — the pushdown sweet spot. The
    // assertion is the SAME 5000 rows/s floor over WIRE rows (not emitted
    // rows): filtering adds a string compare per row but removes the
    // typed cast + row allocation for the 90%, so anything below the
    // unfiltered floor means the predicate went quadratic or similar.
    val events = (1L to N).map(i =>
      event(i, if (i % 10 == 0) "insert" else "update_after",
        (i % 1000).toInt, s"name_$i"))
    val srv = new MockMaxScaleServer(Schema, events)
    try {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val fields = CdcClient.parseSchemaFields(mapper.readTree(Schema))
      val schema = SqlTypes.toStructType(fields, typed = true)
      val dts = schema.fields.map(_.dataType)
      val pred = CdcWireFilters.compileAll(
        Seq(org.apache.spark.sql.sources.EqualTo("event_type", "insert")),
        schema, typed = true)
      val part = CdcReplayPartition("127.0.0.1", srv.port, "u", "p", "db.t",
        fields, startExclusive = None, endInclusive = s"0-1-$N", timeoutMs = 5000)
      val r = new CdcReplayReader(part, dts, typed = true, pred = pred)
      val t0 = System.nanoTime()
      var n = 0
      try while (r.next()) n += 1
      finally r.close()
      val wireRate = N / ((System.nanoTime() - t0) / 1e9)
      info(f"filtered replay wire rate: $wireRate%.0f rows/s " +
        f"($n emitted of $N wire rows)")
      assert(n == N / 10)
      assert(wireRate > 5000,
        f"filtered path slower than the unfiltered floor: $wireRate%.0f rows/s")
    } finally srv.close()
  }

  test(s"2-partition parallel replay: aggregate ingest at >=1.5x the single floor") {
    // replayPartitions > 1 shards a batch into disjoint contiguous GTID
    // subranges, one server connection per task. Ordering semantics: rows
    // WITHIN a partition are strictly GTID-ordered (asserted below);
    // across partitions order is unspecified — callers needing the total
    // changelog order keep replayPartitions=1 or sort downstream.
    val events = (1L to N).map(i => event(i, "insert", (i % 1000).toInt, s"name_$i"))
    val srv = new MockMaxScaleServer(Schema, events)
    try {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val fields = CdcClient.parseSchemaFields(mapper.readTree(Schema))
      val dts = SqlTypes.toStructType(fields, typed = true).fields.map(_.dataType)
      val mid = N / 2
      val parts = Seq(
        CdcReplayPartition("127.0.0.1", srv.port, "u", "p", "db.t",
          fields, startExclusive = None, endInclusive = s"0-1-$mid", timeoutMs = 5000),
        CdcReplayPartition("127.0.0.1", srv.port, "u", "p", "db.t",
          fields, startExclusive = Some(s"0-1-$mid"), endInclusive = s"0-1-$N",
          timeoutMs = 5000))
      val results = parts.map(_ => new java.util.concurrent.atomic.AtomicReference[Seq[Int]])
      val t0 = System.nanoTime()
      val threads = parts.zip(results).map { case (p, slot) =>
        val th = new Thread(() => {
          val r = new CdcReplayReader(p, dts, typed = true)
          val seqs = Seq.newBuilder[Int]
          try while (r.next()) seqs += r.get().getInt(2)
          finally r.close()
          slot.set(seqs.result())
        })
        th.start(); th
      }
      threads.foreach(_.join(120000))
      val wallSecs = (System.nanoTime() - t0) / 1e9
      val halves = results.map(_.get())
      assert(halves.forall(_ != null), "a replay thread did not finish")
      // per-partition total GTID order, disjoint coverage, nothing lost
      halves.foreach(h => assert(h == h.sorted, "partition rows out of GTID order"))
      assert(halves(0) == (1 to mid) && halves(1) == (mid + 1 to N))
      val aggregate = N / wallSecs
      info(f"2-partition aggregate replay rate: $aggregate%.0f rows/s over $N rows")
      // the single-reader test floors at 5000 rows/s; parallel subranges
      // must beat 1.5x that floor or sharding isn't buying throughput
      assert(aggregate > 7500, f"parallel replay not scaling: $aggregate%.0f rows/s")
    } finally srv.close()
  }

  test("deep catch-up: splitRanges' arithmetic fallback drains a planted " +
      "backlog FASTER in parallel than one connection (the r8 split's " +
      "measured win)") {
    // the deep-lag shape: the tailer's positions buffer does not cover
    // the logged range (here: not started at all), so splitRanges falls
    // back to sequence-arithmetic cuts — one replay connection per
    // subrange must then beat the serial drain
    val M = 60000
    val events = (1L to M.toLong).map(i =>
      event(i, "insert", (i % 1000).toInt, s"name_$i"))
    val srv = new MockMaxScaleServer(Schema, events)
    try {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val fields = CdcClient.parseSchemaFields(mapper.readTree(Schema))
      val dts = SqlTypes.toStructType(fields, typed = true).fields.map(_.dataType)
      def drain(partitions: Int): Double = {
        val tailer = new CdcTailer("127.0.0.1", srv.port, "u", "p", "db.t",
          fields, resumeAfter = None, timeoutMs = 5000)
        // the small-backlog pin (VERDICT r9 #1): with the DEFAULT span
        // threshold this backlog plans ONE serial connection — the r9
        // bench measured a flat 8-way split losing 0.59x to serial here
        assert(tailer.splitRanges(None, Gtid(0, 1, M.toLong), partitions)
          .size == 1, "default threshold must keep a shallow backlog serial")
        val before = CdcSplitProbe.arithmeticFallbacks
        // spanPerConnection=1: pin the parallel-cut MACHINERY at fixture
        // scale (the default 2^17 threshold correctly keeps a 60k span
        // serial — AdaptiveSplitSpec pins that policy)
        val ranges = tailer.splitRanges(None, Gtid(0, 1, M.toLong), partitions,
          spanPerConnection = 1L)
        if (partitions > 1)
          assert(CdcSplitProbe.arithmeticFallbacks == before + 1 &&
            ranges.size == partitions, s"expected the fallback: $ranges")
        val counts = ranges.map(_ => new java.util.concurrent.atomic.AtomicLong)
        val t0 = System.nanoTime()
        val threads = ranges.zip(counts).map { case ((lo, hi), slot) =>
          val th = new Thread(() => {
            val r = new CdcReplayReader(
              CdcReplayPartition("127.0.0.1", srv.port, "u", "p", "db.t",
                fields, lo.map(_.toString), hi.toString, timeoutMs = 5000),
              dts, typed = true)
            try while (r.next()) slot.incrementAndGet()
            finally r.close()
          })
          th.start(); th
        }
        threads.foreach(_.join(120000))
        val secs = (System.nanoTime() - t0) / 1e9
        assert(counts.map(_.get).sum == M,
          s"catch-up drain lost rows: ${counts.map(_.get)}")
        M / secs
      }
      val serial = drain(1)
      val parallel = drain(4)
      info(f"catch-up drain: serial $serial%.0f rows/s, " +
        f"4-way $parallel%.0f rows/s (${parallel / serial}%.2fx)")
      // conservative floor (shared box; ~5x observed on a quiet one): the
      // regression this guards is the split silently collapsing to serial
      // (or cuts overlapping/stalling)
      assert(parallel > serial * 1.5,
        f"parallel catch-up not beating one connection: " +
          f"$parallel%.0f vs $serial%.0f rows/s")
    } finally srv.close()
  }

  test("facade consumer loop sustains the same order of magnitude") {
    val M = 20000
    val events = (1L to M.toLong).map(i => event(i, "insert", (i % 100).toInt, s"n$i"))
    val srv = new MockMaxScaleServer(Schema, events)
    try {
      val c = new CdcConnection("127.0.0.1", srv.port, "u", "p", 5)
      assert(c.connect("db.t"))
      val t0 = System.nanoTime()
      var n = 0
      var r = c.read()
      while (r.isDefined && n < M) { n += 1; if (n < M) r = c.read() }
      val rate = n / ((System.nanoTime() - t0) / 1e9)
      info(f"facade rate: $rate%.0f rows/s over $n rows")
      assert(n == M)
      assert(rate > 2000, f"suspiciously slow facade loop: $rate%.0f rows/s")
      c.close()
    } finally srv.close()
  }
}
