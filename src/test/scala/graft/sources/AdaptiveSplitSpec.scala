package graft.sources

import graft.sources.cdc._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the BACKLOG-AWARE catch-up split policy (VERDICT r9 #1).
  *
  * A fabricated-cut catch-up pays a fixed per-connection protocol setup
  * cost (TCP + auth + REGISTER + inclusive-replay overshoot), so a flat
  * N-way split LOSES to one serial drain on a shallow backlog — the r9
  * local bench measured an 8-way drain of a 100k-event backlog at 623k
  * rows/s vs 1,054k rows/s serial. [[GtidRangeCuts.adaptiveN]] therefore
  * scales the connection count with the range's sequence span: serial
  * below one `spanPerConnection` (default 2^17), one extra connection per
  * additional span unit, capped at the caller's `replayPartitions`.
  *
  * These tests pin the POLICY (plan shapes, zero wire I/O); the measured
  * crossover itself is captured per-round by Bench's catchup_rows_per_sec
  * / catchup_1m_rows_per_sec pairs, and the parallel-cut machinery is
  * exercised at fixture scale by the specs that pass spanPerConnection=1
  * (CdcThroughputSpec, CdcSourceSpec, CdcBatchSpec, MultiDomainGtidSpec).
  */
class AdaptiveSplitSpec extends AnyFunSuite {

  private val maxN = 8

  test("shallow spans stay SERIAL at the default threshold (the measured " +
      "r9 regression: 8-way lost 0.59x to serial on a 100k backlog)") {
    assert(GtidRangeCuts.adaptiveN(None, Gtid(0, 1, 100000), maxN) == 1)
    assert(GtidRangeCuts.adaptiveN(
      Some(Gtid(0, 1, 500000)), Gtid(0, 1, 600000), maxN) == 1)
    // exactly at the threshold: one connection (need > span for two)
    assert(GtidRangeCuts.adaptiveN(
      None, Gtid(0, 1, GtidRangeCuts.DefaultSpanPerConnection), maxN) == 1)
  }

  test("deep spans fan out with the backlog and cap at maxN") {
    // 1M span → 7 connections (1e6 / 2^17 = 7.6 → 7)
    assert(GtidRangeCuts.adaptiveN(None, Gtid(0, 1, 1000000), maxN) == 7)
    // 10M span → capped at the caller's replayPartitions
    assert(GtidRangeCuts.adaptiveN(None, Gtid(0, 1, 10000000), maxN) == maxN)
    // the span is relative to the start, not absolute sequence magnitude
    assert(GtidRangeCuts.adaptiveN(
      Some(Gtid(0, 1, 9900000)), Gtid(0, 1, 10000000), maxN) == 1)
  }

  test("cross-domain ranges have no span arithmetic: serial, matching " +
      "sequenceCuts' domain guard") {
    assert(GtidRangeCuts.adaptiveN(
      Some(Gtid(0, 1, 1)), Gtid(1, 2, 10000000), maxN) == 1)
  }

  test("spanPerConnection=1 restores the full requested fan-out (the " +
      "fixture-scale escape hatch the machinery specs use)") {
    assert(GtidRangeCuts.adaptiveN(None, Gtid(0, 1, 100), maxN, 1L) == maxN)
  }

  test("splitRanges' arithmetic fallback is adaptive end-to-end: an " +
      "un-started tailer plans a 100k catch-up serially, a 1M one 7-way") {
    val fields = Seq(CdcField("domain", "int"), CdcField("server_id", "int"),
      CdcField("sequence", "int"), CdcField("id", "int"))
    val t = new CdcTailer("127.0.0.1", 1, "u", "p", "db.t", fields,
      resumeAfter = None, timeoutMs = 1000)
    val shallow = t.splitRanges(None, Gtid(0, 1, 100000), maxN)
    assert(shallow == Seq((None, Gtid(0, 1, 100000))), shallow.toString)
    val deep = t.splitRanges(None, Gtid(0, 1, 1000000), maxN)
    assert(deep.size == 7, deep.toString)
    // disjoint and covering, like every fallback plan
    assert(deep.head._1.isEmpty && deep.last._2 == Gtid(0, 1, 1000000))
    deep.sliding(2).foreach { case Seq(a, b) => assert(b._1.contains(a._2)) }
  }

  test("the bounded batch planner takes the same policy (fabricated cuts " +
      "pay the same setup cost)") {
    // directly through the shared arithmetic: CdcBatch.planBounded feeds
    // adaptiveN(start, end, replayPartitions, catchupSpanPerConnection)
    val cuts = GtidRangeCuts.sequenceCuts(None, Gtid(0, 1, 1000),
      GtidRangeCuts.adaptiveN(None, Gtid(0, 1, 1000), 4))
    assert(cuts == Seq((None, Gtid(0, 1, 1000))), cuts.toString)
  }
}
