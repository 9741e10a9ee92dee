package graft

import org.apache.spark.sql.functions._
import graft.operators.{Aggregates, Cdc, TrainPrep, Windows}

/** Invariants for the CDC-materialization and stats queries; exact values
  * are pinned by the DuckDB oracle at sf0.01, these pin the semantics. */
class CdcMaterializeSpec extends SparkSpec {
  import spark.implicits._

  test("q_scd2 intervals chain per key with exactly one open current row") {
    val rows = Cdc.qScd2.build(spark, sf)
      .select("user_id", "valid_from_us", "valid_to_us", "is_current")
      .as[(Long, Long, Option[Long], Int)].collect()
      .groupBy(_._1)

    rows.foreach { case (uid, history) =>
      // one open (NULL valid_to) version per key, flagged current
      val open = history.filter(_._3.isEmpty)
      assert(open.length == 1, s"user $uid: ${open.length} open intervals")
      assert(open.head._4 == 1 && history.count(_._4 == 1) == 1)
      // intervals chain: row i's valid_to == row i+1's valid_from
      val sorted = history.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3.contains(b._2),
            s"user $uid: interval gap ${a._3} -> ${b._2}")
        case _ => ()
      }
    }
  }

  test("q_cdc_merge (base+delta IVM) equals full recompaction") {
    // The point of the merge shape: applying the delta to the compacted
    // base must be indistinguishable from recompacting the whole log.
    val merged = Cdc.qCdcMerge.build(spark, sf)
      .select($"user_id", $"last_event_id", $"last_value")
    val full = Cdc.qCdcSnapshot.build(spark, sf)
      .select($"user_id", $"last_event_id", $"last_value")
    assert(merged.exceptAll(full).isEmpty && full.exceptAll(merged).isEmpty)
  }

  test("q_cdc_merge src column marks exactly the users seen in the delta") {
    val out = Cdc.qCdcMerge.build(spark, sf)
    val bySrc = out.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(bySrc.keySet.subsetOf(Set("base", "delta")))
    // every user appears exactly once
    assert(out.count() == out.select("user_id").distinct().count())
  }

  test("q_sample_stratified keeps ~12.5% of en and ~50% of the rest") {
    val totals = Tables.documents(spark, sf)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val kept = TrainPrep.qSampleStratified.build(spark, sf)
      .select("lang", "n_kept").as[(String, Long)].collect().toMap
    kept.foreach { case (lang, n) =>
      val rate = n.toDouble / totals(lang)
      val want = if (lang == "en") 0.125 else 0.5
      assert(math.abs(rate - want) < 0.15,
        s"$lang kept $n/${totals(lang)} = $rate, want ~$want")
    }
  }

  test("q_agg_stats matches Spark's var_pop/stddev_pop to 1e-6") {
    val ours = Aggregates.qAggStats.build(spark, sf)
      .select("l_returnflag", "var_pop", "stddev_pop")
      .as[(String, Double, Double)].collect()
      .map { case (f, v, d) => f -> (v, d) }.toMap
    val ref = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(var_pop("l_quantity").as("v"), stddev_pop("l_quantity").as("d"))
      .as[(String, Double, Double)].collect()
    ref.foreach { case (f, v, d) =>
      assert(math.abs(ours(f)._1 - v) < 1e-6, s"$f var: ${ours(f)._1} vs $v")
      assert(math.abs(ours(f)._2 - d) < 1e-6, s"$f stddev: ${ours(f)._2} vs $d")
    }
  }

  test("q_win_cume: ranks in [0,1], cume_dist monotone in balance order") {
    val out = Windows.qWinCume.build(spark, sf)
      .select("s_nationkey", "s_suppkey", "pr", "cd")
      .as[(Long, Long, Double, Double)].collect()
    assert(out.forall(r => r._3 >= 0.0 && r._3 <= 1.0))
    assert(out.forall(r => r._4 > 0.0 && r._4 <= 1.0))
    // per nation: max cume_dist is exactly 1, min percent_rank exactly 0
    out.groupBy(_._1).foreach { case (_, g) =>
      assert(g.map(_._4).max == 1.0 && g.map(_._3).min == 0.0)
    }
  }
}
