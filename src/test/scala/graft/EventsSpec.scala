package graft

import org.apache.spark.sql.functions._

/** Invariants for the event-analytics pack (exact values are pinned by the
  * DuckDB oracle at sf0.01; these specs assert the semantics that make the
  * queries meaningful). */
class EventsSpec extends SparkSpec {

  test("q_funnel stages shrink monotonically and stage 1 counts first-viewers") {
    val rows = graft.operators.Events.qFunnel.build(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    val counts = rows.map(_.getLong(2))
    assert(counts(0) >= counts(1) && counts(1) >= counts(2),
      s"funnel must shrink: ${counts.toSeq}")
    val viewers = Tables.events(spark, sf)
      .filter(col("event_type") === "view").select("user_id").distinct().count()
    assert(counts(0) == viewers)
  }

  test("q_retention offset-0 row equals the cohort's full population") {
    val ret = graft.operators.Events.qRetention.build(spark, sf)
    val atZero = ret.filter(col("offset_days") === 0)
      .agg(sum("active_users")).head.getLong(0)
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    // every user is active on their own cohort day by definition
    assert(atZero == users, s"offset-0 total $atZero != $users users")
    // no cell can exceed its cohort's size
    val cohortSizes = ret.filter(col("offset_days") === 0)
      .select(col("cohort"), col("active_users").as("size"))
    val bad = ret.join(cohortSizes, "cohort")
      .filter(col("active_users") > col("size")).count()
    assert(bad == 0)
  }

  test("q_gap_fill emits a contiguous day range whose counts sum to the user's events") {
    val gf = graft.operators.Events.qGapFill.build(spark, sf).cache()
    val spans = gf.groupBy("user_id").agg(
      count(lit(1)).as("n_days"),
      (datediff(max("d"), min("d")) + 1).as("span"),
      sum("cnt").as("total"))
    assert(spans.filter(col("n_days") =!= col("span")).count() == 0,
      "day range must be gap-free")
    val truth = Tables.events(spark, sf).filter(col("user_id") < 25)
      .groupBy("user_id").agg(count(lit(1)).as("expect"))
    assert(spans.join(truth, "user_id")
      .filter(col("total") =!= col("expect")).count() == 0,
      "zero-filling must not change totals")
    gf.unpersist()
  }

  test("q_anomaly flags exactly the >2-sigma population outliers") {
    val out = graft.operators.Events.qAnomaly.build(spark, sf)
      .select("event_id").collect().map(_.getLong(0)).toSet
    // independent recompute with Spark's built-in population stddev
    val e = Tables.events(spark, sf)
    val st = e.groupBy("event_type")
      .agg(avg("value").as("mu"), stddev_pop("value").as("sd"))
    val expect = e.join(st, "event_type")
      .filter(abs(col("value") - col("mu")) > lit(2) * col("sd"))
      .select("event_id").collect().map(_.getLong(0)).toSet
    // float-boundary rows could differ between the exact and Welford forms;
    // demand agreement away from the boundary and report any disagreement
    val diff = (out diff expect) union (expect diff out)
    assert(diff.isEmpty, s"outlier sets disagree on ids: $diff")
  }
}
