package graft

import org.apache.spark.sql.functions._

class M0Spec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }

  test("q_agg_group partitions the filtered lineitem rows exactly") {
    val df = SparkEntry.queries("q_agg_group")(spark, sf)
    val total = df.agg(sum("count_order")).head.getLong(0)
    val expected = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
      .count()
    assert(total == expected)
    assert(df.columns.toSet.contains("avg_qty"))
  }

  test("q_cdc_snapshot yields exactly one row per user and the max-ts event") {
    val snap = SparkEntry.queries("q_cdc_snapshot")(spark, sf)
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(snap.count() == users)
    assert(snap.select("user_id").distinct().count() == users)
    // cross-check against an independent max-ts computation
    val ev = Tables.events(spark, sf)
    val maxTs = ev.groupBy("user_id").agg(max("ts").as("mts"))
    val joined = snap.join(ev.as("e"), snap("last_event_id") === col("e.event_id"))
      .join(maxTs, "user_id")
      .filter(col("e.ts") =!= col("mts"))
    assert(joined.count() == 0)
  }
}
