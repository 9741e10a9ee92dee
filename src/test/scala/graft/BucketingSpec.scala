package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._
import graft.operators.Bucketing

/** Plan-level proof that the bucketed layout eliminates the join
  * exchange: the whole point of `q_bucket_join`. */
class BucketingSpec extends SparkSpec {

  private def joinNode(plan: SparkPlan): Option[SparkPlan] = plan.find {
    case _: SortMergeJoinExec | _: ShuffledHashJoinExec => true
    case _ => false
  }

  test("bucketed orders ⋈ lineitem: no shuffle on either join side") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // broadcast would hide the bucket win on the tiny fixture; at 100 TB
    // neither side broadcasts, which is exactly when bucketing pays
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, sf)
      val plan = joined.queryExecution.executedPlan
      val j = joinNode(plan).getOrElse(
        fail(s"no shuffle-family join found (broadcast?):\n$plan"))
      j.children.foreach { side =>
        val shuffles = side.collect { case e: ShuffleExchangeExec => e }
        assert(shuffles.isEmpty,
          s"bucketed join side still shuffles:\n$side")
      }
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("the same join over raw parquet DOES shuffle (the layout is the win)") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val raw = Tables.orders(spark, sf).select("o_orderkey", "o_orderstatus")
        .join(Tables.lineitem(spark, sf)
          .select("l_orderkey", "l_extendedprice", "l_discount"),
          col("o_orderkey") === col("l_orderkey"))
      val plan = raw.queryExecution.executedPlan
      val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.size >= 2,
        s"expected both raw sides to exchange, got ${shuffles.size}:\n$plan")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("bucketing is semantically invisible: result equals the raw join") {
    val bucketed = Bucketing.qBucketJoin.build(spark, sf)
      .collect().map(_.toSeq).toSeq
    val raw = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf), col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_items"),
        sum(QHelp.dec(col("l_extendedprice")) *
            QHelp.dec(lit(1) - col("l_discount")))
          .cast("double").as("revenue"))
      .orderBy("o_orderstatus")
      .collect().map(_.toSeq).toSeq
    assert(bucketed == raw)
  }

  test("one file per bucket: the layout that also skips the merge sort") {
    Bucketing.bucketedJoin(spark, sf) // ensure tables exist
    val files = spark.table("graft_bkt_orders").inputFiles
    assert(files.length == Bucketing.NBuckets,
      s"expected ${Bucketing.NBuckets} bucket files, got ${files.length}")
  }
}
