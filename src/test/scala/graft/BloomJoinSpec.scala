package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.execution.{FilterExec, SparkPlan}
import org.apache.spark.sql.functions._
import graft.operators.Aggregates

/** The hand-built runtime filter: the Bloom bit test must prune the
  * probe side BEFORE the join, and pruning must be lossless. */
class BloomJoinSpec extends SparkSpec {

  test("bloom bit test sits below the probe side of the join") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = Aggregates.bloomPrunedJoin(spark, sf)
        .queryExecution.executedPlan
      val join = plan.find {
        case _: SortMergeJoinExec | _: ShuffledHashJoinExec => true
        case _ => false
      }.getOrElse(fail(s"no shuffle-family join:\n$plan"))
      // the probe side (the one scanning orders) must contain the bit-test
      // filter below its exchange
      val probeSide = join.children.find(_.toString.contains("orders.parquet"))
        .getOrElse(fail(s"no orders scan under the join:\n$join"))
      // the bit test (3 shiftright probes of the broadcast bitset) may
      // plan as a FilterExec or fold into the broadcast join's condition
      // — either way it must appear BELOW every probe-side exchange,
      // i.e. rows are dropped before they shuffle
      assert(probeSide.toString.contains("shiftright"),
        s"bit test missing from probe side:\n$probeSide")
      // only the exchanges actually carrying orders rows (the bloom
      // build's own tiny aggregate exchange also lives in this subtree)
      val exchanges = probeSide.collect { case e: ShuffleExchangeExec => e }
        .filter(_.toString.contains("orders.parquet"))
      assert(exchanges.nonEmpty, "probe side should shuffle into the join")
      exchanges.foreach { e =>
        assert(e.child.toString.contains("shiftright"),
          s"bit test must prune before the exchange:\n$e")
      }
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("pruning is lossless and actually prunes") {
    // lossless: identical to the plain join (the oracle's property, here
    // asserted in-engine too)
    val pruned = Aggregates.bloomPrunedJoin(spark, sf)
      .collect().map(_.toSeq).toSeq
    val plain = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf)
          .filter(col("c_mktsegment") === "BUILDING").select("c_custkey"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        QHelp.dsum(col("o_totalprice")).as("total"))
      .orderBy("o_orderpriority")
      .collect().map(_.toSeq).toSeq
    assert(pruned == plain)
    // actually prunes: bloom-positive orders < all orders (some non-member
    // orders fail the bit test on this fixture)
    val all = Tables.orders(spark, sf).count()
    val members = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf)
          .filter(col("c_mktsegment") === "BUILDING").select("c_custkey"),
        col("o_custkey") === col("c_custkey"), "left_semi").count()
    assert(members < all, "fixture degenerate: every order is a member")
  }
}
