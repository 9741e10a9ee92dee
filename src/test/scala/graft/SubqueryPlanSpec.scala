package graft

import graft.operators.Subqueries

/** Physical-plan contracts for the subquery pack's 100 TB hazards
  * (VERDICT r1 items 6/8): the null-guarded NOT IN must plan as a plain
  * left-anti join — never the null-aware variant whose fallback is a
  * BroadcastNestedLoopJoin once the subquery side outgrows the broadcast
  * threshold. */
class SubqueryPlanSpec extends SparkSpec {

  test("guarded NOT IN plans as a plain left-anti join, no BNLJ") {
    val df = Subqueries.qSubqueryInNotnull.build(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), plan)
    assert(!plan.contains("BroadcastNestedLoop"), plan)
  }

  test("guarded NOT IN matches the unguarded result when no nulls exist") {
    // o_custkey has no nulls in the fixture, so the null-aware semantics
    // coincide — the guard only changes the PLAN, not the answer
    val guarded = Subqueries.qSubqueryInNotnull.build(spark, sf)
    val unguarded = spark.sql(
      """SELECT c_custkey FROM customer
         WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                                 WHERE o_orderstatus = 'F')
         ORDER BY c_custkey""")
    assert(guarded.collect().toSeq == unguarded.collect().toSeq)
  }
}
