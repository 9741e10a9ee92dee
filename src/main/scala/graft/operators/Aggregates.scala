package graft.operators

import graft.{Q, QueryPack, Tables}
import graft.QHelp._
import org.apache.spark.sql.functions._

/** Aggregation operators (SURVEY.md §2.2: q_agg_*, q_rollup, q_cube,
  * q_grouping_sets).
  *
  * Scale notes: all of these are hash aggregations with map-side partial
  * aggregation — the shuffle carries one row per (group x partition), not
  * per input row, so they scale linearly with input and the shuffle volume
  * is bounded by group cardinality. No driver-side collection anywhere.
  */
object Aggregates extends QueryPack {

  /** TPC-H Q1 shape: the flagship hash aggregate. */
  val qAggGroup: Q = Q(
    "q_agg_group",
    Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS sum_disc_price,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2)) * CAST(1 + l_tax AS DECIMAL(12,2))) AS DOUBLE) AS sum_charge,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
             COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus
      """.stripMargin.trim)
  ) { (s, dir) =>
    val li = Tables.lineitem(s, dir)
    li.filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount")))
          .cast("double").as("sum_disc_price"),
        sum(dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount")) *
            dec(lit(1) + col("l_tax")))
          .cast("double").as("sum_charge"),
        (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        (dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
        count(lit(1)).as("count_order")
      )
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  override def all: Seq[Q] = Seq(qAggGroup)
}
