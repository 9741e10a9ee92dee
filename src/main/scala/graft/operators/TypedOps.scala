package graft.operators

import graft.Tables
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed `Dataset[T]` view of the engine: case-class Encoders where
  * compile-time safety helps (ETL-style row logic), with the explicit
  * trade-off that typed `map`/`groupByKey` lambdas are opaque to Catalyst
  * (no pushdown through them, no codegen inside them) — so the
  * oracle-gated queries stay in the Column API and this surface is for
  * user-side type-safe composition. TypedOpsSpec pins agreement between
  * the two formulations.
  */
object TypedOps {

  final case class Lineitem(
      l_orderkey: Long, l_partkey: Long, l_suppkey: Long, l_linenumber: Int,
      l_quantity: Double, l_extendedprice: Double, l_discount: Double,
      l_tax: Double, l_returnflag: String, l_linestatus: String,
      l_shipdate: java.sql.Timestamp)

  final case class FlagStats(
      l_returnflag: String, n: Long, sum_qty: Double, max_price: Double)

  def lineitems(s: SparkSession, dir: String): Dataset[Lineitem] = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .as[Lineitem]
  }

  /** Typed filter + groupByKey + mapGroups — the Dataset formulation of a
    * TPC-H Q1-style aggregate. */
  def statsByFlag(li: Dataset[Lineitem]): Dataset[FlagStats] = {
    import li.sparkSession.implicits._
    li.filter((l: Lineitem) => l.l_quantity > 0)
      .groupByKey((l: Lineitem) => l.l_returnflag)
      .mapGroups { (flag: String, rows: Iterator[Lineitem]) =>
        var n = 0L; var qty = 0.0; var maxPrice = Double.MinValue
        rows.foreach { l =>
          n += 1; qty += l.l_quantity
          if (l.l_extendedprice > maxPrice) maxPrice = l.l_extendedprice
        }
        FlagStats(flag, n, qty, maxPrice)
      }
  }

  /** The Column-API twin — what the engine actually ships for this shape
    * (partial aggregation + codegen; the typed version above shuffles
    * whole rows into mapGroups). */
  def statsByFlagColumns(li: Dataset[Lineitem]): Dataset[FlagStats] = {
    import li.sparkSession.implicits._
    li.where(col("l_quantity") > 0)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity")).as("sum_qty"),
        max(col("l_extendedprice")).as("max_price"))
      .as[FlagStats]
  }
}
