package graft.operators

import graft.{Q, QueryPack, Tables}
import org.apache.spark.sql.functions._

/** Scan / projection / filter / sort operators (SURVEY.md §2.2).
  *
  * Scale notes: these are the operators where pushdown matters most — the
  * plans keep selection and projection directly over the parquet relation so
  * Catalyst pushes both into the scan (`PushedFilters`, pruned `ReadSchema`).
  * q_sort_limit compiles to TakeOrderedAndProject: per-partition top-k then a
  * driver-side merge of k*partitions rows — never a global sort.
  */
object Scans extends QueryPack {

  /** Column-pruned, predicate-pushed scan of lineitem. */
  val qScanProject: Q = Q(
    "q_scan_project",
    Some("""
      SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_shipdate
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      ORDER BY l_orderkey, l_linenumber, l_shipdate, l_extendedprice, l_quantity
      """.stripMargin.trim)
  ) { (s, dir) =>
    // ORDER BY every projected column: (l_orderkey, l_linenumber) is NOT
    // unique in the fixtures (118k dup pairs at sf0.1 alone), so the
    // two-column sort left tie order to engine luck — DuckDB's sort is
    // stable on scan order, Spark's range-sort is not, and the r9
    // full-surface sf1 audit caught them diverging (38k row diffs).
    Tables.lineitem(s, dir)
      .where(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
             col("l_shipdate") <  lit("1997-01-01 00:00:00").cast("timestamp"))
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_shipdate")
      .orderBy("l_orderkey", "l_linenumber", "l_shipdate", "l_extendedprice", "l_quantity")
  }

  /** Compound predicates: AND/OR, IN, BETWEEN, LIKE, IS NOT NULL. */
  val qFilterPred: Q = Q(
    "q_filter_pred",
    Some("""
      SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
      FROM orders
      WHERE o_orderstatus IN ('O', 'F')
        AND o_totalprice BETWEEN 50000 AND 150000
        AND (o_orderpriority LIKE '1%' OR o_orderpriority LIKE '2%')
        AND o_orderdate IS NOT NULL
      ORDER BY o_orderkey
      """.stripMargin.trim)
  ) { (s, dir) =>
    Tables.orders(s, dir)
      .where(col("o_orderstatus").isin("O", "F") &&
             col("o_totalprice").between(50000, 150000) &&
             (col("o_orderpriority").like("1%") || col("o_orderpriority").like("2%")) &&
             col("o_orderdate").isNotNull)
      .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
      .orderBy("o_orderkey")
  }

  /** Global top-25 by price — TakeOrderedAndProject, deterministic tiebreak. */
  val qSortLimit: Q = Q(
    "q_sort_limit",
    Some("""
      SELECT l_orderkey, l_linenumber, l_extendedprice
      FROM lineitem
      ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
      LIMIT 25
      """.stripMargin.trim)
  ) { (s, dir) =>
    Tables.lineitem(s, dir)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
      .limit(25)
  }

  override def all: Seq[Q] = Seq(qScanProject, qFilterPred, qSortLimit)
}
