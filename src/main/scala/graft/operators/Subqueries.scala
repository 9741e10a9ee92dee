package graft.operators

import graft.{Q, QueryPack, Tables}

/** SQL-surface operators where the Spark text IS the oracle text: the
  * query runs verbatim through `spark.sql` over temp views and through
  * DuckDB over the same parquet — one string, two engines. Exercises the
  * Catalyst paths the Column-API packs don't: correlated/uncorrelated
  * scalar subqueries (`RewriteCorrelatedScalarSubquery`), IN / NOT IN
  * (`RewritePredicateSubquery` → left-semi / null-aware anti join), and a
  * six-table star-flake join (join reordering + broadcast of the dim
  * chain).
  *
  * Determinism: averages via exact DECIMAL sums / COUNT, totals ordered.
  */
object Subqueries extends QueryPack {

  private def sqlQ(name: String, sql: String): Q =
    Q(name, Some(sql)) { (s, dir) => Tables.registerAll(s, dir); s.sql(sql) }

  /** TPC-H Q5 shape: revenue by nation for one region-year. */
  val qJoinStarflake: Q = sqlQ(
    "q_join_starflake",
    """
    SELECT n_name,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                    CAST(1 - l_discount AS DECIMAL(12,2))) AS VARCHAR(64)) AS DOUBLE) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """.stripMargin.trim)

  /** Uncorrelated scalar subquery: parts priced 1.5x over the global
    * (exactly computed) mean. */
  val qSubqueryScalar: Q = sqlQ(
    "q_subquery_scalar",
    """
    SELECT p_partkey, p_retailprice
    FROM part
    WHERE p_retailprice >
      (SELECT CAST(CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS VARCHAR(64)) AS DOUBLE) / COUNT(*)
       FROM part) * 1.5
    ORDER BY p_partkey
    """.stripMargin.trim)

  /** Correlated scalar subquery: parts above their own brand's mean. */
  val qSubqueryCorr: Q = sqlQ(
    "q_subquery_corr",
    """
    SELECT p.p_partkey
    FROM part p
    WHERE p.p_retailprice >
      (SELECT CAST(CAST(SUM(CAST(p2.p_retailprice AS DECIMAL(12,2))) AS VARCHAR(64)) AS DOUBLE) / COUNT(*)
       FROM part p2 WHERE p2.p_brand = p.p_brand)
    ORDER BY p.p_partkey
    """.stripMargin.trim)

  /** IN + NOT IN predicate subqueries (left-semi and null-aware anti
    * join after Catalyst's rewrite). */
  val qSubqueryIn: Q = sqlQ(
    "q_subquery_in",
    """
    SELECT c_custkey
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 200000)
      AND c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
    ORDER BY c_custkey
    """.stripMargin.trim)

  /** TPC-H Q21 shape: correlated EXISTS + NOT EXISTS in one predicate —
    * suppliers in multi-supplier orders where THEY alone shipped late
    * ("late" = after the cutoff; the reduced schema has no receipt/commit
    * dates). */
  val qExistsMulti: Q = sqlQ(
    "q_exists_multi",
    """
    SELECT l1.l_suppkey, COUNT(*) AS numwait
    FROM lineitem l1, orders o
    WHERE o.o_orderkey = l1.l_orderkey
      AND l1.l_shipdate > TIMESTAMP '1997-06-30 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > TIMESTAMP '1997-06-30 00:00:00')
    GROUP BY l1.l_suppkey
    ORDER BY numwait DESC, l1.l_suppkey
    """.stripMargin.trim)

  /** NOT IN with an `IS NOT NULL` guard on the subquery side — the
    * 100-TB-safe twin of `q_subquery_in`'s NOT IN. Unguarded NOT IN needs
    * Catalyst's null-aware anti join, which requires broadcasting the
    * subquery side and degrades to BroadcastNestedLoopJoin past the
    * threshold; the guard lets it plan as a plain left-anti shuffle join
    * at any scale (plan-asserted in SubqueryPlanSpec). */
  val qSubqueryInNotnull: Q = sqlQ(
    "q_subquery_in_notnull",
    """
    SELECT c_custkey
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                            WHERE o_orderstatus = 'F' AND o_custkey IS NOT NULL)
    ORDER BY c_custkey
    """.stripMargin.trim)

  /** TPC-H Q2 shape: correlated MIN — each part's cheapest lineitems.
    * Exercises RewriteCorrelatedScalarSubquery into a per-key aggregate
    * join (MIN over doubles is order-independent, so the equality
    * predicate is exact in both engines). */
  val qCorrMin: Q = sqlQ(
    "q_corr_min",
    """
    SELECT p.p_partkey, l.l_suppkey, CAST(l.l_extendedprice AS DOUBLE) AS min_price
    FROM part p, lineitem l
    WHERE l.l_partkey = p.p_partkey
      AND l.l_extendedprice = (SELECT MIN(l2.l_extendedprice)
                               FROM lineitem l2
                               WHERE l2.l_partkey = p.p_partkey)
    ORDER BY p.p_partkey, l.l_suppkey, min_price
    """.stripMargin.trim)

  /** TPC-H Q11 shape: group value vs a global-aggregate threshold
    * (nations holding > 1/25 of total supplier revenue). The comparison
    * is multiplied through (`sum * 25 > total`) so both sides stay exact
    * DECIMAL — dividing the total instead would hit engine-specific
    * decimal-division rounding at the boundary. */
  val qGroupShare: Q = sqlQ(
    "q_group_share",
    """
    SELECT s_nationkey,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR(64)) AS DOUBLE) AS total_value
    FROM lineitem, supplier
    WHERE l_suppkey = s_suppkey
    GROUP BY s_nationkey
    HAVING SUM(CAST(l_extendedprice AS DECIMAL(12,2))) * 25 >
      (SELECT SUM(CAST(l_extendedprice AS DECIMAL(12,2)))
       FROM lineitem, supplier WHERE l_suppkey = s_suppkey)
    ORDER BY total_value DESC, s_nationkey
    """.stripMargin.trim)

  /** TPC-H Q17 shape: avg-per-key decorrelation — revenue of small-order
    * lineitems ("small" = under 20% of the part's own average quantity).
    * Quantities are small exact integers in doubles, so AVG and the 0.2
    * multiply are bit-identical across engines. */
  val qAvgDecorrelate: Q = sqlQ(
    "q_avg_decorrelate",
    """
    SELECT CAST(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR(64)) AS DOUBLE) / 7.0
                AS DOUBLE) AS avg_yearly
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND p_brand = 'Brand#4'
      AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                        FROM lineitem l2
                        WHERE l2.l_partkey = p_partkey)
    ORDER BY avg_yearly
    """.stripMargin.trim)

  /** TPC-H Q20 shape: nested IN chains (supplier ← lineitem ← part),
    * rewritten by Catalyst into stacked left-semi joins. */
  val qNestedIn: Q = sqlQ(
    "q_nested_in",
    """
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00')
    ORDER BY s_suppkey
    """.stripMargin.trim)

  /** LIKE / NOT LIKE / regex predicates (regex spelled per engine:
    * Spark `rlike`, DuckDB `regexp_matches` — same RE2-ish pattern). */
  val qLikePatterns: Q = Q(
    "q_like_patterns",
    Some("""
      SELECT p_partkey, p_name
      FROM part
      WHERE p_name LIKE '%iv%'
        AND p_name NOT LIKE 'w%'
        AND regexp_matches(p_name, '[aeiou][aeiou]')
      ORDER BY p_partkey
      """.stripMargin.trim)
  ) { (s, dir) =>
    import org.apache.spark.sql.functions.col
    graft.Tables.part(s, dir)
      .where(col("p_name").like("%iv%") &&
        !col("p_name").like("w%") &&
        col("p_name").rlike("[aeiou][aeiou]"))
      .select("p_partkey", "p_name")
      .orderBy("p_partkey")
  }

  /** TPC-H Q15 shape: argmax over a derived aggregate view — the view is
    * computed once, its max selected by an uncorrelated scalar subquery,
    * and rows equal to it joined back to the dimension. Equality against
    * the max is safe because the revenue totals are exact decimals;
    * doubles surface only in the output cast. */
  val qArgmaxView: Q = sqlQ(
    "q_argmax_view",
    """
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                 CAST(1 - l_discount AS DECIMAL(12,2))) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_rev
    FROM supplier, rev
    WHERE s_suppkey = supplier_no
      AND total_rev = (SELECT MAX(total_rev) FROM rev)
    ORDER BY s_suppkey
    """.stripMargin.trim)

  /** TPC-H Q13 shape: distribution of customers by order count — the
    * left join keeps zero-order customers (COUNT of a nullable column
    * counts only matches), then a second aggregation counts the counts.
    * Exercises outer-join + double aggregation, which none of the other
    * agg queries compose. */
  val qCustdist: Q = sqlQ(
    "q_custdist",
    """
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer LEFT OUTER JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """.stripMargin.trim)

  override def all: Seq[Q] = Seq(
    qJoinStarflake, qSubqueryScalar, qSubqueryCorr, qSubqueryIn,
    qSubqueryInNotnull, qCorrMin, qGroupShare, qAvgDecorrelate, qNestedIn,
    qExistsMulti, qLikePatterns, qArgmaxView, qCustdist)
}
