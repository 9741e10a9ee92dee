package graft.operators

import graft.{Q, QueryPack, Tables}

/** The 12 TPC-H shapes not already covered by the other packs — with this
  * pack the library exercises all 22 TPC-H query patterns (Q1/2/3/5/11/13/
  * 15/17/20/21 live in Aggregates/Subqueries/Joins under shape names).
  *
  * Like [[Subqueries]], each query is SQL-verbatim: the same text runs
  * through `spark.sql` over temp views and through DuckDB over the same
  * parquet — one string, two engines.
  *
  * Schema adaptations (the driver's reduced TPC-H schema has no partsupp,
  * l_commitdate/l_receiptdate/l_shipmode, c_phone, or p_container):
  *   - Q4/Q12 "late" ⇒ `l_shipdate > o_orderdate + 60 days` (no
  *     commit/receipt dates); Q12's shipmode split ⇒ `l_linestatus`.
  *   - Q9 supply cost ⇒ `0.10 * p_retailprice * l_quantity` (no partsupp).
  *   - Q16 part-supplier relation ⇒ distinct (l_partkey, l_suppkey) pairs
  *     observed in lineitem (no partsupp).
  *   - Q19 container predicates ⇒ p_size ranges.
  *   - Q22 country code ⇒ `substr(c_name, 16, 2)` (no c_phone) and "no
  *     orders" ⇒ "no orders since 2000" (every customer has ≥1 order in
  *     the generated data).
  *
  * Determinism discipline per QueryPack: exact DECIMAL sums cast to double
  * at the end, total ORDER BY, ratios as one double division of two exact
  * values (IEEE-identical across engines).
  */
object Tpch extends QueryPack {

  private def sqlQ(name: String, sql: String): Q =
    Q(name, Some(sql)) { (s, dir) => Tables.registerAll(s, dir); s.sql(sql) }

  /** TPC-H Q4: order-priority checking — EXISTS-decorrelated left-semi
    * join, priority histogram of orders with a late lineitem. */
  val qPriorityExists: Q = sqlQ(
    "q_priority_exists",
    """
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """.stripMargin.trim)

  /** TPC-H Q6: forecasting revenue change — the minimal scan+filter+agg
    * whose entire WHERE clause must push into the parquet scan. */
  val qForecastRevenue: Q = sqlQ(
    "q_forecast_revenue",
    """
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                    CAST(l_discount AS DECIMAL(12,2))) AS VARCHAR(64)) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    ORDER BY revenue
    """.stripMargin.trim)

  /** TPC-H Q7: volume shipping between two nations, by year — the
    * two-role nation join (n1 = supplier side, n2 = customer side) with a
    * symmetric disjunctive pair predicate. */
  val qVolumeShipping: Q = sqlQ(
    "q_volume_shipping",
    """
    SELECT supp_nation, cust_nation, l_year, CAST(CAST(SUM(volume) AS VARCHAR(64)) AS DOUBLE) AS revenue
    FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
                 CAST(l_extendedprice AS DECIMAL(12,2)) *
                 CAST(1 - l_discount AS DECIMAL(12,2)) AS volume
          FROM supplier, lineitem, orders, customer, nation n1, nation n2
          WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
            AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
            AND c_nationkey = n2.n_nationkey
            AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
              OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
            AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00') shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """.stripMargin.trim)

  /** TPC-H Q8: national market share — one nation's fraction of a
    * region's yearly volume in one part type. The share is a single
    * double division of two exact DECIMAL sums (NULL numerator when the
    * nation sold nothing that year, identically in both engines). */
  val qMarketShare: Q = sqlQ(
    "q_market_share",
    """
    SELECT o_year,
           CAST(CAST(CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume END) AS VARCHAR(64)) AS DOUBLE) /
                CAST(CAST(SUM(volume) AS VARCHAR(64)) AS DOUBLE) AS DOUBLE) AS mkt_share
    FROM (SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
                 CAST(l_extendedprice AS DECIMAL(12,2)) *
                 CAST(1 - l_discount AS DECIMAL(12,2)) AS volume,
                 n2.n_name AS nation
          FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
          WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
            AND l_orderkey = o_orderkey AND o_custkey = c_custkey
            AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
            AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
            AND p_type = 'ECONOMY') all_nations
    GROUP BY o_year
    ORDER BY o_year
    """.stripMargin.trim)

  /** TPC-H Q9: product-type profit — supply cost adapted to
    * `0.10 * p_retailprice * l_quantity` (no partsupp table); the
    * three-factor DECIMAL(12,2) product stays exact in both engines. */
  val qProductProfit: Q = sqlQ(
    "q_product_profit",
    """
    SELECT nation, o_year, CAST(CAST(SUM(amount) AS VARCHAR(64)) AS DOUBLE) AS sum_profit
    FROM (SELECT n_name AS nation,
                 CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
                 CAST(l_extendedprice AS DECIMAL(12,2)) *
                 CAST(1 - l_discount AS DECIMAL(12,2)) -
                 CAST(0.10 AS DECIMAL(12,2)) *
                 CAST(p_retailprice AS DECIMAL(12,2)) *
                 CAST(l_quantity AS DECIMAL(12,2)) AS amount
          FROM part, supplier, lineitem, orders, nation
          WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
            AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
            AND p_name LIKE '%re%') profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """.stripMargin.trim)

  /** TPC-H Q10: returned-item reporting — top 20 customers by revenue
    * lost to returns in one quarter (total ORDER BY before LIMIT keeps
    * the cut deterministic). */
  val qReturnedRevenue: Q = sqlQ(
    "q_returned_revenue",
    """
    SELECT c_custkey, c_name,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                    CAST(1 - l_discount AS DECIMAL(12,2))) AS VARCHAR(64)) AS DOUBLE) AS revenue,
           CAST(c_acctbal AS DOUBLE) AS c_acctbal, n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_returnflag = 'R' AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """.stripMargin.trim)

  /** TPC-H Q12: shipping-priority split — "late" adapted to shipping 60+
    * days after the order date, the shipmode group adapted to
    * l_linestatus; the CASE-sum pivot over order priority is the Q12
    * pattern under test. */
  val qLateshipSplit: Q = sqlQ(
    "q_lateship_split",
    """
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders, lineitem
    WHERE o_orderkey = l_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """.stripMargin.trim)

  /** TPC-H Q14: promotion effect — percentage of one month's revenue from
    * PROMO parts; numerator and denominator are exact DECIMAL sums, the
    * percentage one double multiply+divide. */
  val qPromoShare: Q = sqlQ(
    "q_promo_share",
    """
    SELECT CAST(100.0 * CAST(CAST(SUM(CASE WHEN p_type = 'PROMO' THEN volume END) AS VARCHAR(64)) AS DOUBLE) /
                CAST(CAST(SUM(volume) AS VARCHAR(64)) AS DOUBLE) AS DOUBLE) AS promo_revenue
    FROM (SELECT CAST(l_extendedprice AS DECIMAL(12,2)) *
                 CAST(1 - l_discount AS DECIMAL(12,2)) AS volume, p_type
          FROM lineitem, part
          WHERE l_partkey = p_partkey
            AND l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
            AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00') x
    ORDER BY promo_revenue
    """.stripMargin.trim)

  /** TPC-H Q16: parts/supplier relationship — supplier variety per
    * (brand, type, size) over the part-supplier pairs observed in
    * lineitem (no partsupp table), minus a NOT-IN supplier blacklist. */
  val qSupplierVariety: Q = sqlQ(
    "q_supplier_variety",
    """
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND p_brand <> 'Brand#5'
      AND p_type NOT LIKE 'MEDIUM%'
      AND p_size IN (1, 3, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_name LIKE '%77' AND s_suppkey IS NOT NULL)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """.stripMargin.trim)

  /** TPC-H Q18: large-volume customers — IN over a HAVING-filtered
    * aggregate on the fact table itself, then re-aggregated with the
    * order dimensions. */
  val qLargeOrders: Q = sqlQ(
    "q_large_orders",
    """
    SELECT c_custkey, c_name, o_orderkey, o_orderdate,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR(64)) AS DOUBLE) AS total_qty
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey
                         HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 300)
      AND c_custkey = o_custkey AND o_orderkey = l_orderkey
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    """.stripMargin.trim)

  /** TPC-H Q19: discounted revenue — three-branch disjunctive predicate
    * over brand x size x quantity ranges (container predicates adapted to
    * p_size; the OR-of-ANDs shape that exercises CNF pushdown is kept). */
  val qDisjunctPred: Q = sqlQ(
    "q_disjunct_pred",
    """
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                    CAST(1 - l_discount AS DECIMAL(12,2))) AS VARCHAR(64)) AS DOUBLE) AS revenue
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND ((p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
            AND l_quantity BETWEEN 1 AND 11)
        OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
            AND l_quantity BETWEEN 10 AND 20)
        OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15
            AND l_quantity BETWEEN 20 AND 30))
    ORDER BY revenue
    """.stripMargin.trim)

  /** TPC-H Q22: global sales opportunity — high-balance customers gone
    * idle. Country code adapted to digits 7-8 of the customer number (no
    * c_phone); "never ordered" adapted to "no order since 2000" (every
    * generated customer has at least one order). Uncorrelated scalar AVG
    * + NOT EXISTS anti join, per the original. */
  val qIdleBalance: Q = sqlQ(
    "q_idle_balance",
    """
    SELECT cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS VARCHAR(64)) AS DOUBLE) AS totacctbal
    FROM (SELECT substr(c_name, 16, 2) AS cntrycode, c_acctbal
          FROM customer
          WHERE c_acctbal > (SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS VARCHAR(64)) AS DOUBLE) / COUNT(*)
                             FROM customer WHERE c_acctbal > 0.0)
            AND NOT EXISTS (SELECT 1 FROM orders
                            WHERE o_custkey = c_custkey
                              AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')) custsale
    GROUP BY cntrycode
    ORDER BY cntrycode
    """.stripMargin.trim)

  override def all: Seq[Q] = Seq(
    qPriorityExists, qForecastRevenue, qVolumeShipping, qMarketShare,
    qProductProfit, qReturnedRevenue, qLateshipSplit, qPromoShare,
    qSupplierVariety, qLargeOrders, qDisjunctPred, qIdleBalance)
}
