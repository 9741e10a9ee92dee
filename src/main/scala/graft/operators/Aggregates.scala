package graft.operators

import graft.{Q, QueryPack, Tables}
import graft.QHelp._
import org.apache.spark.sql.DataFrame
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

  // Portable hash family + h60 convention shared with the minhash/KMV/CMS
  // oracles (TextOps has the same helpers; duplicated privately to keep
  // pack dependencies flat).
  private val P = graft.functions.MinHashSig.P
  private val A = graft.functions.MinHashSig.A.toSeq
  private val B = graft.functions.MinHashSig.B.toSeq
  private def h60(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long") % P
  private def h60Sql(e: String): String =
    s"CAST(('0x' || substr(md5($e),1,15)) AS BIGINT) % $P"

  /** q_bloom_member sketch geometry: 2048 bits (32 longs), 3 hashes —
    * FP ≈ 4% at the fixture's ~300 build keys; at scale m grows with the
    * build side, the plan shape is unchanged. */
  private val BloomBits = 2048
  private val BloomK = 3

  /** TPC-H Q1 shape: the flagship hash aggregate. */
  val qAggGroup: Q = Q(
    "q_agg_group",
    Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR(64)) AS DOUBLE) AS sum_qty,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR(64)) AS DOUBLE) AS sum_base_price,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2))) AS VARCHAR(64)) AS DOUBLE) AS sum_disc_price,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2)) * CAST(1 + l_tax AS DECIMAL(12,2))) AS VARCHAR(64)) AS DOUBLE) AS sum_charge,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR(64)) AS DOUBLE) / COUNT(*) AS avg_qty,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR(64)) AS DOUBLE) / COUNT(*) AS avg_price,
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

  /** Global (no grouping) aggregate — single partial+final exchange row. */
  val qAggGlobal: Q = Q(
    "q_agg_global",
    Some("""
      SELECT COUNT(*) AS n_rows,
             COUNT(DISTINCT l_partkey) AS n_parts,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR(64)) AS DOUBLE) AS sum_qty,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR(64)) AS DOUBLE) / COUNT(*) AS avg_price,
             MIN(l_extendedprice) AS min_price,
             MAX(l_extendedprice) AS max_price
      FROM lineitem
      """.stripMargin.trim)
  ) { (s, dir) =>
    Tables.lineitem(s, dir).agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col("l_partkey")).as("n_parts"),
      dsum(col("l_quantity")).as("sum_qty"),
      (dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
      min(col("l_extendedprice")).as("min_price"),
      max(col("l_extendedprice")).as("max_price"))
  }

  /** Distinct aggregation per group (exact; the approx twin is unit-tested
    * against this, not oracle-matched — float sketch output is engine
    * specific). */
  val qAggDistinct: Q = Q(
    "q_agg_distinct",
    Some("""
      SELECT l_returnflag,
             COUNT(DISTINCT l_partkey) AS n_parts,
             COUNT(DISTINCT l_suppkey) AS n_supps
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag
      """.stripMargin.trim)
  ) { (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"))
      .orderBy("l_returnflag")
  }

  /** Post-aggregation filter (HAVING). */
  val qAggHaving: Q = Q(
    "q_agg_having",
    Some("""
      SELECT o_custkey,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR(64)) AS DOUBLE) AS total,
             COUNT(*) AS n
      FROM orders
      GROUP BY o_custkey
      HAVING SUM(CAST(o_totalprice AS DECIMAL(12,2))) > 500000
      ORDER BY o_custkey
      """.stripMargin.trim)
  ) { (s, dir) =>
    Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(
        sum(dec(col("o_totalprice"))).as("total_dec"),
        count(lit(1)).as("n"))
      .where(col("total_dec") > 500000)
      .select(col("o_custkey"), col("total_dec").cast("double").as("total"), col("n"))
      .orderBy("o_custkey")
  }

  /** ROLLUP grouping sets over the customer->nation dimension join. */
  val qRollup: Q = Q(
    "q_rollup",
    Some("""
      SELECT n_name, c_mktsegment,
             GROUPING(n_name, c_mktsegment) AS gid,
             COUNT(*) AS n_cust
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY ROLLUP(n_name, c_mktsegment)
      ORDER BY gid, n_name NULLS FIRST, c_mktsegment NULLS FIRST
      """.stripMargin.trim)
  ) { (s, dir) =>
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .rollup(col("n_name"), col("c_mktsegment"))
      .agg(grouping_id().cast("long").as("gid"), count(lit(1)).as("n_cust"))
      .select("n_name", "c_mktsegment", "gid", "n_cust")
      .orderBy(col("gid").asc, col("n_name").asc_nulls_first,
               col("c_mktsegment").asc_nulls_first)
  }

  /** CUBE grouping sets. */
  val qCube: Q = Q(
    "q_cube",
    Some("""
      SELECT o_orderstatus, o_orderpriority,
             GROUPING(o_orderstatus, o_orderpriority) AS gid,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR(64)) AS DOUBLE) AS total,
             COUNT(*) AS n
      FROM orders
      GROUP BY CUBE(o_orderstatus, o_orderpriority)
      ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
      """.stripMargin.trim)
  ) { (s, dir) =>
    Tables.orders(s, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        grouping_id().cast("long").as("gid"),
        sum(dec(col("o_totalprice"))).cast("double").as("total"),
        count(lit(1)).as("n"))
      .select("o_orderstatus", "o_orderpriority", "gid", "total", "n")
      .orderBy(col("gid").asc, col("o_orderstatus").asc_nulls_first,
               col("o_orderpriority").asc_nulls_first)
  }

  /** Explicit GROUPING SETS via SQL. */
  val qGroupingSets: Q = Q(
    "q_grouping_sets",
    Some("""
      SELECT o_orderstatus, o_orderpriority,
             GROUPING(o_orderstatus, o_orderpriority) AS gid,
             COUNT(*) AS n
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
      """.stripMargin.trim)
  ) { (s, dir) =>
    Tables.orders(s, dir).createOrReplaceTempView("gs_orders")
    s.sql("""
      SELECT o_orderstatus, o_orderpriority,
             CAST(GROUPING_ID(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
             COUNT(*) AS n
      FROM gs_orders
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      ORDER BY gid, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
      """)
  }

  /** Exact percentiles (type-7 linear interpolation in both engines);
    * the exact form is the oracle for any approx-sketch variant.
    *
    * Scale (VERDICT r7 item 1): computed by [[BinnedPercentile]]'s
    * two-level binned narrowing — every shuffled state is O(groups ×
    * bins), never the per-group distinct-value map Spark's `percentile`
    * buffers (21.5 MB through the shuffle at sf0.1; an OOM at 100 TB).
    * Output doubles are bit-identical to `percentile()` (same
    * `PercentileBase.getPercentile` arithmetic, pinned by
    * BinnedPercentileSpec), so the DuckDB oracle is unchanged. The
    * one-pass sketch twin for when 3 scans are too many remains
    * [[qQuantileHist]]. */
  val qPercentile: Q = Q(
    "q_percentile",
    Some("""
      SELECT l_returnflag,
             quantile_cont(l_extendedprice, 0.25) AS p25,
             quantile_cont(l_extendedprice, 0.5)  AS p50,
             quantile_cont(l_extendedprice, 0.9)  AS p90,
             quantile_cont(l_extendedprice, 0.99) AS p99,
             COUNT(*) AS n
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag
      """.stripMargin.trim)
  ) { (s, dir) =>
    val li = Tables.lineitem(s, dir)
    val pct = BinnedPercentile.wide(
      BinnedPercentile.perGroup(li, "l_returnflag", "l_extendedprice",
        Seq(0.25, 0.5, 0.9, 0.99)),
      Seq(0.25 -> "p25", 0.5 -> "p50", 0.9 -> "p90", 0.99 -> "p99"))
    val n = li.groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
    n.join(broadcast(pct), n("l_returnflag") === pct("g"))
      .select(col("l_returnflag"), col("p25"), col("p50"), col("p90"),
        col("p99"), col("n"))
      .orderBy("l_returnflag")
  }

  /** Pivot: order counts + exact revenue by status across priorities —
    * `.pivot()` compiles to the same conditional aggregation the oracle
    * spells out, so results align column-for-column. */
  val qPivot: Q = Q(
    "q_pivot",
    Some("""
      SELECT o_orderpriority,
             COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS cnt_F,
             COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS cnt_O,
             COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS cnt_P,
             CAST(CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS VARCHAR(64)) AS DOUBLE) AS rev_F
      FROM orders
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority
      """.stripMargin.trim)
  ) { (s, dir) =>
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)).as("cnt"), sum(dec(col("o_totalprice"))).as("rev"))
      .select(col("o_orderpriority"),
        coalesce(col("F_cnt"), lit(0L)).as("cnt_F"),
        coalesce(col("O_cnt"), lit(0L)).as("cnt_O"),
        coalesce(col("P_cnt"), lit(0L)).as("cnt_P"),
        col("F_rev").cast("double").as("rev_F"))
      .orderBy("o_orderpriority")
  }

  /** Several DISTINCT aggregates over different columns in one query —
    * Catalyst's Expand-based multi-distinct rewrite. */
  val qMultiDistinct: Q = Q(
    "q_multi_distinct",
    Some("""
      SELECT o_orderstatus,
             COUNT(DISTINCT o_custkey)  AS n_cust,
             COUNT(DISTINCT o_orderpriority) AS n_prio,
             COUNT(DISTINCT year(o_orderdate)) AS n_years,
             COUNT(*) AS n
      FROM orders
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus
      """.stripMargin.trim)
  ) { (s, dir) =>
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        countDistinct(col("o_custkey")).as("n_cust"),
        countDistinct(col("o_orderpriority")).as("n_prio"),
        countDistinct(year(col("o_orderdate"))).as("n_years"),
        count(lit(1)).as("n"))
      .orderBy("o_orderstatus")
  }

  /** Unpivot (melt): wide per-status aggregates back to long form. */
  val qUnpivot: Q = Q(
    "q_unpivot",
    Some("""
      WITH w AS (
        SELECT o_orderpriority,
               COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS f_cnt,
               COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS o_cnt,
               COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS p_cnt
        FROM orders GROUP BY o_orderpriority)
      SELECT o_orderpriority, status, n FROM (
        SELECT o_orderpriority, 'f_cnt' AS status, f_cnt AS n FROM w
        UNION ALL SELECT o_orderpriority, 'o_cnt', o_cnt FROM w
        UNION ALL SELECT o_orderpriority, 'p_cnt', p_cnt FROM w)
      ORDER BY o_orderpriority, status
      """.stripMargin.trim)
  ) { (s, dir) =>
    val wide = Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(col("o_orderpriority"),
        coalesce(col("F"), lit(0L)).as("f_cnt"),
        coalesce(col("O"), lit(0L)).as("o_cnt"),
        coalesce(col("P"), lit(0L)).as("p_cnt"))
    wide.unpivot(Array(col("o_orderpriority")),
        Array(col("f_cnt"), col("o_cnt"), col("p_cnt")), "status", "n")
      .orderBy("o_orderpriority", "status")
  }

  /** Histogram via width_bucket (Spark) == closed-form bucket arithmetic
    * (oracle) — fixed [0, 100000) domain, 20 buckets, integer outputs. */
  val qHistogram: Q = Q(
    "q_histogram",
    Some("""
      SELECT CAST(1 + floor(o_totalprice / 5000.0) AS INT) AS bucket,
             COUNT(*) AS n
      FROM orders
      WHERE o_totalprice >= 0 AND o_totalprice < 100000
      GROUP BY 1
      ORDER BY bucket
      """.stripMargin.trim)
  ) { (s, dir) =>
    Tables.orders(s, dir)
      .where(col("o_totalprice") >= 0 && col("o_totalprice") < 100000)
      .select(width_bucket(col("o_totalprice"), lit(0), lit(100000), lit(20))
        .cast("int").as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"))
      .orderBy("bucket")
  }

  /** Pearson correlation written as the closed-form over EXACT decimal
    * sums — deterministic across engines where the built-in `corr`'s
    * online float accumulation is not. */
  val qCorrExact: Q = Q(
    "q_corr_exact",
    Some("""
      WITH s AS (
        SELECT l_returnflag,
               COUNT(*) AS n,
               SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sx,
               SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS sy,
               SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS sxx,
               SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS syy,
               SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS sxy
        FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag,
             round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
                   (sqrt(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
                    sqrt(n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS r
      FROM s
      ORDER BY l_returnflag
      """.stripMargin.trim)
  ) { (s, dir) =>
    val q = dec(col("l_quantity")); val p = dec(col("l_extendedprice"))
    val st = Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(q).as("sx"), sum(p).as("sy"),
        sum(q * q).as("sxx"), sum(p * p).as("syy"), sum(q * p).as("sxy"))
    st.select(col("l_returnflag"),
      round((col("n") * col("sxy").cast("double") -
             col("sx").cast("double") * col("sy").cast("double")) /
        (sqrt(col("n") * col("sxx").cast("double") -
              col("sx").cast("double") * col("sx").cast("double")) *
         sqrt(col("n") * col("syy").cast("double") -
              col("sy").cast("double") * col("sy").cast("double"))), 6).as("r"))
      .orderBy("l_returnflag")
  }

  /** Distributed moments with deterministic floats: mean / population
    * variance / stddev per group, derived from exact DECIMAL power sums
    * (n, Σx, Σx²) instead of Spark's built-in `stddev` (whose streaming
    * Welford merge is partial-aggregation-order-dependent, so its last
    * bits differ run to run and engine to engine). The only float ops are
    * the final fixed expression tree over three exact scalars — identical
    * in both engines — rounded to 6 places like q_corr_exact.
    *
    * Scale: one map-side-combined hash agg; the shuffle carries 3 numbers
    * per (group × partition). This is also the incremental-maintenance
    * form: power sums merge associatively across deltas, Welford state
    * does too but not bit-reproducibly. */
  val qAggStats: Q = Q(
    "q_agg_stats",
    Some(s"""
      WITH s AS (
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(CAST(SUM(${decSql("l_quantity")}) AS VARCHAR(64)) AS DOUBLE) AS s1,
               CAST(CAST(SUM(${decSql("l_quantity")} * ${decSql("l_quantity")}) AS VARCHAR(64)) AS DOUBLE) AS s2
        FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag, n,
             ROUND(s1 / n, 6) AS mean_qty,
             ROUND((s2 - s1 * s1 / n) / n, 6) AS var_pop,
             ROUND(sqrt((s2 - s1 * s1 / n) / n), 6) AS stddev_pop
      FROM s ORDER BY l_returnflag
      """.stripMargin.trim)
  ) { (s, dir) =>
    val st = Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        dsum(col("l_quantity")).as("s1"),
        sum(dec(col("l_quantity")) * dec(col("l_quantity")))
          .cast("double").as("s2"))
    st.select(col("l_returnflag"), col("n"),
        round(col("s1") / col("n"), 6).as("mean_qty"),
        round((col("s2") - col("s1") * col("s1") / col("n")) / col("n"), 6)
          .as("var_pop"),
        round(sqrt((col("s2") - col("s1") * col("s1") / col("n")) / col("n")), 6)
          .as("stddev_pop"))
      .orderBy("l_returnflag")
  }

  /** KMV approximate distinct count, ORACLE-MATCHED: the Spark side runs
    * the mergeable [[graft.functions.KmvSketch]] aggregator (map-side
    * partials, ≤k doubles shuffled per group); the oracle reproduces the
    * identical estimate in pure SQL (k-th smallest distinct hash via a
    * window) — deterministic md5 hashing is what makes an *approximate*
    * sketch hash-comparable across engines. Exact COUNT(DISTINCT) rides
    * along as the accuracy exhibit: at 100 TB the sketch shuffles ≤64
    * doubles per group where COUNT(DISTINCT) reshuffles every value. */
  val qDistinctKmv: Q = Q(
    "q_distinct_kmv",
    Some("""
      WITH hashed AS (
        SELECT o_orderpriority, o_custkey,
               CAST(CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)),1,15)) AS BIGINT)
                    AS DOUBLE) / 1152921504606846976.0 AS u
        FROM orders),
      h AS (SELECT DISTINCT o_orderpriority, u FROM hashed),
      r AS (SELECT o_orderpriority, u,
                   ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY u) AS rn,
                   COUNT(*) OVER (PARTITION BY o_orderpriority) AS nd
            FROM h),
      exact AS (SELECT o_orderpriority,
                       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_distinct
                FROM hashed GROUP BY o_orderpriority)
      SELECT r.o_orderpriority,
             CAST(CASE WHEN r.nd < 64 THEN CAST(r.nd AS DOUBLE)
                       ELSE 63.0 / r.u END AS DOUBLE) AS approx_distinct,
             e.exact_distinct
      FROM r JOIN exact e ON r.o_orderpriority = e.o_orderpriority
      WHERE r.rn = CASE WHEN r.nd < 64 THEN r.nd ELSE 64 END
      ORDER BY r.o_orderpriority
      """.stripMargin.trim)
  ) { (s, dir) =>
    val kmv = udaf(new graft.functions.KmvSketch(64))
    Tables.orders(s, dir)
      .select(col("o_orderpriority"), col("o_custkey"),
        (conv(substring(md5(col("o_custkey").cast("string")), 1, 15), 16, 10)
          .cast("long").cast("double") / lit(1.152921504606846976e18)).as("u"))
      .groupBy("o_orderpriority")
      .agg(
        kmv(col("u")).as("approx_distinct"),
        countDistinct(col("o_custkey")).as("exact_distinct"))
      .orderBy("o_orderpriority")
  }

  /** Bloom-filter membership pruning, ORACLE-MATCHED — the runtime-filter
    * primitive: summarize the build side's join keys (BUILDING-segment
    * customers) into a 2048-bit mergeable [[graft.functions.BloomSketch]],
    * broadcast it, and classify every probe-side order BEFORE any shuffle.
    * Per priority: probe rows, bloom-positive rows, exact members (semi
    * join ground truth). bloom_pos ≥ exact_member always (no false
    * negatives); the gap IS the false positives, and because the hash
    * family is the portable (A,B,P) one, the oracle reproduces the exact
    * bit pattern — the FP count hash-matches, not just bounds.
    *
    * Scale: the build side aggregates to one 256-byte buffer (map-side OR
    * partials); the probe is a codegen'd bit test against a broadcast —
    * at 100 TB this drops non-matching fact rows at the scan, the same
    * plan shape AQE runtime filters produce.
    */
  val qBloomMember: Q = Q(
    "q_bloom_member",
    Some {
      val (m, k) = (BloomBits, BloomK)
      def posSql(i: Int, h: String) = s"(($h * ${A(i)} + ${B(i)}) % $P) % $m"
      val casePos = (0 until k).map(i =>
        s"WHEN $i THEN ${posSql(i, "h")}").mkString("CASE t.i ", " ", " END")
      s"""
      WITH bh AS (
        SELECT ${h60Sql("CAST(c_custkey AS VARCHAR)")} AS h
        FROM customer WHERE c_mktsegment = 'BUILDING'),
      bits AS (
        SELECT DISTINCT $casePos AS pos FROM bh, range(0, $k) t(i)),
      oh AS (
        SELECT o_orderkey, o_orderpriority, o_custkey,
               ${h60Sql("CAST(o_custkey AS VARCHAR)")} AS h
        FROM orders),
      op AS (
        SELECT o_orderkey, o_orderpriority, $casePos AS pos
        FROM oh, range(0, $k) t(i)),
      probe AS (
        SELECT op.o_orderkey, MIN(op.o_orderpriority) AS o_orderpriority,
               COUNT(b.pos) AS nhit
        FROM op LEFT JOIN bits b ON op.pos = b.pos
        GROUP BY op.o_orderkey),
      member AS (
        SELECT o.o_orderkey FROM orders o
        WHERE EXISTS (SELECT 1 FROM customer c
                      WHERE c.c_custkey = o.o_custkey
                        AND c.c_mktsegment = 'BUILDING'))
      SELECT p.o_orderpriority,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(CASE WHEN p.nhit = $k THEN 1 ELSE 0 END) AS BIGINT) AS bloom_pos,
             CAST(SUM(CASE WHEN m.o_orderkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS exact_member
      FROM probe p LEFT JOIN member m ON p.o_orderkey = m.o_orderkey
      GROUP BY p.o_orderpriority
      ORDER BY p.o_orderpriority
      """.stripMargin.trim
    }
  ) { (s, dir) =>
    val (m, k) = (BloomBits, BloomK)
    val bloom = udaf(new graft.functions.BloomSketch(m, k))
    val build = Tables.customer(s, dir)
      .filter(col("c_mktsegment") === "BUILDING")
    val bf = build.select(h60(col("c_custkey").cast("string")).as("h"))
      .agg(bloom(col("h")).as("bits"))
    val probe = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_custkey"),
        h60(col("o_custkey").cast("string")).as("h"))
    val hitExpr = (0 until k).map { i =>
      val pos = s"(((h * ${A(i)}) + ${B(i)}) % $P) % $m"
      s"((shiftright(element_at(bits, cast(($pos) DIV 64 AS INT) + 1), " +
        s"cast(($pos) % 64 AS INT)) & 1) = 1)"
    }.mkString(" AND ")
    probe.crossJoin(broadcast(bf))
      .withColumn("bloom_hit", expr(hitExpr))
      .join(build.select(col("c_custkey")), col("o_custkey") === col("c_custkey"), "left")
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n_orders"),
        sum(when(col("bloom_hit"), 1L).otherwise(0L)).as("bloom_pos"),
        sum(when(col("c_custkey").isNotNull, 1L).otherwise(0L)).as("exact_member"))
      .orderBy("o_orderpriority")
  }

  /** Winsorization: clip each group's values at its exact type-7 p5/p95
    * and report the clipped counts + winsorized mean — the outlier-
    * robust preprocessing step a training pipeline runs before scaling.
    * The interpolated percentiles are bit-identical between engines
    * (same type-7 arithmetic, pinned by q_percentile); clipped values go
    * through DECIMAL(18,6) so the mean is order-independent.
    *
    * Scale (VERDICT r7 item 1): the p5/p95 cutoffs come from
    * [[BinnedPercentile]]'s bounded-memory narrowing (O(bins) shuffled
    * state, bit-identical doubles), then broadcast back over the scan
    * for the clip/aggregate pass — no per-group value buffer anywhere
    * in the plan, so the same shape holds at 100 TB. */
  val qWinsorize: Q = Q(
    "q_winsorize",
    Some("""
      WITH pct AS (
        SELECT l_returnflag,
               quantile_cont(l_extendedprice, 0.05) AS p5,
               quantile_cont(l_extendedprice, 0.95) AS p95
        FROM lineitem GROUP BY l_returnflag)
      SELECT l.l_returnflag,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN l.l_extendedprice < p.p5 THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_low,
             CAST(SUM(CASE WHEN l.l_extendedprice > p.p95 THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_high,
             CAST(round(CAST(SUM(CAST(LEAST(GREATEST(l.l_extendedprice, p.p5), p.p95)
                                      AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6)
                  AS DOUBLE) AS win_mean
      FROM lineitem l JOIN pct p ON l.l_returnflag = p.l_returnflag
      GROUP BY l.l_returnflag
      ORDER BY l.l_returnflag
      """.stripMargin.trim)
  ) { (s, dir) =>
    val li = Tables.lineitem(s, dir)
    val pct = BinnedPercentile.wide(
      BinnedPercentile.perGroup(li, "l_returnflag", "l_extendedprice",
        Seq(0.05, 0.95)),
      Seq(0.05 -> "p5", 0.95 -> "p95"))
      .withColumnRenamed("g", "l_returnflag")
    li.join(broadcast(pct), "l_returnflag")
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("l_extendedprice") < col("p5"), 1L).otherwise(0L))
          .as("n_clip_low"),
        sum(when(col("l_extendedprice") > col("p95"), 1L).otherwise(0L))
          .as("n_clip_high"),
        round(sum(least(greatest(col("l_extendedprice"), col("p5")), col("p95"))
          .cast("decimal(18,6)")).cast("double") / count(lit(1)), 6)
          .cast("double").as("win_mean"))
      .orderBy("l_returnflag")
  }

  /** The Bloom runtime filter APPLIED — q_bloom_member classifies; this
    * query actually prunes: probe-side orders failing the broadcast bit
    * test are dropped BEFORE the join shuffle, then the survivors join
    * the build side for real. Because a Bloom filter has NO false
    * negatives, the result is provably identical to the plain join — and
    * that is exactly what the oracle computes (no bloom in the SQL at
    * all): a hash-match PROVES the pruning dropped only non-members.
    * BloomJoinSpec additionally asserts the filter sits below the
    * probe's exchange — the runtime-filter plan AQE generates, built by
    * hand from the mergeable sketch.
    *
    * Scale: at 100 TB the bit test (a codegen'd AND of 3 shifts against
    * a 256-byte broadcast) drops ~96% of non-matching fact rows at the
    * scan, so the join shuffles only survivors. */
  val qBloomJoin: Q = Q(
    "q_bloom_join",
    Some(s"""
      SELECT o.o_orderpriority,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             ${dsumSql("o.o_totalprice")} AS total
      FROM orders o JOIN customer c
        ON o.o_custkey = c.c_custkey AND c.c_mktsegment = 'BUILDING'
      GROUP BY o.o_orderpriority
      ORDER BY o.o_orderpriority
      """.stripMargin.trim)
  ) { (s, dir) => bloomPrunedJoin(s, dir) }

  /** The pruned join behind q_bloom_join (shared with BloomJoinSpec). */
  def bloomPrunedJoin(s: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame = {
    val (m, k) = (BloomBits, BloomK)
    val bloom = udaf(new graft.functions.BloomSketch(m, k))
    val build = Tables.customer(s, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val bf = build.select(h60(col("c_custkey").cast("string")).as("h"))
      .agg(bloom(col("h")).as("bits"))
    val hitExpr = (0 until k).map { i =>
      val pos = s"(((h * ${A(i)}) + ${B(i)}) % $P) % $m"
      s"((shiftright(element_at(bits, cast(($pos) DIV 64 AS INT) + 1), " +
        s"cast(($pos) % 64 AS INT)) & 1) = 1)"
    }.mkString(" AND ")
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_custkey"),
        col("o_totalprice"),
        h60(col("o_custkey").cast("string")).as("h"))
      .crossJoin(broadcast(bf))
      .where(expr(hitExpr)) // the runtime filter: prunes BEFORE the join
      .join(build, col("o_custkey") === col("c_custkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
      .orderBy("o_orderpriority")
  }

  /** Histogram-sketch bin width for q_quantile_hist (prices ≲ 110k ⇒
    * ~110 bins — constant per group, independent of row count). */
  val QuantileBinWidth = 1000

  /** Mergeable QUANTILE sketch — the fourth of the sketch family (KMV =
    * distinct, CMS = frequency, Bloom = membership, this = quantiles):
    * a fixed-width histogram whose (bin → count) rows form an additive
    * monoid, so partials merge map-side and across days/streams; the
    * p50/p90 read-out walks the cumulative counts to the bin containing
    * the quantile. Everything is integer arithmetic except one IEEE
    * `floor(x / width)`, identical in both engines — unlike t-digest or
    * GK, whose merge order would make an exact oracle impossible; the
    * trade is a fixed ±width/2 error instead of a rank guarantee.
    *
    * Scale: the agg shuffles ≤ bins rows per group per partition; the
    * cumulative window runs over the ~110-bin frame per group, never
    * the data. Read-out error is bounded by construction (asserted vs
    * exact percentiles in AggregatesSpec-style tests). */
  val qQuantileHist: Q = Q(
    "q_quantile_hist",
    Some(s"""
      WITH h AS (
        SELECT l_returnflag AS f,
               CAST(floor(l_extendedprice / $QuantileBinWidth) AS BIGINT) AS b,
               COUNT(*) AS c
        FROM lineitem GROUP BY f, b),
      t AS (SELECT f, SUM(c) AS n FROM h GROUP BY f),
      cum AS (
        SELECT h.f, h.b, h.c,
               SUM(h.c) OVER (PARTITION BY h.f ORDER BY h.b) AS cum, t.n
        FROM h JOIN t ON h.f = t.f),
      p50 AS (SELECT f, MIN(b) AS b50 FROM cum WHERE cum * 2 >= n GROUP BY f),
      p90 AS (SELECT f, MIN(b) AS b90 FROM cum WHERE cum * 10 >= 9 * n GROUP BY f)
      SELECT t.f AS l_returnflag,
             CAST(t.n AS BIGINT) AS n,
             CAST(p50.b50 * $QuantileBinWidth AS BIGINT) AS p50_lo,
             CAST(p90.b90 * $QuantileBinWidth AS BIGINT) AS p90_lo
      FROM t JOIN p50 ON t.f = p50.f JOIN p90 ON t.f = p90.f
      ORDER BY l_returnflag
      """.stripMargin.trim)
  ) { (s, dir) =>
    val h = Tables.lineitem(s, dir)
      .select(col("l_returnflag").as("f"),
        floor(col("l_extendedprice") / QuantileBinWidth).as("b"))
      .groupBy("f", "b").agg(count(lit(1)).as("c"))
    quantileReadOut(h)
      .select(col("f").as("l_returnflag"), col("n"), col("p50_lo"), col("p90_lo"))
      .orderBy("l_returnflag")
  }

  /** p50/p90 read-out over a (f, b, c) histogram frame — shared by the
    * batch q_quantile_hist and the streaming twin's spec (the streamed
    * state is the same additive frame, so the same read-out applies). */
  def quantileReadOut(h: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = h.groupBy("f").agg(sum("c").as("n"))
    val cum = h.join(t, "f")
      .withColumn("cum", sum("c").over(
        Window.partitionBy("f").orderBy("b")))
    val p50 = cum.where(col("cum") * 2 >= col("n"))
      .groupBy("f").agg(min("b").as("b50"))
    val p90 = cum.where(col("cum") * 10 >= lit(9) * col("n"))
      .groupBy("f").agg(min("b").as("b90"))
    t.join(p50, "f").join(p90, "f")
      .select(col("f"), col("n"),
        (col("b50") * QuantileBinWidth).as("p50_lo"),
        (col("b90") * QuantileBinWidth).as("p90_lo"))
  }

  override def all: Seq[Q] = Seq(qPercentile, qPivot, qMultiDistinct, qUnpivot,
    qHistogram, qCorrExact, qAggStats,
    qAggGroup, qAggGlobal, qAggDistinct, qAggHaving,
    qRollup, qCube, qGroupingSets, qDistinctKmv, qBloomMember, qWinsorize,
    qQuantileHist, qBloomJoin)
}
