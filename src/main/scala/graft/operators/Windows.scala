package graft.operators

import graft.{Q, QueryPack, Tables}
import graft.QHelp._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window / analytic operators (SURVEY.md §2.2 q_win_*, q_topk_per_group,
  * q_win_tumble_batch).
  *
  * Scale notes: every window here partitions by a real key (mktsegment,
  * custkey, user_id) — one hash shuffle + per-partition sort, no global
  * ordering until the final presentation ORDER BY. Running sums are
  * computed over exact decimals so partial ordering can't perturb floats.
  * The tumbling window is the built-in `window()` function — at 100 TB the
  * same expression runs under Structured Streaming with a watermark
  * (see graft.streaming).
  */
object Windows extends QueryPack {

  val qWinRank: Q = Q(
    "q_win_rank",
    Some("""
      SELECT c_custkey, c_mktsegment, c_acctbal,
             row_number() OVER w AS rn,
             rank()       OVER w AS rnk,
             dense_rank() OVER w AS drnk
      FROM customer
      WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC)
      ORDER BY c_mktsegment, rn
      """.stripMargin.trim)
  ) { (s, dir) =>
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    Tables.customer(s, dir)
      .select(
        col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
        row_number().over(w).as("rn"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"))
      .withColumn("rn", col("rn").cast("long"))
      .orderBy(col("c_mktsegment"), col("rn"))
  }

  /** Running (cumulative) revenue per customer, frame = rows unbounded
    * preceding .. current. */
  val qWinRunning: Q = Q(
    "q_win_running",
    Some("""
      SELECT o_custkey, o_orderkey,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
               OVER (PARTITION BY o_custkey
                     ORDER BY o_orderdate ASC, o_orderkey ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR(64)) AS DOUBLE) AS running_total
      FROM orders
      ORDER BY o_custkey, o_orderkey
      """.stripMargin.trim)
  ) { (s, dir) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, dir)
      .select(
        col("o_custkey"), col("o_orderkey"),
        sum(dec(col("o_totalprice"))).over(w).cast("double").as("running_total"))
      .orderBy("o_custkey", "o_orderkey")
  }

  val qWinLagLead: Q = Q(
    "q_win_lag_lead",
    Some("""
      SELECT o_custkey, o_orderkey, o_totalprice,
             lag(o_totalprice)  OVER w AS prev_price,
             lead(o_totalprice) OVER w AS next_price
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
      ORDER BY o_custkey, o_orderkey
      """.stripMargin.trim)
  ) { (s, dir) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    Tables.orders(s, dir)
      .select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Top-3 orders per customer by price (deterministic tiebreak). */
  val qTopkPerGroup: Q = Q(
    "q_topk_per_group",
    Some("""
      SELECT o_custkey, o_orderkey, o_totalprice, rn
      FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        FROM orders)
      WHERE rn <= 3
      ORDER BY o_custkey, rn
      """.stripMargin.trim)
  ) { (s, dir) =>
    // the custom bounded-heap operator (graft.plans.TopKPerGroup) does the
    // heavy lifting — O(n log k), no full per-group sort; ranking the k
    // survivors afterwards is k rows per group, so the window is cheap
    val orders = Tables.orders(s, dir)
    val top = graft.plans.TopK.perGroup(orders, 3, Seq("o_custkey"),
      Seq(orders("o_totalprice").desc, orders("o_orderkey").asc))
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    top.withColumn("rn", row_number().over(w))
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
              col("rn").cast("long").as("rn"))
      .orderBy("o_custkey", "rn")
  }

  /** Tumbling 1-minute windows over events (batch twin of s_win_tumble). */
  val qWinTumbleBatch: Q = Q(
    "q_win_tumble_batch",
    Some("""
      SELECT time_bucket(INTERVAL '1 minute', ts) AS window_start,
             event_type,
             COUNT(*) AS n,
             CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS VARCHAR(64)) AS DOUBLE) AS sum_value
      FROM events
      GROUP BY 1, 2
      ORDER BY window_start, event_type
      """.stripMargin.trim)
  ) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 minute"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("window_start", "event_type")
  }

  /** Sliding 2-minute windows advancing by 1 minute (batch twin of
    * s_win_slide): every event belongs to exactly length/slide = 2
    * overlapping windows. The oracle reproduces Spark's epoch-aligned
    * window expansion by cross-joining each event with offsets {0,1}
    * minutes back from its 1-minute bucket. */
  val qWinSlideBatch: Q = Q(
    "q_win_slide_batch",
    Some("""
      SELECT time_bucket(INTERVAL '1 minute', ts) - k * INTERVAL '1 minute'
               AS window_start,
             event_type,
             COUNT(*) AS n,
             CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS VARCHAR(64)) AS DOUBLE) AS sum_value
      FROM events CROSS JOIN (VALUES (0), (1)) t(k)
      GROUP BY 1, 2
      ORDER BY window_start, event_type
      """.stripMargin.trim)
  ) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "2 minutes", "1 minute"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("window_start", "event_type")
  }

  /** Per-user session windows (5-minute inactivity gap) over the events
    * stream table — `session_window` in batch mode; the streaming twin is
    * the same expression under a watermark. Timestamps are truncated to
    * seconds first so Spark-µs vs DuckDB-ns precision can't move a
    * boundary; a gap of exactly 5 min starts a NEW session in both
    * formulations (Spark session intervals are [start, end)). */
  val qSessionWindow: Q = Q(
    "q_session_window",
    Some("""
      WITH e AS (SELECT user_id, date_trunc('second', ts) AS ts FROM events),
      x AS (SELECT user_id, ts,
                   -- STRICT >: an event at exactly prev+gap still merges
                   -- (Spark's session_window closes at last_event + gap
                   -- inclusive of a boundary arrival — verified at sf0.1,
                   -- where two exactly-300s gaps split under >=)
                   CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 5 MINUTE
                        THEN 1 ELSE 0 END AS new_s
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      y AS (SELECT user_id, ts,
                   SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
            FROM x)
      SELECT user_id, min(ts) AS session_start,
             max(ts) + INTERVAL 5 MINUTE AS session_end,
             COUNT(*) AS n_events
      FROM y GROUP BY user_id, sid
      ORDER BY user_id, session_start
      """.stripMargin.trim)
  ) { (s, dir) =>
    Tables.events(s, dir)
      .select(col("user_id"), date_trunc("second", col("ts")).as("ts"))
      .groupBy(col("user_id"), session_window(col("ts"), "5 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))
      .orderBy("user_id", "session_start")
  }

  /** RANGE frame: 30-day trailing revenue per customer — a value-based
    * frame (vs q_win_running's row-based one), ordered on a day number so
    * both engines frame identically. */
  val qWinRange: Q = Q(
    "q_win_range",
    Some("""
      SELECT o_custkey, o_orderkey,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
               PARTITION BY o_custkey
               ORDER BY datediff('day', DATE '1992-01-01', o_orderdate)
               RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS VARCHAR(64)) AS DOUBLE) AS rev_30d
      FROM orders
      ORDER BY o_custkey, o_orderkey
      """.stripMargin.trim)
  ) { (s, dir) =>
    val dayNo = datediff(col("o_orderdate"), lit("1992-01-01").cast("date"))
    val w = Window.partitionBy(col("o_custkey")).orderBy(dayNo)
      .rangeBetween(-30, Window.currentRow)
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        sum(dec(col("o_totalprice"))).over(w).cast("double").as("rev_30d"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Distribution analytics: ntile / percent_rank / cume_dist per market
    * segment (ratios of ranks — deterministic doubles). */
  val qWinNtile: Q = Q(
    "q_win_ntile",
    Some("""
      SELECT c_custkey, c_mktsegment,
             ntile(4) OVER w AS quartile,
             percent_rank() OVER w AS pr,
             cume_dist() OVER w AS cd
      FROM customer
      WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
      ORDER BY c_mktsegment, c_custkey
      """.stripMargin.trim)
  ) { (s, dir) =>
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_mktsegment"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .orderBy("c_mktsegment", "c_custkey")
  }

  /** first_value / last_value / nth_value over a running frame. */
  val qWinFirstLast: Q = Q(
    "q_win_first_last",
    Some("""
      SELECT o_custkey, o_orderkey,
             first_value(o_orderkey) OVER w AS first_ord,
             last_value(o_orderkey)  OVER w AS last_ord,
             nth_value(o_orderkey, 2) OVER w AS second_ord
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      ORDER BY o_custkey, o_orderkey
      """.stripMargin.trim)
  ) { (s, dir) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        first(col("o_orderkey")).over(w).as("first_ord"),
        last(col("o_orderkey")).over(w).as("last_ord"),
        nth_value(col("o_orderkey"), 2).over(w).as("second_ord"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Relative-position analytics: percent_rank + cume_dist per nation
    * over supplier balances. The s_suppkey tiebreak makes the frame
    * total, so both functions are exact small-integer ratios — the same
    * IEEE division in both engines, rounded to 6 like the other float
    * outputs. Scale: one shuffle on the partition key + per-key sort. */
  val qWinCume: Q = Q(
    "q_win_cume",
    Some("""
      SELECT s_nationkey, s_suppkey,
             ROUND(percent_rank() OVER w, 6) AS pr,
             ROUND(cume_dist() OVER w, 6) AS cd
      FROM supplier
      WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey)
      ORDER BY s_nationkey, s_suppkey
      """.stripMargin.trim)
  ) { (s, dir) =>
    val w = Window.partitionBy(col("s_nationkey"))
      .orderBy(col("s_acctbal"), col("s_suppkey"))
    Tables.supplier(s, dir)
      .select(col("s_nationkey"), col("s_suppkey"),
        round(percent_rank().over(w), 6).as("pr"),
        round(cume_dist().over(w), 6).as("cd"))
      .orderBy("s_nationkey", "s_suppkey")
  }

  override def all: Seq[Q] = Seq(
    qWinRank, qWinRunning, qWinLagLead, qTopkPerGroup, qWinTumbleBatch,
    qWinSlideBatch, qSessionWindow, qWinRange, qWinNtile, qWinFirstLast,
    qWinCume)
}
