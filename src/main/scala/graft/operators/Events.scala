package graft.operators

import graft.{Q, QueryPack, Tables}
import graft.QHelp._
import org.apache.spark.sql.functions._

/** Event-stream analytics over the `events` changelog table — the
  * behavioral queries a consumer of the reference connector (reference
  * `examples/main.cpp:29-43` leaves all downstream computation to the
  * application) runs once change events land: funnel conversion, cohort
  * retention, gap-filled activity series, and exact statistical outlier
  * detection.
  *
  * Timestamp discipline (FIXTURES.md): `events.ts` is nanosecond parquet;
  * Spark truncates to µs. Every comparison here happens on µs epoch longs
  * (`unix_micros` / DuckDB `epoch_us(CAST(ts AS TIMESTAMP))` — the CAST
  * floors ns→µs, and flooring composes, so both engines see identical
  * integers) or on whole dates.
  *
  * Scale notes: every query below is equi-join + hash-agg only — no
  * windows over few-partition keys, no cartesian shapes. Funnel stages
  * strictly shrink left-to-right, so each successive join is smaller;
  * retention/gap-fill shuffle once on (user, day); anomaly broadcasts a
  * 5-row stats side. All aggregates are map-side combinable.
  */
object Events extends QueryPack {

  /** Funnel analysis: users who viewed, then clicked at-or-after their
    * first view, then purchased at-or-after that first qualifying click.
    * The canonical event-sequence query over a CDC-fed activity table.
    *
    * Shape: per-stage min-timestamp aggregation + equi-join on user_id;
    * each stage's input is the previous stage's survivors, so the join
    * sides shrink monotonically. At 100 TB each stage is one shuffle on
    * user_id; AQE would broadcast the later (small) stage frames.
    */
  val qFunnel: Q = Q(
    "q_funnel",
    Some("""
      WITH e AS (
        SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us
        FROM events),
      v AS (SELECT user_id, MIN(us) AS t1 FROM e
            WHERE event_type = 'view' GROUP BY user_id),
      c AS (SELECT e.user_id, MIN(e.us) AS t2 FROM e
            JOIN v ON e.user_id = v.user_id
            WHERE e.event_type = 'click' AND e.us >= v.t1
            GROUP BY e.user_id),
      p AS (SELECT e.user_id, MIN(e.us) AS t3 FROM e
            JOIN c ON e.user_id = c.user_id
            WHERE e.event_type = 'purchase' AND e.us >= c.t2
            GROUP BY e.user_id)
      SELECT * FROM (
        SELECT 1 AS stage, 'view' AS event_type,
               CAST(COUNT(*) AS BIGINT) AS users FROM v
        UNION ALL
        SELECT 2 AS stage, 'click' AS event_type,
               CAST(COUNT(*) AS BIGINT) AS users FROM c
        UNION ALL
        SELECT 3 AS stage, 'purchase' AS event_type,
               CAST(COUNT(*) AS BIGINT) AS users FROM p)
      ORDER BY stage
      """.stripMargin.trim)
  ) { (s, dir) =>
    val e = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val v = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("us").as("t1"))
    val c = e.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("us") >= col("t1"))
      .groupBy("user_id").agg(min("us").as("t2"))
    val p = e.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("us") >= col("t2"))
      .groupBy("user_id").agg(min("us").as("t3"))
    def stage(df: org.apache.spark.sql.DataFrame, n: Int, ty: String) =
      df.agg(count(lit(1)).as("users"))
        .select(lit(n).as("stage"), lit(ty).as("event_type"), col("users"))
    stage(v, 1, "view")
      .unionAll(stage(c, 2, "click"))
      .unionAll(stage(p, 3, "purchase"))
      .orderBy("stage")
  }

  /** Cohort retention: users grouped by first-activity date; for each
    * (cohort, day-offset) the count of cohort members active that day.
    * Dates are whole days, so ns-vs-µs precision is moot.
    *
    * Scale: two hash aggs on user_id / (user_id, day) + one equi-join —
    * the classic one-shuffle retention matrix; no windows, no skew keys
    * (cohort fans out over days).
    */
  val qRetention: Q = Q(
    "q_retention",
    Some("""
      WITH f AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort
        FROM events GROUP BY user_id),
      a AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events)
      SELECT f.cohort,
             CAST(date_diff('day', f.cohort, a.d) AS INT) AS offset_days,
             CAST(COUNT(*) AS BIGINT) AS active_users
      FROM a JOIN f ON a.user_id = f.user_id
      GROUP BY f.cohort, offset_days
      ORDER BY cohort, offset_days
      """.stripMargin.trim)
  ) { (s, dir) =>
    val e = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("d"))
    val f = e.groupBy("user_id").agg(min("d").as("cohort"))
    val a = e.distinct()
    a.join(f, "user_id")
      .select(col("cohort"), datediff(col("d"), col("cohort")).as("offset_days"))
      .groupBy("cohort", "offset_days")
      .agg(count(lit(1)).as("active_users"))
      .orderBy("cohort", "offset_days")
  }

  /** Gap-filled daily activity series: per-user daily event counts with
    * missing days emitted as explicit zeros between each user's first and
    * last active day — the time-series densification step a downstream
    * forecaster needs (user_id < 25 keeps the fixture output bounded; the
    * shape is per-key, so the bound is a filter, not a design limit).
    *
    * Scale: `sequence(d0, d1)` explodes at most span-days rows per user —
    * output-proportional, never cartesian; the final left join is on the
    * same (user_id, d) key as the count agg, so the exchange is reused.
    */
  val qGapFill: Q = Q(
    "q_gap_fill",
    Some("""
      WITH d AS (
        SELECT user_id, CAST(ts AS DATE) AS d FROM events WHERE user_id < 25),
      cnt AS (
        SELECT user_id, d, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM d GROUP BY user_id, d),
      span AS (SELECT user_id, MIN(d) AS d0, MAX(d) AS d1 FROM d GROUP BY user_id),
      days AS (
        SELECT user_id, CAST(UNNEST(generate_series(CAST(d0 AS TIMESTAMP),
                                                    CAST(d1 AS TIMESTAMP),
                                                    INTERVAL 1 DAY)) AS DATE) AS d
        FROM span)
      SELECT days.user_id, days.d,
             CAST(COALESCE(cnt.cnt, 0) AS BIGINT) AS cnt
      FROM days LEFT JOIN cnt ON days.user_id = cnt.user_id AND days.d = cnt.d
      ORDER BY days.user_id, days.d
      """.stripMargin.trim)
  ) { (s, dir) =>
    val d = Tables.events(s, dir).filter(col("user_id") < 25)
      .select(col("user_id"), to_date(col("ts")).as("d"))
    val cnt = d.groupBy("user_id", "d").agg(count(lit(1)).as("cnt"))
    val days = d.groupBy("user_id")
      .agg(min("d").as("d0"), max("d").as("d1"))
      .select(col("user_id"), explode(sequence(col("d0"), col("d1"))).as("d"))
    days.join(cnt, Seq("user_id", "d"), "left")
      .select(col("user_id"), col("d"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))
      .orderBy("user_id", "d")
  }

  /** Exact statistical outlier detection: events whose value deviates
    * from their event_type's mean by more than 2 population stddevs —
    * with the test evaluated EXACTLY. The power sums (n, Σx, Σx²) are
    * accumulated in DECIMAL (order-independent, engine-identical), and
    * the 2σ test is the division-free integer-style form
    * `(x·n − s1)² > 4·(n·s2 − s1²)` — the same fixed double expression
    * tree over identical inputs in both engines, so the boundary cases
    * cannot flip between Spark and DuckDB the way a Welford-merged
    * `stddev` could.
    *
    * Scale: one map-side-combined hash agg to a 5-row stats frame,
    * broadcast back over the fact scan — no second shuffle, no window.
    */
  val qAnomaly: Q = Q(
    "q_anomaly",
    Some(s"""
      WITH st AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(CAST(SUM(${decSql("value")}) AS VARCHAR(64)) AS DOUBLE) AS s1,
               CAST(CAST(SUM(${decSql("value")} * ${decSql("value")}) AS VARCHAR(64)) AS DOUBLE) AS s2
        FROM events GROUP BY event_type),
      x AS (
        SELECT e.event_type, e.event_id,
               CAST(${decSql("e.value")} AS DOUBLE) AS v,
               st.n, st.s1, st.s2
        FROM events e JOIN st ON e.event_type = st.event_type)
      SELECT event_type, event_id, ROUND(v, 2) AS value
      FROM x
      WHERE (v * n - s1) * (v * n - s1) > 4 * (n * s2 - s1 * s1)
      ORDER BY event_type, event_id
      """.stripMargin.trim)
  ) { (s, dir) =>
    val e = Tables.events(s, dir)
      .select(col("event_type"), col("event_id"),
        dec(col("value")).cast("double").as("v"))
    val st = e.groupBy("event_type").agg(
      count(lit(1)).as("n"),
      sum(dec(col("v"))).cast("double").as("s1"),
      sum(dec(col("v")) * dec(col("v"))).cast("double").as("s2"))
    e.join(broadcast(st), "event_type")
      .filter((col("v") * col("n") - col("s1")) * (col("v") * col("n") - col("s1"))
        > lit(4) * (col("n") * col("s2") - col("s1") * col("s1")))
      .select(col("event_type"), col("event_id"), round(col("v"), 2).as("value"))
      .orderBy("event_type", "event_id")
  }

  override def all: Seq[Q] = Seq(qFunnel, qRetention, qGapFill, qAnomaly)
}
