package graft.operators

import graft.{Q, QueryPack, Tables}
import graft.QHelp._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators (SURVEY.md §2.2 q_join_*).
  *
  * Scale notes:
  *  - Equi joins shuffle both sides on the key and let Catalyst/AQE pick
  *    sort-merge vs shuffled-hash; dimension tables (customer, part,
  *    supplier, nation) are explicitly `broadcast()` where they join a fact
  *    table, so the 100 TB fact side never shuffles for those joins.
  *  - The theta join is restricted to two small dimensions — at scale a
  *    BroadcastNestedLoopJoin over a broadcastable side is the only sane
  *    plan, and that is what Catalyst produces here.
  *  - The as-of join deliberately avoids a range cross-join: it is the
  *    union + carry-forward technique (one shuffle on the key, one per-key
  *    sort) which scales linearly — see [[AsOf.asofJoin]].
  */
object Joins extends QueryPack {

  val qJoinInner: Q = Q(
    "q_join_inner",
    Some("""
      SELECT o_orderkey, c_custkey, c_name, o_totalprice
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE o_totalprice > 300000
      ORDER BY o_orderkey
      """.stripMargin.trim)
  ) { (s, dir) =>
    val o = Tables.orders(s, dir).where(col("o_totalprice") > 300000)
    val c = Tables.customer(s, dir)
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "inner")
      .select("o_orderkey", "c_custkey", "c_name", "o_totalprice")
      .orderBy("o_orderkey")
  }

  /** Left outer join with null-extended counts per customer. */
  val qJoinLeft: Q = Q(
    "q_join_left",
    Some("""
      SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders,
             CAST(CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 0) AS VARCHAR(64)) AS DOUBLE) AS total_spent
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey, c_name
      ORDER BY c_custkey
      """.stripMargin.trim)
  ) { (s, dir) =>
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        coalesce(sum(dec(col("o_totalprice"))), lit(0)).cast("double").as("total_spent"))
      .orderBy("c_custkey")
  }

  val qJoinSemi: Q = Q(
    "q_join_semi",
    Some("""
      SELECT c_custkey, c_name FROM customer
      WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
      ORDER BY c_custkey
      """.stripMargin.trim)
  ) { (s, dir) =>
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir).where(col("o_totalprice") > 400000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  val qJoinAnti: Q = Q(
    "q_join_anti",
    Some("""
      SELECT c_custkey, c_name FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      ORDER BY c_custkey
      """.stripMargin.trim)
  ) { (s, dir) =>
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir).where(col("o_orderpriority") === "1-URGENT")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** TPC-H Q3 shape: 3-way join + agg + top-k by revenue. */
  val qJoinMulti: Q = Q(
    "q_join_multi",
    Some("""
      SELECT l_orderkey,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2))) AS VARCHAR(64)) AS DOUBLE) AS revenue,
             o_orderdate
      FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        AND l_shipdate  > TIMESTAMP '1996-06-30 00:00:00'
      GROUP BY l_orderkey, o_orderdate
      ORDER BY revenue DESC, l_orderkey ASC
      LIMIT 10
      """.stripMargin.trim)
  ) { (s, dir) =>
    val c  = Tables.customer(s, dir).where(col("c_mktsegment") === "BUILDING")
    val o  = Tables.orders(s, dir)
      .where(col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
    val li = Tables.lineitem(s, dir)
      .where(col("l_shipdate") > lit("1996-06-30 00:00:00").cast("timestamp"))
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sum(dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount")))
        .cast("double").as("revenue"))
      .select("l_orderkey", "revenue", "o_orderdate")
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
  }

  /** Fact-side join against an explicitly broadcast dimension. */
  val qJoinBroadcast: Q = Q(
    "q_join_broadcast",
    Some("""
      SELECT p_brand,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR(64)) AS DOUBLE) AS sum_qty,
             COUNT(*) AS n_items
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand
      ORDER BY p_brand
      """.stripMargin.trim)
  ) { (s, dir) =>
    val li = Tables.lineitem(s, dir)
    val p  = Tables.part(s, dir)
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n_items"))
      .orderBy("p_brand")
  }

  /** Non-equi (theta) join over two small dimensions — the exact all-pairs
    * ground truth for `q_join_range_binned`. [[Guard.assertSmall]] makes
    * the "small dimensions" precondition enforceable: above 1 M rows a
    * side, the query fails fast pointing at the binned twin. */
  val qJoinTheta: Q = Q(
    "q_join_theta",
    Some("""
      SELECT p_partkey, s_suppkey
      FROM part, supplier
      WHERE p_size > s_suppkey * 2 AND p_size - s_suppkey < 12
      ORDER BY p_partkey, s_suppkey
      """.stripMargin.trim)
  ) { (s, dir) =>
    val p  = Guard.assertSmall(Tables.part(s, dir),
      "q_join_theta input `part`", "q_join_range_binned")
    val su = Guard.assertSmall(Tables.supplier(s, dir),
      "q_join_theta input `supplier`", "q_join_range_binned")
    p.join(su, p("p_size") > su("s_suppkey") * 2 &&
               p("p_size") - su("s_suppkey") < 12)
      .select("p_partkey", "s_suppkey")
      .orderBy("p_partkey", "s_suppkey")
  }

  /** As-of join: for every event, the most recent purchase by the same user
    * at or before it. Uses [[AsOf.asofJoin]] (union + carry-forward — no
    * range cross-join), with the event itself eligible when it is a
    * purchase. Oracle = the same carry-forward in window SQL.
    */
  val qJoinAsof: Q = Q(
    "q_join_asof",
    Some("""
      SELECT event_id, user_id, asof_purchase_id
      FROM (
        SELECT event_id, user_id,
               last_value(CASE WHEN event_type = 'purchase' THEN event_id END IGNORE NULLS)
                 OVER (PARTITION BY user_id
                       ORDER BY date_trunc('microseconds', ts), event_id
                       ROWS UNBOUNDED PRECEDING) AS asof_purchase_id
        FROM events)
      ORDER BY event_id
      """.stripMargin.trim)
  ) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("asof_purchase_id"))
    AsOf.asofJoin(
        left = ev.select("event_id", "user_id", "ts"),
        right = purchases,
        keyCols = Seq("user_id"), leftTime = "ts", rightTime = "ts",
        rightValueCols = Seq("asof_purchase_id"),
        leftTiebreak = Seq(col("event_id")),
        rightTiebreak = Seq(col("asof_purchase_id")))
      .select("event_id", "user_id", "asof_purchase_id")
      .orderBy("event_id")
  }

  /** Right outer join — null-extended customers with no orders. */
  val qJoinRight: Q = Q(
    "q_join_right",
    Some("""
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
      FROM orders o RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey
      ORDER BY c.c_custkey
      """.stripMargin.trim)
  ) { (s, dir) =>
    Tables.orders(s, dir).as("o")
      .join(Tables.customer(s, dir).as("c"),
        col("o.o_custkey") === col("c.c_custkey"), "right_outer")
      .groupBy(col("c.c_custkey"))
      .agg(count(col("o.o_orderkey")).as("n_orders"))
      .orderBy("c_custkey")
  }

  /** Full outer join — per-nation customer vs supplier counts with both
    * sides null-extendable. */
  val qJoinFull: Q = Q(
    "q_join_full",
    Some("""
      WITH c AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY 1),
      s AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY 1)
      SELECT coalesce(c.nk, s.nk) AS nationkey,
             coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
      FROM c FULL OUTER JOIN s ON c.nk = s.nk
      ORDER BY nationkey
      """.stripMargin.trim)
  ) { (s, dir) =>
    val c = Tables.customer(s, dir).groupBy(col("c_nationkey").as("nk"))
      .agg(count(lit(1)).as("n_cust"))
    val su = Tables.supplier(s, dir).groupBy(col("s_nationkey").as("nk"))
      .agg(count(lit(1)).as("n_supp"))
    c.as("c").join(su.as("s"), col("c.nk") === col("s.nk"), "full_outer")
      .select(coalesce(col("c.nk"), col("s.nk")).as("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      .orderBy("nationkey")
  }

  /** Salted skew join (Skew.saltedJoin): identical semantics to the plain
    * inner join — the oracle IS the unsalted SQL — with the hot-key rows
    * spread across 8 sub-keys. */
  val qJoinSalted: Q = Q(
    "q_join_salted",
    Some("""
      SELECT o.o_custkey, COUNT(*) AS n,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR(64)) AS DOUBLE) AS rev
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY o.o_custkey
      ORDER BY o.o_custkey
      """.stripMargin.trim)
  ) { (s, dir) =>
    Skew.saltedJoin(Tables.orders(s, dir), Tables.customer(s, dir),
        "o_custkey", "c_custkey", salts = 8)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("o_totalprice"))).cast("double").as("rev"))
      .orderBy("o_custkey")
  }

  /** q_join_theta's scale-safe twin: the same band predicate
    * (`p_size > 2*s_suppkey AND p_size - s_suppkey < 12`, i.e. p_size in
    * the integer interval [2s+1, s+11]) executed as a binned range join
    * (see [[RangeJoin]]) — a hash equi-join on bin ids instead of the
    * broadcast nested-loop plan the raw theta predicate gets. Same kind
    * of exact/scalable pairing as q_embed_neardup / _lsh. */
  val qJoinRangeBinned: Q = Q(
    "q_join_range_binned",
    Some("""
      SELECT p_partkey, s_suppkey
      FROM part, supplier
      WHERE p_size BETWEEN s_suppkey * 2 + 1 AND s_suppkey + 11
      ORDER BY p_partkey, s_suppkey
      """.stripMargin.trim)
  ) { (s, dir) =>
    val p  = Tables.part(s, dir)
    val su = Tables.supplier(s, dir)
    RangeJoin.pointInInterval(
        p.select("p_partkey", "p_size"), col("p_size"),
        su.select("s_suppkey"),
        col("s_suppkey") * 2 + 1, col("s_suppkey") + 11,
        binWidth = 8)
      .select("p_partkey", "s_suppkey")
      .orderBy("p_partkey", "s_suppkey")
  }

  /** Fuzzy string join (entity resolution): near-matching part names
    * within edit distance 3, under deterministic prefix blocking —
    * `substr(name,1,2)` equality is part of the DECLARED semantics (the
    * oracle expresses it too), which is what makes the op scale: the
    * equality is extracted as the hash-join key, the Levenshtein runs
    * only within blocks, never all-pairs. Dedup-names-first keeps the
    * comparison space at distinct entities, the standard record-linkage
    * shape. Distances are integers — engine-exact. */
  val qFuzzyJoin: Q = Q(
    "q_fuzzy_join",
    Some("""
      WITH n AS (SELECT DISTINCT p_name FROM part)
      SELECT a.p_name AS name_a, b.p_name AS name_b,
             CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
      FROM n a JOIN n b
        ON substr(a.p_name, 1, 2) = substr(b.p_name, 1, 2)
       AND a.p_name < b.p_name
      WHERE levenshtein(a.p_name, b.p_name) <= 3
      ORDER BY name_a, name_b
      """.stripMargin.trim)
  ) { (s, dir) =>
    val n = Tables.part(s, dir).select("p_name").distinct()
    val a = n.select(col("p_name").as("name_a"))
    val b = n.select(col("p_name").as("name_b"))
    a.join(b, substring(col("name_a"), 1, 2) === substring(col("name_b"), 1, 2) &&
        col("name_a") < col("name_b"))
      .where(levenshtein(col("name_a"), col("name_b")) <= 3)
      .select(col("name_a"), col("name_b"),
        levenshtein(col("name_a"), col("name_b")).cast("long").as("dist"))
      .orderBy("name_a", "name_b")
  }

  override def all: Seq[Q] = Seq(
    qJoinInner, qJoinLeft, qJoinRight, qJoinFull, qJoinSemi, qJoinAnti,
    qJoinMulti, qJoinBroadcast, qJoinTheta, qJoinAsof, qJoinSalted,
    qJoinRangeBinned, qFuzzyJoin)
}

/** Generic as-of join via the union + carry-forward technique.
  *
  * Semantics: for each left row, attach the right row with the greatest
  * `rightTime <= leftTime` within the same key (ties: the right row wins —
  * "at or before"). This is the reference consumer's "state at time t"
  * question over a CDC stream (reference `examples/main.cpp:29-43` leaves
  * it to the application).
  *
  * Scale: one shuffle on `keyCols` + one per-key sort — linear in input, no
  * range cross-join, no per-key collect. This is the plan you want at
  * 100 TB; a broadcast-range-join alternative only wins when the right side
  * is tiny.
  */
object AsOf {
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTime: String,
      rightTime: String,
      rightValueCols: Seq[String],
      leftTiebreak: Seq[org.apache.spark.sql.Column] = Nil,
      rightTiebreak: Seq[org.apache.spark.sql.Column] = Nil): DataFrame = {
    // Materialize per-side tiebreak columns before the union so ties at
    // equal (key, time) are broken deterministically on BOTH sides.
    val nTb = math.max(leftTiebreak.size, rightTiebreak.size)
    def withTb(df: DataFrame, tb: Seq[org.apache.spark.sql.Column]): DataFrame =
      (0 until nTb).foldLeft(df)((d, i) =>
        d.withColumn(s"__tb$i", tb.lift(i).getOrElse(lit(null))))
    val l = withTb(
      left.withColumn("__side", lit(1)).withColumn("__t", col(leftTime)),
      leftTiebreak)
    val nulls = rightValueCols.foldLeft(l)((df, c) =>
      if (df.columns.contains(c)) df else df.withColumn(c, lit(null)))
    val r = withTb(
      right.withColumn("__side", lit(0)).withColumn("__t", col(rightTime)),
      rightTiebreak)
    val lCols = nulls.columns.toSeq
    val rAligned = lCols.foldLeft(r)((df, c) =>
      if (df.columns.contains(c)) df else df.withColumn(c, lit(null)))
      .select(lCols.map(col): _*)
    val unioned = nulls.select(lCols.map(col): _*).unionByName(rAligned)
    // Right rows sort before left rows at equal time (__side 0 < 1), so an
    // exactly-simultaneous right row is visible to the left row.
    val ord = Seq(col("__t").asc, col("__side").asc) ++
      (0 until nTb).map(i => col(s"__tb$i").asc)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightValueCols.foldLeft(unioned)((df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
    val dropCols = Seq("__side", "__t") ++ (0 until nTb).map(i => s"__tb$i")
    carried.where(col("__side") === 1).drop(dropCols: _*)
  }
}
