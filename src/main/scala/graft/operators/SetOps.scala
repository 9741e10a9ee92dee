package graft.operators

import graft.{Q, QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Set operators (SURVEY.md §2.2 q_union_*, q_intersect, q_except).
  *
  * Scale notes: UNION ALL is a zero-shuffle concatenation of partitions;
  * the distinct variants shuffle once on the full row hash. INTERSECT /
  * EXCEPT compile to aggregate + semi/anti joins — at 100 TB keep the
  * projected columns narrow (they are: key + segment).
  */
object SetOps extends QueryPack {

  private def slices(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val o = Tables.orders(s, dir)
    val a = o.where(col("o_orderpriority") === "1-URGENT")
      .select("o_custkey", "o_orderstatus")
    val b = o.where(col("o_totalprice") > 350000)
      .select("o_custkey", "o_orderstatus")
    (a, b)
  }

  private val sliceSqlA = "SELECT o_custkey, o_orderstatus FROM orders WHERE o_orderpriority = '1-URGENT'"
  private val sliceSqlB = "SELECT o_custkey, o_orderstatus FROM orders WHERE o_totalprice > 350000"

  val qUnionAll: Q = Q(
    "q_union_all",
    Some(s"""
      SELECT o_custkey, o_orderstatus, COUNT(*) AS n FROM (
        $sliceSqlA UNION ALL $sliceSqlB)
      GROUP BY 1, 2 ORDER BY o_custkey, o_orderstatus
      """.stripMargin.trim)
  ) { (s, dir) =>
    val (a, b) = slices(s, dir)
    a.unionAll(b)
      .groupBy("o_custkey", "o_orderstatus").agg(count(lit(1)).as("n"))
      .orderBy("o_custkey", "o_orderstatus")
  }

  val qUnionDistinct: Q = Q(
    "q_union_distinct",
    Some(s"""
      SELECT o_custkey, o_orderstatus FROM (
        $sliceSqlA UNION $sliceSqlB)
      ORDER BY o_custkey, o_orderstatus
      """.stripMargin.trim)
  ) { (s, dir) =>
    val (a, b) = slices(s, dir)
    a.union(b).distinct()
      .orderBy("o_custkey", "o_orderstatus")
  }

  val qIntersect: Q = Q(
    "q_intersect",
    Some(s"""
      SELECT o_custkey, o_orderstatus FROM (
        $sliceSqlA INTERSECT $sliceSqlB)
      ORDER BY o_custkey, o_orderstatus
      """.stripMargin.trim)
  ) { (s, dir) =>
    val (a, b) = slices(s, dir)
    a.intersect(b)
      .orderBy("o_custkey", "o_orderstatus")
  }

  val qExcept: Q = Q(
    "q_except",
    Some(s"""
      SELECT o_custkey, o_orderstatus FROM (
        $sliceSqlA EXCEPT $sliceSqlB)
      ORDER BY o_custkey, o_orderstatus
      """.stripMargin.trim)
  ) { (s, dir) =>
    val (a, b) = slices(s, dir)
    a.except(b)
      .orderBy("o_custkey", "o_orderstatus")
  }

  /** Bag semantics: INTERSECT ALL keeps min(multiplicity). */
  val qIntersectAll: Q = Q(
    "q_intersect_all",
    Some("""
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      INTERSECT ALL
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      ORDER BY o_custkey
      """.stripMargin.trim)
  ) { (s, dir) =>
    val o = Tables.orders(s, dir)
    o.where(col("o_orderstatus") === "O").select("o_custkey")
      .intersectAll(o.where(col("o_orderstatus") === "F").select("o_custkey"))
      .orderBy("o_custkey")
  }

  /** Bag semantics: EXCEPT ALL subtracts multiplicities. */
  val qExceptAll: Q = Q(
    "q_except_all",
    Some("""
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      EXCEPT ALL
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      ORDER BY o_custkey
      """.stripMargin.trim)
  ) { (s, dir) =>
    val o = Tables.orders(s, dir)
    o.where(col("o_orderstatus") === "O").select("o_custkey")
      .exceptAll(o.where(col("o_orderstatus") === "F").select("o_custkey"))
      .orderBy("o_custkey")
  }

  override def all: Seq[Q] = Seq(qUnionAll, qUnionDistinct, qIntersect, qExcept,
    qIntersectAll, qExceptAll)
}
