package graft

import org.apache.spark.sql.functions._
import graft.operators._

class M1Spec extends SparkSpec {
  import spark.implicits._

  test("asofJoin picks latest right row at-or-before left time, per key") {
    val left = Seq(
      (1L, 10L, "2024-01-01 00:00:05"),
      (2L, 10L, "2024-01-01 00:00:15"),
      (3L, 20L, "2024-01-01 00:00:10"),
      (4L, 30L, "2024-01-01 00:00:10")
    ).toDF("id", "k", "t").withColumn("t", col("t").cast("timestamp"))
    val right = Seq(
      (10L, "2024-01-01 00:00:05", 100L), // exactly simultaneous -> matches id=1
      (10L, "2024-01-01 00:00:12", 101L),
      (20L, "2024-01-01 00:00:11", 200L)  // after left -> no match
    ).toDF("k", "t", "v").withColumn("t", col("t").cast("timestamp"))
    val out = AsOf.asofJoin(left, right, Seq("k"), "t", "t", Seq("v"),
        leftTiebreak = Seq(col("id")), rightTiebreak = Seq(col("v")))
      .select("id", "v").as[(Long, Option[Long])].collect().toMap
    assert(out == Map(1L -> Some(100L), 2L -> Some(101L), 3L -> None, 4L -> None))
  }

  test("approx_count_distinct tracks the exact distinct count") {
    val li = Tables.lineitem(spark, sf)
    val exact  = li.select(countDistinct("l_partkey")).head.getLong(0)
    val approx = li.select(approx_count_distinct("l_partkey", 0.02)).head.getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("set ops are consistent: |A∪B| + |A∩B| == |A| + |B| (distinct slices)") {
    val union     = SetOps.qUnionDistinct.build(spark, sf).count()
    val intersect = SetOps.qIntersect.build(spark, sf).count()
    val o = Tables.orders(spark, sf)
    val a = o.where(col("o_orderpriority") === "1-URGENT")
      .select("o_custkey", "o_orderstatus").distinct().count()
    val b = o.where(col("o_totalprice") > 350000)
      .select("o_custkey", "o_orderstatus").distinct().count()
    assert(union + intersect == a + b)
  }

  test("semi + anti partition customers against the urgent-orders predicate") {
    val semiUrgent = Tables.customer(spark, sf).join(
      Tables.orders(spark, sf).where(col("o_orderpriority") === "1-URGENT"),
      col("c_custkey") === col("o_custkey"), "left_semi").count()
    val anti = Joins.qJoinAnti.build(spark, sf).count()
    val total = Tables.customer(spark, sf).count()
    assert(semiUrgent + anti == total)
  }

  test("q_topk_per_group emits at most 3 rows per customer, ranks 1..n") {
    val df = Windows.qTopkPerGroup.build(spark, sf)
    val bad = df.groupBy("o_custkey")
      .agg(count(lit(1)).as("n"), max("rn").as("maxrn"))
      .where(col("n") > 3 || col("maxrn") =!= col("n"))
    assert(bad.count() == 0)
  }
}
