package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Storage-layout operators for the 100 TB design: partitioned layout with
  * partition pruning at the scan, and bucketed layout with shuffle-free
  * co-located joins. Asserted against the physical plan, not just results —
  * a pruned/bucketed plan that silently degrades to full scan + shuffle
  * would still "pass" on row counts.
  */
class StorageSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private def executedPlan(df: org.apache.spark.sql.DataFrame): SparkPlan = {
    df.collect() // force AQE to finalize
    df.queryExecution.executedPlan
  }

  test("partitionBy layout prunes partitions at the scan") {
    val dir = Files.createTempDirectory("graft_part").toString
    Tables.orders(spark, sf)
      .withColumn("status", col("o_orderstatus"))
      .write.partitionBy("status").mode("overwrite").parquet(dir)

    val pruned = spark.read.parquet(dir).where(col("status") === "F")
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("status"),
      s"expected partition filter in scan:\n$scan")
    // only the status=F directory is read
    val all = spark.read.parquet(dir).count()
    val f = pruned.count()
    assert(f > 0 && f < all)
  }

  test("bucketed tables join without a shuffle") {
    // managed tables land in the default warehouse; DROP TABLE cleans up
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.orders(spark, sf).write.bucketBy(4, "o_custkey")
        .sortBy("o_custkey").mode("overwrite").saveAsTable("orders_bkt")
      Tables.customer(spark, sf).write.bucketBy(4, "c_custkey")
        .sortBy("c_custkey").mode("overwrite").saveAsTable("customer_bkt")

      val joined = spark.table("orders_bkt")
        .join(spark.table("customer_bkt"),
          col("o_custkey") === col("c_custkey"))
      val shuffles = collectWithSubqueries(executedPlan(joined)) {
        case s: ShuffleExchangeExec => s
      }
      assert(shuffles.isEmpty,
        s"bucketed join must not shuffle:\n${joined.queryExecution.executedPlan}")
      assert(joined.count() ==
        Tables.orders(spark, sf).join(Tables.customer(spark, sf),
          col("o_custkey") === col("c_custkey")).count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS customer_bkt")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10MB")
    }
  }
}
