package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._
import graft.operators.Bucketing

/** Plan-level proof that the bucketed layout eliminates the join
  * exchange: the whole point of `q_bucket_join`. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  private def joinNode(plan: SparkPlan): Option[SparkPlan] = plan.find {
    case _: SortMergeJoinExec | _: ShuffledHashJoinExec => true
    case _ => false
  }

  test("bucketed orders ⋈ lineitem: no shuffle on either join side") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // broadcast would hide the bucket win on the tiny fixture; at 100 TB
    // neither side broadcasts, which is exactly when bucketing pays
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, sf)
      val plan = joined.queryExecution.executedPlan
      val j = joinNode(plan).getOrElse(
        fail(s"no shuffle-family join found (broadcast?):\n$plan"))
      j.children.foreach { side =>
        val shuffles = side.collect { case e: ShuffleExchangeExec => e }
        assert(shuffles.isEmpty,
          s"bucketed join side still shuffles:\n$side")
      }
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("the same join over raw parquet DOES shuffle (the layout is the win)") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val raw = Tables.orders(spark, sf).select("o_orderkey", "o_orderstatus")
        .join(Tables.lineitem(spark, sf)
          .select("l_orderkey", "l_extendedprice", "l_discount"),
          col("o_orderkey") === col("l_orderkey"))
      val plan = raw.queryExecution.executedPlan
      val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.size >= 2,
        s"expected both raw sides to exchange, got ${shuffles.size}:\n$plan")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("bucketing is semantically invisible: result equals the raw join") {
    val bucketed = Bucketing.qBucketJoin.build(spark, sf)
      .collect().map(_.toSeq).toSeq
    val raw = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf), col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_items"),
        sum(QHelp.dec(col("l_extendedprice")) *
            QHelp.dec(lit(1) - col("l_discount")))
          .cast("double").as("revenue"))
      .orderBy("o_orderstatus")
      .collect().map(_.toSeq).toSeq
    assert(bucketed == raw)
  }

  test("partition pruning: the year filter reaches the scan and skips other years' files") {
    val all = Bucketing.partitionedOrders(spark, sf)
    val pruned = all.where(col("o_year") === 1995)
    // the filter must surface as a partition filter, not a row filter
    val scan = pruned.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no file scan in plan"))
    assert(scan.partitionFilters.nonEmpty, "year filter not pushed to partitions")
    // layout is semantically invisible
    val expect = Tables.orders(spark, sf)
      .where(year(col("o_orderdate")) === 1995).count()
    assert(pruned.count() == expect)
    // and the executed scan actually skipped the other years' files
    val readFiles = scan.metrics("numFiles").value
    val totalFiles = all.inputFiles.length
    assert(readFiles < totalFiles,
      s"pruned scan read $readFiles of $totalFiles files — nothing skipped")
  }

  test("quantile-histogram sketch: read-out within one bin of the exact percentile, mergeable") {
    import graft.operators.Aggregates
    val out = Aggregates.qQuantileHist.build(spark, sf)
      .as[(String, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    val exact = Tables.lineitem(spark, sf).groupBy("l_returnflag").agg(
      expr("percentile(l_extendedprice, 0.5)").as("e50"),
      expr("percentile(l_extendedprice, 0.9)").as("e90"))
      .as[(String, Double, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    val w = Aggregates.QuantileBinWidth
    out.foreach { case (f, _, p50lo, p90lo) =>
      val (e50, e90) = exact(f)
      assert(math.abs(p50lo - e50) <= w,
        s"$f p50 bin [$p50lo,${p50lo + w}) misses exact $e50")
      assert(math.abs(p90lo - e90) <= w,
        s"$f p90 bin [$p90lo,${p90lo + w}) misses exact $e90")
    }
    // mergeability: histogram over the union == elementwise sum of the
    // histograms over two disjoint halves (the additive-monoid law the
    // map-side combine and any cross-day merge rely on)
    val li = Tables.lineitem(spark, sf)
      .select(col("l_returnflag").as("f"),
        floor(col("l_extendedprice") / w).as("b"))
    def hist(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("f", "b").agg(count(lit(1)).as("c"))
        .as[(String, Long, Long)].collect()
        .map(t => (t._1, t._2) -> t._3).toMap
    val whole = hist(li)
    val h1 = hist(li.where(col("b") % 2 === 0))
    val h2 = hist(li.where(col("b") % 2 =!= 0))
    val merged = (h1.keySet ++ h2.keySet).map(k =>
      k -> (h1.getOrElse(k, 0L) + h2.getOrElse(k, 0L))).toMap
    assert(merged == whole, "histogram partials do not merge additively")
  }

  test("one file per bucket: the layout that also skips the merge sort") {
    Bucketing.bucketedJoin(spark, sf) // ensure tables exist
    val files = spark.table(Bucketing.ordersTable(spark, sf)).inputFiles
    assert(files.length == Bucketing.NBuckets,
      s"expected ${Bucketing.NBuckets} bucket files, got ${files.length}")
  }
}
