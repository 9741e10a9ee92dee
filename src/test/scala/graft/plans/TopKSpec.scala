package graft.plans

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The custom TopKPerGroup operator must agree with the stock
  * window-function formulation on every group, including ties and groups
  * smaller than k. */
class TopKSpec extends SparkSpec {

  private def windowTopK(k: Int) = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(spark, sf)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .drop("rn")
      .select("o_custkey", "o_orderkey", "o_totalprice")
  }

  test("matches the window row_number formulation exactly") {
    val orders = Tables.orders(spark, sf)
    for (k <- Seq(1, 3, 10)) {
      val custom = TopK.perGroup(orders, k, Seq("o_custkey"),
          Seq(orders("o_totalprice").desc, orders("o_orderkey").asc))
        .select("o_custkey", "o_orderkey", "o_totalprice")
      val stock = windowTopK(k)
      assert(custom.count() == stock.count(), s"k=$k count")
      assert(custom.exceptAll(stock).isEmpty && stock.exceptAll(custom).isEmpty,
        s"k=$k rows differ")
    }
  }

  test("groups smaller than k are emitted whole, in order") {
    val orders = Tables.orders(spark, sf)
    val big = TopK.perGroup(orders, 1000000, Seq("o_custkey"),
      Seq(orders("o_orderkey").asc))
    assert(big.count() == orders.count())
  }

  test("empty group list = global top-k over a single partition (AllTuples)") {
    val orders = Tables.orders(spark, sf)
    val global = TopK.perGroup(orders, 5, Seq.empty,
        Seq(orders("o_totalprice").desc, orders("o_orderkey").asc))
      .select("o_orderkey", "o_totalprice")
    val stock = orders.orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(5).select("o_orderkey", "o_totalprice")
    assert(global.collect().toSeq.sortBy(_.get(0).toString) ==
      stock.collect().toSeq.sortBy(_.get(0).toString))
  }

  test("spill path: high-cardinality groups with a tiny threshold match exactly") {
    // ~1000 distinct custkeys per partition vs a 64-row retained cap →
    // dozens of spill runs per partition, exercising the k-way merge
    val orders = Tables.orders(spark, sf)
    for (k <- Seq(1, 3)) {
      val spilled = TopK.perGroup(orders, k, Seq("o_custkey"),
          Seq(orders("o_totalprice").desc, orders("o_orderkey").asc),
          spillThreshold = 64)
        .select("o_custkey", "o_orderkey", "o_totalprice")
      val stock = windowTopK(k)
      assert(spilled.count() == stock.count(), s"k=$k count")
      assert(spilled.exceptAll(stock).isEmpty && stock.exceptAll(spilled).isEmpty,
        s"k=$k spilled rows differ")
    }
  }

  test("spill path agrees with the in-memory path on ties and small groups") {
    import spark.implicits._
    val df = (1 to 5000).map(i => (i % 997, i % 7, i)).toDF("g", "v", "id")
    val inMem = TopK.perGroup(df, 2, Seq("g"), Seq(df("v").desc, df("id").asc))
    val spilled = TopK.perGroup(df, 2, Seq("g"), Seq(df("v").desc, df("id").asc),
      spillThreshold = 32)
    assert(inMem.count() == spilled.count())
    assert(spilled.exceptAll(inMem).isEmpty && inMem.exceptAll(spilled).isEmpty)
  }

  test("spill files honor Spark's local-dir resolution, not java.io.tmpdir") {
    spark.sparkContext.setLogLevel("WARN") // touch the context so SparkEnv exists
    val f = org.apache.spark.graft.SpillShim.createSpillFile("graft-topk-spilltest")
    try {
      // VERDICT r15 #5: assert against Utils.getLocalDir's OWN resolution
      // (SPARK_LOCAL_DIRS env wins over spark.local.dir by Spark's
      // documented order, and the driver env sets the var; getLocalDir
      // also picks RANDOMLY among multiple roots) — the product contract
      // is "spill where Spark's local-dir machinery points".
      val roots = org.apache.spark.graft.SpillShim.resolvedSpillRoots
        .map(_.getCanonicalPath)
      assert(roots.exists(f.getCanonicalPath.startsWith),
        s"spill file ${f.getCanonicalPath} not under any resolved " +
          s"local root ${roots.mkString(", ")}")
      // in an env WITHOUT the override, that resolution must be the
      // session's spark.local.dir — the original intent, kept meaningful
      if (sys.env.get("SPARK_LOCAL_DIRS").forall(_.isEmpty)) {
        val conf = graft.SparkSpec.localDir.getCanonicalPath
        assert(roots.exists(_.startsWith(conf)),
          s"no SPARK_LOCAL_DIRS set, yet resolution ${roots.mkString(", ")} " +
            s"ignores spark.local.dir $conf")
      }
    } finally f.delete()
  }

  test("physical plan uses TopKPerGroupExec with a single clustering exchange") {
    val orders = Tables.orders(spark, sf)
    val df = TopK.perGroup(orders, 3, Seq("o_custkey"),
      Seq(orders("o_totalprice").desc))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), plan)
    assert(plan.contains("Exchange hashpartitioning(o_custkey"), plan)
  }

  test("two-phase: a partial heap runs BELOW the exchange and bounds " +
      "shuffled rows to surviving candidates, result unchanged") {
    val orders = Tables.orders(spark, sf)
    val k = 3
    val df = TopK.perGroup(orders, k, Seq("o_custkey"),
      Seq(orders("o_totalprice").desc, orders("o_orderkey").asc))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // partial below the exchange, final above it
    val iPartial = plan.indexOf("TopKPerGroupPartialExec")
    val iExchange = plan.indexOf("Exchange hashpartitioning(o_custkey")
    val iFinal = plan.indexOf("TopKPerGroupExec")
    assert(iPartial >= 0 && iExchange >= 0 && iFinal >= 0, plan)
    assert(iFinal < iExchange && iExchange < iPartial,
      s"expected final/exchange/partial order in:\n$plan")
    // the map-side prune bit: shuffled records = per-partition survivors,
    // strictly fewer than the input rows (every group × k per partition
    // is the bound; the input has ~10 orders per customer)
    def flatten(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        flatten(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        p +: flatten(q.plan)
      case other => other +: other.children.flatMap(flatten)
    }
    val written = flatten(df.queryExecution.executedPlan).collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        e.metrics.get("shuffleRecordsWritten").map(_.value).getOrElse(0L)
    }.sum
    val input = orders.count()
    assert(written > 0 && written < input,
      s"partial heap did not prune: shuffled $written of $input input rows")
  }
}
