package graft

import graft.operators.TrainPrep
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper

/** Invariants + plan shapes for the training-data preparation pack (exact
  * values are oracle-checked via Verify + DuckDB at sf0.01; these specs
  * pin the properties that make the ops usable at 100 TB). */
class TrainPrepSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  test("ShardWriter: one file per shard, stable membership, total preserved") {
    import org.apache.spark.sql.functions._
    val out = java.nio.file.Files.createTempDirectory("graft-shards").toFile
    try {
      val docs = Tables.documents(spark, sf)
      val counts = graft.operators.ShardWriter.write(
        docs, out.getAbsolutePath, nShards = 8)
      assert(counts.keySet == (0 until 8).toSet, s"missing shards: $counts")
      assert(counts.values.sum == docs.count())
      // exactly one data file per shard directory
      (0 until 8).foreach { k =>
        val files = new java.io.File(out, s"shard=$k")
          .listFiles().filter(_.getName.endsWith(".parquet"))
        assert(files.length == 1, s"shard $k has ${files.length} files")
      }
      // membership is the stable document hash, never partitioning luck
      val back = spark.read.parquet(out.getAbsolutePath)
      val bad = back.filter(
        col("shard") =!= pmod(
          conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
            .cast("long"), lit(8L)).cast("int"))
      assert(bad.count() == 0, "shard assignment must be the stable hash")
      // re-export reproduces the identical membership
      val counts2 = graft.operators.ShardWriter.write(
        docs, out.getAbsolutePath, nShards = 8)
      assert(counts2 == counts)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(out)
  }

  private def plan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("exact-N sample plans as TakeOrderedAndProject: bounded heap, no global sort") {
    val df = TrainPrep.qSampleTopn.build(spark, sf)
    val p = plan(df)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("SortExec"), s"global sort crept into the sample plan:\n$p")
    assert(df.count() == 64)
  }

  test("hash sampling: shuffle-free plan, stable membership, ~12.5% rate") {
    val df = TrainPrep.qSampleHash.build(spark, sf)
    val p = plan(df)
    // the sample predicate must ride the scan, not a shuffle stage
    // (the final orderBy is presentation; the filter itself is pre-exchange)
    assert(p.contains("PushedFilters") || p.contains("Filter"), p)
    val n = df.count().toDouble
    val total = Tables.documents(spark, sf).count().toDouble
    assert(n / total > 0.05 && n / total < 0.22, s"rate ${n / total}")
    // determinism: same membership on a rerun
    assert(df.collect().toSeq == TrainPrep.qSampleHash.build(spark, sf).collect().toSeq)
  }

  test("split assignment: disjoint, exhaustive, stable under corpus growth") {
    val rows = TrainPrep.qSplitAssign.build(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet.subsetOf(Set("train", "val", "test")))
    assert(rows.values.sum == Tables.documents(spark, sf).count())
    assert(rows("train") > rows.getOrElse("val", 0L))
    // growth-stability: a doc's split is a pure function of doc_id, so the
    // assignment computed on a half corpus agrees with the full corpus
    import org.apache.spark.sql.functions._
    val half = Tables.documents(spark, sf).where(col("doc_id") % 2 === 0)
      .select(col("doc_id"), md5(col("doc_id").cast("string")).as("h"))
      .select(col("doc_id"),
        when(col("h") < "0d", "test").when(col("h") < "1a", "val")
          .otherwise("train").as("split"))
    val full = Tables.documents(spark, sf)
      .select(col("doc_id"), md5(col("doc_id").cast("string")).as("h"))
      .select(col("doc_id"),
        when(col("h") < "0d", "test").when(col("h") < "1a", "val")
          .otherwise("train").as("split"))
      .where(col("doc_id") % 2 === 0)
    assert(half.exceptAll(full).isEmpty && full.exceptAll(half).isEmpty)
  }

  test("contamination: benchmark side is broadcast; only train ids surface") {
    val df = TrainPrep.qContamination.build(spark, sf)
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"benchmark side not broadcast:\n$p")
    df.collect().foreach { r =>
      assert(r.getLong(0) % 50 != 0, "benchmark doc leaked into the train output")
      assert(r.getLong(1) >= 1)
    }
  }

  test("domain mix: totals broadcast; weights weight small domains up") {
    val df = TrainPrep.qDomainMix.build(spark, sf)
    val p = plan(df)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"totals row not broadcast:\n$p")
    val rows = df.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val total = rows.map(_._2).sum
    val k = rows.length
    rows.foreach { case (lang, n, w) =>
      val expected = total.toDouble / (k * n)
      assert(math.abs(w - expected) < 1e-4, s"$lang weight $w vs $expected")
    }
    // weights are inversely proportional to size: rarest lang gets max weight
    assert(rows.minBy(_._2)._3 == rows.map(_._3).max)
  }

  test("shard assignment covers all docs with 16 hex shards") {
    val rows = TrainPrep.qShuffleShard.build(spark, sf).collect()
    assert(rows.map(_.getString(0)).forall(s => s.length == 1 && "0123456789abcdef".contains(s)))
    assert(rows.map(_.getLong(1)).sum == Tables.documents(spark, sf).count())
    // per-shard hash ranges must not overlap across shards (split points)
    val ranges = rows.map(r => (r.getString(0), r.getString(2), r.getString(3)))
      .sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, _, hiA), (_, loB, _)) => assert(hiA < loB)
      case _ => ()
    }
  }

  test("pii scrub leaves no digits behind and counts every redaction") {
    val source = Tables.customer(spark, sf).select("c_custkey", "c_name")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = TrainPrep.qPiiScrub.build(spark, sf).collect()
    rows.foreach { r =>
      val (masked, original) = (r.getString(1), source(r.getLong(0)))
      assert(!masked.exists(_.isDigit), s"unmasked digit in $masked")
      // the name carries a literal '#' of its own, so compare against the
      // character-exact expected masking, not a bare '#' count
      assert(masked == original.map(c => if (c.isDigit) '#' else c))
      assert(r.getInt(2) == original.count(_.isDigit))
    }
  }
}
