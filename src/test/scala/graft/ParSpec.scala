package graft

import org.apache.spark.sql.functions._
import graft.operators.Par

/** [[graft.operators.Par.boost]] — the map-side parallelism floor must
  * be SIZE-AWARE (VERDICT r14 #5): tiny official-SF fixtures must not
  * pay an exchange for milliseconds of parallelized compute, while a
  * cluster-shaped or genuinely heavy single-file input keeps the
  * repartition. Since r17 the floor is also CORE-COUNT-INDEPENDENT:
  * the split count derives from the input's planned bytes (one
  * partition per ~128 KiB, capped at parallelism), so raising the
  * session's cores can never switch the floor OFF (the r16 per-core
  * gate left the sf0.1 embeddings' O(n²) pair predicate on one task
  * under local[32] while boosting it 4 ways under local[4]). */
class ParSpec extends SparkSpec {

  test("boost skips the exchange below the size floor") {
    // the sf0.001 embeddings are ~130 KB planned — under one 128 KiB
    // partition's worth of input; the boosted frame must be THE
    // SAME PLAN (no repartition), not just the same rows
    val e = Tables.embeddings(spark, sf)
    val boosted = Par.boost(e)
    assert(boosted.queryExecution.optimizedPlan.sameResult(
      e.queryExecution.optimizedPlan),
      "boost added an exchange below the size floor")
  }

  test("boost repartitions a large sub-parallelism frame and is a no-op " +
      "on an already-parallel one") {
    val p = spark.sparkContext.defaultParallelism
    // a single-partition frame whose STATS clear the floor: union of
    // in-memory rows with a wide payload, coalesced to 1 partition
    val wide = spark.range(0, 100000, 1, 1)
      .select(col("id"), concat_ws("", array((0 until 8).map(_ =>
        md5(col("id").cast("string"))): _*)).as("payload"))
      .coalesce(1)
    val bytes = wide.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(bytes >= BigInt(128L << 10) * p,
      s"fixture too small for the test: $bytes")
    assert(wide.rdd.getNumPartitions == 1)
    val boosted = Par.boost(wide)
    assert(boosted.rdd.getNumPartitions == p,
      "boost did not lift a heavy single-partition frame to parallelism")
    // already at/above parallelism → untouched plan
    val par = spark.range(0, 20000, 1, p)
      .select(col("id"), md5(col("id").cast("string")).as("payload"))
    assert(Par.boost(par).queryExecution.optimizedPlan.sameResult(
      par.queryExecution.optimizedPlan),
      "boost repartitioned an already-parallel frame")
  }

  test("boost sizes the split count by the input's bytes, not the core " +
      "count: a mid-size frame gets bytes/128KiB partitions") {
    val p = spark.sparkContext.defaultParallelism
    // single-partition frame whose stats land BETWEEN 2 and p-1 floor
    // units: the r16 per-core gate (bytes < 128 KiB × p) would have
    // skipped it entirely; the input-sized floor must split it into
    // exactly bytes/128KiB partitions — fewer than parallelism, because
    // the input doesn't carry more than that much work
    val mid = spark.range(0, 20000, 1, 1)
      .select(col("id"), md5(col("id").cast("string")).as("payload"))
    val bytes = mid.queryExecution.optimizedPlan.stats.sizeInBytes
    val target = (bytes / (128L << 10)).toInt
    assert(target >= 2 && target < p, s"fixture out of band: $bytes bytes")
    assert(Par.boost(mid).rdd.getNumPartitions == target,
      "boost did not derive the split count from the input's bytes")
  }
}
