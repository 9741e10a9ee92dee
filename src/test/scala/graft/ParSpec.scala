package graft

import org.apache.spark.sql.functions._
import graft.operators.Par

/** [[graft.operators.Par.boost]] — the map-side parallelism floor must
  * be SIZE-AWARE (VERDICT r14 #5): tiny official-SF fixtures must not
  * pay an exchange for milliseconds of parallelized compute, while a
  * cluster-shaped or genuinely heavy single-file input keeps the
  * repartition. */
class ParSpec extends SparkSpec {

  test("boost skips the exchange below the per-core size floor") {
    // the sf0.001 embeddings are ~130 KB planned — far under the
    // 128 KiB/core floor at local[4]; the boosted frame must be THE
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
}
