package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Training-data EXPORT: write a curated corpus as N deterministic,
  * shuffled shards — the `q_shuffle_shard` assignment materialized as
  * files a dataloader can stream. Each document lands in shard
  * `h60(id) mod n` — the md5-based portable hash family every oracle
  * mirrors (stable across runs and cluster sizes) — each
  * shard is exactly ONE file (`repartition(n, shard)` routes a shard to
  * one task — Spark's shuffle partitioning is the same `pmod(hash, n)`
  * family the write needs), and within a shard rows are sorted by the
  * content hash — the cheap stable "shuffle" that decorrelates adjacent
  * training examples without a global sort.
  *
  * Scale: one shuffle on the shard id, no driver involvement; shard
  * count picks file size (100 TB / n shards each). The deterministic
  * assignment means re-exports after incremental curation touch every
  * shard's membership predictably — the property resumable training
  * pipelines rely on.
  */
object ShardWriter {

  /** Write `docs` (must carry `idCol`) as `nShards` single-file shards
    * under `outDir/shard=K/`. Returns the shard row counts. */
  def write(
      docs: DataFrame,
      outDir: String,
      nShards: Int,
      idCol: String = "doc_id"): Map[Int, Long] = {
    val sharded = docs
      .withColumn("shard",
        pmod(conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
          .cast("long"), lit(nShards.toLong)).cast("int"))
      .withColumn("sort_key", md5(col(idCol).cast("string")))
    sharded
      .repartition(nShards, col("shard"))
      .sortWithinPartitions("shard", "sort_key")
      .write.mode(SaveMode.Overwrite)
      .partitionBy("shard")
      .parquet(outDir)
    docs.sparkSession.read.parquet(outDir)
      .groupBy("shard").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
  }
}
