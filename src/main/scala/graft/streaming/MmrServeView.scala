package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** `s_mmr_serve`: ONLINE MMR-diversified retrieval — the streaming twin
  * of the batch `q_mmr_rerank`, run as a foreachBatch sidecar (the
  * [[RerankMonitorView]] pattern: the per-query work chains a stateful
  * shortlist into a re-rank, which one streaming query cannot express,
  * so the serve runs the BATCH pipeline per micro-batch against the
  * static index). Per batch of arriving query vectors:
  *
  *  - ADC shortlist of `RerankK` off the residual compressed index
  *    ([[StreamOps.ivfPqScoredFrom]] against the ONCE-pivoted codes
  *    frame, bounded-heap `TopK.perGroup` — a query scans NProbe
  *    cells, never the corpus);
  *  - greedy MMR selection over the fetched shortlist vectors
  *    ([[graft.operators.Retrieval.mmrOver]] — exactly the batch
  *    query's joins and λ = ½ arithmetic, so served selections are
  *    bit-identical to `q_mmr_rerank`'s, spec-pinned);
  *  - results append per batch as `results/batch_id=<id>/` partitions
  *    (Overwrite — a retry crashing before the skip-marker REPLACES
  *    instead of duplicating, the postings-log discipline).
  *
  * Binds the cells + codebook fingerprint under `baseDir` at writer
  * creation: a diversified leaderboard is only comparable within one
  * quantizer era ([[StateGeometryGuard]]).
  */
object MmrServeView {

  /** foreachBatch adapter — binds the index era and pivots the codes
    * frame ONCE at creation. Pass MATERIALIZED frames for `corpus` and
    * `index` (a persisted `pqResArtifacts` index or parquet reads). */
  def writer(baseDir: String,
      corpus: DataFrame,
      index: DataFrame,
      cells: Seq[(Long, Seq[Double], Seq[Long])],
      codebooks: Seq[(Int, Long, Seq[Long])],
      k: Int = 5,
      nProbe: Int = 4): (DataFrame, Long) => Unit = {
    new java.io.File(baseDir).mkdirs()
    StateGeometryGuard.bind(baseDir, StateGeometryGuard.ivfpq(cells, codebooks))
    val codesPerVec = StreamOps.pqCodesPivot(index)
    (batch, batchId) =>
      applyBatch(batch, batchId, baseDir, corpus, codesPerVec,
        cells, codebooks, k, nProbe)
  }

  /** One served batch: ADC shortlist → greedy MMR, appended as
    * `(query_id, neighbor_id, rank)` under the batch's partition. */
  def applyBatch(queries: DataFrame, batchId: Long, baseDir: String,
      corpus: DataFrame, codesPerVec: DataFrame,
      cells: Seq[(Long, Seq[Double], Seq[Long])],
      codebooks: Seq[(Int, Long, Seq[Long])],
      k: Int, nProbe: Int): Unit = {
    val marker = java.nio.file.Paths.get(s"$baseDir/_mmr-batch-$batchId")
    if (java.nio.file.Files.exists(marker)) return
    // evaluated once, consumed twice (ADC scoring + the qs vector side)
    val qs = queries.select(col("vec_id"), col("embedding"))
      .localCheckpoint(eager = true)
    if (!qs.isEmpty) {
      val scored = StreamOps.ivfPqScoredFrom(qs, codesPerVec,
        cells, codebooks, nProbe)
      val short = graft.plans.TopK.perGroup(scored,
          graft.operators.Similarity.RerankK, Seq("query_id"),
          Seq(col("score").desc, col("neighbor_id").asc))
        .select("query_id", "neighbor_id")
        .localCheckpoint(eager = true) // tiny: batch·RerankK rows
      val out = graft.operators.Retrieval.mmrOver(corpus,
        qs.select(col("vec_id").as("query_id"), col("embedding").as("qv")),
        short, k)
      out.write.mode(SaveMode.Overwrite)
        .parquet(s"$baseDir/results/batch_id=$batchId")
    }
    java.nio.file.Files.createFile(marker)
  }

  /** The served selections `(query_id, neighbor_id, rank, batch_id)`. */
  def results(spark: SparkSession, baseDir: String): DataFrame =
    spark.read.parquet(s"$baseDir/results")
      .withColumn("batch_id", col("batch_id").cast("long"))
}
