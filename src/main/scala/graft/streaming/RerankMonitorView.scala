package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** `s_rerank_monitor`: ONLINE agreement metrology for the served ANN
  * index — the streaming twin of the batch `q_rerank_agreement`. A
  * sidecar taps the live query feed and, per micro-batch, shadow-scores
  * each query twice: the direct ADC top-k off the compressed index,
  * and the deployed two-stage path (ADC shortlist of `RerankK`, exact
  * cosine over ONLY the fetched shortlist vectors). The appended
  * monitor row `(query_id, hits, agree_fx, batch_id)` is the
  * ground-truth-free drift alarm a vector-index operator runs in
  * production: when agreement trends down, the compressed index's
  * ordering has degraded relative to exact scores (probe count too low
  * for the grown corpus, codebooks stale) — and nothing here ever
  * needs labeled ground truth, because the rerank leg IS the serving
  * path. In production the tapped feed is a SAMPLED fraction of
  * traffic; sampling is the caller's filter on the query stream, the
  * monitor itself is per-query.
  *
  * Scale shape per batch: the ADC pass is the serving stream's own
  * stream-static cell join (a query scans NProbe cells, never the
  * corpus) against the ONCE-pivoted codes frame; the exact leg fetches
  * exactly `RerankK` vectors per query through a broadcast equi-join
  * (never a second corpus pass); both ranks go through the bounded-heap
  * `TopK.perGroup` plan. All metrology joins see ≤ batch·k rows.
  *
  * Exactly-once: each batch's rows are a pure function of that batch's
  * queries and the static index, and the batch OWNS its
  * `monitor/batch_id=<id>/` partition (written with Overwrite, so a
  * retry that crashed before the skip-marker replaces rather than
  * duplicates — the Bm25IndexView postings discipline). The monitor binds the
  * cells + codebook fingerprint under `baseDir` at writer creation:
  * agreement rows are only comparable within ONE quantizer era, so a
  * monitor pointed at a re-trained index with an old output directory
  * fails loudly instead of silently mixing eras.
  */
object RerankMonitorView {

  /** Fixed-point scale for the exact agreement ratio. */
  private val Fx = 1048576L

  /** foreachBatch adapter — binds the index era and pivots the codes
    * frame ONCE at creation:
    * `queries.writeStream.foreachBatch(RerankMonitorView.writer(...)).start()`.
    * Pass MATERIALIZED frames for `corpus` and `index` (a persisted
    * `pqResArtifacts` index or parquet reads) — this runs a batch job
    * per micro-batch, so a lazy build plan here re-runs index
    * construction every batch. */
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

  /** One monitored batch: ADC top-k vs shortlist-rerank top-k per
    * query, appended as `(query_id, hits, agree_fx, batch_id)`.
    * `codesPerVec` is the pre-pivoted serving frame
    * ([[StreamOps.pqCodesPivot]]). */
  def applyBatch(queries: DataFrame, batchId: Long, baseDir: String,
      corpus: DataFrame, codesPerVec: DataFrame,
      cells: Seq[(Long, Seq[Double], Seq[Long])],
      codebooks: Seq[(Int, Long, Seq[Long])],
      k: Int, nProbe: Int): Unit = {
    val marker = java.nio.file.Paths.get(s"$baseDir/_monitor-batch-$batchId")
    if (java.nio.file.Files.exists(marker)) return
    // evaluated once, consumed twice (ADC scoring + the qv fetch side)
    val qs = queries.select(col("vec_id"), col("embedding"))
      .localCheckpoint(eager = true)
    if (!qs.isEmpty) {
      val scored = StreamOps.ivfPqScoredFrom(qs, codesPerVec,
        cells, codebooks, nProbe)
      // ONE bounded-heap pass to RerankK gives both lists: the direct
      // ADC top-k is the shortlist's rank-≤-k prefix
      val short = graft.plans.TopK.perGroup(scored,
          graft.operators.Similarity.RerankK, Seq("query_id"),
          Seq(col("score").desc, col("neighbor_id").asc))
        .withColumn("rn", row_number().over(Window.partitionBy("query_id")
          .orderBy(col("score").desc, col("neighbor_id").asc)))
        .localCheckpoint(eager = true) // tiny: batch·RerankK rows
      val adcTop = short.where(col("rn") <= k)
        .select("query_id", "neighbor_id")
      // fetch ONLY the shortlisted vectors and re-rank by exact cosine
      val rr = corpus.select(col("vec_id").as("neighbor_id"),
          col("embedding").as("nv"))
        .join(broadcast(short.select("query_id", "neighbor_id")), "neighbor_id")
        .join(broadcast(qs.select(col("vec_id").as("query_id"),
          col("embedding").as("qv"))), "query_id")
        .select(col("query_id"), col("neighbor_id"),
          graft.operators.VectorOps.cosine(col("qv"), col("nv")).as("cos"))
      val rTop = graft.plans.TopK.perGroup(rr, k, Seq("query_id"),
          Seq(col("cos").desc, col("neighbor_id").asc))
        .select("query_id", "neighbor_id")
      val hits = adcTop.join(rTop, Seq("query_id", "neighbor_id"))
        .groupBy("query_id").agg(count(lit(1)).as("h"))
      val out = qs.select(col("vec_id").as("query_id"))
        .join(hits, Seq("query_id"), "left")
        .select(col("query_id"),
          coalesce(col("h"), lit(0L)).as("hits"),
          expr(s"(coalesce(h, 0) * $Fx) DIV $k").as("agree_fx"))
      // idempotent per batch: the batch owns its `batch_id=<id>`
      // partition and writes it with Overwrite — a retry that crashed
      // between the write and the marker replaces the partition instead
      // of appending duplicate monitor rows (which would skew the macro
      // agreement aggregate); the marker is a fast-skip only
      out.write.mode(SaveMode.Overwrite)
        .parquet(s"$baseDir/monitor/batch_id=$batchId")
    }
    java.nio.file.Files.createFile(marker)
  }

  /** The appended monitor rows `(query_id, hits, agree_fx, batch_id)` —
    * batch_id is the partition column, normalized back to long. */
  def monitorRows(spark: SparkSession, baseDir: String): DataFrame =
    spark.read.parquet(s"$baseDir/monitor")
      .withColumn("batch_id", col("batch_id").cast("long"))
}
