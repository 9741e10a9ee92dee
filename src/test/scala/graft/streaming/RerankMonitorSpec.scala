package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** `s_rerank_monitor`: the online agreement monitor's rows must equal
  * the batch `q_rerank_agreement` per-query rows for the same queries
  * and index era, replay must be a no-op, and a re-trained index must
  * refuse the old output directory. */
class RerankMonitorSpec extends SparkSpec {
  import spark.implicits._

  test("monitor rows ≡ batch q_rerank_agreement per-query rows; replay " +
      "no-op; era binding refuses a different geometry") {
    val dir = java.nio.file.Files.createTempDirectory("rrmon").toString
    val e = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val (cells, cbs, idx) = graft.operators.Similarity.pqResArtifacts(e)
    val rows = e.where(col("vec_id") < 8).as[VecRow].collect().sortBy(_.vec_id)

    val in = MemoryStream[VecRow](spark)
    val q = in.toDF().writeStream
      .foreachBatch(RerankMonitorView.writer(dir, e, idx, cells, cbs))
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("rrmon-ckpt").toString)
      .start()
    try {
      rows.grouped(3).foreach { c => in.addData(c.toIndexedSeq); q.processAllAvailable() }
    } finally q.stop()

    val got = RerankMonitorView.monitorRows(spark, dir)
      .select("query_id", "hits", "agree_fx")
      .as[(Long, Long, Long)].collect().toSet
    val want = graft.SparkEntry.queries("q_rerank_agreement")(spark, sf)
      .where(col("query_id") >= 0)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == want,
      s"monitor diverged from batch metrology: ${got.diff(want)} vs ${want.diff(got)}")

    // replay of an applied batch appends nothing (marker-guarded)
    val before = RerankMonitorView.monitorRows(spark, dir).count()
    RerankMonitorView.applyBatch(
      rows.take(3).toSeq.toDF("vec_id", "embedding"), batchId = 0L,
      baseDir = dir, corpus = e, codesPerVec = StreamOps.pqCodesPivot(idx),
      cells = cells, codebooks = cbs, k = 5, nProbe = 4)
    assert(RerankMonitorView.monitorRows(spark, dir).count() == before,
      "replayed batch appended monitor rows")

    // CRASH-RETRY: a crash AFTER the batch-0 rows committed but BEFORE
    // the skip-marker re-runs the batch — the per-batch partition
    // Overwrite replaces instead of duplicating (ADVICE r11)
    val allBefore = RerankMonitorView.monitorRows(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSet
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(s"$dir/_monitor-batch-0"))
    RerankMonitorView.applyBatch(
      rows.take(3).toSeq.toDF("vec_id", "embedding"), batchId = 0L,
      baseDir = dir, corpus = e, codesPerVec = StreamOps.pqCodesPivot(idx),
      cells = cells, codebooks = cbs, k = 5, nProbe = 4)
    assert(RerankMonitorView.monitorRows(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSet == allBefore,
      "crash-retry duplicated or changed monitor rows")

    // a monitor writer for a DIFFERENT quantizer era must fail loudly
    // against the same output directory (agreement rows are only
    // comparable within one era)
    val retrained = cbs.map { case (s0, j, cw) => (s0, j, cw.map(_ + 1L)) }
    val ex = intercept[IllegalStateException] {
      RerankMonitorView.writer(dir, e, idx, cells, retrained)
    }
    assert(ex.getMessage.contains("state-geometry mismatch"))
  }
}
