package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** `s_mmr_serve`: the online MMR-diversified serving sidecar must equal
  * the batch `q_mmr_rerank` selections for the same queries and index
  * era, replay and crash-retry must not duplicate, and a re-trained
  * index must refuse the old output directory. */
class MmrServeSpec extends SparkSpec {
  import spark.implicits._

  test("served MMR selections ≡ batch q_mmr_rerank; replay no-op; " +
      "crash-retry replaces; era binding refuses a different geometry") {
    val dir = java.nio.file.Files.createTempDirectory("mmrserve").toString
    val e = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val (cells, cbs, idx) = graft.operators.Similarity.pqResArtifacts(e)
    val rows = e.where(col("vec_id") < 8).as[VecRow].collect().sortBy(_.vec_id)

    val in = MemoryStream[VecRow](spark)
    val q = in.toDF().writeStream
      .foreachBatch(MmrServeView.writer(dir, e, idx, cells, cbs))
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("mmrserve-ckpt").toString)
      .start()
    try {
      rows.grouped(3).foreach { c => in.addData(c.toIndexedSeq); q.processAllAvailable() }
    } finally q.stop()

    def served() = MmrServeView.results(spark, dir)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Long)].collect().toSet
    val got = served()
    val want = graft.SparkEntry.queries("q_mmr_rerank")(spark, sf)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == want,
      s"served MMR diverged from batch: ${got.diff(want)} vs ${want.diff(got)}")

    // replay of an applied batch appends nothing (marker-guarded)
    MmrServeView.applyBatch(
      rows.take(3).toSeq.toDF("vec_id", "embedding"), batchId = 0L,
      baseDir = dir, corpus = e, codesPerVec = StreamOps.pqCodesPivot(idx),
      cells = cells, codebooks = cbs, k = 5, nProbe = 4)
    assert(served() == want, "replayed batch changed the served results")

    // crash-retry: marker lost after the batch-0 partition committed —
    // the per-batch Overwrite replaces instead of duplicating
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$dir/_mmr-batch-0"))
    MmrServeView.applyBatch(
      rows.take(3).toSeq.toDF("vec_id", "embedding"), batchId = 0L,
      baseDir = dir, corpus = e, codesPerVec = StreamOps.pqCodesPivot(idx),
      cells = cells, codebooks = cbs, k = 5, nProbe = 4)
    assert(served() == want, "crash-retry duplicated or changed results")

    // a writer for a DIFFERENT quantizer era must fail loudly against
    // the same output directory
    val retrained = cbs.map { case (s0, j, cw) => (s0, j, cw.map(_ + 1L)) }
    val ex = intercept[IllegalStateException] {
      MmrServeView.writer(dir, e, idx, cells, retrained)
    }
    assert(ex.getMessage.contains("state-geometry mismatch"))
  }
}
