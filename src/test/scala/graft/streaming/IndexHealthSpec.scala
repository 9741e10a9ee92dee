package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** `s_index_health`: the ingest-maintained health table must equal the
  * batch `q_index_health` over the same corpus and index era, replay
  * must be a no-op, and a re-trained index must refuse the old table. */
class IndexHealthSpec extends SparkSpec {
  import spark.implicits._

  test("maintained health ≡ batch q_index_health; replay no-op; era " +
      "binding refuses a different geometry") {
    val dir = java.nio.file.Files.createTempDirectory("idxhealth").toString
    val e = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val (cells, cbs, _) = graft.operators.Similarity.pqResArtifacts(e)
    val rows = e.as[VecRow].collect().sortBy(_.vec_id)

    val in = MemoryStream[VecRow](spark)
    val q = in.toDF().writeStream
      .foreachBatch(IndexHealthView.writer(dir, cells, cbs))
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("idxhealth-ckpt").toString)
      .start()
    try {
      rows.grouped((rows.length + 2) / 3)
        .foreach { c => in.addData(c.toIndexedSeq); q.processAllAvailable() }
    } finally q.stop()

    val got = IndexHealthView.health(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val want = graft.SparkEntry.queries("q_index_health")(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == want,
      s"maintained health diverged: ${got.diff(want)} vs ${want.diff(got)}")

    // replay of an applied batch is a no-op (marker-guarded)
    IndexHealthView.applyBatch(rows.take(5).toSeq.toDF("vec_id", "embedding"),
      batchId = 0L, baseDir = dir, cells = cells, codebooks = cbs)
    assert(IndexHealthView.health(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq == want,
      "replayed batch changed the health table")

    // a retrained quantizer must refuse the old table (inertia is only
    // comparable within one codebook era)
    val retrained = cbs.map { case (s0, j, cw) => (s0, j, cw.map(_ + 1L)) }
    val ex = intercept[IllegalStateException] {
      IndexHealthView.writer(dir, cells, retrained)
    }
    assert(ex.getMessage.contains("state-geometry mismatch"))
  }
}
