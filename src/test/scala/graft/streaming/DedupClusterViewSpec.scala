package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The full streaming dedup story, wire-to-labels: documents arrive,
  * near-dup candidate pairs stream out of the LSH gate, and a
  * transitively-closed cluster-labels table is maintained across
  * micro-batches — pinned equal to the batch q_dedup_cluster labels. */
class DedupClusterViewSpec extends SparkSpec {
  import spark.implicits._

  test("streamed docs -> neardup pairs -> maintained labels == batch clustering") {
    val base = java.nio.file.Files.createTempDirectory("graft-ccview").toString
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().sortBy(_._1)
    val (first, second) = docs.splitAt(docs.length / 2)
    val in = MemoryStream[(Long, String)](spark)
    val q = StreamOps.neardupStream(in.toDF().toDF("doc_id", "text"),
      checkpointLocation = StreamOps.EphemeralState)
      .writeStream
      .option("checkpointLocation", s"$base/ckpt")
      .foreachBatch(DedupClusterView.writer(s"$base/view"))
      .start()
    try {
      in.addData(first.toSeq); q.processAllAvailable()
      // mid-stream: labels exist and are already transitively closed
      val mid = DedupClusterView.readLabels(spark, s"$base/view")
      assert(mid.count() > 0)
      assert(mid.where(col("cluster_id") > col("doc_id")).isEmpty)

      in.addData(second.toSeq); q.processAllAvailable()
      val streamed = DedupClusterView.readLabels(spark, s"$base/view")
        .as[(Long, Long)].collect().toMap
      // batch twin: q_dedup_cluster labels, restricted to paired docs
      // (the view labels the docs that appeared in a pair; singletons
      // self-label via the documented coalesce)
      val paired = graft.operators.TextOps.minhashPairs(spark, sf)
        .as[(Long, Long)].collect().flatMap(p => Seq(p._1, p._2)).toSet
      val batch = graft.operators.TextOps.clusterLabels(spark, sf)
        .as[(Long, Long)].collect().toMap
        .filter { case (id, _) => paired(id) }
      assert(streamed == batch,
        s"streamed ${streamed.size} labels, batch ${batch.size}")
      assert(batch.nonEmpty, "fixture has no duplicate clusters — vacuous test")

      // exactly-once: replaying an already-applied batch changes nothing
      val edgesBefore = spark.read.parquet(s"$base/view/edges").count()
      DedupClusterView.applyBatch(
        Seq((1L, 2L)).toDF("doc_a", "doc_b"), batchId = 0L, s"$base/view")
      assert(spark.read.parquet(s"$base/view/edges").count() == edgesBefore)
      assert(DedupClusterView.readLabels(spark, s"$base/view")
        .as[(Long, Long)].collect().toMap == streamed)

      // maintenance: compacting the edge log (bands/batches re-emit
      // pairs) shrinks it without changing the next reclustering —
      // force a real recluster over the compacted log by replaying one
      // already-known pair under a fresh batch id
      DedupClusterView.compactEdges(spark, s"$base/view")
      val compacted = spark.read.parquet(s"$base/view/edges").count()
      assert(compacted <= edgesBefore)
      val knownPair = graft.operators.TextOps.minhashPairs(spark, sf)
        .as[(Long, Long)].head()
      DedupClusterView.applyBatch(
        Seq(knownPair).toDF("doc_a", "doc_b"), batchId = 99L, s"$base/view")
      val relabeled = DedupClusterView.readLabels(spark, s"$base/view")
        .as[(Long, Long)].collect().toMap
      assert(relabeled == streamed, "compaction changed the clustering")
    } finally {
      q.stop()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    }
  }
}
