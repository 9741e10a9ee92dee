package graft

import graft.operators.Multimodal
import graft.operators.Multimodal._
import org.scalatest.funsuite.AnyFunSuite

/** Contract tests for the multimodal plumbing: batch shape, explode
  * cardinality, determinism and partition-invariance of the stubbed
  * kernels (exact values are oracle-checked via q_media_meta /
  * q_media_frames at sf0.01). */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = mediaFromDocuments(spark, sf).cache()

  test("decodeMeta: one row per media, dims within decode bounds") {
    val metas = decodeMeta(media).collect()
    assert(metas.length == media.count())
    assert(metas.forall(m => m.width >= 1 && m.width <= 640))
    assert(metas.forall(m => m.height >= 1 && m.height <= 480))
    assert(metas.forall(m => m.n_bytes > 0))
  }

  test("frameSample: cardinality and byte accounting match the chunk walk") {
    val frames = frameSample(media).collect()
    val byMedia = frames.groupBy(_.media_id)
    val sizes = media.collect().map(m => m.media_id -> m.content.length).toMap
    sizes.foreach { case (id, n) =>
      val nChunks = (n + FrameBytes - 1) / FrameBytes
      val expected = (0 until nChunks by SampleEvery).size
      assert(byMedia(id).length == expected, s"media $id")
      // every sampled frame is full-size except possibly the last chunk
      byMedia(id).foreach { f =>
        val expectedLen = math.min(FrameBytes, n - f.frame_idx * FrameBytes)
        assert(f.frame.length == expectedLen)
      }
    }
  }

  test("features: fixed dimension, [0,1) range, deterministic, partition-invariant") {
    val f1 = extractFeatures(media).collect().map(f => f.media_id -> f.features.toSeq).toMap
    val f2 = extractFeatures(media.repartition(7)).collect()
      .map(f => f.media_id -> f.features.toSeq).toMap
    assert(f1.values.forall(_.length == FeatureDim))
    assert(f1.values.forall(_.forall(v => v >= 0f && v < 1f)))
    assert(f1 == f2) // same vectors regardless of physical partitioning
  }

  test("resizeStub honors the output-size contract") {
    val out = resizeStub("abc".getBytes, 32, 16)
    assert(out.length == 32 * 16)
    assert(resizeStub(Array.empty[Byte], 8, 8).length == 64)
  }
}
