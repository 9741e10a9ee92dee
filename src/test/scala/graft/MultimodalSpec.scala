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

  test("encodeWav writes a genuine RIFF/WAVE container; decodeAudio recovers header + PCM") {
    val samples = Array.tabulate(100)(i => ((i * 37) % 251).toByte)
    val wav = encodeWav(8000f, samples)
    // RIFF....WAVE magic
    assert(new String(wav.take(4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    val (rate, frames, peak) = decodeAudio(wav)
    assert(rate == 8000 && frames == 100L)
    assert(peak == samples.map(_ & 0xff).max)
  }

  test("decodeAudio rejects payloads that are not WAV containers") {
    intercept[Exception] { decodeAudio("not audio at all".getBytes) }
  }

  test("mediaWavFromDocuments round-trips through a real decode per doc") {
    val metas = mediaWavFromDocuments(spark, sf).collect().map { m =>
      val (rate, frames, peak) = decodeAudio(m.content)
      (m.media_id, rate, frames, peak)
    }
    assert(metas.nonEmpty)
    metas.foreach { case (id, rate, frames, peak) =>
      assert(rate == audioSampleRate(id).toInt)
      assert(frames == audioNSamples(id).toLong)
      assert(peak ==
        (0 until audioNSamples(id)).map(audioSample(id, _)).max)
    }
  }

  test("encodePng writes genuine PNG bytes; decodeImage recovers the raster") {
    val png = encodePng(17, 5, corner = 200, body = "hello".getBytes)
    // real PNG container: 8-byte signature 89 'P' 'N' 'G' \r \n 1A \n
    assert(png.take(8).toSeq ==
      Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    val (w, h, p00) = decodeImage(png)
    assert((w, h, p00) == (17, 5, 200))
    // body pixels cycle through the payload bytes ('e' at raster index 1)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img.getRaster.getSample(1, 0, 0) == 'e'.toInt)
  }

  test("decodeImage rejects payloads that are not decodable images") {
    intercept[Exception] { decodeImage("not a png at all".getBytes) }
  }

  test("decodeMeta runs a real PNG decode: dims/corner match the synthesis geometry") {
    val metas = decodeMeta(mediaPngFromDocuments(spark, sf)).collect()
    assert(metas.length == media.count())
    metas.foreach { m =>
      assert(m.width == pngWidth(m.media_id), s"media ${m.media_id} width")
      assert(m.height == pngHeight(m.media_id), s"media ${m.media_id} height")
      assert(m.p00 == (m.media_id % 256).toInt, s"media ${m.media_id} corner pixel")
      assert(m.n_bytes > 8) // encoded PNG, not a raw raster
    }
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

  test("resizeNearest: real decode + integer resample, up- and down-scaling") {
    // 4x2 source: pixels 10,20,30,40 / 50,60,70,80 — raster index i takes
    // body(i % 8) for i > 0 (body(0) unused: the corner overrides i = 0)
    val body = Array[Byte](99, 20, 30, 40, 50, 60, 70, 80)
    val png = encodePng(4, 2, 10, body)
    // downscale to 2x1: samples src(0,0), src(2,0)
    assert(resizeNearest(png, 2, 1).toSeq == Seq(10, 30))
    // upscale width to 8x2: each src column sampled twice
    assert(resizeNearest(png, 8, 2).toSeq ==
      Seq(10, 10, 20, 20, 30, 30, 40, 40, 50, 50, 60, 60, 70, 70, 80, 80))
    // identity resize returns the raster itself
    assert(resizeNearest(png, 4, 2).toSeq == Seq(10, 20, 30, 40, 50, 60, 70, 80))
  }

  test("encodeGif writes a genuine multi-frame GIF; decodeVideo recovers every raster") {
    val bytes = encodeGif(17, 9, Seq(7, 20, 33, 46, 59))
    // GIF89a magic — a real container, not a fake header
    assert(bytes.take(6).map(_.toChar).mkString == "GIF89a")
    val frames = decodeVideo(bytes)
    assert(frames.map(_._1) == Seq(0, 1, 2, 3, 4))
    assert(frames.forall { case (_, w, h, _) => w == 17 && h == 9 })
    assert(frames.map(_._4) == Seq(7, 20, 33, 46, 59))
  }

  test("decodeVideo decodes full rasters, not just headers") {
    val bytes = encodeGif(8, 6, Seq(100))
    javax.imageio.ImageIO.setUseCache(false)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    // body pixel (x=3, y=2) follows the synthesis pattern (x + y*31) % 256
    assert((img.getRGB(3, 2) & 0xff) == (3 + 2 * 31) % 256)
  }

  test("decodeVideo rejects payloads that are not GIF containers") {
    intercept[Exception](decodeVideo("not a gif at all".getBytes))
  }

  test("mediaGifFromDocuments round-trips frame count and geometry per doc") {
    val media = mediaGifFromDocuments(spark, sf).limit(24).collect()
    assert(media.nonEmpty)
    media.foreach { m =>
      val frames = decodeVideo(m.content)
      assert(frames.length == videoNFrames(m.media_id))
      assert(frames.forall { case (_, w, h, _) =>
        w == videoWidth(m.media_id) && h == videoHeight(m.media_id) })
      frames.foreach { case (i, _, _, p00) =>
        assert(p00 == videoFramePixel(m.media_id, i))
      }
    }
  }
}
