package graft

import graft.operators.Multimodal
import graft.operators.Multimodal._
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Contract tests for the multimodal plumbing: batch shape, explode
  * cardinality, determinism and partition-invariance of the real
  * kernels (exact values are oracle-checked via q_media_meta /
  * q_media_frames / q_media_embed at sf0.01). */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

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
    assert(metas.length == Tables.documents(spark, sf).count())
    metas.foreach { m =>
      assert(m.width == pngWidth(m.media_id), s"media ${m.media_id} width")
      assert(m.height == pngHeight(m.media_id), s"media ${m.media_id} height")
      assert(m.p00 == (m.media_id % 256).toInt, s"media ${m.media_id} corner pixel")
      assert(m.n_bytes > 8) // encoded PNG, not a raw raster
    }
  }

  test("frameSample extracts real decoded rasters: every 4th frame, full geometry") {
    val gifs = mediaGifFromDocuments(spark, sf).limit(24).cache()
    val frames = frameSample(gifs).collect().groupBy(_.media_id)
    gifs.collect().foreach { m =>
      val want = decodeFrames(m.content).filter(_._1 % SampleEvery == 0)
      val got = frames(m.media_id).sortBy(_.frame_idx)
      assert(got.map(_.frame_idx).toSeq == want.map(_._1))
      got.zip(want).foreach { case (g, (_, w, h, bytes)) =>
        assert(g.frame.length == w * h)
        assert(g.frame.toSeq == bytes.toSeq, s"media ${m.media_id} frame ${g.frame_idx}")
        assert(g.px_sum == bytes.map(_ & 0xff).map(_.toLong).sum)
        // corner pixel carries the synthesized frame value
        assert((g.frame(0) & 0xff) == videoFramePixel(m.media_id, g.frame_idx))
      }
    }
  }

  test("features: real decode + projection, deterministic, partition-invariant") {
    val media = mediaPngFromDocuments(spark, sf).cache()
    val f1 = extractFeatures(media).collect().map(f => f.media_id -> f.features.toSeq).toMap
    val f2 = extractFeatures(media.repartition(7)).collect()
      .map(f => f.media_id -> f.features.toSeq).toMap
    assert(f1.values.forall(_.length == FeatureDim))
    assert(f1 == f2) // same vectors regardless of physical partitioning
    // the float view is the integer projection, coordinate for coordinate
    media.limit(8).collect().foreach { m =>
      assert(mediaEmbed(m.content).toSeq == mediaEmbedInt(m.content).map(_.toFloat).toSeq)
    }
    // a genuinely different raster must move the embedding (not a constant)
    assert(f1.values.toSet.size > 1)
  }

  test("media → embedding → int8 ANN composes end-to-end with useful recall") {
    // drop degenerate all-zero embeddings (a 1x1 black raster) before the
    // index — cosine is undefined on them, the standard pipeline filter
    val emb = extractFeatures(mediaPngFromDocuments(spark, sf)).toDF()
      .select(col("media_id").as("vec_id"), col("features").as("embedding"))
      .where(org.apache.spark.sql.functions.exists(
        col("embedding"), x => x =!= 0f))
      .cache()
    def topk(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = topk(graft.operators.Similarity.bruteForceTopK(emb))
    val quant = topk(graft.operators.Similarity.int8TopK(emb))
    assert(exact.nonEmpty && exact.keySet == quant.keySet)
    val recall = exact.keys.toSeq.map(q =>
      (exact(q) intersect quant(q)).size.toDouble / exact(q).size).sum / exact.size
    info(s"media-embedding int8 recall@5 = $recall")
    assert(recall >= 0.5, s"int8 ANN recall over media embeddings collapsed: $recall")
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

  test("decodeImageStats reduces the full raster: consistent with meta, exact on a known image") {
    // a hand-built 2x2 PNG: corner 9, body bytes {100, 101, 102}
    val png = Multimodal.encodePng(2, 2, 9, Array[Byte](100, 101, 102))
    val (w, h, sum, mn, mx) = Multimodal.decodeImageStats(png)
    assert((w, h) == (2, 2))
    // pixels: i=0 -> 9, i=1 -> body(1)=101, i=2 -> body(2)=102, i=3 -> body(0)=100
    assert(sum == 9L + 101 + 102 + 100)
    assert(mn == 9 && mx == 102)
    // fixture-wide: stats bound the corner pixel reported by decodeMeta
    val stats = Multimodal.qMediaPixelStats.build(spark, sf)
    val meta = Multimodal.qMediaMeta.build(spark, sf)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("p00"))
    val bad = stats.join(meta, "doc_id")
      .filter(org.apache.spark.sql.functions.col("p00") <
          org.apache.spark.sql.functions.col("px_min") ||
        org.apache.spark.sql.functions.col("p00") >
          org.apache.spark.sql.functions.col("px_max") ||
        org.apache.spark.sql.functions.col("px_sum") >
          org.apache.spark.sql.functions.col("n_pixels") *
            org.apache.spark.sql.functions.col("px_max"))
    assert(bad.count() == 0, "pixel stats must bound the corner pixel and sum")
  }

  test("decodeAudioEnergy scans the whole data chunk: exact on a known clip") {
    val samples = Array[Byte](0, 10, 127.toByte, 250.toByte)
    val wav = Multimodal.encodeWav(8000f, samples)
    val (rate, n, energy, silent) = Multimodal.decodeAudioEnergy(wav)
    assert(rate == 8000 && n == 4)
    assert(energy == 0L + 10 * 10 + 127 * 127 + 250 * 250)
    assert(silent == 2) // 0 and 10 are below the 32 floor
    // fixture-wide: energy consistent with the peak from q_media_audio
    val e = Multimodal.qAudioEnergy.build(spark, sf)
    val a = Multimodal.qMediaAudio.build(spark, sf)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("peak"))
    val bad = e.join(a, "doc_id")
      .filter(org.apache.spark.sql.functions.col("energy") >
          org.apache.spark.sql.functions.col("n_samples") *
            org.apache.spark.sql.functions.col("peak") *
            org.apache.spark.sql.functions.col("peak") ||
        org.apache.spark.sql.functions.col("n_silent") >
          org.apache.spark.sql.functions.col("n_samples"))
    assert(bad.count() == 0, "energy must be bounded by n * peak^2")
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
