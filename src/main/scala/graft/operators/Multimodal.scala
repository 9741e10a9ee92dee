package graft.operators

import graft.{Q, QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) columns as opaque `binary` + typed
  * metadata, with decode / feature-extract / resize / frame-sample as
  * partition-mapped transforms — the JVM analog of `mapInPandas`: each
  * partition is processed in bounded batches ([[Multimodal.BatchSize]]
  * rows), so a real decoder would amortize codec/model init per batch
  * exactly like an Arrow batch UDF.
  *
  * The IMAGE path is real end-to-end: payloads are genuine PNGs
  * ([[Multimodal.encodePng]], javax.imageio) and metadata extraction
  * runs a real PNG decode ([[Multimodal.decodeImage]]). The AUDIO path
  * is real too: genuine RIFF/WAVE containers ([[Multimodal.encodeWav]],
  * javax.sound.sampled) parsed back by [[Multimodal.decodeAudio]]
  * (header + PCM data-chunk scan). The VIDEO path is real as well:
  * multi-frame animated GIFs ([[Multimodal.encodeGif]] — the one
  * multi-frame container the JDK can both write and read) decoded
  * frame-by-frame through ImageIO's LZW decoder
  * ([[Multimodal.decodeVideo]]/[[Multimodal.decodeFrames]]), with frame
  * SAMPLING applied to decoded frame rasters (q_media_frames samples and
  * materializes every 4th raster; q_media_video aggregates every 2nd
  * frame's metadata). RESIZE is real: [[Multimodal.resizeNearest]]
  * decodes and nearest-neighbor resamples the raster (q_media_resize).
  * FEATURE EXTRACTION is real: [[Multimodal.mediaEmbedInt]] is a
  * fixed-seed random-projection embedding (JL-style) over the decoded
  * raster — a genuine decode + linear map, not a byte hash — and
  * composes with the int8 + LSH ANN stack (spec-asserted recall). No
  * stub kernels remain in this file; every kernel parses its real
  * container.
  *
  * Scale notes: decode parallelism == partition count of the binary
  * column's source; callers repartition before heavy decode so a
  * 1000-executor cluster fans out evenly. Nothing here collects to the
  * driver; frame-sampling is a flatMap (no shuffle), metadata extraction
  * is a map, and only the per-media aggregation shuffles (by media_id).
  */
object Multimodal extends QueryPack {

  /** One media object: id + modality tag + opaque payload. */
  final case class MediaRow(media_id: Long, kind: String, content: Array[Byte])
  final case class MediaMeta(
      media_id: Long, n_bytes: Long, width: Int, height: Int, p00: Int)
  /** One extracted frame: raster payload + integrity checksum (unsigned
    * byte sum), computed in the same decode pass. */
  final case class MediaFrame(
      media_id: Long, frame_idx: Int, frame: Array[Byte], px_sum: Long)
  final case class AudioMeta(
      media_id: Long, sample_rate: Int, n_samples: Long, peak: Int)
  final case class MediaFeatures(media_id: Long, features: Array[Float])

  /** mapInPandas-style batch size: a real decoder initializes its codec
    * once per batch, not once per row. */
  val BatchSize = 64
  val SampleEvery = 4
  val FeatureDim = 16

  /** The `documents` table as genuine encoded images: each payload is a
    * REAL PNG (written by ImageIO) whose dimensions and corner pixel are
    * deterministic functions of doc_id and whose body pixels come from
    * the text bytes — so the decode side must run a real PNG decoder,
    * while the DuckDB oracle can still predict what it will find.
    * Synthesis is batched mapPartitions like every other kernel here;
    * at scale this stage is the "encode/transcode" half of a media
    * pipeline and parallelizes with the partition count. */
  def mediaPngFromDocuments(s: SparkSession, dir: String): Dataset[MediaRow] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[MediaRow]
    import s.implicits._
    // Par.boost: the PNG encode (javax.imageio, one image per row) is
    // heavy per-row compute BEFORE any exchange — a single-file fixture
    // otherwise encodes the whole corpus on one core
    Par.boost(Tables.documents(s, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("bytes")),
      costFactor = 32)
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.map { case (docId, text) =>
            MediaRow(docId, "image/png",
              encodePng(pngWidth(docId), pngHeight(docId), (docId % 256).toInt, text))
          }
        }
      }
  }

  /** Deterministic synthetic-image geometry: known to the oracle, opaque
    * to the decoder (which must parse the PNG to recover it). */
  def pngWidth(docId: Long): Int = 1 + (docId % 64).toInt
  def pngHeight(docId: Long): Int = 1 + ((docId * 7) % 48).toInt

  // ------------------------------------------------------------- kernels

  /** Encode a real grayscale PNG: `corner` becomes pixel (0,0), the rest
    * of the raster cycles through `body`. Pure JDK (javax.imageio). */
  def encodePng(width: Int, height: Int, corner: Int, body: Array[Byte]): Array[Byte] = {
    javax.imageio.ImageIO.setUseCache(false) // in-memory, no /tmp scratch
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val i = y * width + x
        val v =
          if (i == 0) corner
          else if (body.nonEmpty) body(i % body.length) & 0xff
          else 0
        raster.setSample(x, y, 0, v)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream(1024)
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** REAL image decode via javax.imageio: parses the PNG (any ImageIO
    * format, in fact) and returns (width, height, pixel(0,0) gray).
    * Throws on undecodable payloads — at 100 TB you want corrupt media
    * quarantined loudly (wrap with a try + side output), not zeroed. */
  def decodeImage(content: Array[Byte]): (Int, Int, Int) = {
    javax.imageio.ImageIO.setUseCache(false)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
    if (img == null)
      throw new IllegalArgumentException(
        s"undecodable image payload (${content.length} bytes)")
    (img.getWidth, img.getHeight, img.getRaster.getSample(0, 0, 0))
  }

  // ------------------------------------------------------- audio kernels

  /** Deterministic synthetic-audio parameters: known to the oracle,
    * opaque to the decoder (which must parse the WAV container and read
    * the PCM data chunk to recover them). */
  def audioSampleRate(docId: Long): Float = if (docId % 2 == 0) 8000f else 16000f
  def audioNSamples(docId: Long): Int = 64 + (docId % 192).toInt
  def audioSample(docId: Long, i: Int): Int = ((docId * 31 + i * 7) % 251).toInt

  /** The WAVE file writer SPI, resolved ONCE per JVM (r17): every
    * `AudioSystem.write` call walks the provider registry, whose lookup
    * is synchronized JVM-globally — 32 concurrent decode tasks convoy
    * on that lock (the media boost made the WAV pair SLOWER 32-way
    * than single-task until this was lifted). `java.util.ServiceLoader`
    * over the public `javax.sound.sampled.spi` types is the documented
    * resolution path; the cached instance is stateless and the write it
    * performs is byte-identical to `AudioSystem.write`. */
  private lazy val wavWriter: javax.sound.sampled.spi.AudioFileWriter = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileWriter])
      .iterator.asScala
      .find(_.isFileTypeSupported(
        javax.sound.sampled.AudioFileFormat.Type.WAVE))
      .getOrElse(sys.error("no WAVE AudioFileWriter provider"))
  }

  /** The WAVE file reader SPI, resolved once per JVM — the read-side
    * twin of [[wavWriter]] (`AudioSystem.getAudioInputStream` pays the
    * same synchronized registry walk per payload). */
  private lazy val wavReader: javax.sound.sampled.spi.AudioFileReader = {
    import scala.jdk.CollectionConverters._
    val probe = encodeWav(8000f, Array[Byte](0))
    java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader])
      .iterator.asScala
      .find { r =>
        try { r.getAudioInputStream(
          new java.io.ByteArrayInputStream(probe)).close(); true }
        catch { case _: Exception => false }
      }
      .getOrElse(sys.error("no WAVE AudioFileReader provider"))
  }

  /** Encode a real RIFF/WAVE container: 8-bit unsigned mono PCM through
    * javax.sound.sampled (pure JDK, headless-safe — container IO only,
    * no audio device). */
  def encodeWav(sampleRate: Float, samples: Array[Byte]): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED,
      sampleRate, 8, 1, 1, sampleRate, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(samples), fmt, samples.length.toLong)
    val out = new java.io.ByteArrayOutputStream(samples.length + 64)
    wavWriter.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** REAL audio decode via javax.sound.sampled: parses the WAV header
    * (sample rate, frame count) and streams the PCM data chunk for the
    * peak amplitude — a fake parse can reproduce none of the three.
    * Throws on undecodable payloads (same quarantine-loudly stance as
    * [[decodeImage]]). */
  def decodeAudio(content: Array[Byte]): (Int, Long, Int) = {
    val ais = wavReader.getAudioInputStream(
      new java.io.ByteArrayInputStream(content))
    val rate = ais.getFormat.getSampleRate.toInt
    val frames = ais.getFrameLength
    var peak = 0
    val buf = new Array[Byte](4096)
    var n = ais.read(buf)
    while (n > 0) {
      var i = 0
      while (i < n) {
        val v = buf(i) & 0xff
        if (v > peak) peak = v
        i += 1
      }
      n = ais.read(buf)
    }
    (rate, frames, peak)
  }

  /** The `documents` table as genuine WAV audio: per-doc sample rate,
    * duration, and PCM content are pure functions of doc_id (so the
    * DuckDB oracle can predict them) but reach the reader only through a
    * real RIFF/WAVE container. */
  def mediaWavFromDocuments(s: SparkSession, dir: String): Dataset[MediaRow] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[MediaRow]
    import s.implicits._
    // Par.boost: PCM synthesis + WAV encode per row, ahead of any
    // exchange (the single-file one-core trap, graft.operators.Par).
    // Boost BEFORE the projection: the synth cost scales with the doc,
    // so the unpruned stats are the honest weight — column pruning
    // still pushes the doc_id-only Project below the added exchange,
    // so only 8-byte rows ever ship
    Par.boost(Tables.documents(s, dir), costFactor = 32)
      .select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.map { docId =>
            val samples = Array.tabulate(audioNSamples(docId))(i =>
              audioSample(docId, i).toByte)
            MediaRow(docId, "audio/wav",
              encodeWav(audioSampleRate(docId), samples))
          }
        }
      }
  }

  // ------------------------------------------------------- video kernels

  /** Deterministic synthetic-video parameters: known to the oracle,
    * opaque to the decoder (which must parse the GIF container and
    * LZW-decode every frame raster to recover them). */
  def videoNFrames(docId: Long): Int = 2 + (docId % 7).toInt
  def videoWidth(docId: Long): Int = 1 + (docId % 32).toInt
  def videoHeight(docId: Long): Int = 1 + ((docId * 5) % 24).toInt
  def videoFramePixel(docId: Long, f: Int): Int = ((docId * 7 + f * 13) % 256).toInt

  /** Every-other-frame sampling for the decoded-video path. */
  val FrameSampleEvery = 2

  /** Explicit 256-level gray palette: the GIF writer emits provided
    * palette indices verbatim, so every pixel round-trips exactly.
    * (A TYPE_BYTE_GRAY source instead goes through the writer's own
    * palette construction, which quantizes away rows of short images —
    * observed at heights < 6.) */
  private lazy val gray256: java.awt.image.IndexColorModel = {
    val ramp = Array.tabulate(256)(_.toByte)
    new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
  }

  /** Encode a real multi-frame animated GIF (pure JDK: ImageIO's GIF
    * sequence writer). Each frame is a grayscale raster whose (0,0)
    * pixel carries the frame's value and whose body cycles a fixed
    * pattern; frames are written indexed against [[gray256]] and
    * NON-interlaced (the JDK writer interlaces by default, and its
    * reader scrambles interlaced rasters shorter than the interlace
    * pass stride — observed at heights < 6), so every decoded pixel is
    * bit-comparable. */
  def encodeGif(width: Int, height: Int, framePixels: Seq[Int]): Array[Byte] = {
    javax.imageio.ImageIO.setUseCache(false)
    val out = new java.io.ByteArrayOutputStream(1024)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      framePixels.foreach { v =>
        val img = new java.awt.image.BufferedImage(
          width, height, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, gray256)
        val raster = img.getRaster
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) {
            raster.setSample(x, y, 0,
              if (x == 0 && y == 0) v else (x + y * 31) % 256)
            x += 1
          }
          y += 1
        }
        val param = writer.getDefaultWriteParam
        // GIF interlace rides the "progressive" knob; MODE_DISABLED writes
        // sequential rows (MODE_DEFAULT interlaces, and the JDK reader
        // scrambles interlaced rasters shorter than the pass stride)
        param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), param)
      }
      writer.endWriteSequence()
    } finally {
      ios.close()
      writer.dispose()
    }
    out.toByteArray
  }

  /** REAL video decode via ImageIO's GIF reader: parses the container,
    * LZW-decodes every frame, returns (frame_idx, width, height,
    * pixel(0,0) gray) per frame. Throws on undecodable payloads (same
    * quarantine-loudly stance as [[decodeImage]]). */
  def decodeVideo(content: Array[Byte]): Seq[(Int, Int, Int, Int)] = {
    javax.imageio.ImageIO.setUseCache(false)
    val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(content))
    try {
      reader.setInput(iis)
      val n = reader.getNumImages(true)
      if (n <= 0)
        throw new IllegalArgumentException(
          s"undecodable video payload (${content.length} bytes)")
      (0 until n).map { i =>
        val img = reader.read(i)
        (i, img.getWidth, img.getHeight, img.getRGB(0, 0) & 0xff)
      }
    } finally {
      reader.dispose()
      iis.close()
    }
  }

  /** [[decodeVideo]] with in-decoder sampling: returns the TOTAL frame
    * count (from the block-structure walk — no pixel decode) plus
    * metadata for every `every`-th frame only; skipped frames are never
    * LZW-decoded. The q_media_video path samples 1-in-[[FrameSampleEvery]],
    * so this halves its decode work. */
  def decodeVideoSampled(content: Array[Byte], every: Int)
      : (Int, Seq[(Int, Int, Int, Int)]) = {
    javax.imageio.ImageIO.setUseCache(false)
    val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(content))
    try {
      reader.setInput(iis)
      val n = reader.getNumImages(true)
      if (n <= 0)
        throw new IllegalArgumentException(
          s"undecodable video payload (${content.length} bytes)")
      val sampled = (0 until n).filter(_ % every == 0).map { i =>
        val img = reader.read(i)
        (i, img.getWidth, img.getHeight, img.getRaster.getSample(0, 0, 0))
      }
      (n, sampled)
    } finally {
      reader.dispose()
      iis.close()
    }
  }

  /** The `documents` table as genuine animated-GIF video: frame count,
    * geometry, and per-frame pixels are pure functions of doc_id (so the
    * DuckDB oracle can predict them) but reach the reader only through a
    * real multi-frame GIF container. */
  def mediaGifFromDocuments(s: SparkSession, dir: String): Dataset[MediaRow] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[MediaRow]
    import s.implicits._
    // Par.boost: per-frame raster synthesis + GIF/LZW encode per row,
    // ahead of any exchange (the single-file one-core trap). Boosted
    // before the projection for the same stats reason as the WAV twin
    Par.boost(Tables.documents(s, dir), costFactor = 32)
      .select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.map { docId =>
            val pixels = (0 until videoNFrames(docId))
              .map(f => videoFramePixel(docId, f))
            MediaRow(docId, "video/gif",
              encodeGif(videoWidth(docId), videoHeight(docId), pixels))
          }
        }
      }
  }

  /** REAL frame extraction via ImageIO's GIF reader: parses the
    * container, LZW-decodes every frame, and materializes each frame's
    * grayscale raster bytes (row-major) plus its unsigned byte sum —
    * the payload a downstream vision stage would consume. Throws on
    * undecodable payloads (same quarantine-loudly stance as
    * [[decodeImage]]). */
  /** Decode every `every`-th frame's raster (default: all). Non-sampled
    * frames are never LZW-decoded — `getNumImages` walks the GIF block
    * structure to count frames, and `reader.read(i)` decodes only the
    * requested image, so a 4:1 sampler pays ~1/4 of the LZW work.
    * Rasters are read as palette indices straight off the writer's
    * identity gray ramp ([[gray256]]) — same values as the sRGB channel,
    * no per-pixel color-model conversion. */
  def decodeFrames(content: Array[Byte], every: Int = 1)
      : Seq[(Int, Int, Int, Array[Byte])] = {
    javax.imageio.ImageIO.setUseCache(false)
    val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(content))
    try {
      reader.setInput(iis)
      val n = reader.getNumImages(true)
      if (n <= 0)
        throw new IllegalArgumentException(
          s"undecodable video payload (${content.length} bytes)")
      (0 until n).filter(_ % every == 0).map { i =>
        val img = reader.read(i)
        val w = img.getWidth
        val h = img.getHeight
        val raster = img.getRaster
        val bytes = new Array[Byte](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            bytes(y * w + x) = raster.getSample(x, y, 0).toByte
            x += 1
          }
          y += 1
        }
        (i, w, h, bytes)
      }
    } finally {
      reader.dispose()
      iis.close()
    }
  }

  /** REAL resize: decode the image (javax.imageio) and nearest-neighbor
    * resample the raster to `outW` x `outH` — `out(x,y) =
    * src(x*sw/outW, y*sh/outH)` with integer floor division, the
    * standard thumbnail kernel, and deterministic enough for the DuckDB
    * oracle to reproduce pixel-for-pixel (unlike area-averaging filters,
    * whose float accumulation would not hash-match). Handles up- and
    * down-scaling (sw < outW duplicates columns). */
  def resizeNearest(content: Array[Byte], outW: Int, outH: Int): Array[Int] = {
    javax.imageio.ImageIO.setUseCache(false)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
    if (img == null)
      throw new IllegalArgumentException(
        s"undecodable image payload (${content.length} bytes)")
    val raster = img.getRaster
    val sw = img.getWidth
    val sh = img.getHeight
    Array.tabulate(outH * outW) { k =>
      val y = k / outW
      val x = k % outW
      raster.getSample(x * sw / outW, y * sh / outH, 0)
    }
  }

  /** Fixed projection weight for (dim d, raster index i): integers in
    * [-504, 504] from a multiplicative hash — the "random" planes of a
    * JL-style random-projection embedding, pinned so the DuckDB oracle
    * can replay them in plain integer SQL. */
  def embedWeight(d: Int, i: Int): Long =
    ((i + 1).toLong * 2654435761L + (d + 1).toLong * 40503L) % 1009L - 504L

  /** REAL feature extraction: decode the image (javax.imageio) and apply
    * a fixed random projection over the raster — `e_d = Σ_i w(d,i)·px_i`.
    * A genuine decode + linear map (the classical JL embedding, the
    * model-free baseline a vision-embedding stage slots into), exact in
    * integer arithmetic so the oracle can reproduce every coordinate.
    * Throws on undecodable payloads. */
  def mediaEmbedInt(content: Array[Byte]): Array[Long] = {
    javax.imageio.ImageIO.setUseCache(false)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
    if (img == null)
      throw new IllegalArgumentException(
        s"undecodable image payload (${content.length} bytes)")
    val raster = img.getRaster
    val w = img.getWidth
    val h = img.getHeight
    val acc = new Array[Long](FeatureDim)
    var i = 0
    val n = w * h
    while (i < n) {
      val px = raster.getSample(i % w, i / w, 0).toLong
      var d = 0
      while (d < FeatureDim) {
        acc(d) += embedWeight(d, i) * px
        d += 1
      }
      i += 1
    }
    acc
  }

  /** Float view of [[mediaEmbedInt]] for the ANN stack (cosine ranking is
    * scale-invariant, so the integer→float cast loses nothing that
    * matters; determinism is spec-pinned). */
  def mediaEmbed(content: Array[Byte]): Array[Float] =
    mediaEmbedInt(content).map(_.toFloat)

  // --------------------------------------------------------- transforms

  /** Decode metadata for every media object — batched mapPartitions, the
    * mapInPandas shape (iterator of batches in, iterator of batches out).
    * The kernel is the REAL [[decodeImage]]: every payload goes through
    * javax.imageio's PNG decoder; n_bytes is the encoded size, the rest
    * comes from the decoded raster. */
  def decodeMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[MediaMeta]
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        // real decoders init their codec here, once per batch
        batch.map { m =>
          val (w, h, p00) = decodeImage(m.content)
          MediaMeta(m.media_id, m.content.length.toLong, w, h, p00)
        }
      }
    }
  }

  /** Keep each [[SampleEvery]]-th decoded RASTER — the video
    * frame-extraction shape: one row in, 0..n frame-payload rows out
    * (flatMap; no shuffle), each with its decode-pass checksum.
    * Sampling happens INSIDE the decoder ([[decodeFrames]]' `every`):
    * skipped frames are block-skipped, never LZW-decoded. */
  def frameSample(media: Dataset[MediaRow]): Dataset[MediaFrame] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[MediaFrame]
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.flatMap { m =>
          decodeFrames(m.content, SampleEvery).iterator
            .map { case (idx, _, _, bytes) =>
              var s = 0L
              var i = 0
              while (i < bytes.length) { s += bytes(i) & 0xff; i += 1 }
              MediaFrame(m.media_id, idx, bytes, s)
            }
        }
      }
    }
  }

  /** Per-media feature vectors: real decode + fixed random projection. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[MediaFeatures]
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap(_.map(m =>
        MediaFeatures(m.media_id, mediaEmbed(m.content))))
    }
  }

  /** Decode outcome row: `ok` media carry their decoded geometry,
    * quarantined media carry the failure reason — the side-output shape
    * a 100 TB pipeline needs so corrupt payloads are counted and kept
    * for forensics instead of killing the job or silently zeroing. */
  final case class MediaDecodeOutcome(
      media_id: Long, status: String, n_bytes: Long, width: Int, height: Int)

  /** [[decodeMeta]] with quarantine: undecodable payloads become
    * `status = "quarantined"` rows instead of task failures. Same
    * batched mapPartitions shape; the happy path still runs the REAL
    * [[decodeImage]] kernel. */
  def decodeMetaSafe(media: Dataset[MediaRow]): Dataset[MediaDecodeOutcome] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[MediaDecodeOutcome]
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.map { m =>
          try {
            val (w, h, _) = decodeImage(m.content)
            MediaDecodeOutcome(m.media_id, "ok", m.content.length.toLong, w, h)
          } catch {
            case _: Exception =>
              MediaDecodeOutcome(m.media_id, "quarantined",
                m.content.length.toLong, 0, 0)
          }
        }
      }
    }
  }

  /** Full-raster pixel statistics from a REAL decode: sum, min, max over
    * every gray sample. The per-image reduction happens inside the decode
    * pass (no per-pixel rows leave the kernel). */
  def decodeImageStats(content: Array[Byte]): (Int, Int, Long, Int, Int) = {
    javax.imageio.ImageIO.setUseCache(false)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
    if (img == null)
      throw new IllegalArgumentException(
        s"undecodable image payload (${content.length} bytes)")
    val raster = img.getRaster
    val w = img.getWidth
    val h = img.getHeight
    var s = 0L
    var mn = Int.MaxValue
    var mx = Int.MinValue
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = raster.getSample(x, y, 0)
        s += v
        if (v < mn) mn = v
        if (v > mx) mx = v
        x += 1
      }
      y += 1
    }
    (w, h, s, mn, mx)
  }

  /** PCM energy profile from a REAL decode: Σ sample², silent-sample
    * count (8-bit unsigned value < [[SilenceFloor]]) — accumulated in
    * the same data-chunk scan as [[decodeAudio]]'s peak. */
  val SilenceFloor = 32
  def decodeAudioEnergy(content: Array[Byte]): (Int, Long, Long, Long) = {
    val ais = wavReader.getAudioInputStream(
      new java.io.ByteArrayInputStream(content))
    val rate = ais.getFormat.getSampleRate.toInt
    val frames = ais.getFrameLength
    var energy = 0L
    var silent = 0L
    val buf = new Array[Byte](4096)
    var n = ais.read(buf)
    while (n > 0) {
      var i = 0
      while (i < n) {
        val v = (buf(i) & 0xff).toLong
        energy += v * v
        if (v < SilenceFloor) silent += 1
        i += 1
      }
      n = ais.read(buf)
    }
    (rate, frames, energy, silent)
  }

  // ------------------------------------------------------------ queries

  /** Binary decode metadata with a REAL codec: payloads are genuine PNGs
    * (ImageIO-encoded), the kernel is a genuine PNG decode
    * ([[decodeImage]]), and the oracle predicts what the decoder must
    * recover because the synthesis geometry is a pure function of doc_id:
    * width = 1 + doc_id % 64, height = 1 + (doc_id*7) % 48, corner pixel
    * = doc_id % 256. If the decode were fake (or dropped the raster),
    * width/height/p00 would not hash-match. */
  val qMediaMeta: Q = Q(
    "q_media_meta",
    Some("""
      SELECT doc_id,
             CAST(1 + doc_id % 64 AS INT) AS width,
             CAST(1 + (doc_id * 7) % 48 AS INT) AS height,
             CAST((1 + doc_id % 64) * (1 + (doc_id * 7) % 48) AS BIGINT) AS n_pixels,
             CAST(doc_id % 256 AS INT) AS p00
      FROM documents
      ORDER BY doc_id
      """.stripMargin.trim)
  ) { (s, dir) =>
    decodeMeta(mediaPngFromDocuments(s, dir))
      .toDF()
      .select(col("media_id").as("doc_id"), col("width"), col("height"),
        (col("width").cast("long") * col("height").cast("long")).as("n_pixels"),
        col("p00"))
      .orderBy("doc_id")
  }

  final case class PixelStats(
      media_id: Long, n_pixels: Long, px_sum: Long, px_min: Int, px_max: Int)

  /** Full-raster pixel statistics (brightness profile) with a REAL
    * codec: every payload's ENTIRE raster is decoded and reduced in the
    * kernel ([[decodeImageStats]]) — sum, min, max over all gray
    * samples. The oracle predicts all three because synthesis writes
    * pixel i as text byte i % len (corner excepted), so a decoder that
    * sampled, skipped rows, or mis-ordered the raster cannot hash-match.
    * This is the per-asset quality-screen a media pipeline thresholds on
    * (all-black / blown-out assets have degenerate sum/min/max).
    *
    * Scale: the per-pixel reduction happens INSIDE the decode kernel —
    * only 5 longs per image leave the executor, never pixel rows; the
    * final ORDER BY is the only exchange. */
  val qMediaPixelStats: Q = Q(
    "q_media_pixel_stats",
    Some("""
      WITH d AS (SELECT doc_id, text, length(text) AS len,
                        1 + doc_id % 64 AS w, 1 + (doc_id * 7) % 48 AS h,
                        doc_id % 256 AS corner
                 FROM documents),
      body AS (SELECT d.doc_id,
                      SUM(ascii(substr(d.text, CAST(u.i % d.len AS INT) + 1, 1))) AS bsum,
                      MIN(ascii(substr(d.text, CAST(u.i % d.len AS INT) + 1, 1))) AS bmin,
                      MAX(ascii(substr(d.text, CAST(u.i % d.len AS INT) + 1, 1))) AS bmax
               FROM d, unnest(generate_series(1, d.w * d.h - 1)) AS u(i)
               GROUP BY d.doc_id)
      SELECT d.doc_id,
             CAST(d.w * d.h AS BIGINT) AS n_pixels,
             CAST(d.corner + COALESCE(b.bsum, 0) AS BIGINT) AS px_sum,
             CAST(CASE WHEN b.bmin IS NULL OR d.corner < b.bmin
                       THEN d.corner ELSE b.bmin END AS INT) AS px_min,
             CAST(CASE WHEN b.bmax IS NULL OR d.corner > b.bmax
                       THEN d.corner ELSE b.bmax END AS INT) AS px_max
      FROM d LEFT JOIN body b ON d.doc_id = b.doc_id
      ORDER BY d.doc_id
      """.stripMargin.trim)
  ) { (s, dir) =>
    implicit val enc = org.apache.spark.sql.Encoders.product[PixelStats]
    mediaPngFromDocuments(s, dir)
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.map { m =>
            val (w, h, sum, mn, mx) = decodeImageStats(m.content)
            PixelStats(m.media_id, w.toLong * h, sum, mn, mx)
          }
        }
      }
      .toDF()
      .select(col("media_id").as("doc_id"), col("n_pixels"),
        col("px_sum"), col("px_min"), col("px_max"))
      .orderBy("doc_id")
  }

  final case class AudioEnergy(
      media_id: Long, sample_rate: Int, n_samples: Long, energy: Long,
      n_silent: Long)

  /** PCM energy / silence profile with a REAL codec: the data chunk is
    * scanned once for Σ sample² and the silent-sample count
    * ([[decodeAudioEnergy]]) — the audio-quality screen (dead air,
    * clipping-adjacent energy) a speech pipeline filters on. The oracle
    * predicts both exactly from the synthesis function; all-integer
    * output, nothing to round.
    *
    * Scale: like the image path, the per-sample reduction stays inside
    * the kernel; 4 longs per clip leave the executor. */
  val qAudioEnergy: Q = Q(
    "q_audio_energy",
    Some(s"""
      WITH g AS (SELECT i FROM generate_series(0, 254) AS t(i)),
      p AS (SELECT d.doc_id,
                   SUM(((d.doc_id * 31 + g.i * 7) % 251)
                       * ((d.doc_id * 31 + g.i * 7) % 251)) AS energy,
                   COUNT(*) FILTER (WHERE (d.doc_id * 31 + g.i * 7) % 251
                                          < $SilenceFloor) AS n_silent
            FROM documents d JOIN g ON g.i < 64 + d.doc_id % 192
            GROUP BY d.doc_id)
      SELECT d.doc_id,
             CAST(CASE WHEN d.doc_id % 2 = 0 THEN 8000 ELSE 16000 END AS INT)
               AS sample_rate,
             CAST(64 + d.doc_id % 192 AS BIGINT) AS n_samples,
             CAST(p.energy AS BIGINT) AS energy,
             CAST(p.n_silent AS BIGINT) AS n_silent
      FROM documents d JOIN p USING (doc_id)
      ORDER BY d.doc_id
      """.stripMargin.trim)
  ) { (s, dir) =>
    implicit val enc = org.apache.spark.sql.Encoders.product[AudioEnergy]
    mediaWavFromDocuments(s, dir)
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.map { m =>
            val (rate, frames, energy, silent) = decodeAudioEnergy(m.content)
            AudioEnergy(m.media_id, rate, frames, energy, silent)
          }
        }
      }
      .toDF()
      .select(col("media_id").as("doc_id"), col("sample_rate"),
        col("n_samples"), col("energy"), col("n_silent"))
      .orderBy("doc_id")
  }

  /** Frame EXTRACTION with a REAL codec: every payload is a genuine
    * multi-frame GIF, every 4th frame's raster is LZW-decoded and
    * materialized ([[decodeFrames]] via [[frameSample]]), and the
    * aggregate accounts for the extracted payload bytes AND their pixel
    * checksum. The oracle predicts all three because synthesis is a pure
    * function of doc_id — frame f's raster is p00 = (doc_id*7+f*13)%256
    * at (0,0) and (x+y*31)%256 elsewhere — so a sampler that skipped the
    * real decode, walked container bytes, or dropped rasters cannot
    * hash-match. */
  val qMediaFrames: Q = Q(
    "q_media_frames",
    Some(s"""
      WITH g AS (SELECT i FROM generate_series(0, 8) AS t(i)),
      f AS (SELECT d.doc_id, g.i,
                   1 + d.doc_id % 32 AS w, 1 + (d.doc_id * 5) % 24 AS h,
                   (d.doc_id * 7 + g.i * 13) % 256 AS p00
            FROM documents d
            JOIN g ON g.i < 2 + d.doc_id % 7 AND g.i % $SampleEvery = 0),
      grid AS (SELECT x, y FROM generate_series(0, 31) t1(x),
                               generate_series(0, 23) t2(y)),
      body AS (SELECT d.doc_id,
                      SUM(CASE WHEN gr.x = 0 AND gr.y = 0 THEN 0
                               ELSE (gr.x + gr.y * 31) % 256 END) AS bsum
               FROM documents d JOIN grid gr
                 ON gr.x < 1 + d.doc_id % 32 AND gr.y < 1 + (d.doc_id * 5) % 24
               GROUP BY d.doc_id)
      SELECT f.doc_id AS doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_frames,
             CAST(SUM(f.w * f.h) AS BIGINT) AS n_frame_bytes,
             CAST(SUM(b.bsum + f.p00) AS BIGINT) AS sum_px
      FROM f JOIN body b ON f.doc_id = b.doc_id
      GROUP BY f.doc_id
      ORDER BY f.doc_id
      """.stripMargin.trim)
  ) { (s, dir) =>
    frameSample(mediaGifFromDocuments(s, dir))
      .toDF()
      .groupBy(col("media_id").as("doc_id"))
      .agg(count(lit(1)).as("n_frames"),
        sum(octet_length(col("frame"))).cast("long").as("n_frame_bytes"),
        sum(col("px_sum")).as("sum_px"))
      .orderBy("doc_id")
  }

  /** Audio decode metadata with a REAL codec: payloads are genuine WAV
    * containers (javax.sound-encoded), the kernel is a genuine WAV parse
    * + PCM scan ([[decodeAudio]]). The oracle predicts the header fields
    * AND the data-chunk peak (max over the deterministic PCM function),
    * so a decoder that skipped the container or the data chunk cannot
    * hash-match. */
  val qMediaAudio: Q = Q(
    "q_media_audio",
    Some("""
      WITH g AS (SELECT i FROM generate_series(0, 254) AS t(i)),
      p AS (SELECT d.doc_id,
                   CAST(MAX((d.doc_id * 31 + g.i * 7) % 251) AS INT) AS peak
            FROM documents d JOIN g ON g.i < 64 + d.doc_id % 192
            GROUP BY d.doc_id)
      SELECT d.doc_id,
             CAST(CASE WHEN d.doc_id % 2 = 0 THEN 8000 ELSE 16000 END AS INT)
               AS sample_rate,
             CAST(64 + d.doc_id % 192 AS BIGINT) AS n_samples,
             p.peak
      FROM documents d JOIN p USING (doc_id)
      ORDER BY d.doc_id
      """.stripMargin.trim)
  ) { (s, dir) =>
    implicit val enc = org.apache.spark.sql.Encoders.product[AudioMeta]
    val meta = mediaWavFromDocuments(s, dir).mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.map { m =>
          val (rate, frames, peak) = decodeAudio(m.content)
          AudioMeta(m.media_id, rate, frames, peak)
        }
      }
    }
    meta.toDF()
      .select(col("media_id").as("doc_id"),
        col("sample_rate"), col("n_samples"), col("peak"))
      .orderBy("doc_id")
  }

  final case class VideoFrameMeta(
      media_id: Long, frame_idx: Int, width: Int, height: Int, p00: Int,
      n_frames: Int)

  /** Video decode + frame sampling with a REAL container: payloads are
    * genuine multi-frame animated GIFs, the kernel LZW-decodes every
    * frame ([[decodeVideo]]), and every 2nd decoded frame is sampled and
    * aggregated. The oracle predicts frame count, geometry, and the
    * sampled frames' corner pixels because synthesis is a pure function
    * of doc_id — a decoder that skipped the container, miscounted
    * frames, or dropped rasters cannot hash-match. */
  val qMediaVideo: Q = Q(
    "q_media_video",
    Some(s"""
      WITH g AS (SELECT i FROM generate_series(0, 8) AS t(i)),
      f AS (SELECT d.doc_id, g.i, (d.doc_id * 7 + g.i * 13) % 256 AS p
            FROM documents d
            JOIN g ON g.i < 2 + d.doc_id % 7 AND g.i % $FrameSampleEvery = 0)
      SELECT doc_id,
             CAST(2 + doc_id % 7 AS INT) AS n_frames,
             CAST(COUNT(*) AS BIGINT) AS n_sampled,
             CAST(COUNT(*) * (1 + doc_id % 32) * (1 + (doc_id * 5) % 24) AS BIGINT)
               AS n_pixels,
             CAST(SUM(p) AS BIGINT) AS sum_p00,
             CAST(MAX(p) AS INT) AS max_p00
      FROM f GROUP BY doc_id
      ORDER BY doc_id
      """.stripMargin.trim)
  ) { (s, dir) =>
    implicit val enc = org.apache.spark.sql.Encoders.product[VideoFrameMeta]
    val frames = mediaGifFromDocuments(s, dir).mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.flatMap { m =>
          // sampling INSIDE the decoder: skipped frames are block-skipped,
          // never LZW-decoded; the total count comes from the block walk
          val (n, sampled) = decodeVideoSampled(m.content, FrameSampleEvery)
          sampled.map { case (idx, w, h, p00) =>
            VideoFrameMeta(m.media_id, idx, w, h, p00, n)
          }
        }
      }
    }
    frames.toDF()
      .groupBy(col("media_id").as("doc_id"))
      .agg(
        max(col("n_frames")).as("n_frames"),
        count(lit(1)).as("n_sampled"),
        (count(lit(1)) * max(col("width")).cast("long") *
          max(col("height")).cast("long")).as("n_pixels"),
        sum(col("p00")).as("sum_p00"),
        max(col("p00")).as("max_p00"))
      .orderBy("doc_id")
  }

  final case class MediaEmbedded(media_id: Long, e: Array[Long])

  /** Feature EXTRACTION with a REAL kernel: each genuine PNG is decoded
    * and embedded by the fixed random projection ([[mediaEmbedInt]] —
    * e_d = Σ_i w(d,i)·px_i over the decoded raster). The oracle replays
    * the identical integer arithmetic over the known synthesis pattern,
    * so an extractor that hashed container bytes instead of decoding, or
    * used different planes, cannot hash-match any coordinate. Output:
    * the first 4 embedding coordinates + the L1 norm over all
    * [[FeatureDim]] dims (pinning every dimension). */
  val qMediaEmbed: Q = Q(
    "q_media_embed",
    Some {
      val dims = (0 until FeatureDim).map(d =>
        s"CAST(SUM((((i+1) * 2654435761 + ${d + 1} * 40503) % 1009 - 504) * v) AS BIGINT) AS e$d")
        .mkString(",\n             ")
      val l1 = (0 until FeatureDim).map(d => s"abs(e$d)").mkString(" + ")
      s"""
      WITH src AS (SELECT doc_id, text, octet_length(encode(text)) AS len,
                          1 + doc_id % 64 AS w, 1 + (doc_id * 7) % 48 AS h
                   FROM documents),
      g AS (SELECT i FROM generate_series(0, 3071) t(i)),
      px AS (SELECT s.doc_id, g.i,
                    CASE WHEN g.i = 0 THEN CAST(s.doc_id % 256 AS BIGINT)
                         ELSE CAST(ord(substr(s.text, CAST(g.i % s.len AS INT) + 1, 1)) AS BIGINT)
                    END AS v
             FROM src s JOIN g ON g.i < s.w * s.h),
      e AS (SELECT doc_id,
             $dims
            FROM px GROUP BY doc_id)
      SELECT doc_id, e0, e1, e2, e3, CAST($l1 AS BIGINT) AS l1
      FROM e ORDER BY doc_id
      """.stripMargin.trim
    }
  ) { (s, dir) =>
    implicit val enc = org.apache.spark.sql.Encoders.product[MediaEmbedded]
    val emb = mediaPngFromDocuments(s, dir).mapPartitions { it =>
      it.grouped(BatchSize).flatMap(_.map(m =>
        MediaEmbedded(m.media_id, mediaEmbedInt(m.content))))
    }
    emb.toDF()
      .select(col("media_id").as("doc_id"),
        element_at(col("e"), 1).as("e0"), element_at(col("e"), 2).as("e1"),
        element_at(col("e"), 3).as("e2"), element_at(col("e"), 4).as("e3"),
        aggregate(col("e"), lit(0L), (acc, z) => acc + abs(z)).as("l1"))
      .orderBy("doc_id")
  }

  final case class MediaResized(media_id: Long, sum_px: Long, p00: Int, pbr: Int)

  val ResizeW = 8
  val ResizeH = 6

  /** Image RESIZE with a REAL kernel: each genuine PNG is decoded and
    * nearest-neighbor resampled to 8x6 ([[resizeNearest]]). The oracle
    * replays the identical integer sampling arithmetic over the known
    * synthesis pattern (source pixel i is the corner for i = 0, else
    * text byte i mod len) — so a resize that skipped the real decode,
    * used a different filter, or mis-rounded the sample coordinates
    * cannot hash-match the per-image pixel sums. */
  val qMediaResize: Q = Q(
    "q_media_resize",
    Some(s"""
      WITH grid AS (SELECT x, y FROM generate_series(0, ${ResizeW - 1}) t1(x),
                                     generate_series(0, ${ResizeH - 1}) t2(y)),
      src AS (SELECT doc_id, text, octet_length(encode(text)) AS len,
                     1 + doc_id % 64 AS sw, 1 + (doc_id * 7) % 48 AS sh
              FROM documents),
      px AS (SELECT s.doc_id, g.x, g.y,
                    ((g.y * s.sh) // $ResizeH) * s.sw + ((g.x * s.sw) // $ResizeW) AS i,
                    s.text, s.len
             FROM src s, grid g),
      v AS (SELECT doc_id, x, y,
                   CASE WHEN i = 0 THEN CAST(doc_id % 256 AS INT)
                        ELSE ord(substr(text, CAST(i % len AS INT) + 1, 1)) END AS val
            FROM px)
      SELECT doc_id,
             CAST(SUM(val) AS BIGINT) AS sum_px,
             CAST(MAX(CASE WHEN x = 0 AND y = 0 THEN val END) AS INT) AS p00,
             CAST(MAX(CASE WHEN x = ${ResizeW - 1} AND y = ${ResizeH - 1} THEN val END)
               AS INT) AS pbr
      FROM v GROUP BY doc_id
      ORDER BY doc_id
      """.stripMargin.trim)
  ) { (s, dir) =>
    implicit val enc = org.apache.spark.sql.Encoders.product[MediaResized]
    val resized = mediaPngFromDocuments(s, dir).mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.map { m =>
          val px = resizeNearest(m.content, ResizeW, ResizeH)
          MediaResized(m.media_id, px.map(_.toLong).sum,
            px(0), px(ResizeH * ResizeW - 1))
        }
      }
    }
    resized.toDF()
      .select(col("media_id").as("doc_id"), col("sum_px"), col("p00"), col("pbr"))
      .orderBy("doc_id")
  }

  /** Corrupt-payload QUARANTINE: every 17th payload is truncated to its
    * 8-byte PNG signature (a realistic partial-upload corruption — the
    * magic bytes parse, the decode fails), and the pipeline must route
    * it to the quarantine side output while decoding the rest for real.
    * The oracle predicts both populations and the ok-side decoded pixel
    * mass; a pipeline that zeroed failures, dropped them silently, or
    * faked the decode cannot hash-match. */
  val qMediaQuarantine: Q = Q(
    "q_media_quarantine",
    Some("""
      SELECT status,
             CAST(COUNT(*) AS BIGINT) AS n_media,
             CAST(SUM(px) AS BIGINT) AS total_pixels
      FROM (
        SELECT CASE WHEN doc_id % 17 = 0 THEN 'quarantined' ELSE 'ok' END AS status,
               CASE WHEN doc_id % 17 = 0 THEN 0
                    ELSE (1 + doc_id % 64) * (1 + (doc_id * 7) % 48) END AS px
        FROM documents)
      GROUP BY status
      ORDER BY status
      """.stripMargin.trim)
  ) { (s, dir) =>
    implicit val enc = org.apache.spark.sql.Encoders.product[MediaRow]
    val corrupted = mediaPngFromDocuments(s, dir).mapPartitions { it =>
      it.map(m =>
        if (m.media_id % 17 == 0)
          MediaRow(m.media_id, m.kind, java.util.Arrays.copyOf(m.content, 8))
        else m)
    }
    decodeMetaSafe(corrupted).toDF()
      .groupBy("status")
      .agg(count(lit(1)).as("n_media"),
        sum(col("width").cast("long") * col("height").cast("long")).as("total_pixels"))
      .orderBy("status")
  }

  override def all: Seq[Q] =
    Seq(qMediaMeta, qMediaFrames, qMediaAudio, qMediaVideo, qMediaResize,
      qMediaEmbed, qMediaQuarantine, qMediaPixelStats, qAudioEnergy)
}
