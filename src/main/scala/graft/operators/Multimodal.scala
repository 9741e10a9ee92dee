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
  * (header + PCM data-chunk scan). The VIDEO path is now real as well:
  * multi-frame animated GIFs ([[Multimodal.encodeGif]] — the one
  * multi-frame container the JDK can both write and read) decoded
  * frame-by-frame through ImageIO's LZW decoder
  * ([[Multimodal.decodeVideo]]), with frame SAMPLING applied to decoded
  * frames (q_media_video). RESIZE is real: [[Multimodal.resizeNearest]]
  * decodes and nearest-neighbor resamples the raster (q_media_resize).
  * Remaining stubs: [[Multimodal.featuresStub]] (an embedding-model
  * forward pass — no model in the JDK) and the byte-chunk walk in
  * q_media_frames (kept as the container-agnostic sampling shape).
  * Everything around them (schemas, Encoders, batch shape, partitioning,
  * explode cardinality, downstream aggregation) is real and
  * oracle-/property-tested.
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
  final case class MediaFrame(media_id: Long, frame_idx: Int, frame: Array[Byte])
  final case class AudioMeta(
      media_id: Long, sample_rate: Int, n_samples: Long, peak: Int)
  final case class MediaFeatures(media_id: Long, features: Array[Float])

  /** mapInPandas-style batch size: a real decoder initializes its codec
    * once per batch, not once per row. */
  val BatchSize = 64
  val FrameBytes = 256
  val SampleEvery = 4
  val FeatureDim = 16

  /** The `documents` table as a media table: UTF-8 payload bytes standing
    * in for encoded images (the driver testdata ships no binary modality;
    * deriving bytes deterministically keeps the DuckDB oracle viable). */
  def mediaFromDocuments(s: SparkSession, dir: String): Dataset[MediaRow] = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id").as("media_id"), lit("image").as("kind"),
        encode(col("text"), "UTF-8").as("content"))
      .as[MediaRow]
  }

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
    Tables.documents(s, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("bytes"))
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
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** REAL audio decode via javax.sound.sampled: parses the WAV header
    * (sample rate, frame count) and streams the PCM data chunk for the
    * peak amplitude — a fake parse can reproduce none of the three.
    * Throws on undecodable payloads (same quarantine-loudly stance as
    * [[decodeImage]]). */
  def decodeAudio(content: Array[Byte]): (Int, Long, Int) = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
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
    Tables.documents(s, dir).select(col("doc_id")).as[Long]
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

  /** Encode a real multi-frame animated GIF (pure JDK: ImageIO's GIF
    * sequence writer). Each frame is a grayscale raster whose (0,0)
    * pixel carries the frame's value and whose body cycles a fixed
    * pattern; the JDK round-trips 8-bit gray exactly through the GIF
    * palette, so decoded pixels are bit-comparable. */
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
          width, height, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
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
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
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

  /** The `documents` table as genuine animated-GIF video: frame count,
    * geometry, and per-frame pixels are pure functions of doc_id (so the
    * DuckDB oracle can predict them) but reach the reader only through a
    * real multi-frame GIF container. */
  def mediaGifFromDocuments(s: SparkSession, dir: String): Dataset[MediaRow] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[MediaRow]
    import s.implicits._
    Tables.documents(s, dir).select(col("doc_id")).as[Long]
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

  /** STUB image decode — deterministic fake of "parse header, return
    * dimensions": width from payload size, height from the first byte.
    * Kept ONLY for the frame-sampling path over non-image payloads
    * (q_media_frames walks raw bytes); the metadata path uses the real
    * [[decodeImage]] kernel. */
  def decodeDimsStub(content: Array[Byte]): (Int, Int) = {
    val w = 1 + (content.length % 640)
    val h = 1 + ((if (content.nonEmpty) content(0) & 0xff else 0) % 480)
    (w, h)
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

  /** STUB feature extraction — deterministic per-dimension rolling hash in
    * [0,1), standing in for an embedding model forward pass. Dimension and
    * determinism are the tested contract. */
  def featuresStub(content: Array[Byte]): Array[Float] =
    Array.tabulate(FeatureDim) { d =>
      var h = 1125899906842597L + d * 0x9E3779B97F4A7C15L
      var i = 0
      while (i < content.length) {
        h = h * 1000003L + (content(i) & 0xff) + d
        i += 1
      }
      (java.lang.Math.floorMod(h, 100000L)) / 100000.0f
    }

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

  /** Sample every [[SampleEvery]]-th fixed-size frame from a payload —
    * the video frame-sampling shape: one row in, 0..n frame rows out
    * (flatMap; no shuffle). */
  def frameSample(media: Dataset[MediaRow]): Dataset[MediaFrame] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[MediaFrame]
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.flatMap { m =>
          val nChunks = (m.content.length + FrameBytes - 1) / FrameBytes
          Iterator.range(0, nChunks, SampleEvery).map { ci =>
            val from = ci * FrameBytes
            val until = math.min(from + FrameBytes, m.content.length)
            MediaFrame(m.media_id, ci, java.util.Arrays.copyOfRange(m.content, from, until))
          }
        }
      }
    }
  }

  /** Per-media feature vectors (embedding-model stand-in). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[MediaFeatures]
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap(_.map(m =>
        MediaFeatures(m.media_id, featuresStub(m.content))))
    }
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

  /** Frame sampling, oracle-checked via the explode cardinality and byte
    * accounting (DuckDB generate_series reproduces the chunk walk). */
  val qMediaFrames: Q = Q(
    "q_media_frames",
    Some(s"""
      WITH m AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents),
      g AS (SELECT i FROM generate_series(0, 1048576, $SampleEvery) AS t(i)),
      f AS (
        SELECT m.doc_id, g.i,
               LEAST($FrameBytes, m.n - g.i * $FrameBytes) AS frame_bytes
        FROM m JOIN g ON g.i * $FrameBytes < m.n)
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_frames,
             CAST(sum(frame_bytes) AS BIGINT) AS n_frame_bytes
      FROM f GROUP BY doc_id
      ORDER BY doc_id
      """.stripMargin.trim)
  ) { (s, dir) =>
    frameSample(mediaFromDocuments(s, dir))
      .toDF()
      .groupBy(col("media_id").as("doc_id"))
      .agg(count(lit(1)).as("n_frames"),
        sum(octet_length(col("frame"))).cast("long").as("n_frame_bytes"))
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
          val decoded = decodeVideo(m.content)
          decoded.map { case (idx, w, h, p00) =>
            VideoFrameMeta(m.media_id, idx, w, h, p00, decoded.length)
          }
        }
      }
    }
    frames.toDF()
      .where(col("frame_idx") % FrameSampleEvery === 0)
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

  override def all: Seq[Q] =
    Seq(qMediaMeta, qMediaFrames, qMediaAudio, qMediaVideo, qMediaResize)
}
