package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column support for the training-data
  * pipeline: media ride along as opaque `binary` columns with a typed
  * metadata struct, and decode/feature-extraction runs per-partition in
  * bounded batches.
  *
  * The image and audio paths are REAL codecs from the JRE — PNG/JPEG
  * through `javax.imageio` (header sniff for dimensions, full decode
  * for pixel features) and WAV/PCM through `javax.sound.sampled`
  * (format header for rate/duration, frame decode for waveform
  * features). Only video remains a stub (`VideoStub`): the JRE ships
  * no video codec, so video rows use the fake-header scheme, clearly
  * marked, with the same plumbing a real demuxer would slot into.
  *
  * Scale notes: media bytes dominate row size, so operators here never
  * shuffle the binary column — decode/features are narrow map stages, and
  * projections drop `bytes` as soon as features are extracted. Batched
  * iteration (`grouped(batchSize)`) bounds peak memory per task the way
  * arrow-batch UDFs do, without materializing a partition.
  */
object Multimodal {

  /** Media table schema: id + kind + opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("kind", StringType), // image | audio | video
    StructField("bytes", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("duration_ms", LongType))))))

  /** Real JRE codecs. Every derived value is a pure function of the
    * payload bytes, so extraction stays deterministic and replayable.
    */
  object Codec {
    private val PngSig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

    /** PNG dimensions from the IHDR chunk (bytes 16..23) — header-only,
      * no pixel decode; the cheap path for metadata backfill at scale.
      */
    def pngDims(bytes: Array[Byte]): Option[(Int, Int)] =
      if (bytes.length >= 24 && bytes.take(8).sameElements(PngSig)) {
        val b = java.nio.ByteBuffer.wrap(bytes, 16, 8)
        Some((b.getInt, b.getInt))
      } else None

    /** JPEG dimensions by walking the segment markers to the first
      * SOF0-SOF15 frame header — header-only, no pixel decode.
      */
    def jpegDims(bytes: Array[Byte]): Option[(Int, Int)] = {
      if (bytes.length < 4 || (bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8)
        return None
      var i = 2
      while (i + 9 < bytes.length) {
        if ((bytes(i) & 0xff) != 0xff) return None
        val marker = bytes(i + 1) & 0xff
        if (marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
          val h = ((bytes(i + 5) & 0xff) << 8) | (bytes(i + 6) & 0xff)
          val w = ((bytes(i + 7) & 0xff) << 8) | (bytes(i + 8) & 0xff)
          return Some((w, h))
        }
        val len = ((bytes(i + 2) & 0xff) << 8) | (bytes(i + 3) & 0xff)
        i += 2 + len
      }
      None
    }

    /** Header-sniffed dimensions (PNG, then JPEG), falling back to a
      * full `ImageIO` decode for other registered formats (GIF, BMP).
      */
    def imageDims(bytes: Array[Byte]): Option[(Int, Int)] =
      pngDims(bytes).orElse(jpegDims(bytes)).orElse(
        decodeImage(bytes).map(img => (img.getWidth, img.getHeight)))

    def decodeImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
      Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))

    /** L1-normalized luminance histogram over the DECODED pixels —
      * codec-independent (PNG and an equivalent BMP yield identical
      * features), unlike any byte-level hash of the payload.
      */
    def imageFeatures(img: java.awt.image.BufferedImage, dims: Int): Array[Float] = {
      val counts = new Array[Float](dims)
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val rgb = img.getRGB(x, y)
          val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000
          counts(lum * dims / 256) += 1f
          x += 1
        }
        y += 1
      }
      val total = counts.sum.max(1f)
      counts.map(_ / total)
    }

    /** WAV/PCM header + frames via `javax.sound.sampled`: returns
      * (sampleRate, durationMs, 16-bit samples) or None for non-audio.
      */
    def decodeAudio(bytes: Array[Byte]): Option[(Int, Long, Array[Short])] =
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val fmt = in.getFormat
        // the short-pairing below is only meaningful for 16-bit PCM;
        // an 8/24-bit WAV would decode into garbage features silently
        if (fmt.getSampleSizeInBits != 16) return None
        val frames = in.getFrameLength
        val rate = fmt.getSampleRate.toInt
        val raw = in.readAllBytes()
        val bb = java.nio.ByteBuffer.wrap(raw).order(
          if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
          else java.nio.ByteOrder.LITTLE_ENDIAN)
        val samples = new Array[Short](raw.length / 2)
        var i = 0
        while (i < samples.length) { samples(i) = bb.getShort(); i += 1 }
        Some((rate, frames * 1000L / rate, samples))
      } catch { case _: Exception => None }

    /** L1-normalized amplitude histogram over decoded samples. */
    def audioFeatures(samples: Array[Short], dims: Int): Array[Float] = {
      val counts = new Array[Float](dims)
      var i = 0
      while (i < samples.length) {
        counts(((samples(i) & 0xffff) * dims) >>> 16) += 1f
        i += 1
      }
      val total = counts.sum.max(1f)
      counts.map(_ / total)
    }
  }

  /** The one remaining stub: the JRE has no video codec, so video rows
    * carry a fake 8-byte header (big-endian width, height) + body, and
    * "decode" parses exactly that. A real demuxer replaces these two
    * functions; the mapPartitions plumbing is unchanged.
    */
  object VideoStub {
    def dims(bytes: Array[Byte]): (Int, Int) =
      if (bytes.length < 8) (0, 0)
      else (java.nio.ByteBuffer.wrap(bytes, 0, 4).getInt,
        java.nio.ByteBuffer.wrap(bytes, 4, 4).getInt)

    def features(bytes: Array[Byte], dims: Int): Array[Float] = {
      val counts = new Array[Float](dims)
      var i = 8
      while (i < bytes.length) {
        counts((bytes(i) & 0xff) % dims) += 1f
        i += 1
      }
      val total = counts.sum.max(1f)
      counts.map(_ / total)
    }
  }

  private val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("kind", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("duration_ms", LongType),
    StructField("n_bytes", LongType),
    StructField("features", ArrayType(FloatType))))

  /** Decode + feature-extract in bounded per-partition batches. Narrow
    * (no shuffle), drops the binary payload from the output, keeps the
    * input partitioning. Images report (width, height), audio reports
    * (sample_rate, duration_ms) — both DECODED from the payload, never
    * copied from metadata; absent dimensions are 0.
    *
    * @param batchSize rows decoded per in-flight batch — bounds task
    *                  memory exactly like an arrow-batch UDF's batch size.
    */
  def extractFeatures(media: DataFrame, dims: Int = 16, batchSize: Int = 64): DataFrame = {
    val enc = RowEncoder.encoderFor(featureSchema)
    media.select("media_id", "kind", "bytes").mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val bytes = r.getAs[Array[Byte]]("bytes")
          val kind = r.getAs[String]("kind")
          val (w, h, rate, durMs, feats) = kind match {
            case "image" =>
              // ONE full decode per row: dims come from the header
              // sniff when possible, else from the already-decoded
              // image — never a second ImageIO.read
              val img = Codec.decodeImage(bytes)
              val (iw, ih) = Codec.pngDims(bytes)
                .orElse(Codec.jpegDims(bytes))
                .orElse(img.map(i => (i.getWidth, i.getHeight)))
                .getOrElse((0, 0))
              val f = img.map(Codec.imageFeatures(_, dims))
                .getOrElse(new Array[Float](dims))
              (iw, ih, 0, 0L, f)
            case "audio" =>
              Codec.decodeAudio(bytes) match {
                case Some((sr, ms, samples)) =>
                  (0, 0, sr, ms, Codec.audioFeatures(samples, dims))
                case None => (0, 0, 0, 0L, new Array[Float](dims))
              }
            case _ =>
              val (vw, vh) = VideoStub.dims(bytes)
              (vw, vh, 0, 0L, VideoStub.features(bytes, dims))
          }
          Row(r.getAs[Long]("media_id"), kind, w, h, rate, durMs,
            bytes.length.toLong, feats.toSeq)
        }
      }
    }(enc)
  }

  /** Video frame sampling plumbing: one output row per sampled frame
    * index at `everyMs` spacing — the explode is computed from metadata
    * ONLY (no decode), so the planner can push it before any expensive
    * per-frame work.
    */
  def sampleFrames(media: DataFrame, everyMs: Long): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0L), greatest(col("meta.duration_ms") - 1, lit(0L)),
          lit(everyMs))).as("frame_ms"))

  /** Resize stub: recomputes metadata declaratively; payload untouched
    * (a real implementation transforms bytes in the same mapPartitions
    * shape as extractFeatures).
    */
  def resizeMeta(media: DataFrame, maxSide: Int): DataFrame = {
    val w = col("meta.width"); val h = col("meta.height")
    val scale = least(lit(1.0), lit(maxSide) / greatest(w, h).cast("double"))
    media.withColumn("resized_width", floor(w * scale).cast("int"))
      .withColumn("resized_height", floor(h * scale).cast("int"))
  }

  /** Deterministic synthetic media table for tests/demos. Image rows
    * are REAL PNGs (deterministic pixel pattern from media_id) and
    * audio rows are REAL 16-bit PCM WAVs (LCG waveform), so the codec
    * path exercised in tests is the production one; video rows use the
    * `VideoStub` fake-header scheme.
    */
  def syntheticMedia(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val rnd = new scala.util.Random(i)
      val w = 16 + rnd.nextInt(64); val h = 16 + rnd.nextInt(64)
      val kind = Seq("image", "audio", "video")(i % 3)
      val bytes = kind match {
        case "image" => pngBytes(i, w, h)
        case "audio" => wavBytes(i, sampleRate = 16000, durMs = 40L * (1 + i % 5))
        case _ =>
          val body = new Array[Byte](64); rnd.nextBytes(body)
          java.nio.ByteBuffer.allocate(8).putInt(w).putInt(h).array() ++ body
      }
      val (durMs, rate) =
        if (kind == "audio") (40L * (1 + i % 5), 16000)
        else (1000L * (1 + i % 5), 0)
      Row(i.toLong, kind, bytes, Row(w, h, rate, durMs))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows), mediaSchema)
  }

  /** Deterministic PNG payload: gray gradient pattern keyed by id. */
  def pngBytes(id: Int, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val g = (x * 31 + y * 17 + id * 7) & 0xff
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Deterministic 16-bit mono PCM WAV payload (RIFF header + LCG
    * waveform).
    */
  def wavBytes(id: Int, sampleRate: Int, durMs: Long): Array[Byte] = {
    val nSamples = (sampleRate * durMs / 1000L).toInt
    val data = java.nio.ByteBuffer.allocate(nSamples * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var s = id * 2654435761L + 1
    for (_ <- 0 until nSamples) {
      s = s * 6364136223846793005L + 1442695040888963407L
      data.putShort((s >>> 48).toShort)
    }
    val pcm = data.array()
    val bb = java.nio.ByteBuffer.allocate(44 + pcm.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + pcm.length); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16); bb.putShort(1); bb.putShort(1)
    bb.putInt(sampleRate); bb.putInt(sampleRate * 2); bb.putShort(2); bb.putShort(16)
    bb.put("data".getBytes); bb.putInt(pcm.length); bb.put(pcm)
    bb.array()
  }
}
