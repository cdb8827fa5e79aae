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
  * All three paths are REAL codecs from the JRE — PNG/JPEG through
  * `javax.imageio` (header sniff for dimensions, full decode for pixel
  * features), WAV/PCM through `javax.sound.sampled` (format header for
  * rate/duration, frame decode for waveform features), and video as
  * MJPEG-in-AVI: a RIFF container demux (`decodeAvi` — dims and
  * duration from the `avih` main header, frame payloads from the
  * `movi` list) whose frames are plain JPEGs the JRE codec decodes.
  * Codecs the JRE lacks (H.264 etc.) are out of scope by contract:
  * the supported video surface is the MJPEG/AVI profile.
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

  /** MJPEG-in-AVI video support: the AVI container is a published RIFF
    * layout and its MJPEG profile's frames are plain JPEGs, so the JRE
    * decodes the whole format with no external codec. `decodeAvi`
    * demuxes the container; frame pixels go through the same
    * `javax.imageio` path as still images.
    */
  object Avi {
    private def fourcc(bytes: Array[Byte], off: Int, id: String): Boolean =
      off + 4 <= bytes.length &&
        (0 until 4).forall(k => bytes(off + k) == id.charAt(k).toByte)

    private def u32(bytes: Array[Byte], off: Int): Long =
      java.nio.ByteBuffer.wrap(bytes, off, 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt & 0xffffffffL

    /** Demux an AVI payload: (width, height, durationMs, frame
      * payloads). Dims and duration come from the `avih` main header
      * (total frames × µs/frame); frames are the `..dc`/`..db` chunks
      * of the `movi` list, each a complete JPEG for the MJPEG profile.
      * None for non-AVI bytes. Chunk walk only — no pixel decode here.
      */
    def decodeAvi(bytes: Array[Byte]): Option[(Int, Int, Long, Vector[Array[Byte]])] = {
      if (!fourcc(bytes, 0, "RIFF") || !fourcc(bytes, 8, "AVI ")) return None
      var w = 0; var h = 0; var usPerFrame = 0L; var totalFrames = 0L
      val frames = Vector.newBuilder[Array[Byte]]
      def walk(from: Int, to: Int): Unit = {
        var i = from
        while (i + 8 <= to) {
          val size = u32(bytes, i + 4).toInt
          val dataStart = i + 8
          val dataEnd = math.min(dataStart + size, to)
          if (fourcc(bytes, i, "LIST")) {
            walk(dataStart + 4, dataEnd) // skip the list-type fourcc
          } else if (fourcc(bytes, i, "avih") && size >= 40) {
            usPerFrame = u32(bytes, dataStart)
            totalFrames = u32(bytes, dataStart + 16)
            w = u32(bytes, dataStart + 32).toInt
            h = u32(bytes, dataStart + 36).toInt
          } else if (dataEnd <= bytes.length && bytes(i + 2) == 'd' &&
              (bytes(i + 3) == 'c' || bytes(i + 3) == 'b')) {
            frames += java.util.Arrays.copyOfRange(bytes, dataStart, dataEnd)
          }
          i = dataStart + size + (size & 1) // chunks pad to even
        }
      }
      walk(12, bytes.length)
      if (w <= 0 || h <= 0) None
      else Some((w, h, totalFrames * usPerFrame / 1000L, frames.result()))
    }

    /** L1-normalized luminance histogram pooled over EVERY decoded
      * frame's pixels — same feature space as `Codec.imageFeatures`,
      * so a one-frame video and its still image featurize identically.
      */
    def videoFeatures(frames: Seq[Array[Byte]], dims: Int): Array[Float] = {
      val counts = new Array[Float](dims)
      frames.foreach { fb =>
        Codec.decodeImage(fb).foreach { img =>
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
        }
      }
      val total = counts.sum.max(1f)
      counts.map(_ / total)
    }

    /** Write a spec-correct single-stream MJPEG AVI: RIFF(AVI ) →
      * LIST(hdrl){avih, LIST(strl){strh vids/MJPG, strf BITMAPINFO}} →
      * LIST(movi){00dc JPEG…}. Every field a demuxer needs is real.
      */
    def aviBytes(frames: Seq[Array[Byte]], w: Int, h: Int, usPerFrame: Long): Array[Byte] = {
      def chunk(id: String, data: Array[Byte]): Array[Byte] = {
        val pad = data.length & 1
        val bb = java.nio.ByteBuffer.allocate(8 + data.length + pad)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put(id.getBytes("ISO-8859-1")); bb.putInt(data.length); bb.put(data)
        bb.array()
      }
      def list(kind: String, body: Array[Byte]): Array[Byte] =
        chunk("LIST", kind.getBytes("ISO-8859-1") ++ body)
      val avih = {
        val bb = java.nio.ByteBuffer.allocate(56)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.putInt(usPerFrame.toInt)      // dwMicroSecPerFrame
        bb.putInt(0); bb.putInt(0); bb.putInt(0)
        bb.putInt(frames.length)         // dwTotalFrames
        bb.putInt(0)
        bb.putInt(1)                     // dwStreams
        bb.putInt(0)
        bb.putInt(w); bb.putInt(h)
        bb.array()                       // 4 reserved dwords stay 0
      }
      val strh = {
        val bb = java.nio.ByteBuffer.allocate(56)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("vids".getBytes("ISO-8859-1")); bb.put("MJPG".getBytes("ISO-8859-1"))
        bb.putInt(0); bb.putShort(0); bb.putShort(0); bb.putInt(0)
        bb.putInt(1)                     // dwScale
        bb.putInt((1000000L / usPerFrame).toInt.max(1)) // dwRate (fps)
        bb.putInt(0)
        bb.putInt(frames.length)         // dwLength
        bb.putInt(0); bb.putInt(0); bb.putInt(0)
        bb.putShort(0); bb.putShort(0)
        bb.putShort(w.toShort); bb.putShort(h.toShort) // rcFrame
        bb.array()
      }
      val strf = {
        val bb = java.nio.ByteBuffer.allocate(40)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.putInt(40); bb.putInt(w); bb.putInt(h)
        bb.putShort(1); bb.putShort(24)
        bb.put("MJPG".getBytes("ISO-8859-1"))
        bb.putInt(w * h * 3)
        bb.putInt(0); bb.putInt(0); bb.putInt(0); bb.putInt(0)
        bb.array()
      }
      val hdrl = list("hdrl",
        chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
      val movi = list("movi", frames.toArray.flatMap(f => chunk("00dc", f)))
      chunk("RIFF", "AVI ".getBytes("ISO-8859-1") ++ hdrl ++ movi)
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
              Avi.decodeAvi(bytes) match {
                case Some((vw, vh, ms, frames)) =>
                  (vw, vh, 0, ms, Avi.videoFeatures(frames, dims))
                case None => (0, 0, 0, 0L, new Array[Float](dims))
              }
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

  /** Declarative resize PLAN: computes target dimensions from metadata
    * only, so the planner can cost/filter on them (e.g. "skip already
    * small media") before any byte is touched. `resizeImages` is the
    * payload-transforming counterpart.
    */
  def resizeMeta(media: DataFrame, maxSide: Int): DataFrame = {
    val w = col("meta.width"); val h = col("meta.height")
    val scale = least(lit(1.0), lit(maxSide) / greatest(w, h).cast("double"))
    media.withColumn("resized_width", floor(w * scale).cast("int"))
      .withColumn("resized_height", floor(h * scale).cast("int"))
  }

  /** Real payload resize for image rows: decode, area-scale the longest
    * side to <= maxSide (never upscale), re-encode PNG. Same narrow
    * batched mapPartitions shape as extractFeatures; non-image rows and
    * undecodable payloads pass through byte-identical, and the typed
    * metadata struct is rewritten to the decoded output dimensions so
    * meta never lies about the payload it rides with.
    */
  def resizeImages(media: DataFrame, maxSide: Int, batchSize: Int = 64): DataFrame = {
    val enc = RowEncoder.encoderFor(mediaSchema)
    media.select("media_id", "kind", "bytes", "meta").mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val kind = r.getAs[String]("kind")
          val bytes = r.getAs[Array[Byte]]("bytes")
          val decoded = if (kind == "image") Codec.decodeImage(bytes) else None
          decoded match {
            case Some(img) if math.max(img.getWidth, img.getHeight) > maxSide =>
              val scale = maxSide.toDouble / math.max(img.getWidth, img.getHeight)
              val nw = math.max(1, math.floor(img.getWidth * scale).toInt)
              val nh = math.max(1, math.floor(img.getHeight * scale).toInt)
              val dst = new java.awt.image.BufferedImage(nw, nh,
                java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = dst.createGraphics()
              g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, nw, nh, null)
              g.dispose()
              val out = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(dst, "png", out)
              val meta = r.getAs[Row]("meta")
              Row(r.getAs[Long]("media_id"), kind, out.toByteArray,
                Row(nw, nh, meta.getAs[Int]("sample_rate"),
                  meta.getAs[Long]("duration_ms")))
            case _ =>
              Row(r.getAs[Long]("media_id"), kind, bytes, r.getAs[Row]("meta"))
          }
        }
      }
    }(enc)
  }

  /** Deterministic synthetic media table for tests/demos. Image rows
    * are REAL PNGs (deterministic pixel pattern from media_id), audio
    * rows are REAL 16-bit PCM WAVs (LCG waveform), and video rows are
    * REAL MJPEG AVIs (JPEG frames of the same pixel pattern), so every
    * codec path exercised in tests is the production one.
    */
  def syntheticMedia(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val rnd = new scala.util.Random(i)
      val w = 16 + rnd.nextInt(64); val h = 16 + rnd.nextInt(64)
      val kind = Seq("image", "audio", "video")(i % 3)
      // video: 2 fps over the metadata duration, so container-decoded
      // duration (frames x 500000us) equals meta.duration_ms exactly
      val videoDurMs = 1000L * (1 + i % 5)
      val bytes = kind match {
        case "image" => pngBytes(i, w, h)
        case "audio" => wavBytes(i, sampleRate = 16000, durMs = 40L * (1 + i % 5))
        case _ =>
          val frames = (0 until (videoDurMs / 500L).toInt)
            .map(f => jpegFrameBytes(i, f, w, h))
          Avi.aviBytes(frames, w, h, usPerFrame = 500000L)
      }
      val (durMs, rate) =
        if (kind == "audio") (40L * (1 + i % 5), 16000)
        else (videoDurMs, 0)
      Row(i.toLong, kind, bytes, Row(w, h, rate, durMs))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows), mediaSchema)
  }

  /** Deterministic JPEG frame: the PNG gradient pattern shifted per
    * frame index, encoded through the JRE's JPEG writer.
    */
  def jpegFrameBytes(id: Int, frame: Int, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val g = (x * 31 + y * 17 + id * 7 + frame * 13) & 0xff
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    out.toByteArray
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
