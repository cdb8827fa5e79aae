package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.syntheticMedia(spark, 30)

  test("schema carries binary payload + typed metadata") {
    media.schema shouldBe Multimodal.mediaSchema
    media.count() shouldBe 30
  }

  test("extractFeatures: schema, determinism, batch shape, no payload in output") {
    val out = Multimodal.extractFeatures(media, dims = 16, batchSize = 7)
    out.columns should not contain "bytes"
    val rows = out.orderBy("media_id").collect()
    rows should have length 30
    // feature vectors are fixed-width and L1-normalized
    rows.foreach { r =>
      val f = r.getSeq[Float](r.fieldIndex("features"))
      f should have length 16
      f.sum shouldBe 1.0f +- 1e-4f
    }
    // deterministic across runs and batch sizes
    val again = Multimodal.extractFeatures(media, dims = 16, batchSize = 3)
      .orderBy("media_id").collect()
    def feats(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(r => r.getSeq[Float](r.fieldIndex("features")))
    feats(rows) shouldBe feats(again)
  }

  test("image dims are DECODED from real PNG payloads, matching generation") {
    // content check, not metadata echo: extractFeatures never reads
    // `meta`, so equality proves the javax.imageio path decoded the
    // actual PNG bytes the generator wrote
    val out = Multimodal.extractFeatures(media).filter(col("kind") === "image")
      .orderBy("media_id").collect()
    val metas = media.filter(col("kind") === "image").orderBy("media_id")
      .select("meta.width", "meta.height").collect()
    out should not be empty
    out.zip(metas).foreach { case (o, m) =>
      o.getInt(o.fieldIndex("width")) shouldBe m.getInt(0)
      o.getInt(o.fieldIndex("height")) shouldBe m.getInt(1)
    }
  }

  test("image payloads are genuine PNGs and header-sniff agrees with full decode") {
    val row = media.filter(col("kind") === "image").orderBy("media_id").head()
    val bytes = row.getAs[Array[Byte]]("bytes")
    bytes.take(4) shouldBe Array[Byte](0x89.toByte, 'P', 'N', 'G')
    val sniffed = Multimodal.Codec.pngDims(bytes)
    val decoded = Multimodal.Codec.decodeImage(bytes)
      .map(i => (i.getWidth, i.getHeight))
    sniffed shouldBe decoded
    sniffed shouldBe defined
  }

  test("jpegDims walks segment markers on a real JPEG encode") {
    val img = new java.awt.image.BufferedImage(23, 17,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    Multimodal.Codec.jpegDims(out.toByteArray) shouldBe Some((23, 17))
  }

  test("audio rate and duration are DECODED from real WAV payloads") {
    val out = Multimodal.extractFeatures(media).filter(col("kind") === "audio")
      .orderBy("media_id").collect()
    val metas = media.filter(col("kind") === "audio").orderBy("media_id")
      .select("meta.sample_rate", "meta.duration_ms").collect()
    out should not be empty
    out.zip(metas).foreach { case (o, m) =>
      o.getInt(o.fieldIndex("sample_rate")) shouldBe m.getInt(0)
      o.getLong(o.fieldIndex("duration_ms")) shouldBe m.getLong(1)
    }
  }

  test("video dims and duration are DEMUXED from real MJPEG AVI payloads") {
    // content check like the image/audio ones: extractFeatures never
    // reads `meta`, so equality proves the RIFF walk parsed the actual
    // avih header the writer emitted
    val out = Multimodal.extractFeatures(media).filter(col("kind") === "video")
      .orderBy("media_id").collect()
    val metas = media.filter(col("kind") === "video").orderBy("media_id")
      .select("meta.width", "meta.height", "meta.duration_ms").collect()
    out should not be empty
    out.zip(metas).foreach { case (o, m) =>
      o.getInt(o.fieldIndex("width")) shouldBe m.getInt(0)
      o.getInt(o.fieldIndex("height")) shouldBe m.getInt(1)
      o.getLong(o.fieldIndex("duration_ms")) shouldBe m.getLong(2)
    }
  }

  test("video payloads are genuine RIFF/AVI and every frame is a JRE-decodable JPEG") {
    val row = media.filter(col("kind") === "video").orderBy("media_id").head()
    val bytes = row.getAs[Array[Byte]]("bytes")
    new String(bytes.take(4), "ISO-8859-1") shouldBe "RIFF"
    new String(bytes.slice(8, 12), "ISO-8859-1") shouldBe "AVI "
    val Some((w, h, durMs, frames)) = Multimodal.Avi.decodeAvi(bytes)
    val meta = row.getAs[org.apache.spark.sql.Row]("meta")
    (w, h) shouldBe ((meta.getInt(0), meta.getInt(1)))
    // 2 fps writer: frames x 500ms == metadata duration
    frames.length.toLong * 500L shouldBe durMs
    frames should not be empty
    frames.foreach { f =>
      val img = Multimodal.Codec.decodeImage(f)
      img shouldBe defined
      (img.get.getWidth, img.get.getHeight) shouldBe ((w, h))
    }
    // non-AVI bytes are rejected, not misparsed
    Multimodal.Avi.decodeAvi("not a riff file at all".getBytes) shouldBe None
  }

  test("resizeImages transforms the actual payload and rewrites meta to match") {
    val out = Multimodal.resizeImages(media, maxSide = 32).collect()
    out should have length 30
    out.foreach { r =>
      val kind = r.getAs[String]("kind")
      val bytes = r.getAs[Array[Byte]]("bytes")
      val meta = r.getAs[org.apache.spark.sql.Row]("meta")
      if (kind == "image") {
        val img = Multimodal.Codec.decodeImage(bytes).get
        img.getWidth should be <= 32
        img.getHeight should be <= 32
        // meta tracks the decoded payload, not the original
        meta.getInt(0) shouldBe img.getWidth
        meta.getInt(1) shouldBe img.getHeight
      }
    }
    // non-image payloads pass through byte-identical
    val origVideo = media.filter(col("kind") === "video").orderBy("media_id")
      .head().getAs[Array[Byte]]("bytes")
    val outVideo = out.filter(_.getAs[String]("kind") == "video")
      .minBy(_.getAs[Long]("media_id")).getAs[Array[Byte]]("bytes")
    outVideo shouldBe origVideo
  }

  test("extractFeatures is a narrow map (no shuffle in the plan)") {
    val plan = Multimodal.extractFeatures(media).queryExecution.executedPlan.toString
    plan should not include "Exchange"
  }

  test("sampleFrames explodes metadata only") {
    val frames = Multimodal.sampleFrames(media, everyMs = 500)
    // videos are ids 2,5,8,... with duration 1000*(1+id%5)
    val byId = frames.groupBy("media_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    byId(2L) shouldBe (1000L * 3 / 500) // duration 3000ms -> frames 0..2999 step 500
    frames.filter(col("frame_ms") % 500 =!= 0).count() shouldBe 0
  }

  test("resizeMeta clamps the longest side") {
    val out = Multimodal.resizeMeta(media, maxSide = 32)
    out.filter(col("resized_width") > 32 || col("resized_height") > 32).count() shouldBe 0
    // aspect ratio preserved within rounding
    out.select(col("meta.width"), col("meta.height"), col("resized_width"), col("resized_height"))
      .collect().foreach { r =>
        val (w, h, rw, rh) = (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))
        if (w <= 32 && h <= 32) { rw shouldBe w; rh shouldBe h }
      }
  }
}
