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
    rows.map(_.getSeq[Float](5)) shouldBe again.map(_.getSeq[Float](5))
  }

  test("decoded dims round-trip the fake header") {
    val out = Multimodal.extractFeatures(media).orderBy("media_id").collect()
    val metas = media.orderBy("media_id").select("meta.width", "meta.height").collect()
    out.zip(metas).foreach { case (o, m) =>
      o.getInt(o.fieldIndex("width")) shouldBe m.getInt(0)
      o.getInt(o.fieldIndex("height")) shouldBe m.getInt(1)
    }
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
