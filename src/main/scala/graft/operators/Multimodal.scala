package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column support for the training-data
  * pipeline: media ride along as opaque `binary` columns with a typed
  * metadata struct, and decode/feature-extraction runs per-partition in
  * bounded batches.
  *
  * The Spark-side plumbing — schema, partition-preserving mapPartitions,
  * bounded batch shape, deterministic output — is real and tested. The
  * actual codec call is STUBBED behind `DecodeStub` (this environment has
  * no image/audio libraries): it derives deterministic pseudo-features
  * from the bytes, so tests can pin exact values. Swapping in a real
  * decoder changes ONE function, not the plumbing.
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

  /** The stubbed codec boundary. Deterministic: every derived value is a
    * pure function of the payload bytes.
    */
  object DecodeStub {
    /** "Decode" an image payload: dimensions from a fake 8-byte header
      * (big-endian width, height), mean "luminance" from the body bytes.
      * A real implementation would call the codec here.
      */
    def imageDims(bytes: Array[Byte]): (Int, Int) =
      if (bytes.length < 8) (0, 0)
      else (java.nio.ByteBuffer.wrap(bytes, 0, 4).getInt,
        java.nio.ByteBuffer.wrap(bytes, 4, 4).getInt)

    /** Fixed-width feature vector from payload bytes (stand-in for an
      * embedding model / mel-spectrogram): dims-bucketed byte histogram,
      * L1-normalized.
      */
    def features(bytes: Array[Byte], dims: Int): Array[Float] = {
      val counts = new Array[Float](dims)
      var i = 8.max(0)
      while (i < bytes.length) {
        counts((bytes(i) & 0xff) % dims) += 1f
        i += 1
      }
      val total = counts.sum.max(1f)
      counts.map(_ / total)
    }
  }

  private def featureSchema(df: DataFrame): StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("kind", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_bytes", LongType),
    StructField("features", ArrayType(FloatType))))

  /** Decode + feature-extract in bounded per-partition batches. Narrow
    * (no shuffle), drops the binary payload from the output, keeps the
    * input partitioning.
    *
    * @param batchSize rows decoded per in-flight batch — bounds task
    *                  memory exactly like an arrow-batch UDF's batch size.
    */
  def extractFeatures(media: DataFrame, dims: Int = 16, batchSize: Int = 64): DataFrame = {
    val outSchema = featureSchema(media)
    val enc = RowEncoder.encoderFor(outSchema)
    media.select("media_id", "kind", "bytes").mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val bytes = r.getAs[Array[Byte]]("bytes")
          val (w, h) = DecodeStub.imageDims(bytes)
          Row(r.getAs[Long]("media_id"), r.getAs[String]("kind"),
            w, h, bytes.length.toLong, DecodeStub.features(bytes, dims).toSeq)
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

  /** Deterministic synthetic media table for tests/demos: payload bytes
    * are a pure function of media_id (fake header + pseudo-random body).
    */
  def syntheticMedia(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val rnd = new scala.util.Random(i)
      val w = 16 + rnd.nextInt(64); val h = 16 + rnd.nextInt(64)
      val body = new Array[Byte](64); rnd.nextBytes(body)
      val header = java.nio.ByteBuffer.allocate(8).putInt(w).putInt(h).array()
      val kind = Seq("image", "audio", "video")(i % 3)
      Row(i.toLong, kind, header ++ body,
        Row(w, h, 16000, 1000L * (1 + i % 5)))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows), mediaSchema)
  }
}
