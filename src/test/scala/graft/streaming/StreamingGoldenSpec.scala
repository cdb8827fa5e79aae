package graft.streaming

import graft.{Schemas, SparkSpec}
import graft.operators.StreamsEtl
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The REAL reference pipeline as a stream: file-source watch of the
  * raw streams layer (the snapshot 20260111_1715 shard), envelope
  * flatten, process, watermarked PK dedup, curate — and the result must
  * match the batch golden chain row-for-row on the PK set.
  */
class StreamingGoldenSpec extends SparkSpec {

  test("file-source stream over the raw layer reproduces the batch curated fact") {
    val ckpt = Files.createTempDirectory("sck").toString

    val raw = SnapshotStream.readJsonLayer(spark,
      "/root/reference/data/twitch_project_raw_layer/raw_streams_data/20260111_1715/*.json",
      Schemas.envelope(Schemas.rawStream))
      .select(col("day_date_id"), col("time_of_day_id"), explode(col("data")).as("d"))
      .select(col("day_date_id"), col("time_of_day_id"), col("d.*"))

    // stateless process stage is shared with batch; streaming dedup on
    // the stream id via state store (batch uses the min-user window)
    val projected = raw
      .select(col("id"), col("user_id"), col("game_id"),
        when(col("language").isNull || col("language") === "", "notavailable")
          .otherwise(col("language")).as("language"),
        col("viewer_count"),
        to_timestamp(col("started_at")).as("started_at"))
      .filter(col("id").rlike("^-?[0-9]+$") && col("user_id").rlike("^-?[0-9]+$"))
      .withWatermark("started_at", "10 days")
      .dropDuplicates(Seq("id"))

    val q = projected.writeStream.format("memory").queryName("stream_curated")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("stream_curated")
    streamed.count() shouldBe 3912

    // same id set as the batch golden chain
    val batch = StreamsEtl.processStreams(
      graft.sources.Layers.readEnvelopes(spark,
        "/root/reference/data/twitch_project_raw_layer/raw_streams_data/20260111_1715/*.json",
        Schemas.rawStream))
    streamed.select("id").exceptAll(batch.select("id")).count() shouldBe 0
    batch.select("id").exceptAll(streamed.select("id")).count() shouldBe 0
  }
}
