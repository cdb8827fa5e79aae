package graft.golden

import graft.Schemas
import graft.operators.{SnapshotPipeline, StreamsEtl}
import graft.sources.Layers

/** End-to-end golden replay of the streams fact chain for snapshot
  * 20260111_1715 (reference SURVEY §5: raw shard 3,915 objects ->
  * processed 3,912 rows -> curated 3,912 rows).
  */
class GoldenStreamsSpec extends GoldenSpec {

  private lazy val raw = Layers.readEnvelopes(spark,
    s"$refData/twitch_project_raw_layer/raw_streams_data/20260111_1715/*.json",
    Schemas.rawStream)

  private lazy val processed = StreamsEtl.processStreams(raw)

  test("raw shard flattens to 3,915 stream rows with envelope keys") {
    raw.count() shouldBe 3915
    raw.select("day_date_id").distinct().collect().map(_.getString(0)) shouldBe Array("20260111")
  }

  test("processStreams reproduces processed_streams_data_20260111_1715.csv") {
    val golden = Layers.readCsv(spark,
      s"$refData/twitch_project_processed_layer/processed_streams_data/20260111/processed_streams_data_20260111_1715.csv",
      Schemas.processedStreams)
    golden.count() shouldBe 3912
    assertSameRows(processed, golden)
  }

  test("curateStreams reproduces curated_stream_data_20260111_1715.csv") {
    val golden = Layers.readCsv(spark,
      s"$refData/twitch_project_curated_layer/curated_streams_data/20260111/curated_stream_data_20260111_1715.csv",
      Schemas.curatedStreams)
    golden.count() shouldBe 3912
    assertSameRows(StreamsEtl.curateStreams(processed, "20260111", "1715"), golden)
  }

  test("popularity aggregate over the curated fact matches a hand count") {
    val curated = StreamsEtl.curateStreams(processed, "20260111", "1715")
    val pop = SnapshotPipeline.popularity(
      curated.withColumnRenamed("stream_id", "event_id"), key = "category_id")
    pop.agg(org.apache.spark.sql.functions.sum("num_of_streamers"))
      .head().getLong(0) shouldBe 3912
    // top category must dominate (Just Chatting in the reference data)
    pop.head().getLong(1) should be > 100L
  }
}
