package graft.golden

import graft.Schemas
import graft.operators.StreamsEtl
import graft.sources.{Events, Layers}
import org.apache.spark.sql.types._

/** Golden replay of the users dimension chain for snapshot
  * 20260111_1715 (reference §3.2): raw Helix /users JSON -> processed
  * CSV (sentinel fills, view_count dropped) -> curated delta (rename +
  * upsert against the current dim), plus the SQS batch-event flatten
  * from the checked-in sample fixtures.
  */
class GoldenUsersSpec extends GoldenSpec {

  private val processedSchema = StructType(
    Seq("id", "login", "display_name", "type", "broadcaster_type",
      "description", "profile_image_url", "offline_image_url", "created_at")
      .map(StructField(_, StringType)))

  private lazy val raw = Layers.readEnvelopes(spark,
    s"$refData/twitch_project_raw_layer/raw_users_data/20260111/raw_users_data_20260111_1715.json",
    Schemas.rawUser)

  private lazy val processed = StreamsEtl.processUsers(raw)

  test("processUsers reproduces processed_users_data_20260111_1715.csv") {
    val golden = Layers.readCsv(spark,
      s"$refData/twitch_project_processed_layer/processed_users_data/20260111/processed_users_data_20260111_1715.csv",
      processedSchema)
    golden.count() shouldBe 3912
    assertSameRows(processed, golden)
  }

  test("curateUsers with empty current dim emits the full curated delta") {
    val golden = Layers.readCsv(spark,
      s"$refData/twitch_project_curated_layer/curated_users_data/20260111/curated_users_data_20260111_1715.csv",
      Schemas.users)
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Schemas.users)
    val (updated, delta) = StreamsEtl.curateUsers(processed, empty)
    assertSameRows(delta, golden)
    updated.count() shouldBe golden.count()
  }

  test("curateUsers against the full current dim emits an empty delta (F6)") {
    val current = Layers.readCsv(spark,
      s"$refData/twitch_project_miscellaneous/current_data/current_users.csv",
      Schemas.users)
    val (_, delta) = StreamsEtl.curateUsers(processed, current)
    delta.isEmpty shouldBe true
  }

  test("SQS batch fixtures flatten to the distinct category id set") {
    val env = spark.read.schema(Events.sqsEnvelope)
      .option("multiLine", true)
      .json(s"$refData/sample_data/SQS_batch_event_input/example_SQS_batch_event_input1.json")
    val ids = Events.parseSqsBatch(env).collect().map(_.getString(0)).sorted
    ids shouldBe Array("26936", "28834", "492971", "515025")
  }
}
