package graft.sources

import graft.SparkSpec
import graft.sources.Layers
import org.apache.spark.sql.functions._
import java.nio.file.Files

class LayerPathsSpec extends SparkSpec {

  test("snapshot keys parse from layer file paths") {
    val dir = Files.createTempDirectory("paths").toString
    spark.range(3).toDF("id").coalesce(1).write.mode("overwrite")
      .json(s"$dir/processed_streams_data_20260111_1715")
    val out = Layers.withSnapshotKeysFromPath(
        spark.read.json(s"$dir/processed_streams_data_20260111_1715"))
      .select("day_date_id", "time_of_day_id").distinct().collect()
    out should have length 1
    out.head.getString(0) shouldBe "20260111"
    out.head.getString(1) shouldBe "1715"
  }

  test("training shards: exact file count, stable membership, no loss") {
    val dir = Files.createTempDirectory("shards").toString + "/t"
    val df = spark.range(10000).toDF("id")
    Layers.writeTrainingShards(df, dir, numShards = 8, keyCol = "id")
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
    files.length shouldBe 8
    val back = spark.read.parquet(dir)
    back.count() shouldBe 10000
    back.distinct().count() shouldBe 10000
  }

  test("all three SQS batch fixtures flatten to non-empty distinct id sets") {
    val env = spark.read.schema(Events.sqsEnvelope)
      .option("multiLine", true)
      .json("/root/reference/data/sample_data/SQS_batch_event_input/*.json")
    val ids = Events.parseSqsBatch(env)
    ids.count() should be > 0L
    ids.count() shouldBe ids.distinct().count()
  }
}
