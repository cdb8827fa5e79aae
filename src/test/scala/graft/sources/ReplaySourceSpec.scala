package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ReplaySourceSpec extends SparkSpec {

  private def read(rows: Long, partitions: Int, seed: Long = 42L) =
    spark.read.format("graft.sources.ReplaySource")
      .option("rows", rows).option("partitions", partitions)
      .option("seed", seed).load()

  test("short name format resolves through DataSourceRegister") {
    spark.read.format("graft-replay").option("rows", 10).load().count() shouldBe 10
  }

  test("generates the requested row count with the events schema") {
    val df = read(1000, 4)
    df.schema.fieldNames.toSeq shouldBe
      Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    df.count() shouldBe 1000
    df.select("event_id").distinct().count() shouldBe 1000
  }

  test("identical across partitionings and runs (replay property)") {
    val a = read(500, 4).orderBy("event_id").collect()
    val b = read(500, 13).orderBy("event_id").collect()
    a shouldBe b
  }

  test("different seeds differ") {
    val a = read(100, 4, seed = 1).agg(sum("value")).head().getDouble(0)
    val b = read(100, 4, seed = 2).agg(sum("value")).head().getDouble(0)
    a should not be b
  }

  test("feeds the snapshot pipeline end-to-end") {
    val curated = graft.operators.SnapshotPipeline.curateEvents(
      graft.operators.SnapshotPipeline.processEvents(read(2000, 8)))
    curated.count() should be > 0L
    curated.select("day_date_id").distinct().count() should be >= 1L
  }
}
