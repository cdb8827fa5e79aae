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

  test("column pruning reaches the generator (DSv2 required-columns pushdown)") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val q = read(1000, 4).select("user_id", "event_type")
    val scans = q.queryExecution.executedPlan.collect { case b: BatchScanExec => b }
    scans should have size 1
    // the scan itself emits only the projected columns — not a
    // post-scan projection over all six
    scans.head.output.map(_.name).sorted shouldBe Seq("event_type", "user_id")
    // pruned values match the full read's projection exactly
    val full = read(1000, 4).orderBy("event_id")
      .select("user_id", "event_type").collect()
    q.orderBy("user_id", "event_type").collect() shouldBe
      full.sortBy(r => (r.getLong(0), r.getString(1)))
  }

  test("reported statistics drive auto-broadcast like file footer stats") {
    // a small replay frame joined to a big one must broadcast WITHOUT
    // an explicit hint — possible only because estimateStatistics
    // reports a real size (DSv2 defaults to 'unknown' = never
    // broadcast); the pruned scan also reports the narrower row width
    val small = read(100, 2).select(col("user_id")).distinct()
    val big = read(100000, 8)
    val plan = big.join(small, Seq("user_id"))
      .queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
  }

  test("feeds the snapshot pipeline end-to-end") {
    val curated = graft.operators.SnapshotPipeline.curateEvents(
      graft.operators.SnapshotPipeline.processEvents(read(2000, 8)))
    curated.count() should be > 0L
    curated.select("day_date_id").distinct().count() should be >= 1L
  }
}
