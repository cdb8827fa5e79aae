package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The snapshot-partitioned layer layout must actually prune: a
  * day/time predicate over `Layers.writePartitioned` output reads only
  * the matching partition directories.
  */
class PartitionPruningSpec extends SparkSpec {

  test("snapshot predicates prune partitions at the scan") {
    val root = Files.createTempDirectory("prune").toString
    val df = spark.range(1000).select(
      col("id"),
      (lit(20260111) + (col("id") % 4)).cast("string").as("day_date_id"),
      lit("1715").as("time_of_day_id"))
    Layers.writePartitioned(df, s"$root/t")

    val q = spark.read.parquet(s"$root/t").filter(col("day_date_id") === "20260112")
    // collect() (not count()) so the metrics below belong to THIS plan
    q.collect().length shouldBe 250

    // the scan's runtime metrics must show only 1 of 4 day partitions read
    import org.apache.spark.sql.execution.FileSourceScanExec
    val scan = q.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }.head
    scan.toString should include("PartitionFilters")
    scan.metrics("numPartitions").value shouldBe 1
  }
}
