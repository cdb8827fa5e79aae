package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import java.nio.file.Files
import java.sql.Timestamp

class OrchestratorSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  private def events(rows: (Long, String, Long, String)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, t, u, typ) =>
        Row(id, Timestamp.valueOf(t), u, typ, 4.0, null) }),
      schema)

  test("one snapshot cycle: curated layer, popularity, pack plan") {
    val root = Files.createTempDirectory("layers").toString
    val raw = events(
      (1L, "2026-01-11 17:07:40", 10L, "a"), (2L, "2026-01-11 17:08:00", 11L, "a"),
      (3L, "2026-01-11 17:09:00", 12L, "b"), (4L, "2026-01-11 17:09:30", 10L, "a"))
    val res = Orchestrator.runSnapshot(spark, raw, Some(root), numGroups = 2, cap = 2L)
    // PK dedup: user 10 appears twice in the same slot -> 3 curated rows
    res.curated.count() shouldBe 3
    // curated layer persisted and partitioned
    new java.io.File(s"$root/curated_events").list().toSeq
      .exists(_.startsWith("day_date_id=")) shouldBe true
    val pop = res.popularity.collect().map(r => (r.getString(0), r.getLong(1)))
    pop shouldBe Array(("a", 2L), ("b", 1L))
    // pack plan covers every key, groups within bounds
    res.packPlan.count() shouldBe 2
    res.packPlan.filter("group_id >= 2").count() shouldBe 0
  }

  test("dimension upsert persists across snapshots, emits delta only") {
    val dim = Files.createTempDirectory("dim").toString + "/users"
    val s1 = events((1L, "2026-01-11 17:00:00", 10L, "a"),
      (2L, "2026-01-11 17:00:01", 11L, "a")).select("user_id").distinct()
    val s2 = events((3L, "2026-01-11 17:15:00", 10L, "a"),
      (4L, "2026-01-11 17:15:01", 12L, "a")).select("user_id").distinct()
    val d1 = Orchestrator.upsertDim(spark, s1, dim, Seq("user_id"))
    d1.collect().map(_.getLong(0)).sorted shouldBe Array(10L, 11L)
    val d2 = Orchestrator.upsertDim(spark, s2, dim, Seq("user_id"))
    d2.collect().map(_.getLong(0)) shouldBe Array(12L)
    spark.read.parquet(dim).count() shouldBe 3
  }
}
