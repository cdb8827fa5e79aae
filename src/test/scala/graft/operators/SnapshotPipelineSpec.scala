package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import java.sql.Timestamp

class SnapshotPipelineSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  private def ev(rows: (Long, String, java.lang.Long, String, Double, String)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, ts, u, t, v, p) =>
        Row(id, Timestamp.valueOf(ts), u, t, v, p) }),
      schema)

  test("process: snapshot keys, validity filter, sentinel, props parse") {
    val d = ev(
      (1L, "2026-01-11 17:07:40", 10L, "stream", 4.0, """{"k": 7}"""),
      (2L, "2026-01-11 17:07:40", null, "stream", 1.0, null), // dropped: null user
      (3L, "2026-01-11 17:07:40", -5L, "stream", 1.0, null), // dropped: negative id
      (4L, "2026-01-11 23:55:00", 11L, "", 2.0, "not json"))
    val out = SnapshotPipeline.processEvents(d).collect()
    out.map(_.getAs[Long]("event_id")).sorted shouldBe Array(1L, 4L)
    val r1 = out.find(_.getAs[Long]("event_id") == 1L).get
    r1.getAs[String]("day_date_id") shouldBe "20260111"
    r1.getAs[String]("time_of_day_id") shouldBe "1715"
    r1.getAs[Int]("prop_k") shouldBe 7
    val r4 = out.find(_.getAs[Long]("event_id") == 4L).get
    r4.getAs[String]("event_type") shouldBe "notavailable"
    r4.getAs[String]("day_date_id") shouldBe "20260112" // 23:55 rolls over
    r4.getAs[String]("time_of_day_id") shouldBe "0000"
  }

  test("curate: hours_watched derived, PK dedup keeps min event id") {
    val d = ev(
      (9L, "2026-01-11 17:00:00", 10L, "a", 8.0, null),
      (5L, "2026-01-11 17:00:10", 10L, "a", 8.0, null), // same (user, slot) -> min id 5 wins
      (7L, "2026-01-11 17:30:00", 10L, "a", 2.0, null))
    val out = SnapshotPipeline.curateEvents(SnapshotPipeline.processEvents(d)).collect()
    out.map(_.getAs[Long]("event_id")).sorted shouldBe Array(5L, 7L)
    out.foreach { r =>
      r.getAs[Double]("hours_watched") shouldBe r.getAs[Double]("value") * 0.25
    }
  }

  test("popularity counts per type, sorted desc") {
    val d = ev(
      (1L, "2026-01-11 17:00:00", 1L, "a", 1.0, null),
      (2L, "2026-01-11 17:00:00", 2L, "a", 1.0, null),
      (3L, "2026-01-11 17:00:00", 3L, "b", 1.0, null))
    val out = SnapshotPipeline.popularity(
        SnapshotPipeline.curateEvents(SnapshotPipeline.processEvents(d)))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    out shouldBe Array(("a", 2L), ("b", 1L))
  }
}
