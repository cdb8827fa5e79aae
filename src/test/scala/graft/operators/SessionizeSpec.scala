package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import java.sql.Timestamp

class SessionizeSpec extends SparkSpec {

  private def ev(rows: (Long, Long, String)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, u, t) =>
        Row(id, u, Timestamp.valueOf(t)) }),
      StructType(Seq(StructField("event_id", LongType),
        StructField("user_id", LongType), StructField("ts", TimestampType))))

  test("gap larger than threshold starts a new session per key") {
    val d = ev(
      (1L, 1L, "2024-01-01 10:00:00"), (2L, 1L, "2024-01-01 10:30:00"), // session 1
      (3L, 1L, "2024-01-01 12:00:01"), // gap > 1h -> session 2
      (4L, 2L, "2024-01-01 10:00:00")) // other key -> own session 1
    val out = Sessionize.withSessionIds(d, "user_id", "ts", 3600)
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("session_id")).toMap
    out shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 1L)
  }

  test("session summaries carry bounds, counts, duration") {
    val d = ev(
      (1L, 1L, "2024-01-01 10:00:00"), (2L, 1L, "2024-01-01 10:10:00"),
      (3L, 1L, "2024-01-01 13:00:00"))
    val out = Sessionize.sessions(d, "user_id", "ts", 3600)
      .orderBy("session_id").collect()
    out should have length 2
    out(0).getAs[Long]("n_events") shouldBe 2
    out(0).getAs[Long]("duration_s") shouldBe 600
    out(1).getAs[Long]("n_events") shouldBe 1
    out(1).getAs[Long]("duration_s") shouldBe 0
  }
}
