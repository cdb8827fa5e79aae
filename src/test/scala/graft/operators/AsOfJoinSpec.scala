package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import java.sql.Timestamp

class AsOfJoinSpec extends SparkSpec {

  private def frame(cols: Seq[String], rows: Seq[(Long, Long, String)]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, u, ts) =>
        Row(id, u, Timestamp.valueOf(ts)) }),
      StructType(Seq(StructField(cols(0), LongType), StructField("user_id", LongType),
        StructField("ts", TimestampType))))

  test("backward picks latest predecessor per key, null when none") {
    val clicks = frame(Seq("event_id"), Seq(
      (1L, 10L, "2024-01-01 10:00:00"),
      (2L, 10L, "2024-01-01 12:00:00"),
      (3L, 20L, "2024-01-01 09:00:00")))
    val purchases = frame(Seq("p_event_id"), Seq(
      (100L, 10L, "2024-01-01 09:30:00"),
      (101L, 10L, "2024-01-01 11:00:00"),
      (102L, 20L, "2024-01-01 09:30:00"))) // after user 20's click
    val out = AsOfJoin.backward(clicks, purchases, Seq("user_id"), "ts",
        Map("p_event_id" -> "purchase_id"))
      .collect().map { r =>
        val i = r.fieldIndex("purchase_id")
        r.getLong(0) -> (if (r.isNullAt(i)) None else Some(r.getLong(i)))
      }.toMap
    out shouldBe Map(1L -> Some(100L), 2L -> Some(101L), 3L -> None)
  }

  test("right row at exactly left ts is matched (<= semantics)") {
    val clicks = frame(Seq("event_id"), Seq((1L, 10L, "2024-01-01 10:00:00")))
    val purchases = frame(Seq("p_event_id"), Seq((100L, 10L, "2024-01-01 10:00:00")))
    val out = AsOfJoin.backward(clicks, purchases, Seq("user_id"), "ts",
      Map("p_event_id" -> "purchase_id")).collect()
    out.head.getAs[Long]("purchase_id") shouldBe 100L
  }
}
