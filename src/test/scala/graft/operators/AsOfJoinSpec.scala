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

  private def matches(out: Array[Row]): Map[Long, Option[Long]] =
    out.map { r =>
      val i = r.fieldIndex("purchase_id")
      r.getLong(0) -> (if (r.isNullAt(i)) None else Some(r.getLong(i)))
    }.toMap

  test("forward picks earliest successor per key, null when none") {
    val clicks = frame(Seq("event_id"), Seq(
      (1L, 10L, "2024-01-01 10:00:00"),
      (2L, 10L, "2024-01-01 12:00:00"),
      (3L, 20L, "2024-01-01 09:00:00")))
    val purchases = frame(Seq("p_event_id"), Seq(
      (100L, 10L, "2024-01-01 10:30:00"),
      (101L, 10L, "2024-01-01 11:00:00"),
      (102L, 20L, "2024-01-01 08:30:00"))) // before user 20's click
    val out = AsOfJoin.asof(clicks, purchases, Seq("user_id"), "ts",
      Map("p_event_id" -> "purchase_id"), direction = "forward")
    matches(out.collect()) shouldBe
      Map(1L -> Some(100L), 2L -> None, 3L -> None)
  }

  test("nearest picks the closer side; exact tie keeps backward") {
    val clicks = frame(Seq("event_id"), Seq(
      (1L, 10L, "2024-01-01 10:00:00"), // 30min back vs 10min fwd -> fwd
      (2L, 20L, "2024-01-01 10:00:00"), // 5min back vs 20min fwd -> back
      (3L, 30L, "2024-01-01 10:00:00"))) // 10min both sides -> back (tie)
    val purchases = frame(Seq("p_event_id"), Seq(
      (100L, 10L, "2024-01-01 09:30:00"), (101L, 10L, "2024-01-01 10:10:00"),
      (102L, 20L, "2024-01-01 09:55:00"), (103L, 20L, "2024-01-01 10:20:00"),
      (104L, 30L, "2024-01-01 09:50:00"), (105L, 30L, "2024-01-01 10:10:00")))
    val out = AsOfJoin.asof(clicks, purchases, Seq("user_id"), "ts",
      Map("p_event_id" -> "purchase_id"), direction = "nearest")
    matches(out.collect()) shouldBe
      Map(1L -> Some(101L), 2L -> Some(102L), 3L -> Some(104L))
  }

  test("tolerance nulls out matches beyond the band (reference ±450s)") {
    val clicks = frame(Seq("event_id"), Seq(
      (1L, 10L, "2024-01-01 10:00:00"), // nearest is 451s back -> out of band
      (2L, 20L, "2024-01-01 10:00:00"))) // 450s forward -> exactly in band
    val purchases = frame(Seq("p_event_id"), Seq(
      (100L, 10L, "2024-01-01 09:52:29"),
      (101L, 20L, "2024-01-01 10:07:30")))
    val out = AsOfJoin.asof(clicks, purchases, Seq("user_id"), "ts",
      Map("p_event_id" -> "purchase_id"),
      direction = "nearest", toleranceSeconds = Some(450))
    matches(out.collect()) shouldBe Map(1L -> None, 2L -> Some(101L))
  }

  test("nearest with tolerance falls back to the in-band side only") {
    // backward candidate is closer but out of band; forward is in band
    val clicks = frame(Seq("event_id"), Seq((1L, 10L, "2024-01-01 10:00:00")))
    val purchases = frame(Seq("p_event_id"), Seq(
      (100L, 10L, "2024-01-01 09:00:00"), // 3600s back
      (101L, 10L, "2024-01-01 10:05:00"))) // 300s fwd
    val out = AsOfJoin.asof(clicks, purchases, Seq("user_id"), "ts",
      Map("p_event_id" -> "purchase_id"),
      direction = "nearest", toleranceSeconds = Some(450))
    matches(out.collect()) shouldBe Map(1L -> Some(101L))
  }

  test("plain backward works on a non-timestamp ordered ts column") {
    // no tolerance and no nearest -> no unix_micros arithmetic, so any
    // ordered type works as the as-of axis (here: a plain long version)
    import spark.implicits._
    val left = Seq((1L, 10L, 5L), (2L, 10L, 1L)).toDF("event_id", "user_id", "v")
    val right = Seq((100L, 10L, 3L), (101L, 10L, 4L)).toDF("p_event_id", "user_id", "v")
    val out = AsOfJoin.backward(left, right, Seq("user_id"), "v",
      Map("p_event_id" -> "purchase_id")).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (if (r.isNullAt(r.fieldIndex("purchase_id"))) None
         else Some(r.getAs[Long]("purchase_id")))).toMap
    out shouldBe Map(1L -> Some(101L), 2L -> None)
  }

  test("reserved internal names are rejected up front") {
    val clicks = frame(Seq("event_id"), Seq((1L, 10L, "2024-01-01 10:00:00")))
    val purchases = frame(Seq("p_event_id"), Seq((100L, 10L, "2024-01-01 09:00:00")))
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.backward(clicks, purchases, Seq("user_id"), "ts",
        Map("p_event_id" -> "__rts"))
    }
    e.getMessage should include("__rts")
  }
}
