package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CohortsSpec extends SparkSpec {

  private lazy val implicits = spark.implicits
  import implicits._

  private def ts(s: String) = to_timestamp(lit(s))

  test("retention cohorts by first day and counts offset survivors") {
    // u1: first 2024-01-01, back on day+1 and day+7; u2: same cohort,
    // never returns; u3: later cohort, returns day+1
    val ev = Seq(
      (1L, "2024-01-01 10:00:00"), (1L, "2024-01-02 09:00:00"),
      (1L, "2024-01-08 23:00:00"),
      (2L, "2024-01-01 11:00:00"),
      (3L, "2024-01-05 00:30:00"), (3L, "2024-01-06 00:30:00"))
      .toDF("user_id", "s").withColumn("ts", to_timestamp(col("s")))
    val out = Cohorts.retention(ev, "user_id", "ts", Seq(1, 7))
      .collect().map(r => r.getDate(0).toString ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    out("2024-01-01") shouldBe ((2L, 1L, 1L))
    out("2024-01-05") shouldBe ((1L, 1L, 0L))
  }

  test("funnel requires strict temporal order per user") {
    // u1 converts fully in order; u2 clicks BEFORE signup (no step 2);
    // u3 signs up and clicks but purchases before the click (no step 3)
    val ev = Seq(
      (1L, "signup", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 11:00:00"),
      (1L, "purchase", "2024-01-01 12:00:00"),
      (2L, "click", "2024-01-02 08:00:00"),
      (2L, "signup", "2024-01-02 09:00:00"),
      (3L, "signup", "2024-01-03 10:00:00"),
      (3L, "purchase", "2024-01-03 11:00:00"),
      (3L, "click", "2024-01-03 12:00:00"))
      .toDF("user_id", "event_type", "s")
      .withColumn("ts", to_timestamp(col("s")))
    val out = Cohorts.funnel(ev, "user_id", "ts", "event_type",
      Seq("signup", "click", "purchase"))
      .collect().map(r => r.getInt(0) -> ((r.getString(1), r.getLong(2)))).toMap
    out(1) shouldBe (("signup", 3L))
    out(2) shouldBe (("click", 2L)) // u1 and u3; u2's click precedes signup
    out(3) shouldBe (("purchase", 1L)) // only u1 purchases after clicking
  }

  test("dailyOverlap reports per-day-pair overlap in exact basis points") {
    // day1: {1,2,3}; day2: {2,3,4,5}; day4: {9} (no successor rows).
    // day1->day2: both={2,3}, union=5 -> 4000 bp.
    // day2->day3: no day3 -> day2 has no output row; day3 absent too.
    val ev = Seq(
      (1L, "2024-01-01 10:00:00"), (2L, "2024-01-01 11:00:00"),
      (3L, "2024-01-01 12:00:00"), (3L, "2024-01-01 13:00:00"),
      (2L, "2024-01-02 10:00:00"), (3L, "2024-01-02 11:00:00"),
      (4L, "2024-01-02 12:00:00"), (5L, "2024-01-02 13:00:00"),
      (9L, "2024-01-04 10:00:00"))
      .toDF("user_id", "s").withColumn("ts", to_timestamp(col("s")))
    val out = Cohorts.dailyOverlap(ev, "user_id", "ts")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    out.keySet shouldBe Set("2024-01-01")
    out("2024-01-01") shouldBe ((3L, 4L, 2L, 4000L))
  }
}
