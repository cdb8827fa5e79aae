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

  test("cohortLtv buckets revenue by first-purchase month and integer month age") {
    // u1 first buys Jan-24 (cohort 2024/1): 10.00 in Jan, 5.50 in Mar
    //   (age 2), 2.25 in Jan-25 (age 12 — year boundary exact)
    // u2 first buys Mar-24 (cohort 2024/3): 7.00 in Mar
    val rows = Seq(
      ("u1", "2024-01-15", "10.00"), ("u1", "2024-03-02", "5.50"),
      ("u1", "2025-01-20", "2.25"), ("u2", "2024-03-30", "7.00"))
    val df = rows.toDF("user", "ds", "amt")
      .select(col("user"), to_date(col("ds")).as("day"),
        col("amt").cast("decimal(18,2)").as("amt"))
    val out = Cohorts.cohortLtv(df, "user", "day", "amt")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        ((r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    out((2024L, 1L, 0L)) shouldBe ((1L, 1L, 10.00))
    out((2024L, 1L, 2L)) shouldBe ((1L, 1L, 5.50))
    out((2024L, 1L, 12L)) shouldBe ((1L, 1L, 2.25))
    out((2024L, 3L, 0L)) shouldBe ((1L, 1L, 7.00))
    out.size shouldBe 4
  }

  test("rollingActives covers the trailing window exactly and trims the tail") {
    val DAY = 86400000000L
    // u1 active d0 and d8; u2 active d0. window 7, max day 8.
    val ev = Seq((1L, 0L), (2L, 0L), (1L, 8L)).toDF("user_id", "d")
      .withColumn("ts", timestamp_micros(col("d") * DAY))
    val out = Cohorts.rollingActives(ev, "user_id", "ts", window = 7)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L to 6L).foreach { d => out(d) shouldBe 2L } // both cover d0..d6
    out.get(7L) shouldBe None // nobody active in (d1..d7]
    out(8L) shouldBe 1L // u1's d8 activity; trim stops at max day
    out.size shouldBe 8
    // duplicate same-day events never double-count
    val dup = Seq((1L, 0L), (1L, 0L)).toDF("user_id", "d")
      .withColumn("ts", timestamp_micros(col("d") * DAY))
    Cohorts.rollingActives(dup, "user_id", "ts", 7)
      .collect().map(_.getLong(1)).max shouldBe 1L
  }

  test("temporalLabels splits features and labels at the wall without leakage") {
    // wall at 1970-01-03; label window to 1970-01-05
    // u1: events d0,d1 (one buy d1) + buy d3 -> label 1
    // u2: events d0,d0 -> no label-window buy -> label 0
    // u3: ONLY a label-window buy -> excluded (leakage guard)
    val ev = Seq(
      (1L, 0L, "view"), (1L, 1L, "buy"), (1L, 3L, "buy"),
      (2L, 0L, "view"), (2L, 0L, "click"),
      (3L, 3L, "buy"))
      .toDF("user_id", "d", "event_type")
      .withColumn("ts", timestamp_micros(col("d") * 86400000000L))
    val out = Cohorts.temporalLabels(ev, "user_id", "ts", "event_type",
        "buy", "1970-01-03", "1970-01-05")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    out.keySet shouldBe Set(1L, 2L)
    out(1L) shouldBe ((2L, 1L, 2L, 1L, 1L)) // recency = wall(d2) - d1
    out(2L) shouldBe ((2L, 0L, 1L, 2L, 0L))
    an[IllegalArgumentException] should be thrownBy
      Cohorts.temporalLabels(ev, "user_id", "ts", "event_type", "buy",
        "1970-01-05", "1970-01-03")
    // malformed walls throw eagerly instead of silently filtering
    // everything through a null to_timestamp
    a[java.time.format.DateTimeParseException] should be thrownBy
      Cohorts.temporalLabels(ev, "user_id", "ts", "event_type", "buy",
        "1970-01-03 25:00:00", "1970-01-05")
  }

  test("segmentMigration counts hand-walked band moves incl. churn cells") {
    // thresholds 1/2/4/7: u1 3-before 0-after -> (2,0) churn;
    // u2 1/1 -> (1,1); u3 0/8 -> (0,4) acquisition; u4 4/2 -> (3,2)
    val ev = (Seq.fill(3)(("u1", 1L)) ++ Seq(("u2", 1L), ("u2", 9L)) ++
      (1 to 8).map(_ => ("u3", 9L)) ++
      Seq.fill(4)(("u4", 1L)) ++ Seq.fill(2)(("u4", 9L)))
      .toDF("u", "d")
    val out = Cohorts.segmentMigration(ev, "u", "d",
        org.apache.spark.sql.functions.lit(5L))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    out shouldBe Map((2L, 0L) -> 1L, (1L, 1L) -> 1L, (0L, 4L) -> 1L,
      (3L, 2L) -> 1L)
    an[IllegalArgumentException] should be thrownBy
      Cohorts.segmentMigration(ev, "u", "d",
        org.apache.spark.sql.functions.lit(5L), thresholds = Seq(2L, 1L))
  }

  test("revenueBridge decomposes hand-walked month-over-month movement") {
    // month 1: u1 $10, u2 $5. month 2: u1 $16 (expand +6), u3 $3 (new),
    // u2 absent (churn -5). month 3: only u1 at $4 (contract -12,
    // u3 churns -3). month 1 is all-new; the max+1 phantom is trimmed.
    val rows = Seq(("u1", 1L, 10.0), ("u2", 1L, 5.0),
      ("u1", 2L, 16.0), ("u3", 2L, 3.0), ("u1", 3L, 4.0))
      .toDF("k", "mon", "v")
    val out = Cohorts.revenueBridge(rows, "k", "mon", "v").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    out.keySet shouldBe Set(1L, 2L, 3L)
    out(1L) shouldBe ((1500L, 0L, 0L, 0L, 2L, 0L))
    out(2L) shouldBe ((300L, 600L, 0L, 500L, 1L, 1L))
    out(3L) shouldBe ((0L, 0L, 1200L, 300L, 0L, 1L))
    // waterfall identity: total(p) - total(p-1) =
    //   new - churned + expansion - contraction, for every period
    val totals = rows.groupBy(col("mon"))
      .agg(org.apache.spark.sql.functions.sum(
        (col("v") * 100).cast("long")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (p <- Seq(2L, 3L)) {
      val (nw, ex, con, chn, _, _) = out(p)
      totals(p) - totals(p - 1L) shouldBe nw - chn + ex - con
    }
  }

  test("revenueBridge: per-key rows sum first; gap months churn and re-enter") {
    // u1 active months 1 and 3 (two rows in month 1 summing to $7):
    // month 2 churns $7, month 3 is new $2
    val rows = Seq(("u1", 1L, 3.0), ("u1", 1L, 4.0), ("u1", 3L, 2.0))
      .toDF("k", "mon", "v")
    val out = Cohorts.revenueBridge(rows, "k", "mon", "v").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(4),
        r.getLong(5), r.getLong(6)))).toMap
    out(1L) shouldBe ((700L, 0L, 1L, 0L))
    out(2L) shouldBe ((0L, 700L, 0L, 1L))
    out(3L) shouldBe ((200L, 0L, 1L, 0L))
  }
}
