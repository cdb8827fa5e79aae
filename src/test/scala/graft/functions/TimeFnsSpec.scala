package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Nearest-15-min snapshot slot semantics (reference: the argmin over the
  * 96-row time dim, scripts/get_raw_data/get_raw_streams_data.py:34-48,
  * and the 23:52+ day-rollover, src/get_raw_data/get_raw_category_data
  * .py:57-83).
  */
class TimeFnsSpec extends SparkSpec {

  private def slotOf(ts: String): (String, String) = {
    val row = spark.sql(s"SELECT timestamp'$ts' AS ts")
      .select(TimeFns.snapshotDayId(col("ts")), TimeFns.snapshotTimeId(col("ts")))
      .head()
    (row.getString(0), row.getString(1))
  }

  test("rounds down below the midpoint") {
    slotOf("2026-01-11 17:07:29") shouldBe ("20260111", "1700")
  }

  test("rounds up at and above the midpoint") {
    slotOf("2026-01-11 17:07:30") shouldBe ("20260111", "1715")
    slotOf("2026-01-11 17:14:59") shouldBe ("20260111", "1715")
  }

  test("exact slot maps to itself") {
    slotOf("2026-01-11 17:15:00") shouldBe ("20260111", "1715")
  }

  test("23:52:30+ rolls over to next day 0000") {
    slotOf("2026-01-11 23:52:30") shouldBe ("20260112", "0000")
    slotOf("2026-01-11 23:52:29") shouldBe ("20260111", "2345")
  }

  test("year boundary rollover") {
    slotOf("2025-12-31 23:55:00") shouldBe ("20260101", "0000")
  }

  // ---- tz-aware variants (reference X8) — inputs are UTC instants,
  // expectations the reference's Pacific wall-clock rules
  // (src/get_raw_data/get_raw_category_data.py:35,46-52,88-96)

  private def pacificSlotOf(utcTs: String): (String, String) = {
    val row = spark.sql(s"SELECT timestamp'$utcTs' AS ts")
      .select(TimeFns.snapshotDayId(col("ts"), "US/Pacific"),
        TimeFns.snapshotTimeId(col("ts"), "US/Pacific"))
      .head()
    (row.getString(0), row.getString(1))
  }

  test("pacific: UTC instant converts to PST wall clock before slotting") {
    // 2026-01-16T07:00:00Z = 2026-01-15 23:00 PST (UTC-8)
    pacificSlotOf("2026-01-16 07:00:00") shouldBe ("20260115", "2300")
  }

  test("pacific: minute > 52 at hour 23 rolls to next day 0000") {
    // 23:53:00 PST — rolled (reference `minute > 52` is strict)
    pacificSlotOf("2026-01-16 07:53:00") shouldBe ("20260116", "0000")
    // 23:52:59 PST — NOT rolled; nearest same-day slot clamps to 2345
    pacificSlotOf("2026-01-16 07:52:59") shouldBe ("20260115", "2345")
    // 23:59:59 PST — rolled
    pacificSlotOf("2026-01-16 07:59:59") shouldBe ("20260116", "0000")
  }

  test("pacific: exact 450s midpoint keeps the EARLIER slot (first-win argmin)") {
    // 12:07:30.000000 PST is 450s from both 1200 and 1215 — the reference
    // scan's strict `<` keeps the first (earlier) slot
    pacificSlotOf("2026-01-15 20:07:30") shouldBe ("20260115", "1200")
    pacificSlotOf("2026-01-15 20:07:30.000001") shouldBe ("20260115", "1215")
  }

  test("pacific: DST summer offset (PDT, UTC-7) and rollover compose") {
    // 2026-07-02T06:53:00Z = 2026-07-01 23:53 PDT -> next day
    pacificSlotOf("2026-07-02 06:53:00") shouldBe ("20260702", "0000")
    // 2026-07-02T06:30:00Z = 2026-07-01 23:30 PDT
    pacificSlotOf("2026-07-02 06:30:00") shouldBe ("20260701", "2330")
  }

  test("pacific: early-day times have no negative slot") {
    pacificSlotOf("2026-01-15 08:03:00") shouldBe ("20260115", "0000") // 00:03 PST
    pacificSlotOf("2026-01-15 08:08:00") shouldBe ("20260115", "0015") // 00:08 PST
  }

  test("partOfDay buckets match reference edges") {
    val rows = spark.range(24).select(col("id").cast("int").as("h"))
      .select(col("h"), TimeFns.partOfDay(col("h")).as("p"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    rows(0) shouldBe "night"; rows(4) shouldBe "night"
    rows(5) shouldBe "morning"; rows(11) shouldBe "morning"
    rows(12) shouldBe "afternoon"; rows(16) shouldBe "afternoon"
    rows(17) shouldBe "evening"; rows(20) shouldBe "evening"
    rows(21) shouldBe "night"; rows(23) shouldBe "night"
  }
}
