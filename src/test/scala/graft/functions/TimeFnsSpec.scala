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
