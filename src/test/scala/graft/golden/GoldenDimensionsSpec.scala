package graft.golden

import graft.Schemas
import graft.operators.Dimensions
import graft.sources.Layers

/** Dimension generators must reproduce the reference's checked-in dim
  * CSVs byte-for-byte at the value level (raw_day_dates_data.csv:
  * 1,095 rows; raw_time_of_day_data.csv: 96 rows).
  */
class GoldenDimensionsSpec extends GoldenSpec {

  test("dayDates reproduces raw_day_dates_data.csv exactly") {
    val golden = Layers.readCsv(spark,
      s"$refData/twitch_project_raw_layer/raw_day_dates_data/raw_day_dates_data.csv",
      Schemas.dayDates)
    golden.count() shouldBe 1095
    assertSameRows(Dimensions.dayDates(spark, 2025, 2027), golden)
  }

  test("timeOfDay reproduces raw_time_of_day_data.csv exactly") {
    val golden = Layers.readCsv(spark,
      s"$refData/twitch_project_raw_layer/raw_time_of_day_data/raw_time_of_day_data.csv",
      Schemas.timeOfDay)
    golden.count() shouldBe 96
    assertSameRows(Dimensions.timeOfDay(spark), golden)
  }

  test("languages passthrough keeps all 186 rows with string ids") {
    val langs = Layers.readCsv(spark,
      s"$refData/twitch_project_raw_layer/raw_languages_data/raw_languages_data.csv",
      Schemas.languages)
    langs.count() shouldBe 186
    langs.filter("language_id IS NULL").count() shouldBe 0
  }
}
