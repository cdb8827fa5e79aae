package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import java.nio.file.Files

/** writeCsv -> readCsv must round-trip the reference's pathological CSV
  * content: embedded quotes, commas, newlines, empty strings, and "NA"
  * sentinels (pandas keep_default_na=False semantics).
  */
class CsvRoundTripSpec extends SparkSpec {

  test("sentinels, quotes, commas, and newlines survive a round-trip") {
    val schema = StructType(Seq(
      StructField("id", StringType), StructField("title", StringType),
      StructField("igdb_id", StringType)))
    val rows = Seq(
      Row("1", "plain title", "123"),
      Row("2", "comma, inside", "NA"),
      Row("3", "quote \" and \"\" doubled", ""),
      Row("4", "new\nline", "007"),
      Row("05", "unicode 🦊 émoji", "NA"))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)

    val dir = Files.createTempDirectory("csvrt").toString + "/t"
    Layers.writeCsv(df, dir)
    val back = Layers.readCsv(spark, dir, schema)

    back.count() shouldBe 5
    back.exceptAll(df).count() shouldBe 0
    df.exceptAll(back).count() shouldBe 0
    // leading zeros survive (string schema, no inference)
    back.filter("id = '05'").count() shouldBe 1
  }
}
