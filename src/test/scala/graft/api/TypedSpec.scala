package graft.api

import graft.SparkSpec

class TypedSpec extends SparkSpec {

  private def curated = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("s1", "20260111", "1715", "u1", "c1", "en", 100L, 25.0),
        Row("s2", "20260111", "1715", "u2", "c1", "en", 50L, 12.5),
        Row("s3", "20260111", "1715", "u1", "c2", "es", 10L, 2.5))),
      StructType(Seq(
        StructField("stream_id", StringType), StructField("day_date_id", StringType),
        StructField("time_of_day_id", StringType), StructField("user_id", StringType),
        StructField("category_id", StringType), StructField("language_id", StringType),
        StructField("viewer_count", LongType), StructField("hours_watched", DoubleType))))
  }

  test("typed view round-trips and aggregates with compile-checked fields") {
    val ds = Typed.curatedStreams(curated)
    ds.count() shouldBe 3
    val pop = Typed.popularity(ds).collect()
      .map(p => p.category_id -> p.num_of_streamers).toMap
    pop shouldBe Map("c1" -> 2L, "c2" -> 1L)
    val hours = Typed.hoursByUser(ds).collect().toMap
    hours shouldBe Map("u1" -> 27.5, "u2" -> 12.5)
  }
}
