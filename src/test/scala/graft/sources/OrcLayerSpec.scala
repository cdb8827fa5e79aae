package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class OrcLayerSpec extends SparkSpec {

  test("orc layer round-trips with partition columns kept as strings") {
    val implicits = spark.implicits; import implicits._
    val path = Files.createTempDirectory("orc").toString + "/layer"
    val df = Seq((1L, "0930", 2.5), (2L, "1015", 3.5), (3L, "0930", 1.0))
      .toDF("id", "time_of_day_id", "v")
    Layers.writeOrc(df, path, partitionCols = Seq("time_of_day_id"))
    val back = Layers.readOrc(spark, path)
    // leading-zero partition values survive (inference disabled)
    back.schema("time_of_day_id").dataType.typeName shouldBe "string"
    back.filter(col("time_of_day_id") === "0930")
      .select("id").collect().map(_.getLong(0)).sorted shouldBe Array(1L, 3L)
    back.count() shouldBe 3
  }

  test("orc scan gets predicate pushdown like the parquet layers") {
    val implicits = spark.implicits; import implicits._
    val path = Files.createTempDirectory("orc2").toString + "/layer"
    Layers.writeOrc((1L to 100L).map(i => (i, s"v$i")).toDF("id", "s"), path)
    val q = Layers.readOrc(spark, path).filter(col("id") > 90)
    val plan = q.queryExecution.executedPlan.toString
    plan should include("PushedFilters")
    plan should include("GreaterThan(id,90)")
    q.count() shouldBe 10
  }
}
