package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  private lazy val ids = spark.range(10000).select(col("id"))

  test("sample is deterministic and approximately the requested fraction") {
    val s1 = Sampling.deterministicSample(ids, "id", 25)
    val s2 = Sampling.deterministicSample(ids, "id", 25)
    s1.exceptAll(s2).count() shouldBe 0
    s1.count().toDouble shouldBe (2500.0 +- 200.0)
  }

  test("growing the dataset never moves existing rows across splits") {
    val small = Sampling.datasetSplit(spark.range(1000).toDF("id"), "id")
    val big = Sampling.datasetSplit(spark.range(5000).toDF("id"), "id")
    small.join(big.withColumnRenamed("split", "split2"), "id")
      .filter(col("split") =!= col("split2")).count() shouldBe 0
  }

  test("splits partition the data with expected proportions") {
    val out = Sampling.datasetSplit(ids, "id")
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    out.values.sum shouldBe 10000
    out("train").toDouble shouldBe (8000.0 +- 400.0)
    out("val").toDouble shouldBe (1000.0 +- 150.0)
    out("test").toDouble shouldBe (1000.0 +- 150.0)
  }
}
