package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {

  private lazy val left = spark.range(1000)
    .select((col("id") % 3).as("k"), col("id").as("lv")) // 3 hot keys
  private lazy val right = spark.range(30)
    .select((col("id") % 10).as("k"), col("id").as("rv"))

  private lazy val plainResult =
    left.join(right, Seq("k")).select("k", "lv", "rv")

  test("saltedJoin returns exactly the plain join result") {
    val salted = SkewJoin.saltedJoin(left, right, Seq("k"), saltBuckets = 8)
      .select("k", "lv", "rv")
    salted.exceptAll(plainResult).count() shouldBe 0
    plainResult.exceptAll(salted).count() shouldBe 0
  }

  test("saltedJoin left-outer keeps unmatched left rows") {
    val l = spark.range(4).select(col("id").as("k"))
    val r = spark.range(2).select(col("id").as("k"), lit("x").as("v"))
    val out = SkewJoin.saltedJoin(l, r, Seq("k"), 4, "left")
    out.count() shouldBe 4
    out.filter(col("v").isNull).count() shouldBe 2
  }

  test("hotColdJoin returns exactly the plain join result") {
    val hot = SkewJoin.topKeys(left, Seq("k"), 1)
    val out = SkewJoin.hotColdJoin(left, right, Seq("k"), hot)
      .select("k", "lv", "rv")
    out.exceptAll(plainResult).count() shouldBe 0
    plainResult.exceptAll(out).count() shouldBe 0
  }

  test("topKeys finds the dominant key") {
    val skewed = spark.range(100).select(when(col("id") < 90, 7).otherwise(col("id")).as("k"))
    SkewJoin.topKeys(skewed, Seq("k"), 1).head().getLong(0) shouldBe 7L
  }
}
