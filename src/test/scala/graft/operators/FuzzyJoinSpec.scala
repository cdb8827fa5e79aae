package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class FuzzyJoinSpec extends SparkSpec {

  private def recs(rows: (Long, String)*) = {
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, n) => Row(i, n) }),
      StructType(Seq(StructField("id", LongType), StructField("name", StringType))))
  }

  test("nearestMatch picks the min-distance candidate, ties to smallest id") {
    val d = recs(
      1L -> "green metallic steel",
      2L -> "green metallic steal",  // dist 1 from #1
      3L -> "green metalic steel",   // dist 1 from #1 too (tie with #2 for #1's best)
      4L -> "blue cotton shirt",     // different block, no in-threshold match
      5L -> "green plastic wheel")   // same block as 1-3 but > maxDist away
    val best = FuzzyJoin.nearestMatch(d, "name", "id", maxDist = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    best(1L) shouldBe ((2L, 1))  // dist 1 vs #2 and #3; tie -> smaller id 2
    best(2L) shouldBe ((1L, 1))
    best(3L) shouldBe ((1L, 1))
    best.contains(4L) shouldBe false // alone in its block
    best.contains(5L) shouldBe false // same block, but beyond maxDist
  }

  test("nearestMatch normalizes case and surrounding whitespace") {
    val d = recs(1L -> "  Alpha Beta ", 2L -> "alpha beta")
    val best = FuzzyJoin.nearestMatch(d, "name", "id", maxDist = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    best(1L) shouldBe 0
    best(2L) shouldBe 0
  }
}
