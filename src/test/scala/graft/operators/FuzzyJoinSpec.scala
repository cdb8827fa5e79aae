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

  test("duplicated names match at distance 0 with exact id tie rules") {
    val d = recs(
      7L -> "same name", 3L -> "same name", 9L -> "same name",
      5L -> "same namX") // dist 1 from the trio
    val best = FuzzyJoin.nearestMatch(d, "name", "id", maxDist = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    // min-id record of the duplicated name takes the SECOND-min id;
    // every other copy takes the min id
    best(3L) shouldBe ((7L, 0))
    best(7L) shouldBe ((3L, 0))
    best(9L) shouldBe ((3L, 0))
    // the near-miss record's best is the name's min id, at dist 1
    best(5L) shouldBe ((3L, 1))
  }

  test("nearestMatch normalizes case and surrounding whitespace") {
    val d = recs(1L -> "  Alpha Beta ", 2L -> "alpha beta")
    val best = FuzzyJoin.nearestMatch(d, "name", "id", maxDist = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    best(1L) shouldBe 0
    best(2L) shouldBe 0
  }

  test("proximatePairs finds each within-window pair once, across buckets") {
    val implicits = spark.implicits
    import implicits._
    // key (c1, 500): ids 1@day10, 2@day13, 3@day25 -> (1,2) gap 3 only
    // key (c1, 700): id 4@day12 — different amount, never pairs
    // key (c2, 500): ids 5@day7, 6@day8 — bucket boundary (w=3 -> bw=4:
    //   day7 in bucket 1, day8 in bucket 2) still pairs, gap 1
    val df = Seq(
      (1L, "c1", 500L, 10L), (2L, "c1", 500L, 13L), (3L, "c1", 500L, 25L),
      (4L, "c1", 700L, 12L),
      (5L, "c2", 500L, 7L), (6L, "c2", 500L, 8L))
      .toDF("id", "cust", "amt", "day")
    val out = FuzzyJoin.proximatePairs(df, Seq("cust", "amt"), "id",
        "day", window = 3L)
      .collect()
      .map(r => (r.getLong(2), r.getLong(3)) -> r.getLong(6)).toMap
    out shouldBe Map((1L, 2L) -> 3L, (5L, 6L) -> 1L)
    an[IllegalArgumentException] should be thrownBy
      FuzzyJoin.proximatePairs(df, Seq("cust"), "id", "day", window = 0L)
    an[IllegalArgumentException] should be thrownBy
      FuzzyJoin.proximatePairs(df, Seq.empty, "id", "day", window = 3L)
  }

  test("sortedNeighborhood pairs only within the rank window and threshold") {
    val sp = spark; import sp.implicits._
    val df = Seq((1L, "apple pie"), (2L, "apple pig"), (3L, "apple ZIG"),
      (4L, "azzzzzzzzz"), (5L, "banana"), (6L, "bananas"))
      .toDF("id", "name")
    val out = FuzzyJoin.sortedNeighborhood(df, "name", "id",
      window = 5, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(5))).toSet
    // normalized: "apple zig" (3) sorts between pie/pig? keys:
    // apple pie(1) < apple pig(2) < apple zig(3) < azzzzzzzzz(4);
    // banana(5) < bananas(6). Cross-letter a->b pairs are OUT of scope
    out should contain((1L, 2L, 1L))   // pie ~ pig, dist 1
    out should contain((2L, 3L, 1L))   // pig ~ zig, dist 1 (p->z)
    out should contain((1L, 3L, 2L))   // pie ~ zig, dist 2
    out should contain((5L, 6L, 1L))   // banana ~ bananas
    // azzzzzzzzz is far from everything within its block
    out.exists(p => p._1 == 4L || p._2 == 4L) shouldBe false
    // no pair crosses the first-letter boundary
    out.exists(p => Set(1L, 2L, 3L, 4L)(p._1) && Set(5L, 6L)(p._2)) shouldBe false
  }

  test("sortedNeighborhood compresses duplicate names to min-id reps") {
    val sp = spark; import sp.implicits._
    val df = Seq((9L, "gamma ray"), (3L, "gamma ray"), (5L, "gamma raz"))
      .toDF("id", "name")
    val out = FuzzyJoin.sortedNeighborhood(df, "name", "id", 5, 3).collect()
    out.length shouldBe 1
    (out.head.getLong(0), out.head.getLong(1)) shouldBe ((3L, 5L))
  }
}
