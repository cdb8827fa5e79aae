package graft.streaming

import graft.SparkSpec
import graft.operators.Profile
import org.apache.spark.sql.functions.col

class StreamingTopKDriftSpec extends SparkSpec {

  private lazy val implicits = spark.implicits
  import implicits._

  // group g: arm0 totals a=10, b=6, c=1; arm1 totals b=9, d=8, a=1
  private def rows = Seq(
    (1L, "g", 0L, "a", 4.0), (2L, "g", 0L, "a", 6.0),
    (3L, "g", 0L, "b", 6.0), (4L, "g", 0L, "c", 1.0),
    (5L, "g", 1L, "b", 9.0), (6L, "g", 1L, "d", 8.0),
    (7L, "g", 1L, "a", 1.0)).toDF("id", "grp", "arm", "key", "v")

  private def totalsMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)) ->
      r.getDecimal(3).doubleValue()).toMap

  test("any batch split merges to the one-shot per-key totals table") {
    for (mod <- Seq(2L, 3L)) {
      val st = java.nio.file.Files
        .createTempDirectory("graft_stkd").toString + "/state"
      var merged: org.apache.spark.sql.DataFrame = null
      for (b <- 0L until mod)
        merged = StreamingTopKDrift.acceptBatch(
          rows.filter(col("id") % mod === b), "grp", "arm", "key", "v", st)
      withClue(s"split mod $mod: ") {
        totalsMap(merged) shouldBe Map(
          ("g", 0L, "a") -> 10.0, ("g", 0L, "b") -> 6.0,
          ("g", 0L, "c") -> 1.0, ("g", 1L, "b") -> 9.0,
          ("g", 1L, "d") -> 8.0, ("g", 1L, "a") -> 1.0)
      }
    }
  }

  test("the live drift card equals batch topKDrift of the concatenated batches") {
    val st = java.nio.file.Files
      .createTempDirectory("graft_stkd2").toString + "/state"
    StreamingTopKDrift.acceptBatch(rows.filter(col("id") <= 3L),
      "grp", "arm", "key", "v", st)
    val merged = StreamingTopKDrift.acceptBatch(
      rows.filter(col("id") > 3L), "grp", "arm", "key", "v", st)
    val live = StreamingTopKDrift.driftView(merged, "grp", k = 2)
      .collect().toSeq
    val oneShot = Profile.topKDrift(rows, "grp", "arm", "key", "v", k = 2)
      .collect().toSeq
    live shouldBe oneShot
    // and the card is the hand value: top2 {a,b} vs {b,d}, common {b}
    val r = live.head
    (r.getLong(1), r.getLong(2), r.getLong(3)) shouldBe ((2L, 2L, 1L))
    r.getLong(4) shouldBe 333333L
  }

  test("a replayed merge after a FAILED commit cannot double-count") {
    val st = java.nio.file.Files
      .createTempDirectory("graft_stkd3").toString + "/state"
    StreamingTopKDrift.acceptBatch(rows.filter(col("id") <= 3L),
      "grp", "arm", "key", "v", st)
    // simulate sink failure: merge computed but commit never runs
    StreamingTopKDrift.mergeBatch(rows.filter(col("id") > 3L),
      "grp", "arm", "key", "v", st).collect()
    // retry the SAME batch to completion
    val merged = StreamingTopKDrift.acceptBatch(
      rows.filter(col("id") > 3L), "grp", "arm", "key", "v", st)
    totalsMap(merged)(("g", 0L, "a")) shouldBe 10.0
    totalsMap(merged)(("g", 1L, "b")) shouldBe 9.0
  }
}
