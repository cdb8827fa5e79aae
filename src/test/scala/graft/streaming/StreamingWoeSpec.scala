package graft.streaming

import graft.SparkSpec
import graft.operators.Metrics
import org.apache.spark.sql.functions.col

class StreamingWoeSpec extends SparkSpec {

  private lazy val implicits = spark.implicits
  import implicits._

  // bins: A 1pos/3neg, B 3pos/1neg, C 0pos/2neg (zero-cell, dropped
  // from the card but counted in totals)
  private def rows = Seq(
    (1L, "A", 1L), (2L, "A", 0L), (3L, "A", 0L), (4L, "A", 0L),
    (5L, "B", 1L), (6L, "B", 1L), (7L, "B", 1L), (8L, "B", 0L),
    (9L, "C", 0L), (10L, "C", 0L)).toDF("id", "bin", "y")

  private def countMap(df: org.apache.spark.sql.DataFrame) =
    df.select("bin", "n_pos", "n_neg").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  private def cardMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
      r.getDouble(3), r.getDouble(4)))).toMap

  test("any batch split merges to the one-shot class-count table") {
    for (mod <- Seq(2L, 3L)) {
      val st = java.nio.file.Files
        .createTempDirectory("graft_swoe").toString + "/state"
      var merged: org.apache.spark.sql.DataFrame = null
      for (b <- 0L until mod)
        merged = StreamingWoe.acceptBatch(
          rows.filter(col("id") % mod === b), "bin", "y", st)
      withClue(s"split mod $mod: ") {
        countMap(merged) shouldBe Map("A" -> ((1L, 3L)), "B" -> ((3L, 1L)),
          "C" -> ((0L, 2L)))
      }
    }
  }

  test("the live card equals the batch woeIv of the concatenated batches") {
    val st = java.nio.file.Files
      .createTempDirectory("graft_swoe2").toString + "/state"
    StreamingWoe.acceptBatch(rows.filter(col("id") <= 5L), "bin", "y", st)
    val merged = StreamingWoe.acceptBatch(
      rows.filter(col("id") > 5L), "bin", "y", st)
    val live = cardMap(StreamingWoe.woeView(merged))
    live shouldBe cardMap(Metrics.woeIv(rows, "bin", "y"))
    live.keySet shouldBe Set("A", "B") // zero-cell bin dropped
    live("A")._3 shouldBe math.log(2.0) +- 1e-12
  }

  test("failed-sink replay is idempotent; null bins/labels drop") {
    val st = java.nio.file.Files
      .createTempDirectory("graft_swoe3").toString + "/state"
    StreamingWoe.acceptBatch(rows.filter(col("id") <= 4L), "bin", "y", st)
    // merge ran but commit never did — the retry must count batch 2 once
    val b2 = rows.filter(col("id") > 4L)
    StreamingWoe.mergeBatch(b2, "bin", "y", st).count()
    val merged = StreamingWoe.acceptBatch(b2, "bin", "y", st)
    countMap(merged) shouldBe Map("A" -> ((1L, 3L)), "B" -> ((3L, 1L)),
      "C" -> ((0L, 2L)))
    val withNulls = Seq((Option("A"), Option(1L)),
      (Option.empty[String], Option(1L)), (Option("A"), Option.empty[Long]))
      .toDF("bin", "y")
    val st2 = java.nio.file.Files
      .createTempDirectory("graft_swoe4").toString + "/state"
    countMap(StreamingWoe.acceptBatch(withNulls, "bin", "y", st2)) shouldBe
      Map("A" -> ((1L, 0L)))
  }
}
