package graft.streaming

import graft.SparkSpec
import graft.operators.Sampling
import org.apache.spark.sql.functions.col

class StreamingEssSpec extends SparkSpec {

  private lazy val implicits = spark.implicits
  import implicits._

  // eq: equal weights (ESS = n); wh: one whale dominates
  private def rows = Seq(
    (1L, "eq", 10L), (2L, "eq", 10L), (3L, "eq", 10L),
    (4L, "wh", 1000L), (5L, "wh", 1L), (6L, "wh", 1L),
    (7L, "dirty", 5L), (8L, "dirty", 0L)).toDF("id", "grp", "w")

  private def card(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap

  test("any batch split merges to the one-shot weight statistics") {
    val oneShot = card(Sampling.effectiveSampleSize(rows, "grp", "w"))
    oneShot("eq") shouldBe ((3L, 3.0, 1000000L))
    for (mod <- Seq(2L, 3L)) {
      val st = java.nio.file.Files
        .createTempDirectory("graft_sess").toString + "/state"
      var merged: org.apache.spark.sql.DataFrame = null
      for (b <- 0L until mod)
        merged = StreamingEss.acceptBatch(
          rows.filter(col("id") % mod === b), "grp", "w", st)
      withClue(s"split mod $mod: ") {
        card(StreamingEss.essView(merged, "grp")) shouldBe oneShot
      }
    }
  }

  test("failed-sink replay is idempotent") {
    val st = java.nio.file.Files
      .createTempDirectory("graft_sess2").toString + "/state"
    val b1 = rows.filter(col("id") <= 4L)
    val b2 = rows.filter(col("id") > 4L)
    StreamingEss.acceptBatch(b1, "grp", "w", st)
    StreamingEss.mergeBatch(b2, "grp", "w", st).count()
    val merged = StreamingEss.acceptBatch(b2, "grp", "w", st)
    card(StreamingEss.essView(merged, "grp")) shouldBe
      card(Sampling.effectiveSampleSize(rows, "grp", "w"))
  }
}
