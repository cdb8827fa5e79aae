package graft.streaming

import graft.SparkSpec
import graft.operators.Hypothesis
import org.apache.spark.sql.functions.col

class StreamingRiskSpec extends SparkSpec {

  private lazy val implicits = spark.implicits
  import implicits._

  // g: n11=2 n10=1 n01=1 n00=2 (OR 4); h: protective zero cell
  private def rows = Seq(
    (1L, "g", 1L, 1L), (2L, "g", 1L, 1L), (3L, "g", 1L, 0L),
    (4L, "g", 0L, 1L), (5L, "g", 0L, 0L), (6L, "g", 0L, 0L),
    (7L, "h", 1L, 1L), (8L, "h", 1L, 0L), (9L, "h", 0L, 0L))
    .toDF("id", "grp", "e", "o")

  private def card(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5),
        if (r.isNullAt(6)) -1L else r.getLong(6),
        if (r.isNullAt(7)) -1L else r.getLong(7),
        if (r.isNullAt(8)) -1L else r.getLong(8)))).toMap

  test("any batch split merges to the one-shot 2x2 cells and card") {
    val oneShot = card(Hypothesis.riskCard(rows, "grp", "e", "o"))
    for (mod <- Seq(2L, 3L)) {
      val st = java.nio.file.Files
        .createTempDirectory("graft_srisk").toString + "/state"
      var merged: org.apache.spark.sql.DataFrame = null
      for (b <- 0L until mod)
        merged = StreamingRisk.acceptBatch(
          rows.filter(col("id") % mod === b), "grp", "e", "o", st)
      withClue(s"split mod $mod: ") {
        card(StreamingRisk.riskView(merged, "grp")) shouldBe oneShot
      }
    }
    oneShot("g")._6 shouldBe 4000000L // OR sanity
  }

  test("failed-sink replay is idempotent") {
    val st = java.nio.file.Files
      .createTempDirectory("graft_srisk2").toString + "/state"
    val b1 = rows.filter(col("id") <= 4L)
    val b2 = rows.filter(col("id") > 4L)
    StreamingRisk.acceptBatch(b1, "grp", "e", "o", st)
    // merge ran but commit never did — the retry must count b2 once
    StreamingRisk.mergeBatch(b2, "grp", "e", "o", st).count()
    val merged = StreamingRisk.acceptBatch(b2, "grp", "e", "o", st)
    card(StreamingRisk.riskView(merged, "grp")) shouldBe
      card(Hypothesis.riskCard(rows, "grp", "e", "o"))
  }
}
