package graft.streaming

import graft.SparkSpec
import graft.operators.Profile
import org.apache.spark.sql.functions.col

class StreamingCaptureSpec extends SparkSpec {

  private lazy val implicits = spark.implicits
  import implicits._

  // keys 1..6 captured in A, 4..9 in B; key 10 in neither window
  // (present but uncaptured rows must not count)
  private def rows = (
    (1 to 6).map(k => (k.toLong, "g", k.toLong, 1L, 0L)) ++
      (4 to 9).map(k => (100L + k, "g", k.toLong, 0L, 1L)) :+
      ((200L, "g", 10L, 0L, 0L))
    ).toDF("id", "grp", "k", "a", "b")

  private def card(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

  test("any batch split max-merges to the one-shot Chapman card") {
    val oneShot = card(Profile.captureRecapture(rows, "grp", "k", "a", "b"))
    oneShot("g") shouldBe ((6L, 6L, 3L, 11L))
    for (mod <- Seq(2L, 3L)) {
      val st = java.nio.file.Files
        .createTempDirectory("graft_scap").toString + "/state"
      var merged: org.apache.spark.sql.DataFrame = null
      for (b <- 0L until mod)
        merged = StreamingCapture.acceptBatch(
          rows.filter(col("id") % mod === b), "grp", "k", "a", "b", st)
      withClue(s"split mod $mod: ") {
        card(StreamingCapture.captureView(merged, "grp")) shouldBe oneShot
      }
    }
  }

  test("failed-sink replay is idempotent (max-merge absorbs the re-run)") {
    val st = java.nio.file.Files
      .createTempDirectory("graft_scap2").toString + "/state"
    val b1 = rows.filter(col("id") <= 6L)
    val b2 = rows.filter(col("id") > 6L)
    StreamingCapture.acceptBatch(b1, "grp", "k", "a", "b", st)
    // simulate a failed sink: merge b2 without commit, then replay it
    StreamingCapture.mergeBatch(b2, "grp", "k", "a", "b", st).count()
    val merged = StreamingCapture.acceptBatch(b2, "grp", "k", "a", "b", st)
    card(StreamingCapture.captureView(merged, "grp")) shouldBe
      card(Profile.captureRecapture(rows, "grp", "k", "a", "b"))
    // and a SECOND replay of the same batch changes nothing
    val again = StreamingCapture.acceptBatch(b2, "grp", "k", "a", "b", st)
    card(StreamingCapture.captureView(again, "grp")) shouldBe
      card(Profile.captureRecapture(rows, "grp", "k", "a", "b"))
  }
}
