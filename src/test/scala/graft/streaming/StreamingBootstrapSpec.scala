package graft.streaming

import graft.SparkSpec
import graft.operators.Bootstrap
import org.apache.spark.sql.functions.col

class StreamingBootstrapSpec extends SparkSpec {

  private lazy val implicits = spark.implicits
  import implicits._

  private def rows = (1 to 120)
    .map(i => (i.toLong, "g", (i % 37 + 1).toDouble))
    .toDF("id", "grp", "x")

  private def card(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap

  test("any batch split adds to the one-shot bootstrap card") {
    val oneShot = card(Bootstrap.poissonBootstrapMean(rows, "grp",
      "id", "x"))
    for (mod <- Seq(2L, 3L)) {
      val st = java.nio.file.Files
        .createTempDirectory("graft_sboot").toString + "/state"
      var merged: org.apache.spark.sql.DataFrame = null
      for (b <- 0L until mod)
        merged = StreamingBootstrap.acceptBatch(
          rows.filter(col("id") % mod === b), "grp", "id", "x", st)
      withClue(s"split mod $mod: ") {
        card(StreamingBootstrap.bootstrapView(merged, "grp")) shouldBe
          oneShot
      }
    }
  }

  test("failed-sink replay lands the same card after the retry") {
    val st = java.nio.file.Files
      .createTempDirectory("graft_sboot2").toString + "/state"
    val b1 = rows.filter(col("id") <= 60L)
    val b2 = rows.filter(col("id") > 60L)
    StreamingBootstrap.acceptBatch(b1, "grp", "id", "x", st)
    StreamingBootstrap.mergeBatch(b2, "grp", "id", "x", st).count()
    val merged = StreamingBootstrap.acceptBatch(b2, "grp", "id", "x", st)
    card(StreamingBootstrap.bootstrapView(merged, "grp")) shouldBe
      card(Bootstrap.poissonBootstrapMean(rows, "grp", "id", "x"))
  }
}
