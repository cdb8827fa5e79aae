package graft.streaming

import graft.SparkSpec
import graft.operators.Pareto
import org.apache.spark.sql.functions.col

class StreamingPriceIndexSpec extends SparkSpec {

  private lazy val implicits = spark.implicits
  import implicits._

  // two items in both eras, one era-0-only (drops from the basket)
  private def rows = Seq(
    (1L, "g", "A", 0L, 100.0, 10.0), (2L, "g", "B", 0L, 8.0, 1.0),
    (3L, "g", "A", 1L, 20.0, 1.0), (4L, "g", "B", 1L, 40.0, 10.0),
    (5L, "g", "C", 0L, 5.0, 1.0), (6L, "g", "A", 0L, 50.0, 5.0))
    .toDF("id", "grp", "item", "era", "rev", "qty")

  private def card(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap

  test("any batch split adds to the one-shot index card") {
    val oneShot = card(Pareto.priceIndices(rows, "grp", "item", "era",
      "rev", "qty"))
    oneShot("g")._1 shouldBe 2L
    for (mod <- Seq(2L, 3L)) {
      val st = java.nio.file.Files
        .createTempDirectory("graft_spidx").toString + "/state"
      var merged: org.apache.spark.sql.DataFrame = null
      for (b <- 0L until mod)
        merged = StreamingPriceIndex.acceptBatch(
          rows.filter(col("id") % mod === b), "grp", "item", "era",
          "rev", "qty", st)
      withClue(s"split mod $mod: ") {
        card(StreamingPriceIndex.indexView(merged, "grp")) shouldBe oneShot
      }
    }
  }

  test("failed-sink replay lands the same card after the retry") {
    val st = java.nio.file.Files
      .createTempDirectory("graft_spidx2").toString + "/state"
    val b1 = rows.filter(col("id") <= 3L)
    val b2 = rows.filter(col("id") > 3L)
    StreamingPriceIndex.acceptBatch(b1, "grp", "item", "era", "rev",
      "qty", st)
    StreamingPriceIndex.mergeBatch(b2, "grp", "item", "era", "rev",
      "qty", st).count() // no commit
    val merged = StreamingPriceIndex.acceptBatch(b2, "grp", "item",
      "era", "rev", "qty", st)
    card(StreamingPriceIndex.indexView(merged, "grp")) shouldBe
      card(Pareto.priceIndices(rows, "grp", "item", "era", "rev", "qty"))
  }
}
