package graft.streaming

import graft.SparkSpec
import graft.operators.Resample
import org.apache.spark.sql.functions.col

class StreamingConcurrencySpec extends SparkSpec {

  private lazy val implicits = spark.implicits
  import implicits._

  // intervals [0,2) [1,3) [2,4): open 1/2/2/1/0 (the batch spec's walk)
  private def rows = Seq((1L, 0L, 2L), (2L, 1L, 3L), (3L, 2L, 4L))
    .toDF("id", "s", "e")

  private def cardMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("any batch split merges to the one-shot card — intervals split mid-flight") {
    for (mod <- Seq(2L, 3L)) {
      val st = java.nio.file.Files
        .createTempDirectory("graft_sconc").toString + "/state"
      var merged: org.apache.spark.sql.DataFrame = null
      for (b <- 0L until mod)
        merged = StreamingConcurrency.acceptBatch(
          rows.filter(col("id") % mod === b), "s", "e", st)
      withClue(s"split mod $mod: ") {
        cardMap(StreamingConcurrency.concurrencyView(merged)) shouldBe
          cardMap(Resample.concurrency(rows, "s", "e"))
      }
    }
  }

  test("an open without its close raises every later day until the close lands") {
    val st = java.nio.file.Files
      .createTempDirectory("graft_sconc2").toString + "/state"
    // batch 1 carries only opens as degenerate [s, s+100) stand-ins is
    // NOT the model — the state is delta-grain, so feed the real
    // intervals of batch 1 and check the partial view, then batch 2
    val b1 = rows.filter(col("id") <= 2L)
    val v1 = cardMap(StreamingConcurrency.concurrencyView(
      StreamingConcurrency.acceptBatch(b1, "s", "e", st)))
    v1 shouldBe Map(0L -> 1L, 1L -> 2L, 2L -> 1L, 3L -> 0L)
    val merged = StreamingConcurrency.acceptBatch(
      rows.filter(col("id") === 3L), "s", "e", st)
    cardMap(StreamingConcurrency.concurrencyView(merged)) shouldBe
      Map(0L -> 1L, 1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 0L)
  }

  test("failed-sink replay is idempotent") {
    val st = java.nio.file.Files
      .createTempDirectory("graft_sconc3").toString + "/state"
    StreamingConcurrency.acceptBatch(rows.filter(col("id") <= 1L),
      "s", "e", st)
    val b2 = rows.filter(col("id") > 1L)
    StreamingConcurrency.mergeBatch(b2, "s", "e", st).count()
    val merged = StreamingConcurrency.acceptBatch(b2, "s", "e", st)
    cardMap(StreamingConcurrency.concurrencyView(merged)) shouldBe
      cardMap(Resample.concurrency(rows, "s", "e"))
  }
}
