package graft.streaming

import graft.SparkSpec
import graft.operators.Metrics
import org.apache.spark.sql.functions.col

class StreamingAbTestSpec extends SparkSpec {

  private lazy val implicits = spark.implicits
  import implicits._

  // experiment e1: arm a 1/3 vs arm b 3/3; e2: one arm only (no
  // comparison until its b arm arrives)
  private def rows = Seq(
    (1L, "e1", 0L, 1L), (2L, "e1", 0L, 0L), (3L, "e1", 0L, 0L),
    (4L, "e1", 1L, 1L), (5L, "e1", 1L, 1L), (6L, "e1", 1L, 1L),
    (7L, "e2", 0L, 1L), (8L, "e2", 0L, 0L)).toDF("id", "t", "arm", "ok")

  private def countMap(df: org.apache.spark.sql.DataFrame) =
    df.select("t", "n_a", "k_a", "n_b", "k_b").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap

  test("any batch split merges to the one-shot arm-count table") {
    for (mod <- Seq(2L, 3L)) {
      val st = java.nio.file.Files
        .createTempDirectory("graft_sab").toString + "/state"
      var merged: org.apache.spark.sql.DataFrame = null
      for (b <- 0L until mod)
        merged = StreamingAbTest.acceptBatch(
          rows.filter(col("id") % mod === b), "t", "arm", "ok", st)
      withClue(s"split mod $mod: ") {
        countMap(merged) shouldBe Map("e1" -> ((3L, 1L, 3L, 3L)),
          "e2" -> ((2L, 1L, 0L, 0L)))
      }
    }
  }

  test("the live card equals the batch test; one-arm keys stay absent") {
    val st = java.nio.file.Files
      .createTempDirectory("graft_sab2").toString + "/state"
    StreamingAbTest.acceptBatch(rows.filter(col("id") <= 4L),
      "t", "arm", "ok", st)
    val merged = StreamingAbTest.acceptBatch(rows.filter(col("id") > 4L),
      "t", "arm", "ok", st)
    val live = StreamingAbTest.abView(merged, "t").collect()
      .map(r => r.getString(0) -> ((r.getDouble(5), r.getBoolean(6))))
      .toMap
    val batch = Metrics.twoProportionZ(rows, "t", "arm", "ok").collect()
      .map(r => r.getString(0) -> ((r.getDouble(5), r.getBoolean(6))))
      .toMap
    live shouldBe batch
    live.keySet shouldBe Set("e1") // e2 never grew a b arm
    live("e1")._1 should be > 0.0 // b outperforms a
  }

  test("failed-sink replay is idempotent") {
    val st = java.nio.file.Files
      .createTempDirectory("graft_sab3").toString + "/state"
    StreamingAbTest.acceptBatch(rows.filter(col("id") <= 4L),
      "t", "arm", "ok", st)
    val b2 = rows.filter(col("id") > 4L)
    StreamingAbTest.mergeBatch(b2, "t", "arm", "ok", st).count()
    val merged = StreamingAbTest.acceptBatch(b2, "t", "arm", "ok", st)
    countMap(merged) shouldBe Map("e1" -> ((3L, 1L, 3L, 3L)),
      "e2" -> ((2L, 1L, 0L, 0L)))
  }
}
