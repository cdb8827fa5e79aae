package graft.streaming

import graft.SparkSpec
import graft.operators.Resample
import org.apache.spark.sql.functions.col

class StreamingBurstinessSpec extends SparkSpec {

  private lazy val implicits = spark.implicits
  import implicits._

  // key 1: seconds 0,10,20,40 (gaps 10,10,20); key 2: 5,5,105
  // (gaps 0,100); key 3 appears only late: 50
  private def rows = Seq(
    (1L, 0L), (1L, 10L), (1L, 20L), (1L, 40L),
    (2L, 5L), (2L, 5L), (2L, 105L),
    (3L, 50L)).zipWithIndex.map { case ((k, s), i) =>
    (k, new java.sql.Timestamp(s * 1000L), i.toLong)
  }.toDF("k", "ts", "tie")

  private def card(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -999.0 else r.getDouble(4)))).toMap

  test("any time-ordered split stitches to the one-shot gap statistics") {
    val oneShot = card(Resample.burstiness(rows, "k", "ts", "tie"))
    for (cuts <- Seq(Seq(15L), Seq(5L, 45L), Seq(0L, 10L, 20L, 60L))) {
      val st = java.nio.file.Files
        .createTempDirectory("graft_sburst").toString + "/state"
      val bounds = (Long.MinValue +: cuts) :+ Long.MaxValue
      var merged: org.apache.spark.sql.DataFrame = null
      for (Seq(lo, hi) <- bounds.sliding(2))
        merged = StreamingBurstiness.acceptBatch(
          rows.filter(col("ts").cast("long") >= lo &&
            col("ts").cast("long") < hi),
          "k", "ts", "tie", st)
      withClue(s"cuts $cuts: ") {
        card(StreamingBurstiness.burstinessView(merged, "k")) shouldBe
          oneShot
      }
    }
  }

  test("boundary gap stitches across batches; state row shapes are exact") {
    val st = java.nio.file.Files
      .createTempDirectory("graft_sburst2").toString + "/state"
    // batch 1: key 1 at 0,10; batch 2: key 1 at 20,40 -> boundary 10
    StreamingBurstiness.acceptBatch(
      rows.filter(col("k") === 1L && col("ts").cast("long") <= 10L),
      "k", "ts", "tie", st)
    val merged = StreamingBurstiness.acceptBatch(
      rows.filter(col("k") === 1L && col("ts").cast("long") > 10L),
      "k", "ts", "tie", st)
    val r = merged.collect().head
    (r.getLong(1), r.getLong(2)) shouldBe ((4L, 3L)) // n_events, n_gaps
    BigDecimal(r.getDecimal(3)) shouldBe BigDecimal(40) // s = 10+10+20
    BigDecimal(r.getDecimal(4)) shouldBe BigDecimal(600) // q = 100+100+400
    (r.getLong(5), r.getLong(6)) shouldBe ((0L, 40L)) // first/last second
  }

  test("an out-of-order batch raises instead of mis-stitching") {
    val st = java.nio.file.Files
      .createTempDirectory("graft_sburst3").toString + "/state"
    StreamingBurstiness.acceptBatch(
      rows.filter(col("k") === 1L && col("ts").cast("long") >= 20L),
      "k", "ts", "tie", st)
    val ex = intercept[Exception] {
      StreamingBurstiness.acceptBatch(
        rows.filter(col("k") === 1L && col("ts").cast("long") < 20L),
        "k", "ts", "tie", st)
    }
    ex.getMessage should include("event-time ordered")
  }

  test("failed-sink replay is idempotent") {
    val st = java.nio.file.Files
      .createTempDirectory("graft_sburst4").toString + "/state"
    val b1 = rows.filter(col("ts").cast("long") < 15L)
    val b2 = rows.filter(col("ts").cast("long") >= 15L)
    StreamingBurstiness.acceptBatch(b1, "k", "ts", "tie", st)
    // merge ran but commit never did — the retry must count b2 once
    StreamingBurstiness.mergeBatch(b2, "k", "ts", "tie", st).count()
    val merged = StreamingBurstiness.acceptBatch(b2, "k", "ts", "tie", st)
    card(StreamingBurstiness.burstinessView(merged, "k")) shouldBe
      card(Resample.burstiness(rows, "k", "ts", "tie"))
  }
}
