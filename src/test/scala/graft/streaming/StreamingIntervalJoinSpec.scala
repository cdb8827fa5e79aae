package graft.streaming

import graft.SparkSpec
import graft.operators.IntervalJoin
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

case class Click(click_id: Long, user_id: Long, csec: Long)
case class Purchase(purchase_id: Long, user_id: Long, psec: Long)

/** `IntervalJoin.within` is ONE plan builder for batch and streaming:
  * the q130 batch entry and this watermarked stream-stream join share
  * it verbatim. The residual time-range predicate is what lets
  * Structured Streaming bound both sides' state retention, so this
  * spec is the evidence the operator's shape is the scalable one.
  */
class StreamingIntervalJoinSpec extends SparkSpec {

  test("stream-stream interval join emits exactly the batch result") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val ckpt = Files.createTempDirectory("ij_ck").toString

    val clicks = MemoryStream[Click]
    val purchases = MemoryStream[Purchase]
    val cDf = clicks.toDF()
      .withColumn("c_ts", timestamp_seconds(col("csec"))).drop("csec")
      .withWatermark("c_ts", "0 seconds")
    val pDf = purchases.toDF()
      .withColumn("p_ts", timestamp_seconds(col("psec"))).drop("psec")
      .withWatermark("p_ts", "0 seconds")

    val joined = IntervalJoin.within(cDf, pDf, "user_id", "c_ts", "p_ts",
        maxLagSeconds = 60)
      .select("user_id", "click_id", "purchase_id")

    val q = joined.writeStream
      .format("memory").queryName("ij_out")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()

    // tick 1: clicks at 100, 130 for user 1; purchase at 150 joins both
    clicks.addData(Click(1, 1, 100), Click(2, 1, 130))
    purchases.addData(Purchase(10, 1, 150))
    q.processAllAvailable()
    // tick 2: purchase at 250 — click 100/130 now out of range; a NEW
    // click at 240 (different user stays separate)
    clicks.addData(Click(3, 1, 240), Click(4, 2, 245))
    purchases.addData(Purchase(11, 1, 250), Purchase(12, 2, 246))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("ij_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    // same rows through the same builder, batch inputs
    val cB = Seq((1L, 1L, 100L), (2L, 1L, 130L), (3L, 1L, 240L), (4L, 2L, 245L))
      .toDF("click_id", "user_id", "csec")
      .withColumn("c_ts", timestamp_seconds(col("csec"))).drop("csec")
    val pB = Seq((10L, 1L, 150L), (11L, 1L, 250L), (12L, 2L, 246L))
      .toDF("purchase_id", "user_id", "psec")
      .withColumn("p_ts", timestamp_seconds(col("psec"))).drop("psec")
    val batch = IntervalJoin.within(cB, pB, "user_id", "c_ts", "p_ts", 60)
      .select("user_id", "click_id", "purchase_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    streamed shouldBe batch
    batch shouldBe Set((1L, 1L, 10L), (1L, 2L, 10L), (1L, 3L, 11L), (2L, 4L, 12L))
  }
}
