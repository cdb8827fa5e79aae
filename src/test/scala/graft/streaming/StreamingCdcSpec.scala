package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

case class CdcOp(k: Long, ts: Long, seq: Long, op: String, v: Double)

class StreamingCdcSpec extends SparkSpec {

  private def state(df: org.apache.spark.sql.DataFrame) =
    df.select("k", "seq", "op", "v")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getString(2), r.getDouble(3)))).toMap

  private lazy val ops = Seq(
    CdcOp(1, 10, 1, "up", 1.0), CdcOp(1, 20, 2, "up", 2.0),
    CdcOp(2, 10, 3, "up", 5.0), CdcOp(2, 20, 4, "del", 0.0),
    CdcOp(3, 10, 5, "del", 0.0), CdcOp(3, 20, 6, "up", 7.0))

  test("any batch split equals one-shot compaction") {
    import spark.implicits._
    val all = ops.toDF()
    val expected = {
      val st = Files.createTempDirectory("cdc1").toString + "/s"
      state(StreamingCdc.acceptBatch(all, "k", Seq("ts", "seq"),
        col("op") === "del", st))
    }
    for (splitBit <- Seq(0L, 1L)) {
      val st = Files.createTempDirectory("cdc2").toString + "/s"
      StreamingCdc.acceptBatch(all.filter(col("seq") % 2 === splitBit),
        "k", Seq("ts", "seq"), col("op") === "del", st)
      val out = state(StreamingCdc.acceptBatch(
        all.filter(col("seq") % 2 =!= splitBit),
        "k", Seq("ts", "seq"), col("op") === "del", st))
      out shouldBe expected
    }
    expected shouldBe Map(1L -> ((2L, "up", 2.0)), 3L -> ((6L, "up", 7.0)))
  }

  test("a late-arriving older upsert cannot resurrect a tombstoned key") {
    import spark.implicits._
    val st = Files.createTempDirectory("cdc3").toString + "/s"
    // batch 1 delivers the delete (newest op for key 2)
    StreamingCdc.acceptBatch(
      Seq(CdcOp(2, 20, 4, "del", 0.0)).toDF(), "k", Seq("ts", "seq"),
      col("op") === "del", st)
    // batch 2 delivers the OLDER upsert late
    val out = state(StreamingCdc.acceptBatch(
      Seq(CdcOp(2, 10, 3, "up", 5.0)).toDF(), "k", Seq("ts", "seq"),
      col("op") === "del", st))
    out shouldBe Map.empty
  }

  test("a replayed batch after a failed sink is idempotent") {
    import spark.implicits._
    val st = Files.createTempDirectory("cdc4").toString + "/s"
    val b = Seq(CdcOp(1, 10, 1, "up", 1.0)).toDF()
    // first attempt: merge computed, sink "fails" -> no commit
    StreamingCdc.mergeBatch(b, "k", Seq("ts", "seq"), st).collect()
    val out = state(StreamingCdc.acceptBatch(b, "k", Seq("ts", "seq"),
      col("op") === "del", st))
    out shouldBe Map(1L -> ((1L, "up", 1.0)))
  }
}
