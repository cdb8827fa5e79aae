package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, timestamp_micros}

class StreamingRetentionSpec extends SparkSpec {

  private lazy val implicits = spark.implicits
  import implicits._

  private val WEEK = 7L * 86400000000L

  // u1 active weeks {0, 1, 2}; u2 {0, 2}; u3 {1}
  // cohort 0: size 2, offsets 0->2, 1->1, 2->2
  // cohort 1: size 1, offsets 0->1
  private def rows = Seq(
    (1L, 0L), (1L, 1L), (1L, 2L), (1L, 2L), // duplicate week events
    (2L, 0L), (2L, 2L),
    (3L, 1L))
    .toDF("user_id", "wk")
    .withColumn("ts", timestamp_micros(col("wk") * WEEK))

  private val expected = Map(
    (0L, 0L) -> ((2L, 10000L)), (0L, 1L) -> ((1L, 5000L)),
    (0L, 2L) -> ((2L, 10000L)), (1L, 0L) -> ((1L, 10000L)))

  private def cardMap(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap

  test("the card equals the one-shot retention matrix under any split") {
    for (mod <- Seq(1L, 2L, 3L)) {
      val st = java.nio.file.Files
        .createTempDirectory("graft_sret").toString + "/state"
      var merged: org.apache.spark.sql.DataFrame = null
      for (b <- 0L until mod)
        merged = StreamingRetention.acceptBatch(
          rows.filter((col("user_id") + col("wk")) % mod === b),
          "user_id", "ts", st)
      withClue(s"split mod $mod: ") {
        cardMap(StreamingRetention.retentionView(merged)) shouldBe expected
      }
    }
  }

  test("a late earlier-week batch re-cohorts the user (min is derived)") {
    val st = java.nio.file.Files
      .createTempDirectory("graft_sret2").toString + "/state"
    // u3 first seen at week 1...
    StreamingRetention.acceptBatch(rows, "user_id", "ts", st)
    // ...then a late batch reveals u3 was active at week 0
    val late = Seq((3L, 0L)).toDF("user_id", "wk")
      .withColumn("ts", timestamp_micros(col("wk") * WEEK))
    val merged = StreamingRetention.acceptBatch(late, "user_id", "ts", st)
    val card = cardMap(StreamingRetention.retentionView(merged))
    card((0L, 0L)) shouldBe ((3L, 10000L)) // u3 joins cohort 0
    card((0L, 1L)) shouldBe ((2L, 6666L)) // u1 + re-cohorted u3 week 1
    card.get((1L, 0L)) shouldBe None // cohort 1 dissolves
  }

  test("failed-sink replay is idempotent on the additive counts") {
    val st = java.nio.file.Files
      .createTempDirectory("graft_sret3").toString + "/state"
    val b1 = rows.filter(col("user_id") <= 2L)
    val b2 = rows.filter(col("user_id") > 2L)
    StreamingRetention.acceptBatch(b1, "user_id", "ts", st)
    StreamingRetention.mergeBatch(b2, "user_id", "ts", st).count()
    val merged = StreamingRetention.acceptBatch(b2, "user_id", "ts", st)
    cardMap(StreamingRetention.retentionView(merged)) shouldBe expected
    // state is (user, week)-keyed presence, duplicates collapsed
    merged.count() shouldBe 6L
  }

  test("day-grain state feeds the rolling-actives card, split-invariant") {
    val DAY = 86400000000L
    val ev = Seq((1L, 0L), (2L, 0L), (1L, 8L), (3L, 2L))
      .toDF("user_id", "d")
      .withColumn("ts", timestamp_micros(col("d") * DAY))
    val oneShot = graft.operators.Cohorts
      .rollingActives(ev, "user_id", "ts", window = 7)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (mod <- Seq(1L, 2L)) {
      val st = java.nio.file.Files
        .createTempDirectory("graft_sract").toString + "/state"
      var merged: org.apache.spark.sql.DataFrame = null
      for (b <- 0L until mod)
        merged = StreamingRetention.acceptBatch(
          ev.filter((col("user_id") + col("d")) % mod === b),
          "user_id", "ts", st, grainDays = 1)
      withClue(s"split mod $mod: ") {
        StreamingRetention.activesView(merged, window = 7)
          .collect().map(r => r.getLong(0) -> r.getLong(1))
          .toMap shouldBe oneShot
      }
    }
  }
}
