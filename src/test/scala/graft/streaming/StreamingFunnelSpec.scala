package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, timestamp_micros}

class StreamingFunnelSpec extends SparkSpec {

  private lazy val implicits = spark.implicits
  import implicits._

  private val steps = Seq("view", "click", "purchase")

  // u1: view@10 click@20 purchase@30  -> reaches 3
  // u2: view@10 click@5 (click BEFORE first view) -> reaches 1
  // u3: click@10 purchase@20 (never views) -> reaches 0
  // u4: view@10 click@10 (equal first-touch times do NOT advance) -> 1
  // u5: view@10, then a later view@50 and click@40 -> min(click)=40 >
  //     min(view)=10 -> reaches 2 (first-occurrence, not strictly-after)
  private def rows = Seq(
    (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
    (2L, 10L, "view"), (2L, 5L, "click"),
    (3L, 10L, "click"), (3L, 20L, "purchase"),
    (4L, 10L, "view"), (4L, 10L, "click"),
    (5L, 10L, "view"), (5L, 50L, "view"), (5L, 40L, "click"),
    (6L, 1L, "error")) // non-step types are ignored
    .toDF("user_id", "us", "event_type")
    .withColumn("ts", timestamp_micros(col("us")))

  private def viewMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap

  private val expected = Map(
    1L -> (("view", 4L)), // u1 u2 u4 u5
    2L -> (("click", 2L)), // u1 u5
    3L -> (("purchase", 1L))) // u1

  test("the card equals the one-shot first-occurrence funnel under any split") {
    for (mod <- Seq(1L, 2L, 3L)) {
      val st = java.nio.file.Files
        .createTempDirectory("graft_sfunnel").toString + "/state"
      var merged: org.apache.spark.sql.DataFrame = null
      for (b <- 0L until mod)
        merged = StreamingFunnel.acceptBatch(
          rows.filter(col("us") % mod === b), "user_id", "ts",
          "event_type", steps, st)
      withClue(s"split mod $mod: ") {
        viewMap(StreamingFunnel.funnelView(merged, steps)) shouldBe expected
      }
    }
  }

  test("failed-sink replay is idempotent (min-merge absorbs re-sent events)") {
    val st = java.nio.file.Files
      .createTempDirectory("graft_sfunnel2").toString + "/state"
    val b1 = rows.filter(col("user_id") <= 3L)
    val b2 = rows.filter(col("user_id") > 3L)
    StreamingFunnel.acceptBatch(b1, "user_id", "ts", "event_type", steps, st)
    // merge ran but the sink failed before commit; the retry must not
    // shift any first-touch time
    StreamingFunnel.mergeBatch(b2, "user_id", "ts", "event_type", steps, st)
      .count()
    val merged = StreamingFunnel.acceptBatch(b2, "user_id", "ts",
      "event_type", steps, st)
    viewMap(StreamingFunnel.funnelView(merged, steps)) shouldBe expected
    // state is (user, step)-keyed: one row per seen pair
    merged.count() shouldBe rows.filter(col("event_type") =!= "error")
      .select("user_id", "event_type").distinct().count()
  }

  test("step lists are validated") {
    an[IllegalArgumentException] should be thrownBy
      StreamingFunnel.funnelView(rows, Seq("view"))
    an[IllegalArgumentException] should be thrownBy
      StreamingFunnel.funnelView(rows, Seq("view", "view"))
  }
}
