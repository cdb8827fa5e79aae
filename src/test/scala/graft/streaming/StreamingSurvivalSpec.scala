package graft.streaming

import graft.SparkSpec
import graft.operators.Survival
import org.apache.spark.sql.functions.col

class StreamingSurvivalSpec extends SparkSpec {

  private lazy val implicits = spark.implicits
  import implicits._

  // (id, duration, event): 10 observations over durations 0..6
  private def obs = Seq(
    (1L, 0L, 1L), (2L, 1L, 1L), (3L, 1L, 0L), (4L, 2L, 1L),
    (5L, 3L, 0L), (6L, 3L, 1L), (7L, 4L, 1L), (8L, 5L, 0L),
    (9L, 6L, 1L), (10L, 6L, 0L)).toDF("id", "dur", "ev")

  private def countsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  private def curveOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getDouble(4))).sortBy(_._1).toSeq

  test("any batch split merges to the one-shot count table; kmView = batch KM") {
    for (mod <- Seq(2L, 3L)) {
      val st = java.nio.file.Files
        .createTempDirectory("graft_ssurv").toString + "/state"
      var merged: org.apache.spark.sql.DataFrame = null
      for (b <- 0L until mod)
        merged = StreamingSurvival.acceptBatch(
          obs.filter(col("id") % mod === b), "dur", "ev", st)
      val oneShot = obs.groupBy(col("dur").as("duration"))
        .agg(org.apache.spark.sql.functions.sum(col("ev")).cast("long")
          .as("n_events"),
          (org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)) -
            org.apache.spark.sql.functions.sum(col("ev"))).cast("long")
            .as("n_censored"))
      withClue(s"split mod $mod: ") {
        countsOf(merged.select("duration", "n_events", "n_censored")
          .select(col("duration"), col("n_events"), col("n_censored"))) shouldBe
          countsOf(oneShot)
        curveOf(StreamingSurvival.kmView(merged, bucketWidth = 2L)) shouldBe
          curveOf(Survival.kaplanMeier(obs, "dur", "ev", bucketWidth = 2L))
      }
    }
  }

  test("failed-sink replay is idempotent; hazardView = batch Nelson-Aalen") {
    val st = java.nio.file.Files
      .createTempDirectory("graft_ssurv2").toString + "/state"
    StreamingSurvival.acceptBatch(obs.filter(col("id") <= 5L), "dur", "ev", st)
    // simulate a failed sink: mergeBatch ran but commit never did — the
    // retry (full acceptBatch) must count batch 2 exactly once
    val b2 = obs.filter(col("id") > 5L)
    StreamingSurvival.mergeBatch(b2, "dur", "ev", st).count()
    val merged = StreamingSurvival.acceptBatch(b2, "dur", "ev", st)
    curveOf(StreamingSurvival.hazardView(merged)) shouldBe
      curveOf(Survival.nelsonAalen(obs, "dur", "ev"))
  }
}
