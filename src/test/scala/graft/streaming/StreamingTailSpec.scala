package graft.streaming

import graft.SparkSpec
import graft.operators.Pareto
import org.apache.spark.sql.functions.col

class StreamingTailSpec extends SparkSpec {

  private lazy val implicits = spark.implicits
  import implicits._

  private def rows = (1 to 40)
    .map(i => (i.toLong, "g", (i * i).toDouble)) // a convex tail
    .toDF("id", "grp", "x")

  private val th = Seq(100.0, 400.0, 900.0)

  private def card(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getDouble(1)) ->
      r.toSeq.drop(2)).toMap

  test("any batch split sums to the one-shot excess moments") {
    val oneShot = card(Pareto.meanExcess(rows, "grp", "x", th))
    oneShot.keySet shouldBe th.map(("g", _)).toSet
    for (mod <- Seq(2L, 3L)) {
      val st = java.nio.file.Files
        .createTempDirectory("graft_stail").toString + "/state"
      var merged: org.apache.spark.sql.DataFrame = null
      for (b <- 0L until mod)
        merged = StreamingTail.acceptBatch(
          rows.filter(col("id") % mod === b), "grp", "x", th, st)
      withClue(s"split mod $mod: ") {
        card(StreamingTail.tailView(merged, "grp")) shouldBe oneShot
      }
    }
  }

  test("failed-sink replay lands the same card after the retry") {
    val st = java.nio.file.Files
      .createTempDirectory("graft_stail2").toString + "/state"
    val b1 = rows.filter(col("id") <= 20L)
    val b2 = rows.filter(col("id") > 20L)
    StreamingTail.acceptBatch(b1, "grp", "x", th, st)
    StreamingTail.mergeBatch(b2, "grp", "x", th, st).count() // no commit
    val merged = StreamingTail.acceptBatch(b2, "grp", "x", th, st)
    card(StreamingTail.tailView(merged, "grp")) shouldBe
      card(Pareto.meanExcess(rows, "grp", "x", th))
  }
}
