package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q56's CORRECTNESS contract: sketch estimates are engine-specific
  * by construction (no DuckDB oracle can hash-match them), so the
  * gate is error BOUNDS against the exact answers on the same
  * driver-generated testdata — deterministic for fixed input, red if
  * a sketch regresses to garbage while still returning rows.
  */
class SketchBoundsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("q56 sketch estimates stay inside their published error bounds") {
    assume(new java.io.File(s"$sfDir/events.parquet").exists())
    val approx = graft.SparkEntry.queries("q56_sketches")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    val events = graft.Tables.load(spark, sfDir, "events")
    val exactUsers = events.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // rank window for the percentile check: approx_percentile's
    // accuracy=1000 bounds rank error by n/1000, far inside p90-p995
    val bounds = events.groupBy("event_type")
      .agg(expr("percentile(value, 0.90)").as("lo"),
        expr("percentile(value, 0.995)").as("hi"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    approx.keySet shouldBe exactUsers.keySet
    for ((et, (u, p95, n)) <- approx) {
      withClue(s"event_type=$et (n=$n): ") {
        // HLL++ default rsd 0.05 -> 3 sigma = 15%; allow 20% headroom
        math.abs(u - exactUsers(et)).toDouble / exactUsers(et) should be < 0.20
        p95 should (be >= bounds(et)._1 and be <= bounds(et)._2)
      }
    }
  }
}
