package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Scd2Spec extends SparkSpec {

  private lazy val implicits = spark.implicits
  import implicits._

  private def cur(rows: (Long, String, Long, Option[Long])*) =
    rows.toDF("k", "attr", "valid_from", "valid_to")
  private def inc(rows: (Long, String, Long)*) =
    rows.toDF("k", "attr", "eff")

  test("scd2Merge closes changed versions, keeps unchanged, opens new keys") {
    val current = cur(
      (1L, "bronze", 100L, None),       // will change -> close at 500
      (2L, "silver", 100L, None),       // unchanged -> untouched
      (3L, "gold", 50L, Some(90L)),     // closed history -> untouched
      (3L, "platinum", 90L, None))      // open, no incoming -> untouched
    val incoming = inc((1L, "silver", 500L), (2L, "silver", 500L),
      (9L, "fresh", 500L))
    val out = Dimensions.scd2Merge(current, incoming, "k", "attr", "eff")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
    out shouldBe Set(
      (1L, "bronze", 100L, Some(500L)), // closed at the change
      (1L, "silver", 500L, None),       // new open version
      (2L, "silver", 100L, None),       // unchanged open version kept
      (3L, "gold", 50L, Some(90L)),     // history untouched
      (3L, "platinum", 90L, None),      // absent from incoming -> open
      (9L, "fresh", 500L, None))        // brand-new key opens
  }

  test("scd2Merge is idempotent for an unchanged incoming snapshot") {
    val current = cur((1L, "a", 10L, None))
    val once = Dimensions.scd2Merge(current, inc((1L, "a", 20L)), "k", "attr", "eff")
    once.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
      r.isNullAt(3))).toSet shouldBe Set((1L, "a", 10L, true))
  }
}
