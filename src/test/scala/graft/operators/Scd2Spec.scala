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

  test("scd2Merge treats NULL->value and value->NULL as real changes") {
    // a null-propagating =!= would make the incoming row vanish here:
    // neither close the open version nor open a new one
    val current = Seq(
      (1L, Option.empty[String], 100L, Option.empty[Long]), // NULL -> "a"
      (2L, Option("b"), 100L, Option.empty[Long]),          // "b" -> NULL
      (3L, Option.empty[String], 100L, Option.empty[Long])) // NULL -> NULL: no change
      .toDF("k", "attr", "valid_from", "valid_to")
    val incoming = Seq(
      (1L, Option("a"), 500L),
      (2L, Option.empty[String], 500L),
      (3L, Option.empty[String], 500L)).toDF("k", "attr", "eff")
    val out = Dimensions.scd2Merge(current, incoming, "k", "attr", "eff")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getString(1)),
        r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
    out shouldBe Set(
      (1L, None, 100L, Some(500L)),      // NULL version closed
      (1L, Some("a"), 500L, None),       // value opens
      (2L, Some("b"), 100L, Some(500L)), // value version closed
      (2L, None, 500L, None),            // NULL opens
      (3L, None, 100L, None))            // NULL == NULL: untouched
  }

  test("scd2Merge is idempotent for an unchanged incoming snapshot") {
    val current = cur((1L, "a", 10L, None))
    val once = Dimensions.scd2Merge(current, inc((1L, "a", 20L)), "k", "attr", "eff")
    once.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
      r.isNullAt(3))).toSet shouldBe Set((1L, "a", 10L, true))
  }

  test("pointInTime attributes facts to the version in effect, half-open") {
    val versions = cur(
      (1L, "bronze", 100L, Some(500L)),
      (1L, "silver", 500L, None))
      .withColumnRenamed("attr", "tier")
    val facts = Seq((10L, 1L, 100L), (11L, 1L, 499L), (12L, 1L, 500L),
      (13L, 1L, 900L), (14L, 1L, 50L), (15L, 2L, 100L))
      .toDF("fact_id", "k", "ts")
    val out = Dimensions.pointInTime(facts, versions, "k", "ts", Seq("tier"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getString(3)))).toMap
    out(10L) shouldBe Some("bronze") // valid_from inclusive
    out(11L) shouldBe Some("bronze")
    out(12L) shouldBe Some("silver") // valid_to exclusive -> next version
    out(13L) shouldBe Some("silver") // open version
    out(14L) shouldBe None           // before first version
    out(15L) shouldBe None           // unknown key survives the left join
    out.size shouldBe 6
  }

  test("pointInTime plans an equi join, never a cartesian") {
    val versions = cur((1L, "a", 0L, None)).withColumnRenamed("attr", "t")
    val facts = Seq((1L, 1L, 5L)).toDF("fact_id", "k", "ts")
    val plan = Dimensions.pointInTime(facts, versions, "k", "ts", Seq("t"))
      .queryExecution.executedPlan.toString
    plan should not include "Cartesian"
    plan should not include "BroadcastNestedLoopJoin"
  }
}
