package graft.operators

import graft.SparkSpec

class ProfileSpec extends SparkSpec {

  private lazy val implicits = spark.implicits
  import implicits._

  test("profile reports presence, distincts, and min/max per column") {
    val df = Seq(
      (1L, Some("a"), 2.0), (2L, None, 2.0), (3L, Some("b"), 9.5))
      .toDF("id", "s", "v")
    val out = Profile.profile(df, Seq("id", "s", "v"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))).toMap
    out("id") shouldBe ((0L, 3L, 3L, "1", "3"))
    out("s") shouldBe ((1L, 2L, 2L, "a", "b"))
    out("v") shouldBe ((0L, 3L, 2L, "2.0", "9.5"))
  }

  test("profile branches never sort: no Expand, no Sort in the plan") {
    // string min/max in a combined multi-distinct aggregate would force
    // SortAggregate over an Expand-multiplied stream (the 4x-slower
    // shape the scaladoc documents); pruned per-column branches keep
    // every aggregate ungrouped and sort-free
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    val plan = Profile.profile(df, Seq("id", "s"))
      .queryExecution.executedPlan.toString
    plan should not include "Expand"
    plan should not include "Sort ["
  }
}
