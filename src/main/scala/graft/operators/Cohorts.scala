package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort and funnel analytics over an event stream — the engagement
  * queries a snapshot pipeline's serving layer exists to answer
  * (retention of new broadcasters, signup→view→purchase conversion).
  *
  * Both are pure aggregation/join compositions on the user key: every
  * shuffle is on `user` (or the small per-cohort-day aggregate), so
  * cost scales with distinct users and event volume, never pairwise.
  */
object Cohorts {

  /** Daily cohort retention: users are cohorted by their first active
    * day; for each requested day offset the cohort's surviving user
    * count is reported. Output: `cohort_day`, `cohort_size`, one
    * `d<offset>` column per offset.
    *
    * One distinct-activity frame feeds both the cohort assignment and
    * the offset counts — conditional `countDistinct`s in a single
    * aggregate rather than one join per offset.
    */
  def retention(events: DataFrame, userCol: String, tsCol: String,
                offsets: Seq[Int]): DataFrame = {
    require(offsets.nonEmpty && offsets.forall(_ > 0),
      s"offsets must be positive day deltas: $offsets")
    val act = events
      .select(col(userCol).as("user"), to_date(col(tsCol)).as("day"))
      .distinct()
    val first = act.groupBy("user").agg(min(col("day")).as("cohort_day"))
    val j = act.join(first, "user")
      .withColumn("off", datediff(col("day"), col("cohort_day")))
    val aggs = countDistinct(col("user")).as("cohort_size") +:
      offsets.map(o =>
        countDistinct(when(col("off") === o, col("user"))).as(s"d$o"))
    j.groupBy("cohort_day").agg(aggs.head, aggs.tail: _*)
  }

  /** Ordered conversion funnel: a user reaches step k when they have a
    * step-k event STRICTLY AFTER their earliest step-(k-1) arrival (the
    * earliest such event becomes their step-k arrival — the standard
    * first-touch funnel, immune to out-of-order histories: a purchase
    * before signup does not convert). Output: one row per step with
    * `step`, `step_name`, `n_users`.
    *
    * Comparisons are on microsecond epochs so the semantics are
    * engine-portable regardless of source timestamp resolution.
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.size >= 2, s"a funnel needs at least two steps: $steps")
    val ev = events.select(col(userCol).as("user"), col(typeCol).as("et"),
      unix_micros(col(tsCol)).as("tus"))
    def stepRow(k: Int, reached: DataFrame) =
      reached.agg(count(lit(1)).as("n_users"))
        .select(lit(k + 1).as("step"), lit(steps(k)).as("step_name"),
          col("n_users"))
    var reached = ev.filter(col("et") === steps.head)
      .groupBy("user").agg(min(col("tus")).as("t"))
    var out = stepRow(0, reached)
    for (k <- 1 until steps.size) {
      reached = ev.filter(col("et") === steps(k))
        .join(reached.select(col("user"), col("t").as("prev")), "user")
        .filter(col("tus") > col("prev"))
        .groupBy("user").agg(min(col("tus")).as("t"))
      out = out.unionByName(stepRow(k, reached))
    }
    out
  }
}
