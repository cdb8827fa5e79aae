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
  /** Day-over-day active-set overlap: for every day with a successor
    * day in the data, the two daily distinct-key counts, the overlap,
    * and its Jaccard in INTEGER BASIS POINTS (floor division — engine-
    * exact, no float set-similarity). The churn/stability audit next
    * to `retention`'s cohort view: a sudden jaccard_bp drop is a
    * population swap even when volumes look flat.
    *
    * Scale shape: one distinct on (day, key) — a hash aggregate — then
    * a self equi-join on (key, next-day) whose both sides are the SAME
    * deduped frame (each key meets only its own next-day row: postings
    * are 1 per key-day, never quadratic), and two broadcast joins of
    * the tiny per-day count table.
    */
  def dailyOverlap(events: DataFrame, userCol: String, tsCol: String)
      : DataFrame = {
    val du = events.select(
      date_format(col(tsCol), "yyyy-MM-dd").as("day"),
      col(userCol).as("k")).distinct()
    val counts = du.groupBy(col("day")).agg(count(lit(1)).cast("long").as("n"))
    val both = du.alias("a")
      .join(du.alias("b"),
        col("b.k") === col("a.k") &&
          col("b.day") === date_format(date_add(to_date(col("a.day")), 1),
            "yyyy-MM-dd"))
      .groupBy(col("a.day").as("day"))
      .agg(count(lit(1)).cast("long").as("n_both"))
    counts.alias("c")
      .join(broadcast(counts.alias("c2")),
        col("c2.day") === date_format(date_add(to_date(col("c.day")), 1),
          "yyyy-MM-dd"))
      .join(broadcast(both), col("c.day") === both("day"), "left")
      .select(col("c.day").as("day"),
        col("c.n").as("n_day"), col("c2.n").as("n_next"),
        coalesce(col("n_both"), lit(0L)).as("n_both"),
        call_function("div",
          coalesce(col("n_both"), lit(0L)) * 10000L,
          col("c.n") + col("c2.n") - coalesce(col("n_both"), lit(0L)))
          .as("jaccard_bp"))
  }

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

  /** Rolling `window`-day active users (the WAU/MAU primitive): for
    * every observed day, the count of distinct users active in the
    * trailing window — computed EXACTLY, no sketches, by the coverage
    * trick: each distinct (user, day) activity covers days
    * [day, day + window), so day d's trailing-window actives are the
    * distinct users covering d. Cost is a constant window-sized
    * explode of the (user, day) DISTINCT table (calendar-bounded per
    * user, never raw events) into two hash distincts — no self-join,
    * no window function, no per-day rescan.
    *
    * Output: `day` (epoch day, BIGINT; days past the data's max are
    * trimmed via a one-row max broadcast), `n_active`.
    */
  def rollingActives(events: DataFrame, userCol: String, tsCol: String,
                     window: Int = 7): DataFrame =
    coverageActives(
      events
        .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
        .select(col(userCol).as("__u"),
          call_function("div", unix_micros(col(tsCol)), lit(86400000000L))
            .as("__d")),
      window)

  /** The coverage core shared with `streaming.StreamingRetention
    * .activesView` (ONE home for the explode/trim algorithm, so the
    * streaming card cannot silently diverge from the one-shot operator
    * it is spec-pinned to equal): input is any (`__u`, `__d`) frame —
    * raw-event projections or maintained day-grain state.
    */
  private[graft] def coverageActives(presence: DataFrame,
                                     window: Int): DataFrame = {
    require(window >= 1 && window <= 60, s"window in [1,60]: $window")
    val du = presence.select(col("__u"), col("__d")).distinct()
    val mx = broadcast(du.agg(max(col("__d")).as("__mx")))
    du.withColumn("__cd",
        explode(sequence(col("__d"), col("__d") + lit((window - 1).toLong))))
      .select(col("__u"), col("__cd")).distinct()
      .crossJoin(mx)
      .filter(col("__cd") <= col("__mx"))
      .groupBy(col("__cd").as("day"))
      .agg(count(lit(1)).cast("long").as("n_active"))
  }

  /** Temporal label generation — the leakage-safe training-table
    * builder for churn/propensity models: features aggregate ONLY
    * events before `featureEnd`, the binary label is "did the user
    * produce a `targetType` event in [featureEnd, labelEnd)", and
    * users with no feature-window activity are excluded (a row whose
    * every feature is a null would leak the label-window's existence).
    * The split is by EVENT TIME against fixed boundaries, so the table
    * is reproducible and re-runs never move rows across the wall —
    * the temporal analogue of `Sampling.datasetSplit`'s hash wall.
    *
    * Output per feature-window-active user: `user`, `n_events`,
    * `n_target` (target-type events in the feature window),
    * `n_active_days`, `recency_days` (days from last activity to the
    * feature wall), `label` (0/1).
    *
    * Scale shape: one filtered user-keyed aggregate per window and a
    * left equi-join on the user key — no windows, no state.
    */
  def temporalLabels(events: DataFrame, userCol: String, tsCol: String,
                     typeCol: String, targetType: String,
                     featureEnd: String, labelEnd: String): DataFrame = {
    require(featureEnd < labelEnd,
      s"featureEnd must precede labelEnd: $featureEnd vs $labelEnd")
    // both walls parse EAGERLY on the driver (ISO date or datetime): a
    // malformed wall must throw here, not become a silently-null
    // to_timestamp that filters every row into an empty training table
    def wallMicros(s: String): Long = {
      val ldt =
        if (s.length <= 10) java.time.LocalDate.parse(s).atStartOfDay()
        else java.time.LocalDateTime.parse(s.replace(' ', 'T'))
      ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
        ldt.getNano / 1000L
    }
    val feUs = wallMicros(featureEnd)
    val leUs = wallMicros(labelEnd)
    val feDay = feUs / 86400000000L
    val fe = timestamp_micros(lit(feUs))
    val le = timestamp_micros(lit(leUs))
    val day = call_function("div", unix_micros(col(tsCol)),
      lit(86400000000L))
    val fw = events
      .filter(col(userCol).isNotNull && col(tsCol) < fe)
      .groupBy(col(userCol).as("user"))
      .agg(count(lit(1)).cast("long").as("n_events"),
        sum(when(col(typeCol) === targetType, 1L).otherwise(0L))
          .cast("long").as("n_target"),
        countDistinct(day).cast("long").as("n_active_days"),
        max(day).as("__ld"))
    val lw = events
      .filter(col(tsCol) >= fe && col(tsCol) < le &&
        col(typeCol) === targetType)
      .select(col(userCol).as("user")).distinct()
      .withColumn("__lab", lit(1L))
    fw.join(lw, Seq("user"), "left")
      .select(col("user"), col("n_events"), col("n_target"),
        col("n_active_days"),
        (lit(feDay) - col("__ld")).cast("long").as("recency_days"),
        coalesce(col("__lab"), lit(0L)).as("label"))
  }

  /** Cohort lifetime-value matrix: customers grouped by the calendar
    * month of their FIRST purchase (the cohort), revenue rolled up by
    * months-since-cohort age — the (cohort × age) triangle a
    * subscription/commerce business reads LTV curves off. `retention`
    * counts who comes back; this sums what they spend.
    *
    * Month arithmetic is INTEGER (year·12 + month), never fractional
    * month intervals — engine-portable and unambiguous on month
    * boundaries. Revenue is the exact DECIMAL(18,2) sum, rounded to 2
    * places only on output.
    *
    * Scale shape: one hash aggregate for first-purchase months (keyed
    * by customer), one equi-join back on the customer key, one
    * (cohort, age) hash aggregate — the matrix is months², a
    * constant-bounded output at any volume.
    */
  def cohortLtv(orders: DataFrame, userCol: String, dateCol: String,
                amountCol: String): DataFrame = {
    val base = orders
      .filter(col(userCol).isNotNull && col(dateCol).isNotNull)
      .select(col(userCol).as("user"), col(dateCol).cast("date").as("day"),
        col(amountCol).cast("decimal(18,2)").as("amt"))
    val first = base.groupBy(col("user"))
      .agg(min(col("day")).as("__c"))
    base.join(first, "user")
      .withColumn("__cm", year(col("__c")) * 12 + month(col("__c")))
      .groupBy(
        year(col("__c")).cast("long").as("cohort_year"),
        month(col("__c")).cast("long").as("cohort_month"),
        (year(col("day")) * 12 + month(col("day")) - col("__cm"))
          .cast("long").as("age_months"))
      .agg(countDistinct(col("user")).cast("long").as("n_customers"),
        count(lit(1)).cast("long").as("n_orders"),
        round(sum(col("amt")).cast("double"), 2).as("revenue"))
  }

  /** Revenue bridge (NRR waterfall) between ADJACENT integer periods —
    * the MRR-movement card: for every period p, how much of the
    * period-over-period revenue change came from NEW keys (absent in
    * p−1), EXPANSION (both periods, grew), CONTRACTION (both periods,
    * shrank), and CHURN (absent in p). new − churned + expansion −
    * contraction exactly reconciles the period totals — the waterfall
    * identity `CohortsSpec` pins.
    *
    * Exactness: per-(key, period) revenue sums are DECIMAL(18,2)
    * carried as exact cents BIGINTs; every component is a conditional
    * BIGINT sum. Periods must be CONSECUTIVE integers at the grain you
    * mean (month index, week index) — a key with revenue in p and
    * p+2 churns in p+1 and re-enters as NEW in p+2, which is the
    * month-grain NRR convention.
    *
    * Scale shape: one (key, period) hash aggregate — the row-scale
    * pass — then ONE full-outer self equi-join on (key, period+1) and
    * one period aggregate; the phantom max+1 churn-only row the shift
    * creates is trimmed by a one-row max-period attach (q93 shape).
    * Output = #periods.
    */
  def revenueBridge(df: DataFrame, keyCol: String, periodCol: String,
                    valueCol: String): DataFrame = {
    val kv = df
      .filter(col(keyCol).isNotNull && col(periodCol).isNotNull)
      .groupBy(col(keyCol).as("__k"), col(periodCol).cast("long").as("__p"))
      .agg((sum(coalesce(col(valueCol), lit(0)).cast("decimal(18,2)")) *
        100).cast("long").as("__c"))
      .localCheckpoint(true)
    val cur = kv.select(col("__k").as("__kc"), col("__p").as("__pc"),
      col("__c").as("__vc"))
    val prev = kv.select(col("__k").as("__kp"),
      (col("__p") + 1L).as("__pp"), col("__c").as("__vp"))
    cur.join(prev,
        col("__kc") <=> col("__kp") && col("__pc") === col("__pp"),
        "full_outer")
      .select(coalesce(col("__pc"), col("__pp")).as("period"),
        when(col("__vp").isNull, col("__vc")).otherwise(0L).as("__new"),
        when(col("__vc").isNull, col("__vp")).otherwise(0L).as("__chn"),
        when(col("__vc").isNotNull && col("__vp").isNotNull &&
          col("__vc") > col("__vp"), col("__vc") - col("__vp"))
          .otherwise(0L).as("__exp"),
        when(col("__vc").isNotNull && col("__vp").isNotNull &&
          col("__vc") < col("__vp"), col("__vp") - col("__vc"))
          .otherwise(0L).as("__con"),
        when(col("__vp").isNull, 1L).otherwise(0L).as("__nn"),
        when(col("__vc").isNull, 1L).otherwise(0L).as("__nc"))
      .groupBy(col("period"))
      .agg(sum(col("__new")).cast("long").as("new_cents"),
        sum(col("__exp")).cast("long").as("expansion_cents"),
        sum(col("__con")).cast("long").as("contraction_cents"),
        sum(col("__chn")).cast("long").as("churned_cents"),
        sum(col("__nn")).cast("long").as("n_new"),
        sum(col("__nc")).cast("long").as("n_churned"))
      .crossJoin(broadcast(kv.agg(max(col("__p")).as("__mx"))))
      .filter(col("period") <= col("__mx"))
      .drop("__mx")
  }

  /** Segment migration matrix across a wall — the period-over-period
    * customer-movement card ("how many 'loyal' customers lapsed?"):
    * each key gets an activity band from its event count BEFORE the
    * wall and again AFTER, and the matrix counts keys per
    * (band_from, band_to) cell. Band = the number of `thresholds` the
    * count reaches (ascending thresholds; count 0 → band 0 = absent),
    * so bands are deterministic integer cuts — no quantile boundary
    * hazard, and the matrix includes churn (to band 0) and
    * acquisition (from band 0) cells.
    *
    * Scale shape: two filtered (key) hash aggregates over the event
    * scan, one full-outer equi-join on the key, one matrix aggregate
    * — output ≤ (#bands+1)². NULL keys/ordinates are dropped; `wall`
    * compares on the ordinate column's own type (pass a literal of
    * the right type).
    */
  def segmentMigration(events: DataFrame, keyCol: String, ordCol: String,
                       wall: org.apache.spark.sql.Column,
                       thresholds: Seq[Long] = Seq(1L, 2L, 4L, 7L)): DataFrame = {
    require(thresholds.nonEmpty && thresholds == thresholds.sorted &&
      thresholds.distinct == thresholds && thresholds.head >= 1L,
      s"thresholds must be ascending, distinct, >= 1: $thresholds")
    val base = events.filter(col(keyCol).isNotNull && col(ordCol).isNotNull)
    def band(cnt: org.apache.spark.sql.Column) =
      thresholds.map(t => when(cnt >= t, 1L).otherwise(0L)).reduce(_ + _)
    def side(pred: org.apache.spark.sql.Column, tag: String) = base
      .filter(pred)
      .groupBy(col(keyCol).as(s"__k$tag"))
      .agg(count(lit(1)).cast("long").as(s"__c$tag"))
    side(col(ordCol) < wall, "a")
      .join(side(col(ordCol) >= wall, "b"),
        col("__ka") === col("__kb"), "full_outer")
      .groupBy(band(coalesce(col("__ca"), lit(0L))).as("seg_from"),
        band(coalesce(col("__cb"), lit(0L))).as("seg_to"))
      .agg(count(lit(1)).cast("long").as("n_keys"))
  }
}
