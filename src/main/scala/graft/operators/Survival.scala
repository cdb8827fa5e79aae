package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Survival estimation over right-censored durations ("how long do
  * users stay?" when many are still active at observation time):
  * Kaplan–Meier — the survival curve S(t_i) = Π_{j<=i} (1 − d_j/n_j),
  * the one MULTIPLICATIVE running statistic on the surface — and its
  * additive companion Nelson–Aalen, the cumulative hazard
  * H(t_i) = Σ_{j<=i} d_j/n_j. d_j = observed events (churns) at
  * duration t_j, n_j = at-risk count just before t_j; censored
  * observations (event = 0) leave both statistics untouched but
  * shrink the at-risk set — how both estimators extract an unbiased
  * curve from incomplete follow-up.
  *
  * Exactness is the q146 discipline: each per-duration contribution
  * (KM: ln((n_j − d_j)/n_j); NA: d_j/n_j) is exact integers through
  * ONE fixed double operation order, rounded to 6 places
  * (`floor(x·10^6 + 0.5)/10^6`), summed as DECIMAL(18,6) —
  * associative, order-free, engine-portable. KM exponentiates once at
  * the end (then pround6 again); a duration where everyone at risk
  * dies (d_j = n_j, ln 0 = −∞) is carried as a sticky zero FLAG, so
  * the decimal sum never sees an infinity. NA needs neither: its
  * contribution is always finite and its output IS the exact decimal
  * sum.
  *
  * Scale shape: one hash aggregate to the per-duration (d, c) table,
  * whose row count is bounded by DISTINCT durations (days/weeks by
  * nature), then TWO bucketed global prefix sums in the
  * `latenessAudit`/`shuffleRank` style — durations bucket by
  * `duration div bucketWidth`, per-bucket totals collect to the
  * driver (#buckets rows, bounded), exclusive offsets broadcast back,
  * and the within-bucket window partitions by bucket. No
  * single-partition window at any scale; the driver holds two
  * #buckets-row arrays, nothing row-scale. The phase-1 frame is
  * localCheckpoint'd before phase 2 reads it twice (per-bucket
  * contribution sums + the final row-level plan), so the at-risk
  * chain computes once.
  *
  * The `...FromCounts` variants take an ALREADY aggregated
  * (duration, n_events, n_censored) table — the streaming state shape
  * (`streaming.StreamingSurvival` maintains exactly that table
  * additively and derives the live curve through them).
  *
  * Output, one row per distinct duration, ascending: `duration`,
  * `n_risk`, `n_events`, `n_censored`, and `survival` (KM) /
  * `cum_hazard` (NA), doubles at 6 places. Censor-only durations
  * (d_j = 0) emit a row with the statistic carried unchanged — the
  * curve steps only at event times.
  */
object Survival {

  import graft.functions.Rounding.p6

  /** Raw observations → the per-duration (d, c) count table. NULL or
    * negative durations and NULL event flags are dropped.
    */
  private def observationCounts(df: DataFrame, durationCol: String,
                                eventCol: String): DataFrame =
    df.filter(col(durationCol).isNotNull && col(eventCol).isNotNull &&
        col(durationCol) >= 0)
      .select(col(durationCol).cast("long").as("duration"),
        when(col(eventCol).cast("long") =!= 0L, 1L).otherwise(0L).as("__e"))
      .groupBy(col("duration"))
      .agg(sum(col("__e")).cast("long").as("n_events"),
        (count(lit(1)) - sum(col("__e"))).cast("long").as("n_censored"))

  /** Shared two-phase machinery: at-risk counts + the DECIMAL(18,6)
    * running contribution sum, both as bucketed global prefixes.
    * `contrib`/`zFlag` are column expressions over (n_risk, n_events)
    * — bound after n_risk exists. Returns a frame with `duration`,
    * `n_risk`, `n_events`, `n_censored`, `__csum` (inclusive decimal
    * cumsum), `__zany` (inclusive max of the flag) — empty-input safe.
    */
  private def riskWithCumsum(counts: DataFrame, bucketWidth: Long,
                             contrib: Column, zFlag: Column): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val spark = counts.sparkSession
    import spark.implicits._
    // checkpoint the duration-bounded count table BEFORE the phase-1
    // driver collect: without it the row-scale observation aggregate
    // feeding `counts` executes twice (once for btot, once for risk) —
    // the Metrics.rankAuc shape, review finding r10
    val grouped = counts
      .filter(col("duration").isNotNull && col("duration") >= 0)
      .withColumn("__b", (col("duration") / lit(bucketWidth)).cast("long"))
      .localCheckpoint(true)
    // phase 1: at-risk counts. Exclusive per-bucket (d+c) offsets via a
    // #buckets-row driver prefix (the latenessAudit pattern); inside a
    // bucket, an ordinary partitioned window finishes the prefix.
    val btot = grouped.groupBy(col("__b"))
      .agg(sum(col("n_events") + col("n_censored")).cast("long").as("__s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    var accN = 0L
    val offs = btot.map { case (b, s) => val o = accN; accN += s; (b, o) }
    val nTotal = accN
    if (nTotal == 0L)
      return grouped.limit(0).select(col("duration"),
        lit(0L).as("n_risk"), col("n_events"), col("n_censored"),
        lit(null).cast("decimal(18,6)").as("__csum"), lit(0L).as("__zany"),
        lit(null).cast("decimal(18,6)").as("__contrib"), lit(0L).as("__z"))
    val offDf = broadcast(offs.toSeq.toDF("__b", "__off"))
    val wPrior = Window.partitionBy(col("__b")).orderBy(col("duration"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val risk = grouped.join(offDf, Seq("__b"))
      .withColumn("n_risk", lit(nTotal) - (col("__off") +
        coalesce(sum(col("n_events") + col("n_censored")).over(wPrior),
          lit(0L))))
      .withColumn("__z", zFlag)
      .withColumn("__contrib", contrib)
      .localCheckpoint(true)
    // phase 2: the contribution running sum (and the sticky flag)
    // across buckets — same driver-prefix shape, DECIMAL-exact.
    val ctot = risk.groupBy(col("__b"))
      .agg(sum(col("__contrib")).cast("decimal(18,6)").as("__cs"),
        max(col("__z")).as("__zs"))
      .collect()
      .map(r => (r.getLong(0), Option(r.getDecimal(1))
        .fold(BigDecimal(0))(BigDecimal(_)), r.getLong(2)))
      .sortBy(_._1)
    var accC = BigDecimal(0)
    var accZ = 0L
    val offs2 = ctot.map { case (b, cs, zs) =>
      val o = (b, accC, accZ); accC += cs; accZ = math.max(accZ, zs); o
    }
    val off2Df = broadcast(offs2.toSeq.toDF("__b", "__coff", "__zoff")
      .withColumn("__coff", col("__coff").cast("decimal(18,6)")))
    val wCum = Window.partitionBy(col("__b")).orderBy(col("duration"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    risk.join(off2Df, Seq("__b"))
      .withColumn("__csum",
        (col("__coff") + sum(col("__contrib")).over(wCum))
          .cast("decimal(18,6)"))
      .withColumn("__zany", greatest(col("__zoff"), max(col("__z")).over(wCum)))
      .select(col("duration"), col("n_risk"), col("n_events"),
        col("n_censored"), col("__csum"), col("__zany"),
        col("__contrib"), col("__z"))
  }

  // factor ln((n−d)/n): subtraction in BIGINT, ONE double division,
  // one ln, pround6 → DECIMAL(18,6). d = n (nobody survives the step)
  // flags sticky-zero instead of producing −∞.
  private def kmContrib: Column =
    when(col("n_risk") === col("n_events"), lit(0.0))
      .otherwise(floor(
        log((col("n_risk") - col("n_events")).cast("double") /
          col("n_risk").cast("double")) * 1e6 + 0.5) / 1e6)
      .cast("decimal(18,6)")

  /** Kaplan–Meier over an already-aggregated
    * (duration, n_events, n_censored) table.
    */
  def kaplanMeierFromCounts(counts: DataFrame,
                            bucketWidth: Long = 4096L): DataFrame =
    riskWithCumsum(counts, bucketWidth, kmContrib,
      when(col("n_risk") === col("n_events"), 1L).otherwise(0L))
      .select(col("duration"), col("n_risk"), col("n_events"),
        col("n_censored"),
        when(col("__zany") === 1L, lit(0.0))
          .otherwise(floor(exp(col("__csum").cast("double")) * 1e6 + 0.5) / 1e6)
          .as("survival"))

  /** @param durationCol non-negative integral duration (days, weeks —
    *        any unit; distinct values bound the output size)
    * @param eventCol 1/true = event observed (churned), 0/false =
    *        right-censored (still active at cutoff)
    * @param bucketWidth duration units per prefix bucket; the driver
    *        holds one (offset, flag) row per OCCUPIED bucket
    */
  def kaplanMeier(df: DataFrame, durationCol: String, eventCol: String,
                  bucketWidth: Long = 4096L): DataFrame =
    kaplanMeierFromCounts(observationCounts(df, durationCol, eventCol),
      bucketWidth)

  /** Nelson–Aalen cumulative hazard over an already-aggregated
    * (duration, n_events, n_censored) table: the ADDITIVE survival
    * statistic — `cum_hazard` is the exact DECIMAL sum of pround6'd
    * d_j/n_j contributions, no exp and no infinity path.
    */
  def nelsonAalenFromCounts(counts: DataFrame,
                            bucketWidth: Long = 4096L): DataFrame =
    riskWithCumsum(counts, bucketWidth,
      (floor(col("n_events").cast("double") / col("n_risk").cast("double")
        * 1e6 + 0.5) / 1e6).cast("decimal(18,6)"),
      lit(0L))
      .select(col("duration"), col("n_risk"), col("n_events"),
        col("n_censored"),
        col("__csum").cast("double").as("cum_hazard"))

  /** Nelson–Aalen from raw observations; same parameters as
    * [[kaplanMeier]].
    */
  def nelsonAalen(df: DataFrame, durationCol: String, eventCol: String,
                  bucketWidth: Long = 4096L): DataFrame =
    nelsonAalenFromCounts(observationCounts(df, durationCol, eventCol),
      bucketWidth)

  /** Two-arm log-rank test over an already-aggregated per-duration
    * arm-count table (`duration`, `d_a`, `c_a`, `d_b`, `c_b`) — "do
    * the two cohorts churn at the same rate?", the calibrated
    * comparison the two KM curves (q232 per arm) only eyeball. At
    * each event time: observed arm-A events d_a vs the hypergeometric
    * expectation d·n_a/n and variance d·(n_a/n)·(n_b/n)·(n−d)/(n−1);
    * chi² = (O_A − E_A)² / V with one degree of freedom.
    *
    * Exactness is the class discipline: at-risk counts are exact
    * BIGINTs from the bucketed driver-prefix (no single-partition
    * window); each per-duration E and V contribution is exact
    * integers through one fixed double operation order, pround6, and
    * summed as DECIMAL(18,6) — so O_A − E_A and V are DECIMAL-exact,
    * and `significant` compares (O_A − E_A)² > 3.841459·V entirely in
    * DECIMAL (3.841459 = the χ²₁ 5% critical value, exact at 6
    * places) — the rounded chi² double is never load-bearing.
    * Degenerate inputs (no events, or V = 0) report chi² = 0, not
    * significant.
    *
    * Output is ONE row: `n_a`, `n_b` (cohort sizes), `o_a`, `o_b`
    * (observed events), `e_a` (expected arm-A events, 6 places),
    * `chi2`, `significant`.
    *
    * The FromCounts split is the streaming seam: the per-duration arm
    * counts are ADDITIVE, so two `streaming.StreamingSurvival` states
    * (one per arm) joined on duration feed this closing directly —
    * the live test and the one-shot test share this implementation.
    * That join is typically FULL OUTER (a duration with events in only
    * one arm), so NULL arm counts are coalesced to 0 here — the same
    * missing-key-means-zero convention every full-outer streaming
    * merge in this codebase uses. Without it a NULL d_a would turn
    * __d = d_a + d_b NULL and silently drop that duration's E and V
    * contribution while its events still count in o_a/o_b — a biased
    * chi² with no error.
    *
    * One-arm inputs (every observation in arm A, or in arm B) are a
    * DEGENERATE CARD, not an empty frame: the contract above says one
    * row, so the single row carries the populated n/o columns with
    * e_a = o_a (the one-arm expectation is trivially the observation),
    * chi2 = 0, significant = false. A caller doing `.head` on a
    * one-arm slice gets the honest "no comparison possible" card
    * instead of a NoSuchElementException.
    */
  def logRankFromCounts(counts: DataFrame,
                        bucketWidth: Long = 4096L): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val spark = counts.sparkSession
    import spark.implicits._
    val grouped = counts
      .filter(col("duration").isNotNull && col("duration") >= 0)
      .withColumn("d_a", coalesce(col("d_a").cast("long"), lit(0L)))
      .withColumn("c_a", coalesce(col("c_a").cast("long"), lit(0L)))
      .withColumn("d_b", coalesce(col("d_b").cast("long"), lit(0L)))
      .withColumn("c_b", coalesce(col("c_b").cast("long"), lit(0L)))
      .withColumn("__b", (col("duration") / lit(bucketWidth)).cast("long"))
      .localCheckpoint(true)
    // phase 1: per-arm at-risk chains — one collect carries BOTH arms'
    // bucket totals (the riskWithCumsum shape, doubled)
    val btot = grouped.groupBy(col("__b"))
      .agg(sum(col("d_a") + col("c_a")).cast("long").as("__sa"),
        sum(col("d_b") + col("c_b")).cast("long").as("__sb"),
        sum(col("d_a")).cast("long").as("__da"),
        sum(col("d_b")).cast("long").as("__db"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    var accA = 0L; var accB = 0L
    val offs = btot.map { case (b, sa, sb, _, _) =>
      val o = (b, accA, accB); accA += sa; accB += sb; o
    }
    val (totA, totB) = (accA, accB)
    if (totA == 0L || totB == 0L) {
      // one-arm (or empty) input: the contract's single row, as a
      // degenerate card — no comparison possible, so e_a = o_a,
      // chi2 = 0, never significant (see scaladoc)
      val (oa, ob) = (btot.map(_._4).sum, btot.map(_._5).sum)
      return Seq((totA, totB, oa, ob)).toDF("n_a", "n_b", "o_a", "o_b")
        .select(col("n_a"), col("n_b"), col("o_a"), col("o_b"),
          col("o_a").cast("double").as("e_a"), lit(0.0).as("chi2"),
          lit(false).as("significant"))
    }
    val offDf = broadcast(offs.toSeq.toDF("__b", "__offa", "__offb"))
    val wPrior = Window.partitionBy(col("__b")).orderBy(col("duration"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val risk = grouped.join(offDf, Seq("__b"))
      .withColumn("__na", lit(totA) - (col("__offa") +
        coalesce(sum(col("d_a") + col("c_a")).over(wPrior), lit(0L))))
      .withColumn("__nb", lit(totB) - (col("__offb") +
        coalesce(sum(col("d_b") + col("c_b")).over(wPrior), lit(0L))))
      .withColumn("__d", col("d_a") + col("d_b"))
      .withColumn("__n", col("__na") + col("__nb"))
    // per-duration contributions: exact integers → ONE fixed double
    // operation order → pround6 → DECIMAL(18,6) (order-free sums)
    val eContrib = "CASE WHEN __d = 0 THEN 0.0 ELSE " +
      "CAST(__d AS DOUBLE) * CAST(__na AS DOUBLE) / CAST(__n AS DOUBLE) END"
    val vContrib = "CASE WHEN __d = 0 OR __n <= 1 THEN 0.0 ELSE " +
      "CAST(__d AS DOUBLE) * (CAST(__na AS DOUBLE) / CAST(__n AS DOUBLE))" +
      " * (CAST(__nb AS DOUBLE) / CAST(__n AS DOUBLE))" +
      " * (CAST(__n - __d AS DOUBLE) / CAST(__n - 1 AS DOUBLE)) END"
    val agg = risk.agg(
      sum(col("d_a")).cast("long").as("o_a"),
      sum(col("d_b")).cast("long").as("o_b"),
      sum(p6(expr(eContrib)).cast("decimal(18,6)")).as("__ea"),
      sum(p6(expr(vContrib)).cast("decimal(18,6)")).as("__v"))
    val dd = "(CAST(o_a AS DECIMAL(18,6)) - __ea)"
    agg.select(lit(totA).as("n_a"), lit(totB).as("n_b"),
      col("o_a"), col("o_b"),
      col("__ea").cast("double").as("e_a"),
      p6(expr(s"""CASE WHEN __v = 0 THEN 0.0
        ELSE CAST($dd AS DOUBLE) * CAST($dd AS DOUBLE)
          / CAST(__v AS DOUBLE) END""")).as("chi2"),
      expr(s"""CASE WHEN __v = 0 THEN false
        ELSE $dd * $dd > CAST(3.841459 AS DECIMAL(7,6)) * __v
        END""").as("significant"))
  }

  /** Log-rank from raw observations: `armCol` (0/1 or boolean) splits
    * the cohorts; other parameters as [[kaplanMeier]].
    */
  def logRank(df: DataFrame, durationCol: String, eventCol: String,
              armCol: String, bucketWidth: Long = 4096L): DataFrame = {
    val arm = when(col(armCol).cast("long") =!= 0L, 1L).otherwise(0L)
    val e = when(col(eventCol).cast("long") =!= 0L, 1L).otherwise(0L)
    logRankFromCounts(
      df.filter(col(durationCol).isNotNull && col(eventCol).isNotNull &&
          col(armCol).isNotNull && col(durationCol) >= 0)
        .select(col(durationCol).cast("long").as("duration"),
          arm.as("__arm"), e.as("__e"))
        .groupBy(col("duration"))
        .agg(sum((lit(1L) - col("__arm")) * col("__e")).cast("long").as("d_a"),
          sum((lit(1L) - col("__arm")) * (lit(1L) - col("__e")))
            .cast("long").as("c_a"),
          sum(col("__arm") * col("__e")).cast("long").as("d_b"),
          sum(col("__arm") * (lit(1L) - col("__e"))).cast("long").as("c_b")),
      bucketWidth)
  }

  /** Median survival time: the smallest duration where the KM curve
    * reaches S(t) ≤ 0.5 — "by what day has HALF the cohort churned?",
    * the headline number over q232's full curve. NULL when the curve
    * never crosses 0.5 inside the observed window (fewer than half
    * churn — exactly the situation [[rmst]] is for; read them
    * together). Computed as ONE order-free aggregate over the
    * [[kaplanMeier]] output — min() needs no curve ordering.
    * Output ONE row: `n_obs`, `n_events`, `median_duration`.
    */
  def medianSurvival(df: DataFrame, durationCol: String, eventCol: String,
                     bucketWidth: Long = 4096L): DataFrame =
    kaplanMeier(df, durationCol, eventCol, bucketWidth)
      .agg(
        sum(col("n_events") + col("n_censored")).cast("long").as("__n"),
        sum(col("n_events")).cast("long").as("__e"),
        min(when(col("survival") <= 0.5, col("duration")))
          .cast("long").as("median_duration"))
      .select(coalesce(col("__n"), lit(0L)).as("n_obs"),
        coalesce(col("__e"), lit(0L)).as("n_events"),
        col("median_duration"))

  /** Restricted mean survival time: RMST(τ) = ∫₀^τ S(t)dt — "average
    * days retained inside the first τ days", the one-number summary a
    * cohort comparison wants when a median survival is undefined
    * (fewer than half churn) and a full curve is too much. Computed
    * WITHOUT any curve-ordering window via the jump decomposition
    *   ∫₀^τ S dt = τ − Σ_{t_i < τ} J_i·(τ − t_i),
    * where J_i = S(t_{i−1}) − S(t_i) is the KM step at t_i — a plain
    * SUM, order-free, so the only ordered machinery is the
    * [[kaplanMeier]] prefix chain itself. S(t_{i−1}) falls out of the
    * same chain as exp(csum_i − contrib_i): no lag, no self-join.
    *
    * Exactness: S_prev/S_cur are pround6'd exp's of the exact
    * DECIMAL(18,6) log-space prefix (the q232 discipline, identical
    * bits cross-engine); each term pround6(J·(τ−t)) accumulates as
    * DECIMAL(28,6); the output is τ minus that exact sum, as a
    * double. A duration where everyone dies (the sticky-zero flag —
    * provably only possible at the LAST event row) takes S_cur = 0.
    * Empty input reports n_obs = 0 with NULL rmst.
    *
    * Output, ONE row: `tau`, `n_obs`, `n_events`, `rmst`.
    */
  def rmst(df: DataFrame, durationCol: String, eventCol: String,
           tau: Long, bucketWidth: Long = 4096L): DataFrame = {
    require(tau > 0, s"tau must be positive: $tau")
    val f = riskWithCumsum(observationCounts(df, durationCol, eventCol),
      bucketWidth, kmContrib,
      when(col("n_risk") === col("n_events"), 1L).otherwise(0L))
    val sPrev = when(col("__zany") === 1L && col("__z") === 0L, lit(0.0))
      .otherwise(floor(
        exp((col("__csum") - col("__contrib")).cast("double"))
          * 1e6 + 0.5) / 1e6)
    val sCur = when(col("__zany") === 1L, lit(0.0))
      .otherwise(floor(exp(col("__csum").cast("double")) * 1e6 + 0.5) / 1e6)
    val term = (floor((sPrev - sCur) *
      (lit(tau) - col("duration")).cast("double") * 1e6 + 0.5) / 1e6)
      .cast("decimal(28,6)")
    f.agg(
      sum(col("n_events") + col("n_censored")).cast("long").as("__n"),
      sum(col("n_events")).cast("long").as("__e"),
      sum(when(col("duration") < tau, term)
        .otherwise(lit(0).cast("decimal(28,6)"))).as("__jsum"))
      .select(lit(tau).as("tau"),
        coalesce(col("__n"), lit(0L)).as("n_obs"),
        coalesce(col("__e"), lit(0L)).as("n_events"),
        when(col("__n").isNotNull,
          (lit(tau).cast("decimal(28,6)") - col("__jsum")).cast("double"))
          .as("rmst"))
  }
}
