package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample an irregular event stream onto
  * a fixed per-key grid, carrying the latest observation forward into
  * each slot (as-of backward fill) — the transform that turns raw
  * events into the evenly-spaced series a dashboard or feature store
  * consumes. The reference's 15-minute snapshot slots are the same
  * idea applied at ingest time; this is the query-side generalization.
  *
  * Grid slots are epoch-aligned multiples of `stepSeconds` spanning
  * each key's observed range (long modular arithmetic — no float
  * division, so slot boundaries are engine-exact). The fill reuses
  * `AsOfJoin.backward` on MICROSECOND epochs: grid rows are the left
  * side, so cost is O(slots + events) through the one shared as-of
  * window, per key — slots before a key's first event stay null (there
  * is nothing to carry), which the left-join semantics give for free.
  */
object Resample {

  /** One row per (key, slot) with `valCols` (right-name -> out-name)
    * carried forward from the latest event at or before the slot.
    * Output grid column: `slot` = epoch SECONDS of the slot boundary.
    */
  /** Exponentially weighted moving average per group over an ordered
    * series: ewma = fold(acc*(1-alpha) + x*alpha), seeded with the
    * first value — the smoothing baseline behind "is today's volume
    * anomalous" alerts.
    *
    * Determinism: the fold runs over an array collected and sorted by
    * the order column, so accumulation order is TOTAL and identical
    * on both engines; with alpha = 0.5 (the default) each step is two
    * exact halvings and one IEEE add — bit-reproducible. A recursive
    * definition has no order-free aggregate form; the per-group array
    * is the honest shape, and it bounds state at (groups x series
    * length), e.g. types x days — collect only pre-aggregated series,
    * never raw events.
    */
  def ewma(series: DataFrame, groupCol: String, ordCol: String,
           valCol: String, alpha: Double = 0.5): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1]: $alpha")
    val folded = series.groupBy(col(groupCol))
      .agg(count(lit(1)).cast("long").as("n_points"),
        array_sort(collect_list(
          struct(col(ordCol), col(valCol).cast("double").as(valCol))))
          .as("__a"))
      .withColumn("__v", transform(col("__a"), x => x.getField(valCol)))
    folded.select(col(groupCol), col("n_points"),
      element_at(col("__v"), -1).as("last_val"),
      aggregate(
        slice(col("__v"), lit(2), greatest(size(col("__v")) - 1, lit(0))),
        element_at(col("__v"), 1),
        (acc, x) => acc * (1.0 - alpha) + x * alpha).as("ewma"))
  }

  /** Holt double-exponential smoothing per group — [[ewma]] with a
    * TREND component: level l' = α·x + (1−α)·(l + b), trend
    * b' = β·(l' − l) + (1−β)·b, seeded l₁ = x₁, b₁ = 0; the one-step
    * forecast is l + b, which [[ewma]] (flat next = level) cannot
    * express for a drifting series.
    *
    * Determinism is [[ewma]]'s contract: the fold runs over the
    * sorted per-group array, so accumulation order is TOTAL; with
    * α = β = 0.5 (the defaults) every step is halvings and IEEE adds
    * in one fixed operation order — bit-reproducible, and the oracle
    * replays the identical ops as a recursive CTE. Same state bound:
    * groups × series length, pre-aggregated series only.
    */
  def holt(series: DataFrame, groupCol: String, ordCol: String,
           valCol: String, alpha: Double = 0.5,
           beta: Double = 0.5): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1]: $alpha")
    require(beta > 0 && beta <= 1, s"beta must be in (0,1]: $beta")
    val folded = series.groupBy(col(groupCol))
      .agg(count(lit(1)).cast("long").as("n_points"),
        array_sort(collect_list(
          struct(col(ordCol), col(valCol).cast("double").as(valCol))))
          .as("__a"))
      .withColumn("__v", transform(col("__a"), x => x.getField(valCol)))
    // newLevel appears in BOTH state fields; it is recomputed
    // verbatim in the trend slot (deterministic expressions give
    // identical bits) exactly as the oracle's recursive CTE must
    def newLevel(acc: Column, x: Column) =
      lit(alpha) * x + lit(1.0 - alpha) * (acc.getField("l") + acc.getField("t"))
    folded.select(col(groupCol), col("n_points"),
      element_at(col("__v"), -1).as("last_val"),
      aggregate(
        slice(col("__v"), lit(2), greatest(size(col("__v")) - 1, lit(0))),
        struct(element_at(col("__v"), 1).as("l"), lit(0.0).as("t")),
        (acc, x) => struct(
          newLevel(acc, x).as("l"),
          (lit(beta) * (newLevel(acc, x) - acc.getField("l")) +
            lit(1.0 - beta) * acc.getField("t")).as("t")))
        .as("__s"))
      .select(col(groupCol), col("n_points"), col("last_val"),
        col("__s.l").as("level"), col("__s.t").as("trend"),
        (col("__s.l") + col("__s.t")).as("forecast"))
  }

  /** Per-group OLS trend slope over an integer-x series — "is this
    * event type's daily volume rising?" as a number, engine-exact:
    * slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) where y sums run in
    * DECIMAL(18,2) (order-independent, exact) and x/x² sums in
    * BIGINT, so both operands of the ONE final division are exact and
    * the quotient is bit-identical on any engine. A constant-x group
    * (denominator 0) reports slope 0.
    *
    * Scale shape: a single hash aggregate of five sums — no windows,
    * no collected series (unlike `ewma`, OLS has a closed form).
    * Overflow bound: nΣx² must stay under 2^63 — with day-index x
    * (~2·10⁴) that holds to ~10⁸ points per group; recenter x
    * upstream if your series is longer.
    */
  def trendSlope(series: DataFrame, groupCol: String, xCol: String,
                 yCol: String): DataFrame = {
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("decimal(18,2)")
    val agg = series.groupBy(col(groupCol))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(x).cast("long").as("__sx"),
        sum(y).as("__sy"),
        sum(y * x).as("__sxy"),
        sum(x * x).cast("long").as("__sxx"))
    val num = (col("n") * col("__sxy") - col("__sx") * col("__sy"))
      .cast("double")
    val den = (col("n") * col("__sxx") - col("__sx") * col("__sx"))
      .cast("double")
    agg.select(col(groupCol), col("n"),
      when(den =!= 0.0, num / den).otherwise(lit(0.0)).as("slope"))
  }

  /** Lag-1 autocorrelation per group over an integer-indexed,
    * integer-valued series — the seasonality/momentum screen read next
    * to `trendSlope` ("volume is rising" vs "volume echoes yesterday").
    * Pearson r over the (y_x, y_{x+1}) pairs:
    * r = (nΣab − ΣaΣb) / (√(nΣa²−(Σa)²)·√(nΣb²−(Σb)²)).
    *
    * Engine-exact: pairs come from an equi-join on (group, x+1) — one
    * posting per (group, x), so the join can never go quadratic — all
    * six sums are BIGINT-exact, and the final expression is two
    * IEEE-exact sqrts and one division over exactly-representable
    * operands with the operand order mirrored in the oracle. Groups
    * with a constant arm (zero variance) report r1 = 0.
    *
    * Overflow bound (same honesty as `trendSlope`): n·Σy² must stay
    * under 2^63 — holds to ~10⁶ points per group at y ≈ 10⁶; recenter
    * y (subtract a per-group baseline upstream) past that.
    */
  def autocorr1(series: DataFrame, groupCol: String, xCol: String,
                yCol: String): DataFrame = {
    val cur = series.select(col(groupCol).as("__g"),
      col(xCol).cast("long").as("__x"), col(yCol).cast("long").as("__y"))
    val nxt = cur.select(col("__g").as("__g2"),
      (col("__x") - 1L).as("__x2"), col("__y").as("__y2"))
    val agg = cur
      .join(nxt, col("__g") === col("__g2") && col("__x") === col("__x2"))
      .groupBy(col("__g"))
      .agg(count(lit(1)).cast("long").as("n_pairs"),
        sum(col("__y")).cast("long").as("__sa"),
        sum(col("__y2")).cast("long").as("__sb"),
        sum(col("__y") * col("__y2")).cast("long").as("__sab"),
        sum(col("__y") * col("__y")).cast("long").as("__saa"),
        sum(col("__y2") * col("__y2")).cast("long").as("__sbb"))
    val num = (col("n_pairs") * col("__sab") - col("__sa") * col("__sb"))
      .cast("double")
    val da = (col("n_pairs") * col("__saa") - col("__sa") * col("__sa"))
      .cast("double")
    val db = (col("n_pairs") * col("__sbb") - col("__sb") * col("__sb"))
      .cast("double")
    agg.select(col("__g").as(groupCol), col("n_pairs"),
      when(da > 0.0 && db > 0.0, num / (sqrt(da) * sqrt(db)))
        .otherwise(lit(0.0)).as("r1"))
  }

  /** Lead-lag cross-correlation between TWO integer-indexed,
    * integer-valued series — which one moves first, and by how many
    * steps. For every lag ℓ in [-maxLag, maxLag], the Pearson r over
    * pairs (x at t, y at t+ℓ): the lag where |r| peaks is the lead
    * time ("shipments echo orders four days later"). The two-series
    * generalization of [[autocorr1]] (which is crossCorr of a series
    * with itself restricted to ℓ = 1).
    *
    * Engine-exact: pairs come from an equi-join of the lag-exploded x
    * series against y on the shifted index — one posting per (ord),
    * never quadratic; all six sums are BIGINT-exact per lag and the
    * closing expression mirrors [[autocorr1]]'s operand order. Lags
    * with a constant arm report r = 0.
    *
    * Scale shape: the explode is (2·maxLag+1)× the PRE-AGGREGATED x
    * series (the [[ewma]] contract: feed daily partials, not raw
    * events), so shuffle payload is lags × calendar-bounded keys; one
    * hash aggregate per lag group closes it. Overflow honesty as
    * [[trendSlope]]: n·Σy² under 2⁶³.
    */
  def crossCorr(xs: DataFrame, ys: DataFrame, ordCol: String,
                xCol: String, yCol: String, maxLag: Int): DataFrame = {
    require(maxLag >= 0, s"maxLag must be >= 0: $maxLag")
    val lags = typedLit((-maxLag to maxLag).map(_.toLong))
    val xl = xs
      .filter(col(ordCol).isNotNull && col(xCol).isNotNull)
      .select(col(ordCol).cast("long").as("__o"),
        col(xCol).cast("long").as("__a"))
      .select(col("__o"), col("__a"), explode(lags).as("lag"))
    val yr = ys
      .filter(col(ordCol).isNotNull && col(yCol).isNotNull)
      .select(col(ordCol).cast("long").as("__o2"),
        col(yCol).cast("long").as("__b"))
    val agg = xl
      .join(yr, col("__o") + col("lag") === col("__o2"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).cast("long").as("n_pairs"),
        sum(col("__a")).cast("long").as("__sa"),
        sum(col("__b")).cast("long").as("__sb"),
        sum(col("__a") * col("__b")).cast("long").as("__sab"),
        sum(col("__a") * col("__a")).cast("long").as("__saa"),
        sum(col("__b") * col("__b")).cast("long").as("__sbb"))
    val num = (col("n_pairs") * col("__sab") - col("__sa") * col("__sb"))
      .cast("double")
    val da = (col("n_pairs") * col("__saa") - col("__sa") * col("__sa"))
      .cast("double")
    val db = (col("n_pairs") * col("__sbb") - col("__sb") * col("__sb"))
      .cast("double")
    agg.select(col("lag"), col("n_pairs"),
      when(da > 0.0 && db > 0.0, num / (sqrt(da) * sqrt(db)))
        .otherwise(lit(0.0)).as("r"))
  }

  def gapFill(events: DataFrame, keyCol: String, tsCol: String,
              valCols: Map[String, String], stepSeconds: Long): DataFrame = {
    require(stepSeconds > 0, s"step must be positive: $stepSeconds")
    val stepUs = stepSeconds * 1000000L
    // null-timestamp events carry no position on the time axis: they
    // must not enter the as-of union, where the ascending window would
    // order them FIRST and their payload would backfill slots before
    // the key's first real event (and the portable ASOF oracle would
    // disagree — NULL never satisfies its inequality)
    val ev = events
      .withColumn("__tus", unix_micros(col(tsCol)))
      .filter(col("__tus").isNotNull)
      .select((col(keyCol) +: col("__tus") +: valCols.keys.toSeq.sorted.map(col)): _*)
    // FLOOR alignment (pmod is a floor-mod): pre-1970 timestamps align
    // to the slot boundary at-or-before the event, same as positive
    // ones — the oracle must floor too (truncating `%` diverges on
    // negative epochs). The final `div 1000000` below is exact (slots
    // are whole-second multiples), so truncate-vs-floor is moot there.
    def align(c: org.apache.spark.sql.Column) = c - pmod(c, lit(stepUs))
    // grid slots explode in bounded chunks: a single sequence() per key
    // materializes the whole range as one in-row array — at minute
    // steps over years that is millions of elements in ONE row, the
    // same unsplittable-hot-key shape the bucketed running sums avoid.
    // Chunked, no intermediate row holds more than `chunk` slots.
    val chunk = 4096L
    val grid = ev.groupBy(col(keyCol))
      .agg(min(col("__tus")).as("__mn"), max(col("__tus")).as("__mx"))
      .withColumn("__n",
        floor((align(col("__mx")) - align(col("__mn"))) / stepUs).cast("long") + 1L)
      .withColumn("__c",
        explode(sequence(lit(0L),
          floor((col("__n") - 1L) / chunk).cast("long"), lit(1L))))
      .withColumn("__i", explode(sequence(
        col("__c") * chunk,
        least(col("__c") * chunk + (chunk - 1L), col("__n") - 1L), lit(1L))))
      .select(col(keyCol),
        (align(col("__mn")) + col("__i") * stepUs).as("__tus"))
    AsOfJoin.backward(grid, ev, Seq(keyCol), "__tus", valCols)
      .withColumn("slot", expr("__tus div 1000000"))
      .select((col(keyCol) +: col("slot") +: valCols.values.toSeq.sorted.map(col)): _*)
  }

  /** Exponentially time-decayed score per key — the recency-weighted
    * leaderboard/feature ("engagement that fades with a half-life"):
    *   decayed = Σ value · 2^((t − T) / halfLife)
    * with T = the corpus' max event time, so the newest event counts
    * fully and one halfLife earlier counts half. T is attached as a
    * ONE-ROW broadcast aggregate — a fixed reference makes the score a
    * pure function of the data (re-runs reproduce it; a wall-clock
    * "now" would not).
    *
    * Exactness: each event's contribution is ONE fixed-order double
    * expression — exp((Δus / halfLifeUs) · ln 2) with both constants
    * embedded as exact literals — rounded to 6 places and summed as
    * DECIMAL(18,6) (associative; the q146 discipline), so per-key
    * scores and any downstream top-k ordering are engine-exact.
    *
    * Scale shape: one row-scale scan with the decay in the projection,
    * one hash aggregate on the key; the max-time attach is the q93
    * one-row broadcast shape.
    */
  def decayedScores(events: DataFrame, keyCol: String, tsCol: String,
                    valCol: String, halfLifeDays: Double): DataFrame = {
    require(halfLifeDays > 0, s"halfLifeDays must be positive: $halfLifeDays")
    val halfUs = halfLifeDays * 86400.0e6
    val ln2 = math.log(2.0)
    val tmax = events.agg(max(unix_micros(col(tsCol))).as("__tmax"))
    val contrib = col(valCol).cast("double") *
      exp((col("__tus") - col("__tmax")).cast("double") / lit(halfUs) * lit(ln2))
    events
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull &&
        col(valCol).isNotNull)
      .select(col(keyCol), col(valCol), unix_micros(col(tsCol)).as("__tus"))
      .crossJoin(broadcast(tmax))
      .withColumn("__c",
        graft.functions.Rounding.p6(contrib).cast("decimal(18,6)"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).cast("long").as("n_events"),
        sum(col("__c")).cast("double").as("decayed"))
  }

  /** Trailing-window deviation screen — the volume-anomaly monitor
    * ("did today's count break from its own recent past?"): each
    * observation is scored against the SUM of its `window` preceding
    * observations within the group, in exact integer basis points:
    *   dev_bp = (v · window · 10⁴) div trailing_sum − 10⁴
    * (0 = exactly on trend, +10000 = double, −10000 floor = silence).
    * No doubles anywhere, so the flag thresholding downstream is
    * engine-exact; rows without a full trailing window (the first
    * `window` per group) or with a zero trailing sum are dropped —
    * a ratio against nothing is noise, not signal.
    *
    * Scale shape: one window pass partitioned by group over the
    * CALENDAR-bounded series (the ewma/theilSen pre-aggregation
    * contract) — never raw events.
    *
    * Overflow contract: v · window · 10⁴ < 2^63 (a trillion-count day
    * at window 400 is still inside).
    */
  def trailingDeviation(series: DataFrame, groupCol: String,
                        ordCol: String, valCol: String,
                        window: Int = 7): DataFrame = {
    require(window >= 2 && window <= 400, s"window in [2,400]: $window")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(ordCol))
      .rowsBetween(-window, -1)
    series
      .select(col(groupCol), col(ordCol), col(valCol).cast("long").as("n"))
      .withColumn("trailing_sum", sum(col("n")).over(w).cast("long"))
      .withColumn("__tn", count(col("n")).over(w))
      .filter(col("__tn") === window && col("trailing_sum") > 0L)
      .select(col(groupCol), col(ordCol), col("n"), col("trailing_sum"),
        (call_function("div", col("n") * lit(window.toLong) * 10000L,
          col("trailing_sum")) - 10000L).as("dev_bp"))
  }

  /** Theil–Sen robust trend per group — `trendSlope`'s outlier-immune
    * sibling: the MEDIAN of all pairwise slopes (y_j−y_i)/(x_j−x_i),
    * x_i < x_j. One wild day barely moves it where OLS swings; reading
    * both slopes apart flags that outlier day.
    *
    * Exactness: each pairwise slope is exact-integer differences
    * through ONE double division; the median is order-statistics on
    * those doubles (window per group), with the even-count midpoint
    * (a+b)/2 — commutative, engine-exact — and the result rounded to
    * 6 places.
    *
    * Scale contract (same as `ewma`'s): inputs are PRE-AGGREGATED
    * per-(group, x) series — days, weeks — so the within-group pair
    * join is |series|² over a calendar-bounded count, never raw-event
    * quadratic; `require`-guarded upstream by the daily aggregate
    * shape. The pair join is an equi-join on the group key; windows
    * partition by group.
    */
  def theilSen(series: DataFrame, groupCol: String, xCol: String,
               yCol: String): DataFrame = {
    val a = series.select(col(groupCol).as("__g"),
      col(xCol).cast("long").as("__x1"), col(yCol).cast("long").as("__y1"))
    val b = series.select(col(groupCol).as("__g"),
      col(xCol).cast("long").as("__x2"), col(yCol).cast("long").as("__y2"))
    val slopes = a.join(b, Seq("__g"))
      .filter(col("__x1") < col("__x2"))
      .select(col("__g"),
        ((col("__y2") - col("__y1")).cast("double") /
          (col("__x2") - col("__x1")).cast("double")).as("__s"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__g")).orderBy(col("__s"))
    val ranked = slopes
      .withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("__m",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("__g"))).cast("long"))
    ranked
      .filter(col("__rn") === call_function("div", col("__m") + 1L, lit(2L)) ||
        col("__rn") === call_function("div", col("__m"), lit(2L)) + 1L)
      .groupBy(col("__g"))
      .agg(max(col("__m")).as("n_pairs"),
        graft.functions.Rounding.p6(sum(col("__s")) / count(lit(1)))
          .as("slope"))
      .select(col("__g").as(groupCol), col("n_pairs"), col("slope"))
  }

  /** Per-group log-log OLS — the elasticity fit: the slope of
    * ln(y) on ln(x) is the % change in y per % change in x
    * ("demand drops 1.2% per 1% price increase" = elasticity −1.2).
    * The grouped generalization of `TfIdf.zipfFit`'s closing; feed it
    * PRE-AGGREGATED (group, x, y) series points (the [[ewma]]
    * contract — daily partials, not raw events).
    *
    * Exactness is the q146 OLS discipline: both logs round to 6
    * places first (pround6 — the one double the engines must agree
    * on), all five sums accumulate in DECIMAL(18,6) (order-free), and
    * slope/r² close in fixed-order double arithmetic. Points with
    * x ≤ 0 or y ≤ 0 are DROPPED (no log exists); groups left with
    * zero x- or y-variance report NULL slope/r², never NaN.
    *
    * Scale shape: ONE hash aggregate on the group key over the
    * calendar-bounded series — no join, no window; output = #groups.
    */
  def logLogSlope(series: DataFrame, groupCol: String, xCol: String,
                  yCol: String): DataFrame = {
    def p6(c: Column) = graft.functions.Rounding.p6(c)
    val xd = p6(log(col(xCol).cast("double")))
    val yd = p6(log(col(yCol).cast("double")))
    val sums = series
      .filter(col(groupCol).isNotNull &&
        col(xCol).cast("double") > 0.0 && col(yCol).cast("double") > 0.0)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).cast("long").as("n_points"),
        sum(xd.cast("decimal(18,6)")).as("__sx"),
        sum(yd.cast("decimal(18,6)")).as("__sy"),
        sum(p6(xd * xd).cast("decimal(18,6)")).as("__sxx"),
        sum(p6(xd * yd).cast("decimal(18,6)")).as("__sxy"),
        sum(p6(yd * yd).cast("decimal(18,6)")).as("__syy"))
    val nd = col("n_points").cast("double")
    val sx = col("__sx").cast("double"); val sy = col("__sy").cast("double")
    val sxx = col("__sxx").cast("double")
    val sxy = col("__sxy").cast("double")
    val syy = col("__syy").cast("double")
    val num = nd * sxy - sx * sy
    val den = nd * sxx - sx * sx
    val dy = nd * syy - sy * sy
    sums.select(col(groupCol), col("n_points"),
      when(den =!= 0.0, p6(num / den)).as("slope"),
      when(den =!= 0.0 && dy =!= 0.0, p6((num * num) / (den * dy)))
        .as("r2"))
  }

  /** Sweep-line concurrency over half-open integer intervals
    * [start, end): for every day (integer slot) where the open count
    * CHANGES, the number of intervals open on that day — the Little's
    *-law operational card ("how many orders were in flight").
    * Between emitted days the count is constant at the previous
    * emitted value; rows with NULL endpoints or end ≤ start are
    * dropped (zero-length intervals never open).
    *
    * Engine-exact: ±1 deltas hash-aggregate per day, and the running
    * sum is the bucketed DRIVER-prefix (the `rankAuc`/`latenessAudit`
    * pattern): per-bucket delta totals collect (#occupied buckets
    * rows — a day-range/bucketWidth data contract), exclusive offsets
    * broadcast back, then a within-bucket cumulative window
    * PARTITIONED BY bucket. All BIGINT; no single-partition window at
    * any day count.
    *
    * Scale shape: the row-scale work is one (day) hash aggregate over
    * 2n delta rows; everything after runs at calendar grain.
    * @param bucketWidth days per prefix bucket
    */
  def concurrency(intervals: DataFrame, startCol: String, endCol: String,
                  bucketWidth: Long = 256L): DataFrame = {
    val iv = intervals
      .filter(col(startCol).isNotNull && col(endCol).isNotNull &&
        col(endCol).cast("long") > col(startCol).cast("long"))
    concurrencyFromDeltas(iv
      .select(col(startCol).cast("long").as("day"), lit(1L).as("__d"))
      .unionAll(iv.select(col(endCol).cast("long").as("day"),
        lit(-1L).as("__d")))
      .groupBy(col("day"))
      .agg(sum(col("__d")).cast("long").as("delta")), bucketWidth)
  }

  /** [[concurrency]]'s closing read over an ALREADY-AGGREGATED per-day
    * delta table (`day`, `delta`) — the entry point for maintained
    * states (`StreamingConcurrency`'s live card and the one-shot sweep
    * share this one implementation). Zero-delta days still emit (their
    * n_open repeats the running value).
    */
  def concurrencyFromDeltas(deltaTable: DataFrame,
                            bucketWidth: Long = 256L): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val spark = deltaTable.sparkSession
    import spark.implicits._
    val deltas = deltaTable
      .select(col("day").cast("long").as("day"),
        col("delta").cast("long").as("__delta"))
      .withColumn("__b", call_function("div", col("day"), lit(bucketWidth)))
      .localCheckpoint(true)
    val btot = deltas.groupBy(col("__b"))
      .agg(sum(col("__delta")).cast("long").as("__s"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    var acc = 0L
    val offs = btot.map { case (b, s) => val o = acc; acc += s; (b, o) }
    val offDf =
      if (offs.isEmpty) Seq.empty[(Long, Long)].toDF("__b2", "__off")
      else offs.toSeq.toDF("__b2", "__off")
    val wIn = Window.partitionBy(col("__b")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, 0)
    deltas.join(broadcast(offDf), col("__b") === col("__b2"))
      .select(col("day"),
        (col("__off") + sum(col("__delta")).over(wIn)).cast("long")
          .as("n_open"))
  }

  /** Weekday seasonality strength per key: how much of the daily-count
    * variance does the day-of-week explain? η² = SS_between/SS_total
    * over the 7 weekday groups — the "is there a weekly cycle worth
    * modeling?" screen before anyone fits a seasonal forecaster.
    *
    * Weekday is the ENGINE-NEUTRAL epoch-day mod 7 (Spark's
    * dayofweek and DuckDB's disagree on numbering; datediff from
    * 1970-01-01 does not). Exactness: with per-weekday day-counts
    * M_w and count-sums S_w, η² = (M·Σ S_w²/M_w − S²)/(M·Q − S²);
    * the only division Σ S_w²/M_w runs through the kruskalWallis
    * micro-unit quotient split (q·10⁶ + rem·10⁶ div M_w, ≤ 7
    * micro-units low), so the `seasonal` flag (η² ≥ 0.2) is decided
    * in DECIMAL(38,0) with a raise-on-borderline band; the reported
    * eta2 is ONE fixed-order double. SS_total = 0 (constant daily
    * counts) reports 0, not seasonal.
    *
    * Scale shape: one hash aggregate to (key, day) counts — the
    * calendar-bounded series every operator in this file rides —
    * then two tiny per-key aggregates. No windows, no joins beyond
    * the per-key assembly.
    */
  def weekdaySeasonality(df: DataFrame, keyCol: String,
                         tsCol: String): DataFrame = {
    val daily = df.filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(keyCol).as("__k"),
        unix_date(to_date(col(tsCol))).cast("long").as("__day"))
      .agg(count(lit(1)).cast("long").as("__c"))
      .localCheckpoint(true)
    val perW = daily
      .withColumn("__w", pmod(col("__day"), lit(7L)))
      .groupBy(col("__k"), col("__w"))
      .agg(count(lit(1)).cast("long").as("__mw"),
        sum(col("__c")).cast("decimal(38,0)").as("__sw"))
      .withColumn("__sw2", col("__sw") * col("__sw"))
      .withColumn("__rem", expr("CAST(pmod(__sw2, __mw) AS DECIMAL(38,0))"))
      .withColumn("__q",
        expr("CAST((__sw2 - __rem) / __mw AS DECIMAL(38,0))"))
      .withColumn("__rem6",
        expr("CAST((CAST(__rem * 1000000 AS DECIMAL(38,0))" +
          " - pmod(__rem * 1000000, __mw)) / __mw AS DECIMAL(38,0))"))
    val t6 = perW.groupBy(col("__k"))
      .agg(sum(col("__q") * 1000000 + col("__rem6")).as("__t6u"),
        count(lit(1)).cast("long").as("__nw"))
    val tot = daily.groupBy(col("__k"))
      .agg(count(lit(1)).cast("long").as("n_days"),
        sum(col("__c")).cast("decimal(38,0)").as("__s"),
        sum(col("__c").cast("decimal(38,0)") * col("__c")).as("__q2"))
    val d = "(CAST(n_days AS DECIMAL(38,0)) * __q2 - __s * __s)"
    // N·10⁶ ∈ [numLow, numLow + n_weekdays·n_days) micro-units
    val numLow = "(CAST(n_days AS DECIMAL(38,0)) * __t6u" +
      " - __s * __s * 1000000)"
    tot.join(t6, Seq("__k"))
      .select(col("__k").as(keyCol), col("n_days"),
        graft.functions.Rounding.p6(expr(s"""CASE WHEN $d = 0 THEN 0.0
          ELSE (CAST(n_days AS DOUBLE) * (CAST(__t6u AS DOUBLE) / 1000000.0)
            - CAST(__s AS DOUBLE) * CAST(__s AS DOUBLE))
            / CAST($d AS DOUBLE) END""")).as("eta2"),
        expr(s"""CASE
          WHEN $d = 0 THEN false
          WHEN 5 * $numLow >= $d * 1000000 THEN true
          WHEN 5 * ($numLow + CAST(__nw AS DECIMAL(38,0)) * n_days)
            < $d * 1000000 THEN false
          ELSE CAST(raise_error(
            'Resample.weekdaySeasonality: eta-squared within the floored micro-unit band of the 0.2 threshold — borderline beyond exact resolution') AS BOOLEAN)
          END""").as("seasonal"))
  }

  /** Burstiness of a key's event cadence: B = (σ − μ)/(σ + μ) over
    * the inter-event gaps — −1 for a metronome, 0 for a Poisson
    * process, → 1 for heavy bursts. The bot/automation screen read
    * next to `streaks` (same cadence, different lens).
    *
    * Exact to the last step: gaps are epoch-second BIGINT differences
    * along one per-key window; with n gaps, S = Σgap and Q = Σgap²
    * exact DECIMAL(38,0), the identity B = (√(nQ−S²) − S)/(√(nQ−S²)
    * + S) needs ONE sqrt over an exact integer — pround6. Keys with
    * no gaps, or all-zero gaps (every event in the same second),
    * report NULL. mean_gap_s is the exact floor division S div n.
    *
    * Scale shape: one window pass per key, one hash aggregate.
    */
  def burstiness(df: DataFrame, keyCol: String, tsCol: String,
                 tieCol: String): DataFrame =
    burstinessFromStats(gapStats(df, keyCol, tsCol, tieCol), keyCol)

  /** The per-key inter-event gap-statistic core of [[burstiness]]:
    * one window pass, one hash aggregate, yielding per key the event
    * count, gap count, exact DECIMAL(38,0) gap sum/sum-of-squares,
    * and the first/last epoch seconds (what a streaming state needs
    * to stitch gaps across batch boundaries — the gap MULTISET of a
    * (ts, tie)-ordered sequence depends only on the sorted epoch
    * seconds, since equal-ts runs contribute zero gaps in any tie
    * order).
    */
  def gapStats(df: DataFrame, keyCol: String, tsCol: String,
               tieCol: String): DataFrame = {
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__tie"))
    val gaps = df.filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol).as("__k"),
        col(tsCol).cast("long").as("__ts"), col(tieCol).as("__tie"))
      .withColumn("__gap", lead(col("__ts"), 1).over(w) - col("__ts"))
    gaps.groupBy(col("__k").as(keyCol))
      .agg(count(lit(1)).cast("long").as("n_events"),
        sum(when(col("__gap").isNotNull, 1L).otherwise(0L))
          .cast("long").as("n_gaps"),
        sum(coalesce(col("__gap"), lit(0L)).cast("decimal(38,0)"))
          .as("__s"),
        sum(coalesce(col("__gap"), lit(0L)).cast("decimal(38,0)") *
          coalesce(col("__gap"), lit(0L))).as("__q"),
        min(col("__ts")).cast("long").as("__min_ts"),
        max(col("__ts")).cast("long").as("__max_ts"))
  }

  /** The shared burstiness closing over a per-key
    * (n_events, n_gaps, __s, __q) statistic table — [[burstiness]]
    * and `streaming.StreamingBurstiness` both read through it, so
    * the batch and live cards cannot diverge.
    */
  def burstinessFromStats(stats: DataFrame, keyCol: String): DataFrame =
    stats.select(col(keyCol), col("n_events"), col("n_gaps"),
      expr("""CASE WHEN n_gaps = 0 THEN NULL
        ELSE CAST(__s DIV n_gaps AS BIGINT) END""").as("mean_gap_s"),
      graft.functions.Rounding.p6(expr(
        """CASE WHEN n_gaps = 0 OR __s = 0 THEN NULL
        ELSE (sqrt(CAST(n_gaps * __q - __s * __s AS DOUBLE))
            - CAST(__s AS DOUBLE))
          / (sqrt(CAST(n_gaps * __q - __s * __s AS DOUBLE))
            + CAST(__s AS DOUBLE)) END""")).as("b"))

  /** Seasonal-naive error ratio per key: does "same day last week"
    * predict today's count better than "yesterday"? Sum of absolute
    * one-day and seven-day differences over the daily-count series —
    * ratio < 1 means the weekly naive wins and a seasonal model is
    * worth its keep (the MASE idea, with the roles laid bare).
    *
    * ENTIRELY integer except the closing ratio: daily counts join
    * their day−1 and day−7 counterparts by exact day arithmetic
    * (missing days simply form no pair — no imputation), both error
    * sums are BIGINT, and the ratio (sae7/n7)/(sae1/n1) is ONE
    * fixed-order double, pround6, NULL when either pair set is empty
    * or the lag-1 error is exactly 0 (a constant series has nothing
    * to beat).
    *
    * Scale shape: one hash aggregate to the calendar-bounded daily
    * series, two self equi-joins on (key, day±lag), one closing
    * aggregate.
    */
  def seasonalNaiveError(df: DataFrame, keyCol: String,
                         tsCol: String): DataFrame = {
    val daily = df.filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(keyCol).as("__k"),
        unix_date(to_date(col(tsCol))).cast("long").as("__day"))
      .agg(count(lit(1)).cast("long").as("__c"))
      .localCheckpoint(true)
    def lagged(lag: Int, tag: String) = daily
      .join(daily.select(col("__k"), (col("__day") + lag).as("__day"),
          col("__c").as("__cl")),
        Seq("__k", "__day"))
      .groupBy(col("__k"))
      .agg(count(lit(1)).cast("long").as(s"n_pairs$tag"),
        sum(abs(col("__c") - col("__cl"))).cast("long").as(s"sae$tag"))
    val n = daily.groupBy(col("__k"))
      .agg(count(lit(1)).cast("long").as("n_days"))
    n.join(lagged(1, "1"), Seq("__k"), "left")
      .join(lagged(7, "7"), Seq("__k"), "left")
      .select(col("__k").as(keyCol), col("n_days"),
        coalesce(col("n_pairs1"), lit(0L)).as("n_pairs1"),
        coalesce(col("sae1"), lit(0L)).as("sae1"),
        coalesce(col("n_pairs7"), lit(0L)).as("n_pairs7"),
        coalesce(col("sae7"), lit(0L)).as("sae7"))
      .withColumn("ratio",
        graft.functions.Rounding.p6(expr("""CASE
          WHEN n_pairs1 = 0 OR n_pairs7 = 0 OR sae1 = 0 THEN NULL
          ELSE (CAST(sae7 AS DOUBLE) / CAST(n_pairs7 AS DOUBLE))
             / (CAST(sae1 AS DOUBLE) / CAST(n_pairs1 AS DOUBLE))
          END""")))
  }
}
