package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ABC (Pareto) classification — the warehouse contribution analysis:
  * rank keys by total value descending and class them by CUMULATIVE
  * share (A = the head covering 80% of total value, B = the next 15%,
  * C = the tail). The q169 whale view counts a fixed top-k per group;
  * ABC instead cuts at exact share boundaries over the WHOLE
  * population, which needs a global value-ordered running sum.
  *
  * Exactness: per-key totals and the running sum are DECIMAL(18,2)
  * (order-free, engine-exact); class boundaries compare in BIGINT
  * cents by cross-multiplication (cum·5 ≤ tot·4 for the 80% cut,
  * cum·20 ≤ tot·19 for 95%), and `share_bp` is BIGINT floor division
  * — no float enters any decision. Overflow bound: total value must
  * stay under ~9.2e14 in cents × 10^4, i.e. ~9.2e12 currency units;
  * shard the analysis (per region/year) past that.
  *
  * Scale shape: the global DESC-ordered prefix is the bucketed
  * driver-offset pattern (`Survival`/`latenessAudit`): keys bucket by
  * value range (`floor(value / bucketWidth)` — monotone, so bucket
  * order IS value order), per-bucket decimal sums collect to the
  * driver (#buckets rows), exclusive offsets broadcast back, and the
  * within-bucket window partitions by bucket. No single-partition
  * window at any key count; ties order by (value desc, key) — total,
  * engine-portable.
  */
object Pareto {

  /** One row per key: `value` (rounded 2), `share_bp` (cumulative
    * share of total in basis points, floor), `abc_class`.
    * @param bucketWidth value units per prefix bucket (driver holds
    *        one offset per OCCUPIED bucket — size it to value_range /
    *        ~10^4)
    */
  def abcClassification(df: DataFrame, keyCol: String, valueCol: String,
                        bucketWidth: Double = 65536.0): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val spark = df.sparkSession
    import spark.implicits._
    // checkpointed: the per-key table is executed TWICE (the driver's
    // bucket-offset collect, then the windowed prefix query) — without
    // it each execution re-runs the full fact scan + key aggregate.
    // The materialized frame is one row per KEY (the window's input
    // either way), never the fact table.
    val perKey = df
      .filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol).as("__k"))
      .agg(sum(col(valueCol).cast("decimal(18,2)")).as("__v"))
      .filter(col("__v").isNotNull)
      .withColumn("__b",
        floor(col("__v").cast("double") / bucketWidth).cast("long"))
      // lazy: the btot collect right below is the FIRST action, so it
      // materializes the blocks as a side effect — an eager checkpoint
      // would run the aggregate as an extra SERIAL job before any
      // sibling branch (e.g. q269's xyz) could overlap with it
      .localCheckpoint(false)
    val btot = perKey.groupBy(col("__b"))
      .agg(sum(col("__v")).cast("decimal(18,2)").as("__s"))
      .collect()
      .map(r => r.getLong(0) -> BigDecimal(r.getDecimal(1)))
      .sortBy(-_._1) // DESC value order = DESC bucket order
    var acc = BigDecimal(0)
    val offs = btot.map { case (b, s) => val o = acc; acc += s; (b, o) }
    val total = acc
    if (btot.isEmpty)
      return perKey.limit(0).select(col("__k").as(keyCol),
        lit(0.0).as("value"), lit(0L).as("share_bp"),
        lit("C").as("abc_class"))
    val offDf = broadcast(offs.toSeq.toDF("__b", "__off")
      .withColumn("__off", col("__off").cast("decimal(18,2)")))
    val w = Window.partitionBy(col("__b"))
      .orderBy(col("__v").desc, col("__k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totC = lit((total * 100).toLongExact)
    perKey.join(offDf, Seq("__b"))
      .withColumn("__cum",
        (col("__off") + sum(col("__v")).over(w)).cast("decimal(18,2)"))
      .withColumn("__cumc", (col("__cum") * 100).cast("long"))
      .select(col("__k").as(keyCol),
        round(col("__v").cast("double"), 2).as("value"),
        when(totC === 0L, lit(0L))
          .otherwise(expr(s"CAST(__cumc * 10000 DIV ${(total * 100).toLongExact}L AS BIGINT)"))
          .as("share_bp"),
        when(col("__cumc") * 5 <= totC * 4, "A")
          .when(col("__cumc") * 20 <= totC * 19, "B")
          .otherwise("C").as("abc_class"))
  }

  /** Top-population-percent value concentration — the Lorenz/whale
    * card beside [[abcClassification]] (which cuts at fixed VALUE
    * shares, 80/95%): for each requested population percent p, the
    * share of total value held by the top ⌈n·p⌉ keys. "1% of
    * customers carry 38% of revenue" is this table's row.
    *
    * Exactness: per-key values are exact DECIMAL(18,2) sums; the
    * descending rank is the bucketed driver-prefix (negated-value
    * buckets, (value desc, key) tie order — [[abcClassification]]'s
    * machinery); thresholds ⌈n·p⌉ are exact integers computed from
    * the driver-collected bucket counts; shares are cent-scaled
    * BIGINT floor-division basis points. One conditional aggregate
    * serves every requested percent.
    *
    * Same snapshot assumption as the other bucketed-prefix operators.
    * Output per percent, ascending: `pct_bp` (the requested percent in
    * basis points), `n_top` (BIGINT keys included), `share_bp`.
    */
  def topShares(df: DataFrame, keyCol: String, valueCol: String,
                pctsBp: Seq[Long], bucketWidth: Double = 65536.0): DataFrame = {
    require(pctsBp.nonEmpty && pctsBp.forall(p => p >= 1L && p <= 10000L),
      s"percents must be basis points in [1,10000]: $pctsBp")
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val spark = df.sparkSession
    import spark.implicits._
    // checkpointed for the same two-consumer reason as
    // [[abcClassification]]'s per-key frame
    val perKey = df
      .filter(col(keyCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(keyCol).as("__k"))
      .agg(sum(col(valueCol).cast("decimal(18,2)")).as("__v"))
      .withColumn("__b",
        floor((-col("__v")).cast("double") / lit(bucketWidth)).cast("long"))
      .localCheckpoint(false)
    val btot = perKey.groupBy(col("__b"))
      .agg(count(lit(1)).cast("long").as("__n"),
        sum(col("__v")).as("__s"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.getDecimal(2)).fold(BigDecimal(0))(BigDecimal(_))))
      .sortBy(_._1)
    var accN = 0L; var accV = BigDecimal(0)
    val offs = btot.map { case (b, c, s) =>
      val o = accN; accN += c; accV += s; (b, o)
    }
    val n = accN
    val totC = (accV * 100).toLongExact
    if (n == 0L)
      return Seq.empty[(Long, Long, Long)].toDF("pct_bp", "n_top", "share_bp")
    // ceil(n * p / 10^4) without doubles
    val cuts = pctsBp.sorted.map(p => p -> ((n * p + 9999L) / 10000L))
    val offDf = broadcast(offs.toSeq.toDF("__b", "__off"))
    val w = Window.partitionBy(col("__b"))
      .orderBy(col("__v").desc, col("__k"))
    val ranked = perKey.join(offDf, Seq("__b"))
      .withColumn("__r",
        col("__off") + row_number().over(w).cast("long") - 1L)
    val sums = ranked.agg(
      cuts.map { case (p, t) =>
        sum(when(col("__r") < t, col("__v"))).as(s"__s$p")
      }.head, cuts.tail.map { case (p, t) =>
        sum(when(col("__r") < t, col("__v"))).as(s"__s$p")
      }: _*).collect()(0)
    cuts.zipWithIndex.map { case ((p, t), i) =>
      val topC = Option(sums.getDecimal(i))
        .fold(BigDecimal(0))(BigDecimal(_)) * 100
      val share = if (totC == 0L) 0L else topC.toLongExact * 10000L / totC
      (p, t, share)
    }.toDF("pct_bp", "n_top", "share_bp")
  }

  /** Exact per-group Gini coefficient over per-key value totals — the
    * inequality number behind [[topShares]]'s Lorenz cuts: 0 = every
    * key holds the same value, →1 = one key holds everything. Uses the
    * rank form over values sorted ASCENDING within each group:
    *   G = (2·Σ r·xᵣ − (n+1)·Σx) / (n·Σx)
    * emitted as exact floor basis points (`gini_bp`), so the output is
    * BIGINT-only and engine-replayable.
    *
    * Exactness: values are DECIMAL(18,2) sums carried as exact cents;
    * ranks come from the bucketed global prefix — per-(group, bucket)
    * counts (a bucket-grain frame bounded by #groups ×
    * value-range/bucketWidth, the data contract), prefix offsets from
    * a window over that TINY frame, then row_number windows
    * PARTITIONED BY (group, bucket) over the keys. Ties between equal
    * values get arbitrary rank order, but Σ r·xᵣ is
    * tie-permutation-invariant, so the aggregate is deterministic.
    * Σ r·x accumulates in DECIMAL(38,0) with the rank cast to
    * DECIMAL(19,0) BEFORE the multiply (the rankAuc wrap lesson).
    * Non-negative values are the formula's contract (negative totals
    * make G meaningless); groups with Σx = 0 are dropped.
    *
    * Scale shape: one (group, key) hash aggregate — the row-scale pass
    * — then bucket counts, one broadcast offset join, and one group
    * aggregate. No window ever sees more than one (group, value
    * bucket) slice of keys; the offset window runs at bucket grain.
    */
  def gini(df: DataFrame, groupCol: String, keyCol: String,
           valueCol: String, bucketWidthCents: Long = 1L << 20): DataFrame = {
    require(bucketWidthCents > 0,
      s"bucketWidthCents must be positive: $bucketWidthCents")
    val perKey = df
      .filter(col(groupCol).isNotNull && col(keyCol).isNotNull)
      .groupBy(col(groupCol).as("__g"), col(keyCol).as("__k"))
      .agg((sum(coalesce(col(valueCol), lit(0)).cast("decimal(18,2)")) *
        100).cast("long").as("__c"))
      .withColumn("__b", call_function("div", col("__c"),
        lit(bucketWidthCents)))
      .localCheckpoint(true)
    val wOff = Window.partitionBy(col("__g2")).orderBy(col("__b2"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offDf = perKey.groupBy(col("__g").as("__g2"), col("__b").as("__b2"))
      .agg(count(lit(1)).cast("long").as("__n"))
      .withColumn("__off",
        coalesce(sum(col("__n")).over(wOff), lit(0L)))
      .drop("__n")
    val w = Window.partitionBy(col("__g"), col("__b")).orderBy(col("__c"))
    perKey
      .join(broadcast(offDf),
        col("__g") <=> col("__g2") && col("__b") === col("__b2"))
      .withColumn("__r", col("__off") + row_number().over(w).cast("long"))
      .groupBy(col("__g"))
      .agg(count(lit(1)).cast("long").as("n_keys"),
        sum(col("__c").cast("decimal(38,0)")).as("__s"),
        sum(col("__r").cast("decimal(19,0)") *
          col("__c").cast("decimal(19,0)")).cast("decimal(38,0)")
          .as("__srx"))
      .filter(col("__s") > 0)
      // integral DIV, not decimal '/' + floor: decimal division rounds
      // HALF_UP at the result scale, which can cross an integer
      // boundary the true quotient sits 1/(n·S) below
      .select(col("__g").as(groupCol), col("n_keys"),
        expr("""CAST((20000 * __srx
                - 10000 * (CAST(n_keys AS DECIMAL(19,0)) + 1) * __s)
                DIV (CAST(n_keys AS DECIMAL(19,0)) * __s) AS BIGINT)""")
          .as("gini_bp"))
  }

  /** Theil-T and mean-log-deviation inequality per group — [[gini]]'s
    * decomposable cousins: with per-entity positive values x_i, total
    * X and count n,
    *   T = Σ (x_i/X)·ln(n·x_i/X)   (top-sensitive)
    *   MLD = Σ (1/n)·ln(X/(n·x_i)) (bottom-sensitive)
    * Both are 0 at perfect equality and grow with concentration, and
    * both decompose additively across subgroups — which Gini does not,
    * and which is why a mixture plan reads them: "how much of the
    * corpus-level inequality is WITHIN sources vs BETWEEN them" is an
    * exact arithmetic question for Theil.
    *
    * Exactness (the labelEntropy discipline): x_i stays an exact
    * DECIMAL through the totals aggregate; each entity's term is ONE
    * fixed-order double over (x_i, X, n), pround6, summed as
    * DECIMAL(18,6). Non-positive values are EXCLUDED (ln undefined —
    * the standard Theil domain), n counts kept entities; groups with
    * nothing kept vanish.
    *
    * Scale shape: one group-totals aggregate, broadcast back onto the
    * entity rows (|groups| rows — never a window over a group
    * partition), one closing group aggregate.
    */
  def theil(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val kept = df
      .filter(col(groupCol).isNotNull && col(valueCol).isNotNull &&
        col(valueCol) > 0)
      .select(col(groupCol), col(valueCol).cast("decimal(28,2)").as("__x"))
    val tot = kept.groupBy(col(groupCol))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("__x")).cast("decimal(38,2)").as("__xx"))
    def p6(c: org.apache.spark.sql.Column) = graft.functions.Rounding.p6(c)
    val xd = col("__x").cast("double"); val xxd = col("__xx").cast("double")
    val nd = col("n").cast("double")
    kept.join(broadcast(tot), Seq(groupCol))
      .select(col(groupCol), col("n"),
        p6((xd / xxd) * log(nd * xd / xxd)).cast("decimal(18,6)")
          .as("__t"),
        p6(log(xxd / (nd * xd)) / nd).cast("decimal(18,6)").as("__m"))
      .groupBy(col(groupCol))
      .agg(max(col("n")).as("n"),
        sum(col("__t")).cast("double").as("theil"),
        sum(col("__m")).cast("double").as("mld"))
  }

  /** Hill tail-index estimator over the top-k order statistics:
    * α = k_kept / Σ ln(x_i / x_threshold) — "how heavy is the revenue
    * (or demand, or document-length) tail?" α ≈ 1 is Zipf-heavy
    * (whale-dominated: top-N caps and stratified sampling are
    * mandatory), α > 2 has finite variance (means are trustworthy).
    * The order-statistics companion to [[gini]] (whole-distribution)
    * and `TfIdf.zipfFit` (rank-frequency regression).
    *
    * Determinism: the top-(k+1) set is taken under the total order
    * (value desc, tie asc) — a distributed TakeOrdered, k a contract
    * constant ≤ 10⁴ — and the threshold row (the LAST of that order:
    * among minimum-value rows, the max tie) is excluded from the
    * terms; everything the terms read is a VALUE, so ties cannot
    * perturb the estimate. Non-positive values are excluded (ln
    * domain). Each term is pround6(ln(x/xmin)) summed as
    * DECIMAL(18,6); α is ONE double division, pround6; all top
    * values equal (Σ = 0) reports NULL.
    *
    * Scale shape: one TakeOrdered pass (checkpointed), two one-row
    * aggregate attaches (threshold value, then threshold tie) — the
    * linkageQuality shape — and one closing aggregate over ≤ k+1
    * rows. Output ONE row: `k`, `n_top`, `x_min`, `alpha`.
    */
  def hillTail(df: DataFrame, valueCol: String, tieCol: String,
               k: Int = 500): DataFrame = {
    require(k >= 2 && k <= 10000, s"k out of range: $k")
    val top = df
      .filter(col(valueCol).isNotNull && col(valueCol) > 0 &&
        col(tieCol).isNotNull)
      .select(col(valueCol).cast("decimal(18,2)").as("__x"),
        col(tieCol).as("__tie"))
      .orderBy(col("__x").desc, col("__tie").asc)
      .limit(k + 1)
      .localCheckpoint(true)
    val xmin = top.agg(min(col("__x")).as("__xmin"))
    val withMin = top.crossJoin(broadcast(xmin))
    val dropTie = withMin.filter(col("__x") === col("__xmin"))
      .agg(max(col("__tie")).as("__dropt"))
    def p6(c: org.apache.spark.sql.Column) = graft.functions.Rounding.p6(c)
    withMin.crossJoin(broadcast(dropTie))
      .filter(!(col("__x") === col("__xmin") &&
        col("__tie") === col("__dropt")))
      .agg(count(lit(1)).cast("long").as("n_top"),
        sum(p6(log(col("__x").cast("double") /
          col("__xmin").cast("double"))).cast("decimal(18,6)"))
          .as("__lsum"),
        max(col("__xmin").cast("double")).as("x_min"))
      .select(lit(k.toLong).as("k"), col("n_top"), col("x_min"),
        when(col("n_top") > 0L && col("__lsum").cast("double") > 0.0,
          p6(col("n_top").cast("double") / col("__lsum").cast("double")))
          .as("alpha"))
  }

  /** XYZ demand-variability classification — [[abcClassification]]'s
    * companion axis: per key, the coefficient of variation of its
    * per-period demand with ZERO-DEMAND PERIODS COUNTED (the textbook
    * XYZ convention — an item selling once a year is erratic, not
    * stable), via the closed form over the GLOBAL period count M:
    *   cv = sqrt(M·Σq² − (Σq)²) / Σq
    * (the 1/M of variance and mean cancel, so zero periods never need
    * materializing). X = steady (cv < xMax), Y = variable, Z = erratic
    * (cv ≥ yMax); joined with ABC this yields the classic 9-cell
    * inventory-policy matrix.
    *
    * Exactness: Σq is the DECIMAL(18,2) period-sum total, Σq² the
    * DECIMAL(38,4) sum of exact squares; cv is ONE fixed-order double
    * expression (one sqrt, one division — the autocorr discipline),
    * rounded to 6 on output while the class thresholds compare the
    * unrounded value. Keys with zero total demand are dropped (no
    * demand, no class). M attaches as a one-row broadcast.
    *
    * Scale shape: one (key, period) hash aggregate — the row-scale
    * pass — then one key-level aggregate; output is one row per key.
    */
  def xyzClassification(df: DataFrame, keyCol: String, periodCol: String,
                        valueCol: String, xMax: Double = 0.5,
                        yMax: Double = 1.0): DataFrame = {
    require(xMax > 0 && yMax > xMax, s"need 0 < xMax < yMax: $xMax, $yMax")
    val filtered = df
      .filter(col(keyCol).isNotNull && col(periodCol).isNotNull &&
        col(valueCol).isNotNull)
    val per = filtered
      .groupBy(col(keyCol).as("__k"), col(periodCol).as("__p"))
      .agg(sum(col(valueCol).cast("decimal(18,2)")).as("__q"))
    val m = per.agg(count_distinct(col("__p")).cast("long").as("__m"))
    // clamp the radicand: for a perfectly steady key the true value is
    // 0 but double arithmetic can land one ulp BELOW it (e.g. M=2,
    // q=0.05/period), and sqrt(-1e-18) = NaN would fail both class
    // thresholds and brand the steadiest item erratic. Mirrored in the
    // oracle.
    val cv = sqrt(greatest(lit(0.0),
      col("__m").cast("double") * col("__sqq").cast("double") -
        col("__sq").cast("double") * col("__sq").cast("double"))) /
      col("__sq").cast("double")
    per.groupBy(col("__k"))
      .agg(count(lit(1)).cast("long").as("n_periods"),
        sum(col("__q")).as("__sq"),
        sum((col("__q") * col("__q")).cast("decimal(38,4)")).as("__sqq"))
      .filter(col("__sq") > 0)
      .crossJoin(broadcast(m))
      .select(col("__k").as(keyCol), col("n_periods"),
        graft.functions.Rounding.p6(cv).as("cv"),
        when(cv < xMax, "X").when(cv < yMax, "Y").otherwise("Z")
          .as("xyz_class"))
  }

  /** Mean-excess (peaks-over-threshold) tail card with a GPD
    * method-of-moments fit per threshold: for each literal u,
    * e(u) = mean(x − u | x > u), and with s² the excess variance,
    *   ξ̂ = ½·(1 − e²/s²),  σ̂ = ½·e·(e²/s² + 1)
    * — a rising e(u) means a heavy (Pareto-ish) tail; ξ̂ > 0 says so
    * quantitatively. The EVT companion to the Hill estimator: Hill
    * assumes the power law, this MEASURES whether one holds above u.
    *
    * One scan, thresholds exploded before the aggregate (the
    * [[graft.operators.Bootstrap]] fan shape): moments are exact
    * DECIMAL sums of (x − u), closings p6. Thresholds with fewer than
    * 2 exceedances or zero variance report NULL fit.
    *
    * Output: group, u, n_exceed, mean_excess, xi, sigma.
    */
  def meanExcess(df: DataFrame, groupCol: String, valCol: String,
                 thresholds: Seq[Double]): DataFrame =
    meanExcessFromMoments(
      excessMoments(df, groupCol, valCol, thresholds), groupCol)

  /** The GPD-moment closing over a per-(group, threshold) excess
    * moment table (__g, u, n_exceed, __se, __sq) — shared verbatim by
    * the streaming tail monitor, whose state IS this table maintained
    * additively across batches.
    */
  def meanExcessFromMoments(agg: DataFrame, groupCol: String): DataFrame = {
    def p6(c: org.apache.spark.sql.Column) = graft.functions.Rounding.p6(c)
    val nD = col("n_exceed").cast("double")
    val withM = agg
      .withColumn("mean_excess", p6(col("__se").cast("double") / nD))
      .withColumn("__s2", when(col("n_exceed") >= 2L, p6(
        (col("__sq").cast("double") -
          col("__se").cast("double") * col("__se").cast("double") / nD) /
          (nD - 1.0))))
    withM.select(col("__g").as(groupCol), col("u"), col("n_exceed"),
      col("mean_excess"),
      when(col("__s2") > 0.0, p6(lit(0.5) *
        (lit(1.0) - col("mean_excess") * col("mean_excess") / col("__s2"))))
        .as("xi"),
      when(col("__s2") > 0.0, p6(lit(0.5) * col("mean_excess") *
        (col("mean_excess") * col("mean_excess") / col("__s2") + 1.0)))
        .as("sigma"))
  }

  /** The per-(group, threshold) excess moment table [[meanExcess]]
    * aggregates — exposed so the streaming twin computes batch
    * partials through the identical fan + DECIMAL moment path.
    */
  def excessMoments(df: DataFrame, groupCol: String, valCol: String,
                    thresholds: Seq[Double]): DataFrame = {
    require(thresholds.nonEmpty && thresholds.size <= 16,
      s"thresholds must be 1..16 values: ${thresholds.size}")
    val fan = df
      .filter(col(groupCol).isNotNull && col(valCol).isNotNull)
      .select(col(groupCol).as("__g"),
        col(valCol).cast("decimal(18,2)").as("__x"),
        explode(typedLit(thresholds)).as("u"))
      .where(col("__x") > col("u"))
      .withColumn("__e", (col("__x") - col("u").cast("decimal(18,2)"))
        .cast("decimal(18,2)"))
    fan.groupBy(col("__g"), col("u"))
      .agg(count(lit(1)).cast("long").as("n_exceed"),
        sum(col("__e")).cast("decimal(38,2)").as("__se"),
        sum((col("__e").cast("decimal(19,2)") *
          col("__e").cast("decimal(19,2)")).cast("decimal(38,4)"))
          .cast("decimal(38,4)").as("__sq"))
  }

  /** Laspeyres / Paasche / Fisher price indices between two eras over
    * the items present in BOTH: with per-(item, era) unit prices
    * p = Σrevenue/Σqty (p6 — the one division per cell) and exact
    * DECIMAL quantity weights,
    *   L = Σ p1·q0 / Σ p0·q0   (base-period basket)
    *   P = Σ p1·q1 / Σ p0·q1   (current basket)
    *   F = √(L·P)
    * "Did prices move, holding the basket fixed?" — the mix-shift-free
    * companion to a raw average-price delta, which confounds price
    * moves with basket drift. All four sums are exact products of the
    * p6 unit prices with DECIMAL quantities; each index divides once.
    *
    * `eraCol` is 0 (base) / 1 (current). Items missing an era drop
    * (no comparable price); groups with an empty common basket drop.
    *
    * Output: group, n_items, laspeyres, paasche, fisher.
    */
  def priceIndices(df: DataFrame, groupCol: String, itemCol: String,
                   eraCol: String, priceCol: String,
                   qtyCol: String): DataFrame =
    priceIndicesFromCells(
      priceCells(df, groupCol, itemCol, eraCol, priceCol, qtyCol),
      groupCol)

  /** The additive per-(group, item, era) revenue/quantity cell table
    * [[priceIndices]] aggregates — exposed so the streaming twin
    * computes batch partials through the identical DECIMAL path.
    */
  def priceCells(df: DataFrame, groupCol: String, itemCol: String,
                 eraCol: String, priceCol: String,
                 qtyCol: String): DataFrame = df
    .filter(col(groupCol).isNotNull && col(itemCol).isNotNull)
    .groupBy(col(groupCol).as("__g"), col(itemCol).as("__i"),
      col(eraCol).cast("long").as("__e"))
    .agg(sum(col(priceCol).cast("decimal(18,2)"))
      .cast("decimal(38,2)").as("__rev"),
      sum(col(qtyCol).cast("decimal(18,2)"))
        .cast("decimal(38,2)").as("__qty"))

  /** The index closing over the cell table (__g, __i, __e, __rev,
    * __qty) — shared verbatim by the streaming price monitor, whose
    * state IS this table maintained additively across batches.
    */
  def priceIndicesFromCells(cellsIn: DataFrame,
                            groupCol: String): DataFrame = {
    def p6(c: org.apache.spark.sql.Column) = graft.functions.Rounding.p6(c)
    val cells = cellsIn
      .where(col("__qty") > 0)
      .withColumn("__p6", p6(col("__rev").cast("double") /
        col("__qty").cast("double")))
    val base = cells.where(col("__e") === 0L)
      .select(col("__g"), col("__i"), col("__p6").as("p0"),
        col("__qty").as("q0"))
    val cur = cells.where(col("__e") === 1L)
      .select(col("__g"), col("__i"), col("__p6").as("p1"),
        col("__qty").as("q1"))
    val joined = base.join(cur, Seq("__g", "__i"))
    val agg = joined.groupBy(col("__g"))
      .agg(count(lit(1)).cast("long").as("n_items"),
        // (18,6) x (19,2) -> (38,8) with NO scale reduction in either
        // engine; wider operands would silently round the 8th decimal
        sum((col("p1").cast("decimal(18,6)") * col("q0")
          .cast("decimal(19,2)"))
          .cast("decimal(38,8)")).cast("decimal(38,8)").as("l_num"),
        sum((col("p0").cast("decimal(18,6)") * col("q0")
          .cast("decimal(19,2)"))
          .cast("decimal(38,8)")).cast("decimal(38,8)").as("l_den"),
        sum((col("p1").cast("decimal(18,6)") * col("q1")
          .cast("decimal(19,2)"))
          .cast("decimal(38,8)")).cast("decimal(38,8)").as("p_num"),
        sum((col("p0").cast("decimal(18,6)") * col("q1")
          .cast("decimal(19,2)"))
          .cast("decimal(38,8)")).cast("decimal(38,8)").as("p_den"))
      .where(col("l_den") > 0 && col("p_den") > 0)
    agg
      .withColumn("laspeyres",
        p6(col("l_num").cast("double") / col("l_den").cast("double")))
      .withColumn("paasche",
        p6(col("p_num").cast("double") / col("p_den").cast("double")))
      .select(col("__g").as(groupCol), col("n_items"), col("laspeyres"),
        col("paasche"),
        p6(sqrt(col("laspeyres") * col("paasche"))).as("fisher"))
  }
}
