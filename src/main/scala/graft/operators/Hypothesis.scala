package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-free hypothesis tests over grouped data — the
  * screens a curation pipeline runs when a drift score alone is not a
  * decision: "did arm B's latency DISTRIBUTION shift?" (rank-sum,
  * no normality assumption), "are these two ordinal columns
  * monotonically associated?" (rank correlation robust to ties).
  * Complements the parametric q287 two-proportion z (rates), the
  * q252 chi-square (categorical independence), and the q183 KS
  * statistic (which reports distance, not a calibrated test).
  *
  * Exactness discipline (the q287 contract): every test statistic is
  * assembled from exact BIGINT/DECIMAL counts; the z / tau double is
  * ONE fixed-order expression over those integers rounded to 6
  * places, and every `significant` flag is decided by exact
  * cross-multiplied integer comparisons — the rounded double is never
  * load-bearing.
  *
  * Both tests consume the tied-value CONTINGENCY, not raw rows: ranks
  * with midrank ties are a closed form over per-value counts, so the
  * expensive path is one hash aggregate to the (group, value) table
  * plus a window over DISTINCT values — bounded by the value
  * vocabulary (the `weightedMedian` contract), never by row count.
  */
object Hypothesis {

  import graft.functions.Rounding.p6

  /** Mann–Whitney U (Wilcoxon rank-sum) per group: does arm 1's value
    * distribution stochastically dominate arm 0's? The
    * distribution-free A/B test for a continuous metric — the
    * companion to q287's rate test when the metric is skewed revenue
    * or latency and a t-test's normality assumption is indefensible.
    *
    * Midrank tie handling via the per-value count table: with C(v) =
    * rows strictly below v and f(v) rows at v, every row at v takes
    * average rank C(v) + (f(v)+1)/2 — kept integral as TWICE the
    * rank, r2(v) = 2·C(v) + f(v) + 1. Then 2·R_b = Σ n_b(v)·r2(v)
    * and the reported `u_x2` = 2·U_b = 2·R_b − 2·n_b(n_b+1)/2, all
    * exact (DECIMAL(38,0) internally; the summand n_b(v)·r2(v) wraps
    * BIGINT only past ~2·10⁹ rows in one group).
    *
    * Normal approximation with the standard tie correction:
    * z = (U_b − n_a·n_b/2) / √(n_a·n_b·V / (12·n·(n−1))) with
    * V = n(n−1)(n+1) − Σ(f³−f) — one fixed-order double expression
    * over the exact integers, pround6. `significant` (|z| > 1.96)
    * never reads the double: z² > (49/25)² cross-multiplies to
    * 1875·A²·n·(n−1) > 2401·n_a·n_b·V with A = 2U_b − n_a·n_b, in
    * DECIMAL(38,0) with a double pre-guard that RAISES within 10% of
    * capacity (≈10⁶ rows in one group — pre-bucket the metric or
    * test per finer key past that) instead of letting the non-ANSI
    * decimal overflow read back as silent NULL.
    *
    * Degenerate groups: one arm empty → dropped (no comparison
    * exists); all values tied (V = 0) → z = 0, not significant.
    *
    * Scale shape: one hash aggregate to the (group, value, n_a, n_b)
    * table, one window over DISTINCT values partitioned by group
    * (bounded by the value vocabulary, not rows), one final per-group
    * aggregate. No joins.
    */
  def mannWhitneyU(df: DataFrame, groupCol: String, armCol: String,
                   valCol: String): DataFrame = {
    val arm = when(col(armCol).cast("long") =!= 0L, 1L).otherwise(0L)
    val cells = df
      .filter(col(groupCol).isNotNull && col(armCol).isNotNull &&
        col(valCol).isNotNull)
      .select(col(groupCol).as("__g"), arm.as("__arm"),
        col(valCol).as("__v"))
      .groupBy(col("__g"), col("__v"))
      .agg(sum(lit(1L) - col("__arm")).cast("long").as("__na"),
        sum(col("__arm")).cast("long").as("__nb"))
    val wPrior = Window.partitionBy(col("__g")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = cells
      .withColumn("__f", col("__na") + col("__nb"))
      .withColumn("__cum",
        coalesce(sum(col("__f")).over(wPrior), lit(0L)))
      // twice the midrank shared by every row at this value
      .withColumn("__r2", lit(2L) * col("__cum") + col("__f") + lit(1L))
    val g = ranked.groupBy(col("__g").as(groupCol))
      .agg(sum(col("__na")).cast("long").as("n_a"),
        sum(col("__nb")).cast("long").as("n_b"),
        sum(col("__nb").cast("decimal(38,0)") * col("__r2")).as("__r2b"),
        sum(col("__f").cast("decimal(38,0)") * col("__f") * col("__f")
          - col("__f")).as("__t"))
      .filter(col("n_a") > 0L && col("n_b") > 0L)
    // A = 2·U_b − n_a·n_b; V = n(n−1)(n+1) − Σ(f³−f); both DECIMAL
    val aDec = "(__r2b - CAST(n_b AS DECIMAL(38,0)) * (n_b + 1)" +
      " - CAST(n_a AS DECIMAL(38,0)) * n_b)"
    val nExpr = "(n_a + n_b)"
    val vDec = s"(CAST($nExpr AS DECIMAL(38,0)) * ($nExpr - 1)" +
      s" * ($nExpr + 1) - __t)"
    // overflow pre-guard: double estimates of both cross-products
    // within 10% of DECIMAL(38,0) capacity raise loudly (the q287
    // pattern) — the ~1e-16 relative error is 15 orders below margin
    val lhsD = s"1875.0 * CAST($aDec AS DOUBLE) * CAST($aDec AS DOUBLE)" +
      s" * CAST($nExpr AS DOUBLE) * CAST($nExpr - 1 AS DOUBLE)"
    val rhsD = "2401.0 * CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)" +
      s" * CAST($vDec AS DOUBLE)"
    g.select(col(groupCol), col("n_a"), col("n_b"),
      expr(s"CAST(__r2b - CAST(n_b AS DECIMAL(38,0)) * (n_b + 1)" +
        " AS BIGINT)").as("u_x2"),
      p6(expr(s"""CASE WHEN $vDec = 0 THEN 0.0
        ELSE CAST($aDec AS DOUBLE)
          / (2.0 * sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
              * CAST($vDec AS DOUBLE)
              / (12.0 * CAST($nExpr AS DOUBLE)
                 * CAST($nExpr - 1 AS DOUBLE)))) END""")).as("z"),
      expr(s"""CASE
        WHEN $vDec = 0 THEN false
        WHEN $lhsD > 9e37 OR $rhsD > 9e37
        THEN CAST(raise_error(
          'Hypothesis.mannWhitneyU: cross-multiplied significance operands approach DECIMAL(38,0) capacity; pre-bucket the metric or test per finer group') AS BOOLEAN)
        ELSE CAST(1875 AS DECIMAL(38,0)) * $aDec * $aDec
            * CAST($nExpr AS DECIMAL(19,0)) * ($nExpr - 1)
          > CAST(2401 AS DECIMAL(38,0))
            * CAST(n_a AS DECIMAL(19,0)) * n_b * $vDec
        END""").as("significant"))
  }

  /** Kendall rank correlation tau-b per group over two ORDINAL
    * columns — monotone association robust to heavy ties, where
    * Spearman (q122) needs distinct-ish ranks and Pearson needs
    * linearity. The screen for "does discount actually move
    * quantity?" on bucketed data.
    *
    * Computed from the joint contingency, never row pairs: cells
    * (x, y, f) self-join within group on a.x < b.x (each unordered
    * pair with distinct x exactly once), contributing +f_a·f_b when
    * concordant (a.y < b.y), −f_a·f_b when discordant. S = C − D is
    * exact DECIMAL(38,0). Tie terms stay doubled to avoid any
    * division: with D2x = n(n−1) − Σ_x t_x(t_x−1) (and D2y alike),
    * tau_b = 2S / √(D2x·D2y) — one fixed-order double, pround6;
    * degenerate groups (either factor 0: a constant column) report 0.
    *
    * Scale contract: the self-join is quadratic in DISTINCT (x,y)
    * cells per group — the operator is for bucketed/ordinal data
    * (quantities, deciles, grades), and a group whose cell count
    * exceeds `maxCells` RAISES at execution (guard evaluated on
    * every join input row, so it fires during the scan, before the
    * quadratic output materializes) rather than silently exploding.
    *
    * Scale shape: one hash aggregate to cells, three tiny per-group
    * aggregates (cell count, x-marginals, y-marginals — broadcast
    * back), and the bounded cells self-join on the group key.
    */
  def kendallTau(df: DataFrame, groupCol: String, xCol: String,
                 yCol: String, maxCells: Long = 20000L): DataFrame = {
    require(maxCells >= 1L, s"maxCells must be >= 1, got $maxCells")
    val cells = df
      .filter(col(groupCol).isNotNull && col(xCol).isNotNull &&
        col(yCol).isNotNull)
      .select(col(groupCol).as("__g"), col(xCol).as("__x"),
        col(yCol).as("__y"))
      .groupBy(col("__g"), col("__x"), col("__y"))
      .agg(count(lit(1)).cast("long").as("__f"))
      .localCheckpoint(true)
    val meta = cells.groupBy(col("__g"))
      .agg(count(lit(1)).cast("long").as("__m"),
        sum(col("__f")).cast("long").as("__n"))
    val tx = cells.groupBy(col("__g"), col("__x"))
      .agg(sum(col("__f")).cast("long").as("__tx"))
      .groupBy(col("__g"))
      .agg(sum(col("__tx").cast("decimal(38,0)") * (col("__tx") - 1))
        .as("__sx"))
    val ty = cells.groupBy(col("__g"), col("__y"))
      .agg(sum(col("__f")).cast("long").as("__ty"))
      .groupBy(col("__g"))
      .agg(sum(col("__ty").cast("decimal(38,0)") * (col("__ty") - 1))
        .as("__sy"))
    // guard lives ON the join input rows (a column-pruned guard never
    // executes — round-10 lesson), so an over-budget group raises
    // while scanning, before m² pair rows exist downstream
    val guarded = cells.join(broadcast(meta), Seq("__g"))
      .withColumn("__fg",
        when(col("__m") > maxCells,
          expr(s"CAST(raise_error(concat('Hypothesis.kendallTau: ', " +
            s"CAST(__m AS STRING), ' distinct (x,y) cells in one group " +
            s"exceed maxCells=$maxCells; bucket the columns first')) " +
            "AS BIGINT)"))
          .otherwise(col("__f")))
    val a = guarded.select(col("__g"), col("__x").as("__xa"),
      col("__y").as("__ya"), col("__fg").as("__fa"))
    val b = guarded.select(col("__g"), col("__x").as("__xb"),
      col("__y").as("__yb"), col("__fg").as("__fb"))
    val s = a.join(b, Seq("__g"))
      .filter(col("__xa") < col("__xb") && col("__ya") =!= col("__yb"))
      .groupBy(col("__g"))
      .agg(sum(when(col("__ya") < col("__yb"), lit(1L)).otherwise(lit(-1L))
        * col("__fa").cast("decimal(38,0)") * col("__fb")).as("__s"))
    val d2x = "(CAST(__n AS DECIMAL(38,0)) * (__n - 1) - __sx)"
    val d2y = "(CAST(__n AS DECIMAL(38,0)) * (__n - 1) - __sy)"
    meta.join(tx, Seq("__g")).join(ty, Seq("__g"))
      .join(s, Seq("__g"), "left")
      .withColumn("__s",
        coalesce(col("__s"), lit(0).cast("decimal(38,0)")))
      .select(col("__g").as(groupCol), col("__n").as("n"),
        col("__m").as("n_cells"),
        col("__s").cast("long").as("s"),
        p6(expr(s"""CASE WHEN $d2x = 0 OR $d2y = 0 THEN 0.0
          ELSE 2.0 * CAST(__s AS DOUBLE)
            / sqrt(CAST($d2x AS DOUBLE) * CAST($d2y AS DOUBLE)) END"""))
          .as("tau_b"))
  }

  /** Cliff's delta (≡ the rank-biserial correlation for two samples)
    * per group: the EFFECT SIZE companion to [[mannWhitneyU]] — a
    * significant U on a large corpus can reflect a trivially small
    * shift, and delta is the calibrated "how big": P(b > a) −
    * P(a > b) in [−1, 1], positive when arm 1 stochastically
    * dominates.
    *
    * Shares the midrank contingency identity: with A = 2·U_b −
    * n_a·n_b (exact DECIMAL(38,0), ties cancelling), delta =
    * A / (n_a·n_b) — ONE fixed-order double, pround6. The reported
    * `magnitude` (Romano et al. thresholds: negligible < 0.147 ≤
    * small < 0.330 ≤ medium < 0.474 ≤ large) is decided by exact
    * integer cross-multiplication — 1000·|A| vs threshold·n_a·n_b —
    * never the rounded double.
    *
    * Scale shape: identical to [[mannWhitneyU]] (one hash aggregate
    * to the per-value arm counts, one window over distinct values
    * per group, one final aggregate; no joins). One-arm groups are
    * dropped — no comparison exists.
    */
  def cliffsDelta(df: DataFrame, groupCol: String, armCol: String,
                  valCol: String): DataFrame = {
    val arm = when(col(armCol).cast("long") =!= 0L, 1L).otherwise(0L)
    val cells = df
      .filter(col(groupCol).isNotNull && col(armCol).isNotNull &&
        col(valCol).isNotNull)
      .select(col(groupCol).as("__g"), arm.as("__arm"),
        col(valCol).as("__v"))
      .groupBy(col("__g"), col("__v"))
      .agg(sum(lit(1L) - col("__arm")).cast("long").as("__na"),
        sum(col("__arm")).cast("long").as("__nb"))
    val wPrior = Window.partitionBy(col("__g")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = cells
      .withColumn("__f", col("__na") + col("__nb"))
      .withColumn("__cum",
        coalesce(sum(col("__f")).over(wPrior), lit(0L)))
      .withColumn("__r2", lit(2L) * col("__cum") + col("__f") + lit(1L))
    val g = ranked.groupBy(col("__g").as(groupCol))
      .agg(sum(col("__na")).cast("long").as("n_a"),
        sum(col("__nb")).cast("long").as("n_b"),
        sum(col("__nb").cast("decimal(38,0)") * col("__r2")).as("__r2b"))
      .filter(col("n_a") > 0L && col("n_b") > 0L)
    val aDec = "(__r2b - CAST(n_b AS DECIMAL(38,0)) * (n_b + 1)" +
      " - CAST(n_a AS DECIMAL(38,0)) * n_b)"
    val prod = "(CAST(n_a AS DECIMAL(38,0)) * n_b)"
    g.select(col(groupCol), col("n_a"), col("n_b"),
      p6(expr(s"CAST($aDec AS DOUBLE)" +
        s" / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))")).as("delta"),
      expr(s"""CASE
        WHEN 1000 * abs($aDec) < 147 * $prod THEN 'negligible'
        WHEN 1000 * abs($aDec) < 330 * $prod THEN 'small'
        WHEN 1000 * abs($aDec) < 474 * $prod THEN 'medium'
        ELSE 'large' END""").as("magnitude"))
  }

  /** χ²₁ 5% critical values ×10⁶ for df = k−1 in 1..8 — the
    * `kruskalWallis` significance table, kept integral so the
    * comparison c·W runs in DECIMAL(38,0) micro-units.
    */
  private val chi2Crit6: Map[Int, Long] = Map(
    1 -> 3841459L, 2 -> 5991465L, 3 -> 7814728L, 4 -> 9487729L,
    5 -> 11070498L, 6 -> 12591587L, 7 -> 14067140L, 8 -> 15507313L)

  /** Kruskal–Wallis H per group: the k-arm generalization of
    * [[mannWhitneyU]] — "does ANY of these k cohorts' metric
    * distribution differ?", the distribution-free one-way ANOVA. With
    * midranks R_g per arm, H = 12/(n(n+1))·Σ R_g²/n_g − 3(n+1),
    * tie-corrected H' = H / (1 − ΣT/(n³−n)), compared to the
    * χ²_{k−1} 5% critical value.
    *
    * Exactness under DIVISION: Σ R_g²/n_g is not integral, so the
    * per-arm quotient is split exactly — q = (2R_g)² div n_g and a
    * FLOORED micro-unit remainder (rem·10⁶) div n_g — giving S6u =
    * Σ (q·10⁶ + rem6u), an exact integer within k micro-units below
    * the true Σ (2R_g)²/n_g · 10⁶. Both the reported `h` (one
    * fixed-order double over S6u, pround6) and `significant` derive
    * from it: via H'·W·10⁶ = 3(n−1)·S4u − 3n(n−1)(n+1)²·10⁶, the
    * test compares LHSlow = the S6u version against c₆·W exactly in
    * DECIMAL(38,0); the ≤ k·3(n−1) wide uncertainty band between
    * LHSlow and LHSlow + 3(n−1)·k RAISES as borderline (≈10⁻⁶ of a
    * χ² unit — unreachable off adversarial inputs) instead of
    * guessing. W = n³−n−ΣT = 0 (all values tied) reports h = 0, not
    * significant. One-arm groups are dropped; more than 9 arms
    * raises (the critical table covers df ≤ 8 — bucket the arm
    * column first).
    *
    * Overflow: every operand is ≤ ~12·10⁶·n⁴, inside DECIMAL(38,0)
    * for n ≤ 5·10⁷ rows per group; a double pre-guard RAISES within
    * 10% of capacity (the q287/mannWhitneyU pattern) — past that,
    * test per finer group key.
    *
    * Scale shape: one hash aggregate to (group, value, arm) cells,
    * one window over distinct values per group, two per-group
    * aggregates (per-arm, then closing). No joins beyond the final
    * per-group assembly of broadcast-size frames.
    */
  def kruskalWallis(df: DataFrame, groupCol: String, armCol: String,
                    valCol: String): DataFrame = {
    val cells = df
      .filter(col(groupCol).isNotNull && col(armCol).isNotNull &&
        col(valCol).isNotNull)
      .select(col(groupCol).as("__g"), col(armCol).as("__arm"),
        col(valCol).as("__v"))
      .groupBy(col("__g"), col("__arm"), col("__v"))
      .agg(count(lit(1)).cast("long").as("__c"))
      .localCheckpoint(true)
    // per-(group,value) totals drive BOTH the midrank window and the
    // tie term — the arm dimension folds out first
    val perV = cells.groupBy(col("__g"), col("__v"))
      .agg(sum(col("__c")).cast("long").as("__f"))
    val wPrior = Window.partitionBy(col("__g")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = perV
      .withColumn("__cum",
        coalesce(sum(col("__f")).over(wPrior), lit(0L)))
      .withColumn("__r2", lit(2L) * col("__cum") + col("__f") + lit(1L))
    val ties = ranked.groupBy(col("__g"))
      .agg(sum(col("__f").cast("decimal(38,0)") * col("__f") * col("__f")
        - col("__f")).as("__t"))
    // per-arm: n_g and the EXACT micro-unit quotient (2R_g)²/n_g
    val perArm = cells
      .join(ranked.select(col("__g"), col("__v"), col("__r2")),
        Seq("__g", "__v"))
      .groupBy(col("__g"), col("__arm"))
      .agg(sum(col("__c")).cast("long").as("__ng"),
        sum(col("__c").cast("decimal(38,0)") * col("__r2")).as("__r2g"))
      .withColumn("__r2sq", col("__r2g") * col("__r2g"))
      .withColumn("__rem", expr("CAST(pmod(__r2sq, __ng) AS DECIMAL(38,0))"))
      .withColumn("__q",
        expr("CAST((__r2sq - __rem) / __ng AS DECIMAL(38,0))"))
      .withColumn("__rem6",
        expr("CAST((CAST(__rem * 1000000 AS DECIMAL(38,0))" +
          " - pmod(__rem * 1000000, __ng)) / __ng AS DECIMAL(38,0))"))
    val g = perArm.groupBy(col("__g").as(groupCol))
      .agg(sum(col("__ng")).cast("long").as("n"),
        count(lit(1)).cast("long").as("k_arms"),
        sum(col("__q") * 1000000 + col("__rem6")).as("__s6u"))
      .filter(col("k_arms") >= 2L)
    val assembled = g.join(
      ties.withColumnRenamed("__g", groupCol), Seq(groupCol))
    val w = "(CAST(n AS DECIMAL(38,0)) * (n - 1) * (n + 1) - __t)"
    // LHSlow = 3(n−1)·S6u − 3n(n−1)(n+1)²·10⁶ ≤ H'·W·10⁶ < LHSlow + 3(n−1)·k
    val lhsLow = s"(CAST(3 AS DECIMAL(38,0)) * (n - 1) * __s6u" +
      s" - CAST(3000000 AS DECIMAL(38,0)) * n * (n - 1) * (n + 1) * (n + 1))"
    val c6 = "(CASE k_arms " +
      chi2Crit6.toSeq.sorted.map { case (df, c) =>
        s"WHEN ${df + 1} THEN CAST($c AS DECIMAL(38,0)) "
      }.mkString +
      "ELSE CAST(raise_error('Hypothesis.kruskalWallis: more than 9 arms" +
      " — the chi-square critical table covers df <= 8; bucket the arm" +
      " column first') AS DECIMAL(38,0)) END)"
    // double pre-guard: both comparison sides stay well inside
    // DECIMAL(38,0); ~12e6·n⁴ crosses 9e37 near n = 5e7 per group
    val guardD = "(12.0e6 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)" +
      " * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))"
    // the capacity guard lives in BOTH output columns: a caller that
    // selects only `h` prunes `significant` and any guard inside it
    // (the round-10 pruned-guard lesson), so `h` must carry its own
    assembled.select(col(groupCol), col("n"), col("k_arms"),
      p6(expr(s"""CASE
        WHEN $guardD > 8.1e37
        THEN double(raise_error(
          'Hypothesis.kruskalWallis: operands approach DECIMAL(38,0) capacity; test per finer group'))
        WHEN $w = 0 THEN 0.0
        ELSE (3.0 * CAST(n - 1 AS DOUBLE)
            * (CAST(__s6u AS DOUBLE) / 1000000.0)
          - 3.0 * CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)
            * CAST(n + 1 AS DOUBLE) * CAST(n + 1 AS DOUBLE))
          / CAST($w AS DOUBLE) END""")).as("h"),
      expr(s"""CASE
        WHEN $w = 0 THEN false
        WHEN $guardD > 8.1e37
        THEN CAST(raise_error(
          'Hypothesis.kruskalWallis: significance operands approach DECIMAL(38,0) capacity; test per finer group') AS BOOLEAN)
        WHEN $lhsLow > $c6 * $w THEN true
        WHEN $lhsLow + CAST(3 AS DECIMAL(38,0)) * (n - 1) * k_arms
          <= $c6 * $w THEN false
        ELSE CAST(raise_error(
          'Hypothesis.kruskalWallis: statistic within the floored micro-unit band of the critical value — borderline beyond exact resolution') AS BOOLEAN)
        END""").as("significant"))
  }

  /** McNemar's test per group: did two PAIRED binary decisions
    * disagree beyond symmetric noise? The filter-migration audit —
    * "the new quality gate flips some keeps to drops and some drops
    * to keeps; is the flip asymmetric (a real behavior change) or
    * coin-flip churn?" Only the discordant cells matter: with b01 =
    * (a=0, b=1) and b10 = (a=1, b=0), χ²₁ = (b01−b10)²/(b01+b10).
    *
    * ENTIRELY exact: both counts are BIGINTs and `significant`
    * cross-multiplies 10⁶·(b01−b10)² > 3841459·(b01+b10) in
    * DECIMAL(38,0) — the rounded chi2 double is never load-bearing.
    * No discordant pairs (b01+b10 = 0) reports chi2 0, not
    * significant. Scale shape: ONE hash aggregate. Nothing else.
    */
  def mcnemar(df: DataFrame, groupCol: String, aCol: String,
              bCol: String): DataFrame = {
    val a = col(aCol).cast("long") =!= 0L
    val b = col(bCol).cast("long") =!= 0L
    df.filter(col(groupCol).isNotNull && col(aCol).isNotNull &&
        col(bCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(when(!a && b, 1L).otherwise(0L)).cast("long").as("b01"),
        sum(when(a && !b, 1L).otherwise(0L)).cast("long").as("b10"))
      .select(col(groupCol), col("n"), col("b01"), col("b10"),
        p6(expr("""CASE WHEN b01 + b10 = 0 THEN 0.0
          ELSE CAST(b01 - b10 AS DOUBLE) * CAST(b01 - b10 AS DOUBLE)
            / CAST(b01 + b10 AS DOUBLE) END""")).as("chi2"),
        expr("""CASE WHEN b01 + b10 = 0 THEN false
          ELSE CAST(1000000 AS DECIMAL(38,0)) * (b01 - b10) * (b01 - b10)
            > CAST(3841459 AS DECIMAL(38,0)) * (b01 + b10) END""")
          .as("significant"))
  }

  /** Cochran's Q per group: do k PAIRED binary treatments (k screens
    * over the same documents, k model versions' keep decisions)
    * differ in success rate? The k-treatment generalization of
    * [[mcnemar]]. With per-treatment success totals T_c and per-item
    * row sums R_i,
    *   Q = (k−1)·(k·ΣT_c² − (ΣT_c)²) / (k·ΣR_i − ΣR_i²)
    * compared to χ²_{k−1}.
    *
    * ENTIRELY exact — binary data makes every term integral:
    * `significant` compares 10⁶·(k−1)·num > c₆·den in DECIMAL(38,0)
    * against the ×10⁶ critical table (df ≤ 8 — more raises, as
    * kruskalWallis). Items where every treatment agrees contribute
    * nothing to den; an all-agree group (den = 0) is degenerate:
    * Q = 0, not significant. Rows with any NULL treatment are
    * dropped (pairing must be complete).
    *
    * Scale shape: one per-item projection (row sums are row-local —
    * k is the column count), one hash aggregate per group. No
    * explode, no window, no join.
    */
  def cochranQ(df: DataFrame, groupCol: String,
               treatmentCols: Seq[String]): DataFrame = {
    val k = treatmentCols.size
    require(k >= 2 && k <= 9,
      s"cochranQ needs 2..9 treatments (chi-square table df <= 8): $k")
    val bits = treatmentCols.map(c =>
      when(col(c).cast("long") =!= 0L, 1L).otherwise(0L))
    val rowSum = bits.reduce(_ + _)
    val base = df.filter(col(groupCol).isNotNull &&
        treatmentCols.map(col(_).isNotNull).reduce(_ && _))
      .select(col(groupCol).as("__g") +: rowSum.as("__r") +:
        bits.zipWithIndex.map { case (c, i) => c.as(s"__t$i") }: _*)
    val agg = base.groupBy(col("__g"))
      .agg(count(lit(1)).cast("long").as("n_items"),
        Seq(sum(col("__r")).cast("decimal(38,0)").as("__sr"),
          sum(col("__r").cast("decimal(38,0)") * col("__r")).as("__sr2")) ++
        bits.indices.map(i =>
          sum(col(s"__t$i")).cast("long").as(s"__T$i")): _*)
    val st = bits.indices.map(i => s"CAST(__T$i AS DECIMAL(38,0))")
    val sumT = st.mkString("(", " + ", ")")
    val sumT2 = st.map(t => s"$t * $t").mkString("(", " + ", ")")
    val num = s"($k * $sumT2 - $sumT * $sumT)"
    val den = s"($k * __sr - __sr2)"
    val c6 = chi2Crit6(k - 1)
    agg.select(col("__g").as(groupCol), col("n_items"),
      lit(k.toLong).as("k_treatments"),
      p6(expr(s"""CASE WHEN $den = 0 THEN 0.0
        ELSE ${k - 1}.0 * CAST($num AS DOUBLE) / CAST($den AS DOUBLE)
        END""")).as("q"),
      expr(s"""CASE WHEN $den = 0 THEN false
        ELSE CAST(1000000 AS DECIMAL(38,0)) * ${k - 1} * $num
          > CAST($c6 AS DECIMAL(38,0)) * $den END""").as("significant"))
  }

  /** Cochran–Armitage trend test per group: does a binary outcome's
    * rate TREND across ordered buckets (discount bands, quality
    * deciles, dose levels)? The chi-square independence test (q252)
    * sees "different somewhere"; this scores the one-degree
    * "monotone in the bucket index" alternative, which is almost
    * always the question.
    *
    * With bucket weights w = the bucket's own integer value, per-
    * bucket trials n_i and successes k_i, N = Σn, K = Σk:
    *   A = N·Σw·k − K·Σw·n,   B = N·Σw²·n − (Σw·n)²
    *   z² = N·A² / (K·(N−K)·B)
    * — all exact DECIMAL(38,0); `significant` cross-multiplies
    * 10⁶·N·A² > 3841459·K·(N−K)·B with a double pre-guard that
    * RAISES within 10% of DECIMAL(38,0) capacity (the q287
    * pattern). Degenerate inputs (all success/all failure: K·(N−K)
    * = 0, or a single bucket: B = 0) report chi2 0, not significant.
    *
    * Scale shape: one (group, bucket) hash aggregate, one per-group
    * aggregate. No windows, no joins.
    */
  def cochranArmitage(df: DataFrame, groupCol: String, bucketCol: String,
                      successCol: String): DataFrame = {
    val s = when(col(successCol).cast("long") =!= 0L, 1L).otherwise(0L)
    val per = df.filter(col(groupCol).isNotNull &&
        col(bucketCol).isNotNull && col(successCol).isNotNull)
      .select(col(groupCol).as("__g"),
        col(bucketCol).cast("long").as("__w"), s.as("__s"))
      .groupBy(col("__g"), col("__w"))
      .agg(count(lit(1)).cast("long").as("__n"),
        sum(col("__s")).cast("long").as("__k"))
    val agg = per.groupBy(col("__g"))
      .agg(sum(col("__n")).cast("long").as("n"),
        sum(col("__k")).cast("long").as("k_succ"),
        sum(col("__w").cast("decimal(38,0)") * col("__k")).as("__swk"),
        sum(col("__w").cast("decimal(38,0)") * col("__n")).as("__swn"),
        sum(col("__w").cast("decimal(38,0)") * col("__w") * col("__n"))
          .as("__sw2n"))
    val aX = "(CAST(n AS DECIMAL(38,0)) * __swk" +
      " - CAST(k_succ AS DECIMAL(38,0)) * __swn)"
    val bX = "(CAST(n AS DECIMAL(38,0)) * __sw2n - __swn * __swn)"
    val kk = "(CAST(k_succ AS DECIMAL(38,0)) * (n - k_succ))"
    // double pre-guard: 10⁶·N·A² is the largest operand
    val guardD = "(1.0e6 * CAST(n AS DOUBLE)" +
      s" * CAST($aX AS DOUBLE) * CAST($aX AS DOUBLE))"
    agg.select(col("__g").as(groupCol), col("n"), col("k_succ"),
      p6(expr(s"""CASE WHEN $kk = 0 OR $bX = 0 THEN 0.0
        ELSE CAST(n AS DOUBLE) * CAST($aX AS DOUBLE)
          * CAST($aX AS DOUBLE)
          / (CAST($kk AS DOUBLE) * CAST($bX AS DOUBLE)) END"""))
        .as("chi2"),
      expr(s"""CASE
        WHEN $kk = 0 OR $bX = 0 THEN false
        WHEN $guardD > 8.1e37
        THEN CAST(raise_error(
          'Hypothesis.cochranArmitage: cross-multiplied significance operands approach DECIMAL(38,0) capacity; recenter the bucket weights or test per finer group') AS BOOLEAN)
        ELSE CAST(1000000 AS DECIMAL(38,0)) * n * $aX * $aX
          > CAST(3841459 AS DECIMAL(38,0)) * $kk * $bX END""")
        .as("significant"))
  }

  /** Wald's SPRT (sequential probability ratio test) card per group:
    * given a designed null rate p0 and alternative p1, where does the
    * accumulated evidence stand NOW — `accept_h1` (the rate shifted),
    * `accept_h0` (it did not), or `continue` (keep collecting)? The
    * sequential companion to the fixed-horizon q287 z-test: a
    * curation rollout reads this card per batch and STOPS EARLY the
    * moment a boundary is crossed, instead of waiting for a
    * pre-committed sample size.
    *
    * With k successes in n trials, the log-likelihood ratio is
    *   LLR = k·ln(p1/p0) + (n−k)·ln((1−p1)/(1−p0))
    * against Wald's boundaries upper = ln((1−β)/α), lower =
    * ln(β/(1−α)). The four transcendentals are computed ONCE here (on
    * the driver) and embedded as shortest-roundtrip double literals —
    * the oracle embeds the SAME literals, so both engines compare
    * identical doubles (the q306 DCG-discount discipline). LLR is ONE
    * fixed-order double over the exact BIGINT (k, n), pround6 for
    * display; the DECISION compares the raw double.
    *
    * Scale shape: ONE hash aggregate. Nothing else.
    */
  def sprt(df: DataFrame, groupCol: String, successCol: String,
           p0: Double, p1: Double, alpha: Double = 0.05,
           beta: Double = 0.2): DataFrame = {
    require(p0 > 0 && p1 > 0 && p0 < 1 && p1 < 1 && p0 != p1,
      s"need 0 < p0,p1 < 1 and p0 != p1: p0=$p0 p1=$p1")
    require(alpha > 0 && alpha < 1 && beta > 0 && beta < 1,
      s"need 0 < alpha,beta < 1: alpha=$alpha beta=$beta")
    val c1 = math.log(p1 / p0)
    val c0 = math.log((1.0 - p1) / (1.0 - p0))
    val up = math.log((1.0 - beta) / alpha)
    val lo = math.log(beta / (1.0 - alpha))
    val s = when(col(successCol).cast("long") =!= 0L, 1L).otherwise(0L)
    // every embedded Scala double is CAST(... AS DOUBLE)-pinned: a bare
    // decimal literal in SQL text parses as DECIMAL first and relies on
    // value-preserving coercion (the wilsonLowerBound discipline)
    val llr = s"(CAST(k AS DOUBLE) * CAST($c1 AS DOUBLE)" +
      s" + CAST(n - k AS DOUBLE) * CAST($c0 AS DOUBLE))"
    df.filter(col(groupCol).isNotNull && col(successCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(s).cast("long").as("k"))
      .select(col(groupCol), col("n"), col("k"),
        p6(expr(llr)).as("llr"),
        expr(s"""CASE WHEN $llr >= CAST($up AS DOUBLE) THEN 'accept_h1'
          WHEN $llr <= CAST($lo AS DOUBLE) THEN 'accept_h0'
          ELSE 'continue' END""").as("decision"))
  }

  /** Cochran–Mantel–Haenszel test per group: does an exposure
    * associate with a binary outcome AFTER CONTROLLING for a
    * confounding stratum? The stratified upgrade of the q252
    * chi-square and the significance companion to [[riskCard]]'s
    * magnitudes — "discounted lines return more often" can be pure
    * Simpson's paradox unless the line status is held fixed; CMH
    * pools the per-stratum 2×2 evidence without ever mixing strata.
    *
    * Per stratum (cells a=exposed∧outcome, margins r1=a+b, r2=c+d,
    * k1=a+c, k2=b+d, n): E = r1·k1/n and V = r1·r2·k1·k2/(n²(n−1))
    * are rationals — both are floored to EXACT micro-units in
    * DECIMAL(38,0) (the kruskalWallis split), summed per group, and
    *   χ² = D²/(V·10⁶),   D = Σ(a·10⁶ − E_μ)
    * `significant` brackets the per-stratum floor slack (< 1
    * micro-unit each, K strata): sure-true when (|D|−K)² beats
    * c₆·(V+K) with |D| > K, sure-false when (|D|+K)² fails c₆·V, and
    * RAISES in the borderline band beyond exact resolution. Strata
    * with n < 2 are dropped (V undefined; their D contribution is 0
    * only when degenerate anyway); a group with ΣV = 0 reports χ² 0.
    * A double pre-guard RAISES near DECIMAL(38,0) capacity.
    *
    * Scale shape: one (group, stratum) 2×2 hash aggregate, one group
    * rollup. No windows, no joins.
    */
  def cmh(df: DataFrame, groupCol: String, strataCol: String,
          exposedCol: String, outcomeCol: String): DataFrame = {
    val e = col(exposedCol).cast("long") =!= 0L
    val o = col(outcomeCol).cast("long") =!= 0L
    val cells = df.filter(col(groupCol).isNotNull &&
        col(strataCol).isNotNull && col(exposedCol).isNotNull &&
        col(outcomeCol).isNotNull)
      .groupBy(col(groupCol).as("__g"), col(strataCol).as("__s"))
      .agg(count(lit(1)).cast("long").as("__n"),
        sum(when(e && o, 1L).otherwise(0L)).cast("long").as("__a"),
        sum(when(e && !o, 1L).otherwise(0L)).cast("long").as("__b"),
        sum(when(!e && o, 1L).otherwise(0L)).cast("long").as("__c"))
      .filter(col("__n") >= 2L)
    val r1 = "(CAST(__a AS DECIMAL(38,0)) + __b)"
    val k1 = "(CAST(__a AS DECIMAL(38,0)) + __c)"
    val r2 = "(CAST(__n AS DECIMAL(38,0)) - __a - __b)"
    val k2 = "(CAST(__n AS DECIMAL(38,0)) - __a - __c)"
    val eMu = s"($r1 * $k1 * 1000000 DIV __n)"
    val vMu = s"($r1 * $r2 * $k1 * $k2 * 1000000" +
      " DIV (CAST(__n AS DECIMAL(38,0)) * __n * (__n - 1)))"
    // the V-side product r1·r2·k1·k2·10⁶ (≤ n⁴/16·10⁶) dominates every
    // overflowing term, so ITS bound is the guard (the round-10
    // dominating-operand lesson): n ≤ 1.5e8 keeps it under 3.3e37.
    // The guard lives in the __v column the group rollup always sums.
    val vGuarded = s"""CASE WHEN __n > 150000000
      THEN CAST(raise_error(
        'Hypothesis.cmh: stratum of more than 1.5e8 rows would overflow DECIMAL(38,0) in the variance product; sub-stratify first') AS DECIMAL(38,0))
      ELSE $vMu END"""
    val agg = cells
      .select(col("__g"), col("__n"), col("__a"),
        expr(s"CAST(__a AS DECIMAL(38,0)) * 1000000 - $eMu").as("__d"),
        expr(vGuarded).as("__v"))
      .groupBy(col("__g"))
      .agg(sum(col("__n")).cast("long").as("n"),
        count(lit(1)).cast("long").as("k_strata"),
        sum(col("__d")).cast("decimal(38,0)").as("__dd"),
        sum(col("__v")).cast("decimal(38,0)").as("__vv"))
    // double pre-guard: (|D|+K)² is the largest operand
    val guardD = "((abs(CAST(__dd AS DOUBLE)) + CAST(k_strata AS DOUBLE))" +
      " * (abs(CAST(__dd AS DOUBLE)) + CAST(k_strata AS DOUBLE)))"
    val absD = "(abs(__dd))"
    agg.select(col("__g").as(groupCol), col("n"), col("k_strata"),
      p6(expr(s"""CASE
        WHEN $guardD > 8.1e37
        THEN double(raise_error(
          'Hypothesis.cmh: operands approach DECIMAL(38,0) capacity; test per finer group'))
        WHEN __vv = 0 THEN 0.0
        ELSE CAST(__dd AS DOUBLE) * CAST(__dd AS DOUBLE)
          / (CAST(__vv AS DOUBLE) * 1.0e6) END""")).as("chi2"),
      expr(s"""CASE
        WHEN __vv = 0 THEN false
        WHEN $guardD > 8.1e37
        THEN CAST(raise_error(
          'Hypothesis.cmh: significance operands approach DECIMAL(38,0) capacity; test per finer group') AS BOOLEAN)
        WHEN $absD > k_strata AND ($absD - k_strata) * ($absD - k_strata)
          > CAST(3841459 AS DECIMAL(38,0)) * (__vv + k_strata) THEN true
        WHEN ($absD + k_strata) * ($absD + k_strata)
          <= CAST(3841459 AS DECIMAL(38,0)) * __vv THEN false
        ELSE CAST(raise_error(
          'Hypothesis.cmh: statistic within the floored micro-unit band of the critical value — borderline beyond exact resolution') AS BOOLEAN)
        END""").as("significant"))
  }

  /** Mantel–Haenszel pooled odds ratio per group — [[cmh]]'s effect
    * MAGNITUDE: the common odds ratio across strata, OR_MH =
    * Σ(aᵢdᵢ/nᵢ) / Σ(bᵢcᵢ/nᵢ), weighting each stratum by its
    * information. Read the pair together: cmh says "the association
    * survives the confounder", this says "and it is a ×1.8 odds
    * shift". Unlike a naive pooled-table OR, OR_MH cannot be
    * Simpson-flipped by imbalanced strata.
    *
    * Exactness: each stratum's aᵢdᵢ/nᵢ and bᵢcᵢ/nᵢ floor to exact
    * micro-units in DECIMAL(38,0) (the kruskalWallis split), the
    * micro-unit sums are exact, and the closing ratio is one exact
    * floored ppm division (the scales cancel). A zero discordant sum
    * (no stratum has any b·c mass) reports NULL — an infinite OR is
    * a real state, not an error. Strata with n < 1 cannot exist;
    * nothing is dropped.
    *
    * Scale shape: one (group, stratum) 2×2 hash aggregate, one group
    * rollup. No windows, no joins.
    */
  def mhOddsRatio(df: DataFrame, groupCol: String, strataCol: String,
                  exposedCol: String, outcomeCol: String): DataFrame = {
    val e = col(exposedCol).cast("long") =!= 0L
    val o = col(outcomeCol).cast("long") =!= 0L
    val cells = df.filter(col(groupCol).isNotNull &&
        col(strataCol).isNotNull && col(exposedCol).isNotNull &&
        col(outcomeCol).isNotNull)
      .groupBy(col(groupCol).as("__g"), col(strataCol).as("__s"))
      .agg(count(lit(1)).cast("long").as("__n"),
        sum(when(e && o, 1L).otherwise(0L)).cast("long").as("__a"),
        sum(when(e && !o, 1L).otherwise(0L)).cast("long").as("__b"),
        sum(when(!e && o, 1L).otherwise(0L)).cast("long").as("__c"))
    val dCell = "(__n - __a - __b - __c)"
    val numMu = s"(CAST(__a AS DECIMAL(38,0)) * $dCell * 1000000 DIV __n)"
    val denMu = "(CAST(__b AS DECIMAL(38,0)) * __c * 1000000 DIV __n)"
    cells
      .select(col("__g"), col("__n"),
        expr(numMu).as("__num"), expr(denMu).as("__den"))
      .groupBy(col("__g"))
      .agg(sum(col("__n")).cast("long").as("n"),
        count(lit(1)).cast("long").as("k_strata"),
        sum(col("__num")).cast("decimal(38,0)").as("__sn"),
        sum(col("__den")).cast("decimal(38,0)").as("__sd"))
      .select(col("__g").as(groupCol), col("n"), col("k_strata"),
        expr("""CASE WHEN __sd = 0 THEN NULL
          ELSE CAST(__sn * 1000000 DIV __sd AS BIGINT) END""")
          .as("or_mh_ppm"))
  }

  /** Mann–Kendall trend test per group: is a TIME SERIES
    * monotonically trending? S = Σ_{i<j} sign(y_j − y_i) over the
    * time order — [[kendallTau]]'s numerator against time itself —
    * with the tie-corrected variance
    *   18·V = n(n−1)(2n+5) − Σ_y t(t−1)(2t+5)
    * which keeps EVERYTHING integral: `significant` compares
    * 18·10⁶·(|S|−1)² > 3841459·V18 in exact DECIMAL(38,0) (the
    * continuity-corrected z², no floor anywhere), and the reported z
    * is one fixed-order double. The trend-direction companion to
    * q163's slope (which sizes the trend) and q261's Theil–Sen
    * (which fits it robustly): MK answers "is it REAL?".
    *
    * The series contract: ONE observation per (group, time) — the
    * operator RAISES on duplicate times (aggregate to a period
    * first), so x-ties never enter the variance. Pair counting rides
    * [[kendallTau]]'s guarded cell self-join machinery — distinct
    * (x, y) cells per group are capped by `maxCells` and an
    * over-budget group raises while scanning.
    *
    * Output: group, `n`, `s_stat`, `z`, `significant`.
    */
  def mannKendall(df: DataFrame, groupCol: String, xCol: String,
                  yCol: String, maxCells: Long = 20000L): DataFrame = {
    require(maxCells >= 1L, s"maxCells must be >= 1, got $maxCells")
    val cells = df
      .filter(col(groupCol).isNotNull && col(xCol).isNotNull &&
        col(yCol).isNotNull)
      .select(col(groupCol).as("__g"), col(xCol).as("__x"),
        col(yCol).as("__y"))
      .groupBy(col("__g"), col("__x"))
      .agg(count(lit(1)).cast("long").as("__cx"),
        max(col("__y")).as("__y"))
      .withColumn("__y",
        when(col("__cx") > 1L,
          expr("raise_error('Hypothesis.mannKendall: duplicate " +
            "observations at one time point — aggregate to a period " +
            "first (one row per (group, time))')"))
          .otherwise(col("__y")))
      .localCheckpoint(true)
    val meta = cells.groupBy(col("__g"))
      .agg(count(lit(1)).cast("long").as("__n"))
    val ties = cells.groupBy(col("__g"), col("__y"))
      .agg(count(lit(1)).cast("long").as("__t"))
      .groupBy(col("__g"))
      .agg(sum(col("__t").cast("decimal(38,0)") * (col("__t") - 1) *
        (lit(2L) * col("__t") + lit(5L))).as("__ty"))
    val guarded = cells.join(broadcast(meta), Seq("__g"))
      .withColumn("__k",
        when(col("__n") > maxCells,
          expr(s"CAST(raise_error(concat('Hypothesis.mannKendall: ', " +
            s"CAST(__n AS STRING), ' time points in one group exceed " +
            s"maxCells=$maxCells; aggregate to a coarser period')) " +
            "AS BIGINT)"))
          .otherwise(lit(1L)))
    val a = guarded.select(col("__g"), col("__x").as("__xa"),
      col("__y").as("__ya"), col("__k").as("__ka"))
    val b = guarded.select(col("__g"), col("__x").as("__xb"),
      col("__y").as("__yb"), col("__k").as("__kb"))
    val s = a.join(b, Seq("__g"))
      .filter(col("__xa") < col("__xb") && col("__ya") =!= col("__yb"))
      .groupBy(col("__g"))
      .agg(sum(when(col("__ya") < col("__yb"), lit(1L)).otherwise(lit(-1L))
        * col("__ka").cast("decimal(38,0)") * col("__kb")).as("__s"))
    val v18 = "(CAST(__n AS DECIMAL(38,0)) * (__n - 1)" +
      " * (2 * __n + 5) - __ty)"
    meta.join(ties, Seq("__g")).join(s, Seq("__g"), "left")
      .withColumn("__s",
        coalesce(col("__s"), lit(0).cast("decimal(38,0)")))
      .select(col("__g").as(groupCol), col("__n").as("n"),
        col("__s").cast("long").as("s_stat"),
        p6(expr(s"""CASE WHEN $v18 = 0 OR __s = 0 THEN 0.0
          ELSE (CAST(__s AS DOUBLE)
              - CAST(sign(CAST(__s AS DOUBLE)) AS DOUBLE))
            / sqrt(CAST($v18 AS DOUBLE) / 18.0) END""")).as("z"),
        expr(s"""CASE WHEN $v18 = 0 OR __s = 0 THEN false
          ELSE CAST(18000000 AS DECIMAL(38,0))
              * (abs(__s) - 1) * (abs(__s) - 1)
            > CAST(3841459 AS DECIMAL(38,0)) * $v18 END""")
          .as("significant"))
  }

  /** Two-window Poisson rate test per group: did the event RATE (per
    * unit exposure) change between two observation windows? The
    * conditional score test: with k0/k1 events over exposures e0/e1,
    *   χ² = (k1·e0 − k0·e1)² / (e0·e1·(k0+k1))
    * — EVERYTHING integral, so `significant` cross-multiplies
    * 10⁶·(k1e0−k0e1)² > 3841459·e0·e1·(k0+k1) in exact DECIMAL(38,0)
    * with a double capacity pre-guard that RAISES. The rate-change
    * companion to q287 (which tests a PROPORTION, not a rate): use
    * this when the denominators are time, not trials. Rates and the
    * rate ratio report as exact floored micro-units per exposure
    * unit; k0 = 0 makes the ratio NULL (a new behavior, not an
    * error). k0+k1 = 0 is degenerate: χ² 0, not significant.
    *
    * Exposures are CALLER-SUPPLIED constants (window lengths are a
    * design choice, not data — deriving them from observed min/max
    * timestamps would bias the rate). Scale shape: ONE hash
    * aggregate. Nothing else.
    */
  def poissonRateTest(df: DataFrame, groupCol: String, armCol: String,
                      exposure0: Long, exposure1: Long): DataFrame = {
    require(exposure0 > 0 && exposure1 > 0,
      s"exposures must be positive: $exposure0, $exposure1")
    val a = col(armCol).cast("long") =!= 0L
    val dX = s"(CAST(k1 AS DECIMAL(38,0)) * $exposure0" +
      s" - CAST(k0 AS DECIMAL(38,0)) * $exposure1)"
    val vX = s"(CAST($exposure0 AS DECIMAL(38,0)) * $exposure1 * (k0 + k1))"
    // both comparison sides get a double pre-guard — dX² can be tiny
    // under the null while e0·e1·(k0+k1) alone overflows (the
    // dominating-operand lesson), so V is watched separately
    val guardD = s"(1.0e6 * CAST($dX AS DOUBLE) * CAST($dX AS DOUBLE)" +
      s" + CAST($exposure0 AS DOUBLE) * CAST($exposure1 AS DOUBLE)" +
      " * CAST(k0 + k1 AS DOUBLE))"
    df.filter(col(groupCol).isNotNull && col(armCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(sum(when(!a, 1L).otherwise(0L)).cast("long").as("k0"),
        sum(when(a, 1L).otherwise(0L)).cast("long").as("k1"))
      .select(col(groupCol), col("k0"), col("k1"),
        expr(s"CAST(CAST(k0 AS DECIMAL(38,0)) * 1000000 DIV $exposure0" +
          " AS BIGINT)").as("rate0_upm"),
        expr(s"CAST(CAST(k1 AS DECIMAL(38,0)) * 1000000 DIV $exposure1" +
          " AS BIGINT)").as("rate1_upm"),
        expr(s"""CASE WHEN k0 = 0 THEN NULL
          ELSE CAST(CAST(k1 AS DECIMAL(38,0)) * $exposure0 * 1000000
            DIV (CAST(k0 AS DECIMAL(38,0)) * $exposure1) AS BIGINT)
          END""").as("ratio_ppm"),
        p6(expr(s"""CASE
          WHEN $guardD > 8.1e37
          THEN double(raise_error(
            'Hypothesis.poissonRateTest: operands approach DECIMAL(38,0) capacity; test per finer group'))
          WHEN k0 + k1 = 0 THEN 0.0
          ELSE CAST($dX AS DOUBLE) * CAST($dX AS DOUBLE)
            / CAST($vX AS DOUBLE) END""")).as("chi2"),
        expr(s"""CASE
          WHEN k0 + k1 = 0 THEN false
          WHEN $guardD > 8.1e37
          THEN CAST(raise_error(
            'Hypothesis.poissonRateTest: significance operands approach DECIMAL(38,0) capacity; test per finer group') AS BOOLEAN)
          ELSE CAST(1000000 AS DECIMAL(38,0)) * $dX * $dX
            > CAST(3841459 AS DECIMAL(38,0)) * $vX END""")
          .as("significant"))
  }

  /** Friedman test per group: do k PAIRED numeric treatments (k
    * ranking functions scored on the same documents, k line positions'
    * quantities on the same orders) have systematically different
    * values? The rank-based repeated-measures analogue of
    * [[cochranQ]] (which needs binary data) and the paired
    * counterpart of [[kruskalWallis]] (which assumes independent
    * arms). Each block ranks its own k values (midranks on ties), so
    * block-level scale differences cancel by construction.
    *
    * ENTIRELY exact via DOUBLED midranks, which are integers:
    * 2·r_ij = 2·#{l: v_l < v_j} + #{l: v_l = v_j} + 1 — row-local, k²
    * comparisons per block. With S_j = Σ_i 2r_ij and the tie-corrected
    * statistic
    *   χ² = (k−1)·(ΣS_j² − n²k(k+1)²) / (Σ(2r_ij)² − nk(k+1)²)
    * every term is integral (the ÷4 cancels), so `significant`
    * cross-multiplies 10⁶·(k−1)·num > c₆·den in DECIMAL(38,0)
    * against the χ²_{k−1} ×10⁶ critical table, with the
    * cochranArmitage double pre-guard that RAISES near DECIMAL
    * capacity. All-tied blocks contribute nothing to den; a fully
    * degenerate group (den = 0) reports χ² 0, not significant.
    *
    * Scale shape: one row-local doubled-rank projection (k ≤ 9), ONE
    * hash aggregate per group. No windows, no joins, no explode.
    */
  def friedman(df: DataFrame, groupCol: String,
               treatmentCols: Seq[String]): DataFrame = {
    val k = treatmentCols.size
    require(k >= 2 && k <= 9,
      s"friedman needs 2..9 treatments (chi-square table df <= 8): $k")
    val vs = treatmentCols.map(c => col(c).cast("double"))
    def r2(j: Int) = vs.map(v =>
      when(v < vs(j), 2L).otherwise(0L) +
        when(v === vs(j), 1L).otherwise(0L)).reduce(_ + _) + lit(1L)
    val base = df.filter(col(groupCol).isNotNull &&
        treatmentCols.map(col(_).isNotNull).reduce(_ && _))
      .select(col(groupCol).as("__g") +:
        treatmentCols.indices.map(j => r2(j).as(s"__r$j")): _*)
    val sq = treatmentCols.indices.map(j =>
      col(s"__r$j").cast("decimal(38,0)") * col(s"__r$j"))
    val agg = base.groupBy(col("__g"))
      .agg(count(lit(1)).cast("long").as("n_blocks"),
        Seq(sum(sq.reduce(_ + _)).as("__sr2")) ++
          treatmentCols.indices.map(j =>
            sum(col(s"__r$j")).cast("decimal(38,0)").as(s"__S$j")): _*)
    val sumS2 = treatmentCols.indices
      .map(j => s"__S$j * __S$j").mkString("(", " + ", ")")
    val kk1 = k.toLong * (k + 1) * (k + 1)
    val num = s"($sumS2 - CAST(n_blocks AS DECIMAL(38,0)) * n_blocks * $kk1)"
    val den = s"(__sr2 - CAST(n_blocks AS DECIMAL(38,0)) * $kk1)"
    val c6 = chi2Crit6(k - 1)
    // guard the DOMINATING operand: ΣS_j² ≤ 4k³·n², times the 10⁶(k−1)
    // cross-multiplier — watching num alone misses a null-hypothesis
    // group where num ≈ 0 but the squares overflow; and the guard
    // lives in BOTH output columns (the pruned-guard lesson)
    val gCoef = 1.0e6 * (k - 1).toDouble *
      (4.0 * k * k * k + k.toDouble * (k + 1) * (k + 1))
    val guardD = s"($gCoef * CAST(n_blocks AS DOUBLE)" +
      " * CAST(n_blocks AS DOUBLE))"
    agg.select(col("__g").as(groupCol), col("n_blocks"),
      lit(k.toLong).as("k_treatments"),
      p6(expr(s"""CASE
        WHEN $guardD > 8.1e37
        THEN double(raise_error(
          'Hypothesis.friedman: operands approach DECIMAL(38,0) capacity; test per finer group'))
        WHEN $den = 0 THEN 0.0
        ELSE ${k - 1}.0 * CAST($num AS DOUBLE) / CAST($den AS DOUBLE)
        END""")).as("chi2"),
      expr(s"""CASE
        WHEN $guardD > 8.1e37
        THEN CAST(raise_error(
          'Hypothesis.friedman: cross-multiplied significance operands approach DECIMAL(38,0) capacity; test per finer group') AS BOOLEAN)
        WHEN $den = 0 THEN false
        ELSE CAST(1000000 AS DECIMAL(38,0)) * ${k - 1} * $num
          > CAST($c6 AS DECIMAL(38,0)) * $den END""").as("significant"))
  }

  /** Two-arm standardized effect size per group: Cohen's d with the
    * Hedges small-sample correction — the "is the shift big enough to
    * CARE about?" companion to [[mannWhitneyU]]'s "is it real?". A
    * significant test on a huge sample can describe a trivial shift;
    * d expresses the mean difference in pooled-standard-deviation
    * units (0.2 small / 0.5 medium / 0.8 large by the usual reading),
    * and g = J·d with J = 1 − 3/(4(n_t+n_c)−9) removes d's upward
    * small-sample bias.
    *
    * Exactness (the q42 moments contract): values are 2-decimal, so
    * Σx accumulates as DECIMAL(28,2) and Σx² as DECIMAL(28,4) —
    * partial-aggregation order can't perturb them — and every double
    * (means, pooled variance, d, g) is ONE fixed-order expression
    * over those exact sums, pround6. Arms with n < 2, or a zero
    * pooled variance (both arms constant), report NULL d/g rather
    * than leaking an Infinity/NaN.
    *
    * Scale shape: ONE hash aggregate (conditional sums fold both arms
    * into the same pass). Nothing else.
    */
  def effectSize(df: DataFrame, groupCol: String, armCol: String,
                 valueCol: String): DataFrame = {
    val a = col(armCol).cast("long") =!= 0L
    val v = col(valueCol).cast("double")
    val agg = df.filter(col(groupCol).isNotNull && col(armCol).isNotNull &&
        col(valueCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(
        sum(when(a, 1L).otherwise(0L)).cast("long").as("n_t"),
        sum(when(!a, 1L).otherwise(0L)).cast("long").as("n_c"),
        sum(when(a, v.cast("decimal(28,2)"))
          .otherwise(lit(0).cast("decimal(28,2)"))).as("__st"),
        sum(when(!a, v.cast("decimal(28,2)"))
          .otherwise(lit(0).cast("decimal(28,2)"))).as("__sc"),
        sum(when(a, (v * v).cast("decimal(28,4)"))
          .otherwise(lit(0).cast("decimal(28,4)"))).as("__qt"),
        sum(when(!a, (v * v).cast("decimal(28,4)"))
          .otherwise(lit(0).cast("decimal(28,4)"))).as("__qc"))
    val mt = "(CAST(__st AS DOUBLE) / CAST(n_t AS DOUBLE))"
    val mc = "(CAST(__sc AS DOUBLE) / CAST(n_c AS DOUBLE))"
    val ssT = "(CAST(__qt AS DOUBLE)" +
      s" - CAST(__st AS DOUBLE) * CAST(__st AS DOUBLE) / CAST(n_t AS DOUBLE))"
    val ssC = "(CAST(__qc AS DOUBLE)" +
      s" - CAST(__sc AS DOUBLE) * CAST(__sc AS DOUBLE) / CAST(n_c AS DOUBLE))"
    val s2p = s"(($ssT + $ssC) / CAST(n_t + n_c - 2 AS DOUBLE))"
    val dRaw = s"(($mt - $mc) / sqrt($s2p))"
    val jFac = "(1.0 - 3.0 / CAST(4 * (n_t + n_c) - 9 AS DOUBLE))"
    agg.select(col(groupCol), col("n_t"), col("n_c"),
      p6(expr(s"CASE WHEN n_t = 0 THEN NULL ELSE $mt END")).as("mean_t"),
      p6(expr(s"CASE WHEN n_c = 0 THEN NULL ELSE $mc END")).as("mean_c"),
      p6(expr(s"""CASE WHEN n_t < 2 OR n_c < 2 OR $s2p <= 0.0 THEN NULL
        ELSE $dRaw END""")).as("cohens_d"),
      p6(expr(s"""CASE WHEN n_t < 2 OR n_c < 2 OR $s2p <= 0.0 THEN NULL
        ELSE $jFac * $dRaw END""")).as("hedges_g"))
  }

  /** 2×2 exposure/outcome risk card per group: odds ratio, relative
    * risk, and risk difference — the epidemiology-style readout a
    * pipeline wants when "exposed" is a curation treatment (a filter
    * version, a dedup pass) and "outcome" is a binary event (kept,
    * returned, churned). Cells follow the standard table: n11 =
    * exposed with outcome, n10 = exposed without, n01 = unexposed
    * with, n00 = neither.
    *
    * ENTIRELY exact — no doubles anywhere: every ratio is a floored
    * micro-unit quotient of cross-multiplied BIGINT cells in
    * DECIMAL(38,0) (OR = 10⁶·n11·n00 div n10·n01, RR = 10⁶·n11·
    * (n01+n00) div (n11+n10)·n01, risk diff = the difference of the
    * two per-arm floored rates). A zero denominator reports NULL for
    * exactly that ratio — a zero-cell table is a real state (a
    * perfectly protective exposure), not an error. Pair with the
    * q252 chi-square / q312 McNemar family when a calibrated
    * significance flag is needed; this card is the effect MAGNITUDE.
    *
    * Scale shape: ONE hash aggregate. Nothing else.
    */
  def riskCard(df: DataFrame, groupCol: String, exposedCol: String,
               outcomeCol: String): DataFrame = {
    val e = col(exposedCol).cast("long") =!= 0L
    val o = col(outcomeCol).cast("long") =!= 0L
    riskCardFromCells(
      df.filter(col(groupCol).isNotNull && col(exposedCol).isNotNull &&
          col(outcomeCol).isNotNull)
        .groupBy(col(groupCol))
        .agg(
          sum(when(e && o, 1L).otherwise(0L)).cast("long").as("n11"),
          sum(when(e && !o, 1L).otherwise(0L)).cast("long").as("n10"),
          sum(when(!e && o, 1L).otherwise(0L)).cast("long").as("n01"),
          sum(when(!e && !o, 1L).otherwise(0L)).cast("long").as("n00")),
      groupCol)
  }

  /** The shared risk-card closing over an already-aggregated per-group
    * 2×2 cell table (groupCol, n11, n10, n01, n00) — [[riskCard]] and
    * `streaming.StreamingRisk` both read through it, so the batch and
    * live cards cannot diverge.
    */
  def riskCardFromCells(cells: DataFrame, groupCol: String): DataFrame =
    cells
      .withColumn("n",
        (col("n11") + col("n10") + col("n01") + col("n00")).cast("long"))
      .select(col(groupCol), col("n"), col("n11"), col("n10"),
        col("n01"), col("n00"),
        expr("""CASE WHEN n10 = 0 OR n01 = 0 THEN NULL
          ELSE CAST(CAST(1000000 AS DECIMAL(38,0)) * n11 * n00
            DIV (CAST(n10 AS DECIMAL(38,0)) * n01) AS BIGINT) END""")
          .as("or_ppm"),
        expr("""CASE WHEN n11 + n10 = 0 OR n01 = 0 THEN NULL
          ELSE CAST(CAST(1000000 AS DECIMAL(38,0)) * n11 * (n01 + n00)
            DIV (CAST(n11 + n10 AS DECIMAL(38,0)) * n01) AS BIGINT) END""")
          .as("rr_ppm"),
        expr("""CASE WHEN n11 + n10 = 0 OR n01 + n00 = 0 THEN NULL
          ELSE CAST(CAST(1000000 AS DECIMAL(19,0)) * n11
              DIV (n11 + n10) AS BIGINT)
            - CAST(CAST(1000000 AS DECIMAL(19,0)) * n01
              DIV (n01 + n00) AS BIGINT) END""")
          .as("risk_diff_ppm"))

  /** Levene's test (mean-centered) for variance homogeneity across
    * arms: the one-way ANOVA F computed on the absolute deviations
    * z_ij = |x_ij − mean_i|. Deviations avoid the inexact per-arm
    * mean by cross-multiplication: |x·n_i − S_i| is an exact DECIMAL,
    * divided once and p6-rounded; the F statistic then closes over
    * exact DECIMAL sums of z and z². Reported as the statistic card
    * (W, dfs) — F critical values depend on both dfs, so the verdict
    * belongs to the caller's table, not a hidden constant.
    *
    * Scale shape: two hash aggregates (arm moments, then deviation
    * moments) and one k-row-per-group closing — no joins beyond the
    * broadcast-sized arm-moment table.
    *
    * Output: group, n, k_arms, df1, df2, w_stat.
    */
  def levene(df: DataFrame, groupCol: String, armCol: String,
             valCol: String): DataFrame = {
    val base = df
      .filter(col(groupCol).isNotNull && col(armCol).isNotNull &&
        col(valCol).isNotNull)
      .select(col(groupCol).as("__g"), col(armCol).as("__a"),
        col(valCol).cast("decimal(18,2)").as("__x"))
    val arms = base.groupBy(col("__g"), col("__a"))
      .agg(count(lit(1)).cast("long").as("__na"),
        sum(col("__x")).cast("decimal(38,2)").as("__sa"))
    val dev = base
      .join(broadcast(arms), Seq("__g", "__a"))
      .withColumn("__z6",
        p6(abs(col("__x") * col("__na") - col("__sa")).cast("double") /
          col("__na").cast("double")))
    // micro-unit integers from here (the kruskalWallis s6u
    // discipline): S²/n stations grow with row count squared and a p6
    // double station saturates Spark's long-valued floor past ~9e12
    // (reached by sf1.0 row counts) while DuckDB's double floor does
    // not — silent divergence. z_u = z6·10⁶ is exact; every station
    // is a floored integer quotient, understating by < 1 micro².
    val zu = (col("__z6").cast("decimal(18,6)") * 1000000)
      .cast("decimal(19,0)")
    def flooredDiv(num: org.apache.spark.sql.Column,
                   den: org.apache.spark.sql.Column) =
      ((num - pmod(num, den)) / den).cast("decimal(38,0)")
    val perArm = dev.groupBy(col("__g"), col("__a"))
      .agg(count(lit(1)).cast("long").as("na"),
        sum(zu).cast("decimal(38,0)").as("szu"),
        sum((zu * zu).cast("decimal(38,0)")).cast("decimal(38,0)")
          .as("szzu"))
      .withColumn("__bu", flooredDiv(
        (col("szu").cast("decimal(19,0)") * col("szu").cast("decimal(19,0)"))
          .cast("decimal(38,0)"), col("na")))
    perArm.groupBy(col("__g"))
      .agg(sum(col("na")).cast("long").as("n"),
        count(lit(1)).cast("long").as("k_arms"),
        sum(col("szu")).cast("decimal(38,0)").as("tzu"),
        sum(col("szzu")).cast("decimal(38,0)").as("tzzu"),
        sum(col("__bu")).cast("decimal(38,0)").as("bsu"))
      .filter(col("k_arms") >= 2L && col("n") > col("k_arms"))
      .withColumn("__t2n", flooredDiv(
        (col("tzu").cast("decimal(19,0)") * col("tzu").cast("decimal(19,0)"))
          .cast("decimal(38,0)"), col("n")))
      .select(col("__g").as(groupCol), col("n"), col("k_arms"),
        (col("k_arms") - 1L).as("df1"), (col("n") - col("k_arms")).as("df2"),
        // tzzu - bsu = 0 means ZERO within-group deviation spread: the
        // statistic is undefined there, so report NULL (the same
        // NULL-on-degenerate convention as welchAnova/cronbachAlpha)
        // rather than clamping the denominator and emitting an
        // astronomically large finite W. Nonzero values are integer
        // micro^2 stations, so no clamp is needed on the live branch.
        when(col("tzzu") - col("bsu") =!= 0, p6(
          ((col("n") - col("k_arms")).cast("double") *
            (col("bsu") - col("__t2n")).cast("double")) /
          ((col("k_arms") - 1L).cast("double") *
            (col("tzzu") - col("bsu")).cast("double")))).as("w_stat"))
  }

  /** Welch's heteroscedastic one-way ANOVA across arms: per-arm
    * means/variances from exact DECIMAL moment sums, then the
    * Welch–James statistic with its Satterthwaite-style df2. Every
    * cross-arm reduction (Σw, Σw·m, Σ terms) is a DECIMAL sum of
    * p6-rounded per-arm values, so accumulation order never shows.
    * Arms with fewer than 2 rows or zero variance are dropped (their
    * weight is undefined); groups need k ≥ 2 surviving arms.
    *
    * Output: group, n, k_arms, f_stat, df1, df2.
    */
  def welchAnova(df: DataFrame, groupCol: String, armCol: String,
                 valCol: String): DataFrame = {
    val base = df
      .filter(col(groupCol).isNotNull && col(armCol).isNotNull &&
        col(valCol).isNotNull)
      .select(col(groupCol).as("__g"), col(armCol).as("__a"),
        col(valCol).cast("decimal(18,2)").as("__x"))
    val arms = base.groupBy(col("__g"), col("__a"))
      .agg(count(lit(1)).cast("long").as("na"),
        sum(col("__x")).cast("decimal(38,2)").as("sa"),
        sum((col("__x") * col("__x")).cast("decimal(38,4)"))
          .cast("decimal(38,4)").as("qa"))
      .filter(col("na") >= 2L)
      .withColumn("m6", p6(col("sa").cast("double") /
        col("na").cast("double")))
      // s² = (Q − S²/n)/(n−1), exact operands, p6 closing
      .withColumn("v6", p6(
        (col("qa").cast("double") -
          col("sa").cast("double") * col("sa").cast("double") /
            col("na").cast("double")) /
          (col("na").cast("double") - 1.0)))
      .filter(col("v6") > 0.0)
      .withColumn("w6", p6(col("na").cast("double") / col("v6")))
    val wAll = Window.partitionBy(col("__g"))
    val withGrand = arms
      .withColumn("sw", sum(col("w6").cast("decimal(18,6)")).over(wAll)
        .cast("decimal(38,6)"))
      .withColumn("swm", sum((col("w6").cast("decimal(18,6)") *
        col("m6").cast("decimal(18,6)")).cast("decimal(38,12)")).over(wAll)
        .cast("decimal(38,12)"))
      .withColumn("k", count(lit(1)).over(wAll).cast("long"))
      .where(col("k") >= 2L && col("sw") > 0)
      .withColumn("grand6",
        p6(col("swm").cast("double") / col("sw").cast("double")))
      // numerator term w·(m−grand)² and df term (1−w/W)²/(n−1)
      .withColumn("t6", p6(col("w6") * (col("m6") - col("grand6")) *
        (col("m6") - col("grand6"))))
      .withColumn("u6", p6(
        (lit(1.0) - col("w6") / col("sw").cast("double")) *
          (lit(1.0) - col("w6") / col("sw").cast("double")) /
          (col("na").cast("double") - 1.0)))
    withGrand.groupBy(col("__g"))
      .agg(sum(col("na")).cast("long").as("n"),
        max(col("k")).as("k_arms"),
        sum(col("t6").cast("decimal(18,6)")).cast("decimal(38,6)").as("st"),
        sum(col("u6").cast("decimal(18,6)")).cast("decimal(38,6)").as("su"))
      .select(col("__g").as(groupCol), col("n"), col("k_arms"),
        p6(
          (col("st").cast("double") / (col("k_arms").cast("double") - 1.0)) /
            (lit(1.0) + lit(2.0) * (col("k_arms").cast("double") - 2.0) /
              (col("k_arms").cast("double") * col("k_arms").cast("double") -
                1.0) * col("su").cast("double"))).as("f_stat"),
        (col("k_arms") - 1L).as("df1"),
        when(col("su").cast("double") > 0.0,
          p6((col("k_arms").cast("double") * col("k_arms").cast("double") -
            1.0) / (lit(3.0) * col("su").cast("double"))))
          .otherwise(lit(0.0)).as("df2"))
  }

  /** Jonckheere–Terpstra trend test: do values shift MONOTONICALLY
    * with an ordered arm index (discount tier, severity bucket)?
    * JT = Σ_{i<j} U_ij over ordered arm pairs, kept integral as
    * JT2 = 2·JT. Computed without a pairwise join: each value-level
    * cell (arm a, value v, count c) is exploded to every higher arm
    * j ∈ (a, maxArm] as a "lower-arm" contribution and to itself as
    * the "self" row; a single window over values per (group, target
    * arm) then yields the dominance counts — cost k·|cells|, never
    * row-quadratic. The normal approximation uses the full
    * Hollander–Wolfe tie-corrected variance from exact DECIMAL(38,0)
    * integer sums.
    *
    * `maxArm` bounds the explode (arm values outside [0, maxArm]
    * raise — the caller buckets first, same contract as
    * kruskalWallis' chi-square table).
    *
    * Output: group, n, k_arms, jt2, e2, z.
    */
  def jonckheere(df: DataFrame, groupCol: String, armCol: String,
                 valCol: String, maxArm: Int = 8): DataFrame = {
    require(maxArm >= 1 && maxArm <= 16, s"maxArm must be in [1,16]: $maxArm")
    val guardedArm = when(
      col(armCol).cast("long").between(0L, maxArm.toLong),
      col(armCol).cast("long"))
      .otherwise(expr(s"CAST(raise_error('Hypothesis.jonckheere: arm " +
        s"outside [0,$maxArm] — bucket the arm column first') AS BIGINT)"))
    val cells = df
      .filter(col(groupCol).isNotNull && col(armCol).isNotNull &&
        col(valCol).isNotNull)
      .select(col(groupCol).as("__g"), guardedArm.as("__a"),
        col(valCol).cast("decimal(18,2)").as("__v"))
      .groupBy(col("__g"), col("__a"), col("__v"))
      .agg(count(lit(1)).cast("long").as("__c"))
      .localCheckpoint(true)
    // one row per (g, target arm j, v): lower-arm count lc, self count sc
    val fan = cells.select(col("__g"), col("__v"), col("__c"),
      explode(sequence(col("__a"), lit(maxArm.toLong))).as("__j"),
      col("__a"))
      .select(col("__g"), col("__j"), col("__v"),
        when(col("__a") < col("__j"), col("__c")).otherwise(0L).as("__cl"),
        when(col("__a") === col("__j"), col("__c")).otherwise(0L).as("__cs"))
      .groupBy(col("__g"), col("__j"), col("__v"))
      .agg(sum(col("__cl")).cast("long").as("lc"),
        sum(col("__cs")).cast("long").as("sc"))
    val wPrior = Window.partitionBy(col("__g"), col("__j"))
      .orderBy(col("__v")).rowsBetween(Window.unboundedPreceding, -1)
    val contrib = fan
      .withColumn("tlt", coalesce(sum(col("lc")).over(wPrior), lit(0L)))
      .where(col("sc") > 0L)
      .select(col("__g"),
        (col("sc").cast("decimal(38,0)") *
          (lit(2L) * col("tlt") + col("lc"))).as("jt2c"))
      .groupBy(col("__g")).agg(sum(col("jt2c"))
        .cast("decimal(38,0)").as("jt2"))
    // exact moment ingredients: per-arm n_i and per-value tie t_v
    val d1 = lit(1L)
    val perArm = cells.groupBy(col("__g"), col("__a"))
      .agg(sum(col("__c")).cast("decimal(38,0)").as("ni"))
      .groupBy(col("__g"))
      .agg(sum(col("ni")).cast("decimal(38,0)").as("n"),
        count(lit(1)).cast("long").as("k_arms"),
        sum(col("ni") * col("ni")).cast("decimal(38,0)").as("sn2"),
        sum(col("ni") * (col("ni") - d1) * (lit(2L) * col("ni") + lit(5L)))
          .cast("decimal(38,0)").as("sn25"),
        sum(col("ni") * (col("ni") - d1)).cast("decimal(38,0)").as("sn11"),
        sum(col("ni") * (col("ni") - d1) * (col("ni") - lit(2L)))
          .cast("decimal(38,0)").as("sn12"))
    val perVal = cells.groupBy(col("__g"), col("__v"))
      .agg(sum(col("__c")).cast("decimal(38,0)").as("tv"))
      .groupBy(col("__g"))
      .agg(sum(col("tv") * (col("tv") - d1) * (lit(2L) * col("tv") + lit(5L)))
        .cast("decimal(38,0)").as("st25"),
        sum(col("tv") * (col("tv") - d1)).cast("decimal(38,0)").as("st11"),
        sum(col("tv") * (col("tv") - d1) * (col("tv") - lit(2L)))
          .cast("decimal(38,0)").as("st12"))
    val joined = contrib
      .join(perArm, Seq("__g")).join(perVal, Seq("__g"))
      .filter(col("k_arms") >= 2L)
      .withColumn("e2",
        ((col("n") * col("n") - col("sn2")) / lit(2L))
          .cast("decimal(38,0)"))
    val nD = col("n").cast("double")
    // the two quotient terms guard their own denominators (ANSI mode
    // raises on /0 even when the consuming CASE branch is dead): for
    // n <= 2 the z output is 0 regardless, so the 0.0 stand-ins are
    // never read
    val varD =
      (nD * (nD - 1.0) * (lit(2.0) * nD + 5.0) - col("sn25").cast("double") -
        col("st25").cast("double")) / 72.0 +
      when(nD > 2.0,
        col("sn12").cast("double") * col("st12").cast("double") /
          (lit(36.0) * nD * (nD - 1.0) * (nD - 2.0))).otherwise(lit(0.0)) +
      when(nD > 1.0,
        col("sn11").cast("double") * col("st11").cast("double") /
          (lit(8.0) * nD * (nD - 1.0))).otherwise(lit(0.0))
    joined.select(col("__g").as(groupCol),
      col("n").cast("long").as("n"), col("k_arms"),
      col("jt2").cast("long").as("jt2"), col("e2").cast("long").as("e2"),
      when(varD > 0.0 && nD > 2.0,
        p6((col("jt2").cast("double") - col("e2").cast("double")) /
          (lit(2.0) * sqrt(varD))))
        .otherwise(lit(0.0)).as("z"))
  }

  /** Multiple-testing corrections over a family of p6 p-values: the
    * per-hypothesis card every eval pipeline needs once it runs a
    * TEST PER SEGMENT — without it, 5% of segments "win" by chance.
    * Within each family (m hypotheses, ranked by p ascending, ties by
    * key):
    *   - Benjamini–Hochberg: reject ranks ≤ the largest j with
    *     p_(j) ≤ j·α/m,
    *   - Holm step-down: reject rank k iff EVERY j ≤ k has
    *     p_(j) ≤ α/(m−j+1),
    *   - BH q-value: min_{j ≥ k} p_(j)·m/j (floored micro-units).
    * All decisions are EXACT integer cross-multiplications on the
    * micro-unit p's (p ≤ j·α/m ⟺ p_µ·m ≤ j·α_µ) — the rounded
    * double never decides. `alphaMicro` = α·10⁶ (50000 = 0.05).
    *
    * Scale shape: one window rank per family (families are segment
    * vocabularies, not rows), two running extrema, no joins.
    *
    * Output: family, key, p_value, rank, m, bh_reject, holm_reject,
    * q_value.
    */
  def multipleTesting(df: DataFrame, familyCol: String, keyCol: String,
                      pCol: String, alphaMicro: Long = 50000L): DataFrame = {
    require(alphaMicro > 0 && alphaMicro <= 1000000L,
      s"alphaMicro must be in (0, 1e6]: $alphaMicro")
    val base = df
      .filter(col(familyCol).isNotNull && col(keyCol).isNotNull &&
        col(pCol).isNotNull)
      .select(col(familyCol).as("__f"), col(keyCol).as("__k"),
        col(pCol).cast("double").as("__p"),
        (col(pCol) * 1000000).cast("decimal(19,0)").as("__pu"))
    val wOrd = Window.partitionBy(col("__f"))
      .orderBy(col("__pu"), col("__k"))
    val wAll = Window.partitionBy(col("__f"))
    val ranked = base
      .withColumn("__r", row_number().over(wOrd).cast("long"))
      .withColumn("__m", count(lit(1)).over(wAll).cast("long"))
      // BH condition at this rank: p_µ·m ≤ j·α_µ (exact integers)
      .withColumn("__bhok",
        when(col("__pu") * col("__m") <=
          col("__r").cast("decimal(19,0)") * alphaMicro, col("__r"))
          .otherwise(0L))
      // Holm condition at this rank: p_µ·(m−j+1) ≤ α_µ
      .withColumn("__hok",
        (col("__pu") * (col("__m") - col("__r") + 1L) <=
          lit(alphaMicro).cast("decimal(19,0)")).cast("long"))
      // q-value station: floor(p_µ·m / j), clamped to 1e6
      .withColumn("__qu",
        least(expr("CAST((__pu * __m - pmod(__pu * __m, __r)) / __r" +
          " AS DECIMAL(19,0))"), lit(1000000L).cast("decimal(19,0)")))
    val wSuffix = wOrd.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val wPrefix = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked
      .withColumn("__cut", max(col("__bhok")).over(wAll))
      .withColumn("__holmAll", min(col("__hok")).over(wPrefix))
      .withColumn("__qmin", min(col("__qu")).over(wSuffix))
      .select(col("__f").as(familyCol), col("__k").as(keyCol),
        col("__p").as("p_value"), col("__r").as("rank"), col("__m").as("m"),
        (col("__r") <= col("__cut")).cast("long").as("bh_reject"),
        (col("__holmAll") === 1L).cast("long").as("holm_reject"),
        (col("__qmin").cast("double") / 1000000.0).as("q_value"))
  }
}
