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
}
