package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data profiling — the `ANALYZE TABLE` surface: per-column presence,
  * distinct count, and min/max.
  *
  * One union branch per column, each over a scan PRUNED to that column
  * (against a columnar source the branches together read exactly the
  * bytes one wide scan would — each column's pages once). Within a
  * branch the heavy stage is a plain `groupBy(value).count()` — long
  * buffers, so it stays `HashAggregate` for EVERY column type — and
  * the final ungrouped aggregate (sum of counts, min/max over the
  * distinct values only) needs no sort even when string buffers demote
  * it to `SortAggregate`, because there are no grouping keys to order
  * by.
  *
  * The tempting one-pass alternative — every statistic in one
  * aggregate — plans the multi-column distinct set via `Expand` (row
  * count × columns intermediate) and any string min/max forces
  * sort-based aggregation of that multiplied stream; measured 4x
  * slower on a 6-column profile at sf0.1. The spec pins this plan
  * shape: no `Expand`, no `Sort`, anywhere.
  *
  * min/max are cast to string so heterogeneous column types share one
  * output schema; cast numerics you care about to DECIMAL first if you
  * need cross-engine-stable rendering of doubles.
  */
object Profile {

  /** Profile `cols` of `df`. Output: `column_name`, `n_null`,
    * `n_present`, `n_distinct`, `min_value`, `max_value`.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "no columns to profile")
    cols.map { c =>
      df.select(col(c))
        .groupBy(col(c)).agg(count(lit(1)).as("__cnt"))
        .agg(
          coalesce(sum(col("__cnt")), lit(0L)).as("__total"),
          coalesce(sum(when(col(c).isNotNull, col("__cnt"))
            .otherwise(lit(0L))), lit(0L)).as("n_present"),
          count(col(c)).as("n_distinct"),
          min(col(c)).cast("string").as("min_value"),
          max(col(c)).cast("string").as("max_value"))
        .select(lit(c).as("column_name"),
          (col("__total") - col("n_present")).as("n_null"),
          col("n_present"), col("n_distinct"),
          col("min_value"), col("max_value"))
    }.reduce(_ unionByName _)
  }

  /** Robust per-group outlier audit: count values whose modified
    * z-score |value − median| / (1.4826·MAD) exceeds `z` — the
    * outlier detector that survives the outliers themselves (mean/std
    * get dragged by exactly the points being hunted; median/MAD do
    * not). 1.4826 scales MAD to σ under normality, so `z` reads in
    * familiar sigma units.
    *
    * Two exact-percentile passes (the q41/q86-verified primitive) with
    * the group medians/MADs broadcast back between and after — groups
    * are the narrow side, values the wide side, so the wide side is
    * scanned, never shuffled beyond its group aggregate. Groups with
    * MAD = 0 (over half the values identical) report 0 outliers: the
    * modified z-score is undefined there and flagging the non-modal
    * half wholesale is never the intent.
    */
  /** Exact per-group quantile table: one row per (group, q) with the
    * interpolated percentile — the distribution profile a curation run
    * reports per source (token-length spread, value ranges) when
    * approximate sketches (q56) are not enough for the record. One
    * aggregation computes ALL quantiles per group (percentile takes
    * the array), then a bounded explode of groups × quantiles.
    */
  def quantileTable(df: DataFrame, valCol: String, byCol: String,
                    qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0 && q <= 1),
      s"quantiles must be in [0,1]: $qs")
    val arr = qs.map(q => lit(q)).toArray
    // rename before the expr splice (same discipline as robustOutliers):
    // a caller's column name may need quoting the SQL string would break
    df.select(col(byCol), col(valCol).as("__v"))
      .groupBy(col(byCol))
      .agg(expr(s"percentile(__v, array(${qs.mkString(", ")}))").as("__p"))
      .select(col(byCol),
        explode(arrays_zip(array(arr: _*).as("q"), col("__p").as("value")))
          .as("__z"))
      .select(col(byCol), col("__z.q").as("q"), col("__z.value").as("value"))
  }

  /** Per-group winsorization: clamp values into the group's exact
    * [loQ, hiQ] percentile interval — the robust-cleaning transform
    * that tames heavy tails WITHOUT dropping rows (training pipelines
    * winsorize reward/score/length features where deletion would bias
    * the sample). Adds `<valCol>_w` (clamped) and `__clamped` (-1 low,
    * 0 untouched, 1 high); one percentile pass, bounds broadcast back,
    * clamp in the projection. Null groups are regular groups (the
    * join is null-safe), and null VALUES pass through null with
    * `__clamped = 0` — winsorization tames tails, it never imputes.
    */
  def winsorize(df: DataFrame, valCol: String, byCol: String,
                loQ: Double = 0.01, hiQ: Double = 0.99): DataFrame = {
    require(loQ >= 0 && hiQ <= 1 && loQ < hiQ,
      s"need 0 <= loQ < hiQ <= 1: loQ=$loQ hiQ=$hiQ")
    val reserved = Set(s"${valCol}_w", "__clamped", "__lo", "__hi", "__grp")
    val clash = df.columns.toSet.intersect(reserved)
    require(clash.isEmpty,
      s"input columns collide with winsorize bookkeeping names: $clash")
    val bounds = df.select(col(byCol).as("__grp"), col(valCol).as("__v"))
      .groupBy(col("__grp"))
      .agg(expr(s"percentile(__v, $loQ)").as("__lo"),
        expr(s"percentile(__v, $hiQ)").as("__hi"))
    // null-SAFE group join (a null group is a regular group, and
    // "without dropping rows" must include it); null VALUES stay null
    // — least/greatest skip nulls, which would otherwise fabricate
    // the low bound for a missing measurement
    df.join(broadcast(bounds), col(byCol) <=> col("__grp"))
      .withColumn(s"${valCol}_w",
        when(col(valCol).isNull, lit(null))
          .otherwise(least(greatest(col(valCol), col("__lo")), col("__hi"))))
      .withColumn("__clamped",
        when(col(valCol) < col("__lo"), lit(-1))
          .when(col(valCol) > col("__hi"), lit(1)).otherwise(lit(0)))
      .drop("__lo", "__hi", "__grp")
  }

  def robustOutliers(df: DataFrame, valCol: String, byCol: String,
                     z: Double = 3.0): DataFrame = {
    require(z > 0, s"z must be positive: $z")
    val v = df.select(col(byCol), col(valCol).as("__v"))
    val med = v.groupBy(col(byCol))
      .agg(expr("percentile(__v, 0.5)").as("__med"))
    val mad = v.join(broadcast(med), Seq(byCol))
      .groupBy(col(byCol))
      .agg(expr("percentile(abs(__v - __med), 0.5)").as("__mad"))
    v.join(broadcast(med), Seq(byCol)).join(broadcast(mad), Seq(byCol))
      .groupBy(col(byCol))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__mad") > 0 &&
            abs(col("__v") - col("__med")) / (lit(1.4826) * col("__mad")) > z,
          1L).otherwise(0L)).as("n_outliers"))
  }

  /** Spearman rank correlation between two per-row metrics, per group —
    * the monotone-association audit ("is our quality score just a proxy
    * for length?") that Pearson cannot answer on heavy-tailed corpus
    * metrics. Ranks are `row_number` with `idCol` as the tie-break (NOT
    * average ranks — the fractional tie correction would reintroduce
    * cross-engine float summation; with a deterministic tie-break the
    * statistic is integer until one final division, which is the q122
    * oracle's portability contract), so
    * rho = 1 − 6·Σd² / (n(n²−1)), d = rank_a − rank_b.
    *
    * Shape: two rank windows partitioned by the group — vocabulary of
    * the SAME per-group sort a quantile table needs; Σd² and n then
    * collapse in one hash aggregate. A group with a single row reports
    * rho = 0. At extreme per-group cardinality (≫10⁷ rows) swap the
    * windows for `Sampling.shuffleRank`-style bucketed ranks; the
    * closed form is unchanged.
    */
  def rankCorrelation(df: DataFrame, groupCol: String, aCol: String,
                      bCol: String, idCol: String): DataFrame = {
    val wa = Window.partitionBy(col(groupCol)).orderBy(col(aCol), col(idCol))
    val wb = Window.partitionBy(col(groupCol)).orderBy(col(bCol), col(idCol))
    val d = col("__ra") - col("__rb")
    val n = col("n_docs").cast("double")
    df.select(col(groupCol), col(aCol), col(bCol), col(idCol))
      .withColumn("__ra", row_number().over(wa))
      .withColumn("__rb", row_number().over(wb))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum((d * d).cast("long")).cast("long").as("__sumd2"))
      .select(col(groupCol), col("n_docs"),
        when(col("n_docs") > 1,
          lit(1.0) - lit(6.0) * col("__sumd2").cast("double") /
            (n * (n * col("n_docs") - lit(1.0))))
          .otherwise(lit(0.0)).as("rho"))
  }

  /** Exact weighted median per group: the smallest value whose running
    * weight reaches half the group's total — "the token-weighted
    * median document length", where the unweighted median (q41)
    * over-represents short docs. INTEGER-EXACT selection: the
    * condition is 2*cumsum >= total over BIGINT weights under the
    * total (value, id) order; no interpolation, no floats.
    *
    * Scale shape: one group-partitioned running-sum window (the same
    * sort a quantile table pays) + a broadcast join of the per-group
    * weight totals + one min-aggregate. A group's rows stay splittable
    * across the window partition only by group — same caveat and
    * remedy as `rankCorrelation` at extreme per-group cardinality.
    */
  def weightedMedian(df: DataFrame, valCol: String, weightCol: String,
                     byCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(byCol))
      .orderBy(col(valCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = df.groupBy(col(byCol))
      .agg(sum(col(weightCol).cast("long")).as("__tot"),
        count(lit(1)).cast("long").as("n_rows"))
    df.select(col(byCol), col(valCol), col(idCol), col(weightCol))
      .withColumn("__cum", sum(col(weightCol).cast("long")).over(w))
      .join(broadcast(tot), Seq(byCol))
      .groupBy(col(byCol))
      .agg(max(col("n_rows")).as("n_rows"),
        max(col("__tot")).as("w_total"),
        min(when(col("__cum") * 2L >= col("__tot"), col(valCol)))
          .as("w_median"))
  }

  /** Population stability index per group vs the whole-table baseline —
    * the drift score monitoring pipelines put on every numeric feature
    * ("has this source's length distribution shifted?").
    *
    * Values bin into power-of-two buckets (floor(log2 v) computed as
    * len(bin(v))-1 — INTEGER on both engines; v <= 0 lands in bucket
    * -1), counts get +1 Laplace smoothing so a bin empty on one side
    * stays finite, and each bin's contribution
    * (p_grp - p_base) * log10(p_grp / p_base) is computed from exact
    * integer counts: the two shares and their RATIO are single IEEE
    * divisions of exactly-representable integers, log10 is the only
    * libm call, and the per-bin contribution is rounded to 6 places
    * and summed as DECIMAL(18,6) — exact, ORDER-INDEPENDENT addition,
    * where a double sum would depend on Spark's partition merge order.
    *
    * Scale shape: two hash aggregates (per-(group,bin) and per-bin
    * baseline) over the same scan, a broadcast bin-grid cross join
    * (the grid is at most 65 log2 buckets — bounded by construction),
    * and one final per-group aggregate. No windows, no skew exposure:
    * the baseline joins on bin (tiny broadcast), never funneling a
    * hot group anywhere.
    */
  /** Per-group hot-key audit over the fan-in of `keyCol`: exact Gini
    * coefficient of rows-per-key (basis points) plus the max fan-in —
    * the skew report read BEFORE shuffling on a key ("will one reducer
    * eat this join?"), quantifying what AQE's skew handling will face.
    *
    * Windowless and global-sort-free by construction: per-key counts →
    * counts-of-COUNTS histogram (distinct fan-in values, bounded by the
    * max key multiplicity, not by key count) → cumulative ranks via a
    * broadcast non-equi self-join of that tiny histogram. With
    * histogram rows (v, f_v) and C_v = Σ_{u<v} f_u, the rank-weighted
    * sum is T = Σ_v v·(f_v·C_v + f_v(f_v+1)/2) — BIGINT-exact — and
    * Gini = (2T − (n+1)S)/(nS) with n keys, S rows: one double
    * division of exact integers, floored into basis points.
    */
  def keySkew(df: DataFrame, keyCol: String, byCol: String): DataFrame = {
    val kc = df.groupBy(col(byCol).as("__g"), col(keyCol).as("__k"))
      .agg(count(lit(1)).cast("long").as("__c"))
    val hist = kc.groupBy(col("__g"), col("__c"))
      .agg(count(lit(1)).cast("long").as("__f"))
    val lower = hist.select(col("__g").as("__g2"), col("__c").as("__c2"),
      col("__f").as("__f2"))
    val cum = hist
      .join(broadcast(lower),
        col("__g") === col("__g2") && col("__c2") < col("__c"), "left")
      .groupBy(col("__g"), col("__c"), col("__f"))
      .agg(coalesce(sum(col("__f2")), lit(0L)).cast("long").as("__cum"))
    // f(f+1) is always even, so the integer halving below is exact
    val rankSum = col("__c") * (col("__f") * col("__cum") +
      call_function("div", col("__f") * (col("__f") + 1L), lit(2L)))
    cum.groupBy(col("__g"))
      .agg(sum(col("__f")).cast("long").as("n_keys"),
        sum(col("__c") * col("__f")).cast("long").as("n_rows"),
        max(col("__c")).as("max_per_key"),
        sum(rankSum).cast("long").as("__t"))
      .select(col("__g").as(byCol), col("n_keys"), col("n_rows"),
        col("max_per_key"),
        floor((lit(2L) * col("__t") - (col("n_keys") + 1L) * col("n_rows"))
            .cast("double") * 10000.0 /
          (col("n_keys").cast("double") * col("n_rows").cast("double")))
          .cast("long").as("gini_bp"))
  }

  /** Exact two-sample Kolmogorov–Smirnov statistic per group vs the
    * whole-table baseline — `psi`'s sharper sibling: PSI needs a bin
    * grid and smoothing, KS is binless (the max CDF gap over observed
    * values) and INTEGER-EXACT here: the gap at value v is
    * |C_g(v)·N − C(v)·n_g| over exact cumulative counts, so the max
    * is found entirely in BIGINT and only the final basis-point
    * report divides (floor of the exact double ratio).
    *
    * Windowless like `keySkew`: cumulatives come from broadcast
    * non-equi joins over the (group, value) and (value) count
    * histograms, both bounded by the DISTINCT-VALUE count of the
    * measure (token-length-like measures: tens to hundreds of values
    * regardless of corpus size — that bound is the operator's
    * contract; for continuous measures quantize first, e.g. the q146
    * log2 bucket).
    */
  def ksByGroup(df: DataFrame, valCol: String, byCol: String): DataFrame = {
    // ONE scan of the (possibly expensive) input projection: every
    // other total derives from the (group, value) count table, which
    // is BOUNDED by the measure's distinct-value contract — so it is
    // eagerly checkpointed once (differing downstream projections
    // defeat Spark's exchange reuse; measured 1.6x the unavoidable
    // single-scan cost without this, with the caller's measure
    // expression — often a regex tokenizer — re-run per branch)
    val gb = df
      .select(col(byCol).as("grp"), col(valCol).cast("long").as("__v"))
      .groupBy(col("grp"), col("__v"))
      .agg(count(lit(1)).cast("long").as("__c"))
      .localCheckpoint(true)
    val baseCum = {
      val b = gb.groupBy(col("__v")).agg(sum(col("__c")).cast("long").as("__cb"))
      val b2 = b.select(col("__v").as("__v2"), col("__cb").as("__cb2"))
      b.join(broadcast(b2), col("__v2") <= col("__v"))
        .groupBy(col("__v"))
        .agg(sum(col("__cb2")).cast("long").as("__cumb"))
    }
    val grpTot = gb.groupBy(col("grp"))
      .agg(sum(col("__c")).cast("long").as("n_rows"))
    val total = gb.agg(sum(col("__c")).cast("long").as("__N"))
    val grid = grpTot.crossJoin(broadcast(baseCum)).crossJoin(broadcast(total))
    val gb2 = gb.select(col("grp").as("__g2"), col("__v").as("__v2"),
      col("__c"))
    grid
      .join(broadcast(gb2),
        col("grp") === col("__g2") && col("__v2") <= col("__v"), "left")
      .groupBy(col("grp"), col("__v"), col("n_rows"), col("__cumb"), col("__N"))
      .agg(coalesce(sum(col("__c")), lit(0L)).cast("long").as("__cumg"))
      .groupBy(col("grp"))
      .agg(max(col("n_rows")).as("n_rows"),
        max(abs(col("__cumg") * col("__N") - col("__cumb") * col("n_rows")))
          .as("__maxgap"),
        max(col("__N")).as("__NN"))
      .select(col("grp"), col("n_rows"),
        floor(col("__maxgap").cast("double") * 10000.0 /
          (col("n_rows").cast("double") * col("__NN").cast("double")))
          .cast("long").as("ks_bp"))
  }

  /** Conditional label entropy per group — the purity card
    * H(label | group) behind "is this source monolingual?": 0 means
    * one label, log10(k) means k uniform labels. Per-(group, label)
    * contribution (c/n)·log10(n/c) follows the q146 exactness
    * discipline: both operands of the single log10 and of the single
    * multiply are ratios of EXACT integers, each contribution rounds
    * to 6 places and sums as DECIMAL — order-independent where a
    * double sum would hash-drift. Two hash aggregates, label
    * cardinality bounded by nature.
    */
  def labelEntropy(df: DataFrame, labelCol: String, byCol: String): DataFrame = {
    val cl = df.groupBy(col(byCol).as("grp"), col(labelCol).as("__l"))
      .agg(count(lit(1)).cast("long").as("__c"))
    val gt = cl.groupBy(col("grp"))
      .agg(sum(col("__c")).cast("long").as("n_rows"),
        count(lit(1)).cast("long").as("n_labels"))
    val contrib = (col("__c").cast("double") / col("n_rows").cast("double")) *
      log10(col("n_rows").cast("double") / col("__c").cast("double"))
    cl.join(broadcast(gt), Seq("grp"))
      .withColumn("__h",
        (floor(contrib * 1e6 + 0.5) / 1e6).cast("decimal(18,6)"))
      .groupBy(col("grp"))
      .agg(max(col("n_rows")).as("n_rows"),
        max(col("n_labels")).as("n_labels"),
        sum(col("__h")).cast("double").as("h_label"))
  }

  def psi(df: DataFrame, valCol: String, byCol: String): DataFrame = {
    val bucket = when(col(valCol) > 0,
      (length(bin(col(valCol).cast("long"))) - 1).cast("long"))
      .otherwise(lit(-1L))
    val binned = df.select(col(byCol).as("grp"), bucket.as("bin"))
    val grpBin = binned.groupBy(col("grp"), col("bin"))
      .agg(count(lit(1)).cast("long").as("__ca"))
    val baseBin = binned.groupBy(col("bin"))
      .agg(count(lit(1)).cast("long").as("__cb"))
    val grpTot = binned.groupBy(col("grp"))
      .agg(count(lit(1)).cast("long").as("__na"))
    val baseTot = binned.agg(count(lit(1)).cast("long").as("__nb"),
      countDistinct(col("bin")).cast("long").as("__nbins"))
    // full (group x observed-bin) grid: a bin the group never hits
    // still contributes its smoothed term
    val grid = grpTot.crossJoin(broadcast(baseBin.crossJoin(baseTot)))
    val pa = (col("__ca") + 1L).cast("double") /
      (col("__na") + col("__nbins")).cast("double")
    val pb = (col("__cb") + 1L).cast("double") /
      (col("__nb") + col("__nbins")).cast("double")
    val ratio = ((col("__ca") + 1L) * (col("__nb") + col("__nbins"))).cast("double") /
      ((col("__cb") + 1L) * (col("__na") + col("__nbins"))).cast("double")
    val contrib = (pa - pb) * log10(ratio)
    grid.join(grpBin, Seq("grp", "bin"), "left")
      .withColumn("__ca", coalesce(col("__ca"), lit(0L)))
      .withColumn("__c",
        (floor(contrib * 1e6 + 0.5) / 1e6).cast("decimal(18,6)"))
      .groupBy(col("grp"))
      .agg(max(col("__na")).as("n_rows"),
        sum(col("__c")).cast("double").as("psi"))
      .select(col("grp"), col("n_rows"), col("psi"))
  }

  /** Jensen–Shannon divergence between every pair of sources' unigram
    * token distributions, in bits — the mixture-design diagnostic
    * beside q93/q112: JS near 0 means two sources are near-duplicate
    * voices (their mixture weights compete for the same distribution);
    * near 1 means disjoint vocabularies.
    *
    * Exactness is the q146/labelEntropy discipline: every per-(pair,
    * term) contribution is built from ratios of EXACT integer counts
    * evaluated in one fixed double operation order, passed through a
    * single log2, rounded to 6 places, and summed as DECIMAL(18,6) —
    * order-independent where a raw double sum would hash-drift. All
    * products run in DOUBLE (not long) so no overflow at any corpus
    * size; both engines round those products identically because the
    * inputs are integers below 2^53 per side.
    *
    * Scale shape: one (src, term) count aggregate; the tiny pair table
    * (|sources|²) broadcasts onto the per-source count tables; the
    * full-outer term alignment shuffles on (pair, term) — total work
    * is pairs × vocab, bounded by source cardinality (nature-bounded,
    * like labels) times the Heaps-law vocabulary.
    */
  def jsDivergence(df: DataFrame, textCol: String, byCol: String): DataFrame = {
    val c = df.select(col(byCol).as("src"),
        explode(graft.functions.TextFns.tokens(col(textCol))).as("__t"))
      .groupBy(col("src"), col("__t"))
      .agg(count(lit(1)).cast("long").as("__c"))
    val tot = c.groupBy(col("src")).agg(sum(col("__c")).cast("long").as("__n"))
    val pairs = tot.select(col("src").as("src_a"), col("__n").as("__na"))
      .crossJoin(tot.select(col("src").as("src_b"), col("__n").as("__nb")))
      .filter(col("src_a") < col("src_b"))
    val ja = c.select(col("src").as("src_a"), col("__t"), col("__c").as("__ca"))
      .join(broadcast(pairs), "src_a")
    val jb = c.select(col("src").as("src_b"), col("__t"), col("__c").as("__cb"))
      .join(broadcast(pairs), "src_b")
    val g = ja.select(col("src_a"), col("src_b"), col("__t"),
        col("__ca"), col("__na"), col("__nb"))
      .join(jb.select(col("src_a"), col("src_b"), col("__t"),
        col("__cb"), col("__na").as("__na2"), col("__nb").as("__nb2")),
        Seq("src_a", "src_b", "__t"), "full_outer")
    val ca = coalesce(col("__ca"), lit(0L)).cast("double")
    val cb = coalesce(col("__cb"), lit(0L)).cast("double")
    val na = coalesce(col("__na"), col("__na2")).cast("double")
    val nb = coalesce(col("__nb"), col("__nb2")).cast("double")
    val den = ca * nb + cb * na
    val contrib =
      when(ca > 0, lit(0.5) * (ca / na) * log2(lit(2.0) * ca * nb / den))
        .otherwise(lit(0.0)) +
      when(cb > 0, lit(0.5) * (cb / nb) * log2(lit(2.0) * cb * na / den))
        .otherwise(lit(0.0))
    g.withColumn("__j", (floor(contrib * 1e6 + 0.5) / 1e6).cast("decimal(18,6)"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).cast("long").as("n_terms"),
        sum(col("__j")).cast("double").as("js_bits"))
  }

  private def p6(c: Column): Column = graft.functions.Rounding.p6(c)

  // shared contingency machinery for chiSquare/mutualInfo: observed
  // cells + marginals + the one-row total, all from ONE cell aggregate.
  // Cell/marginal tables are |a|·|b| / |a| / |b| rows — nature-bounded
  // category cardinalities — so every attach is a broadcast.
  private def contingency(df: DataFrame, aCol: String, bCol: String)
      : (DataFrame, DataFrame) = {
    require(aCol != bCol, s"independence test needs two distinct columns: $aCol")
    val reserved = Seq("__ra", "__cb", "__n", "__da", "__db", "n_obs")
    require(!reserved.contains(aCol) && !reserved.contains(bCol),
      s"$aCol/$bCol collide with bookkeeping names $reserved")
    // the one row-scale pass; the cell table it leaves is |a|·|b| rows,
    // so it is checkpointed eagerly and every marginal/total/statistic
    // below derives from the tiny materialization, not a re-scan
    val cells = df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol), col(bCol))
      .agg(count(lit(1)).cast("long").as("n_obs"))
      .localCheckpoint(true)
    val ra = cells.groupBy(col(aCol))
      .agg(sum(col("n_obs")).cast("long").as("__ra"))
    val cb = cells.groupBy(col(bCol))
      .agg(sum(col("n_obs")).cast("long").as("__cb"))
    val tot = cells.agg(sum(col("n_obs")).cast("long").as("__n"),
      count_distinct(col(aCol)).cast("long").as("__da"),
      count_distinct(col(bCol)).cast("long").as("__db"))
    (cells.join(broadcast(ra), Seq(aCol)).join(broadcast(cb), Seq(bCol))
      .crossJoin(broadcast(tot)), tot)
  }

  /** Pearson chi-square independence audit between two categorical
    * columns ("is language independent of source?") — the per-cell
    * contingency view with the test statistic attached: observed vs
    * expected counts, each cell's (o−e)²/e contribution, and the total
    * χ² + degrees of freedom repeated on every row so one scan of the
    * output reads both the grid and the verdict.
    *
    * Exactness: marginals and totals are exact BIGINTs; e and the
    * contribution are ONE fixed-order double expression each, rounded
    * to 6 places; χ² is the DECIMAL(18,6) sum of the rounded
    * contributions (associative — partial-agg-order-free).
    *
    * Scale shape: one (a, b) hash aggregate over the data — the only
    * row-scale pass — then broadcast marginal joins and two one-row
    * attaches on the |a|·|b| cell grid.
    */
  def chiSquare(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val (g, _) = contingency(df, aCol, bCol)
    val e = (col("__ra").cast("double") * col("__cb").cast("double")) /
      col("__n").cast("double")
    val od = col("n_obs").cast("double")
    val withC = g
      .withColumn("__e", e)
      .withColumn("__c6",
        p6(((od - col("__e")) * (od - col("__e"))) / col("__e"))
          .cast("decimal(18,6)"))
    val total = withC.agg(sum(col("__c6")).as("__chi2"))
    withC.crossJoin(broadcast(total))
      .select(col(aCol), col(bCol), col("n_obs"),
        p6(col("__e")).as("expected"),
        col("__c6").cast("double").as("contrib"),
        col("__chi2").cast("double").as("chi2"),
        ((col("__da") - 1L) * (col("__db") - 1L)).as("dof"))
  }

  /** Mutual information (nats) between two categorical columns, with
    * both marginal entropies — the dependence-strength companion to
    * [[chiSquare]] (χ² says "dependent or not at this n"; MI says "how
    * many nats of one column the other reveals", and MI/min(H_a,H_b)
    * is the normalized coupling). One row out:
    * `n_rows`, `n_cells`, `mi_nats`, `h_a`, `h_b`.
    *
    * Same discipline as [[chiSquare]]: per-cell (o/n)·ln(o·n/(ra·cb))
    * and per-marginal −(r/n)·ln(r/n) contributions are fixed-order
    * double expressions rounded to 6 places and summed as
    * DECIMAL(18,6). Cells with o=0 never appear (MI's 0·ln0 = 0 term
    * is exactly their absence).
    */
  def mutualInfo(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val (g, tot) = contingency(df, aCol, bCol)
    val od = col("n_obs").cast("double")
    val nd = col("__n").cast("double")
    val rad = col("__ra").cast("double")
    val cbd = col("__cb").cast("double")
    val miRow = g
      .withColumn("__c6",
        p6((od / nd) * log((od * nd) / (rad * cbd))).cast("decimal(18,6)"))
      .agg(sum(col("__c6")).cast("double").as("mi_nats"),
        count(lit(1)).cast("long").as("n_cells"),
        max(col("__n")).as("n_rows"))
    def marginalEntropy(cnt: Column, out: String)(marg: DataFrame) =
      marg.crossJoin(broadcast(tot.select(col("__n").as("__nt"))))
        .withColumn("__h6",
          p6(-(cnt.cast("double") / col("__nt").cast("double")) *
            log(cnt.cast("double") / col("__nt").cast("double")))
            .cast("decimal(18,6)"))
        .agg(sum(col("__h6")).cast("double").as(out))
    val ha = marginalEntropy(col("__ra"), "h_a")(
      g.groupBy(col(aCol)).agg(max(col("__ra")).as("__ra")))
    val hb = marginalEntropy(col("__cb"), "h_b")(
      g.groupBy(col(bCol)).agg(max(col("__cb")).as("__cb")))
    miRow.crossJoin(broadcast(ha)).crossJoin(broadcast(hb))
      .select(col("n_rows"), col("n_cells"), col("mi_nats"),
        col("h_a"), col("h_b"))
  }

  /** Offline CUSUM change-point per group: the day where the observed
    * event-count prefix deviates most from the uniform-rate line —
    * "when did this stream's behavior change". The statistic is kept
    * INTEGER by cross-multiplication: at day k of D with prefix P_k of
    * total T, the deviation |P_k/T − k/D| scaled by D·T is
    * |D·P_k − k·T| — exact BIGINT, engine-portable, no float enters
    * the argmax. Ties break to the earliest day.
    *
    * Overflow contract: n_days · n_total < 2^63 (a million days of a
    * trillion events is still inside). Scale shape: one hash aggregate
    * to (group, day) counts — the only row-scale pass — then per-group
    * windows over the DAY-bounded series and one equi-join of the
    * per-group (D, T) aggregate; groups are the narrow side by nature
    * (event types, sources).
    *
    * Output: `grp`, `change_day`, `cusum` (the scaled max deviation),
    * `n_days`, `n_total`.
    */
  def cusumChangePoint(df: DataFrame, groupCol: String,
                       dateCol: String): DataFrame =
    cusumFromCounts(
      df.filter(col(groupCol).isNotNull && col(dateCol).isNotNull)
        .groupBy(col(groupCol).as("__cg"), col(dateCol).cast("date").as("__cd"))
        .agg(count(lit(1)).cast("long").as("__cn")),
      "__cg", "__cd", "__cn")

  /** [[cusumChangePoint]]'s scoring core over an ALREADY aggregated
    * (group, period, count) table — the streaming state shape
    * (`StreamingAgg` maintains exactly that MV additively, so the
    * live change-point view is this over its state). `ordCol` may be
    * any orderable period key (a date, or the 'yyyy-MM-dd' string the
    * streaming MV carries — lexicographic order IS day order there).
    */
  def cusumFromCounts(daily: DataFrame, groupCol: String, ordCol: String,
                      countCol: String): DataFrame = {
    val d = daily
      .filter(col(groupCol).isNotNull && col(ordCol).isNotNull)
      .select(col(groupCol).as("__g"), col(ordCol).as("__day"),
        col(countCol).cast("long").as("__n"))
    val tot = d.groupBy(col("__g"))
      .agg(count(lit(1)).cast("long").as("n_days"),
        sum(col("__n")).cast("long").as("n_total"))
    val wCum = Window.partitionBy(col("__g")).orderBy(col("__day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wRank = Window.partitionBy(col("__g")).orderBy(col("__day"))
    d.join(tot, Seq("__g"))
      .withColumn("__k", row_number().over(wRank).cast("long"))
      .withColumn("__pre", sum(col("__n")).over(wCum))
      .withColumn("cusum",
        abs(col("n_days") * col("__pre") - col("__k") * col("n_total")))
      .withColumn("__r", row_number().over(Window.partitionBy(col("__g"))
        .orderBy(col("cusum").desc, col("__day"))))
      .filter(col("__r") === 1)
      .select(col("__g").as("grp"), col("__day").as("change_day"),
        col("cusum"), col("n_days"), col("n_total"))
  }

  /** Herfindahl–Hirschman concentration index per market — the
    * antitrust-style "how monopolized is this market" card beside
    * [[keySkew]]'s Gini (which measures key fan-in inequality, not
    * value-share concentration). HHI = Σᵢ (100·sᵢ)² where sᵢ is firm
    * i's share of the market's total value: 10000 = monopoly, →0 =
    * atomized; the classic DOJ bands are <1500 unconcentrated,
    * 1500–2500 moderate, >2500 high.
    *
    * Exactness: per-firm values are exact DECIMAL(18,4) sums scaled
    * to integral e4 units; HHI = Σxᵢ²·10⁴ div X² in pure DECIMAL(38,0)
    * floor arithmetic — no float share enters. Both contract edges are
    * ENFORCED at runtime (raise_error, the pairAffinity discipline),
    * because both fail silently otherwise: a NEGATIVE per-firm total
    * (net value with refunds) squares into the numerator against a
    * smaller squared total and pushes HHI past 10000 with no signal
    * on either engine, and a market total past X < 10¹⁷ e4-units
    * (10¹³ in value) overflows Σx²·10⁴ or X² in non-ANSI DECIMAL to
    * NULL silently while the DuckDB oracle raises. X bounds EVERY
    * overflowing term once negatives are excluded (each x ≤ X, so
    * Σx² ≤ X² and Σx²·10⁴ < 10³⁸ exactly when X < 10¹⁷) — guarding
    * the total is both necessary and sufficient; a per-firm max is
    * neither (a monopoly at 2·10¹⁷ passes a per-firm 10¹⁸ check and
    * still nulls — the round-10 second-pass review finding).
    * Net-negative firms: aggregate to a coarser firm key or clamp
    * upstream; past the total bound, rescale the value column.
    *
    * Scale shape: one (market, firm) hash aggregate then one market
    * hash aggregate — two shuffles on keys only, no window, no join.
    * Markets with non-positive totals are dropped (shares undefined).
    * Output per market: `n_firms`, `hhi` (BIGINT, 0–10000).
    */
  def hhi(df: DataFrame, marketCol: String, firmCol: String,
          valueCol: String): DataFrame = {
    val perFirm = df
      .filter(col(marketCol).isNotNull && col(firmCol).isNotNull &&
        col(valueCol).isNotNull)
      .groupBy(col(marketCol).as("market"), col(firmCol).as("__f"))
      .agg(sum(col(valueCol).cast("decimal(18,4)")).as("__v"))
      .withColumn("__x", (col("__v") * 10000).cast("decimal(38,0)"))
    perFirm.groupBy(col("market"))
      .agg(count(lit(1)).cast("long").as("n_firms"),
        sum(col("__x") * col("__x")).as("__sumsq"),
        sum(col("__x")).as("__tot"),
        min(col("__x")).as("__mnx"))
      .filter(col("__tot") > 0)
      .select(col("market"), col("n_firms"),
        expr("""CASE
                 WHEN __mnx < 0 THEN CAST(raise_error(CONCAT(
                   'Profile.hhi: negative per-firm total in market ',
                   CAST(market AS STRING),
                   ' — shares are undefined and HHI would exceed 10000; ',
                   'aggregate or clamp net-negative firms upstream'))
                   AS BIGINT)
                 WHEN __tot >= 100000000000000000
                 THEN CAST(raise_error(CONCAT(
                   'Profile.hhi: market total exceeds the 10^17 e4-unit ',
                   'overflow bound in market ', CAST(market AS STRING),
                   '; rescale the value column first')) AS BIGINT)
                 ELSE CAST((__sumsq * 10000) DIV (__tot * __tot) AS BIGINT)
               END""").as("hhi"))
  }

  /** Index of dispersion (Fano factor) per key — the burstiness
    * screen over per-period event counts: variance-to-mean ratio of a
    * key's per-period counts with ZERO-COUNT PERIODS INCLUDED via the
    * global period count M (the XYZ convention — a key active one day
    * in a thousand is bursty, not steady). Fano ≈ 1 is Poisson-like
    * arrival, ≫ 1 bursty/clumped, < 1 more regular than random:
    *   F = Var/Mean = (M·Σc² − (Σc)²) / (M·Σc)
    * emitted as exact floor basis points (`fano_bp`, BIGINT — 10⁴ =
    * Poisson).
    *
    * Exactness: per-period counts are exact BIGINTs; Σc² accumulates
    * with c cast to DECIMAL(19,0) BEFORE squaring (the rankAuc wrap
    * lesson — per-period counts square past 2⁶³ at cluster scale) and
    * the closing ratio is one DECIMAL(38,0) floor division. The
    * numerator is ≥ 0 by Cauchy–Schwarz, so floor = truncation on
    * both engines. Keys with Σc = 0 cannot occur (a key only exists
    * through its rows).
    *
    * Scale shape: one (key, period) hash aggregate — the row-scale
    * pass — then one key-level aggregate; M attaches as a one-row
    * broadcast (the [[Pareto.xyzClassification]] shape). Output = one
    * row per key; zero periods never materialize.
    */
  def dispersionIndex(df: DataFrame, keyCol: String,
                      periodCol: String): DataFrame = {
    val per = df
      .filter(col(keyCol).isNotNull && col(periodCol).isNotNull)
      .groupBy(col(keyCol).as("__k"), col(periodCol).as("__p"))
      .agg(count(lit(1)).cast("long").as("__c"))
    val m = per.agg(count_distinct(col("__p")).cast("long").as("__m"))
    per.groupBy(col("__k"))
      .agg(count(lit(1)).cast("long").as("n_periods"),
        sum(col("__c")).cast("decimal(38,0)").as("__s"),
        sum(col("__c").cast("decimal(19,0)") *
          col("__c").cast("decimal(19,0)")).cast("decimal(38,0)")
          .as("__q"))
      .crossJoin(broadcast(m))
      .select(col("__k").as(keyCol), col("n_periods"),
        col("__s").cast("long").as("n_events"),
        expr("""CAST((10000 * (CAST(__m AS DECIMAL(19,0)) * __q - __s * __s))
                DIV (CAST(__m AS DECIMAL(19,0)) * __s) AS BIGINT)""")
          .as("fano_bp"))
  }

  /** Exact 1-D Wasserstein distance (earth mover's) between two arms'
    * value distributions per group — the drift metric that reports
    * HOW FAR mass moved in value units, where KS (q183) reports the
    * max CDF gap and PSI/JS (q146/q224) report bin-weighted
    * divergences blind to distance. The metric of choice for "did
    * the score distribution shift, and by how much?".
    *
    * Discrete closed form over the shared value grid: with cumulative
    * arm counts cumA/cumB at each distinct value v and gap = next(v)
    * − v, EMD = Σ_v |cumA·n_b − cumB·n_a| / (n_a·n_b) · gap. The
    * numerator |cumA·n_b − cumB·n_a| is exact DECIMAL(38,0); each
    * term is ONE fixed-order double (pround6) into an order-free
    * DECIMAL(18,6) sum — the mannWhitneyU/logRank discipline. The
    * last value contributes nothing (both CDFs are 1 there).
    *
    * Scale shape: one hash aggregate to (group, value) arm counts,
    * one window over DISTINCT values per group (vocabulary-bounded —
    * the weightedMedian contract; bucket continuous metrics first),
    * one closing aggregate. One-arm groups are dropped.
    */
  def wasserstein1d(df: DataFrame, groupCol: String, armCol: String,
                    valCol: String): DataFrame = {
    val arm = when(col(armCol).cast("long") =!= 0L, 1L).otherwise(0L)
    val cells = df
      .filter(col(groupCol).isNotNull && col(armCol).isNotNull &&
        col(valCol).isNotNull)
      .select(col(groupCol).as("__g"), arm.as("__arm"),
        col(valCol).cast("double").as("__v"))
      .groupBy(col("__g"), col("__v"))
      .agg(sum(lit(1L) - col("__arm")).cast("long").as("__na"),
        sum(col("__arm")).cast("long").as("__nb"))
    val w = Window.partitionBy(col("__g")).orderBy(col("__v"))
    val wCum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("__g"))
    val stepped = cells
      .withColumn("__ta", sum(col("__na")).over(wAll).cast("long"))
      .withColumn("__tb", sum(col("__nb")).over(wAll).cast("long"))
      .withColumn("__cuma", sum(col("__na")).over(wCum))
      .withColumn("__cumb", sum(col("__nb")).over(wCum))
      .withColumn("__gap", lead(col("__v"), 1).over(w) - col("__v"))
    stepped.groupBy(col("__g").as(groupCol))
      .agg(max(col("__ta")).as("n_a"), max(col("__tb")).as("n_b"),
        sum(when(col("__gap").isNotNull && col("__ta") > 0L &&
            col("__tb") > 0L,
          p6(expr("""CAST(abs(CAST(__cuma AS DECIMAL(38,0)) * __tb
                 - CAST(__cumb AS DECIMAL(38,0)) * __ta) AS DOUBLE)
               / (CAST(__ta AS DOUBLE) * CAST(__tb AS DOUBLE))
               * __gap""")))
          .otherwise(lit(0.0)).cast("decimal(18,6)")).as("__emd"))
      .filter(col("n_a") > 0L && col("n_b") > 0L)
      .select(col(groupCol), col("n_a"), col("n_b"),
        col("__emd").cast("double").as("emd"))
  }

  /** Top-k set drift per group: how much did the top-k keys (by
    * summed value) change between two periods? The rank-stability
    * audit behind "did our best-selling parts change this year?" —
    * distribution metrics (PSI/EMD) see mass move, this sees the
    * LEADERBOARD move. Output per group: the two top-list sizes
    * (≤ k — a period can have fewer keys), the intersection size,
    * exact Jaccard in ppm (BIGINT — no doubles anywhere), and how
    * many of arm 1's top keys are new entrants.
    *
    * Determinism: per-key value totals sum as DECIMAL(18,2) cents;
    * ranking breaks ties by ascending key, so the top-k SET is
    * engine-exact. jaccard_ppm = |∩|·10⁶ div |∪| — exact floor.
    *
    * Scale shape: one (group, arm, key) hash aggregate, one
    * row_number window per (group, arm) filtered to rank ≤ k (the
    * WindowGroupLimit shape), then a tiny top-list self-join on the
    * group+key — every frame past the window holds ≤ 2k rows per
    * group.
    */
  def topKDrift(df: DataFrame, groupCol: String, armCol: String,
                keyCol: String, valCol: String, k: Int = 50): DataFrame = {
    val arm = when(col(armCol).cast("long") =!= 0L, 1L).otherwise(0L)
    val perKey = df
      .filter(col(groupCol).isNotNull && col(armCol).isNotNull &&
        col(keyCol).isNotNull && col(valCol).isNotNull)
      .select(col(groupCol).as("__g"), arm.as("arm"),
        col(keyCol).as("key"),
        col(valCol).cast("decimal(18,2)").as("__v"))
      .groupBy(col("__g"), col("arm"), col("key"))
      .agg(sum(col("__v")).cast("decimal(38,2)").as("tot"))
      .withColumnRenamed("__g", groupCol)
    topKDriftFromTotals(perKey, groupCol, k)
  }

  /** The [[topKDrift]] closing over an ALREADY-AGGREGATED per-key
    * totals table (`groupCol`, `arm` 0/1, `key`, `tot`) — the
    * streaming seam: per-key value totals are ADDITIVE, so
    * `streaming.StreamingTopKDrift`'s maintained state feeds this
    * directly and the live card equals the one-shot card by
    * construction.
    */
  def topKDriftFromTotals(perKey: DataFrame, groupCol: String,
                          k: Int = 50): DataFrame = {
    require(k >= 1 && k <= 10000, s"k must be in [1, 10000]: $k")
    val w = Window.partitionBy(col(groupCol), col("arm"))
      .orderBy(col("tot").desc, col("key").asc)
    val top = perKey.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col(groupCol), col("arm"), col("key"))
      .localCheckpoint(true)
    val a = top.filter(col("arm") === 0L).drop("arm")
    val b = top.filter(col("arm") === 1L).drop("arm")
    val sizes = top.groupBy(col(groupCol))
      .agg(sum(when(col("arm") === 0L, 1L).otherwise(0L))
        .cast("long").as("n_top_a"),
        sum(when(col("arm") === 1L, 1L).otherwise(0L))
        .cast("long").as("n_top_b"))
    val common = a.join(b, Seq(groupCol, "key"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).cast("long").as("n_common"))
    sizes.join(common, Seq(groupCol), "left")
      .withColumn("n_common", coalesce(col("n_common"), lit(0L)))
      .filter(col("n_top_a") + col("n_top_b") > 0L)
      .select(col(groupCol), col("n_top_a"), col("n_top_b"),
        col("n_common"),
        expr("""CAST(CAST(n_common AS DECIMAL(19,0)) * 1000000
          DIV (n_top_a + n_top_b - n_common) AS BIGINT)""")
          .as("jaccard_ppm"),
        (col("n_top_b") - col("n_common")).as("n_new"))
  }

  /** Bhattacharyya coefficient and Hellinger distance between the two
    * ARMS' value-bucket histograms, per group — the drift metric that
    * is a true METRIC (symmetric, triangle inequality), read beside
    * PSI (asymmetric, unbounded) and KS (max-gap): BC = Σ√(p_i·q_i)
    * is 1 for identical histograms and 0 for disjoint support;
    * H = √(1−BC) ∈ [0,1]. No smoothing is NEEDED — a bin absent from
    * one arm contributes √(p·0) = 0 — which is exactly why BC is the
    * right pick for sparse histograms where PSI's smoothing term
    * dominates.
    *
    * Buckets are the q146 power-of-two primitive (`len(bin(x))−1`,
    * −1 for NULL/non-positive). Exactness: per-bin p/q are doubles of
    * exact BIGINT counts; each √(p·q) term is ONE fixed-order double,
    * pround6, summed as DECIMAL(18,6); H's 1−BC is clamped at 0
    * before the final sqrt (rounded terms can overshoot 1 by ≤
    * #bins·5·10⁻⁷ — the clamp is mirrored by the oracle). A group
    * with an empty arm reports NULL bc/hellinger.
    *
    * Scale shape: one (group, bin) conditional-count hash aggregate,
    * one group-totals rollup broadcast back, one closing group
    * aggregate. ≤ 64 buckets by construction.
    */
  def hellinger(df: DataFrame, groupCol: String, armCol: String,
                valCol: String): DataFrame = {
    def p6(c: Column) = graft.functions.Rounding.p6(c)
    val arm = col(armCol).cast("long") =!= 0L
    // explicit floor before the integral cast: Spark's double->long
    // cast truncates while DuckDB's CAST rounds half-even — floor is
    // the one both engines agree on
    val bucket = when(col(valCol) > 0,
      (length(bin(floor(col(valCol)).cast("long"))) - 1).cast("long"))
      .otherwise(lit(-1L))
    val cells = df.filter(col(groupCol).isNotNull && col(armCol).isNotNull)
      .select(col(groupCol), arm.as("__a"), bucket.as("__b"))
      .groupBy(col(groupCol), col("__b"))
      .agg(sum(when(col("__a"), 1L).otherwise(0L)).cast("long").as("__ca"),
        sum(when(!col("__a"), 1L).otherwise(0L)).cast("long").as("__cb"))
    val tot = cells.groupBy(col(groupCol))
      .agg(sum(col("__ca")).cast("long").as("n_a"),
        sum(col("__cb")).cast("long").as("n_b"))
    // ANSI guard: an empty arm would divide by zero inside the term;
    // such groups report NULL below, so the term is a dead 0 there
    val term = when(col("n_a") > 0L && col("n_b") > 0L, sqrt(
      (col("__ca").cast("double") / col("n_a").cast("double")) *
        (col("__cb").cast("double") / col("n_b").cast("double"))))
      .otherwise(lit(0.0))
    cells.join(broadcast(tot), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        sum(p6(term).cast("decimal(18,6)")).as("__bc"))
      .select(col(groupCol), col("n_a"), col("n_b"),
        when(col("n_a") > 0L && col("n_b") > 0L,
          col("__bc").cast("double")).as("bc"),
        when(col("n_a") > 0L && col("n_b") > 0L,
          p6(sqrt(greatest(lit(0.0),
            lit(1.0) - col("__bc").cast("double"))))).as("hellinger"))
  }

  /** Exact scaled-integer moment aggregate shared by [[pearsonMatrix]]
    * and [[partialCorrelation]]: per group, n plus the FIRST moments
    * Σv_i, min/max, and all requested SECOND moments Σv_i·v_j over
    * v = round(x·100) — the 2-decimal input contract made explicit as
    * a ×100 long.
    *
    * Why longs, not decimals: a wide-decimal sum (precision > 18)
    * leaves Spark's compact-long Decimal fast path — per-row
    * BigDecimal boxing made the 16-sum lineitem aggregate 26.5 s at
    * sf1.0 where the long form is 4.0 s. Pearson r is invariant to
    * the ×100 scaling (the factors cancel in num and den), so the
    * closing double chain is unchanged in shape.
    *
    * Exactness at scale — the hi/lo split: a product Σ could overflow
    * a long, so each product p accumulates as TWO long sums,
    * Σ(p >> 20) and Σ(p & 0xFFFFF) (two's-complement identity holds
    * for negatives), reconstructed exactly at closing as
    * DECIMAL(38,0) = 2^20·Σhi + Σlo. Both halves fit a long while
    * n·max(v_i·v_j)/2^20 ≤ 8e18 AND n·2^20 ≤ 8e18 — the second bound
    * is the LO half's own ceiling (each lo term is in [0, 2^20), so
    * Σlo ≤ n·(2^20−1) regardless of magnitude; without it a
    * small-magnitude group could pass the hi-side guard with n up to
    * ~8e18 while Σlo wraps past n ≈ 8.8e12 — the round-14 advisor
    * finding). Together they admit ~10^10 rows per group at lineitem
    * magnitudes, ~7.6e12 at any magnitude. The bound is GUARDED, not
    * assumed: the closing select raises (assert_true) when the
    * group's min/max/n admit a wrapped sum, or when any value
    * overflowed the DECIMAL(18,2) input cast — never a silent wrong
    * answer.
    */
  private def scaledMomentAgg(df: DataFrame, groupCol: String,
                              cols: Seq[String],
                              pairs: Seq[(Int, Int)]): DataFrame = {
    val scaled = df.filter(col(groupCol).isNotNull &&
        cols.map(col(_).isNotNull).reduce(_ && _))
      .select(col(groupCol).as("__g") +:
        cols.zipWithIndex.map { case (c, i) =>
          (col(c).cast("decimal(18,2)") * 100).cast("long").as(s"__v$i")
        }: _*)
    val prods = cols.indices.map(i => (i, i)) ++ pairs
    val agg = scaled.groupBy(col("__g"))
      .agg(count(lit(1)).cast("long").as("n"),
        (cols.indices.flatMap(i => Seq(
          sum(col(s"__v$i")).as(s"__sl$i"),
          count(col(s"__v$i")).as(s"__c$i"),
          min(col(s"__v$i")).as(s"__mn$i"),
          max(col(s"__v$i")).as(s"__mx$i"))) ++
          prods.flatMap { case (i, j) =>
            val p = col(s"__v$i") * col(s"__v$j")
            Seq(sum(shiftright(p, 20)).as(s"__hi${i}_$j"),
              sum(p.bitwiseAND(lit((1L << 20) - 1))).as(s"__lo${i}_$j"))
          }): _*)
    // conservative double-space guard (>2% margin under 2^62 / 2^63−1,
    // which one rounding ulp cannot bridge); evaluated on the per-group
    // rows only. __c$i < n means a value overflowed DECIMAL(18,2).
    val nD = col("n").cast("double")
    val maxAbsD = cols.indices
      .map(i => greatest(abs(col(s"__mn$i")), abs(col(s"__mx$i")))
        .cast("double"))
      .reduce(greatest(_, _))
    val m2 = maxAbsD * maxAbsD
    val ok = m2 <= lit(4.0e18) &&
      nD * (m2 / 1048576.0 + 1.0) <= lit(8.0e18) &&
      // lo-half ceiling: Σ(p & 0xFFFFF) ≤ n·(2^20−1) independent of
      // magnitude, so n itself must stay under 8e18/2^20 — the hi-side
      // product bound alone admits lo-wrapping n at small magnitudes
      nD * 1048576.0 <= lit(8.0e18) &&
      nD * maxAbsD <= lit(8.0e18) &&
      cols.indices.map(i => col(s"__c$i") === col("n")).reduce(_ && _)
    val guardedN = when(
      assert_true(ok, lit("scaledMomentAgg: group magnitudes admit a " +
        "wrapped long moment (need |x·100| within DECIMAL(18,2), " +
        "n·max(x·100)²/2^20 <= 8e18 and n·2^20 <= 8e18) — rescale " +
        "the inputs or pre-aggregate the group")).isNull,
      col("n")).as("n")
    agg.select(col("__g") +: guardedN +:
      (cols.indices.flatMap(i => Seq(
        col(s"__sl$i").cast("decimal(38,0)").as(s"__s$i"),
        col(s"__mn$i"), col(s"__mx$i"))) ++
        prods.map { case (i, j) =>
          val rebuilt = col(s"__hi${i}_$j").cast("decimal(38,0)") *
            lit(1048576L) + col(s"__lo${i}_$j").cast("decimal(38,0)")
          if (i == j) rebuilt.as(s"__q$i") else rebuilt.as(s"__x${i}_$j")
        }): _*)
  }

  /** Pairwise Pearson correlation matrix per group over a fixed set
    * of ≤ 8 numeric columns — the one-pass multicollinearity screen a
    * feature table gets before model training ("quantity and price
    * carry the same signal; drop one"). One row per unordered column
    * pair, names in the declared order.
    *
    * Exactness (2-decimal input contract): moments accumulate as
    * EXACT ×100-scaled long sums ([[scaledMomentAgg]] — hi/lo-split
    * against overflow, guarded not assumed), and
    * r = (n·Σxy − Σx·Σy)/√((n·Σx²−Σx²)(n·Σy²−Σy²)) is ONE
    * fixed-order double chain over those exact sums, pround6; r is
    * scale-invariant so the ×100 factors cancel. A zero-variance
    * column (exact on the scaled values) reports NULL r for its
    * pairs. Rows with ANY NULL among the columns are dropped
    * (listwise deletion — the matrix stays positive semi-definite).
    *
    * Scale shape: ONE hash aggregate (k + k(k+1)/2 long sums fold
    * into the same pass), then a k(k−1)/2-element inline explode on
    * the one-row-per-group result.
    */
  def pearsonMatrix(df: DataFrame, groupCol: String,
                    cols: Seq[String]): DataFrame = {
    require(cols.size >= 2 && cols.size <= 8,
      s"need 2..8 columns: ${cols.size}")
    require(cols.distinct.size == cols.size, s"duplicate columns: $cols")
    def p6(c: Column) = graft.functions.Rounding.p6(c)
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (i, j)
    val agg = scaledMomentAgg(df, groupCol, cols, pairs)
      .withColumnRenamed("__g", groupCol)
    // zero variance is detected EXACTLY (min = max) — the double
    // radicand n·Σx²−(Σx)² is ulp-fragile at large magnitudes and can
    // land positive for a constant column (round-11 review finding);
    // the d ≤ 0 check remains as the inner NaN guard
    def rExpr(i: Int, j: Int) = {
      val num = s"(CAST(n AS DOUBLE) * CAST(__x${i}_$j AS DOUBLE)" +
        s" - CAST(__s$i AS DOUBLE) * CAST(__s$j AS DOUBLE))"
      def d(k: Int) = s"(CAST(n AS DOUBLE) * CAST(__q$k AS DOUBLE)" +
        s" - CAST(__s$k AS DOUBLE) * CAST(__s$k AS DOUBLE))"
      expr(s"""CASE WHEN __mn$i = __mx$i OR __mn$j = __mx$j THEN NULL
        WHEN ${d(i)} <= 0.0 OR ${d(j)} <= 0.0 THEN NULL
        ELSE $num / sqrt(${d(i)} * ${d(j)}) END""")
    }
    val rows = pairs.map { case (i, j) => struct(
      lit(cols(i)).as("ca"), lit(cols(j)).as("cb"),
      rExpr(i, j).as("rr"))
    }
    agg.select(col(groupCol), col("n"),
        explode(array(rows: _*)).as("__r"))
      .select(col(groupCol), col("__r.ca").as("col_a"),
        col("__r.cb").as("col_b"), col("n"),
        p6(col("__r.rr")).as("r"))
  }

  /** First-order partial correlation per group: the x–y association
    * with a confounder z HELD FIXED — r_xy·z = (r_xy − r_xz·r_yz) /
    * √((1−r_xz²)(1−r_yz²)). The "is the correlation real or is it
    * just z?" screen ([[pearsonMatrix]]'s follow-up question): price
    * and discount may correlate only because both track quantity.
    *
    * Exactness rides [[pearsonMatrix]]'s moment discipline (exact
    * ×100-scaled long sums via [[scaledMomentAgg]]; the three raw
    * r's and the partial are ONE
    * fixed-order double chain, pround6 only at output — the partial
    * is computed from the RAW r's, never the rounded ones). Any
    * zero-variance column, or |r_xz| = 1 / |r_yz| = 1 (z explains a
    * variable completely — the partial is undefined), reports NULL.
    * Listwise NULL deletion as [[pearsonMatrix]].
    *
    * Scale shape: ONE hash aggregate. Nothing else.
    */
  def partialCorrelation(df: DataFrame, groupCol: String, xCol: String,
                         yCol: String, zCol: String): DataFrame = {
    def p6(c: Column) = graft.functions.Rounding.p6(c)
    val cs = Seq(xCol, yCol, zCol)
    // exact ×100-scaled long moments (hi/lo split, overflow-guarded)
    // shared with pearsonMatrix — see scaledMomentAgg; the r's are
    // scale-invariant so the closing chains keep their shape
    val agg = scaledMomentAgg(df, groupCol, cs,
        Seq((0, 1), (0, 2), (1, 2)))
      .withColumnRenamed("__g", groupCol)
    def d(k: Int) = s"(CAST(n AS DOUBLE) * CAST(__q$k AS DOUBLE)" +
      s" - CAST(__s$k AS DOUBLE) * CAST(__s$k AS DOUBLE))"
    def r(i: Int, j: Int) =
      s"((CAST(n AS DOUBLE) * CAST(__x${i}_$j AS DOUBLE)" +
        s" - CAST(__s$i AS DOUBLE) * CAST(__s$j AS DOUBLE))" +
        s" / sqrt(${d(i)} * ${d(j)}))"
    val den = s"((1.0 - ${r(0, 2)} * ${r(0, 2)})" +
      s" * (1.0 - ${r(1, 2)} * ${r(1, 2)}))"
    // constant columns detected EXACTLY (min = max — see pearsonMatrix)
    // plus the double d > 0 inner check against ulp pathologies
    val defined = "(__mn0 <> __mx0 AND __mn1 <> __mx1" +
      " AND __mn2 <> __mx2" +
      s" AND ${d(0)} > 0.0 AND ${d(1)} > 0.0 AND ${d(2)} > 0.0)"
    // nested CASE: the den/r expressions divide by the variance terms,
    // and ANSI mode raises on a zero divisor — `defined` must gate
    // their EVALUATION (outer branch), not just AND into one condition
    agg.select(col(groupCol), col("n"),
      p6(expr(s"CASE WHEN $defined THEN ${r(0, 1)} END")).as("r_xy"),
      p6(expr(s"""CASE WHEN $defined THEN
        CASE WHEN $den > 0.0
          THEN (${r(0, 1)} - ${r(0, 2)} * ${r(1, 2)}) / sqrt($den)
        END END""")).as("r_xy_z"))
  }

  /** Cramér's V per group: the calibrated EFFECT SIZE for a
    * categorical×categorical association — the q252 chi-square says
    * "dependent somewhere", V ∈ [0,1] says HOW MUCH, comparable
    * across tables of different size and shape (V = √(χ²/(N·min(r−1,
    * c−1)))). The categorical row in the effect-size family beside
    * Cohen's d (means) and Cliff's delta (ranks).
    *
    * Exactness: the contingency is exact BIGINT; each cell's
    * (o−e)²/e term is ONE fixed-order double over exact integers
    * (e = rowTot·colTot/N), pround6, summed as DECIMAL(18,6) — the
    * labelEntropy discipline — and V is one closing sqrt, pround6. A
    * degenerate table (one row or one column level) has no
    * association to measure: NULL V, χ² still reported. Distinct
    * (a, b) cells per group are capped by `maxCells` with a raise ON
    * the scanned rows (the kendallTau guard placement).
    *
    * Scale shape: ONE (group, a, b) hash aggregate is the row-scale
    * pass; totals come from windows PARTITIONED by (group, a) /
    * (group, b) / (group) over the contingency-bounded cell table,
    * plus one broadcast level-count join.
    */
  def cramersV(df: DataFrame, groupCol: String, aCol: String,
               bCol: String, maxCells: Long = 20000L): DataFrame = {
    require(maxCells >= 1L, s"maxCells must be >= 1, got $maxCells")
    def p6(c: Column) = graft.functions.Rounding.p6(c)
    val cells = df.filter(col(groupCol).isNotNull && col(aCol).isNotNull &&
        col(bCol).isNotNull)
      .groupBy(col(groupCol).as("__g"), col(aCol).as("__a"),
        col(bCol).as("__b"))
      .agg(count(lit(1)).cast("long").as("__o"))
      .localCheckpoint(true)
    val meta = cells.groupBy(col("__g"))
      .agg(countDistinct(col("__a")).cast("long").as("r_levels"),
        countDistinct(col("__b")).cast("long").as("c_levels"),
        sum(col("__o")).cast("long").as("__tn"))
    val ra = cells.groupBy(col("__g"), col("__a"))
      .agg(sum(col("__o")).cast("long").as("__ra"))
    val cb = cells.groupBy(col("__g"), col("__b"))
      .agg(sum(col("__o")).cast("long").as("__cb"))
    // the FULL r×c grid — an UNOBSERVED cell still contributes its
    // (0−e)²/e = e term; summing observed cells only silently
    // underestimates χ² on sparse tables (and the hash gate cannot
    // catch a mirrored omission — the hhi lesson). The guard lives on
    // the grid's build input so an over-budget group raises before
    // r×c rows exist.
    val raGuarded = ra.join(broadcast(meta), Seq("__g"))
      .withColumn("__rag",
        when(col("r_levels") * col("c_levels") > maxCells,
          expr(s"CAST(raise_error(concat('Profile.cramersV: ', " +
            s"CAST(r_levels * c_levels AS STRING), ' grid cells in one " +
            s"group exceed maxCells=$maxCells; bucket the columns " +
            "first')) AS BIGINT)"))
          .otherwise(col("__ra")))
    val grid = raGuarded.join(cb, Seq("__g"))
      .join(cells, Seq("__g", "__a", "__b"), "left")
      .withColumn("__og", coalesce(col("__o"), lit(0L)))
    val eX = "(CAST(__rag AS DOUBLE) * CAST(__cb AS DOUBLE)" +
      " / CAST(__tn AS DOUBLE))"
    val agg = grid.groupBy(col("__g"))
      .agg(max(col("__tn")).as("n"),
        max(col("r_levels")).as("r_levels"),
        max(col("c_levels")).as("c_levels"),
        sum(p6(expr(s"(CAST(__og AS DOUBLE) - $eX)" +
          s" * (CAST(__og AS DOUBLE) - $eX) / $eX"))
          .cast("decimal(18,6)")).as("__chi"))
    // the grid-input raise above protects the chi path, but a caller
    // that prunes __chi prunes it too (the pruned-guard lesson) — so
    // every value column carries its own budget guard as well
    val over = col("r_levels") * col("c_levels") > lit(maxCells)
    val msg = s"'Profile.cramersV: grid cells in one group exceed " +
      s"maxCells=$maxCells; bucket the columns first'"
    def guarded(c: Column, sqlType: String) =
      when(over, expr(s"CAST(raise_error($msg) AS $sqlType)"))
        .otherwise(c)
    agg.select(col("__g").as(groupCol),
      guarded(col("n"), "BIGINT").as("n"),
      col("r_levels"), col("c_levels"),
      guarded(col("__chi").cast("double"), "DOUBLE").as("chi2"),
      guarded(when(least(col("r_levels") - 1, col("c_levels") - 1) > 0L,
        p6(sqrt(col("__chi").cast("double") /
          (col("n").cast("double") *
            least(col("r_levels") - 1, col("c_levels") - 1)
              .cast("double"))))), "DOUBLE").as("cramers_v"))
  }

  /** Chapman capture–recapture estimate of a population's true size
    * from TWO observation windows: with n1 keys seen in capture A,
    * n2 in capture B, and m in both,
    *   N̂ = (n1+1)(n2+1)/(m+1) − 1   (Chapman's bias-corrected form)
    *   Var ≈ (n1+1)(n2+1)(n1−m)(n2−m) / ((m+1)²(m+2))
    * The dedup-adjacent estimator: "how many distinct users/documents
    * exist, given two partial crawls?" — the answer two overlapping
    * snapshots give without ever seeing the whole population.
    *
    * `inA`/`inB` are 0/1 indicator columns (a key may be in either,
    * both, or — rows outside both are ignored). The estimate is an
    * exact floored integer (DECIMAL(38,0) cross-multiplication); the
    * SE is the one p6 double. Groups with m = 0 report NULL estimate
    * (disjoint captures carry no overlap information).
    *
    * Scale shape: one hash aggregate per (group, key) for the two
    * indicators, one per group for the four counts — no joins.
    *
    * Output: group, n1, n2, m, n_hat, se.
    */
  def captureRecapture(df: DataFrame, groupCol: String, keyCol: String,
                       inACol: String, inBCol: String): DataFrame = {
    val perKey = df
      .filter(col(groupCol).isNotNull && col(keyCol).isNotNull)
      .groupBy(col(groupCol), col(keyCol))
      .agg(max(col(inACol).cast("long")).as("__a"),
        max(col(inBCol).cast("long")).as("__b"))
    chapmanFromIndicators(perKey, groupCol)
  }

  /** The Chapman closing over a per-(group, key) indicator table with
    * columns `__a`/`__b` — shared verbatim by the streaming capture
    * monitor, whose state IS this table maintained across batches
    * (indicators merge by max, so any batch split lands here equal).
    */
  def chapmanFromIndicators(perKey: DataFrame,
                            groupCol: String): DataFrame = {
    val counts = perKey
      .filter(col("__a") === 1L || col("__b") === 1L)
      .groupBy(col(groupCol))
      .agg(sum(col("__a")).cast("long").as("n1"),
        sum(col("__b")).cast("long").as("n2"),
        sum(when(col("__a") === 1L && col("__b") === 1L, 1L)
          .otherwise(0L)).cast("long").as("m"))
    val d = (c: Column) => c.cast("decimal(38,0)")
    counts.select(col(groupCol), col("n1"), col("n2"), col("m"),
      when(col("m") > 0L,
        expr("""CAST((CAST(n1 + 1 AS DECIMAL(38,0)) * (n2 + 1)
          - pmod(CAST(n1 + 1 AS DECIMAL(38,0)) * (n2 + 1), m + 1))
          / (m + 1) - 1 AS BIGINT)"""))
        .as("n_hat"),
      when(col("m") > 0L, graft.functions.Rounding.p6(sqrt(
        (d(col("n1") + 1L) * (col("n2") + 1L) * (col("n1") - col("m")) *
          (col("n2") - col("m"))).cast("double") /
          (d(col("m") + 1L) * (col("m") + 1L) * (col("m") + 2L))
            .cast("double"))))
        .as("se"))
  }

  /** Theil's uncertainty coefficient between two categorical columns:
    * U(X|Y) = (H(X) + H(Y) − H(X,Y)) / H(X) — the share of X's
    * entropy that Y explains, in [0,1] and (unlike [[cramersV]])
    * ASYMMETRIC, so it answers "which way does the information flow".
    * Both directions plus the symmetric average are reported.
    *
    * Entropies are DECIMAL sums of p6 per-level contributions
    * (n_i/N)·ln(N/n_i) over exact counts — order-free accumulation,
    * ln the one engine-portable transcendental per term. Degenerate
    * H = 0 marginals report NULL for the direction that divides by
    * them.
    *
    * Scale shape: one hash aggregate to the (x, y) cell table
    * (bounded by the level-pair vocabulary), margins and entropies
    * fold from it — no joins beyond the per-group closing.
    *
    * Output: group, n, h_x, h_y, u_x_given_y, u_y_given_x, u_sym.
    */
  def theilU(df: DataFrame, groupCol: String, xCol: String,
             yCol: String): DataFrame = {
    def p6(c: Column) = graft.functions.Rounding.p6(c)
    val cells = df
      .filter(col(groupCol).isNotNull && col(xCol).isNotNull &&
        col(yCol).isNotNull)
      .groupBy(col(groupCol).as("__g"), col(xCol).as("__x"),
        col(yCol).as("__y"))
      .agg(count(lit(1)).cast("long").as("__c"))
      .localCheckpoint(true)
    val n = cells.groupBy(col("__g"))
      .agg(sum(col("__c")).cast("long").as("n"))
    def entropy(keyed: DataFrame, out: String): DataFrame = keyed
      .join(broadcast(n), Seq("__g"))
      .withColumn("__t6", p6(
        col("__c").cast("double") / col("n").cast("double") *
          log(col("n").cast("double") / col("__c").cast("double"))))
      .groupBy(col("__g"))
      .agg(p6(sum(col("__t6").cast("decimal(18,6)"))
        .cast("decimal(38,6)").cast("double")).as(out))
    val hx = entropy(cells.groupBy(col("__g"), col("__x"))
      .agg(sum(col("__c")).cast("long").as("__c")), "h_x")
    val hy = entropy(cells.groupBy(col("__g"), col("__y"))
      .agg(sum(col("__c")).cast("long").as("__c")), "h_y")
    val hxy = entropy(cells.select(col("__g"), col("__c")), "h_xy")
    n.join(hx, Seq("__g")).join(hy, Seq("__g")).join(hxy, Seq("__g"))
      .select(col("__g").as(groupCol), col("n"), col("h_x"), col("h_y"),
        when(col("h_x") > 0.0,
          p6((col("h_x") + col("h_y") - col("h_xy")) / col("h_x")))
          .as("u_x_given_y"),
        when(col("h_y") > 0.0,
          p6((col("h_x") + col("h_y") - col("h_xy")) / col("h_y")))
          .as("u_y_given_x"),
        when(col("h_x") + col("h_y") > 0.0,
          p6(lit(2.0) * (col("h_x") + col("h_y") - col("h_xy")) /
            (col("h_x") + col("h_y")))).as("u_sym"))
  }

  /** Correlation ratio η² — how much of a NUMERIC column's variance a
    * categorical column explains: η² = SS_between / SS_total from
    * exact DECIMAL moment sums (Σ S_i²/n_i stations are p6, summed
    * order-free in DECIMAL). The categorical→numeric association
    * lens beside [[cramersV]] (cat↔cat) and [[theilU]] (directional
    * cat↔cat). Zero total variance reports NULL.
    *
    * Output: group, n, k_levels, eta_sq.
    */
  def etaSquared(df: DataFrame, groupCol: String, catCol: String,
                 numCol: String): DataFrame = {
    def p6(c: Column) = graft.functions.Rounding.p6(c)
    val base = df
      .filter(col(groupCol).isNotNull && col(catCol).isNotNull &&
        col(numCol).isNotNull)
      .select(col(groupCol).as("__g"), col(catCol).as("__v"),
        col(numCol).cast("decimal(18,2)").as("__x"))
    // everything in exact INTEGER cent² units (the kruskalWallis s6u
    // discipline): S²/n stations grow with row count squared, and a
    // p6 double station saturates Spark's long-valued floor past
    // ~9e12 (DuckDB's double floor does not — silent divergence).
    // Floored integer quotients are exact at any magnitude in both
    // engines; each station understates by < 1 cent².
    def sqc(c: Column) = { // (value·100)² as DECIMAL(38,0), exact
      val u = (c * 100).cast("decimal(19,0)")
      (u * u).cast("decimal(38,0)")
    }
    def flooredDiv(num: Column, den: Column) =
      ((num - pmod(num, den)) / den).cast("decimal(38,0)")
    val levels = base.groupBy(col("__g"), col("__v"))
      .agg(count(lit(1)).cast("long").as("__ni"),
        sum(col("__x")).cast("decimal(38,2)").as("__si"),
        sum(sqc(col("__x"))).cast("decimal(38,0)").as("__qi"))
      .withColumn("__b", flooredDiv(sqc(col("__si")), col("__ni")))
    levels.groupBy(col("__g"))
      .agg(sum(col("__ni")).cast("long").as("n"),
        count(lit(1)).cast("long").as("k_levels"),
        sum(col("__si")).cast("decimal(38,2)").as("__s"),
        sum(col("__qi")).cast("decimal(38,0)").as("__q"),
        sum(col("__b")).cast("decimal(38,0)").as("__bs"))
      .withColumn("__s2n", flooredDiv(sqc(col("__s")), col("n")))
      .select(col("__g").as(groupCol), col("n"), col("k_levels"),
        when((col("__q") - col("__s2n")) > 0,
          p6((col("__bs") - col("__s2n")).cast("double") /
            (col("__q") - col("__s2n")).cast("double"))).as("eta_sq"))
  }

  /** Decision-stump feature ranking: for each candidate categorical
    * feature, the information gain on a categorical target —
    * IG = H(target) − Σ_v p_v·H(target | v) — and Quinlan's gain
    * ratio IG / H(feature), which penalizes high-cardinality
    * features that memorize rather than explain. THE first-pass
    * feature audit before any model sees the table.
    *
    * Features unpivot through one stack (no per-feature scan);
    * entropies are the [[theilU]] p6-term DECIMAL sums. H(feature) =
    * 0 (constant feature) reports NULL gain ratio.
    *
    * Output: feature, n, h_target, info_gain, gain_ratio.
    */
  def infoGain(df: DataFrame, featureCols: Seq[String],
               targetCol: String): DataFrame = {
    require(featureCols.nonEmpty && featureCols.size <= 32,
      s"featureCols must be 1..32 names: ${featureCols.size}")
    def p6(c: Column) = graft.functions.Rounding.p6(c)
    val stacked = df
      .filter(col(targetCol).isNotNull)
      .select(col(targetCol).cast("string").as("__t"),
        explode(map(featureCols.flatMap(f =>
          Seq(lit(f), col(f).cast("string"))): _*)).as(Seq("__f", "__v")))
      .filter(col("__v").isNotNull)
    val cells = stacked.groupBy(col("__f"), col("__v"), col("__t"))
      .agg(count(lit(1)).cast("long").as("__c"))
      .localCheckpoint(true)
    val n = cells.groupBy(col("__f"))
      .agg(sum(col("__c")).cast("long").as("n"))
    def entropyOf(keyed: DataFrame, out: String): DataFrame = keyed
      .join(broadcast(n), Seq("__f"))
      .withColumn("__t6", p6(
        col("__c").cast("double") / col("n").cast("double") *
          log(col("n").cast("double") / col("__c").cast("double"))))
      .groupBy(col("__f"))
      .agg(p6(sum(col("__t6").cast("decimal(18,6)"))
        .cast("decimal(38,6)").cast("double")).as(out))
    val hT = entropyOf(cells.groupBy(col("__f"), col("__t"))
      .agg(sum(col("__c")).cast("long").as("__c")), "h_target")
    val hF = entropyOf(cells.groupBy(col("__f"), col("__v"))
      .agg(sum(col("__c")).cast("long").as("__c")), "h_feature")
    val hFT = entropyOf(cells.select(col("__f"), col("__c")), "h_joint")
    n.join(hT, Seq("__f")).join(hF, Seq("__f")).join(hFT, Seq("__f"))
      // IG = H(T) + H(F) − H(F,T)  (= H(T) − H(T|F))
      .withColumn("info_gain",
        p6(col("h_target") + col("h_feature") - col("h_joint")))
      .select(col("__f").as("feature"), col("n"), col("h_target"),
        col("info_gain"),
        when(col("h_feature") > 0.0,
          p6(col("info_gain") / col("h_feature"))).as("gain_ratio"))
  }
}
