package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Referential-integrity audit — the data-quality gate a star schema
  * runs before serving: per foreign-key relation, how many child rows
  * carry a null key and how many carry a key with no parent (orphans).
  * The reference loads its star schema with `NOT NULL` FK columns and
  * trusts ingest ordering; at warehouse scale that trust is a report.
  *
  * Each relation is ONE pass over the child: a left join against the
  * deduped parent keys with a presence marker, then a single aggregate
  * reading off totals, null keys, and orphans. Null keys are counted
  * separately from orphans (a null never equi-matches, so anti-join
  * semantics would silently lump "missing key" and "dangling key"
  * together — different failures with different fixes). A fact table
  * appearing in k relations is scanned k times, not 2k (the
  * count-then-anti-join formulation's cost); parent sides are
  * key-vs-key regardless of width and broadcast on their own.
  */
object Audit {

  /** One row per relation: `relation`, `n_child`, `n_null_keys`,
    * `n_orphans`.
    *
    * @param relations (name, child, childKey, parent, parentKey)
    */
  def fkOrphans(relations: Seq[(String, DataFrame, String, DataFrame, String)])
      : DataFrame = {
    require(relations.nonEmpty, "no relations to audit")
    relations.map { case (name, child, ck, parent, pk) =>
      child.select(col(ck).as("__k"))
        .join(parent.select(col(pk).as("__k")).distinct()
          .withColumn("__present", lit(1)), Seq("__k"), "left")
        .agg(
          count(lit(1)).as("n_child"),
          (count(lit(1)) - count(col("__k"))).as("n_null_keys"),
          coalesce(sum(when(col("__k").isNotNull && col("__present").isNull,
            1L).otherwise(0L)), lit(0L)).as("n_orphans"))
        .select(lit(name).as("relation"), col("n_child"),
          col("n_null_keys"), col("n_orphans"))
    }.reduce(_ unionByName _)
  }

  /** Event-time lateness audit — the report that picks a streaming
    * watermark delay: for every event, how far its event time lags the
    * maximum event time already seen in ARRIVAL order (the disorder a
    * watermark must absorb), bucketed into a histogram. A watermark of
    * X loses exactly the rows in buckets beyond X, so this table reads
    * directly as "delay vs completeness".
    *
    * The global running max is a prefix computation over arrival order
    * — the single-partition-window trap. Same escape as shuffleRank:
    * arrival ids bucket into `bucketWidth`-sized ranges; per-bucket
    * maxima are a tiny aggregate (collected — n/bucketWidth longs, the
    * bounded-driver-traffic contract), their exclusive prefix maxima
    * broadcast back, and a within-bucket running max (thousands of
    * independent window partitions) completes prior-max = max(prefix,
    * local). Same snapshot assumption as shuffleRank: the input must
    * be deterministic between the construction-time aggregate and the
    * returned plan's execution.
    *
    * @param boundsSeconds ascending lateness bucket edges; events with
    *        lateness in (edge_{i-1}, edge_i] land in bucket `le_<edge>s`,
    *        beyond the last edge in `gt_<last>s`, and lateness 0 (in
    *        order, or the first event) in `on_time`.
    */
  /** Cohen's kappa agreement between two binary raters, per group —
    * "do my two keep/drop gates actually agree beyond chance?", the
    * audit that catches a redundant (or contradictory) filter before
    * it silently biases a corpus.
    *
    * Exactness: the 2x2 confusion counts are integer sums; kappa
    * = (po - pe)/(1 - pe) is algebraically rearranged over a COMMON
    * denominator to num = n*(a+d) - [(a+b)(a+c)+(c+d)(b+d)] and
    * den = n^2 - [...], so the score is ONE IEEE division of two
    * exactly-representable integers — bit-identical on any engine,
    * no rounding ritual required. den = 0 (a rater is constant within
    * the group: chance agreement is 1) reports kappa = 0.
    *
    * Scale shape: one hash aggregate per group over four conditional
    * sums; nothing else. Raters are column expressions evaluated in
    * the scan projection.
    */
  def cohenKappa(df: DataFrame, groupCol: String,
                 aCol: String, bCol: String): DataFrame = {
    val ra = col(aCol).cast("long")
    val rb = col(bCol).cast("long")
    val agg = df.groupBy(col(groupCol))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(ra * rb).cast("long").as("__a"),
        sum(ra * (lit(1L) - rb)).cast("long").as("__b"),
        sum((lit(1L) - ra) * rb).cast("long").as("__c"),
        sum((lit(1L) - ra) * (lit(1L) - rb)).cast("long").as("__d"))
    val peNum = (col("__a") + col("__b")) * (col("__a") + col("__c")) +
      (col("__c") + col("__d")) * (col("__b") + col("__d"))
    val num = col("n") * (col("__a") + col("__d")) - peNum
    val den = col("n") * col("n") - peNum
    agg.select(col(groupCol), col("n"),
      col("__a").as("n_both_keep"), col("__d").as("n_both_drop"),
      when(den =!= 0L, num.cast("double") / den.cast("double"))
        .otherwise(lit(0.0)).as("kappa"))
  }

  def latenessAudit(events: DataFrame, tsCol: String, arrivalCol: String,
                    boundsSeconds: Seq[Long] = Seq(60L, 900L),
                    bucketWidth: Long = 65536L): DataFrame = {
    require(boundsSeconds.nonEmpty && boundsSeconds == boundsSeconds.sorted &&
      boundsSeconds.forall(_ > 0),
      s"bucket edges must be ascending positive seconds: $boundsSeconds")
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    import org.apache.spark.sql.expressions.Window
    val keyed = events
      .select(col(arrivalCol).as("__a"), unix_micros(col(tsCol)).as("__t"))
      // null arrival ids are unrankable in arrival order; without the
      // filter they form a null bucket that NPEs the collected prefix
      .filter(col("__t").isNotNull && col("__a").isNotNull)
      .withColumn("__b", floor(col("__a") / lit(bucketWidth)).cast("long"))
    val bmax = keyed.groupBy("__b").agg(max(col("__t")).as("__m")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    // exclusive prefix max per bucket; None for the first bucket (no
    // prior event) — null-based so ANSI subtraction never sees a
    // sentinel it could overflow on
    var acc = Option.empty[Long]
    val prefix = bmax.map { case (b, m) =>
      val before = acc; acc = Some(acc.fold(m)(math.max(_, m))); (b, before)
    }
    val spark = events.sparkSession
    import spark.implicits._
    val prefixDf = prefix.toSeq.toDF("__b", "__pm")
    val w = Window.partitionBy(col("__b")).orderBy(col("__a"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // greatest() skips nulls, so __prior is null only for the very
    // first event overall
    val late = keyed
      .join(broadcast(prefixDf), Seq("__b"))
      .withColumn("__prior", greatest(col("__pm"), max(col("__t")).over(w)))
      .withColumn("__late_us",
        when(col("__prior").isNull, lit(0L))
          .otherwise(greatest(lit(0L), col("__prior") - col("__t"))))
    val bucketCol = boundsSeconds.reverse
      .foldLeft(lit(s"gt_${boundsSeconds.last}s")) { case (acc2, edge) =>
        when(col("__late_us") <= edge * 1000000L, lit(s"le_${edge}s")).otherwise(acc2)
      }
    late
      .withColumn("bucket",
        when(col("__late_us") === 0L, lit("on_time")).otherwise(bucketCol))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"))
  }

  /** k-anonymity audit over a quasi-identifier column set: the
    * release-risk card for a dataset hand-off. Every row whose
    * quasi-identifier combination is shared by fewer than k rows is
    * re-identifiable at that k; the output is the equivalence-class
    * size histogram (class-size → how many classes, how many rows)
    * plus each size's violation flag, so both the headline number
    * ("x% of rows below k") and the worst offending class sizes read
    * off one table.
    *
    * Shape: one hash aggregate on the quasi-identifier tuple, then a
    * counts-of-counts aggregate (q173's keySkew shape) — the second
    * input is #equivalence-classes rows, already reduced. No windows,
    * no driver state; skewed hot combos are ordinary AQE work.
    */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "quasiCols must be non-empty")
    require(!quasiCols.contains("__sz"),
      "quasi-identifier column name __sz collides with bookkeeping")
    require(k >= 2L, s"k must be >= 2, got $k")
    kAnonymityHistogram(
      df.groupBy(quasiCols.map(col): _*)
        .agg(count(lit(1)).cast("long").as("__sz")),
      "__sz", k)
  }

  /** The counts-of-counts tail of [[kAnonymity]] over an ALREADY
    * aggregated (class, size) table — shared with the streaming
    * monitor, whose maintained state IS that table.
    */
  private[graft] def kAnonymityHistogram(classSizes: DataFrame,
                                         sizeCol: String, k: Long): DataFrame =
    classSizes
      .groupBy(col(sizeCol).cast("long").as("class_size"))
      .agg(count(lit(1)).cast("long").as("n_classes"))
      .select(col("class_size"), col("n_classes"),
        (col("class_size") * col("n_classes")).cast("long").as("n_rows"),
        (col("class_size") < k).as("violates_k"))

  /** l-diversity audit — k-anonymity's companion: a class can be
    * large yet still leak if every member shares one sensitive value
    * (the homogeneity attack). Per quasi-identifier equivalence
    * class, the number of DISTINCT sensitive values; output is the
    * (class_size-bucket × diversity) histogram with violation flags
    * below l, so "how many big-but-homogeneous classes exist" is one
    * row. Same two-hash-aggregate shape as [[kAnonymity]], with the
    * distinct-count running inside the first aggregate.
    *
    * NULL sensitive values count as ONE distinct value (the distinct
    * runs over a null-tagged struct), matching [[tCloseness]]'s view
    * of NULL as a real distribution point: an all-NULL class reads
    * diversity 1 (homogeneous — it IS one observable value to an
    * attacker), never the 0 that a bare count_distinct would emit.
    */
  def lDiversity(df: DataFrame, quasiCols: Seq[String],
                 sensitiveCol: String, l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "quasiCols must be non-empty")
    require(!quasiCols.contains(sensitiveCol),
      s"sensitiveCol '$sensitiveCol' must not appear in quasiCols")
    val clash = (quasiCols :+ sensitiveCol).toSet
      .intersect(Set("__sz", "__div",
        "class_size", "diversity", "n_classes", "violates_l"))
    require(clash.isEmpty,
      s"column names collide with bookkeeping/output names: $clash")
    require(l >= 2L, s"l must be >= 2, got $l")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).cast("long").as("__sz"),
        count_distinct(struct(col(sensitiveCol).isNull, col(sensitiveCol)))
          .cast("long").as("__div"))
      .groupBy(col("__sz").as("class_size"), col("__div").as("diversity"))
      .agg(count(lit(1)).cast("long").as("n_classes"))
      .select(col("class_size"), col("diversity"), col("n_classes"),
        (col("diversity") < l).as("violates_l"))
  }

  /** t-closeness audit — the third privacy gate: a class can be large
    * (k) and diverse (l) yet still leak if its sensitive-value
    * DISTRIBUTION diverges from the global one (the skewness attack).
    * Per quasi-identifier class: total-variation distance
    * 0.5·Σ|p_class − p_global| over the sensitive values (= the EMD
    * under uniform ground distance, the categorical t-closeness
    * measure), flagged above `maxTv`.
    *
    * Exactness is the q146 discipline: each per-(class, value)
    * contribution is ratios of exact integers through one fixed
    * double operation order, rounded to 6 places, summed as
    * DECIMAL(18,6). The (class × sensitive-value) grid crossJoins the
    * nature-bounded sensitive-value table (like q146's 65-bin grid),
    * so classes missing a value still pay its |0 − p_global| term.
    */
  def tCloseness(df: DataFrame, quasiCols: Seq[String],
                 sensitiveCol: String, maxTv: Double = 0.2): DataFrame = {
    require(quasiCols.nonEmpty, "quasiCols must be non-empty")
    require(!quasiCols.contains(sensitiveCol),
      s"sensitiveCol '$sensitiveCol' must not appear in quasiCols")
    val keyCols = quasiCols :+ sensitiveCol
    val clash = keyCols.toSet
      .intersect(Set("__c", "__n", "__cg", "__gtot", "__tv",
        "class_size", "tv", "violates_t") ++ keyCols.map("__r_" + _))
    require(clash.isEmpty,
      s"column names collide with bookkeeping/output names: $clash")
    require(maxTv > 0.0 && maxTv < 1.0, s"maxTv must be in (0,1): $maxTv")
    val cs = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).cast("long").as("__c"))
    val ct = cs.groupBy(quasiCols.map(col): _*)
      .agg(sum(col("__c")).cast("long").as("__n"))
    val gs = cs.groupBy(col(sensitiveCol))
      .agg(sum(col("__c")).cast("long").as("__cg"))
    val gt = gs.agg(sum(col("__cg")).cast("long").as("__gtot"))
    val grid = ct.crossJoin(broadcast(gs.crossJoin(gt)))
    // null-SAFE re-attach of the class counts: a NULL quasi value is a
    // real equivalence class and a NULL sensitive value a real
    // distribution point — '=' joins would orphan both (the class
    // would read as all-zero and flag spuriously)
    val csr = cs.select(
      keyCols.map(c => col(c).as("__r_" + c)) :+ col("__c"): _*)
    val joined = grid.join(csr,
      keyCols.map(c => col(c) <=> col("__r_" + c)).reduce(_ && _), "left")
    val contrib = lit(0.5) * abs(
      coalesce(col("__c"), lit(0L)).cast("double") / col("__n").cast("double") -
        col("__cg").cast("double") / col("__gtot").cast("double"))
    joined
      .withColumn("__tv", (floor(contrib * 1e6 + 0.5) / 1e6).cast("decimal(18,6)"))
      .groupBy(quasiCols.map(col): _*)
      .agg(max(col("__n")).as("class_size"),
        sum(col("__tv")).cast("double").as("tv"))
      .withColumn("violates_t", col("tv") > maxTv)
  }

  /** Approximate-functional-dependency strength audit: how close does
    * `detCols → depCol` hold? Per determinant tuple: row volume,
    * distinct dependent values, the majority dependent value (the FD's
    * candidate right-hand side), and the g3 measure — rows that would
    * have to change for the FD to hold exactly (`n_violations`), with
    * its complement as `strength_bp`. The schema-discovery companion
    * to the privacy trio: a strength_bp of 10000 certifies a derivable
    * column; anything less localizes WHERE the dependency breaks.
    *
    * The majority value is deterministic under count ties: the
    * smallest dependent value wins, via `min(struct(-count, dep))` —
    * one aggregate, no window, engine-replayable. NULLs in determinant
    * or dependent columns are dropped (an FD over NULLs is undefined).
    *
    * Scale shape: one (det, dep) hash aggregate over the data, then
    * one det-keyed aggregate over the already-reduced pair table —
    * the kAnonymity two-aggregate economics; output is one row per
    * determinant tuple.
    */
  def fdStrength(df: DataFrame, detCols: Seq[String],
                 depCol: String): DataFrame = {
    require(detCols.nonEmpty, "detCols must be non-empty")
    require(!detCols.contains(depCol),
      s"dependent column $depCol cannot also be a determinant")
    val reserved = Seq("__c", "__m", "n_rows", "n_dep_values",
      "majority_value", "n_majority", "n_violations", "strength_bp")
    require((detCols :+ depCol).forall(c => !reserved.contains(c)),
      s"column names collide with bookkeeping/output names $reserved")
    val pairs = df
      .filter((detCols :+ depCol).map(col(_).isNotNull).reduce(_ && _))
      .groupBy((detCols :+ depCol).map(col): _*)
      .agg(count(lit(1)).cast("long").as("__c"))
    pairs
      .groupBy(detCols.map(col): _*)
      .agg(sum(col("__c")).cast("long").as("n_rows"),
        count(lit(1)).cast("long").as("n_dep_values"),
        min(struct((-col("__c")).as("__negc"), col(depCol).as("__d")))
          .as("__m"))
      .select(detCols.map(col) ++ Seq(
        col("n_rows"), col("n_dep_values"),
        col("__m").getField("__d").as("majority_value"),
        (-col("__m").getField("__negc")).cast("long").as("n_majority"),
        (col("n_rows") + col("__m").getField("__negc")).cast("long")
          .as("n_violations"),
        call_function("div",
          (-col("__m").getField("__negc")) * 10000L, col("n_rows"))
          .as("strength_bp")): _*)
  }

  /** p-chart — the SPC (statistical process control) attribute chart
    * over a defect proportion: per period, the defect rate against
    * control limits p̄ ± 3·√(p̄(1−p̄)/n) around the GLOBAL center line,
    * flagging periods whose process has statistically shifted (the
    * Shewhart rule, variable-n form: wider limits on thin days).
    *
    * Exactness: the emitted columns are ALL integers — `rate_e6` is
    * exact floor micro-units (k DECIMAL-cast BEFORE the 10⁶ multiply,
    * so there is no BIGINT wrap at any k) and
    * `ucl_e6`/`lcl_e6` are the double limits pinned by the portable
    * rounding formula at 6 places; `out_of_control` compares those
    * integers, so the flag is engine-replayable (no raw double ever
    * crosses the output boundary). The LCL clamps at 0 before
    * rounding.
    *
    * Scale shape: one hash aggregate on the period key plus a one-row
    * global-totals attach — no window; output = #periods.
    * `defectCol` must be a 0/1 (or boolean) indicator.
    */
  def pChart(df: DataFrame, periodCol: String,
             defectCol: String): DataFrame = {
    val perDay = df
      .filter(col(periodCol).isNotNull && col(defectCol).isNotNull)
      .select(col(periodCol).as("period"),
        when(col(defectCol).cast("long") =!= 0L, 1L).otherwise(0L)
          .as("__d"))
      .groupBy(col("period"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("__d")).cast("long").as("k"))
    val tot = perDay.agg(sum(col("n")).cast("long").as("__tn"),
      sum(col("k")).cast("long").as("__tk"))
    val pbar = "CAST(__tk AS DOUBLE) / __tn"
    val sig = s"sqrt($pbar * (1.0 - $pbar) / n)"
    perDay.crossJoin(broadcast(tot))
      .select(col("period"), col("n"), col("k"),
        expr("CAST(CAST(k AS DECIMAL(19,0)) * 1000000 DIV n AS BIGINT)")
          .as("rate_e6"),
        expr(s"CAST(floor(($pbar + 3.0 * $sig) * 1e6 + 0.5) AS BIGINT)")
          .as("ucl_e6"),
        expr(s"CAST(floor(greatest(0.0, $pbar - 3.0 * $sig) * 1e6 + 0.5)" +
          " AS BIGINT)").as("lcl_e6"))
      .withColumn("out_of_control",
        col("rate_e6") > col("ucl_e6") || col("rate_e6") < col("lcl_e6"))
  }
}
