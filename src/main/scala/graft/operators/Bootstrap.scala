package graft.operators

import graft.functions.Rounding.p6
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Resampling inference without RNG state: Poisson bootstrap,
  * delete-one-group jackknife, and a hash-seeded randomization test.
  * A 100-TB pipeline cannot materialize B resampled copies of the
  * data, and engine/partitioning-dependent RNG breaks the
  * reproducibility contract every other operator here keeps — so all
  * three estimators derive their "randomness" from the md5 60-bit
  * content hash ([[Sampling.hashBucket]]'s derivation, salted with a
  * tag and the replicate index) and run in ONE scan:
  *
  *  - Poisson bootstrap (Chamandy et al., "Estimating Uncertainty for
  *    Massive Data Streams", Google 2012): replicate b gives each row
  *    weight w ~ Poisson(1), approximating the multinomial bootstrap
  *    without coordinating a fixed resample size across partitions.
  *    The replicate index is exploded BEFORE the aggregate, so
  *    partial aggregation reduces the B× fan-out to (group × B) sum
  *    rows per partition — the shuffle carries replicate sums, never
  *    the data.
  *  - Delete-one-group jackknife (Tukey; the delete-a-group variant
  *    is the standard SE device for ratio estimators in survey
  *    sampling): leave-one-block-out estimates come from the block
  *    totals alone, so the whole estimator is two group-bys.
  *  - Randomization test: replicate b relabels each row's arm by an
  *    unbiased hash coin (p = 1/2). This is the UNCONDITIONAL
  *    (random-group-size) randomization null, not the fixed-margin
  *    permutation — at pipeline row counts the two are
  *    indistinguishable, and the unconditional form needs no global
  *    coordination. The Monte-Carlo p-value uses the standard
  *    (1 + #extreme)/(1 + B) form.
  *
  * Determinism: every uniform/coin derives from fixed hex substrings
  * of md5("tag|j|key") digests — integer-exact in IEEE double (all
  * divisors are powers of two) and identical in any engine with md5;
  * the Poisson(1) inverse CDF is a ladder of shared literal
  * thresholds; every double-valued output passes through the portable
  * p6 rounding.
  *
  * Digest economy (the md5 fan IS the job at pipeline scale): one
  * 128-bit digest is never spent on a single draw. The Poisson fan
  * packs FIVE independent 24-bit uniforms per digest (hex chars 1-6,
  * 7-12, ..., 25-30; 2^-24 granularity is ~3,500x finer than the
  * ladder's smallest bucket P(X>7) = 8.3e-5), so 32 replicates cost
  * ceil(32/5) = 7 digests per row instead of 32. The randomization
  * coin needs ONE bit per replicate, so the 48-bit prefix of a single
  * digest carries 48 replicate coins — 32 replicates cost 1 digest
  * per row instead of 32. Both schemes stay pure functions of
  * (tag, replicate, key), so the streaming monitors' additive-state
  * contract is untouched.
  */
object Bootstrap {

  /** Poisson(1) draw by inverse CDF over the shared uniform: the
    * cumulative probabilities are literal constants (mirrored verbatim
    * in every oracle), the ladder caps at 7 (P(X > 7) < 1.1e-5).
    */
  private[graft] val poissonCdf1: Seq[Double] = Seq(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238463, 0.9963401531726563, 0.9994058151824183,
    0.999916758850712)

  // chained when built innermost-first: the SMALLEST threshold must
  // win, so fold from the largest down with when(u < c, k) wrapping
  // the rest
  private[graft] def poissonW(u: Column): Column = {
    val tail: Column = lit(7L)
    poissonCdf1.zipWithIndex.reverse.foldLeft(tail) {
      case (acc, (c, k)) => when(u < c, lit(k.toLong)).otherwise(acc)
    }
  }

  /** Per-(group, replicate) Poisson-weighted partial sums — the fan
    * shared verbatim by the batch estimator and the streaming monitor
    * (whose state is this table maintained additively). Two chained
    * explodes, both BEFORE the aggregate: stage 1 fans each row to its
    * ceil(reps/5) digests (ONE md5 per digest), stage 2 fans each
    * digest to its five 24-bit uniform slots, so partial aggregation
    * still collapses the reps× row fan-out to (group × reps) sum rows
    * per partition while the md5 count drops 5x. The slot list of the
    * LAST digest is trimmed to the replicate remainder so no dead
    * slots ride through the aggregate.
    *
    * Output: groupCol, b, n_rows, sx, w, __swx.
    */
  private[graft] def poissonReplicateSums(df: DataFrame, groupCol: String,
                                          keyCol: String, valCol: String,
                                          reps: Int,
                                          tag: String): DataFrame = {
    require(reps >= 8 && reps <= 128, s"reps must be in [8,128]: $reps")
    val x = col(valCol).cast("decimal(18,2)")
    val nDig = (reps + 4) / 5
    val fullSlots = typedLit((0L until 5L).toSeq)
    val lastSlots = typedLit((0L until (reps - 5L * (nDig - 1))).toSeq)
    val digests = df
      .select(col(groupCol), col(keyCol).as("__k"), x.as("__x"),
        explode(typedLit((0 until nDig).map(_.toLong))).as("__j"))
      .withColumn("__d", md5(concat_ws("|", lit(tag),
        col("__j").cast("string"), col("__k").cast("string"))))
    val exploded = digests
      .select(col(groupCol), col("__x"), col("__j"), col("__d"),
        explode(when(col("__j") === lit((nDig - 1).toLong), lastSlots)
          .otherwise(fullSlots)).as("__i"))
      .withColumn("b", col("__j") * lit(5L) + col("__i"))
      .withColumn("__w", poissonW(
        conv(expr("substring(__d, 1 + 6 * CAST(__i AS INT), 6)"), 16, 10)
          .cast("long").cast("double") / 16777216.0))
    exploded.groupBy(col(groupCol), col("b"))
      .agg(count(lit(1)).cast("long").as("n_rows"),
        sum(col("__x")).cast("decimal(38,2)").as("sx"),
        sum(col("__w")).cast("long").as("w"),
        sum(col("__w") * col("__x")).cast("decimal(38,2)").as("__swx"))
  }

  /** Poisson-bootstrap mean of `valCol` per `groupCol`: one scan
    * (fanned reps× pre-aggregation) computes each replicate's weighted
    * count and weighted sum; the per-replicate means then yield the
    * bootstrap SE and a nearest-rank 90% percentile interval.
    * Replicates whose Poisson weights sum to zero (possible only on
    * tiny groups) are dropped from the rank set.
    *
    * Output: group, n_rows, mean_obs, reps_used, boot_se, ci_lo, ci_hi.
    */
  def poissonBootstrapMean(df: DataFrame, groupCol: String, keyCol: String,
                           valCol: String, reps: Int = 32,
                           tag: String = "pb"): DataFrame =
    poissonBootstrapFromReplicates(
      poissonReplicateSums(df, groupCol, keyCol, valCol, reps, tag),
      groupCol)

  /** The bootstrap-card closing over a per-(group, replicate) sum
    * table (group, b, n_rows, sx, w, __swx) — shared verbatim by the
    * streaming bootstrap monitor, whose state IS this table
    * maintained additively across batches (the hash weights are a
    * pure function of the row key, so batch partials add).
    *
    * The observed totals (n_rows, mean_obs) aggregate from the
    * UNFILTERED replicate table and the SE/CI stats left-join back,
    * so a degenerate group whose every replicate drew zero total
    * Poisson weight (tiny groups at small reps only) still reports
    * its observed mean with reps_used = 0 and NULL boot_se/ci — it
    * never silently vanishes from the card.
    */
  def poissonBootstrapFromReplicates(repRaw: DataFrame,
                                     groupCol: String): DataFrame = {
    val tot = repRaw.groupBy(col(groupCol))
      .agg(max(col("n_rows")).as("n_rows"),
        p6(max(col("sx")).cast("double") /
          max(col("n_rows")).cast("double")).as("mean_obs"))
    val rep = repRaw
      .where(col("w") > 0L)
      .withColumn("m6",
        p6(col("__swx").cast("double") / col("w").cast("double")))
    val wRank = Window.partitionBy(col(groupCol))
      .orderBy(col("m6"), col("b"))
    val wAll = Window.partitionBy(col(groupCol))
    val ranked = rep
      .withColumn("r", row_number().over(wRank))
      .withColumn("used", count(lit(1)).over(wAll))
      .withColumn("lo_r", greatest(ceil(col("used") * 0.05), lit(1L)))
      .withColumn("hi_r", ceil(col("used") * 0.95))
    val stats = ranked.groupBy(col(groupCol))
      .agg(max(col("used")).as("used"),
        sum(col("m6").cast("decimal(18,6)"))
          .cast("decimal(38,6)").as("sm"),
        sum((col("m6").cast("decimal(18,6)") *
          col("m6").cast("decimal(18,6)")).cast("decimal(38,12)"))
          .cast("decimal(38,12)").as("sq"),
        max(when(col("r") === col("lo_r"), col("m6"))).as("ci_lo"),
        max(when(col("r") === col("hi_r"), col("m6"))).as("ci_hi"))
    tot.join(stats, Seq(groupCol), "left")
      .select(col(groupCol), col("n_rows"), col("mean_obs"),
        coalesce(col("used"), lit(0L)).as("reps_used"),
        // when() guard, not NULL propagation: Spark's greatest()
        // SKIPS nulls, so greatest(0.0, null/null-arith) would turn a
        // degenerate group's se into 0.0 instead of NULL
        when(col("used").isNotNull,
          p6(sqrt(greatest(lit(0.0),
            (col("sq").cast("double") -
              col("sm").cast("double") * col("sm").cast("double") /
                col("used").cast("double")) /
              (col("used").cast("double") - 1.0))))).as("boot_se"),
        col("ci_lo"), col("ci_hi"))
  }

  /** Delete-one-group jackknife for the ratio estimator
    * theta = sum(num)/sum(den) per `groupCol`, with leave-out blocks
    * `blockCol` (clerks, weeks, ship modes — any natural clustering).
    * Block totals are exact DECIMAL sums; each leave-one-out estimate
    * theta_i = (S_num − s_i)/(S_den − d_i) is a p6 double; the
    * jackknife SE is sqrt((g−1)/g · Σ(theta_i − mean)²) and the
    * bias-corrected estimate g·theta − (g−1)·mean — both from exact
    * decimal sums of the p6 leave-out values. Blocks whose removal
    * empties the denominator are dropped (degenerate leave-out).
    *
    * Output: group, g_blocks, theta, theta_jack, jack_se.
    */
  def jackknifeRatio(df: DataFrame, groupCol: String, blockCol: String,
                     numCol: String, denCol: String): DataFrame = {
    val blocks = df.groupBy(col(groupCol), col(blockCol))
      .agg(sum(col(numCol).cast("decimal(18,4)"))
        .cast("decimal(38,4)").as("sn"),
        sum(col(denCol).cast("decimal(18,4)"))
          .cast("decimal(38,4)").as("sd"))
    val wAll = Window.partitionBy(col(groupCol))
    val loo = blocks
      .withColumn("tn", sum(col("sn")).over(wAll))
      .withColumn("td", sum(col("sd")).over(wAll))
      .withColumn("g", count(lit(1)).over(wAll))
      .where(col("td") - col("sd") > 0)
      .withColumn("th_i", p6((col("tn") - col("sn")).cast("double") /
        (col("td") - col("sd")).cast("double")))
    loo.groupBy(col(groupCol))
      .agg(count(lit(1)).as("g_blocks"),
        p6(max(col("tn")).cast("double") / max(col("td")).cast("double"))
          .as("theta"),
        sum(col("th_i").cast("decimal(18,6)"))
          .cast("decimal(38,6)").as("sm"),
        sum((col("th_i").cast("decimal(18,6)") *
          col("th_i").cast("decimal(18,6)")).cast("decimal(38,12)"))
          .cast("decimal(38,12)").as("sq"))
      .select(col(groupCol), col("g_blocks"), col("theta"),
        p6(col("g_blocks").cast("double") * col("theta") -
          (col("g_blocks").cast("double") - 1.0) *
            (col("sm").cast("double") / col("g_blocks").cast("double")))
          .as("theta_jack"),
        p6(sqrt(greatest(lit(0.0),
          (col("g_blocks").cast("double") - 1.0) /
            col("g_blocks").cast("double") *
            (col("sq").cast("double") -
              col("sm").cast("double") * col("sm").cast("double") /
                col("g_blocks").cast("double"))))).as("jack_se"))
  }

  /** Hash-seeded randomization test of the two-arm mean difference of
    * `valCol` per `groupCol`: replicate b relabels each row by an
    * unbiased md5 coin and recomputes the difference of means; the
    * Monte-Carlo p-value is (1 + #{|d_b| >= |d_obs|})/(1 + B_used),
    * where replicates with an empty arm (tiny groups only) are
    * dropped. A replicate coin is ONE bit, so the 48-bit digest prefix
    * carries 48 replicate coins: replicate b's label is bit (b mod 48)
    * of md5("tag|(b div 48)|key") — for the default 32 replicates that
    * is ONE md5 per row, and bit extraction (shiftright + mask on a
    * nonnegative 48-bit integer) is exact and identical in every
    * engine.
    *
    * Shape (round 15): the per-replicate sums PIVOT into 2·reps
    * conditional aggregate columns of ONE per-group hash aggregate —
    * the earlier form exploded every row reps× through the aggregate,
    * so the heavy stage hashed/probed reps× the input rows and summed
    * wide decimals per exploded row. Now each row updates 2·reps long
    * buffers in place inside whole-stage codegen, and the replicate
    * axis is re-expanded AFTER aggregation by exploding an array of
    * (b, nb, sb) structs over the (few) group rows. The value sums
    * accumulate as exact ×100-scaled longs (the DECIMAL(18,2) cast
    * made explicit — a >18-precision decimal sum leaves Spark's
    * compact-long fast path; the q346 lesson), GUARDED not assumed:
    * the closing select raises via assert_true folded into the
    * consumed `n` when n·max|cents| could push any sum past 2^53 —
    * under that bound the long→double→/100.0 chain is correctly
    * rounded and bit-identical to the old decimal→double cast (~10^12
    * rows/group at 2-decimal magnitudes ~10^2; shard the analysis or
    * pre-aggregate past that — never a silent wrong answer).
    *
    * Output: group, n, n1, d_obs, reps_used, n_extreme, p_value.
    */
  def randomizationTest(df: DataFrame, groupCol: String, keyCol: String,
                        armCol: String, valCol: String, reps: Int = 32,
                        tag: String = "rt"): DataFrame = {
    require(reps >= 8 && reps <= 128, s"reps must be in [8,128]: $reps")
    // exact cents: DECIMAL(18,2) holds value·100 as an integer; the
    // long cast truncates the exact decimal, so it IS that integer
    val cents = (col(valCol).cast("decimal(18,2)") * 100).cast("long")
    val nDig = (reps + 47) / 48
    val hCols = (0 until nDig).map { j =>
      conv(substring(md5(concat_ws("|", lit(tag), lit(j.toString),
        col(keyCol).cast("string"))), 1, 12), 16, 10)
        .cast("long").as(s"__h$j")
    }
    val base = df.select(Seq(col(groupCol),
      col(armCol).cast("long").as("__arm"), cents.as("__c")) ++ hCols: _*)
    // replicate b's coin: bit (b mod 48) of digest (b div 48) — the
    // same bit the exploded form read via shiftright(__h, __i) & 1
    def coin(b: Int): Column =
      shiftright(col(s"__h${b / 48}"), b % 48).bitwiseAND(lit(1L))
    val aggs =
      Seq(count(lit(1)).cast("long").as("n"),
        sum(col("__arm")).cast("long").as("n1"),
        sum(col("__c")).as("__sx"),
        sum(col("__arm") * col("__c")).as("__sx1"),
        max(abs(col("__c"))).as("__ma")) ++
      (0 until reps).flatMap { b =>
        Seq(sum(coin(b)).cast("long").as(s"__nb$b"),
          sum(coin(b) * col("__c")).as(s"__sb$b"))
      }
    val piv = base.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
    // overflow guard, folded into the consumed `n` so Catalyst cannot
    // prune it: n·max|c| bounds every sum (and each partial) of cents,
    // and below 2^53 the long→double conversion is exact, making
    // double(sum)/100.0 the one correctly-rounded step the decimal
    // path also took. 8.0e15 keeps >11% margin under 2^53.
    val ok = col("__ma").isNull ||
      col("n").cast("double") * col("__ma").cast("double") <= lit(8.0e15)
    val guardedN = when(assert_true(ok,
      lit("randomizationTest: group admits a cents sum past 2^53 " +
        "(need n·max|value·100| <= 8e15) — shard the analysis or " +
        "pre-aggregate the group")).isNull, col("n")).as("n")
    val repArr = array((0 until reps).map(b =>
      struct(lit(b.toLong).as("b"), col(s"__nb$b").as("nb"),
        col(s"__sb$b").as("sb"))): _*)
    // cents→double/100.0 reproduces the decimal(38,2)→double cast
    // bit-for-bit under the guard (long exact below 2^53, division by
    // 100.0 correctly rounded), so the closing double chain and p6 are
    // unchanged
    def diff(n1c: Column, s1c: Column, nc: Column, sc: Column): Column =
      p6(s1c.cast("double") / 100.0 / n1c.cast("double") -
        (sc - s1c).cast("double") / 100.0 / (nc - n1c).cast("double"))
    val rep = piv
      .select(col(groupCol), guardedN, col("n1"), col("__sx"),
        col("__sx1"), explode(repArr).as("__r"))
      .select(col(groupCol), col("n"), col("n1"), col("__sx"),
        col("__sx1"), col("__r").getField("b").as("b"),
        col("__r").getField("nb").as("nb"),
        col("__r").getField("sb").as("sb"))
      .withColumn("d_obs",
        diff(col("n1"), col("__sx1"), col("n"), col("__sx")))
      .where(col("nb") > 0L && col("nb") < col("n"))
      .withColumn("d_b", diff(col("nb"), col("sb"), col("n"), col("__sx")))
    rep.groupBy(col(groupCol))
      .agg(max(col("n")).as("n"), max(col("n1")).as("n1"),
        max(col("d_obs")).as("d_obs"),
        count(lit(1)).as("reps_used"),
        sum(when(abs(col("d_b")) >= abs(col("d_obs")), 1L).otherwise(0L))
          .as("n_extreme"))
      .withColumn("p_value",
        p6((col("n_extreme").cast("double") + 1.0) /
          (col("reps_used").cast("double") + 1.0)))
  }
}
