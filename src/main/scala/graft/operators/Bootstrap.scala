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
  * Determinism: u(tag, b, key) = md5 48-bit prefix / 2^48 is exact in
  * IEEE double and identical in any engine with md5; the Poisson(1)
  * inverse CDF is a ladder of shared literal thresholds; every
  * double-valued output passes through the portable p6 rounding.
  */
object Bootstrap {

  /** Uniform in [0, 1): 48-bit md5 prefix of "tag|b|key" over 2^48.
    * 12 hex chars = 48 bits fit a double exactly; the division is by a
    * power of two, so u is the SAME double in every engine.
    */
  private[graft] def u48(tag: String, b: Int, key: Column): Column =
    u48(tag, lit(b.toString), key)

  private[graft] def u48(tag: String, b: Column, key: Column): Column =
    conv(substring(md5(concat_ws("|", lit(tag), b.cast("string"),
      key.cast("string"))), 1, 12), 16, 10).cast("long")
      .cast("double") / 281474976710656.0

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
                           tag: String = "pb"): DataFrame = {
    require(reps >= 8 && reps <= 128, s"reps must be in [8,128]: $reps")
    val x = col(valCol).cast("decimal(18,2)")
    // explode the replicate index BEFORE the aggregate: partial
    // aggregation reduces the reps× row fan-out to (group × reps) sum
    // rows per partition, and the per-row expression stays one small
    // codegen unit (a reps-wide column list of inlined md5 ladders
    // overflows the whole-stage-codegen method budget instead)
    val exploded = df
      .select(col(groupCol), col(keyCol).as("__k"), x.as("__x"),
        explode(typedLit((0 until reps).map(_.toLong))).as("b"))
      .withColumn("__w", poissonW(u48(tag, col("b"), col("__k"))))
    val repRaw = exploded.groupBy(col(groupCol), col("b"))
      .agg(count(lit(1)).cast("long").as("n_rows"),
        sum(col("__x")).cast("decimal(38,2)").as("sx"),
        sum(col("__w")).cast("long").as("w"),
        sum(col("__w") * col("__x")).cast("decimal(38,2)").as("__swx"))
    poissonBootstrapFromReplicates(repRaw, groupCol)
  }

  /** The bootstrap-card closing over a per-(group, replicate) sum
    * table (group, b, n_rows, sx, w, __swx) — shared verbatim by the
    * streaming bootstrap monitor, whose state IS this table
    * maintained additively across batches (the hash weights are a
    * pure function of the row key, so batch partials add).
    */
  def poissonBootstrapFromReplicates(repRaw: DataFrame,
                                     groupCol: String): DataFrame = {
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
    ranked.groupBy(col(groupCol))
      .agg(max(col("n_rows")).as("n_rows"),
        p6(max(col("sx")).cast("double") /
          max(col("n_rows")).cast("double")).as("mean_obs"),
        max(col("used")).as("reps_used"),
        sum(col("m6").cast("decimal(18,6)"))
          .cast("decimal(38,6)").as("sm"),
        sum((col("m6").cast("decimal(18,6)") *
          col("m6").cast("decimal(18,6)")).cast("decimal(38,12)"))
          .cast("decimal(38,12)").as("sq"),
        max(when(col("r") === col("lo_r"), col("m6"))).as("ci_lo"),
        max(when(col("r") === col("hi_r"), col("m6"))).as("ci_hi"))
      .select(col(groupCol), col("n_rows"), col("mean_obs"),
        col("reps_used"),
        p6(sqrt(greatest(lit(0.0),
          (col("sq").cast("double") -
            col("sm").cast("double") * col("sm").cast("double") /
              col("reps_used").cast("double")) /
            (col("reps_used").cast("double") - 1.0)))).as("boot_se"),
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
    * dropped. One fanned scan, then per-group arithmetic on
    * (group × reps) rows of sums.
    *
    * Output: group, n, n1, d_obs, reps_used, n_extreme, p_value.
    */
  def randomizationTest(df: DataFrame, groupCol: String, keyCol: String,
                        armCol: String, valCol: String, reps: Int = 32,
                        tag: String = "rt"): DataFrame = {
    require(reps >= 8 && reps <= 128, s"reps must be in [8,128]: $reps")
    val x = col(valCol).cast("decimal(18,2)")
    def diff(n1c: Column, s1c: Column, nc: Column, sc: Column): Column =
      p6(s1c.cast("double") / n1c.cast("double") -
        (sc - s1c).cast("double") / (nc - n1c).cast("double"))
    // same explode-then-aggregate shape as poissonBootstrapMean: the
    // observed-arm sums ride along in every (group, b) cell (they are
    // identical across b), so one scan still covers everything
    val exploded = df
      .select(col(groupCol), col(keyCol).as("__k"),
        col(armCol).cast("long").as("__arm"), x.as("__x"),
        explode(typedLit((0 until reps).map(_.toLong))).as("b"))
      .withColumn("__lab",
        (u48(tag, col("b"), col("__k")) < 0.5).cast("long"))
    val rep = exploded.groupBy(col(groupCol), col("b"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("__arm")).cast("long").as("n1"),
        sum(col("__x")).cast("decimal(38,2)").as("sx"),
        sum(col("__arm") * col("__x")).cast("decimal(38,2)").as("sx1"),
        sum(col("__lab")).cast("long").as("nb"),
        sum(col("__lab") * col("__x")).cast("decimal(38,2)").as("sb"))
      .withColumn("d_obs", diff(col("n1"), col("sx1"), col("n"), col("sx")))
      .where(col("nb") > 0L && col("nb") < col("n"))
      .withColumn("d_b", diff(col("nb"), col("sb"), col("n"), col("sx")))
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
