package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, content-stable sampling and dataset splitting — the
  * reproducibility primitives of a training-data pipeline. Instead of
  * RNG-based sampling (engine- and partitioning-dependent), rows are
  * assigned to buckets by a hash of a stable key: the same row lands in
  * the same bucket in every engine, every run, at every scale, and
  * adding data never moves existing rows across splits (the property
  * that keeps a held-out set held out).
  *
  * The hash is the md5 60-bit prefix (same derivation as the MinHash
  * signatures) — portable to any engine with md5 and hex casts.
  */
object Sampling {

  /** Stable bucket in [0, buckets) from a key column. */
  def hashBucket(key: Column, buckets: Int): Column =
    pmod(conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long"),
      lit(buckets.toLong))

  // the salted content-stable ordering hash shared by capPerGroup /
  // tokenBudgetSample / shuffleRank / streaming.StreamingBudget —
  // single-sourced because every DuckDB oracle mirrors this exact
  // derivation byte-for-byte (md5('<tag>' || '|' || CAST(key AS VARCHAR)))
  private[graft] def saltedOrderKey(tag: String, key: Column): Column =
    md5(concat_ws("|", lit(tag), key.cast("string")))

  /** Keep a deterministic `pct`% of rows by key hash. */
  def deterministicSample(df: DataFrame, keyCol: String, pct: Int): DataFrame =
    df.filter(hashBucket(col(keyCol), 100) < pct)

  /** Assign train/val/test splits by key hash: [0, trainPct) -> train,
    * [trainPct, trainPct+valPct) -> val, rest -> test.
    */
  def datasetSplit(df: DataFrame, keyCol: String,
                   trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val b = hashBucket(col(keyCol), 100)
    df.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Deterministic epoch-wise shuffle plan: each training epoch gets a
    * FRESH content-stable shard assignment and intra-shard order key
    * per row, from the epoch-salted ordering hash (`saltedOrderKey`
    * with tag `epoch<e>` — the derivation every oracle mirrors).
    * Multi-epoch training wants a different data order per epoch
    * without RNG state: this is that plan, one scan with the epochs
    * exploded per row, fully scan-resident (no shuffle — the CONSUMER
    * shuffles by (epoch, shard) when materializing).
    */
  def epochShards(df: DataFrame, keyCol: String, epochs: Int,
                  shards: Int): DataFrame = {
    require(epochs >= 1, s"epochs must be >= 1: $epochs")
    require(shards >= 1, s"shards must be >= 1: $shards")
    val e = explode(array((0 until epochs).map(i => lit(i.toLong)): _*))
    val withEpoch = df.select(col(keyCol)).withColumn("epoch", e)
      .withColumn("__ok",
        saltedOrderKey_epoch(col("epoch"), col(keyCol)))
    withEpoch.select(col(keyCol), col("epoch"),
      pmod(conv(substring(col("__ok"), 1, 15), 16, 10).cast("long"),
        lit(shards.toLong)).as("shard"),
      col("__ok").as("order_key"))
  }

  // epoch-parameterized variant of `saltedOrderKey` (the tag is a
  // column, not a literal): md5('epoch<e>' || '|' || key)
  private def saltedOrderKey_epoch(epoch: Column, key: Column): Column =
    md5(concat_ws("|", concat(lit("epoch"), epoch.cast("string")),
      key.cast("string")))

  /** Deterministic per-group cap — keep at most `cap` rows of each
    * `groupCol` value, selected by the content-stable key hash rather
    * than arrival order (so the kept subset is a reproducible
    * pseudo-random sample of the group, not whatever the scan surfaced
    * first). This is the per-domain cap of a web-crawl pipeline: no
    * single host may contribute more than N documents.
    *
    * The rank filter compiles to a rank-limited window — Spark inserts
    * a `WindowGroupLimit` before the shuffle (same physical shape as
    * the verified q09 top-k), so each map task forwards at most `cap`
    * rows per group it sees instead of the whole group: at 100 TB the
    * shuffle carries O(groups x cap), not O(rows).
    */
  def capPerGroup(df: DataFrame, keyCol: String, groupCol: String,
                  cap: Int): DataFrame = {
    require(cap > 0, s"cap must be positive: $cap")
    val ord = saltedOrderKey("cap", col(keyCol))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(ord, col(keyCol))
    df.withColumn("__cap_rn", row_number().over(w))
      .filter(col("__cap_rn") <= cap)
      .drop("__cap_rn")
  }

  /** Token-budget subsampling — the mixture-weights primitive stated in
    * the unit that actually matters for pretraining: within each
    * `groupCol` (domain/source), take rows in content-stable hash order
    * until the group's TOKEN budget is exhausted (a row is kept when
    * the tokens accumulated before it are still under budget, so the
    * boundary row that crosses the line is included and every group
    * reaches its budget). Row caps (`capPerGroup`) bound document
    * counts; this bounds what the trainer actually consumes.
    *
    * The running sum is TWO-LEVEL BUCKETED, not one window per group:
    * a single `partitionBy(group)` window puts every row of a group
    * into one window partition, and domains are the most size-skewed
    * grouping in a crawl corpus — one giant domain would be an
    * unsplittable straggler. Instead the hash order's leading hex
    * chars define 256 ordered sub-buckets per group (the `shuffleRank`
    * prefix trick: hex-prefix order is consistent with full-hash
    * order); per-(group, bucket) token sums are a tiny skew-diluted
    * aggregate, their within-group prefix sums run over <= 256-row
    * window partitions, and the final within-bucket running sum is
    * bounded by a bucket's share of the group. Every stage is bounded
    * by content/256, no stage holds a whole group. Semantics are
    * IDENTICAL to the naive single window (same total order), which
    * `PackingSpec` pins by equivalence.
    */
  def tokenBudgetSample(df: DataFrame, keyCol: String, groupCol: String,
                        tokensCol: Column, budget: Long): DataFrame = {
    require(budget > 0, s"token budget must be positive: $budget")
    import org.apache.spark.sql.expressions.Window
    val keyed = df
      .withColumn("__tok", tokensCol.cast("long"))
      .withColumn("__sk", saltedOrderKey("budget", col(keyCol)))
      .withColumn("__bkt",
        conv(substring(col("__sk"), 1, 2), 16, 10).cast("int"))
    val wBkts = Window.partitionBy(col(groupCol)).orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = keyed.groupBy(col(groupCol), col("__bkt"))
      .agg(sum(col("__tok")).as("__bsum"))
      .withColumn("__boff",
        coalesce(sum(col("__bsum")).over(wBkts), lit(0L)))
      // groups whose every bucket starts at or past the budget cannot
      // contribute rows — prune them before the fact-side join
      .filter(col("__boff") < budget)
      .select(col(groupCol), col("__bkt"), col("__boff"))
    val wLocal = Window.partitionBy(col(groupCol), col("__bkt"))
      .orderBy(col("__sk"), col(keyCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    // null-SAFE group equality: a null group is a regular group to the
    // window-semantics reference (and to capPerGroup), so the offsets
    // join must not drop its rows the way plain equality would
    val o = offsets
      .withColumnRenamed(groupCol, "__ogrp")
      .withColumnRenamed("__bkt", "__obkt")
    keyed
      .join(o, col(groupCol) <=> col("__ogrp") && col("__bkt") === col("__obkt"))
      .withColumn("__before",
        col("__boff") + coalesce(sum(col("__tok")).over(wLocal), lit(0L)))
      .filter(col("__before") < budget)
      .select(df.columns.map(col).toSeq: _*)
  }

  /** Deterministic global shuffle with a materialized contiguous rank —
    * the training-order primitive: every row gets `shuffle_rank` in
    * [0, n), the position it holds when the corpus is ordered by a
    * content-stable hash of its key. Reordering is how epochs are
    * decorrelated from crawl order; materializing the rank (rather
    * than just sorting) lets a writer slice the corpus into exact
    * training shards (`rank / shardSize`) without a second pass.
    *
    * Computed WITHOUT a single-partition window: the hash's leading
    * `hexPrefix` hex chars define 16^hexPrefix ordered buckets, so
    * global hash order = (bucket, remaining hash) order. Per-bucket
    * counts are a tiny aggregate (one row per bucket — the same
    * "driver holds the small aggregate" economics as bin-packing);
    * their running offsets broadcast-join back, and a per-bucket
    * row_number (shuffled by bucket, thousands of independent groups)
    * completes rank = offset + local - 1. Every stage is distributed;
    * at 100 TB the only driver traffic is 16^hexPrefix longs.
    *
    * Size `hexPrefix` so one bucket's rows sort comfortably in one
    * task: each bucket holds ~n/16^hexPrefix rows. At the 100-TB
    * design point (~2×10^11 docs) hexPrefix=6 gives 16.7M buckets of
    * ~12k rows (a few MB per sort task) and 16.7M collected longs
    * (~134 MB on the driver — the ceiling of the approach); hexPrefix=4
    * caps at 65,536 buckets of ~3M rows (~1.5 GB/task — workable but
    * tight). The default 3 suits test/SF scale.
    *
    * SNAPSHOT ASSUMPTION: the per-bucket counts run as a driver-side
    * job when shuffleRank is CALLED; the returned frame re-reads the
    * input when it executes. The input must therefore be deterministic
    * between the two evaluations (a parquet path, a checkpoint — not a
    * nondeterministic sample or a changing view), or the broadcast
    * offsets go stale and ranks come out non-contiguous. A declarative
    * prefix-sum would avoid the second evaluation only by putting the
    * bucket offsets through a single-partition window — the exact
    * shape this operator exists to avoid (and that QueryPlanSpec bans).
    */
  def shuffleRank(df: DataFrame, keyCol: String, hexPrefix: Int = 3): DataFrame = {
    require(hexPrefix >= 1 && hexPrefix <= 6,
      s"hexPrefix must be in [1,6]: $hexPrefix (16^hexPrefix buckets; " +
        "6 = 16.7M buckets, sized for ~2e11-row corpora)")
    val sk = saltedOrderKey("shuffle", col(keyCol))
    val keyed = df.withColumn("__sk", sk)
      .withColumn("__bkt",
        conv(substring(col("__sk"), 1, hexPrefix), 16, 10).cast("long"))
    val counts = keyed.groupBy("__bkt").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val offsets = counts.toSeq.map { case (b, n) =>
      val off = acc; acc += n; (b, off)
    }
    val spark = df.sparkSession
    import spark.implicits._
    val offsetsDf = offsets.toDF("__bkt", "__offset")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__bkt")).orderBy(col("__sk"), col(keyCol))
    keyed
      .join(broadcast(offsetsDf), Seq("__bkt"))
      .withColumn("shuffle_rank",
        col("__offset") + row_number().over(w).cast("long") - 1L)
      .drop("__bkt", "__sk", "__offset")
  }

  /** Stratified deterministic sampling — the domain-mixing primitive:
    * keep `pcts(stratum)`% of each stratum's rows (`defaultPct` for
    * strata not listed), chosen by the same content-stable key hash as
    * `deterministicSample`. This is how a corpus is rebalanced toward
    * target source proportions (upsample wiki, downsample crawl)
    * reproducibly: no RNG, no shuffle, no join — the strata weights
    * compile into one scan-resident CASE chain, so at 100 TB this is a
    * pushed-down filter like any other.
    */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
                       pcts: Map[String, Int], defaultPct: Int): DataFrame = {
    require((pcts.values ++ Seq(defaultPct)).forall(p => p >= 0 && p <= 100),
      s"percentages must be in [0,100]: $pcts default=$defaultPct")
    // deterministic fold order so plans (and their canonicalized forms,
    // for exchange reuse) are stable across invocations
    val pctCol = pcts.toSeq.sortBy(_._1).foldLeft(lit(defaultPct)) {
      case (acc, (stratum, p)) => when(col(strataCol) === stratum, lit(p)).otherwise(acc)
    }
    df.filter(hashBucket(col(keyCol), 100) < pctCol)
  }

  /** The mixture-rebalancing plan: given target source proportions
    * (relative weights, normalized internally), report per source its
    * current token share and the keep fraction a DOWNSAMPLE-ONLY
    * rebalance needs to hit the targets — the planning step before a
    * `stratifiedSample`/`deterministicSample` pass re-mixes a corpus
    * toward a training recipe (upsample-free, so no document is ever
    * duplicated; the binding source keeps 100% and everything else
    * scales to match). Sources missing from `targets` get keep 0.
    *
    * Everything is declarative over the per-source aggregate (one row
    * per source): the corpus is touched once for token sums; the
    * total and the binding-constraint scale are one-row broadcast
    * aggregates, the same shape as tf-idf's corpus size — no driver
    * action, no window.
    *
    * Output: (strataCol, n_tokens, share, target_share, keep_frac),
    * keep_frac in [0,1], achieved mix = target wherever keep > 0.
    */
  /** Temperature-scaled mixture weights (the UniMax/multilingual-T5
    * recipe): sampling probability p_s ∝ n_s^(1/τ), flattening the
    * source distribution as τ grows (τ=1 proportional, τ→∞ uniform).
    * Alongside it the expected duplication factor a budget of
    * `totalTokens` implies per source, `epochs_s = p_s · total / n_s` —
    * the number the curator checks against an over-duplication cap.
    *
    * Same scale shape as `mixturePlan`: one corpus pass for per-source
    * token sums, then everything is declarative over the one-row-per-
    * source aggregate with a broadcast one-row total — no window, no
    * driver action.
    *
    * Cross-engine portability: the hash-verified query surface uses
    * τ = 2, where n^(1/τ) is `sqrt` — correctly rounded by IEEE 754 on
    * both engines, unlike the libm `pow` chains a general τ needs
    * (PERF "rational forms" discipline). The operator accepts any
    * τ >= 1; non-sqrt temperatures are spec-tested, not hash-gated.
    *
    * Output: (strataCol, n_tokens, p, epochs), p summing to 1.
    */
  def temperatureMixture(df: DataFrame, strataCol: String,
                         tokensCol: Column, temperature: Double): DataFrame = {
    require(temperature >= 1.0, s"temperature must be >= 1, got $temperature")
    val bySrc = df.groupBy(col(strataCol))
      .agg(sum(tokensCol.cast("long")).cast("long").as("n_tokens"))
      .withColumn("__w",
        if (temperature == 2.0) sqrt(col("n_tokens").cast("double"))
        else pow(col("n_tokens").cast("double"), lit(1.0 / temperature)))
    val tot = bySrc.agg(sum(col("__w")).as("__wtot"),
      sum(col("n_tokens")).cast("double").as("__ntot"))
    bySrc.join(broadcast(tot))
      .withColumn("p", col("__w") / col("__wtot"))
      .withColumn("epochs",
        when(col("n_tokens") > 0, col("p") * col("__ntot") / col("n_tokens"))
          .otherwise(lit(0.0)))
      .select(col(strataCol), col("n_tokens"), col("p"), col("epochs"))
  }

  def mixturePlan(df: DataFrame, strataCol: String, tokensCol: Column,
                  targets: Map[String, Double]): DataFrame = {
    require(targets.nonEmpty, "targets must not be empty")
    require(targets.values.forall(_ > 0),
      s"target weights must be positive: $targets")
    val wSum = targets.values.sum
    val targetCol = targets.toSeq.sortBy(_._1).foldLeft(lit(0.0)) {
      case (acc, (s, w)) => when(col(strataCol) === s, lit(w / wSum)).otherwise(acc)
    }
    val bySrc = df.groupBy(col(strataCol))
      .agg(sum(tokensCol.cast("long")).as("n_tokens"))
      .withColumn("target_share", targetCol)
    val tot = bySrc.agg(sum(col("n_tokens")).as("__tot"))
    val shared = bySrc.join(broadcast(tot))
      .withColumn("share", col("n_tokens").cast("double") / col("__tot"))
    val scale = shared.filter(col("target_share") > 0)
      .agg(min(col("share") / col("target_share")).as("__scale"))
    shared.join(broadcast(scale))
      .withColumn("keep_frac",
        when(col("target_share") > 0,
          least(lit(1.0), col("target_share") * col("__scale") / col("share")))
          .otherwise(lit(0.0)))
      .select(col(strataCol), col("n_tokens"), col("share"),
        col("target_share"), col("keep_frac"))
  }

  /** Deterministic PPS (probability-proportional-to-size) systematic
    * sampling — "sample ~n documents proportional to token count,
    * reproducibly": rows are laid out in the content-stable salted
    * hash order, integer weights accumulate, and a row is selected
    * once per stride boundary T = totalWeight div n its cumulative
    * weight crosses (`n_hits` = boundary crossings, >= 2 when one
    * heavy row spans several strides — the standard PPS multiplicity).
    * No RNG: the same corpus gives the same sample on any engine, any
    * partitioning, any run, and every selection decision is BIGINT
    * arithmetic (floor-division boundary counting, exact).
    *
    * SIZE CONTRACT — "~n" is an ORDER, not an exact count: with the
    * floor stride T = totalWeight div n, total boundary crossings =
    * totalWeight div T ∈ [n, 2n), reaching toward 2n as totalWeight
    * approaches (but does not reach) a small multiple of n — and when
    * totalWeight < 2n the stride floors to 1 and EVERY weight unit is
    * a boundary. Callers needing an exact count should take the first
    * n selections in hash order or use [[weightedSample]] (exact n,
    * without replacement).
    *
    * Scale shape is [[shuffleRank]]'s: hex-prefix buckets of the hash
    * order (bucket order IS hash order), per-bucket weight sums
    * collect to the driver (16^hexPrefix offsets, bounded), exclusive
    * offsets broadcast back, within-bucket window finishes the prefix.
    * Overflow contract: total weight < 2^63 (token counts at 10^11
    * docs × 10^4 tokens = 10^15 — comfortable).
    *
    * Output: the selected rows as (key, weight, n_hits).
    */
  def ppsSample(df: DataFrame, keyCol: String, weightCol: String,
                n: Long, hexPrefix: Int = 3): DataFrame = {
    require(n >= 1, s"n must be >= 1: $n")
    require(hexPrefix >= 1 && hexPrefix <= 6,
      s"hexPrefix must be in [1,6]: $hexPrefix")
    val keyed = df
      .filter(col(keyCol).isNotNull && col(weightCol).isNotNull &&
        col(weightCol) > 0)
      .select(col(keyCol).as("__k"), col(weightCol).cast("long").as("__w"))
      .withColumn("__sk", saltedOrderKey("pps", col("__k")))
      .withColumn("__bkt",
        conv(substring(col("__sk"), 1, hexPrefix), 16, 10).cast("long"))
    val btot = keyed.groupBy(col("__bkt"))
      .agg(sum(col("__w")).cast("long").as("__s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val offs = btot.map { case (b, s) => val o = acc; acc += s; (b, o) }
    val total = acc
    require(total >= n,
      s"total weight $total < n=$n — every unit would be a boundary")
    val stride = total / n
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = broadcast(offs.toSeq.toDF("__bkt", "__off"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__bkt")).orderBy(col("__sk"), col("__k"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    keyed.join(offDf, Seq("__bkt"))
      .withColumn("__cum", col("__off") + sum(col("__w")).over(w))
      .withColumn("n_hits",
        expr(s"CAST(__cum DIV ${stride}L - (__cum - __w) DIV ${stride}L AS BIGINT)"))
      .filter(col("n_hits") >= 1)
      .select(col("__k").as(keyCol), col("__w").as("weight"), col("n_hits"))
  }

  /** Deterministic negative sampling for training-pair generation: for
    * every observed (user, item) positive, `k` candidate negatives are
    * drawn from the item id space [1, max item] by a content-stable
    * md5 of (user, item, draw) — no RNG, so the training set is
    * reproducible and append-stable — and any candidate that collides
    * with one of the USER'S actual positives is rejected (dropped, not
    * redrawn: expected yield is k·(1 − user density), and a redraw
    * loop would break the one-expression determinism).
    *
    * Assumes dense integral item ids in [1, max(itemKeyCol)] (the
    * dimension-table convention); sparse id spaces would need an id
    * rank first (`shuffleRank`).
    *
    * Scale shape: one distinct on (user, item), a k-way explode of
    * literal draw indexes in the scan projection, one anti equi-join
    * on (user, candidate) — AQE handles hot users; the max-item attach
    * is a one-row broadcast.
    *
    * Output: `userCol`, `neg_item` (BIGINT), `draw` (1-based BIGINT).
    */
  def negativeSamples(positives: DataFrame, userCol: String,
                      itemCol: String, items: DataFrame,
                      itemKeyCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 16, s"k must be in [1,16]: $k")
    val pos = positives
      .filter(col(userCol).isNotNull && col(itemCol).isNotNull)
      .select(col(userCol).as("__u"), col(itemCol).cast("long").as("__i"))
      .distinct()
    val mx = broadcast(items.agg(max(col(itemKeyCol)).cast("long").as("__mx")))
    val cand = pos.crossJoin(mx)
      .withColumn("__j", explode(array((1 to k).map(j => lit(j.toLong)): _*)))
      .withColumn("__cand",
        conv(substring(md5(concat_ws("|", lit("neg"),
          col("__u").cast("string"), col("__i").cast("string"),
          col("__j").cast("string"))), 1, 12), 16, 10).cast("long") %
          col("__mx") + 1L)
    cand
      .join(pos.select(col("__u"), col("__i").as("__cand")),
        Seq("__u", "__cand"), "left_anti")
      .select(col("__u").as(userCol), col("__cand").as("neg_item"),
        col("__j").as("draw"))
  }

  /** Deterministic weighted sample WITHOUT replacement — the
    * Efraimidis–Spirakis reservoir scheme with the RNG replaced by the
    * content-stable key hash: each row draws u(key) ∈ (0, 1] from the
    * first 48 md5 bits of 'wrs|key' and scores ln(u)/w; the n LARGEST
    * scores win. Inclusion probability tracks weight exactly as in the
    * randomized scheme, but the sample is a pure function of the key
    * set — reproducible across runs, engines, and partitionings, and
    * stable under appends that don't touch the winners
    * ([[ppsSample]]'s no-RNG philosophy for the without-replacement
    * case; ppsSample draws WITH multiplicity, this never repeats a
    * key). INPUT CONTRACT: one row per key — duplicated key rows carry
    * identical scores and would all enter the top-n (dedup upstream,
    * the gainsTable idCol convention).
    *
    * Scale shape: scan-resident score (hash + one ln per row), then a
    * distributed TakeOrdered(n) — no shuffle beyond the top-n
    * aggregation, no window, no driver state.
    *
    * Output: `keyCol`, `weight`, `es_score` (double at 6 places; the
    * SELECTION runs on the unrounded score — one ln and one division,
    * deterministic in any engine).
    */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String,
                     n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1: $n")
    val keyed = df
      .filter(col(keyCol).isNotNull && col(weightCol).isNotNull &&
        col(weightCol) > 0)
      .select(col(keyCol).as("__k"), col(weightCol).cast("long").as("__w"))
      .withColumn("__h",
        conv(substring(saltedOrderKey("wrs", col("__k")), 1, 12), 16, 10)
          .cast("long"))
      .withColumn("__score",
        log((col("__h").cast("double") + 1.0) / 281474976710656.0) /
          col("__w").cast("double"))
    keyed.orderBy(col("__score").desc, col("__k")).limit(n)
      .select(col("__k").as(keyCol), col("__w").as("weight"),
        graft.functions.Rounding.p6(col("__score")).as("es_score"))
  }

  /** Effective sample size of a weighted mixture per group:
    * ESS = (Σw)²/Σw² — "a corpus of n weighted documents carries the
    * statistical information of ESS unweighted ones". The mixture-
    * design health check beside q93/q112: a temperature schedule that
    * drives efficiency (ESS/n) toward 0 is spending tokens on a
    * handful of dominant examples. Equal weights give ESS = n
    * exactly; one dominant weight drives ESS toward 1.
    *
    * Exactness: weights (≥ 6-decimal contract — token counts, ppm
    * mixture weights) accumulate as Σw DECIMAL(28,6) and Σw²
    * DECIMAL(38,6) (the q42 discipline); ESS is ONE fixed-order
    * double, pround6, and efficiency an exact-operand half-up-rounded
    * ppm. NULL and non-positive weights are dropped.
    *
    * Scale shape: ONE hash aggregate. Nothing else.
    */
  def effectiveSampleSize(df: DataFrame, groupCol: String,
                          weightCol: String): DataFrame =
    essFromStats(
      df.filter(col(groupCol).isNotNull && col(weightCol).isNotNull &&
          col(weightCol) > 0)
        .groupBy(col(groupCol))
        .agg(count(lit(1)).cast("long").as("n"),
          sum(col(weightCol).cast("decimal(28,6)")).as("__s"),
          sum((col(weightCol) * col(weightCol)).cast("decimal(38,6)"))
            .as("__q")),
      groupCol)

  /** The shared ESS closing over a per-group (n, Σw, Σw²) statistic
    * table — [[effectiveSampleSize]] and `streaming.StreamingEss`
    * both read through it, so the batch and live cards cannot
    * diverge.
    */
  def essFromStats(stats: DataFrame, groupCol: String): DataFrame = {
    def p6(c: Column) = graft.functions.Rounding.p6(c)
    val essX = "(CAST(__s AS DOUBLE) * CAST(__s AS DOUBLE)" +
      " / CAST(__q AS DOUBLE))"
    stats.select(col(groupCol), col("n"),
      p6(expr(essX)).as("ess"),
      expr(s"CAST(floor($essX / CAST(n AS DOUBLE) * 1000000 + 0.5)" +
        " AS BIGINT)").as("efficiency_ppm"))
  }

  /** Neyman optimal allocation per (group, stratum): how many of a
    * fixed audit/eval budget `totalN` should land in each stratum?
    * Optimal for estimating the group mean: n_h ∝ N_h·σ_h — big AND
    * volatile strata earn samples; a huge but constant stratum earns
    * almost none (where proportional allocation overspends). The
    * sampling-design card read before q68's stratified draw.
    *
    * Exactness: per-stratum population moments via the q42 DECIMAL
    * discipline (Σx DECIMAL(28,2), Σx² DECIMAL(28,4)); the weight
    * w_h = N_h·σ_h is ONE fixed-order double, pround6 → DECIMAL(18,6)
    * so the group total Σw is an exact decimal sum (a raw double
    * total would be order-dependent); shares and counts are
    * half-up-rounded doubles of exact operands, mirrored by the
    * oracle. An all-constant group (Σw = 0) reports NULL allocations.
    *
    * Scale shape: one (group, stratum) hash aggregate, one group
    * rollup broadcast back. Output: group, stratum, `n_pop`,
    * `sd` (pround6), `alloc_ppm`, `n_alloc`.
    */
  def neymanAllocation(df: DataFrame, groupCol: String, strataCol: String,
                       valueCol: String, totalN: Long): DataFrame = {
    require(totalN > 0, s"totalN must be positive: $totalN")
    def p6(c: Column) = graft.functions.Rounding.p6(c)
    val per = df.filter(col(groupCol).isNotNull && col(strataCol).isNotNull
        && col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(strataCol))
      .agg(count(lit(1)).cast("long").as("n_pop"),
        sum(col(valueCol).cast("decimal(28,2)")).as("__s"),
        sum((col(valueCol) * col(valueCol)).cast("decimal(28,4)"))
          .as("__q"))
    // greatest(0, ·) clamp: a near-constant stratum's double rounding
    // can land one ulp negative and sqrt would emit NaN (the
    // xyzClassification precedent)
    val sdX = "sqrt(greatest(CAST(0.0 AS DOUBLE)," +
      " CAST(__q AS DOUBLE) / CAST(n_pop AS DOUBLE)" +
      " - (CAST(__s AS DOUBLE) / CAST(n_pop AS DOUBLE))" +
      " * (CAST(__s AS DOUBLE) / CAST(n_pop AS DOUBLE))))"
    val weighted = per.withColumn("__w",
      p6(expr(s"CAST(n_pop AS DOUBLE) * $sdX")).cast("decimal(18,6)"))
    val tot = weighted.groupBy(col(groupCol))
      .agg(sum(col("__w")).cast("decimal(38,6)").as("__sw"))
    val share = "(CAST(__w AS DOUBLE) / CAST(__sw AS DOUBLE))"
    weighted.join(broadcast(tot), Seq(groupCol))
      .select(col(groupCol), col(strataCol), col("n_pop"),
        p6(expr(sdX)).as("sd"),
        expr(s"""CASE WHEN __sw = 0 THEN NULL
          ELSE CAST(floor($share * 1000000 + 0.5) AS BIGINT)
          END""").as("alloc_ppm"),
        expr(s"""CASE WHEN __sw = 0 THEN NULL
          ELSE CAST(floor(CAST($totalN AS DOUBLE) * $share + 0.5)
            AS BIGINT) END""").as("n_alloc"))
  }
}
