package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranking-quality metrics over (score, label) columns — the model- and
  * filter-evaluation queries a curation pipeline runs after scoring a
  * corpus (does the quality score actually separate keep from drop?):
  * exact AUC, the decile gains/lift table, and calibration bins.
  *
  * All three need GLOBAL ORDER over the score column, which at corpus
  * scale must not become a single-partition sort or window. The shape
  * here is the `shuffleRank`/`latenessAudit` two-phase bucketed prefix:
  * scores bucket by `floor(score / bucketWidth)`, per-bucket totals
  * collect to the driver (#occupied-buckets rows — bounded by score
  * RANGE / bucketWidth, a data contract, never by row count), exclusive
  * offsets broadcast back, and a window PARTITIONED BY BUCKET finishes
  * the prefix. No stage sees more than one bucket's rows in one task.
  *
  * SNAPSHOT ASSUMPTION (same as `shuffleRank`): the per-bucket totals
  * run as a driver job when the operator is CALLED, and the offsets are
  * baked into the returned plan as a broadcast literal. The aggregated
  * per-score/per-row frame is `localCheckpoint`ed first so both the
  * driver job and the returned plan read one materialization.
  *
  * Numeric discipline: counts stay BIGINT; the rank-sum statistic
  * accumulates as DECIMAL(38,0) (exact at any scale — no 2^63 ceiling
  * on U = O(n_pos·n_neg)); ratios are ONE fixed-order double expression
  * rounded with `floor(x·10^6 + 0.5)/10^6`, mirrored verbatim in the
  * DuckDB oracles.
  */
object Metrics {

  private def pround6(c: Column): Column = graft.functions.Rounding.p6(c)

  /** Exact AUC (Mann–Whitney U with midrank tie handling): the
    * probability a random positive outranks a random negative, plus
    * half-credit for ties —
    *   AUC = Σ_s np(s)·(2·negBelow(s) + nn(s)) / (2·NP·NN)
    * summed over DISTINCT scores s. Computed from the per-score
    * (n_pos, n_neg) table (first hash aggregate — ties collapse there,
    * so no midrank bookkeeping survives to the prefix phase), with
    * negBelow(s) as a bucketed global prefix of n_neg.
    *
    * Output: ONE row — `n_pos`, `n_neg` (BIGINT), `auc` (double at 6
    * places; NULL when either class is empty and AUC is undefined).
    *
    * @param bucketWidth score units per prefix bucket; the driver holds
    *        one offset per occupied bucket (score range / bucketWidth
    *        rows — size it from the score domain, e.g. 1.0 for scores
    *        in [0, 500])
    */
  def rankAuc(df: DataFrame, scoreCol: String, labelCol: String,
              bucketWidth: Double = 1.0): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val spark = df.sparkSession
    import spark.implicits._
    val perScore = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(col(scoreCol).cast("double").as("__s"),
        when(col(labelCol).cast("long") =!= 0L, 1L).otherwise(0L).as("__p"))
      .groupBy(col("__s"))
      .agg(sum(col("__p")).cast("long").as("__np"),
        (count(lit(1)) - sum(col("__p"))).cast("long").as("__nn"))
      .withColumn("__b", floor(col("__s") / lit(bucketWidth)).cast("long"))
      .localCheckpoint(true)
    val btot = perScore.groupBy(col("__b"))
      .agg(sum(col("__nn")).cast("long").as("__n"),
        sum(col("__np")).cast("long").as("__pp"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    var accNeg = 0L; var npTot = 0L; var nnTot = 0L
    val offs = btot.map { case (b, nns, nps) =>
      val o = accNeg; accNeg += nns; npTot += nps; nnTot += nns; (b, o)
    }
    val offDf =
      if (offs.isEmpty) Seq.empty[(Long, Long)].toDF("__b", "__off")
      else offs.toSeq.toDF("__b", "__off")
    val wPrior = Window.partitionBy(col("__b")).orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val den = 2.0 * npTot.toDouble * nnTot.toDouble
    perScore.join(broadcast(offDf), Seq("__b"))
      .withColumn("__below",
        col("__off") + coalesce(sum(col("__nn")).over(wPrior), lit(0L)))
      // cast BEFORE the multiply: np·(2·below+nn) can reach 2·NP·NN,
      // which wraps a BIGINT product exactly at the scales the
      // DECIMAL(38,0) accumulator exists for
      .agg(sum((col("__np").cast("decimal(19,0)") *
        (col("__below") * 2L + col("__nn")))
        .cast("decimal(38,0)")).as("__u2"))
      .select(lit(npTot).as("n_pos"), lit(nnTot).as("n_neg"),
        (if (npTot > 0L && nnTot > 0L)
          pround6(coalesce(col("__u2"), lit(0L)).cast("double") / lit(den))
        else lit(null).cast("double")).as("auc"))
  }

  /** Decile (n-tile) gains/lift table: rows ranked DESCENDING by
    * (score, then `idCol` ascending as the deterministic tie-break),
    * rank sliced into `tiles` equal-width tiles, and each tile scored
    * for positive concentration:
    *   lift(t) = (n_pos(t)/n_rows(t)) / (NP/N)
    * Rank is the bucketed global prefix (bucket on NEGATED score so
    * bucket order = descending score order); the tie-break makes the
    * rank — and therefore every tile boundary — engine-replayable.
    *
    * Output: one row per tile — `tile` (0-based BIGINT), `n_rows`,
    * `n_pos` (BIGINT), `pos_rate_bp` (exact floor-division basis
    * points), `lift` (double at 6 places).
    *
    * @param idCol a UNIQUE key (ties on (score, id) would make rank,
    *        and thus tile boundaries, nondeterministic)
    */
  def gainsTable(df: DataFrame, scoreCol: String, idCol: String,
                 labelCol: String, tiles: Int = 10,
                 bucketWidth: Double = 1.0): DataFrame = {
    require(tiles >= 2 && tiles <= 10000, s"tiles out of range: $tiles")
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val spark = df.sparkSession
    import spark.implicits._
    val keyed = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull &&
        col(idCol).isNotNull)
      .select(col(idCol).as("__id"),
        (-col(scoreCol).cast("double")).as("__neg"),
        when(col(labelCol).cast("long") =!= 0L, 1L).otherwise(0L).as("__p"))
      .withColumn("__b", floor(col("__neg") / lit(bucketWidth)).cast("long"))
      .localCheckpoint(true)
    val btot = keyed.groupBy(col("__b"))
      .agg(count(lit(1)).cast("long").as("__n"),
        sum(col("__p")).cast("long").as("__pp"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    var acc = 0L; var pTot = 0L
    val offs = btot.map { case (b, n, p) =>
      val o = acc; acc += n; pTot += p; (b, o)
    }
    val nTot = acc
    val offDf =
      if (offs.isEmpty) Seq.empty[(Long, Long)].toDF("__b", "__off")
      else offs.toSeq.toDF("__b", "__off")
    val w = Window.partitionBy(col("__b"))
      .orderBy(col("__neg"), col("__id"))
    val base = if (pTot > 0L && nTot > 0L)
      (col("n_pos").cast("double") * lit(nTot.toDouble)) /
        (col("n_rows").cast("double") * lit(pTot.toDouble))
    else lit(null).cast("double")
    keyed.join(broadcast(offDf), Seq("__b"))
      .withColumn("__rank",
        col("__off") + row_number().over(w).cast("long") - 1L)
      .groupBy(call_function("div", col("__rank") * lit(tiles.toLong),
        lit(math.max(nTot, 1L))).as("tile"))
      .agg(count(lit(1)).cast("long").as("n_rows"),
        sum(col("__p")).cast("long").as("n_pos"))
      .withColumn("pos_rate_bp",
        call_function("div", col("n_pos") * 10000L, col("n_rows")))
      .withColumn("lift", pround6(base))
  }

  // shared R-7 quantile machinery for exactQuantiles /
  // quantilesFromCounts: positions, the neighbor-rank set, and the
  // driver-side interpolation — one home so a convention change (or a
  // fix like the NaN guard) cannot miss a copy
  private case class QPos(q: Double, pos: Double, lo: Long, hi: Long)

  private def r7Positions(n: Long, qs: Seq[Double]): Seq[QPos] =
    qs.map { q =>
      val pos = (n - 1).toDouble * q
      val lo = math.floor(pos).toLong
      QPos(q, pos, lo, math.min(lo + 1L, n - 1L))
    }

  private def interpolate(n: Long, positions: Seq[QPos],
                          rankToV: Map[Long, Double]): Seq[(Double, Long, Double)] =
    positions.map { p =>
      val frac = p.pos - p.lo.toDouble
      val v = rankToV(p.lo) + (rankToV(p.hi) - rankToV(p.lo)) * frac
      (p.q, n, graft.functions.Rounding.proundD(v, 4))
    }

  private def checkQs(qs: Seq[Double], bucketWidth: Double): Unit = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      s"quantiles must be in [0,1]: $qs")
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
  }

  /** EXACT global quantiles at corpus scale — the distributed
    * alternative to `percentile()` (whose single aggregate buffers and
    * sorts every value of the group: exact but memory-bound, fine per
    * small group, wrong for a 10^11-row global quantile). Here the
    * answer comes from ORDER STATISTICS over the bucketed global rank:
    * per-bucket counts collect to the driver (#occupied buckets —
    * value range / bucketWidth, a data contract), the two neighbor
    * ranks of each requested quantile position (n−1)·q are computed,
    * and only the ≤ 2·|qs| buckets whose rank interval [off, off+cnt)
    * actually CONTAINS a needed rank are ever read again — every other
    * bucket is done after the counts pass (no sort, no shuffle).
    * Linear interpolation between the neighbors is the R-7 convention
    * `percentile`/`quantile_cont` implement, so results agree with
    * both to the rounding.
    *
    * SCALE: bucket count = value range / bucketWidth is FIXED by the
    * data domain, so a needed bucket's row count grows linearly with
    * data — a naive per-bucket sort would become one multi-billion-row
    * task at the 100-TB design point. Needed buckets over `leafCap`
    * rows are therefore REFINED instead of sorted: each splits into 16
    * value cells anchored at its EXACT collected [min, max] (cell id
    * `floor((v − lo)/step)` is monotone in v, so lexicographic cell
    * order IS value order and offsets stay exact), one cheap
    * counts+extrema pass per level, geometric ≥ 8× range shrink per
    * level. A cell whose min equals its max is a run of ONE value and
    * resolves on the driver with no sort at all (the constant-column /
    * heavy-ties case). Only cells still holding a needed rank recurse;
    * the final rank pass window-sorts at most 2·|qs| buckets of
    * ≤ `leafCap` rows each — bounded at ANY data scale.
    *
    * SNAPSHOT ASSUMPTION (shuffleRank's): the counts job runs when the
    * operator is CALLED and every later pass re-reads the input — the
    * input must be deterministic between evaluations (a parquet path,
    * a checkpoint).
    *
    * Output: one row per requested quantile — `q` (double),
    * `n` (BIGINT), `value` (double at 4 places).
    */
  def exactQuantiles(df: DataFrame, valCol: String, qs: Seq[Double],
                     bucketWidth: Double, leafCap: Int = 1 << 16): DataFrame = {
    checkQs(qs, bucketWidth)
    require(leafCap > 0, s"leafCap must be positive: $leafCap")
    val spark = df.sparkSession
    import spark.implicits._
    // NaN is dropped like NULL (a NaN would bucket to a null key and
    // NPE the driver collect; percentile-family parity is over the
    // ordered reals)
    val vals = df.filter(col(valCol).isNotNull && !isnan(col(valCol)))
      .select(col(valCol).cast("double").as("__v"))
      .withColumn("__b", floor(col("__v") / lit(bucketWidth)).cast("long"))
    // exact per-bucket extrema ride along with the counts: they anchor
    // the refinement cells and give the O(1) single-value resolution
    val btot = vals.groupBy(col("__b"))
      .agg(count(lit(1)).cast("long").as("__n"),
        min(col("__v")).as("__lo"), max(col("__v")).as("__hi"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    val n = btot.map(_._2).sum
    if (n == 0L)
      return Seq.empty[(Double, Long, Double)].toDF("q", "n", "value")
    val positions = r7Positions(n, qs)
    val needed = positions.flatMap(p => Seq(p.lo, p.hi)).distinct
    def owns(off: Long, cnt: Long): Seq[Long] =
      needed.filter(r => off <= r && r < off + cnt)
    // (lo, hi, off, cnt): a disjoint CLOSED value interval holding rows
    // of ranks [off, off+cnt). Disjointness is structural — level-0
    // buckets are disjoint floor intervals, refinement cells partition
    // a parent by a monotone function of the value — so `__v BETWEEN
    // lo AND hi` is an exact membership test at every level.
    var acc = 0L
    val level0 = btot.map { case (b, c, blo, bhi) =>
      val o = acc; acc += c; (b, blo, bhi, o, c)
    }
    // THE PRUNE: buckets not owning a needed rank never appear again
    var active = level0.collect {
      case (_, blo, bhi, off, cnt) if owns(off, cnt).nonEmpty =>
        (blo, bhi, off, cnt)
    }.toSeq
    // every later pass pre-filters the scan to the ≤ 2·|qs| needed
    // level-0 buckets before any range test
    val level0Ids = level0.collect {
      case (b, _, _, off, cnt) if owns(off, cnt).nonEmpty => b
    }.toSeq
    val pre = vals.filter(col("__b").isInCollection(level0Ids))
    val resolved = scala.collection.mutable.Map.empty[Long, Double]
    def resolveConstants(): Unit = {
      val (const, rest) = active.partition { case (lo, hi, _, _) => lo == hi }
      const.foreach { case (lo, _, off, cnt) =>
        owns(off, cnt).foreach(r => resolved(r) = lo)
      }
      active = rest
    }
    resolveConstants()
    // refinement loop: 64 levels of ≥ 8× range shrink cover any real
    // distribution (exhausting them needs > leafCap rows clustered
    // within 8^-64 of a bucket's span at every level); if they ARE
    // exhausted the final pass sorts what remains — correct, merely
    // unbounded, on that adversarial tail
    var level = 0
    while (active.exists(_._4 > leafCap) && level < 64) {
      level += 1
      val (big, small) = active.partition(_._4 > leafCap)
      val bigDf = broadcast(big.map { case (lo, hi, off, _) =>
        // a step that underflowed to 0 (sub-ulp span) still indexes
        // correctly at MIN_VALUE: (v−lo)/step ≤ 16 by construction
        (lo, hi, off, math.max((hi - lo) / 16.0, java.lang.Double.MIN_VALUE))
      }.toDF("__plo", "__phi", "__poff", "__step"))
      val cells = pre
        .join(bigDf, col("__v") >= col("__plo") && col("__v") <= col("__phi"))
        .groupBy(col("__plo"), col("__poff"),
          least(floor((col("__v") - col("__plo")) / col("__step")),
            lit(15.0)).cast("long").as("__i"))
        .agg(count(lit(1)).cast("long").as("__n"),
          min(col("__v")).as("__clo"), max(col("__v")).as("__chi"))
        .collect()
        .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getDouble(4), r.getDouble(5)))
      val children = cells.groupBy(c => (c._1, c._2)).toSeq.flatMap {
        case ((_, poff), cs) =>
          var o = poff
          cs.sortBy(_._3).map { case (_, _, _, cnt, clo, chi) =>
            val c = (clo, chi, o, cnt); o += cnt; c
          }
      }
      active = small ++ children.filter { case (_, _, off, cnt) =>
        owns(off, cnt).nonEmpty
      }
      resolveConstants()
    }
    // final rank pass over ONLY the surviving needed buckets: each is
    // ≤ leafCap rows (or the documented adversarial fallback), so the
    // per-partition window sort is bounded at any scale. The partition
    // key is the interval's lo — distinct across disjoint intervals.
    val picked: Map[Long, Double] =
      if (active.isEmpty) Map.empty
      else {
        val actDf = broadcast(active.map { case (lo, hi, off, _) =>
          (lo, hi, off)
        }.toDF("__plo", "__phi", "__poff"))
        val w = Window.partitionBy(col("__plo")).orderBy(col("__v"))
        pre.join(actDf,
            col("__v") >= col("__plo") && col("__v") <= col("__phi"))
          .withColumn("__r",
            col("__poff") + row_number().over(w).cast("long") - 1L)
          .filter(col("__r").isInCollection(needed))
          .select(col("__r"), col("__v"))
          .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      }
    interpolate(n, positions, resolved.toMap ++ picked)
      .toDF("q", "n", "value")
  }

  /** [[exactQuantiles]] over an ALREADY-REDUCED (value, count) table —
    * the streaming-state shape: a maintained additive value-count
    * table (bounded by the VALUE VOCABULARY, e.g. ≤ 50k distinct
    * 2-decimal prices) yields exact live quantiles with no raw-event
    * retention. Each value row owns the rank interval
    * [cum − count, cum) of the expanded multiset; the rows whose
    * intervals contain a requested R-7 neighbor rank are materialized
    * by one filtered pass and interpolated on the driver.
    *
    * Same snapshot assumption and output schema as [[exactQuantiles]].
    */
  def quantilesFromCounts(counts: DataFrame, valCol: String,
                          cntCol: String, qs: Seq[Double],
                          bucketWidth: Double): DataFrame = {
    checkQs(qs, bucketWidth)
    val spark = counts.sparkSession
    import spark.implicits._
    val vals = counts
      .filter(col(valCol).isNotNull && !isnan(col(valCol).cast("double")) &&
        col(cntCol) > 0L)
      .select(col(valCol).cast("double").as("__v"),
        col(cntCol).cast("long").as("__c"))
      .withColumn("__b", floor(col("__v") / lit(bucketWidth)).cast("long"))
    val btot = vals.groupBy(col("__b"))
      .agg(sum(col("__c")).cast("long").as("__n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val offs = btot.map { case (b, c) => val o = acc; acc += c; (b, o, c) }
    val n = acc
    if (n == 0L)
      return Seq.empty[(Double, Long, Double)].toDF("q", "n", "value")
    val positions = r7Positions(n, qs)
    val needed = positions.flatMap(p => Seq(p.lo, p.hi)).distinct
    // THE PRUNE (exactQuantiles'): only buckets whose rank interval
    // [off, off+cnt) contains a needed rank join the cumulative pass —
    // at most 2·|qs| of them can; the rest are done after the counts
    val keep = offs.filter { case (_, off, cnt) =>
      needed.exists(r => off <= r && r < off + cnt)
    }
    val offDf = broadcast(keep.map { case (b, off, _) => (b, off) }
      .toSeq.toDF("__b", "__off"))
    val w = Window.partitionBy(col("__b")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val hit = needed.map(r =>
      col("__lo") <= lit(r) && lit(r) < col("__hi")).reduce(_ || _)
    val rows = vals
      .filter(col("__b").isInCollection(keep.map(_._1).toSeq))
      .join(offDf, Seq("__b"))
      .withColumn("__hi", col("__off") + sum(col("__c")).over(w))
      .withColumn("__lo", col("__hi") - col("__c"))
      .filter(hit)
      .select(col("__lo"), col("__hi"), col("__v"))
      .collect()
    val rankToV = needed.map { r =>
      r -> rows.find(x => x.getLong(0) <= r && r < x.getLong(1)).get
        .getDouble(2)
    }.toMap
    interpolate(n, positions, rankToV).toDF("q", "n", "value")
  }

  /** Calibration (reliability) bins: scores binned by fixed width, each
    * bin reporting volume, exact mean score, and positive rate — the
    * table a reliability diagram plots ("do rows scored ~0.8 convert
    * ~80% of the time?"). One hash aggregate; the mean is a
    * DECIMAL(18,6) sum divided once (exact, partial-agg-order-free).
    *
    * Output per occupied bin, `bin` ascending: `bin` (BIGINT,
    * floor(score/binWidth)), `bin_lo` (double, bin·binWidth), `n_rows`,
    * `n_pos` (BIGINT), `mean_score` (double at 6), `pos_rate_bp`.
    */
  def calibrationBins(df: DataFrame, scoreCol: String, labelCol: String,
                      binWidth: Double): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive: $binWidth")
    df.filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(col(scoreCol).cast("double").as("__s"),
        when(col(labelCol).cast("long") =!= 0L, 1L).otherwise(0L).as("__p"))
      .groupBy(floor(col("__s") / lit(binWidth)).cast("long").as("bin"))
      .agg(count(lit(1)).cast("long").as("n_rows"),
        sum(col("__p")).cast("long").as("n_pos"),
        sum(col("__s").cast("decimal(18,6)")).as("__ssum"))
      .select(col("bin"), (col("bin").cast("double") * lit(binWidth)).as("bin_lo"),
        col("n_rows"), col("n_pos"),
        pround6(col("__ssum").cast("double") / col("n_rows").cast("double"))
          .as("mean_score"),
        call_function("div", col("n_pos") * 10000L, col("n_rows"))
          .as("pos_rate_bp"))
  }

  /** Weight-of-evidence / information-value table per feature bin —
    * the credit-scoring feature screen: how strongly does each bin of
    * a feature separate positives from negatives, and how much
    * predictive power does the feature carry in total (IV = Σ of the
    * per-bin contributions; the folk bands are <0.02 useless, 0.1–0.3
    * medium, >0.5 suspicious).
    *
    * woe(bin) = ln( (n_neg/T_neg) / (n_pos/T_pos) ),
    * iv_contrib(bin) = (n_neg/T_neg − n_pos/T_pos) · woe.
    *
    * Exactness: all four counts are exact BIGINTs; woe/iv are double
    * arithmetic over those exact operands with a fixed expression
    * order (ln of the cross-multiplied ratio — ONE division). Bins
    * where either class count is zero are DROPPED (WOE is ±∞ there;
    * smooth upstream if you need those bins). Callers round with
    * [[graft.functions.Rounding]] at the comparison boundary.
    *
    * Scale shape: one hash aggregate on the bin key plus a one-row
    * totals attach — no window, no row-scale join; output = #bins.
    * `labelCol` must be a 0/1 (or boolean) indicator.
    */
  def woeIv(df: DataFrame, binCol: String, labelCol: String): DataFrame =
    woeIvFromCounts(df
      .filter(col(binCol).isNotNull && col(labelCol).isNotNull)
      .select(col(binCol).as("bin"),
        when(col(labelCol).cast("long") =!= 0L, 1L).otherwise(0L).as("__y"))
      .groupBy(col("bin"))
      .agg(sum(col("__y")).cast("long").as("n_pos"),
        sum(lit(1L) - col("__y")).cast("long").as("n_neg")))

  /** [[woeIv]]'s closing read over an ALREADY-AGGREGATED per-bin class
    * count table (`bin`, `n_pos`, `n_neg`) — the entry point for
    * maintained states (additive class counts ARE the per-bin table,
    * so `StreamingWoe`'s live card and the one-shot screen share this
    * one implementation). Totals derive from the counts table itself;
    * the same exactness and zero-cell-drop contract as [[woeIv]].
    */
  def woeIvFromCounts(counts: DataFrame): DataFrame = {
    val tot = counts.agg(sum(col("n_pos")).cast("long").as("__tp"),
      sum(col("n_neg")).cast("long").as("__tn"))
    counts.crossJoin(broadcast(tot))
      .filter(col("n_pos") > 0L && col("n_neg") > 0L)
      .select(col("bin"), col("n_pos"), col("n_neg"),
        expr("""ln(CAST(n_neg AS DOUBLE) * __tp
                / (CAST(n_pos AS DOUBLE) * __tn))""").as("woe"),
        expr("""(CAST(n_neg AS DOUBLE) / __tn
                - CAST(n_pos AS DOUBLE) / __tp)
               * ln(CAST(n_neg AS DOUBLE) * __tp
                / (CAST(n_pos AS DOUBLE) * __tn))""").as("iv_contrib"))
  }

  /** Pooled two-proportion z-test per experiment key — the A/B card:
    * does arm 1's success rate differ from arm 0's beyond sampling
    * noise?  z = (p₁ − p₀) / √(p̄(1−p̄)(1/n₀ + 1/n₁)) with the pooled
    * p̄ = (k₀+k₁)/(n₀+n₁).
    *
    * Exactness: the four counts are exact BIGINTs; `z` is ONE
    * fixed-order double expression over them — with A = k₁n₀ − k₀n₁,
    * N = n₀+n₁, K = k₀+k₁:  z = A·√(N / (n₀·n₁·K·(N−K))) (one sqrt,
    * one multiply — both engines replay it bit-for-bit). The
    * `significant` flag NEVER reads the rounded double: z² > 1.96²
    * cross-multiplies to 625·A²·N > 2401·n₀·n₁·K·(N−K) in
    * DECIMAL(38,0) (1.96 = 49/25 exactly), with A itself computed in
    * DECIMAL (k₁n₀ wraps a raw BIGINT once both arms pass ~3·10⁹).
    * Either cross-product approaching DECIMAL(38,0) capacity RAISES
    * (double-estimate pre-guard with a 10% margin) instead of letting
    * the non-ANSI decimal overflow read back as a silent NULL flag.
    * Degenerate keys — one arm empty, or K ∈ {0, N} (no variance) —
    * report z = 0, not significant; one-arm keys are DROPPED (no
    * comparison exists).
    *
    * Scale shape: ONE hash aggregate on the key — conditional sums
    * make both arms' counts in the same pass; output = #keys, no
    * join, no window. `armCol` and `successCol` must be 0/1 (or
    * boolean) indicators.
    */
  def twoProportionZ(df: DataFrame, keyCol: String, armCol: String,
                     successCol: String): DataFrame = {
    val arm1 = when(col(armCol).cast("long") =!= 0L, 1L).otherwise(0L)
    val succ = when(col(successCol).cast("long") =!= 0L, 1L).otherwise(0L)
    twoProportionZFromCounts(df
      .filter(col(keyCol).isNotNull && col(armCol).isNotNull &&
        col(successCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(sum(lit(1L) - arm1).cast("long").as("n_a"),
        sum((lit(1L) - arm1) * succ).cast("long").as("k_a"),
        sum(arm1).cast("long").as("n_b"),
        sum(arm1 * succ).cast("long").as("k_b")), keyCol)
  }

  /** [[twoProportionZ]]'s closing read over an ALREADY-AGGREGATED
    * per-key arm-count table (`keyCol`, `n_a`, `k_a`, `n_b`, `k_b`) —
    * the entry point for maintained states (`StreamingAbTest`'s live
    * card and the one-shot test share this one implementation). Same
    * exactness contract: the rounded z never decides `significant`.
    */
  def twoProportionZFromCounts(counts0: DataFrame,
                               keyCol: String): DataFrame = {
    val counts = counts0.filter(col("n_a") > 0L && col("n_b") > 0L)
    // A computes in DECIMAL from the first multiply: k_b·n_a wraps a
    // raw BIGINT once both arms pass ~3·10⁹ rows (silent in non-ANSI
    // Spark, a raise in DuckDB)
    val aDec = "(CAST(k_b AS DECIMAL(19,0)) * n_a" +
      " - CAST(k_a AS DECIMAL(19,0)) * n_b)"
    val aDbl = s"CAST($aDec AS DOUBLE)"
    val nExpr = "(n_a + n_b)"
    val kExpr = "(k_a + k_b)"
    val degenerate = s"$kExpr = 0 OR $kExpr = $nExpr"
    // overflow guard for the exact cross-multiplication: estimate both
    // sides in DOUBLE and refuse loudly within a 10% margin of the
    // DECIMAL(38,0) capacity — past it the non-ANSI decimal product
    // would NULL and 'significant' would silently read NULL exactly
    // when the test matters (round-10 second-pass review finding).
    // The double estimate's ~1e-16 relative error is 15 orders below
    // the margin.
    val lhsD = s"625.0 * $aDbl * $aDbl * CAST($nExpr AS DOUBLE)"
    val rhsD = "2401.0 * CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)" +
      s" * CAST($kExpr AS DOUBLE) * CAST($nExpr - $kExpr AS DOUBLE)"
    counts.select(col(keyCol), col("n_a"), col("k_a"), col("n_b"),
      col("k_b"),
      pround6(expr(s"""CASE WHEN $degenerate THEN 0.0
        ELSE $aDbl * sqrt(CAST($nExpr AS DOUBLE)
          / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
             * CAST($kExpr AS DOUBLE)
             * CAST($nExpr - $kExpr AS DOUBLE))) END""")).as("z"),
      expr(s"""CASE
        WHEN $degenerate THEN false
        WHEN $lhsD > 9e37 OR $rhsD > 9e37
        THEN CAST(raise_error(
          'Metrics.twoProportionZ: cross-multiplied significance operands approach DECIMAL(38,0) capacity; pre-aggregate or shard the experiment rows first') AS BOOLEAN)
        ELSE CAST(625 AS DECIMAL(38,0))
            * $aDec * $aDec
            * CAST($nExpr AS DECIMAL(19,0))
          > CAST(2401 AS DECIMAL(38,0))
            * CAST(n_a AS DECIMAL(19,0)) * CAST(n_b AS DECIMAL(19,0))
            * CAST($kExpr AS DECIMAL(19,0))
            * CAST($nExpr - $kExpr AS DECIMAL(19,0))
        END""").as("significant"))
  }

  /** Wilson score-interval lower bound per key — the "worst offender"
    * / "best rated" ranking that does not reward tiny-n flukes: a key
    * with 2/2 failures ranks BELOW one with 80/100, because the bound
    * prices in the sample size. The standard sort key for review
    * scores, defect rates, and conversion leaderboards.
    *
    * lb = (p̂ + z²/2n − z·√((p̂(1−p̂) + z²/4n)/n)) / (1 + z²/n).
    *
    * Exactness: n and k are exact BIGINTs and `rate_bp` is exact floor
    * basis points (contract: k·10⁴ < 2⁶³); the bound itself is double
    * arithmetic written as ONE fixed expression text on both engine
    * and oracle (the z literal is embedded via its shortest
    * round-trip representation), rounded by the portable
    * [[graft.functions.Rounding]] formula at 6 places. The radicand
    * is clamped at 0 (one-ulp-negative at p̂∈{0,1} — the q269 lesson).
    *
    * Scale shape: ONE hash aggregate on the key, then row-local
    * arithmetic — no window, no join; output = #keys.
    * `successCol` must be a 0/1 (or boolean) indicator.
    */
  def wilsonLowerBound(df: DataFrame, keyCol: String, successCol: String,
                       z: Double = 1.959964, minN: Long = 1L): DataFrame = {
    require(z > 0, s"z must be positive: $z")
    require(minN >= 1, s"minN must be >= 1: $minN")
    require(!Set("n", "k", "rate_bp", "wilson_lb")(keyCol.toLowerCase),
      s"keyCol collides with a wilsonLowerBound output column: $keyCol")
    // the literal must be DOUBLE-typed in the expression TEXT: a bare
    // 1.959964 parses as DECIMAL(7,6) and the engines then coerce the
    // mixed decimal/double arithmetic in different orders — same text,
    // different ulps. CAST pins both to one IEEE sequence.
    val zs = s"CAST(${z.toString} AS DOUBLE)"
    df.filter(col(keyCol).isNotNull && col(successCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col(successCol).cast("long")).cast("long").as("k"))
      .filter(col("n") >= minN)
      .select(col(keyCol), col("n"), col("k"),
        // k casts to DECIMAL BEFORE the 10^4 multiply (casting the
        // product is too late — non-ANSI BIGINT wraps silently where
        // DuckDB raises)
        expr("CAST(CAST(k AS DECIMAL(19,0)) * 10000 DIV n AS BIGINT)")
          .as("rate_bp"),
        pround6(expr(
          s"""((CAST(k AS DOUBLE) / n + $zs * $zs / (2.0 * n)
             |  - $zs * sqrt(greatest(0.0,
             |      (CAST(k AS DOUBLE) / n * (1.0 - CAST(k AS DOUBLE) / n)
             |       + $zs * $zs / (4.0 * n)) / n)))
             | / (1.0 + $zs * $zs / n))""".stripMargin))
          .as("wilson_lb"))
  }

  /** Cohen's kappa per group: chance-corrected agreement between two
    * categorical labelings of the same items — the label-quality audit
    * for training data ("does the stored language tag agree with the
    * recomputed language id beyond what marginal frequencies would
    * produce by luck?"). Raw accuracy rewards a labeler that always
    * answers the majority class; kappa subtracts that.
    *
    * Entirely rational in the cell counts: with n items, `agree` =
    * Σ_c n_cc diagonal matches and marginals ra(c)/rb(c),
    *   kappa = (n·agree − Σ_c ra(c)·rb(c)) / (n² − Σ_c ra(c)·rb(c))
    * — numerator A and denominator B exact DECIMAL(38,0), kappa ONE
    * fixed-order double (pround6), and the Landis–Koch `strength`
    * band decided by exact cross-multiplication 5·A vs k·B (bands at
    * 0 / 0.2 / 0.4 / 0.6 / 0.8), never the rounded double. B = 0
    * (both labelings constant — chance agreement is certain) reports
    * kappa 0 with strength 'degenerate'.
    *
    * Scale shape: one hash aggregate to (group, a, b) cells, two
    * vocabulary-bounded marginal aggregates equi-joined on (group,
    * label), one closing per-group aggregate. No windows. The
    * null-label drop is applied ABOVE the checkpointed cell aggregate,
    * not on the input: a label filter on the input gets substituted
    * below the caller's projection (PushPredicateThroughNonJoin has no
    * cost guard, and a filter on grouping columns pushes below the
    * aggregate too) and re-evaluates expensive label expressions —
    * q303 aliases a full lang-id scoring as `lang_pred`, and the
    * upfront filter doubled its pipeline exactly as in [[fleissKappa]].
    * Dropping null cells after grouping is equivalent: each input row
    * lands in exactly one (a, b) cell, so removing null-labeled cells
    * removes precisely the null-labeled rows from every downstream
    * count.
    */
  def cohensKappa(df: DataFrame, groupCol: String, aCol: String,
                  bCol: String): DataFrame = {
    val cells = df
      .filter(col(groupCol).isNotNull)
      .select(col(groupCol).as("__g"), col(aCol).as("__a"),
        col(bCol).as("__b"))
      .groupBy(col("__g"), col("__a"), col("__b"))
      .agg(count(lit(1)).cast("long").as("__c"))
      .localCheckpoint(true)
      // cheap plan over the checkpoint blocks — nothing to push into
      .filter(col("__a").isNotNull && col("__b").isNotNull)
    val per = cells.groupBy(col("__g"))
      .agg(sum(col("__c")).cast("long").as("n"),
        sum(when(col("__a") === col("__b"), col("__c"))
          .otherwise(lit(0L))).cast("long").as("agree"))
    val ra = cells.groupBy(col("__g"), col("__a").as("__l"))
      .agg(sum(col("__c")).cast("long").as("__ra"))
    val rb = cells.groupBy(col("__g"), col("__b").as("__l"))
      .agg(sum(col("__c")).cast("long").as("__rb"))
    val pe = ra.join(rb, Seq("__g", "__l"))
      .groupBy(col("__g"))
      .agg(sum(col("__ra").cast("decimal(38,0)") * col("__rb"))
        .as("__pe"))
    val aExpr = "(CAST(n AS DECIMAL(38,0)) * agree - __pe)"
    val bExpr = "(CAST(n AS DECIMAL(38,0)) * n - __pe)"
    per.join(pe, Seq("__g"))
      .select(col("__g").as(groupCol), col("n"), col("agree"),
        pround6(expr(s"""CASE WHEN $bExpr = 0 THEN 0.0
          ELSE CAST($aExpr AS DOUBLE) / CAST($bExpr AS DOUBLE) END"""))
          .as("kappa"),
        expr(s"""CASE
          WHEN $bExpr = 0 THEN 'degenerate'
          WHEN 5 * $aExpr <= 0 THEN 'poor'
          WHEN 5 * $aExpr <= 1 * $bExpr THEN 'slight'
          WHEN 5 * $aExpr <= 2 * $bExpr THEN 'fair'
          WHEN 5 * $aExpr <= 3 * $bExpr THEN 'moderate'
          WHEN 5 * $aExpr <= 4 * $bExpr THEN 'substantial'
          ELSE 'almost perfect' END""").as("strength"))
  }

  /** Position discounts 1/log₂(i+1) for ranks 1..k as shortest-
    * round-trip double literals. PUBLIC ON PURPOSE: the engine and
    * the DuckDB oracle both embed THESE LITERAL STRINGS, so the two
    * sides never call an engine log whose last ULP could differ —
    * the literal parses to the identical double everywhere.
    */
  def dcgDiscounts(k: Int): Seq[String] =
    (1 to k).map(i => (1.0 / (math.log(i + 1.0) / math.log(2.0))).toString)

  private def discountCase(rnCol: String, k: Int): String =
    s"CASE $rnCol " + dcgDiscounts(k).zipWithIndex.map {
      case (d, i) => s"WHEN ${i + 1} THEN CAST($d AS DOUBLE) "
    }.mkString + "END"

  /** NDCG@k per query: graded-relevance ranking quality — "did the
    * score put the MOST relevant items at the TOP?", where rankAuc
    * (binary) and gainsTable (deciles) cannot see grade order. DCG =
    * Σ_{i≤k} (2^rel − 1)/log₂(i+1) over the score ranking, IDCG the
    * same sum over the ideal (relevance-sorted) ranking, ndcg their
    * ratio.
    *
    * Engine-exactness: the gain 2^rel − 1 is an exact BIGINT
    * (shiftleft — `rel` must be in [0, 30], enforced with
    * raise_error); the discount is a SHARED LITERAL per position
    * ([[dcgDiscounts]] — no engine log in the plan); each term is one
    * fixed-order double, pround6, summed as DECIMAL(18,6); ndcg is
    * the one closing double. Ties in score break by ascending id on
    * both rankings, so the top-k SET is engine-exact.
    *
    * Scale shape: two row_number windows per query (score ranking +
    * ideal ranking), both filtered to rank ≤ k — the WindowGroupLimit
    * shape the q09 plan gate pins, so no query's full ranking ever
    * materializes past the per-partition group limit. Queries with
    * IDCG = 0 (no relevant item at all) report ndcg 0.
    */
  def ndcgAtK(df: DataFrame, queryCol: String, scoreCol: String,
              idCol: String, relCol: String, k: Int = 10): DataFrame = {
    require(k >= 1 && k <= 100, s"k must be in [1, 100]: $k")
    val base = df
      .filter(col(queryCol).isNotNull && col(scoreCol).isNotNull &&
        col(idCol).isNotNull && col(relCol).isNotNull)
      .select(col(queryCol).as("__q"), col(scoreCol).as("__s"),
        col(idCol).as("__id"),
        when(col(relCol).cast("long").between(0L, 30L),
          col(relCol).cast("long"))
          .otherwise(expr("CAST(raise_error('Metrics.ndcgAtK: relevance " +
            "grade outside [0, 30] — 2^rel would overflow the exact " +
            "BIGINT gain') AS BIGINT)")).as("__rel"))
      .localCheckpoint(true)
    val wScore = Window.partitionBy(col("__q"))
      .orderBy(col("__s").desc, col("__id").asc)
    val wIdeal = Window.partitionBy(col("__q"))
      .orderBy(col("__rel").desc, col("__id").asc)
    val disc = discountCase("__rn", k)
    def sumTerms(ranked: DataFrame, alias: String) = ranked
      .filter(col("__rn") <= k)
      .withColumn("__gain", expr("shiftleft(1L, CAST(__rel AS INT)) - 1L"))
      .groupBy(col("__q"))
      .agg(sum(pround6(expr(s"CAST(__gain AS DOUBLE) * ($disc)"))
        .cast("decimal(18,6)")).as(alias))
    val n = base.groupBy(col("__q")).agg(count(lit(1)).cast("long").as("n"))
    val dcg = sumTerms(base.withColumn("__rn", row_number().over(wScore)),
      "__dcg")
    val idcg = sumTerms(base.withColumn("__rn", row_number().over(wIdeal)),
      "__idcg")
    n.join(dcg, Seq("__q")).join(idcg, Seq("__q"))
      .select(col("__q").as(queryCol), col("n"),
        col("__dcg").cast("double").as("dcg"),
        col("__idcg").cast("double").as("idcg"),
        pround6(expr("""CASE WHEN __idcg = 0 THEN 0.0
          ELSE CAST(__dcg AS DOUBLE) / CAST(__idcg AS DOUBLE) END"""))
          .as("ndcg"))
  }

  /** Mean reciprocal rank per group: across this group's queries,
    * how high does the FIRST relevant item sit? The navigation-style
    * companion to [[ndcgAtK]] (which rewards the whole graded top-k).
    * Queries with no relevant item contribute 0 (the standard
    * convention — a miss is a rank of ∞).
    *
    * Exactness: the first relevant rank is an exact BIGINT (min over
    * a row_number window ordered by score desc, id asc); each 1/rank
    * is one pround6 double into a DECIMAL(18,6) sum; mrr is the one
    * closing double over n_queries.
    *
    * Scale shape: one row_number window per query (rows-per-query
    * bounded), one (group, query) aggregate, one group aggregate.
    */
  def meanReciprocalRank(df: DataFrame, groupCol: String,
                         queryCol: String, scoreCol: String,
                         idCol: String, relCol: String): DataFrame = {
    val base = df
      .filter(col(groupCol).isNotNull && col(queryCol).isNotNull &&
        col(scoreCol).isNotNull && col(idCol).isNotNull &&
        col(relCol).isNotNull)
      .select(col(groupCol).as("__g"), col(queryCol).as("__qq"),
        col(scoreCol).as("__s"), col(idCol).as("__id"),
        (col(relCol).cast("long") =!= 0L).as("__hit"))
    val w = Window.partitionBy(col("__g"), col("__qq"))
      .orderBy(col("__s").desc, col("__id").asc)
    val perQuery = base.withColumn("__rn", row_number().over(w))
      .groupBy(col("__g"), col("__qq"))
      .agg(min(when(col("__hit"), col("__rn"))).as("__first"))
    perQuery.groupBy(col("__g").as(groupCol))
      .agg(count(lit(1)).cast("long").as("n_queries"),
        sum(when(col("__first").isNotNull, 1L).otherwise(0L))
          .cast("long").as("n_hit"),
        sum(when(col("__first").isNotNull,
          pround6(expr("1.0 / CAST(__first AS DOUBLE)")))
          .otherwise(lit(0.0)).cast("decimal(18,6)")).as("__rr"))
      .select(col(groupCol), col("n_queries"), col("n_hit"),
        pround6(expr("CAST(__rr AS DOUBLE) / CAST(n_queries AS DOUBLE)"))
          .as("mrr"))
  }

  /** Fleiss' kappa per group: chance-corrected agreement among k ≥ 2
    * raters per item — the multi-rater extension of [[cohensKappa]]
    * (three labeling pipelines voting on a document's language, k
    * annotators on a rubric). Each rating column is one rater.
    *
    * Entirely rational in the counts: with N items, M = N·k total
    * ratings, category totals T_c, and per-item-category counts n_ic,
    *   kappa = [ (ΣΣn_ic² − M)·M² − M(k−1)·ΣT_c² ]
    *         / [ M(k−1)·(M² − ΣT_c²) ]
    * — numerator and denominator exact DECIMAL(38,0), kappa ONE
    * fixed-order double (pround6), the Landis–Koch band by 5·Num vs
    * band·Den cross-multiplication. Den = 0 (every rating in one
    * category) reports 'degenerate'. Rows with ANY null rating are
    * dropped (the per-item count identity Σ_c n_ic = k must hold).
    *
    * Scale shape: one explode to (group, item, rating), two hash
    * aggregates (per-item-category, then per-group), plus the
    * category-total aggregate equi-joined on the group key. The
    * any-rater-null drop is enforced AFTER the per-item aggregate (a
    * null rating survives the explode as a null row, and items owning
    * one are anti-joined away on the tiny aggregated frame): a
    * `rater.isNotNull` filter on the INPUT would be pushed below the
    * caller's projection by predicate substitution and re-evaluate
    * every rating expression once per conjunct — for q308's
    * lang-id raters that alias full text scoring, the upfront filter
    * measured 2.0–2.5× the whole pipeline at sf1.0 (the filter-side
    * twin of the round-14 HOF re-inline trap: CollapseProject has a
    * multi-ref cost guard, PushPredicateThroughNonJoin does not).
    */
  def fleissKappa(df: DataFrame, groupCol: String, itemCol: String,
                  ratingCols: Seq[String]): DataFrame = {
    require(ratingCols.size >= 2,
      s"fleissKappa needs >= 2 raters, got ${ratingCols.size}")
    val k = ratingCols.size
    // the ONE checkpoint sits BELOW the null screen so the expensive
    // rating pipeline runs exactly once; bad + the anti-join are
    // cheap plans over the checkpointed blocks (a broadcast of an
    // un-checkpointed `bad` would re-execute the pipeline to build it
    // — the q215 renorm trap)
    val cells0 = df
      .filter(col(groupCol).isNotNull && col(itemCol).isNotNull)
      .select(col(groupCol).as("__g"), col(itemCol).as("__i"),
        explode(array(ratingCols.map(col(_).cast("string")): _*))
          .as("__r"))
      .groupBy(col("__g"), col("__i"), col("__r"))
      .agg(count(lit(1)).cast("long").as("__c"))
      .localCheckpoint(true)
    // items with ANY null rating (usually none): broadcast anti-join
    // on the aggregated frame — ≤ k+1 rows per item, no text in sight
    val bad = cells0.filter(col("__r").isNull)
      .select(col("__g"), col("__i")).distinct()
    val cells = cells0.join(broadcast(bad), Seq("__g", "__i"), "left_anti")
    val per = cells.groupBy(col("__g"))
      .agg((sum(col("__c")).cast("decimal(38,0)") / lit(k))
        .cast("long").as("n_items"),
        sum(col("__c").cast("decimal(38,0)") * col("__c")).as("__ss"))
    val tc = cells.groupBy(col("__g"), col("__r"))
      .agg(sum(col("__c")).cast("long").as("__t"))
      .groupBy(col("__g"))
      .agg(sum(col("__t").cast("decimal(38,0)") * col("__t")).as("__t2"))
    val m = s"(CAST(n_items AS DECIMAL(38,0)) * $k)"
    val num = s"((__ss - $m) * $m * $m - $m * ${k - 1} * __t2)"
    val den = s"($m * ${k - 1} * ($m * $m - __t2))"
    // overflow pre-guard (the q287 pattern): num/den scale as M³, so
    // M past 10¹² would push 5·num beyond DECIMAL(38,0) — raise in
    // EVERY consuming column (a guard in one column gets pruned when
    // a caller selects only the other — round-10 lesson)
    val guard = s"WHEN $m > CAST(1000000000000 AS DECIMAL(38,0)) " +
      "THEN %s(raise_error('Metrics.fleissKappa: M = N*k exceeds 10^12; " +
      "the cubic kappa operands would overflow DECIMAL(38,0) — " +
      "compute per finer group'))"
    per.join(tc, Seq("__g"))
      .select(col("__g").as(groupCol), col("n_items"),
        lit(k.toLong).as("k_raters"),
        pround6(expr(s"""CASE
          ${guard.format("double")}
          WHEN $den = 0 THEN 0.0
          ELSE CAST($num AS DOUBLE) / CAST($den AS DOUBLE) END"""))
          .as("kappa"),
        expr(s"""CASE
          ${guard.format("string")}
          WHEN $den = 0 THEN 'degenerate'
          WHEN 5 * $num <= 0 THEN 'poor'
          WHEN 5 * $num <= 1 * $den THEN 'slight'
          WHEN 5 * $num <= 2 * $den THEN 'fair'
          WHEN 5 * $num <= 3 * $den THEN 'moderate'
          WHEN 5 * $num <= 4 * $den THEN 'substantial'
          ELSE 'almost perfect' END""").as("strength"))
  }

  /** Isotonic (monotone) calibration curve per group — the PAV fit of
    * label rate against score bin, computed by the interval-minimax
    * identity instead of the sequential pool-adjacent-violators loop:
    *   iso(i) = max_{j ≤ i} min_{k ≥ i} rate(j, k)
    * where rate(j, k) is the pooled positive rate over bins j..k.
    * This is what turns a raw quality score into a usable keep
    * probability when the score is honest about ORDER but not about
    * LEVEL.
    *
    * Determinism: every rate(j, k) is one double division of exact
    * BIGINT prefix differences — identical bits on any engine — and
    * min/max over identical doubles are engine-free; the reported
    * iso_rate is pround6. The raw per-bin rate stays an exact ppm
    * integer.
    *
    * Scale shape: bins are vocabulary-bounded (score range /
    * binWidth); the minimax runs over the j ≤ k bin-pair grid — B²
    * rows per group, with a `maxBins` guard that RAISES on the grid
    * input rows (the pruned-guard lesson) before B² materializes.
    * Windows partition by (group, j) and (group, i): never more than
    * B rows per partition.
    */
  def isotonicCalibration(df: DataFrame, groupCol: String,
                          scoreCol: String, labelCol: String,
                          binWidth: Double, maxBins: Int = 512): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive: $binWidth")
    require(maxBins >= 1, s"maxBins must be >= 1: $maxBins")
    val y = when(col(labelCol).cast("long") =!= 0L, 1L).otherwise(0L)
    val bins = df
      .filter(col(groupCol).isNotNull && col(scoreCol).isNotNull &&
        col(labelCol).isNotNull)
      .select(col(groupCol).as("__g"),
        floor(col(scoreCol).cast("double") / binWidth).cast("long")
          .as("__b"), y.as("__y"))
      .groupBy(col("__g"), col("__b"))
      .agg(count(lit(1)).cast("long").as("__n"),
        sum(col("__y")).cast("long").as("__p"))
      .localCheckpoint(true)
    val nb = bins.groupBy(col("__g"))
      .agg(count(lit(1)).cast("long").as("__nb"))
    val wCum = Window.partitionBy(col("__g")).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPrior = Window.partitionBy(col("__g")).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = bins
      .withColumn("__cn", sum(col("__n")).over(wCum))
      .withColumn("__cp", sum(col("__p")).over(wCum))
      .withColumn("__en", coalesce(sum(col("__n")).over(wPrior), lit(0L)))
      .withColumn("__ep", coalesce(sum(col("__p")).over(wPrior), lit(0L)))
    // guard ON the grid input rows: an over-vocabulary group raises
    // while scanning, before the B² pair grid exists downstream
    val guarded = cum.join(nb, Seq("__g"))
      .withColumn("__bg",
        when(col("__nb") > maxBins,
          expr(s"CAST(raise_error(concat('Metrics.isotonicCalibration: ', " +
            s"CAST(__nb AS STRING), ' score bins in one group exceed " +
            s"maxBins=$maxBins; widen binWidth')) AS BIGINT)"))
          .otherwise(col("__b")))
    // fresh aliases (new exprIds) on both grid sides — j and kf share
    // `guarded`'s lineage, and a bare self-join on __g is ambiguous
    val j = guarded.select(col("__g").as("__gj"), col("__bg").as("__j"),
      col("__en"), col("__ep"))
    val kf = guarded.select(col("__g").as("__gk"), col("__bg").as("__k"),
      col("__cn"), col("__cp"))
    val grid = j.join(kf,
        col("__gj") === col("__gk") && col("__j") <= col("__k"))
      .withColumn("__rate",
        (col("__cp") - col("__ep")).cast("double") /
          (col("__cn") - col("__en")).cast("double"))
    // min over k >= i, per starting bin j: a desc-ordered running min
    val wSuffix = Window.partitionBy(col("__gj"), col("__j"))
      .orderBy(col("__k").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val mn = grid.withColumn("__mn", min(col("__rate")).over(wSuffix))
      .select(col("__gj"), col("__j"), col("__k").as("__i"), col("__mn"))
    val iso = mn.groupBy(col("__gj"), col("__i"))
      .agg(max(col("__mn")).as("__iso"))
    bins.join(iso, bins("__g") === iso("__gj") &&
        bins("__b") === iso("__i"))
      .select(bins("__g").as(groupCol), col("__b").as("bin"),
        col("__n").as("n"), col("__p").as("n_pos"),
        expr("CAST(CAST(__p AS DECIMAL(19,0)) * 1000000 DIV __n AS BIGINT)")
          .as("raw_rate_ppm"),
        pround6(col("__iso")).as("iso_rate"))
  }

  /** Calibration quality card per group: expected calibration error
    * plus the Brier decomposition (reliability / resolution /
    * uncertainty) over score bins — "is the keep-probability the
    * model reports actually the rate at which kept items are good?"
    * ECE = Σ_b (n_b/N)·|conf_b − rate_b|; REL = Σ (n_b/N)(conf_b −
    * rate_b)²; RES = Σ (n_b/N)(rate_b − base)²; UNC = base(1−base);
    * Brier ≈ REL − RES + UNC.
    *
    * Determinism: per-bin score sums are exact DECIMAL(18,6) (the
    * dsum discipline), counts BIGINT, so conf_b and rate_b are
    * identical doubles on both engines; each bin term is ONE
    * fixed-order double, pround6, summed as DECIMAL(18,6); N and the
    * base rate attach via full-partition windows (no one-row
    * crossJoin). Scale shape: one (group, bin) hash aggregate + one
    * group aggregate.
    */
  def calibrationCard(df: DataFrame, groupCol: String, scoreCol: String,
                      labelCol: String, binWidth: Double): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive: $binWidth")
    val y = when(col(labelCol).cast("long") =!= 0L, 1L).otherwise(0L)
    val bins = df
      .filter(col(groupCol).isNotNull && col(scoreCol).isNotNull &&
        col(labelCol).isNotNull)
      .select(col(groupCol).as("__g"),
        floor(col(scoreCol).cast("double") / binWidth).cast("long")
          .as("__b"),
        col(scoreCol).cast("decimal(18,6)").as("__s"), y.as("__y"))
      .groupBy(col("__g"), col("__b"))
      .agg(count(lit(1)).cast("long").as("__n"),
        sum(col("__y")).cast("long").as("__p"),
        sum(col("__s")).cast("decimal(38,6)").as("__ss"))
    // totals named with NO case-insensitive collision against __n/__p:
    // Spark resolves SQL-text column references case-insensitively,
    // so "__N" beside "__n" is ambiguous and silently mis-resolves
    val wAll = Window.partitionBy(col("__g"))
    val tot = bins
      .withColumn("__tn", sum(col("__n")).over(wAll).cast("long"))
      .withColumn("__tk", sum(col("__p")).over(wAll).cast("long"))
    val conf = "(CAST(__ss AS DOUBLE) / CAST(__n AS DOUBLE))"
    val rate = "(CAST(__p AS DOUBLE) / CAST(__n AS DOUBLE))"
    val wt = "(CAST(__n AS DOUBLE) / CAST(__tn AS DOUBLE))"
    val base = "(CAST(__tk AS DOUBLE) / CAST(__tn AS DOUBLE))"
    tot.groupBy(col("__g").as(groupCol))
      .agg(max(col("__tn")).as("n"), max(col("__tk")).as("n_pos"),
        sum(pround6(expr(s"$wt * abs($conf - $rate)"))
          .cast("decimal(18,6)")).as("__ece"),
        sum(pround6(expr(s"$wt * ($conf - $rate) * ($conf - $rate)"))
          .cast("decimal(18,6)")).as("__rel"),
        sum(pround6(expr(s"$wt * ($rate - $base) * ($rate - $base)"))
          .cast("decimal(18,6)")).as("__res"),
        max(pround6(expr(s"$base * (1.0 - $base)"))).as("unc"))
      .select(col(groupCol), col("n"), col("n_pos"),
        col("__ece").cast("double").as("ece"),
        col("__rel").cast("double").as("brier_rel"),
        col("__res").cast("double").as("brier_res"),
        col("unc"))
  }

  /** Precision/recall sweep per group over FIXED integer thresholds:
    * at each threshold t, predict positive where score ≥ t — the
    * operating-point table behind "where do we set the keep cutoff?".
    * ENTIRELY exact: tp/fp/fn are conditional BIGINT counts, the
    * three rates exact ppm floor divisions; one (group, threshold)
    * row each. Thresholds explode a bounded constant (≤ 64
    * `require`d) — one pass over the data, no per-threshold rescans.
    */
  def prCurve(df: DataFrame, groupCol: String, scoreCol: String,
              labelCol: String, thresholds: Seq[Long]): DataFrame = {
    require(thresholds.nonEmpty && thresholds.size <= 64,
      s"1..64 thresholds: ${thresholds.size}")
    require(thresholds.distinct.size == thresholds.size,
      "duplicate thresholds")
    val y = when(col(labelCol).cast("long") =!= 0L, 1L).otherwise(0L)
    val base = df
      .filter(col(groupCol).isNotNull && col(scoreCol).isNotNull &&
        col(labelCol).isNotNull)
      .select(col(groupCol).as("__g"),
        col(scoreCol).cast("double").as("__s"), y.as("__y"))
    // thresholds ride as an exploded array LITERAL — no broadcast
    // loop join for a compile-time-bounded constant list
    base.withColumn("threshold",
        explode(typedLit(thresholds.sorted)))
      .groupBy(col("__g"), col("threshold"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(when(col("__s") >= col("threshold") && col("__y") === 1L, 1L)
          .otherwise(0L)).cast("long").as("tp"),
        sum(when(col("__s") >= col("threshold") && col("__y") === 0L, 1L)
          .otherwise(0L)).cast("long").as("fp"),
        sum(when(col("__s") < col("threshold") && col("__y") === 1L, 1L)
          .otherwise(0L)).cast("long").as("fn"))
      .select(col("__g").as(groupCol), col("threshold"), col("n"),
        col("tp"), col("fp"), col("fn"),
        expr("""CASE WHEN tp + fp = 0 THEN NULL
          ELSE CAST(CAST(tp AS DECIMAL(19,0)) * 1000000 DIV (tp + fp)
            AS BIGINT) END""").as("precision_ppm"),
        expr("""CASE WHEN tp + fn = 0 THEN NULL
          ELSE CAST(CAST(tp AS DECIMAL(19,0)) * 1000000 DIV (tp + fn)
            AS BIGINT) END""").as("recall_ppm"),
        expr("""CASE WHEN 2 * tp + fp + fn = 0 THEN NULL
          ELSE CAST(CAST(tp AS DECIMAL(19,0)) * 2000000
            DIV (2 * tp + fp + fn) AS BIGINT) END""").as("f1_ppm"))
  }

  /** Pair-set quality of a candidate generator against labeled truth
    * pairs: precision / recall / F1 of PREDICTED near-dup pairs vs
    * TRUE duplicate pairs — the evaluation every banding config
    * (bands × rows-per-band, SimHash radius, prefix threshold) needs
    * before it screens a corpus. Pairs are unordered: both inputs are
    * canonicalized to (least, greatest) and de-duplicated, so a
    * generator emitting (a,b) and (b,a) is not rewarded twice.
    *
    * ENTIRELY exact: tp/fp/fn are BIGINT set counts (one inner join,
    * two anti-join-free subtractions), and the three rates are
    * ·10⁶ integer floor divisions — no doubles. Empty denominators
    * (no predictions / no truth / both empty) report NULL ppm, not a
    * fake 0 or 10⁶.
    *
    * Scale shape: two distinct aggregates on the canonical pair key
    * + one pair-keyed equi-join. Output is ONE row.
    */
  def linkageQuality(predicted: DataFrame, truth: DataFrame,
                     idACol: String = "id_a",
                     idBCol: String = "id_b"): DataFrame = {
    def canon(df: DataFrame) = df
      .filter(col(idACol).isNotNull && col(idBCol).isNotNull &&
        col(idACol) =!= col(idBCol))
      .select(least(col(idACol), col(idBCol)).as("__a"),
        greatest(col(idACol), col(idBCol)).as("__b"))
      .distinct()
    val p = canon(predicted).localCheckpoint(true)
    val t = canon(truth).localCheckpoint(true)
    val np = p.agg(count(lit(1)).cast("long").as("n_pred"))
    val nt = t.agg(count(lit(1)).cast("long").as("n_true"))
    val tp = p.join(t, Seq("__a", "__b"))
      .agg(count(lit(1)).cast("long").as("tp"))
    np.crossJoin(broadcast(nt)).crossJoin(broadcast(tp))
      .select(col("n_pred"), col("n_true"), col("tp"),
        (col("n_pred") - col("tp")).as("fp"),
        (col("n_true") - col("tp")).as("fn"),
        expr("""CASE WHEN n_pred = 0 THEN NULL
          ELSE CAST(CAST(tp AS DECIMAL(19,0)) * 1000000 DIV n_pred
            AS BIGINT) END""").as("precision_ppm"),
        expr("""CASE WHEN n_true = 0 THEN NULL
          ELSE CAST(CAST(tp AS DECIMAL(19,0)) * 1000000 DIV n_true
            AS BIGINT) END""").as("recall_ppm"),
        expr("""CASE WHEN n_pred + n_true = 0 THEN NULL
          ELSE CAST(CAST(tp AS DECIMAL(19,0)) * 2000000
            DIV (n_pred + n_true) AS BIGINT) END""").as("f1_ppm"))
  }

  /** Rank-biased overlap (Webber et al.) between the two arms' top-k
    * rankings, per group — the top-weighted alternative to q311's
    * flat Jaccard: two rankings that agree on the head and scramble
    * the tail score high, which is exactly how a human reads "did
    * the top sellers change?". Truncated at depth k (the residual is
    * not extrapolated — documented), with persistence p:
    *   RBO = (1−p)·Σ_{d=1..k} p^{d−1}·|A_d ∩ B_d|/d.
    *
    * Items rank per (group, arm) by (score desc, item asc) — a
    * rank-limited window Spark plans as WindowGroupLimit, so each
    * map task forwards ≤ k items. The depth sum folds per ITEM: an
    * item at ranks (r_a, r_b) joins every prefix from depth
    * m = max(r_a, r_b) on, so its contribution is the SUFFIX sum
    * S(m) = Σ_{d=m..k} p^{d−1}/d — k constants computed ONCE here
    * and embedded as shortest-roundtrip doubles in both engines (the
    * q306 discipline). Per-item terms pround6 → DECIMAL(18,6), so
    * the sum is exact; the closing (1−p)·Σ is one double, pround6.
    *
    * Exactness of the RANKINGS: scores accumulate as DECIMAL(18,2)
    * sums per (group, arm, item), so rank order is engine-exact.
    * Output: group, `n_a`, `n_b` (items actually ranked, ≤ k),
    * `n_common`, `rbo`. A group missing an arm reports rbo NULL.
    */
  def rbo(df: DataFrame, groupCol: String, armCol: String,
          itemCol: String, scoreCol: String, k: Int = 50,
          p: Double = 0.9): DataFrame = {
    require(k >= 1 && k <= 200, s"k out of range: $k")
    require(p > 0 && p < 1, s"p out of range: $p")
    val spark = df.sparkSession
    import spark.implicits._
    // suffix sums S(m) = sum_{d=m..k} p^(d-1)/d, computed once
    val weights = Array.tabulate(k + 1)(d =>
      if (d == 0) 0.0 else math.pow(p, d - 1) / d)
    val suffix = (1 to k).map(m => (m.toLong,
      (m to k).map(weights).sum))
    val sufDf = broadcast(suffix.toDF("__m", "__sfx"))
    val a = col(armCol).cast("long") =!= 0L
    val scored = df.filter(col(groupCol).isNotNull &&
        col(armCol).isNotNull && col(itemCol).isNotNull &&
        col(scoreCol).isNotNull)
      .groupBy(col(groupCol).as("__g"), a.as("__arm"),
        col(itemCol).as("__i"))
      .agg(sum(col(scoreCol).cast("decimal(18,2)")).as("__sc"))
    val w = Window.partitionBy(col("__g"), col("__arm"))
      .orderBy(col("__sc").desc, col("__i"))
    val ranked = scored
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") <= k)
      .localCheckpoint(true)
    val counts = ranked.groupBy(col("__g"))
      .agg(sum(when(!col("__arm"), 1L).otherwise(0L)).cast("long")
        .as("n_a"),
        sum(when(col("__arm"), 1L).otherwise(0L)).cast("long").as("n_b"))
    val ra = ranked.filter(!col("__arm"))
      .select(col("__g"), col("__i"), col("__r").as("__ra"))
    val rb = ranked.filter(col("__arm"))
      .select(col("__g"), col("__i"), col("__r").as("__rb"))
    val joint = ra.join(rb, Seq("__g", "__i"))
      .withColumn("__m", greatest(col("__ra"), col("__rb")).cast("long"))
      .join(sufDf, Seq("__m"))
      .groupBy(col("__g"))
      .agg(count(lit(1)).cast("long").as("n_common"),
        sum(pround6(col("__sfx")).cast("decimal(18,6)")).as("__ss"))
    counts.join(joint, Seq("__g"), "left")
      .select(col("__g").as(groupCol), col("n_a"), col("n_b"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        when(col("n_a") > 0L && col("n_b") > 0L,
          pround6(lit(1.0 - p) *
            coalesce(col("__ss"), lit(0).cast("decimal(18,6)"))
              .cast("double"))).as("rbo"))
  }

  /** Quantile–quantile shift table per group: the two arms' exact
    * interpolated quantiles side by side at fixed probabilities, with
    * the per-quantile shift — WHERE in the distribution did the
    * treatment move mass? A mean shift (q325's d) can hide a pure
    * tail effect; the QQ table localizes it ("the median moved 2%,
    * the p90 moved 40%" reads very differently from a uniform
    * shift). Probabilities are contract constants (≤ 32, strictly
    * inside (0,1), ascending).
    *
    * Exactness rides the pinned Spark `percentile` ≡ DuckDB
    * `quantile_cont` parity (the q136 precedent): each quantile is
    * one interpolated double over the arm's ordered values, pround6;
    * the shift is the fixed-order difference of the RAW quantiles,
    * pround6. An empty arm reports NULL quantiles/shift with counts
    * intact. NaN values are dropped like NULL (the exactQuantiles
    * convention).
    *
    * Scale shape: ONE hash aggregate (2·|qs| percentile aggregates
    * fold into the same pass), then a |qs|-element inline explode on
    * the one-row-per-group result.
    */
  def qqShift(df: DataFrame, groupCol: String, armCol: String,
              valCol: String, qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.size <= 32, s"need 1..32 qs: ${qs.size}")
    require(qs.forall(q => q > 0 && q < 1) && qs == qs.sorted &&
      qs.distinct.size == qs.size,
      s"qs must be distinct, ascending, inside (0,1): $qs")
    val a = col(armCol).cast("long") =!= 0L
    val agg = df.filter(col(groupCol).isNotNull && col(armCol).isNotNull &&
        col(valCol).isNotNull && !isnan(col(valCol).cast("double")))
      .select(col(groupCol), a.as("__a"),
        col(valCol).cast("double").as("__v"))
      .groupBy(col(groupCol))
      .agg(
        sum(when(!col("__a"), 1L).otherwise(0L)).cast("long").as("n_0"),
        (sum(when(col("__a"), 1L).otherwise(0L)).cast("long").as("n_1") +:
          qs.indices.flatMap(i => Seq(
            expr(s"percentile(CASE WHEN NOT __a THEN __v END, ${qs(i)})")
              .as(s"__p0$i"),
            expr(s"percentile(CASE WHEN __a THEN __v END, ${qs(i)})")
              .as(s"__p1$i")))): _*)
    val rows = qs.indices.map(i => struct(
      lit(qs(i)).as("q"), col(s"__p0$i").as("r0"), col(s"__p1$i").as("r1")))
    agg.select(col(groupCol), col("n_0"), col("n_1"),
        explode(array(rows: _*)).as("__r"))
      .select(col(groupCol), col("__r.q").as("q"), col("n_0"), col("n_1"),
        pround6(col("__r.r0")).as("v0"),
        pround6(col("__r.r1")).as("v1"),
        pround6(col("__r.r1") - col("__r.r0")).as("shift"))
  }

  /** V-measure per group: homogeneity, completeness and their
    * harmonic mean over a (cluster, label) contingency — the
    * entropy-calibrated clustering scorecard ("does each source carry
    * ONE language; does each language live in ONE source?"), the
    * information-theoretic upgrade of q184's purity (which a
    * many-tiny-clusters solution can game; V-measure cannot).
    *   h = 1 − H(label|cluster)/H(label),  c = 1 − H(cluster|label)/
    *   H(cluster),  v = 2hc/(h+c)
    * with the sklearn edge conventions: a zero unconditional entropy
    * (one label, or one cluster) makes the corresponding score 1;
    * h + c = 0 makes v 0.
    *
    * Exactness (labelEntropy discipline): every entropy is a
    * DECIMAL(18,6) sum of per-cell/per-total pround6'd terms over
    * exact BIGINT counts — H(K|C) per cell is (n_ck/N)·log₁₀(a_c/
    * n_ck) with a_c from a (group, cluster)-partitioned window (never
    * a group-wide one); h/c/v are fixed-order doubles over the four
    * exact sums, pround6.
    *
    * Scale shape: ONE (group, cluster, label) hash aggregate is the
    * row-scale pass; everything after runs on contingency-bounded
    * tables (cells ≤ |C|·|L| per group) — two rollups, partitioned
    * windows, and three joins on the group key.
    */
  def vMeasure(df: DataFrame, groupCol: String, clusterCol: String,
               labelCol: String): DataFrame = {
    val cells = df.filter(col(groupCol).isNotNull &&
        col(clusterCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(col(groupCol).as("__g"), col(clusterCol).as("__c"),
        col(labelCol).as("__l"))
      .agg(count(lit(1)).cast("long").as("__n"))
      .localCheckpoint(true)
    val wG = Window.partitionBy(col("__g"))
    val wC = Window.partitionBy(col("__g"), col("__c"))
    val wL = Window.partitionBy(col("__g"), col("__l"))
    val withTot = cells
      .withColumn("__tn", sum(col("__n")).over(wG).cast("long"))
      .withColumn("__ac", sum(col("__n")).over(wC).cast("long"))
      .withColumn("__bl", sum(col("__n")).over(wL).cast("long"))
    def ent(num: Column, den: Column) = pround6(
      (num.cast("double") / col("__tn").cast("double")) *
        log10(den.cast("double") / num.cast("double")))
      .cast("decimal(18,6)")
    // conditional entropies from the cells; unconditional from the
    // per-cluster / per-label DISTINCT rows of the same frame
    val cond = withTot.groupBy(col("__g"))
      .agg(max(col("__tn")).as("n"),
        sum(ent(col("__n"), col("__ac"))).as("__hlc"),
        sum(ent(col("__n"), col("__bl"))).as("__hcl"))
    val hc = withTot.select(col("__g"), col("__c"), col("__ac"),
        col("__tn")).distinct()
      .groupBy(col("__g"))
      .agg(sum(ent(col("__ac"), col("__tn"))).as("__hc"))
    val hl = withTot.select(col("__g"), col("__l"), col("__bl"),
        col("__tn")).distinct()
      .groupBy(col("__g"))
      .agg(sum(ent(col("__bl"), col("__tn"))).as("__hl"))
    val hX = "CASE WHEN CAST(__hl AS DOUBLE) = 0.0 THEN 1.0" +
      " ELSE 1.0 - CAST(__hlc AS DOUBLE) / CAST(__hl AS DOUBLE) END"
    val cX = "CASE WHEN CAST(__hc AS DOUBLE) = 0.0 THEN 1.0" +
      " ELSE 1.0 - CAST(__hcl AS DOUBLE) / CAST(__hc AS DOUBLE) END"
    cond.join(hc, Seq("__g")).join(hl, Seq("__g"))
      .select(col("__g").as(groupCol), col("n"),
        pround6(expr(hX)).as("homogeneity"),
        pround6(expr(cX)).as("completeness"),
        pround6(expr(s"""CASE WHEN ($hX) + ($cX) = 0.0 THEN 0.0
          ELSE 2.0 * ($hX) * ($cX) / (($hX) + ($cX)) END"""))
          .as("v_measure"))
  }

  /** Cronbach's alpha — internal-consistency reliability of k "items"
    * measured per person: alpha = k/(k−1) · (1 − Σ var_i / var_total),
    * with var_i the per-item variance over persons and var_total the
    * variance of per-person totals. The standard gate before trusting
    * a composite score (rater batteries, multi-probe quality panels).
    *
    * Missing (person, item) cells count as 0 — the caller feeds
    * presence-counts or zero-defaulted scores, so every variance runs
    * over the SAME person universe N (persons appearing in the group
    * at all). Moments are exact DECIMAL sums over present cells (zero
    * cells contribute nothing); variances and the closing alpha are
    * p6 doubles. Groups need k >= 2 items and N >= 2 persons;
    * var_total = 0 reports NULL (no signal to be consistent about).
    *
    * Scale shape: two hash aggregates (per person, per item) and a
    * broadcast one-row-per-group totals attach — no wide pivot.
    *
    * Output: group, n_persons, k_items, alpha.
    */
  def cronbachAlpha(df: DataFrame, groupCol: String, personCol: String,
                    itemCol: String, valCol: String): DataFrame = {
    def p6(c: Column) = graft.functions.Rounding.p6(c)
    val base = df
      .filter(col(groupCol).isNotNull && col(personCol).isNotNull &&
        col(itemCol).isNotNull && col(valCol).isNotNull)
      .select(col(groupCol).as("__g"), col(personCol).as("__p"),
        col(itemCol).as("__i"), col(valCol).cast("decimal(18,2)").as("__x"))
    val perPerson = base.groupBy(col("__g"), col("__p"))
      .agg(sum(col("__x")).cast("decimal(38,2)").as("__t"))
    val gTot = perPerson.groupBy(col("__g"))
      .agg(count(lit(1)).cast("long").as("n_persons"),
        sum(col("__t")).cast("decimal(38,2)").as("__st"),
        sum((col("__t").cast("decimal(19,2)") *
          col("__t").cast("decimal(19,2)")).cast("decimal(38,4)"))
          .cast("decimal(38,4)").as("__qt"))
    val perItem = base.groupBy(col("__g"), col("__i"))
      .agg(sum(col("__x")).cast("decimal(38,2)").as("__si"),
        sum((col("__x").cast("decimal(19,2)") *
          col("__x").cast("decimal(19,2)")).cast("decimal(38,4)"))
          .cast("decimal(38,4)").as("__qi"))
    val nD = col("n_persons").cast("double")
    val itemVars = perItem
      .join(broadcast(gTot), Seq("__g"))
      .withColumn("__vi6", p6(
        (col("__qi").cast("double") -
          col("__si").cast("double") * col("__si").cast("double") / nD) /
          (nD - 1.0)))
      .groupBy(col("__g"))
      .agg(count(lit(1)).cast("long").as("k_items"),
        max(col("n_persons")).as("n_persons"),
        max(col("__st")).as("__st"), max(col("__qt")).as("__qt"),
        sum(col("__vi6").cast("decimal(18,6)")).cast("decimal(38,6)")
          .as("__sv"))
    itemVars
      .filter(col("k_items") >= 2L && col("n_persons") >= 2L)
      .withColumn("__vt6", p6(
        (col("__qt").cast("double") -
          col("__st").cast("double") * col("__st").cast("double") / nD) /
          (nD - 1.0)))
      .select(col("__g").as(groupCol), col("n_persons"), col("k_items"),
        when(col("__vt6") > 0.0, p6(
          col("k_items").cast("double") /
            (col("k_items").cast("double") - 1.0) *
            (lit(1.0) - col("__sv").cast("double") / col("__vt6"))))
          .as("alpha"))
  }

  /** Linear-weighted Cohen's kappa for two ORDINAL labelings on the
    * same rows: disagreement weights w_ij = |i−j|/(R−1) make a
    * one-step disagreement cheap and an R-step one maximal — the
    * ordinal upgrade of [[cohensKappa]]'s all-or-nothing view. With
    * integer labels in [0, maxLevel],
    *   κ_w = 1 − N·Σ|i−j|·n_ij / Σ|i−j|·r_i·c_j
    * — both operands exact DECIMAL(38,0) (the weight denominators
    * R−1 and N² cancel), so the statistic is ONE p6 division. Labels
    * outside the range raise (the kruskalWallis bucketing contract);
    * a zero expected-disagreement (a constant labeling) reports NULL.
    *
    * Scale shape: one hash aggregate to the (a, b) grid (≤ (R+1)²
    * cells per group), margins fold from it, one ≤(R+1)²-row margin
    * join per group.
    *
    * Output: group, n, n_agree, kappa_w.
    */
  def weightedKappa(df: DataFrame, groupCol: String, aCol: String,
                    bCol: String, maxLevel: Int): DataFrame = {
    require(maxLevel >= 1 && maxLevel <= 32,
      s"maxLevel must be in [1,32]: $maxLevel")
    def p6(c: Column) = graft.functions.Rounding.p6(c)
    def guarded(c: String) = {
      val v = col(c).cast("long")
      when(v.between(0L, maxLevel.toLong), v)
        .otherwise(expr(s"CAST(raise_error('Metrics.weightedKappa: label " +
          s"outside [0,$maxLevel] — bucket the label columns first') " +
          "AS BIGINT)"))
    }
    val cells = df
      .filter(col(groupCol).isNotNull && col(aCol).isNotNull &&
        col(bCol).isNotNull)
      .select(col(groupCol).as("__g"), guarded(aCol).as("__a"),
        guarded(bCol).as("__b"))
      .groupBy(col("__g"), col("__a"), col("__b"))
      .agg(count(lit(1)).cast("long").as("__c"))
      .localCheckpoint(true)
    val obs = cells.groupBy(col("__g"))
      .agg(sum(col("__c")).cast("decimal(38,0)").as("n"),
        sum(when(col("__a") === col("__b"), col("__c")).otherwise(0L))
          .cast("long").as("n_agree"),
        sum(abs(col("__a") - col("__b")).cast("decimal(38,0)") *
          col("__c")).cast("decimal(38,0)").as("__od"))
    val ra = cells.groupBy(col("__g"), col("__a"))
      .agg(sum(col("__c")).cast("decimal(38,0)").as("__ri"))
    val cb = cells.groupBy(col("__g"), col("__b"))
      .agg(sum(col("__c")).cast("decimal(38,0)").as("__cj"))
    val exp = ra.join(cb, Seq("__g"))
      .select(col("__g"),
        (abs(col("__a") - col("__b")).cast("decimal(38,0)") *
          col("__ri") * col("__cj")).as("__e"))
      .groupBy(col("__g"))
      .agg(sum(col("__e")).cast("decimal(38,0)").as("__ed"))
    obs.join(exp, Seq("__g"))
      .select(col("__g").as(groupCol), col("n").cast("long").as("n"),
        col("n_agree"),
        when(col("__ed") > 0,
          p6(lit(1.0) - col("n").cast("double") *
            col("__od").cast("double") / col("__ed").cast("double")))
          .as("kappa_w"))
  }

  /** Kendall's coefficient of concordance W: do m raters rank the
    * same n items the same way? Ranks per rater come from the item's
    * per-rater score (midranks for ties, kept integral DOUBLED —
    * the [[graft.operators.SeriesTests.pettitt]] device), rank sums
    * fold per item, and the tie-corrected Legendre form closes it:
    *   W = (3·ΣR2² − 3·m²·n·(n+1)²) / (m²·n·(n²−1) − m·ΣT)
    * with R2 the doubled rank sums and T = Σ(t³−t) per rater — every
    * operand an exact DECIMAL(38,0). Only items scored by ALL m
    * raters rank (a partial grid has no common ranking to agree on);
    * the degenerate all-tied denominator reports NULL.
    *
    * Output: group, m_raters, n_items, w.
    */
  def kendallsW(df: DataFrame, groupCol: String, raterCol: String,
                itemCol: String, scoreCol: String): DataFrame = {
    def p6(c: Column) = graft.functions.Rounding.p6(c)
    val base = df
      .filter(col(groupCol).isNotNull && col(raterCol).isNotNull &&
        col(itemCol).isNotNull && col(scoreCol).isNotNull)
      .select(col(groupCol).as("__g"), col(raterCol).as("__r"),
        col(itemCol).as("__i"),
        col(scoreCol).cast("decimal(18,2)").as("__s"))
      .groupBy(col("__g"), col("__r"), col("__i"))
      .agg(sum(col("__s")).cast("decimal(38,2)").as("__sc"))
    val wAll = Window.partitionBy(col("__g"))
    val mPer = base.select(col("__g"), col("__r")).distinct()
      .withColumn("__m", count(lit(1)).over(wAll))
    val m = mPer.select(col("__g"), col("__m")).distinct()
    // common items only: scored by every rater
    val common = base.groupBy(col("__g"), col("__i"))
      .agg(count(lit(1)).cast("long").as("__nr"))
      .join(m, Seq("__g"))
      .where(col("__nr") === col("__m"))
      .select(col("__g"), col("__i"))
    val kept = base.join(common, Seq("__g", "__i"))
      .localCheckpoint(true)
    val wVal = Window.partitionBy(col("__g"), col("__r"))
      .orderBy(col("__sc"))
    val wEq = Window.partitionBy(col("__g"), col("__r"), col("__sc"))
    val ranked = kept
      .withColumn("__mid2",
        lit(2L) * rank().over(wVal).cast("long") +
          count(lit(1)).over(wEq).cast("long") - 1L)
    val r2 = ranked.groupBy(col("__g"), col("__i"))
      .agg(sum(col("__mid2")).cast("decimal(38,0)").as("__r2"))
      .groupBy(col("__g"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("nI"),
        sum(col("__r2") * col("__r2")).cast("decimal(38,0)").as("__sr2"))
    val ties = ranked.groupBy(col("__g"), col("__r"), col("__sc"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("__t"))
      .groupBy(col("__g"))
      .agg(sum(col("__t") * col("__t") * col("__t") - col("__t"))
        .cast("decimal(38,0)").as("__tt"))
    val d1 = lit(1L)
    r2.join(ties, Seq("__g")).join(m, Seq("__g"))
      .withColumn("__md", col("__m").cast("decimal(38,0)"))
      .withColumn("__num",
        lit(3L) * col("__sr2") -
          lit(3L) * col("__md") * col("__md") * col("nI") *
            (col("nI") + d1) * (col("nI") + d1))
      .withColumn("__den",
        col("__md") * col("__md") * col("nI") *
          (col("nI") * col("nI") - d1) - col("__md") * col("__tt"))
      .select(col("__g").as(groupCol),
        col("__m").cast("long").as("m_raters"),
        col("nI").cast("long").as("n_items"),
        when(col("__den") > 0,
          p6(col("__num").cast("double") / col("__den").cast("double")))
          .as("w"))
  }
}
