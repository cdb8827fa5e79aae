package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-document salient-term extraction by tf-idf — the corpus-level
  * text statistic a curation pipeline uses for topic profiling, quality
  * features, and domain classification inputs.
  *
  * Shape, deliberately: tokenize/explode in the scan projection; term
  * frequencies are one hash aggregation on (doc, term); document
  * frequencies come from a doc-distinct token explode aggregated per
  * term, SHUFFLE-JOINED back on term; the corpus size joins in as a
  * broadcast one-row aggregate (declarative — no driver `count()`
  * action); and the per-doc top-k is a rank-limited window, which
  * Spark plans as `WindowGroupLimit` so each map task forwards at
  * most k terms per doc.
  *
  * Why a join for df and not a count window over the tf frame (which
  * would save the df aggregate's corpus pass): term frequency is the
  * most skewed distribution in this engine — a ubiquitous token sits
  * in essentially every document, and `count().over(partitionBy(term))`
  * funnels ALL of its (doc, term) rows into ONE window partition, an
  * unsplittable straggler at web-corpus scale (Spark windows have no
  * skew mitigation). The equi-join formulation shuffles on the same
  * key but AQE's OptimizeSkewedJoin splits oversized join partitions
  * at runtime, and the df aggregate itself dilutes the skew map-side
  * (partial counts combine before the term shuffle). A second pass
  * over the corpus is a bounded, parallel cost; a hot-key straggler
  * is not.
  *
  * The idf is the SMOOTHED RATIONAL variant (N+1)/(df+1) rather than
  * its logarithm: log is monotone, so per-doc rankings are identical,
  * and plain IEEE division is bit-reproducible across engines while
  * libm `ln` implementations can differ one ulp — which matters
  * because the q77 oracle hash-compares scores to 4 decimals.
  */
object TfIdf {

  /** Top-`k` terms per document with their (rational-idf) tf-idf score.
    * Output: idCol, `term`, `tf`, `df`, `score` — ties broken by term
    * ascending so results are deterministic.
    */
  def topTerms(docs: DataFrame, textCol: String, idCol: String,
               k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val terms = docs.select(col(idCol),
      explode(TextFns.tokens(col(textCol))).as("term"))
    val tf = terms.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    // df from a doc-distinct explode: one long per (doc, term) reaches
    // the term shuffle, combined map-side
    val dfByTerm = docs.select(
        explode(array_distinct(TextFns.tokens(col(textCol)))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("__n"))
    val scored = tf
      .join(dfByTerm, Seq("term"))
      .join(broadcast(n))
      .withColumn("score",
        col("tf") * (col("__n") + 1.0) / (col("df") + 1.0))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("term"))
    scored
      .withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"), col("score"))
  }

  /** Vocabulary coverage: take the corpus' top-`vocabSize` terms by
    * frequency (ties by term ascending, so the cut is deterministic)
    * and report each document's out-of-vocabulary token count and
    * rate — the metric that sizes a tokenizer's vocab against a
    * corpus before training. Documents with no tokens produce no row
    * (there is nothing to rate).
    *
    * The global top-V is `orderBy(...).limit(V)` — Spark plans
    * `TakeOrderedAndProject` (per-partition top-V, merged at the
    * driver), never a single-partition sort — and the vocab then
    * BROADCASTS into the token join, so the corpus-sized side shuffles
    * only for the final per-doc aggregate.
    */
  def oovRates(docs: DataFrame, textCol: String, idCol: String,
               vocabSize: Int): DataFrame = {
    require(vocabSize > 0, s"vocabSize must be positive: $vocabSize")
    val terms = docs.select(col(idCol),
      explode(TextFns.tokens(col(textCol))).as("term"))
    val vocab = terms.groupBy(col("term")).agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("term"))
      .limit(vocabSize)
      .select(col("term"), lit(1).as("__in_vocab"))
    terms
      .join(broadcast(vocab), Seq("term"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate", col("n_oov") * 1.0 / col("n_tokens"))
  }

  /** Vocabulary drift between two corpus snapshots (yesterday's crawl
    * vs today's, train vs incoming): the `k` terms whose share of the
    * token mass moved most. This is the distribution-shift monitor a
    * continuously-ingesting pipeline alarms on — a sudden share spike
    * for boilerplate/navigation tokens is how template pollution and
    * scraper loops show up before any quality gate catches them.
    *
    * Two map-side-combined count tables (each bounded by vocabulary),
    * full-outer-joined on term with absent terms at share 0; totals
    * attach as one-row broadcast aggregates; the top-k cut
    * (|delta| desc, term asc) plans as TakeOrderedAndProject.
    */
  def vocabDrift(a: DataFrame, b: DataFrame, textCol: String,
                 k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    def counts(df: DataFrame, cn: String) = df
      .select(explode(TextFns.tokens(col(textCol))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as(cn))
    val ca = counts(a, "__ca")
    val cb = counts(b, "__cb")
    val ta = ca.agg(sum(col("__ca")).as("__ta"))
    val tb = cb.agg(sum(col("__cb")).as("__tb"))
    ca.join(cb, Seq("term"), "full_outer")
      .join(broadcast(ta)).join(broadcast(tb))
      .withColumn("share_a",
        coalesce(col("__ca"), lit(0L)).cast("double") / col("__ta"))
      .withColumn("share_b",
        coalesce(col("__cb"), lit(0L)).cast("double") / col("__tb"))
      .withColumn("delta", col("share_b") - col("share_a"))
      .orderBy(abs(col("delta")).desc, col("term").asc)
      .limit(k)
      .select(col("term"), col("share_a"), col("share_b"), col("delta"))
  }

  /** Unigram-LM document fluency score (the CCNet/KenLM perplexity
    * filter's self-contained stand-in): each document scored by the
    * mean log10 corpus frequency of its tokens — rare and garbage
    * vocabulary drags the mean down, so ranking by `lm_score`
    * separates in-distribution text from noise exactly the way the
    * perplexity filter does, without shipping a pretrained model.
    * Real pipelines swap the corpus-derived count table for KenLM
    * n-gram counts; the operator shape is identical.
    *
    * Shape: the count table is a map-side-combined aggregate; scoring
    * re-joins it on the term SHUFFLE-join (not a count window — the
    * ubiquitous-token hot key would pin a window partition; AQE splits
    * an oversized join partition but cannot split a window key, same
    * analysis as `topTerms`' df join), then one per-doc aggregate.
    * Docs with no tokens produce no row.
    */
  def lmScore(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val terms = docs.select(col(idCol),
      explode(TextFns.tokens(col(textCol))).as("term"))
    val counts = terms.groupBy(col("term")).agg(count(lit(1)).as("__c"))
    terms
      .join(counts, Seq("term"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        avg(log10(col("__c"))).as("lm_score"))
  }

  /** Per-group token-concentration card: total tokens, distinct types,
    * type-token ratio, and the share of all tokens taken by the top-`k`
    * most frequent types (ties broken by term ascending, so the cut is
    * deterministic). A collapsed head (high top-k share, low TTR) flags
    * templated or machine-generated sources; a healthy natural-language
    * source sits near the Zipf profile. The ratios are RATIONAL in the
    * counts — no log-log slope fit — so they cross-engine hash-match
    * (the q120 oracle contract; libm `ln` would not).
    *
    * Shape: one (group, term) hash aggregate with map-side partial
    * combine absorbs the corpus explode; the top-k is a rank-limited
    * window over that aggregate — per-group DISTINCT-TYPE rows, which
    * is vocabulary-bounded (not corpus-bounded) and plans as
    * `WindowGroupLimit`, so each map task forwards at most k types per
    * group before the window shuffle. Groups whose documents have no
    * tokens produce no row.
    */
  /** Exact per-group heavy hitters: the terms holding at least
    * `minShareBp` basis points (1/10000ths) of a group's token volume.
    * The share test is the integer cross-multiplication
    * cnt * 10000 >= total * minShareBp — no double division anywhere,
    * so the hitter SET is engine-exact. Two hash aggregates plus a
    * broadcast of the one-row-per-group totals; nothing is ordered, so
    * there is no window at any group size (the heavy-hitter question
    * at 100 TB is a filter, not a sort).
    */
  def heavyHitters(docs: DataFrame, textCol: String, groupCol: String,
                   minShareBp: Long): DataFrame = {
    require(minShareBp > 0 && minShareBp <= 10000,
      s"minShareBp must be in (0,10000]: $minShareBp")
    val cnt = docs
      .select(col(groupCol), explode(TextFns.tokens(col(textCol))).as("term"))
      .groupBy(col(groupCol), col("term"))
      .agg(count(lit(1)).as("cnt"))
    val totals = cnt.groupBy(col(groupCol))
      .agg(sum("cnt").cast("long").as("total"))
    cnt.join(broadcast(totals), Seq(groupCol))
      .filter(col("cnt") * 10000L >= col("total") * minShareBp)
      .select(col(groupCol), col("term"), col("cnt"), col("total"),
        call_function("div", col("cnt") * 10000L, col("total")).as("share_bp"))
  }

  /** Bigram-LM fluency score — `lmScore`'s conditional upgrade: mean
    * log10 of Laplace-smoothed bigram probabilities
    * P(b|a) = (c(a,b)+1)/(c(a·)+V) over each doc's token sequence.
    * Repetitive or formulaic text scores high, token-salad low — the
    * perplexity-filter stand-in with actual sequence structure.
    *
    * Exactness follows q90's discipline: probabilities are RATIOS OF
    * EXACT INTEGER COUNTS (one IEEE division each), log10 is the only
    * libm call, and the per-doc mean rounds to 4 places downstream.
    * V is the corpus unigram vocabulary (+V smoothing mass).
    *
    * Scale shape: bigrams come from a lead() window partitioned per
    * doc (millions of tiny partitions, no skew); c(a,b) and c(a·) are
    * hash aggregates re-joined on their keys — equi-joins that AQE
    * skew-splits where a hot bigram would pile up (the same argument
    * as `topTerms`' df join); V attaches as a broadcast one-row
    * aggregate. Docs with fewer than two tokens are absent (no
    * bigrams — inner semantics).
    */
  def lmScore2(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("doc"),
      posexplode(TextFns.tokens(col(textCol))).as(Seq("pos", "tok")))
    val w = Window.partitionBy(col("doc")).orderBy(col("pos"))
    val big = toks
      .withColumn("__b", lead(col("tok"), 1).over(w))
      .filter(col("__b").isNotNull)
      .select(col("doc"), col("tok").as("ta"), col("__b").as("tb"))
    val c2 = big.groupBy(col("ta"), col("tb"))
      .agg(count(lit(1)).cast("long").as("__c2"))
    val c1 = big.groupBy(col("ta"))
      .agg(count(lit(1)).cast("long").as("__c1"))
    val v = toks.agg(countDistinct(col("tok")).cast("long").as("__v"))
    big.join(c2, Seq("ta", "tb")).join(c1, Seq("ta"))
      .crossJoin(broadcast(v))
      .groupBy(col("doc"))
      .agg(count(lit(1)).cast("long").as("n_bigrams"),
        avg(log10((col("__c2") + 1L).cast("double") /
          (col("__c1") + col("__v")).cast("double"))).as("lm2_score"))
  }

  /** Top-k token pairs by pointwise mutual information over document
    * co-occurrence — the collocation/topic-signal table ("strongly
    * associated term pairs") of classic corpus analytics.
    *
    * Counts are document-level: c_a = docs containing a, c_ab = docs
    * containing both. PMI = log10(N*c_ab / (c_a*c_b)). Ranking uses
    * the RAW RATIONAL ratio N*c_ab/(c_a*c_b) — monotone with PMI and
    * a single IEEE division of exactly-representable integers (bit-
    * reproducible across engines, N*c_ab < 2^53 by the minDf bound),
    * where libm log10 could differ one ulp at the kth-rank boundary.
    * log10 appears only in the DISPLAYED column, rounded to 4 places.
    *
    * Scale shape: pair generation is a doc_id self-equi-join of the
    * per-doc distinct-token explode — O(rows x tokensPerDoc^2) pair
    * instances, bounded by upstream chunking (q72) which caps tokens
    * per doc; never a token-postings join (whose hot frequent-token
    * buckets are quadratic in CORPUS size, not doc size). minDf
    * filters the noise floor BEFORE the self-join, and the corpus size
    * joins in as a broadcast one-row aggregate, as `topTerms` does.
    * The final top-k is a global orderBy+limit = TakeOrderedAndProject
    * (each task forwards at most k rows; no single-partition sort).
    */
  def pmiPairs(docs: DataFrame, textCol: String, idCol: String,
               minDf: Int, k: Int): DataFrame = {
    require(minDf >= 2, s"minDf must be >= 2: $minDf")
    require(k > 0, s"k must be positive: $k")
    val tok = docs.select(col(idCol).as("doc"),
      explode(array_distinct(TextFns.tokens(col(textCol)))).as("term"))
    val dfc = tok.groupBy(col("term"))
      .agg(count(lit(1)).cast("long").as("df"))
      .filter(col("df") >= minDf)
    val kept = tok.join(dfc, "term")
    val n = docs.agg(countDistinct(col(idCol)).cast("long").as("n_docs"))
    val pairs = kept.select(col("doc"), col("term").as("term_a"), col("df").as("df_a"))
      .join(kept.select(col("doc"), col("term").as("term_b"), col("df").as("df_b")),
        Seq("doc"))
      .filter(col("term_a") < col("term_b"))
      .groupBy(col("term_a"), col("term_b"))
      .agg(count(lit(1)).cast("long").as("n_both"),
        max(col("df_a")).as("df_a"), max(col("df_b")).as("df_b"))
    pairs.crossJoin(broadcast(n))
      .withColumn("__ratio",
        (col("n_both") * col("n_docs")).cast("double") /
          (col("df_a") * col("df_b")).cast("double"))
      .orderBy(col("__ratio").desc, col("term_a"), col("term_b"))
      .limit(k)
      .select(col("term_a"), col("term_b"), col("n_both"),
        log10(col("__ratio")).as("pmi"))
  }

  /** Distinct-n diversity ratios per group — the synthetic-data
    * diversity audit (Li et al.'s distinct-1/2/3): of all n-gram
    * POSITIONS a group's docs contain, what fraction are distinct
    * n-grams? Mode-collapsed or templated sources score low while
    * natural text stays high, and the ratio is comparable across
    * groups of different sizes only as a set — report it per n so the
    * reader sees the decay curve. Ratios are INTEGER BASIS POINTS by
    * floor division: engine-exact.
    *
    * Scale shape: the POSITION total has a closed form — Σ max(len −
    * n + 1, 0) over per-doc token counts, one scan aggregate with no
    * gram explode at all — and the distinct count explodes only each
    * doc's DISTINCT shingle set (the native `DistinctWordShingles`
    * one-pass expression), which is strictly smaller than the
    * position stream. One tiny per-group join reunites them.
    */
  def distinctNgramRatios(docs: DataFrame, textCol: String,
                          groupCol: String, maxN: Int): DataFrame = {
    require(maxN >= 1, s"maxN must be >= 1: $maxN")
    val nTok = TextFns.wsTokenCount(col(textCol))
    val perN = (1 to maxN).map { n =>
      val totals = docs.groupBy(col(groupCol))
        .agg(sum(greatest(nTok - (n - 1), lit(0L))).cast("long").as("total"))
      val distinct = docs.select(col(groupCol),
          explode(graft.expressions.GraftFunctions
            .distinctWordShingles(col(textCol), n)).as("g"))
        .groupBy(col(groupCol))
        .agg(countDistinct(col("g")).cast("long").as("n_distinct"))
      totals.join(distinct, Seq(groupCol), "left")
        .withColumn("n_distinct", coalesce(col("n_distinct"), lit(0L)))
        .withColumn("n", lit(n.toLong))
    }
    perN.reduce(_ unionByName _)
      .select(col(groupCol), col("n"), col("total"), col("n_distinct"),
        call_function("div", col("n_distinct") * 10000L,
          greatest(col("total"), lit(1L))).as("distinct_bp"))
  }

  def tokenConcentration(docs: DataFrame, textCol: String,
                         groupCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val cnt = docs
      .select(col(groupCol), explode(TextFns.tokens(col(textCol))).as("term"))
      .groupBy(col(groupCol), col("term"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("cnt").desc, col("term"))
    val top = cnt
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .groupBy(col(groupCol))
      .agg(sum("cnt").cast("long").as("__top"))
    cnt.groupBy(col(groupCol))
      .agg(sum("cnt").cast("long").as("n_tokens"),
        count(lit(1)).cast("long").as("n_types"))
      .join(top, Seq(groupCol), "left")
      .select(col(groupCol),
        col("n_tokens"), col("n_types"),
        (col("n_types").cast("double") / col("n_tokens")).as("ttr"),
        (coalesce(col("__top"), lit(0L)).cast("double") / col("n_tokens"))
          .as("top_share"))
  }

  /** Per-group vocabulary frequency spectrum: types and token mass per
    * power-of-two frequency class (class = floor(log2 count), so
    * hapax legomena are class 0) — the Zipf-tail card. A natural
    * corpus puts roughly half its TYPES in class 0 while the MASS
    * concentrates in the top classes; a templated/synthetic source
    * shows a hollowed-out tail, and a boilerplate-heavy one an
    * overweight head. Read next to `tokenConcentration` (one-number
    * summary) and `distinctNgramRatios` (n-gram diversity).
    *
    * Exactness/scale: two hash aggregates — (group, term) counts, then
    * (group, class) rollup; the class is `len(bin(c))-1`, INTEGER on
    * both engines (the q146 primitive); no windows, no joins; output
    * is groups × ≤ 64 classes.
    */
  def freqSpectrum(docs: DataFrame, textCol: String,
                   groupCol: String): DataFrame = {
    val cnt = docs
      .select(col(groupCol), explode(TextFns.tokens(col(textCol))).as("term"))
      .groupBy(col(groupCol), col("term"))
      .agg(count(lit(1)).cast("long").as("__c"))
    cnt
      .withColumn("freq_class", (length(bin(col("__c"))) - 1).cast("long"))
      .groupBy(col(groupCol), col("freq_class"))
      .agg(count(lit(1)).cast("long").as("n_types"),
        sum(col("__c")).cast("long").as("token_mass"))
  }

  /** Zipf-law fit over the top-K term frequencies: ordinary least
    * squares on (ln rank, ln count) — the slope is the Zipf exponent
    * (natural corpora sit near −1; a flat slope flags synthetic or
    * templated text, a cliff flags boilerplate domination). The
    * quantitative regression companion to `freqSpectrum`'s qualitative
    * histogram. One row out: `n_terms`, `slope`, `intercept`, `r2`.
    *
    * Rank is exact and engine-replayable: the top-K cut and the rank
    * both use (count desc, term asc). The rank itself is computed
    * WITHOUT any single-partition window: the K-row top table (a
    * distributed TakeOrdered, checkpointed — K is a contract constant)
    * self-joins under the order predicate via broadcast, so rank =
    * 1 + #rows-before. K² broadcast-loop pairs at K ≤ 10⁴ is driver
    * noise; the corpus-scale work is exactly one token count.
    *
    * OLS exactness is the q146 discipline: x = pround6(ln rank),
    * y = pround6(ln count), and the five sums Σx, Σy, Σx², Σxy, Σy²
    * accumulate pround6'd products as DECIMAL(18,6); slope/intercept/r²
    * are ONE fixed-order double expression over those exact sums,
    * rounded to 6 places — the DuckDB oracle mirrors every step.
    */
  def zipfFit(docs: DataFrame, textCol: String, topK: Int = 100): DataFrame = {
    require(topK >= 3 && topK <= 10000, s"topK out of range: $topK")
    val counts = docs
      .select(explode(TextFns.tokens(col(textCol))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).cast("long").as("cnt"))
    val top = counts.orderBy(col("cnt").desc, col("term")).limit(topK)
      .localCheckpoint(true)
    val o = broadcast(top.select(col("cnt").as("__c2"), col("term").as("__t2")))
    val ranked = top.join(o,
        col("__c2") > col("cnt") ||
          (col("__c2") === col("cnt") && col("__t2") < col("term")), "left")
      .groupBy(col("term"), col("cnt"))
      .agg(count(col("__t2")).cast("long").as("__before"))
      .withColumn("rank", col("__before") + 1L)
    def p6(c: org.apache.spark.sql.Column) = graft.functions.Rounding.p6(c)
    val xd = p6(log(col("rank").cast("double")))
    val yd = p6(log(col("cnt").cast("double")))
    val sums = ranked.agg(
      count(lit(1)).cast("long").as("n_terms"),
      sum(xd.cast("decimal(18,6)")).as("__sx"),
      sum(yd.cast("decimal(18,6)")).as("__sy"),
      sum(p6(xd * xd).cast("decimal(18,6)")).as("__sxx"),
      sum(p6(xd * yd).cast("decimal(18,6)")).as("__sxy"),
      sum(p6(yd * yd).cast("decimal(18,6)")).as("__syy"))
    val nd = col("n_terms").cast("double")
    val sx = col("__sx").cast("double"); val sy = col("__sy").cast("double")
    val sxx = col("__sxx").cast("double"); val sxy = col("__sxy").cast("double")
    val syy = col("__syy").cast("double")
    val num = nd * sxy - sx * sy
    val den = nd * sxx - sx * sx
    val dy = nd * syy - sy * sy
    // degenerate fits (zero x- or y-variance — e.g. all top-K counts
    // equal) report NULL, the rankAuc undefined convention, instead of
    // letting a /0 leak NaN/Infinity into the output
    sums.select(col("n_terms"),
      when(den =!= 0.0, p6(num / den)).as("slope"),
      when(den =!= 0.0, p6((sy - (num / den) * sx) / nd)).as("intercept"),
      when(den =!= 0.0 && dy =!= 0.0, p6((num * num) / (den * dy)))
        .as("r2"))
  }

  /** Per-group vocabulary-richness card — the "how much vocabulary is
    * this source still hiding?" estimate a corpus-mixing plan reads
    * before upweighting a source. Per group: token count N, observed
    * type count V, singleton/doubleton spectrum counts f1/f2, and four
    * standard richness/diversity estimates over the term-frequency
    * distribution:
    *   - `chao1` = V + f1(f1−1)/(2(f2+1)) — bias-corrected Chao1 lower
    *     bound on TRUE vocabulary size;
    *   - `coverage` = 1 − f1/N — Good–Turing sample coverage (the mass
    *     NOT in unseen types; low coverage = sampling more will keep
    *     finding new words);
    *   - `simpson` = Σc(c−1)/(N(N−1)) — repeat-probability
    *     (concentration; 1/simpson is an effective vocab size);
    *   - `shannon` = Σ(c/N)·log₁₀(N/c) — the labelEntropy discipline:
    *     each term's contribution is ONE fixed-order double over exact
    *     BIGINT counts, pround6, summed as DECIMAL(18,6).
    *
    * Exactness: N, V, f1, f2 are BIGINT; Σc(c−1) accumulates as
    * DECIMAL(38,0) (cast BEFORE the multiply); chao1/coverage/simpson
    * are single fixed-order double expressions over those exact
    * integers, pround6. Groups need N ≥ 2 for simpson (else NULL);
    * f2 = 0 is handled by Chao1's +1 smoothing.
    *
    * Scale shape: one (group, term) hash aggregate off the tokenize
    * projection, one group rollup, and one broadcast totals join back
    * onto the term counts for the entropy pass — no windows, no skewed
    * window partitions (same rationale as [[topTerms]]'s df join).
    */
  def vocabRichness(docs: DataFrame, textCol: String,
                    groupCol: String): DataFrame = {
    def p6(c: org.apache.spark.sql.Column) = graft.functions.Rounding.p6(c)
    val cnt = docs.filter(col(groupCol).isNotNull)
      .select(col(groupCol), explode(TextFns.tokens(col(textCol))).as("term"))
      .groupBy(col(groupCol), col("term"))
      .agg(count(lit(1)).cast("long").as("__c"))
    val tot = cnt.groupBy(col(groupCol))
      .agg(sum(col("__c")).cast("long").as("n_tokens"),
        count(lit(1)).cast("long").as("n_types"),
        sum(when(col("__c") === 1L, 1L).otherwise(0L)).cast("long").as("f1"),
        sum(when(col("__c") === 2L, 1L).otherwise(0L)).cast("long").as("f2"),
        sum(col("__c").cast("decimal(38,0)") * (col("__c") - lit(1L)))
          .as("__m2"))
    val contrib =
      (col("__c").cast("double") / col("n_tokens").cast("double")) *
        log10(col("n_tokens").cast("double") / col("__c").cast("double"))
    val shannon = cnt
      .join(broadcast(tot.select(col(groupCol), col("n_tokens"))),
        Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(sum(p6(contrib).cast("decimal(18,6)")).cast("decimal(38,6)")
        .as("__h"))
    tot.join(shannon, Seq(groupCol))
      .select(col(groupCol), col("n_tokens"), col("n_types"),
        col("f1"), col("f2"),
        p6(col("n_types").cast("double") +
          col("f1").cast("double") * (col("f1") - lit(1L)).cast("double") /
            (lit(2L) * (col("f2") + lit(1L))).cast("double")).as("chao1"),
        p6(lit(1.0) -
          col("f1").cast("double") / col("n_tokens").cast("double"))
          .as("coverage"),
        when(col("n_tokens") >= 2L,
          p6(col("__m2").cast("double") /
            (col("n_tokens").cast("double") *
              (col("n_tokens") - lit(1L)).cast("double")))).as("simpson"),
        col("__h").cast("double").as("shannon"))
  }

  /** Burrows' Delta between every pair of groups: the classic
    * stylometry distance — z-score each group's relative frequency of
    * the corpus's top-K words (function words dominate that list, and
    * function-word profiles are the closest thing text has to a
    * fingerprint), then average the absolute z-gaps over the K words.
    * Low delta = same "voice" (same template, same scraper, same
    * author) — the source-level companion to near-dup detection,
    * which only sees COPIED text, where Delta sees shared STYLE.
    *
    * Exactness: the canonical per-(group, word) feature is
    * pround6(count/group_tokens) as DECIMAL(18,6); per-word mean/σ
    * across groups use exact decimal sums of those features (squares
    * of 6-dp values are exact in double and stored DECIMAL(38,12));
    * z is one fixed-order double, pround6 → DECIMAL(18,6), so the
    * pairwise |z_a − z_b| sums are EXACT decimal arithmetic and only
    * the closing /K is a rounded double. A word with σ = 0
    * contributes z = 0 for every group (no discriminating power).
    * Missing (group, word) cells count as frequency 0 — the full
    * G×K grid is materialized (nature-bounded; `maxGroups` is
    * enforced with a driver-side count before the grid builds).
    *
    * Scale shape: one (group, term) hash aggregate is the row-scale
    * pass; the top-K cut is a distributed TakeOrdered; everything
    * after runs on G·K-bounded tables (grid ≤ maxGroups·topK, pair
    * table ≤ G²·K).
    */
  def burrowsDelta(docs: DataFrame, textCol: String, groupCol: String,
                   topK: Int = 50, maxGroups: Int = 64): DataFrame = {
    def p6(c: org.apache.spark.sql.Column) = graft.functions.Rounding.p6(c)
    val grid = freqGrid(docs, textCol, groupCol, topK, maxGroups,
      "burrowsDelta")
    val stats = freqStats(grid)
    val z = grid.join(broadcast(stats), Seq("__t"))
      .withColumn("__z", p6(expr(s"""CASE WHEN $sigSql <= 0.0 THEN 0.0
        ELSE (CAST(__f AS DOUBLE) - $muSql) / ($sigSql) END"""))
        .cast("decimal(18,6)"))
      .select(col("__g"), col("__t"), col("__z"))
    val a = z.select(col("__g").as("group_a"), col("__t"),
      col("__z").as("__za"))
    val b = z.select(col("__g").as("group_b"), col("__t"),
      col("__z").as("__zb"))
    a.join(b, Seq("__t"))
      .filter(col("group_a") < col("group_b"))
      .groupBy(col("group_a"), col("group_b"))
      .agg(count(lit(1)).cast("long").as("n_terms"),
        sum(abs(col("__za") - col("__zb"))).as("__sd"))
      .select(col("group_a"), col("group_b"), col("n_terms"),
        p6(col("__sd").cast("double") / col("n_terms").cast("double"))
          .as("delta"))
  }

  /** The per-word (count, Σf, Σf²) stats aggregate over a [[freqGrid]]
    * — the one home of the mean/σ closing [[burrowsDelta]] and
    * [[lexicalDispersion]] (and their oracles) share.
    */
  private def freqStats(grid: DataFrame): DataFrame =
    grid.groupBy(col("__t"))
      .agg(count(lit(1)).cast("long").as("__ng"),
        sum(coalesce(col("__c"), lit(0L))).cast("long").as("__nt"),
        sum(col("__f")).cast("decimal(28,6)").as("__sf"),
        sum((col("__f").cast("double") * col("__f").cast("double"))
          .cast("decimal(38,12)")).as("__qf"))

  /** σ of the grid features across groups — the radicand is CLAMPED
    * at 0 (greatest) because an evenly-dispersed word's exact-zero
    * variance can land one ulp NEGATIVE in double arithmetic: sqrt
    * would yield NaN here and RAISE in DuckDB (the xyzClassification
    * precedent; round-11 review finding). Mirror this text in every
    * oracle.
    */
  private val sigSql = "sqrt(greatest(CAST(0.0 AS DOUBLE)," +
    " CAST(__ng AS DOUBLE) * CAST(__qf AS DOUBLE)" +
    " - CAST(__sf AS DOUBLE) * CAST(__sf AS DOUBLE)))" +
    " / CAST(__ng AS DOUBLE)"
  private val muSql = "(CAST(__sf AS DOUBLE) / CAST(__ng AS DOUBLE))"

  /** Shared G×K relative-frequency grid: the corpus's top-K words
    * crossed against every group, each cell carrying the group's
    * pround6(count/group_tokens) as DECIMAL(18,6) (`__f`), with
    * missing cells at frequency 0. `maxGroups` is enforced with a
    * driver-side count BEFORE the grid builds. Used by
    * [[burrowsDelta]] and [[lexicalDispersion]].
    */
  private def freqGrid(docs: DataFrame, textCol: String,
                       groupCol: String, topK: Int, maxGroups: Int,
                       caller: String): DataFrame = {
    require(topK >= 2 && topK <= 200, s"topK out of range: $topK")
    require(maxGroups >= 2 && maxGroups <= 256,
      s"maxGroups out of range: $maxGroups")
    def p6(c: org.apache.spark.sql.Column) = graft.functions.Rounding.p6(c)
    val cnt = docs.filter(col(groupCol).isNotNull)
      .select(col(groupCol).as("__g"),
        explode(TextFns.tokens(col(textCol))).as("__t"))
      .groupBy(col("__g"), col("__t"))
      .agg(count(lit(1)).cast("long").as("__c"))
      .localCheckpoint(true)
    val gTot = cnt.groupBy(col("__g"))
      .agg(sum(col("__c")).cast("long").as("__gt"))
      .localCheckpoint(true)
    val nGroups = gTot.count()
    if (nGroups > maxGroups) throw new IllegalStateException(
      s"$caller: $nGroups groups exceed maxGroups=$maxGroups — " +
        "the grid/pair tables would explode; bucket the group column " +
        "or raise maxGroups to accept the cost explicitly.")
    val top = cnt.groupBy(col("__t"))
      .agg(sum(col("__c")).cast("long").as("__tc"))
      .orderBy(col("__tc").desc, col("__t")).limit(topK)
      .select(col("__t"))
      .localCheckpoint(true)
    gTot.crossJoin(broadcast(top))
      .join(cnt, Seq("__g", "__t"), "left")
      .withColumn("__f",
        p6(coalesce(col("__c"), lit(0L)).cast("double") /
          col("__gt").cast("double")).cast("decimal(18,6)"))
  }

  /** Juilland's D lexical dispersion for the corpus's top-K words:
    * how EVENLY does each word spread across the groups? With the
    * per-group relative frequencies f_g (zeros included),
    * D = 1 − cv/√(G−1) where cv = σ/μ — 1 means perfectly even
    * (a true function word), near 0 means the word lives in one
    * group (a topic word wearing a high raw frequency). The
    * corpus-linguistics companion to [[keyness]]: keyness finds
    * words that BELONG to a group, dispersion finds words that
    * belong to NO group. D can dip below 0 at extreme concentration
    * (cv > √(G−1)); it is reported raw, not clamped.
    *
    * Exactness rides the [[burrowsDelta]] grid: canonical pround6
    * frequency features, per-word mean/σ from exact decimal sums,
    * the closing D one fixed-order double, pround6. A word whose
    * features all round to 0 (μ = 0) reports NULL.
    *
    * Scale shape: the shared G×K grid + one per-word aggregate.
    */
  def lexicalDispersion(docs: DataFrame, textCol: String,
                        groupCol: String, topK: Int = 50,
                        maxGroups: Int = 64): DataFrame = {
    def p6(c: org.apache.spark.sql.Column) = graft.functions.Rounding.p6(c)
    val grid = freqGrid(docs, textCol, groupCol, topK, maxGroups,
      "lexicalDispersion")
    freqStats(grid)
      .select(col("__t").as("term"), col("__ng").as("n_groups"),
        col("__nt").as("n_total"),
        p6(expr(s"""CASE WHEN __ng < 2 OR $muSql <= 0.0 THEN NULL
          ELSE 1.0 - (($sigSql) / ($muSql))
            / sqrt(CAST(__ng - 1 AS DOUBLE))
          END""")).as("d"))
  }

  /** Log-likelihood keyness (Dunning's G²) — the top-k KEYWORDS of
    * each group against the rest of the corpus: which words does this
    * source use significantly MORE than everyone else? The calibrated
    * alternative to [[topTerms]]'s tf-idf (G² is a real significance
    * statistic, comparable across words of very different frequency,
    * where tf-idf conflates rarity with salience).
    *
    * Per (group, word): the 2×2 table (word-in-group o11, word
    * elsewhere, other-words-in-group, rest), G² = 2·Σ o·ln(o/e) over
    * the four cells (zero cells contribute 0; a zero e with a
    * positive o is impossible by the margin algebra). Only
    * OVER-represented words qualify (o11·N > rowTot·colTot — an
    * exact integer comparison, never the rounded double). G² is ONE
    * fixed-order double over exact BIGINT margins, pround6; top-k by
    * (G² desc, word asc) via a rank-limited window (planned as
    * WindowGroupLimit).
    *
    * Scale shape: one (group, term) hash aggregate; term totals
    * equi-join back on term (AQE splits hot words); group totals and
    * the one-row corpus total attach as broadcasts (the q77 shape).
    */
  def keyness(docs: DataFrame, textCol: String, groupCol: String,
              k: Int = 10): DataFrame = {
    require(k >= 1 && k <= 100, s"k out of range: $k")
    def p6(c: org.apache.spark.sql.Column) = graft.functions.Rounding.p6(c)
    val cnt = docs.filter(col(groupCol).isNotNull)
      .select(col(groupCol).as("__g"),
        explode(TextFns.tokens(col(textCol))).as("__t"))
      .groupBy(col("__g"), col("__t"))
      .agg(count(lit(1)).cast("long").as("__c"))
      .localCheckpoint(true)
    val termTot = cnt.groupBy(col("__t"))
      .agg(sum(col("__c")).cast("long").as("__tt"))
    val grpTot = cnt.groupBy(col("__g"))
      .agg(sum(col("__c")).cast("long").as("__gt"))
    val nTot = grpTot.agg(sum(col("__gt")).cast("long").as("__nn"))
    def t(o: String, e: String) =
      s"(CASE WHEN $o > 0 THEN CAST($o AS DOUBLE)" +
        s" * ln(CAST($o AS DOUBLE) / ($e)) ELSE 0.0 END)"
    val o12 = "(__tt - __c)"; val o21 = "(__gt - __c)"
    val o22 = "(__nn - __tt - __gt + __c)"
    val nD = "CAST(__nn AS DOUBLE)"
    val e11 = s"(CAST(__tt AS DOUBLE) * CAST(__gt AS DOUBLE) / $nD)"
    val e12 = s"(CAST(__tt AS DOUBLE) * CAST(__nn - __gt AS DOUBLE) / $nD)"
    val e21 = s"(CAST(__nn - __tt AS DOUBLE) * CAST(__gt AS DOUBLE) / $nD)"
    val e22 =
      s"(CAST(__nn - __tt AS DOUBLE) * CAST(__nn - __gt AS DOUBLE) / $nD)"
    val g2 = s"(2.0 * (${t("__c", e11)} + ${t(o12, e12)}" +
      s" + ${t(o21, e21)} + ${t(o22, e22)}))"
    val w = Window.partitionBy(col("__g"))
      .orderBy(col("__g2d").desc, col("__t"))
    cnt.join(termTot, Seq("__t"))
      .join(broadcast(grpTot), Seq("__g"))
      .crossJoin(broadcast(nTot))
      // over-representation gate: exact integer cross-multiplication
      .filter(expr(
        "CAST(__c AS DECIMAL(38,0)) * __nn > CAST(__tt AS DECIMAL(38,0)) * __gt"))
      .withColumn("__g2d", expr(g2))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .select(col("__g").as(groupCol), col("__t").as("term"),
        col("__c").as("n_in"), p6(col("__g2d")).as("g2"),
        col("__rk").cast("long").as("rank"))
  }

  /** Per-group readability card: pooled word / sentence / syllable
    * counts and the Flesch reading-ease + Flesch–Kincaid grade level
    * computed from the POOLED ratios — the corpus-curation screen
    * "is this source textbook prose or legal boilerplate?", read next
    * to the per-doc quality gate (which keeps/drops) as the
    * source-level dial (which reweights).
    *
    * Counting is deterministic and engine-portable: words are
    * `TextFns.tokens` (whitespace splits), sentences are maximal
    * `[.!?]+` runs, syllables the standard proxy of maximal vowel
    * runs `[aeiouy]+` on the lowered text — all three are row-local
    * regexp counts, exact BIGINTs. Flesch = 206.835 − 1.015·(W/S) −
    * 84.6·(Y/W) and FK grade = 0.39·(W/S) + 11.8·(Y/W) − 15.59 are
    * ONE fixed-order double expression each over the pooled exact
    * counts, pround6; a group with zero sentences or zero words
    * reports NULL scores (counts intact).
    *
    * Scale shape: ONE hash aggregate over the row-local projection.
    * No explode — the token ARRAY is never materialized per element,
    * only its size.
    */
  def readability(docs: DataFrame, textCol: String,
                  groupCol: String): DataFrame = {
    def p6(c: org.apache.spark.sql.Column) = graft.functions.Rounding.p6(c)
    val agg = docs.filter(col(groupCol).isNotNull)
      .select(col(groupCol),
        coalesce(size(TextFns.tokens(col(textCol))), lit(0))
          .cast("long").as("__w"),
        coalesce(size(regexp_extract_all(col(textCol),
          lit("[.!?]+"), lit(0))), lit(0)).cast("long").as("__s"),
        coalesce(size(regexp_extract_all(lower(col(textCol)),
          lit("[aeiouy]+"), lit(0))), lit(0)).cast("long").as("__y"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("__w")).cast("long").as("n_words"),
        sum(col("__s")).cast("long").as("n_sentences"),
        sum(col("__y")).cast("long").as("n_syllables"))
    val wps = col("n_words").cast("double") / col("n_sentences").cast("double")
    val ypw = col("n_syllables").cast("double") / col("n_words").cast("double")
    val ok = col("n_sentences") > 0L && col("n_words") > 0L
    agg.select(col(groupCol), col("n_docs"), col("n_words"),
      col("n_sentences"), col("n_syllables"),
      when(ok, p6(lit(206.835) - lit(1.015) * wps - lit(84.6) * ypw))
        .as("flesch"),
      when(ok, p6(lit(0.39) * wps + lit(11.8) * ypw - lit(15.59)))
        .as("fk_grade"))
  }

  /** BM25 ranked retrieval for a FIXED query-term list (Robertson/
    * Sparck Jones, the Okapi formulation): per matched (doc, term),
    *   idf(t) = ln((N − df + 0.5)/(df + 0.5))
    *   w(d,t) = idf(t) · tf·(k1+1) / (tf + k1·(1−b) + k1·b·dl·N/T)
    * with N docs, T total tokens (so dl·N/T = dl/avgdl without a
    * division by a non-integer), df counted on matched docs. The
    * classic idf can go negative for terms in most docs — kept, as in
    * the reference formulation. Per-term contributions are p6 doubles
    * summed in DECIMAL; top-k closes by (score desc, id) through
    * TakeOrderedAndProject.
    *
    * Scale shape: the scan explodes tokens but filters to the query
    * list IMMEDIATELY (scan-resident), so only matched (doc, term)
    * rows shuffle; df and the one-row (N, T) aggregate broadcast back.
    *
    * Output: id, n_terms, score — top `k` docs.
    */
  def bm25(docs: DataFrame, textCol: String, idCol: String,
           queryTerms: Seq[String], k: Int = 10,
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty && queryTerms.size <= 32,
      s"queryTerms must be 1..32 terms: ${queryTerms.size}")
    def p6(c: org.apache.spark.sql.Column) = graft.functions.Rounding.p6(c)
    val toks = docs.select(col(idCol),
      TextFns.tokens(col(textCol)).as("__t"))
      .select(col(idCol), size(col("__t")).cast("long").as("__dl"),
        col("__t"))
    val totals = toks.agg(count(lit(1)).cast("long").as("__nd"),
      sum(col("__dl")).cast("long").as("__tl"))
    val terms = toks
      .select(col(idCol), col("__dl"), explode(col("__t")).as("__w"))
      .where(col("__w").isInCollection(queryTerms))
      .groupBy(col(idCol), col("__dl"), col("__w"))
      .agg(count(lit(1)).cast("long").as("__tf"))
    val dfs = terms.groupBy(col("__w"))
      .agg(count(lit(1)).cast("long").as("__df"))
    val contrib = terms
      .join(broadcast(dfs), Seq("__w"))
      .crossJoin(broadcast(totals))
      .withColumn("__c6", p6(
        log((col("__nd").cast("double") - col("__df").cast("double") + 0.5) /
          (col("__df").cast("double") + 0.5)) *
          (col("__tf").cast("double") * lit(k1 + 1)) /
          (col("__tf").cast("double") + lit(k1 * (1 - b)) +
            lit(k1 * b) * ((col("__dl") * col("__nd")).cast("double") /
              col("__tl").cast("double")))))
    contrib.groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_terms"),
        sum(col("__c6").cast("decimal(18,6)")).cast("decimal(38,6)")
          .as("__s"))
      .select(col(idCol), col("n_terms"),
        col("__s").cast("double").as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Simpson diversity card per group over tokens: with n_i the count
    * of token i and N the group total,
    *   λ = Σ n_i(n_i−1) / (N(N−1))   (probability two random tokens
    *                                  match — concentration)
    *   inverse Simpson = 1/λ          (effective vocabulary size)
    * plus Berger–Parker dominance (top token share, exact basis
    * points). The ecology-standard trio beside [[vocabRichness]]'s
    * Chao1: richness asks how many types EXIST, diversity asks how
    * evenly they are USED — a bot corpus can be rich but concentrated.
    *
    * λ's numerator and denominator are exact DECIMAL(38,0); both
    * ratios divide once, p6. Groups with N < 2 report NULL λ (no
    * pair to draw); a single-token group has λ = 1.
    *
    * Output: group, n_tokens, n_distinct, simpson, inv_simpson,
    * top_share_bp.
    */
  def simpsonDiversity(docs: DataFrame, textCol: String,
                       groupCol: String): DataFrame = {
    def p6(c: org.apache.spark.sql.Column) = graft.functions.Rounding.p6(c)
    val counts = docs
      .filter(col(groupCol).isNotNull)
      .select(col(groupCol).as("__g"),
        explode(TextFns.tokens(col(textCol))).as("__w"))
      .groupBy(col("__g"), col("__w"))
      .agg(count(lit(1)).cast("long").as("__c"))
    val agg = counts.groupBy(col("__g"))
      .agg(sum(col("__c")).cast("decimal(38,0)").as("__n"),
        count(lit(1)).cast("long").as("n_distinct"),
        sum(col("__c").cast("decimal(38,0)") * (col("__c") - 1L))
          .cast("decimal(38,0)").as("__num"),
        max(col("__c")).cast("decimal(38,0)").as("__top"))
    agg.select(col("__g").as(groupCol),
      col("__n").cast("long").as("n_tokens"), col("n_distinct"),
      when(col("__n") > 1L, p6(col("__num").cast("double") /
        (col("__n") * (col("__n") - 1L)).cast("double"))).as("simpson"),
      when(col("__num") > 0L, p6(
        (col("__n") * (col("__n") - 1L)).cast("double") /
          col("__num").cast("double"))).as("inv_simpson"),
      expr("CAST(__top * 10000 DIV __n AS BIGINT)").as("top_share_bp"))
  }

  /** RAKE keyword extraction (Rose et al., 2010): candidate phrases
    * are maximal stopword-free token runs (the phrase id is a window
    * CUMSUM of the stopword indicator — no per-doc parsing state),
    * each word scores degree/frequency (degree = Σ phrase length over
    * its phrases), and a phrase scores the sum of its words. The
    * classic no-model keyword baseline beside [[topTerms]]' tf-idf
    * view — multi-word phrases surface here that unigram scoring
    * cannot see.
    *
    * Word scores are exact-rational p6 (deg and freq are integers);
    * phrase scores sum the p6 word scores in DECIMAL. Top-k closes by
    * (score desc, phrase) through TakeOrderedAndProject.
    *
    * Output: phrase, n_words, n_occurrences, score — top `k` phrases
    * of at least `minWords` words.
    */
  def rakeKeywords(docs: DataFrame, textCol: String, idCol: String,
                   k: Int = 20, minWords: Int = 2): DataFrame = {
    require(k > 0 && minWords >= 1, s"bad k=$k / minWords=$minWords")
    def p6(c: org.apache.spark.sql.Column) = graft.functions.Rounding.p6(c)
    val stop = TextFns.enStopwords
    val pos = docs
      .select(col(idCol).as("__id"),
        posexplode(TextFns.tokens(col(textCol))).as(Seq("__p", "__w")))
      .withColumn("__isStop", col("__w").isInCollection(stop).cast("long"))
    val wDoc = Window.partitionBy(col("__id")).orderBy(col("__p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val phrased = pos
      .withColumn("__ph", sum(col("__isStop")).over(wDoc))
      .where(col("__isStop") === 0L)
    val phrases = phrased
      .groupBy(col("__id"), col("__ph"))
      .agg(array_sort(collect_list(struct(col("__p"), col("__w"))))
        .as("__a"))
      .select(col("__id"),
        transform(col("__a"), x => x.getField("__w")).as("__ws"))
      .withColumn("__phrase", array_join(col("__ws"), " "))
      .withColumn("__len", size(col("__ws")).cast("long"))
    // word stats over ALL phrase occurrences
    val wordStats = phrases
      .select(explode(col("__ws")).as("__w"), col("__len"))
      .groupBy(col("__w"))
      .agg(count(lit(1)).cast("long").as("__freq"),
        sum(col("__len")).cast("long").as("__deg"))
      .withColumn("__ws6", p6(col("__deg").cast("double") /
        col("__freq").cast("double")))
    // distinct phrases score the sum of their word scores
    val distinctPhrases = phrases
      .groupBy(col("__phrase"))
      .agg(max(col("__len")).as("n_words"),
        count(lit(1)).cast("long").as("n_occurrences"),
        max(col("__ws")).as("__ws"))
      .where(col("n_words") >= minWords.toLong)
    distinctPhrases
      .select(col("__phrase"), col("n_words"), col("n_occurrences"),
        explode(col("__ws")).as("__w"))
      .join(broadcast(wordStats.select(col("__w"), col("__ws6"))),
        Seq("__w"))
      .groupBy(col("__phrase").as("phrase"))
      .agg(max(col("n_words")).as("n_words"),
        max(col("n_occurrences")).as("n_occurrences"),
        sum(col("__ws6").cast("decimal(18,6)")).cast("decimal(38,6)")
          .as("__s"))
      .select(col("phrase"), col("n_words"), col("n_occurrences"),
        col("__s").cast("double").as("score"))
      .orderBy(col("score").desc, col("phrase"))
      .limit(k)
  }

  /** Heaps'-law fit per group: vocabulary size V against cumulative
    * token count N at `points` id-order checkpoints, fit
    * ln V = β·ln N + ln K by least squares. β well below 1 says the
    * vocabulary saturates (natural text: 0.4–0.6); β ≈ 1 says every
    * new document brings new tokens — the tokenizer-sizing companion
    * to [[vocabCoverage]]'s fixed-vocab view.
    *
    * Checkpoints are id-proportional (c_i = max_id·i/points by exact
    * integer division), each token contributes V through its MIN
    * doc id, token totals fold per doc — both fan over the literal
    * checkpoint list, so no per-group sort and no global rank. The
    * log-log fit uses p6 coordinates in order-free DECIMAL sums (the
    * hurstRS closing shape).
    *
    * Output: group, n_checkpoints, beta, k_coef.
    */
  def heapsLaw(docs: DataFrame, textCol: String, idCol: String,
               groupCol: String, points: Int = 8): DataFrame = {
    require(points >= 2 && points <= 32, s"points must be 2..32: $points")
    def p6(c: org.apache.spark.sql.Column) = graft.functions.Rounding.p6(c)
    val base = docs
      .filter(col(groupCol).isNotNull && col(idCol).isNotNull)
      .select(col(groupCol).as("__g"), col(idCol).cast("long").as("__id"),
        TextFns.tokens(col(textCol)).as("__t"))
    val maxId = base.groupBy(col("__g"))
      .agg(max(col("__id")).as("__mx"))
    val cps = maxId
      .select(col("__g"), explode(typedLit((1 to points).map(_.toLong)))
        .as("__i"), col("__mx"))
      .select(col("__g"), col("__i"),
        expr("__mx * __i DIV " + points).as("__c"))
    // V(c): tokens whose FIRST doc id <= c
    val firstSeen = base
      .select(col("__g"), col("__id"), explode(col("__t")).as("__w"))
      .groupBy(col("__g"), col("__w"))
      .agg(min(col("__id")).as("__first"))
    val v = firstSeen.join(cps, Seq("__g"))
      .where(col("__first") <= col("__c"))
      .groupBy(col("__g"), col("__c"))
      .agg(count(lit(1)).cast("long").as("__v"))
    // N(c): tokens in docs with id <= c
    val perDoc = base.select(col("__g"), col("__id"),
      size(col("__t")).cast("long").as("__n"))
    val n = perDoc.join(cps, Seq("__g"))
      .where(col("__id") <= col("__c"))
      .groupBy(col("__g"), col("__c"))
      .agg(sum(col("__n")).cast("long").as("__nt"))
    val xy = v.join(n, Seq("__g", "__c"))
      .where(col("__v") > 0L && col("__nt") > 0L)
      .select(col("__g"), p6(log(col("__nt").cast("double"))).as("__x6"),
        p6(log(col("__v").cast("double"))).as("__y6"))
      .distinct() // duplicate checkpoints (small max id) fit once
    val fit = xy.groupBy(col("__g"))
      .agg(count(lit(1)).cast("long").as("n_checkpoints"),
        sum(col("__x6").cast("decimal(18,6)")).cast("decimal(38,6)")
          .as("sx"),
        sum(col("__y6").cast("decimal(18,6)")).cast("decimal(38,6)")
          .as("sy"),
        sum((col("__x6").cast("decimal(19,6)") *
          col("__y6").cast("decimal(19,6)")).cast("decimal(38,12)"))
          .cast("decimal(38,12)").as("sxy"),
        sum((col("__x6").cast("decimal(19,6)") *
          col("__x6").cast("decimal(19,6)")).cast("decimal(38,12)"))
          .cast("decimal(38,12)").as("sxx"))
      .filter(col("n_checkpoints") >= 2L)
    val nD = col("n_checkpoints").cast("double")
    fit
      .withColumn("beta", p6(
        (nD * col("sxy").cast("double") -
          col("sx").cast("double") * col("sy").cast("double")) /
          (nD * col("sxx").cast("double") -
            col("sx").cast("double") * col("sx").cast("double"))))
      .select(col("__g").as(groupCol), col("n_checkpoints"), col("beta"),
        p6(exp((col("sy").cast("double") - col("beta") *
          col("sx").cast("double")) / nD)).as("k_coef"))
  }

  /** Collocation card over ADJACENT bigrams: the t-score
    * (f_xy − f_x·f_y/N)/√f_xy — "is this pair more than chance
    * adjacency" in frequency units — and the Dice coefficient
    * 2·f_xy/(f_x + f_y) — "how exclusive is the pair". The
    * fixed-distance companion to [[pmiPairs]]' document-cooccurrence
    * view: "machine learning" is an adjacency collocation long before
    * it dominates document cooccurrence.
    *
    * All counts are exact; Dice's odds are an exact integer ratio
    * rendered p6; the t-score's one division and √ close in p6
    * doubles. Top-k by (t_score desc, bigram).
    *
    * Output: bigram, f_xy, f_x, f_y, t_score, dice — pairs with
    * f_xy ≥ minCount.
    */
  def collocations(docs: DataFrame, textCol: String, k: Int = 30,
                   minCount: Int = 5): DataFrame = {
    require(k > 0 && minCount >= 1, s"bad k=$k / minCount=$minCount")
    def p6(c: org.apache.spark.sql.Column) = graft.functions.Rounding.p6(c)
    val toks = docs.select(TextFns.tokens(col(textCol)).as("__t"))
    val uni = toks.select(explode(col("__t")).as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).cast("long").as("__f"))
    val nTot = toks.agg(sum(size(col("__t"))).cast("long").as("__n"))
    val bi = toks
      .select(explode(TextFns.wordShingles(col("__t"), 2)).as("bigram"))
      .groupBy(col("bigram"))
      .agg(count(lit(1)).cast("long").as("f_xy"))
      .where(col("f_xy") >= minCount.toLong)
      .withColumn("__w1", split(col("bigram"), " ").getItem(0))
      .withColumn("__w2", split(col("bigram"), " ").getItem(1))
    bi
      .join(broadcast(uni.select(col("__w").as("__w1"),
        col("__f").as("f_x"))), Seq("__w1"))
      .join(broadcast(uni.select(col("__w").as("__w2"),
        col("__f").as("f_y"))), Seq("__w2"))
      .crossJoin(broadcast(nTot))
      .select(col("bigram"), col("f_xy"), col("f_x"), col("f_y"),
        p6((col("f_xy").cast("double") -
          col("f_x").cast("double") * col("f_y").cast("double") /
            col("__n").cast("double")) /
          sqrt(col("f_xy").cast("double"))).as("t_score"),
        p6(lit(2.0) * col("f_xy").cast("double") /
          (col("f_x") + col("f_y")).cast("double")).as("dice"))
      .orderBy(col("t_score").desc, col("bigram"))
      .limit(k)
  }

  /** Monroe–Colaresi–Quinn weighted log-odds with an informative
    * Dirichlet prior ("Fightin' Words", 2008): for each source vs the
    * REST of the corpus, per word,
    *   δ_w = ln((y_aw + α_w)/(n_a + α₀ − y_aw − α_w))
    *       − ln((y_bw + α_w)/(n_b + α₀ − y_bw − α_w))
    *   z_w = δ_w / √(1/(y_aw + α_w) + 1/(y_bw + α_w))
    * with α_w = α₀·(y_w/n) the corpus-frequency prior. The keyness
    * ranking that does NOT explode on rare words — the prior shrinks
    * them — where [[keyness]]' G² needs its own frequency floor.
    *
    * Everything reaches the doubles as exact integers with a fixed
    * operation order (the prior divides once), ln is the one
    * transcendental per term, z closes p6. Top-k per source by
    * (z desc, word).
    *
    * Output: source, word, y_source, y_rest, z_logodds.
    */
  def logOddsDirichlet(docs: DataFrame, textCol: String,
                       groupCol: String, k: Int = 10,
                       priorMass: Double = 500.0): DataFrame = {
    require(k > 0 && priorMass > 0, s"bad k=$k / priorMass=$priorMass")
    def p6(c: org.apache.spark.sql.Column) = graft.functions.Rounding.p6(c)
    val cells = docs
      .filter(col(groupCol).isNotNull)
      .select(col(groupCol).as("__g"),
        explode(TextFns.tokens(col(textCol))).as("__w"))
      .groupBy(col("__g"), col("__w"))
      .agg(count(lit(1)).cast("long").as("__y"))
      .localCheckpoint(true)
    val perW = cells.groupBy(col("__w"))
      .agg(sum(col("__y")).cast("long").as("__yw"))
    val perG = cells.groupBy(col("__g"))
      .agg(sum(col("__y")).cast("long").as("__na"))
    val nTot = cells.agg(sum(col("__y")).cast("long").as("__n"))
    val scored = cells
      .join(broadcast(perW), Seq("__w"))
      .join(broadcast(perG), Seq("__g"))
      .crossJoin(broadcast(nTot))
      .withColumn("__yb", col("__yw") - col("__y"))
      .withColumn("__nb", col("__n") - col("__na"))
      .withColumn("__aw", lit(priorMass) *
        (col("__yw").cast("double") / col("__n").cast("double")))
      .withColumn("__da",
        log((col("__y").cast("double") + col("__aw")) /
          (col("__na").cast("double") + priorMass -
            col("__y").cast("double") - col("__aw"))))
      .withColumn("__db",
        log((col("__yb").cast("double") + col("__aw")) /
          (col("__nb").cast("double") + priorMass -
            col("__yb").cast("double") - col("__aw"))))
      .withColumn("z_logodds", p6((col("__da") - col("__db")) /
        sqrt(lit(1.0) / (col("__y").cast("double") + col("__aw")) +
          lit(1.0) / (col("__yb").cast("double") + col("__aw")))))
    val w = Window.partitionBy(col("__g"))
      .orderBy(col("z_logodds").desc, col("__w"))
    scored
      .withColumn("__r", row_number().over(w))
      .where(col("__r") <= k)
      .select(col("__g").as(groupCol), col("__w").as("word"),
        col("__y").as("y_source"), col("__yb").as("y_rest"),
        col("z_logodds"))
  }

  /** Bigram entropy rate per group: H(w₂|w₁) = H(bigrams) − H(prefix
    * marginal), both over the SAME adjacent-bigram table, plus the
    * conditional perplexity exp(rate) — "given a word, how many
    * next-words is this corpus effectively choosing from". The
    * predictability lens beside [[simpsonDiversity]]'s unigram
    * evenness: template/boilerplate corpora crater the rate long
    * before unigram stats move.
    *
    * Entropies are the [[lmScore]]-family p6-term DECIMAL stations
    * (exact counts, one ln per term, order-free sums); the closing
    * subtraction and exp are p6 doubles.
    *
    * Output: group, n_bigrams, h_bigram, h_prefix, entropy_rate,
    * perplexity.
    */
  def entropyRate(docs: DataFrame, textCol: String,
                  groupCol: String): DataFrame = {
    def p6(c: org.apache.spark.sql.Column) = graft.functions.Rounding.p6(c)
    // TWO-STEP projection — tokenize into a column FIRST, shingle the
    // column: inlining tokens() inside wordShingles' lambda makes the
    // interpreted HOF re-tokenize the whole document per shingle
    // position (O(tokens²) regex splits/doc — measured 31.9 s of
    // q387's 39 s at sf1.0; the two-step form is 3.1 s). The multiple
    // references to __t inside the size guard + lambda keep
    // CollapseProject from re-inlining (same idiom as collocations
    // and q294). Hashing the cell keys to 60-bit longs was tried and
    // REJECTED (9.2 s vs 7.2 s at sf1.0): the distinct-cell table is
    // small, so two md5s per bigram instance cost more than the
    // shuffled string bytes they save.
    val bi = docs
      .filter(col(groupCol).isNotNull)
      .select(col(groupCol).as("__g"),
        TextFns.tokens(col(textCol)).as("__t"))
      .select(col("__g"),
        explode(TextFns.wordShingles(col("__t"), 2)).as("__bg"))
      .withColumn("__w1", split(col("__bg"), " ").getItem(0))
      .groupBy(col("__g"), col("__w1"), col("__bg"))
      .agg(count(lit(1)).cast("long").as("__c"))
      .localCheckpoint(true)
    val n = bi.groupBy(col("__g"))
      .agg(sum(col("__c")).cast("long").as("n_bigrams"))
    def entropy(keyed: DataFrame, out: String): DataFrame = keyed
      .join(broadcast(n), Seq("__g"))
      .withColumn("__t6", p6(
        col("__c").cast("double") / col("n_bigrams").cast("double") *
          log(col("n_bigrams").cast("double") / col("__c").cast("double"))))
      .groupBy(col("__g"))
      .agg(p6(sum(col("__t6").cast("decimal(18,6)"))
        .cast("decimal(38,6)").cast("double")).as(out))
    val hB = entropy(bi.select(col("__g"), col("__c")), "h_bigram")
    val hP = entropy(bi.groupBy(col("__g"), col("__w1"))
      .agg(sum(col("__c")).cast("long").as("__c")), "h_prefix")
    n.join(hB, Seq("__g")).join(hP, Seq("__g"))
      .withColumn("entropy_rate", p6(col("h_bigram") - col("h_prefix")))
      .select(col("__g").as(groupCol), col("n_bigrams"), col("h_bigram"),
        col("h_prefix"), col("entropy_rate"),
        p6(exp(col("entropy_rate"))).as("perplexity"))
  }
}
