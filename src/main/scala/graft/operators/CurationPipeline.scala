package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Composed training-data curation pipeline: the operators a corpus
  * pass runs before tokenization, in the canonical order —
  *
  *   1. quality gate  (cheap per-row scores: length, stopword ratio,
  *      punctuation — drop obvious junk FIRST so later stages see less)
  *   2. language gate (marker-based LID; keep the wanted languages)
  *   3. exact dedup   (content-hash groupBy, min-id survivor)
  *   4. near dedup    (MinHash-LSH candidates -> connected-components
  *      cluster resolution: the smallest doc id of each connected
  *      CANDIDATE COMPONENT survives — A~B and B~C collapse {A,B,C}
  *      to A even when A and C never share a band. Set
  *      `Config.transitiveNearDup = false` for the cheaper one-pass
  *      greedy policy (drop the larger id of every pair), which keeps
  *      one doc per local minimum instead of one per component and is
  *      what the per-batch streaming screen implements)
  *
  * Stage order is a cost statement: each stage is strictly more
  * expensive per surviving row than the previous one, so filters run
  * cheapest-first (the same early-projection discipline Catalyst applies
  * to columns, applied to rows).
  *
  * Every stage is also available separately; `run` returns the kept
  * corpus plus an optional per-stage row-count audit. With the audit on,
  * intermediate stages are persisted so each count and the next stage
  * share one computation instead of re-running the upstream chain.
  * The exact-dedup stage is persisted on EVERY path (audit or not): it
  * feeds both the MinHash candidate generation and the keeper anti-join,
  * and without materialization both join branches would embed — and
  * re-execute — the full quality→LID→dedup upstream chain. The caller
  * unpersists via `Result.unpersist()` when done with `kept`.
  */
object CurationPipeline {

  /** @param maxDupGramFraction Gopher-style repetition gate (Rae et al.
    *        2021, table A1): drop docs whose duplicate word-n-gram
    *        fraction `1 - n_distinct/n_grams` exceeds the bound. Off
    *        (None) by default — the synthetic corpus' oracle doesn't
    *        model it and real thresholds are corpus-tuned.
    * @param maxTopGramFraction companion gate on `top_count/n_grams`
    *        (the most frequent n-gram's share of all windows).
    * @param repetitionGramN window size for both repetition gates.
    * @param decontMinShared streaming-decontamination threshold: a doc
    *        is dropped when it shares at least this many distinct word
    *        n-grams with the registered eval set (see
    *        `StreamingCuration.registerEvalSet`; the stage is inert
    *        until an eval set is registered). 1 is the published
    *        13-gram-window practice; raise it when registering with a
    *        small `n`, where single-gram collisions are common text.
    */
  final case class Config(
      minTokens: Int = 5,
      maxPunctRatio: Double = 0.3,
      minQuality: Double = 0.2,
      languages: Set[String] = Set("en"),
      minhashBands: Int = 3,
      minhashRowsPerBand: Int = 2,
      transitiveNearDup: Boolean = true,
      maxDupGramFraction: Option[Double] = None,
      maxTopGramFraction: Option[Double] = None,
      repetitionGramN: Int = 2,
      decontMinShared: Int = 1)

  final case class Result(kept: DataFrame, audit: Map[String, Long],
                          cached: Seq[DataFrame] = Nil) {
    def unpersist(): Unit = cached.foreach(_.unpersist())
  }

  /** @param withAudit false skips the per-stage counts (5 extra jobs) —
    *                   use when only the kept corpus is needed.
    */
  /** Stage-1 predicate (cheap per-row quality scores) — shared by the
    * batch pipeline and `streaming.StreamingCuration`, so the two paths
    * can never disagree on what "junk" means.
    */
  def qualityGate(textCol: String, cfg: Config = Config()): org.apache.spark.sql.Column = {
    val base = TextFns.wsTokenCount(col(textCol)) >= cfg.minTokens &&
      TextFns.punctRatio(col(textCol)) <= cfg.maxPunctRatio &&
      TextFns.qualityScore(col(textCol)) >= cfg.minQuality
    if (cfg.maxDupGramFraction.isEmpty && cfg.maxTopGramFraction.isEmpty) base
    else {
      // repetition gates ride the same per-row scan projection as the
      // other scores: wordGramStats is one native pass, the identical
      // struct feeds both fractions (subexpression elimination), and
      // nothing shuffles. Zero-gram docs (shorter than the window) have
      // no repetition to measure and pass the gates.
      val st = graft.expressions.GraftFunctions
        .wordGramStats(col(textCol), cfg.repetitionGramN)
      val grams = st.getField("n_grams").cast("double")
      def gate(bound: Option[Double], frac: org.apache.spark.sql.Column) =
        bound.map(b => grams === 0d || frac <= lit(b)).getOrElse(lit(true))
      base &&
        gate(cfg.maxDupGramFraction,
          lit(1d) - st.getField("n_distinct").cast("double") / grams) &&
        gate(cfg.maxTopGramFraction,
          st.getField("top_count").cast("double") / grams)
    }
  }

  /** Stage-2 predicate (marker LID language allow-list), shared likewise. */
  def languageGate(textCol: String, cfg: Config = Config()): org.apache.spark.sql.Column =
    TextFns.langId(col(textCol)).isin(cfg.languages.toSeq: _*)

  def run(docs: DataFrame, textCol: String, idCol: String,
          cfg: Config = Config(), withAudit: Boolean = true): Result = {
    def staged(df: DataFrame): DataFrame =
      if (withAudit) df.persist() else df

    val quality = staged(docs.filter(qualityGate(textCol, cfg)))

    val lang = staged(quality.filter(languageGate(textCol, cfg)))

    // exact feeds BOTH the candidate generation and the keeper anti-join
    // below — persist unconditionally so the two branches share one
    // InMemoryRelation instead of each re-running the upstream chain
    val exact = Dedup.dropExactDups(lang, textCol, idCol).persist()

    // near-dup resolution: candidate pairs are edges; the keep policy
    // decides which nodes lose
    val pairs = Dedup.minhashCandidates(exact, textCol, idCol,
      cfg.minhashBands, cfg.minhashRowsPerBand)
    val losers = Dedup.nearDupLosers(pairs, idCol, cfg.transitiveNearDup)
    val near = exact.join(losers, Seq(idCol), "left_anti")

    val audit = if (!withAudit) Map.empty[String, Long] else Map(
      "input" -> docs.count(),
      "after_quality" -> quality.count(),
      "after_language" -> lang.count(),
      "after_exact_dedup" -> exact.count(),
      "after_near_dedup" -> near.count())
    Result(near, audit, if (withAudit) Seq(quality, lang, exact) else Seq(exact))
  }
}
