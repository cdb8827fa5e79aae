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
  *   4. near dedup    (MinHash-LSH candidates -> greedy cluster
  *      resolution: smallest doc id of each connected candidate pair
  *      survives, one pass)
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

  final case class Config(
      minTokens: Int = 5,
      maxPunctRatio: Double = 0.3,
      minQuality: Double = 0.2,
      languages: Set[String] = Set("en"),
      minhashBands: Int = 3,
      minhashRowsPerBand: Int = 2)

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
  def qualityGate(textCol: String, cfg: Config = Config()): org.apache.spark.sql.Column =
    TextFns.wsTokenCount(col(textCol)) >= cfg.minTokens &&
      TextFns.punctRatio(col(textCol)) <= cfg.maxPunctRatio &&
      TextFns.qualityScore(col(textCol)) >= cfg.minQuality

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

    // near-dup resolution: survivors are docs that never appear as the
    // larger id of a candidate pair (greedy min-id keeper, one anti-join)
    val pairs = Dedup.minhashCandidates(exact, textCol, idCol,
      cfg.minhashBands, cfg.minhashRowsPerBand)
    val losers = pairs.select(col("id_b").as(idCol)).distinct()
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
