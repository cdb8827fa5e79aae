package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — flag training documents that share word
  * n-grams with an evaluation/benchmark set, the standard screen run
  * before a corpus feeds a training job (an eval example leaking into
  * the training set inflates the benchmark). The canonical method is
  * n-gram overlap (GPT-3 used 13-gram dedup against its eval sets;
  * Gopher/PaLM used similar window overlap).
  *
  * Shape: both sides project to DISTINCT n-grams via the native
  * `DistinctWordShingles` expression (one per-row pass, no shuffle of
  * the token volume beyond the gram rows themselves); the eval side's
  * gram set is deduplicated and — being benchmark-sized, orders of
  * magnitude smaller than the corpus — BROADCAST to the corpus-side
  * join, so the 100-TB corpus never shuffles: each scan task filters
  * its grams against the in-memory eval set and only (doc, matched
  * gram) survivors aggregate. The aggregate is a map-side-combining
  * count per doc.
  *
  * The corpus side streams one exploded gram row per (doc, distinct
  * gram); memory is bounded per row, not per partition.
  */
object Decontamination {

  /** Per-document overlap counts: (id, n_shared) for every corpus doc
    * sharing at least one distinct word n-gram with `evalSet` —
    * `n_shared` counts the distinct grams of the doc that appear
    * anywhere in the eval set. Clean docs are absent (filter semantics:
    * anti-join callers can subtract).
    *
    * The eval-side gram set is broadcast — that is the whole point of
    * the shape (the corpus never shuffles) — but a "benchmark" that is
    * secretly corpus-sized would OOM the driver silently, so the gram
    * count is bounded by `maxEvalGrams` (the same contract enforcement
    * as `Similarity.ivfTopK`). The grams land on the driver either way
    * (that is what a broadcast build does), so the guard and the
    * broadcast share ONE eval-side scan: collect at most cap+1 grams
    * (early-stop limit), fail if the cap is exceeded, and ship the
    * in-memory set back out as a broadcast local relation.
    *
    * `n` is deliberately required: published practice is 13-word
    * windows (GPT-3), but short-document corpora need a smaller window
    * with a correspondingly higher `minShared` — a silent default here
    * decides that trade-off for the caller.
    */
  def overlap(corpus: DataFrame, evalSet: DataFrame, textCol: String,
              idCol: String, n: Int,
              maxEvalGrams: Int = 10000000): DataFrame = {
    import graft.expressions.GraftFunctions.distinctWordShingles
    val spark = corpus.sparkSession
    import spark.implicits._
    val corpusGrams = corpus.select(col(idCol),
      explode(distinctWordShingles(col(textCol), n)).as("gram"))
    val evalGrams = evalSet
      .select(explode(distinctWordShingles(col(textCol), n)).as("gram"))
      .distinct()
      .limit(maxEvalGrams + 1)
      .as[String]
      .collect()
    require(evalGrams.length <= maxEvalGrams,
      s"decontamination eval set exceeds maxEvalGrams=$maxEvalGrams " +
        "distinct n-grams; the eval grams are broadcast — shrink the eval " +
        "set or raise maxEvalGrams only if the driver can hold them")
    corpusGrams.join(broadcast(evalGrams.toSeq.toDF("gram")), "gram")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** The corpus with contaminated docs removed (docs sharing >=
    * `minShared` distinct n-grams with the eval set).
    *
    * `n` is required (see `overlap`): with GPT-3-style 13-word windows
    * ONE shared window is already damning, but small `n` needs a
    * correspondingly high `minShared` — common trigrams ("one of the")
    * occur in virtually all natural text, so n=3 with minShared=1 would
    * silently drop most of a real corpus.
    */
  def decontaminate(corpus: DataFrame, evalSet: DataFrame, textCol: String,
                    idCol: String, n: Int, minShared: Int = 1,
                    maxEvalGrams: Int = 10000000): DataFrame = {
    val bad = overlap(corpus, evalSet, textCol, idCol, n, maxEvalGrams)
      .filter(col("n_shared") >= minShared)
      .select(col(idCol))
    corpus.join(bad, Seq(idCol), "left_anti")
  }

  /** The report from the benchmark's side: for every eval example, how
    * much of it leaked into the corpus — (eval_id, n_grams,
    * n_contaminated, contamination_rate). This is what decides whether
    * a benchmark number is still trustworthy after training (report a
    * benchmark's contaminated examples and score the clean split
    * separately — GPT-3 appendix C practice).
    *
    * Scale shape: the corpus side streams its grams once and is
    * FILTERED by the broadcast eval gram set immediately — only
    * matching grams (bounded by the eval set's size, not the corpus)
    * reach the distinct aggregation, so the shuffle volume is
    * benchmark-sized no matter how big the corpus. The matched-gram
    * set then re-joins the broadcast (eval_id, gram) pairs to
    * attribute hits per example.
    *
    * Eval examples with fewer than `n` tokens have no `n`-grams and no
    * row here (nothing measurable leaked); callers joining back to the
    * eval table should treat absence as rate 0 with n_grams 0.
    */
  def evalContamination(corpus: DataFrame, evalSet: DataFrame,
                        textCol: String, idCol: String, n: Int,
                        maxEvalGrams: Int = 10000000): DataFrame = {
    import graft.expressions.GraftFunctions.distinctWordShingles
    val spark = corpus.sparkSession
    import spark.implicits._
    // collected as generic Rows: the eval id keeps whatever type the
    // caller's idCol has (benchmark names and UUIDs are as common as
    // numeric ids), same contract as overlap/decontaminate
    val pairsFrame = evalSet
      .select(col(idCol).as("eval_id"),
        explode(distinctWordShingles(col(textCol), n)).as("gram"))
    val evalPairs = pairsFrame.limit(maxEvalGrams + 1).collect()
    require(evalPairs.length <= maxEvalGrams,
      s"eval set exceeds maxEvalGrams=$maxEvalGrams (eval_id, gram) " +
        "pairs; the pairs are broadcast — shrink the eval set or raise " +
        "maxEvalGrams only if the driver can hold them")
    val pairsDf = spark.createDataFrame(
      spark.sparkContext.parallelize(evalPairs.toSeq, 1), pairsFrame.schema)
    val gramSet = evalPairs.map(_.get(1).asInstanceOf[String])
      .distinct.toSeq.toDF("gram")
    val hits = corpus
      .select(explode(distinctWordShingles(col(textCol), n)).as("gram"))
      .join(broadcast(gramSet), "gram")
      .distinct()
    pairsDf
      .join(hits.withColumn("__hit", lit(1)), Seq("gram"), "left")
      .groupBy(col("eval_id"))
      .agg(count(lit(1)).as("n_grams"),
        count(col("__hit")).as("n_contaminated"))
      // unrounded on purpose: query layers own presentation rounding
      // (SparkEntry.pround — engine round() functions disagree one ulp
      // from .5 boundaries across engines)
      .withColumn("contamination_rate",
        col("n_contaminated").cast("double") / col("n_grams"))
  }
}
