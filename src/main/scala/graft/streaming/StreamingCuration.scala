package graft.streaming

import graft.operators.{CurationPipeline, Dedup}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** The full training-data curation pipeline as a STREAM filter: each
  * micro-batch runs the same stages, in the same cheapest-first order,
  * as the batch `CurationPipeline` —
  *
  *   1. quality gate   (identical predicate: `CurationPipeline.qualityGate`)
  *   2. language gate  (identical predicate: `languageGate`)
  *   3. decontamination vs the registered eval-set gram table
  *                     (inert until `registerEvalSet` ran; see below)
  *   4. exact dedup    vs everything ever accepted + intra-batch
  *   5. near dedup     vs everything ever accepted + intra-batch
  *                     (delegated to `StreamingDedup.screenBatch`)
  *
  * Near-dup policy: WITHIN a batch, `Config.transitiveNearDup` applies
  * exactly as in the batch pipeline (default true: candidate pairs ->
  * connected components -> min id per component survives, via the
  * shared `Dedup.nearDupLosers`) — so one batch screened from fresh
  * state equals `CurationPipeline.run` on the same rows. ACROSS batches
  * the screen is necessarily pairwise: a stream only ever sees new
  * edges against docs it already accepted, and accepted docs are never
  * retracted — a new doc colliding with ANY accepted doc's band is
  * dropped, so cross-batch component merges could never change an
  * accept/drop decision. A batch `CurationPipeline` run remains the
  * compaction pass for corpora that need full component-level collapse
  * across the accepted set.
  *
  * Cross-batch state follows the `StreamingDedup` design: persisted
  * parquet tables (content hashes; MinHash band keys), not a Spark
  * state store — restart-safe, queryable, joined per batch. At 100 TB
  * both tables are a few small values per ACCEPTED doc, orders of
  * magnitude smaller than the corpus, and the joins prune on their
  * hash keys.
  *
  * Retry safety: state tables are appended only AFTER the caller's sink
  * succeeds — a failed batch is re-screened identically on retry
  * instead of colliding with its own keys and being dropped forever.
  */
object StreamingCuration {

  private def emptyGrams(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(String, Int)].toDF("gram", "n")
  }

  /** Driver-side cache of the collected eval-gram table, keyed by the
    * swap directory's committed file listing: re-collect ONLY when a
    * registerEvalSet swap changed the fingerprint. Safe under the
    * PathIO swap CONCURRENCY CONTRACT (one owner loop per statePath;
    * registration never overlaps a live batch), so a stale-read race
    * cannot occur — and even a hypothetical raced entry would self-heal
    * on the next batch's fingerprint check. The map is per-JVM and
    * holds one entry per active curation stream.
    */
  private val gramCache =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Array[String], Int)]()

  /** Observable for specs: number of actual state-table collects. */
  private[streaming] val gramStateReads = new java.util.concurrent.atomic.AtomicInteger(0)

  private def cachedEvalGrams(spark: org.apache.spark.sql.SparkSession,
                              path: String): (Array[String], Int) = {
    graft.sources.PathIO.healSwap(spark, path)
    val fp = graft.sources.PathIO.dirFingerprint(spark, path)
    val hit = gramCache.get(path)
    if (hit != null && hit._1 == fp) (hit._2, hit._3)
    else {
      gramStateReads.incrementAndGet()
      val rows = graft.sources.PathIO.readParquetOrEmpty(
        spark, path, emptyGrams(spark)).collect()
      val grams = rows.map(_.getString(0))
      val n = if (rows.isEmpty) 0 else rows(0).getInt(1)
      gramCache.put(path, (fp, grams, n))
      (grams, n)
    }
  }

  /** Register (or replace) the benchmark/eval set whose n-grams the
    * stream screens against: the eval texts' DISTINCT word `n`-grams
    * are persisted at `statePath/evalgrams` (via `PathIO.writeSwap` —
    * replacement is atomic, batches see old or new set, never a mix).
    * Every subsequent batch drops docs sharing >= `Config
    * .decontMinShared` grams with this table, so the streaming screen
    * decontaminates exactly like `Decontamination.filterContaminated`
    * does for batch corpora.
    *
    * The gram set is broadcast per batch, so it is guarded the same
    * way as `Decontamination.overlap` — and at REGISTRATION time, not
    * per batch: one bounded collect enforces `maxEvalGrams`, and the
    * collected set is written back out as the state table.
    */
  def registerEvalSet(evalSet: DataFrame, textCol: String,
                      statePath: String, n: Int,
                      maxEvalGrams: Int = 10000000): Unit = {
    import graft.expressions.GraftFunctions.distinctWordShingles
    val spark = evalSet.sparkSession
    import spark.implicits._
    val grams = evalSet
      .select(explode(distinctWordShingles(col(textCol), n)).as("gram"))
      .distinct()
      .limit(maxEvalGrams + 1)
      .as[String]
      .collect()
    require(grams.length <= maxEvalGrams,
      s"eval set exceeds maxEvalGrams=$maxEvalGrams distinct n-grams; " +
        "the grams are broadcast to every batch — shrink the eval set " +
        "or raise maxEvalGrams only if the driver can hold them")
    graft.sources.PathIO.writeSwap(
      grams.toSeq.map((_, n)).toDF("gram", "n"), s"$statePath/evalgrams")
  }

  /** Screen one batch through all five stages. Pure — persists nothing.
    *
    * @return (accepted rows, their content hashes, their band keys) —
    *         the two key frames are what `commit` appends on success
    */
  def screenBatch(batch: DataFrame, textCol: String, idCol: String,
                  statePath: String,
                  cfg: CurationPipeline.Config = CurationPipeline.Config())
      : (DataFrame, DataFrame, DataFrame) = {
    val spark = batch.sparkSession
    val qlGated = batch
      .filter(CurationPipeline.qualityGate(textCol, cfg))
      .filter(CurationPipeline.languageGate(textCol, cfg))

    // ---- decontamination vs the registered eval-gram table -------------
    // before any dedup state is touched: a contaminated doc must never
    // enter the accepted hash/band tables. The gram table is swap-
    // managed, so an eval-set replacement between batches is atomic.
    // ZERO state reads per batch in steady state: the table only
    // changes when registerEvalSet swaps it, so the collected gram set
    // is cached on the driver keyed by the swap directory's committed
    // file listing and re-collected only when that fingerprint moves —
    // at the 10M-gram guard a per-batch collect would be hundreds of
    // MB of driver strings + GC for a table that almost never changes.
    val (evalGramSet, evalGramN) =
      cachedEvalGrams(spark, s"$statePath/evalgrams")
    val gated = if (evalGramSet.isEmpty) qlGated else {
      import graft.expressions.GraftFunctions.distinctWordShingles
      import spark.implicits._
      val n = evalGramN
      val gramsDf = evalGramSet.toSeq.toDF("gram")
      val contaminated = qlGated
        .select(col(idCol),
          explode(distinctWordShingles(col(textCol), n)).as("gram"))
        .join(broadcast(gramsDf), "gram")
        .groupBy(col(idCol))
        .agg(count(lit(1)).as("__ns"))
        .filter(col("__ns") >= cfg.decontMinShared)
        .select(col(idCol))
      qlGated.join(contaminated, Seq(idCol), "left_anti")
    }

    // ---- exact dedup: content hash vs accepted corpus + intra-batch ----
    // md5(lower(...)) — the SAME normalization as the batch pipeline
    // (Dedup.dropExactDups) and the shared q46/q64 oracle; hashing the
    // raw text would let case-insensitively-equal short docs (too few
    // tokens for MinHash band keys to rescue) slip past both the
    // intra-batch keep-first and the persisted cross-batch state table
    val hashed = gated.withColumn("__h", md5(lower(col(textCol))))
    val knownHashes = graft.sources.PathIO.readParquetOrEmpty(
      spark, s"$statePath/exact", hashed.select(col("__h")).limit(0))
    // checkpoint: this subtree (gates + hash anti-join + keep-first) is
    // read by THREE consumers — the band-key materialization, the
    // accepted anti-join, and the hash commit — and would re-run per
    // consumer otherwise (the same one-pass discipline as the batch
    // pipeline's persisted exact stage, minus the cache-leak hazard).
    // Keep-first is the row_number window over the hash — the SAME
    // formulation (and survivor policy) as the batch pipeline's
    // Dedup.dropExactDups. The earlier min-per-hash self-join shape
    // consumed `hashed` in TWO join branches, so the quality/LID gate
    // expressions and the md5 re-evaluated over every doc per branch
    // and the corpus crossed two exchanges; one window pass evaluates
    // the gates once and exchanges the batch once.
    val exact = hashed
      .join(knownHashes, Seq("__h"), "left_anti")
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("__h")).orderBy(col(idCol))))
      .filter(col("__rn") === 1)
      .drop("__rn")
      .localCheckpoint(true)

    // ---- near dedup: shared batch/stream band-key screen ----
    val (accepted, acceptedKeys) = StreamingDedup.screenBatch(
      exact.drop("__h"), textCol, idCol, s"$statePath/bands",
      cfg.minhashBands, cfg.minhashRowsPerBand, cfg.transitiveNearDup)

    val acceptedHashes = exact
      .join(accepted.select(col(idCol)), Seq(idCol), "left_semi")
      .select(col("__h")).distinct()
    (accepted, acceptedHashes, acceptedKeys)
  }

  /** Append the accepted keys to the state tables (call AFTER the sink
    * succeeded).
    */
  def commit(statePath: String, acceptedHashes: DataFrame,
             acceptedKeys: DataFrame): Unit = {
    acceptedHashes.write.mode("append").parquet(s"$statePath/exact")
    acceptedKeys.write.mode("append").parquet(s"$statePath/bands")
  }

  /** Screen + commit in one call for batch callers. */
  def acceptBatch(batch: DataFrame, textCol: String, idCol: String,
                  statePath: String,
                  cfg: CurationPipeline.Config = CurationPipeline.Config()): DataFrame = {
    val (accepted, hashes, keys) = screenBatch(batch, textCol, idCol, statePath, cfg)
    val out = accepted.localCheckpoint(true)
    commit(statePath, hashes, keys)
    out
  }

  /** Streaming sink: curate each micro-batch, hand accepted rows to
    * `sink`, commit state only after it succeeds.
    */
  def curationSink(stream: DataFrame, textCol: String, idCol: String,
                   statePath: String,
                   sink: DataFrame => Unit,
                   cfg: CurationPipeline.Config = CurationPipeline.Config())
      : DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val (accepted, hashes, keys) =
          screenBatch(batch, textCol, idCol, statePath, cfg)
        sink(accepted)
        commit(statePath, hashes, keys)
      }
}
