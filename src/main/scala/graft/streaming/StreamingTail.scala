package graft.streaming

import graft.sources.PathIO
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming tail monitor — q368's mean-excess/GPD card kept current
  * across micro-batches: per-(group, threshold) excess moments
  * (n, Σe, Σe²) update additively as values arrive, and the
  * method-of-moments (ξ, σ) card derives from the state on demand.
  * The live heavy-tail alarm: a ξ̂ drifting upward batch over batch
  * means the value distribution is growing a heavier tail than the
  * capacity plan assumed.
  *
  * Correctness rests on additivity exactly as `StreamingEss`: all
  * three statistics are plain sums over rows above each FIXED literal
  * threshold (batch partials come through the batch operator's own
  * `Pareto.excessMoments` fan, so the DECIMAL casts match to the
  * digit), and the card reads through the SAME
  * `Pareto.meanExcessFromMoments` closing — q379 shares q368's oracle
  * verbatim. Commit protocol is the shared `PathIO.writeSwap` retry
  * discipline.
  *
  * Scale shape per batch: the thresholds×rows fan collapses in one
  * hash aggregate; state is one row per (group, threshold).
  */
object StreamingTail {

  /** Merge one batch's excess moments into the state; returns the
    * post-merge per-(group, threshold) table (grp, u, n, se, sq).
    * Caller must materialize before `commit` (acceptBatch does).
    */
  def mergeBatch(batch: DataFrame, groupCol: String, valCol: String,
                 thresholds: Seq[Double], statePath: String): DataFrame = {
    val spark = batch.sparkSession
    val partial = graft.operators.Pareto
      .excessMoments(batch, groupCol, valCol, thresholds)
      .select(col("__g"), col("u").as("__u"),
        col("n_exceed").as("__bn"), col("__se").as("__bse"),
        col("__sq").as("__bsq"))
    val empty = partial.limit(0)
      .select(col("__g").as("grp"), col("__u").as("u"),
        col("__bn").as("n"), col("__bse").as("se"), col("__bsq").as("sq"))
    val state = PathIO.readSwapState(spark, statePath, empty)
    state.join(partial,
        col("grp") <=> col("__g") && col("u") <=> col("__u"),
        "full_outer")
      .select(coalesce(col("grp"), col("__g")).as("grp"),
        coalesce(col("u"), col("__u")).as("u"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("__bn"), lit(0L)))
          .cast("long").as("n"),
        (coalesce(col("se"), lit(0).cast("decimal(38,2)")) +
          coalesce(col("__bse"), lit(0).cast("decimal(38,2)")))
          .cast("decimal(38,2)").as("se"),
        (coalesce(col("sq"), lit(0).cast("decimal(38,4)")) +
          coalesce(col("__bsq"), lit(0).cast("decimal(38,4)")))
          .cast("decimal(38,4)").as("sq"))
  }

  /** Swap in the merged moment table (call AFTER materializing). */
  def commit(statePath: String, merged: DataFrame): Unit =
    PathIO.writeSwap(merged, statePath)

  /** Merge + commit for batch callers; returns the materialized
    * post-merge per-(group, threshold) moment table.
    */
  def acceptBatch(batch: DataFrame, groupCol: String, valCol: String,
                  thresholds: Seq[Double], statePath: String): DataFrame = {
    val merged = mergeBatch(batch, groupCol, valCol, thresholds, statePath)
      .localCheckpoint(true)
    commit(statePath, merged)
    merged
  }

  /** The mean-excess/GPD card over the maintained state — q368's
    * screen, derived through the SAME `Pareto.meanExcessFromMoments`
    * closing the batch operator uses.
    */
  def tailView(state: DataFrame, groupCol: String): DataFrame =
    graft.operators.Pareto.meanExcessFromMoments(
      state.select(col("grp").as("__g"), col("u"),
        col("n").as("n_exceed"), col("se").as("__se"),
        col("sq").as("__sq")),
      groupCol)
}
