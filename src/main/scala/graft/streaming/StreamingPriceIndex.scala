package graft.streaming

import graft.sources.PathIO
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming price-index monitor — q382's Laspeyres/Paasche/Fisher
  * card kept current as sales batches arrive: the state is the
  * per-(group, item, era) revenue/quantity cell table, merged
  * ADDITIVELY (both sums are plain DECIMAL additions), and the index
  * card derives from the state on demand. The live "are prices moving
  * or is the basket drifting" gauge for a revenue pipeline.
  *
  * Correctness rests on additivity exactly as `StreamingEss`: batch
  * partials come through the batch operator's own
  * `Pareto.priceCells` path (so the DECIMAL casts match to the
  * digit), and the card reads through the SAME
  * `Pareto.priceIndicesFromCells` closing — q386 shares q382's
  * oracle verbatim. Commit protocol is the shared `PathIO.writeSwap`
  * retry discipline.
  *
  * Scale shape per batch: one hash aggregate on (group, item, era),
  * one full-outer equi-join into the state; state is one row per
  * cell ever sold — the catalog × 2 eras, not the sales volume.
  */
object StreamingPriceIndex {

  /** Merge one batch's revenue/quantity cells into the state; returns
    * the post-merge cell table (grp, item, era, rev, qty). Caller
    * must materialize before `commit` (acceptBatch does).
    */
  def mergeBatch(batch: DataFrame, groupCol: String, itemCol: String,
                 eraCol: String, priceCol: String, qtyCol: String,
                 statePath: String): DataFrame = {
    val spark = batch.sparkSession
    val partial = graft.operators.Pareto
      .priceCells(batch, groupCol, itemCol, eraCol, priceCol, qtyCol)
      .select(col("__g"), col("__i"), col("__e"),
        col("__rev").as("__brev"), col("__qty").as("__bqty"))
    val empty = partial.limit(0)
      .select(col("__g").as("grp"), col("__i").as("item"),
        col("__e").as("era"), col("__brev").as("rev"),
        col("__bqty").as("qty"))
    val state = PathIO.readSwapState(spark, statePath, empty)
    state.join(partial,
        col("grp") <=> col("__g") && col("item") <=> col("__i") &&
          col("era") <=> col("__e"),
        "full_outer")
      .select(coalesce(col("grp"), col("__g")).as("grp"),
        coalesce(col("item"), col("__i")).as("item"),
        coalesce(col("era"), col("__e")).as("era"),
        (coalesce(col("rev"), lit(0).cast("decimal(38,2)")) +
          coalesce(col("__brev"), lit(0).cast("decimal(38,2)")))
          .cast("decimal(38,2)").as("rev"),
        (coalesce(col("qty"), lit(0).cast("decimal(38,2)")) +
          coalesce(col("__bqty"), lit(0).cast("decimal(38,2)")))
          .cast("decimal(38,2)").as("qty"))
  }

  /** Swap in the merged cell table (call AFTER materializing). */
  def commit(statePath: String, merged: DataFrame): Unit =
    PathIO.writeSwap(merged, statePath)

  /** Merge + commit for batch callers; returns the materialized
    * post-merge cell table.
    */
  def acceptBatch(batch: DataFrame, groupCol: String, itemCol: String,
                  eraCol: String, priceCol: String, qtyCol: String,
                  statePath: String): DataFrame = {
    val merged = mergeBatch(batch, groupCol, itemCol, eraCol, priceCol,
      qtyCol, statePath).localCheckpoint(true)
    commit(statePath, merged)
    merged
  }

  /** The index card over the maintained state — q382's screen,
    * derived through the SAME `Pareto.priceIndicesFromCells` closing
    * the batch operator uses.
    */
  def indexView(state: DataFrame, groupCol: String): DataFrame =
    graft.operators.Pareto.priceIndicesFromCells(
      state.select(col("grp").as("__g"), col("item").as("__i"),
        col("era").as("__e"), col("rev").as("__rev"),
        col("qty").as("__qty")),
      groupCol)
}
