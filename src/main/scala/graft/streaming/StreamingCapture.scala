package graft.streaming

import graft.sources.PathIO
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming capture–recapture monitor — q366's population estimate
  * kept current as observation batches arrive: the state is the
  * per-(group, key) capture-indicator pair, merged by MAX (a key once
  * seen in window A stays seen), and the Chapman card derives from the
  * state on demand. The live "how much of the universe have we
  * crawled" gauge: the estimate converging toward n1 ∪ n2 means the
  * captures have saturated the population.
  *
  * Correctness rests on max-merge idempotence: indicators are 0/1 and
  * max is associative, commutative, AND idempotent, so any batch
  * split — including a replayed batch after a failed sink — lands the
  * state equal to the one-shot indicator table
  * (`StreamingCaptureSpec` pins both). The card reads through the
  * SAME `Profile.chapmanFromIndicators` closing the batch operator
  * uses — q373 shares q366's oracle verbatim. Commit protocol is the
  * shared `PathIO.writeSwap` retry discipline.
  *
  * Scale shape per batch: one hash aggregate on (group, key), one
  * full-outer equi-join into the state; state is one row per
  * (group, key) ever captured — the same footprint class as the
  * streaming k-anonymity key table.
  */
object StreamingCapture {

  /** Merge one batch's capture indicators into the state; returns the
    * post-merge per-(group, key) table (grp, key, ia, ib). Caller
    * must materialize before `commit` (acceptBatch does).
    */
  def mergeBatch(batch: DataFrame, groupCol: String, keyCol: String,
                 inACol: String, inBCol: String,
                 statePath: String): DataFrame = {
    val spark = batch.sparkSession
    val partial = batch
      .filter(col(groupCol).isNotNull && col(keyCol).isNotNull)
      .groupBy(col(groupCol).as("__g"), col(keyCol).as("__k"))
      .agg(max(col(inACol).cast("long")).as("__ba"),
        max(col(inBCol).cast("long")).as("__bb"))
    val empty = partial.limit(0)
      .select(col("__g").as("grp"), col("__k").as("key"),
        col("__ba").as("ia"), col("__bb").as("ib"))
    val state = PathIO.readSwapState(spark, statePath, empty)
    state.join(partial,
        col("grp") <=> col("__g") && col("key") <=> col("__k"),
        "full_outer")
      .select(coalesce(col("grp"), col("__g")).as("grp"),
        coalesce(col("key"), col("__k")).as("key"),
        greatest(coalesce(col("ia"), lit(0L)),
          coalesce(col("__ba"), lit(0L))).as("ia"),
        greatest(coalesce(col("ib"), lit(0L)),
          coalesce(col("__bb"), lit(0L))).as("ib"))
  }

  /** Swap in the merged indicator table (call AFTER materializing). */
  def commit(statePath: String, merged: DataFrame): Unit =
    PathIO.writeSwap(merged, statePath)

  /** Merge + commit for batch callers; returns the materialized
    * post-merge per-(group, key) indicator table.
    */
  def acceptBatch(batch: DataFrame, groupCol: String, keyCol: String,
                  inACol: String, inBCol: String,
                  statePath: String): DataFrame = {
    val merged = mergeBatch(batch, groupCol, keyCol, inACol, inBCol,
      statePath).localCheckpoint(true)
    commit(statePath, merged)
    merged
  }

  /** The Chapman card over the maintained state — q366's estimate,
    * derived through the SAME `Profile.chapmanFromIndicators` closing
    * the batch operator uses.
    */
  def captureView(state: DataFrame, groupCol: String): DataFrame =
    graft.operators.Profile.chapmanFromIndicators(
      state.select(col("grp").as(groupCol), col("ia").as("__a"),
        col("ib").as("__b")),
      groupCol)
}
