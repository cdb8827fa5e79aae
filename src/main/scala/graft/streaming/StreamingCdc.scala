package graft.streaming

import graft.operators.Relational
import graft.sources.PathIO
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming CDC state maintenance — `Relational.cdcCompact` kept
  * current across micro-batches: the state table holds the LAST
  * operation per key (tombstones INCLUDED), each batch folds in by
  * per-key max under the caller's total order, and the queryable view
  * filters deletes out.
  *
  * Correctness rests on the per-key max being associative-commutative
  * over the total (orderCols) order: merging batch-last rows into
  * state-last rows gives the same survivor as one-shot compaction of
  * the concatenated log, under ANY batch split and arrival order —
  * including a late-arriving OLD upsert meeting a newer tombstone
  * (the tombstone's higher order wins; this is exactly why deletes
  * must be persisted, not filtered, in state).
  *
  * State discipline follows `StreamingAgg`: one parquet row per key
  * (bounded by key cardinality, not stream volume), swap-committed
  * AFTER the merged frame is materialized, `readSwapState` healing
  * interrupted swaps — a replayed batch re-merges idempotently (max
  * of max is max).
  */
object StreamingCdc {

  /** Merge one changelog batch into the CDC state; returns the merged
    * FULL state (tombstones included). Caller materializes before
    * `commit` (acceptBatch does).
    */
  def mergeBatch(batch: DataFrame, keyCol: String, orderCols: Seq[String],
                 statePath: String): DataFrame = {
    val spark = batch.sparkSession
    val ord = orderCols.map(col)
    val batchLast = Relational.keepLast(batch, keyCol, ord)
    val state = PathIO.readSwapState(spark, statePath, batchLast.limit(0))
    Relational.keepLast(state.unionByName(batchLast), keyCol, ord)
  }

  /** Swap in the merged state (call AFTER materializing it). */
  def commit(statePath: String, merged: DataFrame): Unit =
    PathIO.writeSwap(merged, statePath)

  /** Merge + commit; returns the LIVE VIEW (tombstones filtered). */
  def acceptBatch(batch: DataFrame, keyCol: String, orderCols: Seq[String],
                  isDelete: Column, statePath: String): DataFrame = {
    val merged = mergeBatch(batch, keyCol, orderCols, statePath)
      .localCheckpoint(true)
    commit(statePath, merged)
    merged.filter(!isDelete)
  }

  /** Streaming sink: maintain CDC state per micro-batch, hand the live
    * view to `sink`, commit only after it succeeds.
    */
  def cdcSink(stream: DataFrame, keyCol: String, orderCols: Seq[String],
              isDelete: Column, statePath: String,
              sink: DataFrame => Unit): DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val merged = mergeBatch(batch, keyCol, orderCols, statePath)
          .localCheckpoint(true)
        sink(merged.filter(!isDelete))
        commit(statePath, merged)
      }
}
