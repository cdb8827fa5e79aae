package graft.streaming

import graft.functions.TextFns
import graft.sources.PathIO
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming exact top-k terms per group — the live "what is trending
  * per source" card kept current across micro-batches WITHOUT
  * approximate sketches: the maintained state is the full (group,
  * term) count table (bounded by VOCABULARY, not stream volume — the
  * sub-linear growth a term table has by Heaps' law), and the top-k
  * view is derived from it on demand, so ranks can both rise and fall
  * as counts accrue — the property windowed approximations lose.
  *
  * Correctness rests on additivity exactly as `StreamingAgg`: COUNT
  * partials merge associatively-commutatively, so the state equals
  * the one-shot batch count table under ANY batch split
  * (`StreamingTopKSpec` pins it), and the derived top-k therefore
  * equals q134-family batch answers. Commit protocol is the shared
  * `PathIO.writeSwap` retry discipline: merge → materialize → sink →
  * commit, so a replayed batch after a failed sink cannot
  * double-count.
  *
  * Scale shape: per batch one tokenize+count aggregate (batch-sized)
  * full-outer-merged into the state on (group, term) — an equi-join
  * AQE skew-splits if one term is hot; the top-k read is a
  * rank-limited window per group (WindowGroupLimit prunes per
  * partition before any full sort).
  */
object StreamingTopK {

  private val reserved = Set("__g", "__t", "__n")

  /** Merge one batch's term counts into the state; returns the
    * post-merge count table (group, term, n). Caller must materialize
    * before `commit` (acceptBatch/topkSink do).
    */
  def mergeBatch(batch: DataFrame, textCol: String, groupCol: String,
                 statePath: String): DataFrame = {
    val clash = batch.columns.toSet.intersect(reserved)
    require(clash.isEmpty,
      s"batch columns collide with StreamingTopK bookkeeping names: $clash")
    val spark = batch.sparkSession
    val partial = batch
      .select(col(groupCol).as("__g"),
        explode(TextFns.tokens(col(textCol))).as("__t"))
      .groupBy(col("__g"), col("__t"))
      .agg(count(lit(1)).as("__n"))
    val empty = partial.limit(0)
      .select(col("__g").as("grp"), col("__t").as("term"),
        col("__n").as("n"))
    val state = PathIO.readSwapState(spark, statePath, empty)
    state.join(partial,
        col("grp") <=> col("__g") && col("term") <=> col("__t"),
        "full_outer")
      .select(
        coalesce(col("grp"), col("__g")).as("grp"),
        coalesce(col("term"), col("__t")).as("term"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("__n"), lit(0L)))
          .cast("long").as("n"))
  }

  /** Swap in the merged count table (call AFTER materializing it). */
  def commit(statePath: String, merged: DataFrame): Unit =
    PathIO.writeSwap(merged, statePath)

  /** Merge + commit for batch callers; returns the materialized
    * post-merge count table.
    */
  def acceptBatch(batch: DataFrame, textCol: String, groupCol: String,
                  statePath: String): DataFrame = {
    val merged = mergeBatch(batch, textCol, groupCol, statePath)
      .localCheckpoint(true)
    commit(statePath, merged)
    merged
  }

  /** Exact top-k view of a count table: k best terms per group under
    * the total (n desc, term) order — rank-limited window, so the
    * optimizer runs it as WindowGroupLimit.
    */
  def topK(counts: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val w = Window.partitionBy(col("grp")).orderBy(col("n").desc, col("term"))
    counts.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("grp"), col("rk").cast("long").as("rk"),
        col("term"), col("n"))
  }

  /** Streaming sink: maintain the count state per micro-batch, hand
    * the fresh top-k view to `sink`, commit only after it succeeds.
    */
  def topkSink(stream: DataFrame, textCol: String, groupCol: String,
               statePath: String, k: Int,
               sink: DataFrame => Unit): DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val merged = mergeBatch(batch, textCol, groupCol, statePath)
          .localCheckpoint(true)
        sink(topK(merged, k))
        commit(statePath, merged)
      }
}
