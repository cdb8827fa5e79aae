package graft.streaming

import graft.sources.PathIO
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming k-anonymity monitor — the live release-risk gate kept
  * current across micro-batches: as rows arrive, the equivalence-class
  * size table updates additively and the k-anonymity histogram (q226's
  * batch card) is derived from it on demand. The gate naturally
  * DEGRADES as data arrives — each batch can mint fresh sub-k classes
  * (new rare quasi-identifier combinations) — which is exactly why a
  * hand-off audit computed once at export time is not enough: the
  * monitor answers "is this table still releasable NOW".
  *
  * Correctness rests on additivity exactly as `StreamingTopK`: class
  * COUNT partials merge associatively-commutatively on the
  * quasi-identifier tuple, so the state equals the one-shot class-size
  * table under ANY batch split (`StreamingKAnonymitySpec` pins it) and
  * the derived histogram therefore equals `Audit.kAnonymity` of the
  * concatenated batches. NULL quasi values form real equivalence
  * classes (groupBy keeps them; the merge join is null-safe) — the
  * batch operator's view. Commit protocol is the shared
  * `PathIO.writeSwap` retry discipline: merge → materialize → commit,
  * so a replayed batch after a failed sink cannot double-count.
  *
  * Scale shape per batch: one hash aggregate on the quasi tuple
  * (batch-sized) full-outer-merged into the state on the tuple — an
  * equi-join AQE skew-splits if one class is hot. State size is
  * bounded by #equivalence classes (the quasi vocabulary), never by
  * stream volume; the histogram read is the q173 counts-of-counts
  * aggregate over the already-reduced state.
  */
object StreamingKAnonymity {

  private def partialName(c: String) = "__p_" + c

  private def checkCols(quasiCols: Seq[String]): Unit = {
    require(quasiCols.nonEmpty, "quasiCols must be non-empty")
    // Spark's analyzer is case-insensitive: compare lowercased
    val lower = quasiCols.map(_.toLowerCase)
    require(lower.distinct == lower, s"duplicate quasiCols: $quasiCols")
    val clash = lower.filter(c => c == "n" || c.startsWith("__p_"))
    require(clash.isEmpty,
      s"quasi columns collide with StreamingKAnonymity bookkeeping names: $clash")
  }

  /** Merge one batch's class counts into the state; returns the
    * post-merge class-size table (quasiCols..., n). Caller must
    * materialize before `commit` (acceptBatch does).
    */
  def mergeBatch(batch: DataFrame, quasiCols: Seq[String],
                 statePath: String): DataFrame = {
    checkCols(quasiCols)
    val spark = batch.sparkSession
    val partial = batch
      .groupBy(quasiCols.map(c => col(c).as(partialName(c))): _*)
      .agg(count(lit(1)).as(partialName("n")))
    val empty = partial.limit(0)
      .select(quasiCols.map(c => col(partialName(c)).as(c)) :+
        col(partialName("n")).as("n"): _*)
    val state = PathIO.readSwapState(spark, statePath, empty)
    state.join(partial,
        quasiCols.map(c => col(c) <=> col(partialName(c))).reduce(_ && _),
        "full_outer")
      .select(quasiCols.map(c =>
        coalesce(col(c), col(partialName(c))).as(c)) :+
        (coalesce(col("n"), lit(0L)) +
          coalesce(col(partialName("n")), lit(0L))).cast("long").as("n"): _*)
  }

  /** Swap in the merged class-size table (call AFTER materializing). */
  def commit(statePath: String, merged: DataFrame): Unit =
    PathIO.writeSwap(merged, statePath)

  /** Merge + commit for batch callers; returns the materialized
    * post-merge class-size table.
    */
  def acceptBatch(batch: DataFrame, quasiCols: Seq[String],
                  statePath: String): DataFrame = {
    val merged = mergeBatch(batch, quasiCols, statePath)
      .localCheckpoint(true)
    commit(statePath, merged)
    merged
  }

  /** The k-anonymity release card over the maintained state — q226's
    * histogram (class_size, n_classes, n_rows, violates_k), derived
    * on demand so the gate reflects everything merged so far.
    */
  def kAnonymityView(classSizes: DataFrame, k: Long): DataFrame = {
    require(k >= 2L, s"k must be >= 2, got $k")
    graft.operators.Audit.kAnonymityHistogram(classSizes, "n", k)
  }
}
