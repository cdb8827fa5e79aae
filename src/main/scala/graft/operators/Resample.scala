package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-series regularization: resample an irregular event stream onto
  * a fixed per-key grid, carrying the latest observation forward into
  * each slot (as-of backward fill) — the transform that turns raw
  * events into the evenly-spaced series a dashboard or feature store
  * consumes. The reference's 15-minute snapshot slots are the same
  * idea applied at ingest time; this is the query-side generalization.
  *
  * Grid slots are epoch-aligned multiples of `stepSeconds` spanning
  * each key's observed range (long modular arithmetic — no float
  * division, so slot boundaries are engine-exact). The fill reuses
  * `AsOfJoin.backward` on MICROSECOND epochs: grid rows are the left
  * side, so cost is O(slots + events) through the one shared as-of
  * window, per key — slots before a key's first event stay null (there
  * is nothing to carry), which the left-join semantics give for free.
  */
object Resample {

  /** One row per (key, slot) with `valCols` (right-name -> out-name)
    * carried forward from the latest event at or before the slot.
    * Output grid column: `slot` = epoch SECONDS of the slot boundary.
    */
  def gapFill(events: DataFrame, keyCol: String, tsCol: String,
              valCols: Map[String, String], stepSeconds: Long): DataFrame = {
    require(stepSeconds > 0, s"step must be positive: $stepSeconds")
    val stepUs = stepSeconds * 1000000L
    val ev = events
      .withColumn("__tus", unix_micros(col(tsCol)))
      .select((col(keyCol) +: col("__tus") +: valCols.keys.toSeq.sorted.map(col)): _*)
    def align(c: org.apache.spark.sql.Column) = c - pmod(c, lit(stepUs))
    val grid = ev.groupBy(col(keyCol))
      .agg(min(col("__tus")).as("__mn"), max(col("__tus")).as("__mx"))
      .select(col(keyCol),
        explode(sequence(align(col("__mn")), align(col("__mx")), lit(stepUs)))
          .as("__tus"))
    AsOfJoin.backward(grid, ev, Seq(keyCol), "__tus", valCols)
      .withColumn("slot", expr("__tus div 1000000"))
      .select((col(keyCol) +: col("slot") +: valCols.values.toSeq.sorted.map(col)): _*)
  }
}
