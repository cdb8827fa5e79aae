package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-predecessor) join — the relational generalization of
  * the reference's nearest-slot lookup (reference J6: the linear argmin
  * over the time dim, scripts/get_raw_data/get_raw_streams_data
  * .py:34-48). Spark has no native as-of join; the idiomatic scalable
  * formulation is union + keyed window:
  *
  *   tag right rows, union both sides, one shuffle on the join keys,
  *   sort within partition by (ts, side), and carry the latest right
  *   payload forward with last(ignoreNulls) over an unbounded-preceding
  *   frame.
  *
  * Cost: ONE shuffle of left+right (same as any keyed join) and a sort —
  * no range-condition row explosion, no per-row probe, unlike the
  * inequality-join formulation which Catalyst can only run as
  * broadcast-nested-loop.
  */
object AsOfJoin {

  /** For each left row, attach the latest right row with
    * `right.tsCol <= left.tsCol`, matching on `keys`. Left rows without
    * a predecessor keep null right columns (left-outer semantics).
    *
    * Determinism: when several right rows share an exact (keys, ts),
    * which one wins follows the partition sort's tie order — callers
    * needing a guarantee should pre-dedup the right side on (keys, ts)
    * (timestamps are usually unique at microsecond grain).
    *
    * @param rightCols right column -> output alias; aliases must not
    *                  collide with left column names.
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               tsCol: String, rightCols: Map[String, String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val keyAndTs = (keys :+ tsCol).map(col)

    val payload = struct(rightCols.toSeq.map { case (c, a) => col(c).as(a) }: _*)
    val leftStruct = struct(leftCols.map(col): _*)

    val taggedRight = right.select(keyAndTs :+ payload.as("__p"): _*)
      .withColumn("__side", lit(0))
    val taggedLeft = left.select(keyAndTs :+ leftStruct.as("__l"): _*)
      .withColumn("__side", lit(1))
      .withColumn("__p", lit(null).cast(taggedRight.schema("__p").dataType))
    val unioned = taggedLeft.unionByName(
      taggedRight.withColumn("__l", lit(null).cast(taggedLeft.schema("__l").dataType)))

    // right rows (side 0) sort before left rows at equal ts, so a right
    // row at exactly left.ts is visible to that left row (<= semantics)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    unioned.withColumn("__prev", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(c => col("__l").getField(c).as(c)) ++
        rightCols.values.toSeq.map(a => col("__prev").getField(a).as(a)): _*)
  }
}
