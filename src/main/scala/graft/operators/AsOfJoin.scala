package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — the relational generalization of the reference's
  * nearest-slot lookup (reference J6: the linear argmin over the time
  * dim, scripts/get_raw_data/get_raw_streams_data.py:34-48, a NEAREST
  * match with first-win ties). Spark has no native as-of join; the
  * idiomatic scalable formulation is union + keyed window:
  *
  *   tag right rows, union both sides, one shuffle on the join keys,
  *   sort within partition by (ts, side), and carry the latest right
  *   payload forward with last(ignoreNulls) over an unbounded-preceding
  *   frame. The `forward` direction is the same pass sorted descending;
  *   `nearest` evaluates both and keeps the closer (ties -> backward,
  *   the reference's first-win argmin order).
  *
  * Cost: ONE shuffle of left+right (same as any keyed join); `backward`
  * and `forward` each add one sort, `nearest` two sorts over the same
  * exchange — no range-condition row explosion, no per-row probe, unlike
  * the inequality-join formulation which Catalyst can only run as
  * broadcast-nested-loop.
  */
object AsOfJoin {

  /** For each left row, attach the matching right row on `keys`:
    *
    *   - `backward`: latest right with `right.ts <= left.ts`
    *   - `forward` : earliest right with `right.ts >= left.ts`
    *   - `nearest` : whichever of the two is closer in time; on an exact
    *     tie the BACKWARD match wins (reference argmin scans ascending
    *     with a strict `<`, so the earlier candidate survives)
    *
    * `toleranceSeconds` (e.g. the reference's ±450 s slot band) nulls
    * out any match farther than the band — left rows are kept with null
    * right columns (left-outer semantics), same as a missing match.
    *
    * Determinism: when several right rows share an exact (keys, ts),
    * which one wins follows the partition sort's tie order — callers
    * needing a guarantee should pre-dedup the right side on (keys, ts)
    * (timestamps are usually unique at microsecond grain).
    *
    * @param rightCols right column -> output alias; aliases must not
    *                  collide with left column names.
    */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
           tsCol: String, rightCols: Map[String, String],
           direction: String = "backward",
           toleranceSeconds: Option[Double] = None): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be backward|forward|nearest, got: $direction")
    // __rts shares the payload struct with the right aliases, and the
    // tag/candidate columns ride top-level next to keys+ts — a caller
    // name colliding with either would resolve ambiguously downstream
    val reserved = Set("__rts", "__side", "__p", "__l", "__m", "__prev", "__next")
    require(!rightCols.values.exists(reserved), s"rightCols aliases must not use ${reserved.mkString("/")}")
    require(!(keys :+ tsCol).exists(reserved), s"join keys/ts column must not use ${reserved.mkString("/")}")
    val leftCols = left.columns.toSeq
    val keyAndTs = (keys :+ tsCol).map(col)

    // the right ts rides inside the payload so tolerance/nearest can
    // measure the match distance after the window pass
    val payload = struct(col(tsCol).as("__rts") +:
      rightCols.toSeq.map { case (c, a) => col(c).as(a) }: _*)
    val leftStruct = struct(leftCols.map(col): _*)

    val taggedRight = right.select(keyAndTs :+ payload.as("__p"): _*)
      .withColumn("__side", lit(0))
    val taggedLeft = left.select(keyAndTs :+ leftStruct.as("__l"): _*)
      .withColumn("__side", lit(1))
      .withColumn("__p", lit(null).cast(taggedRight.schema("__p").dataType))
    val unioned = taggedLeft.unionByName(
      taggedRight.withColumn("__l", lit(null).cast(taggedLeft.schema("__l").dataType)))

    // right rows (side 0) sort before left rows at equal ts — in BOTH
    // sort directions — so a right row at exactly left.ts is visible to
    // that left row from either side (<= / >= semantics)
    val base = Window.partitionBy(keys.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPrev = base.orderBy(col(tsCol).asc, col("__side").asc)
    val wNext = base.orderBy(col(tsCol).desc, col("__side").asc)

    val needPrev = direction != "forward"
    val needNext = direction != "backward"
    val withCands = unioned
      .withColumn("__prev",
        if (needPrev) last(col("__p"), ignoreNulls = true).over(wPrev)
        else lit(null).cast(taggedRight.schema("__p").dataType))
      .withColumn("__next",
        if (needNext) last(col("__p"), ignoreNulls = true).over(wNext)
        else lit(null).cast(taggedRight.schema("__p").dataType))
      .filter(col("__side") === 1)

    // plain backward/forward without a tolerance never measures the
    // match distance — skip the unix_micros arithmetic entirely so those
    // modes keep working on ANY ordered ts type (date, long, string),
    // not just TimestampType
    val chosen =
      if (toleranceSeconds.isEmpty && direction == "backward") col("__prev")
      else if (toleranceSeconds.isEmpty && direction == "forward") col("__next")
      else {
        val lts = unix_micros(col(tsCol))
        val prevDiff = lts - unix_micros(col("__prev").getField("__rts"))
        val nextDiff = unix_micros(col("__next").getField("__rts")) - lts
        val tolMicros = toleranceSeconds.map(t => math.round(t * 1e6))
        def gated(cand: Column, diff: Column): Column = tolMicros match {
          case Some(m) => when(diff <= lit(m), cand) // null cand -> null diff -> null
          case None    => cand
        }
        val prevOk = gated(col("__prev"), prevDiff)
        val nextOk = gated(col("__next"), nextDiff)
        direction match {
          case "backward" => prevOk
          case "forward"  => nextOk
          case "nearest"  =>
            when(prevOk.isNotNull && (nextOk.isNull || prevDiff <= nextDiff), prevOk)
              .otherwise(nextOk)
        }
      }

    withCands.withColumn("__m", chosen)
      .select(leftCols.map(c => col("__l").getField(c).as(c)) ++
        rightCols.values.toSeq.map(a => col("__m").getField(a).as(a)): _*)
  }

  /** Latest right row with `right.tsCol <= left.tsCol` (see `asof`). */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               tsCol: String, rightCols: Map[String, String]): DataFrame =
    asof(left, right, keys, tsCol, rightCols, direction = "backward")
}
