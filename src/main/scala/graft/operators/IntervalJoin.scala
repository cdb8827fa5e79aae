package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time interval join: every left row within a trailing window
  * of a right row on the same key — the attribution shape ("all clicks
  * in the hour before each purchase"), vs `AsOfJoin`'s nearest-ONE
  * semantics.
  *
  * ONE plan builder for batch and streaming: the join is an equi join
  * on the key with the time bound as a residual range predicate, which
  * is exactly the shape Structured Streaming's stream-stream join
  * requires to size its state retention (both inputs watermarked, the
  * range condition bounding how long a buffered row can still match).
  * Batch callers get a SortMergeJoin on the key — never a cartesian,
  * never an interval explosion.
  *
  * Inputs must have disjoint column names apart from `key` (project
  * before joining — the attribution entry renames to c_ts/p_ts); the
  * key survives once.
  */
object IntervalJoin {

  def within(left: DataFrame, right: DataFrame, key: String,
             leftTs: String, rightTs: String,
             maxLagSeconds: Long): DataFrame = {
    require(maxLagSeconds > 0, s"maxLagSeconds must be > 0, got $maxLagSeconds")
    val l = left.alias("l")
    val r = right.alias("r")
    val cond = col(s"l.$key") === col(s"r.$key") &&
      col(s"l.$leftTs") <= col(s"r.$rightTs") &&
      col(s"l.$leftTs") >= col(s"r.$rightTs") - expr(s"INTERVAL $maxLagSeconds SECONDS")
    val rightCols = right.columns.filterNot(_ == key)
      .map(c => col(s"r.$c")).toSeq
    l.join(r, cond)
      .select((left.columns.map(c => col(s"l.$c")).toSeq ++ rightCols): _*)
  }
}
