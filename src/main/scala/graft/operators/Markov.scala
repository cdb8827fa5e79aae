package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-order Markov transition statistics over ordered event
  * sequences — the "what happens after a click?" navigation model and
  * the input to next-event prediction, anomaly scoring (improbable
  * transitions), and sankey rendering. q246's top-paths view counts
  * whole prefixes; this factors the same sequences into their memory-1
  * structure.
  *
  * Scale shape: ONE window pass partitioned by the sequence key (a
  * (user, day) grain — thousands of small independent partitions, never
  * a global sort), then two hash aggregates: (from, to) pair counts and
  * per-from totals. The transition matrix is |types|² — nature-bounded
  * — so the totals join is a broadcast. Probabilities are exact
  * floor-division basis points; no doubles anywhere.
  */
object Markov {

  /** Transition counts and probabilities between consecutive values of
    * `typeCol`, ordered by `ordCols` WITHIN each `groupCols` sequence
    * (transitions never cross a sequence boundary). `ordCols` must be a
    * total order within each group (include a unique id as the final
    * tie-break) or pair formation is nondeterministic.
    *
    * Output: `from_type`, `to_type`, `n` (BIGINT pair count), `prob_bp`
    * (floor(n·10⁴ / Σ_to n) — each from-row's outgoing distribution in
    * basis points).
    */
  def transitions(events: DataFrame, groupCols: Seq[String],
                  ordCols: Seq[String], typeCol: String): DataFrame = {
    require(groupCols.nonEmpty, "transitions needs at least one group column")
    require(ordCols.nonEmpty, "transitions needs at least one order column")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(ordCols.map(col): _*)
    val pairs = events
      .filter(col(typeCol).isNotNull &&
        groupCols.map(col(_).isNotNull).reduce(_ && _))
      .select((groupCols ++ ordCols).map(col) :+ col(typeCol).as("__t"): _*)
      .withColumn("__next", lead(col("__t"), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col("__t").as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).cast("long").as("n"))
    val fromTot = pairs.groupBy(col("from_type"))
      .agg(sum(col("n")).cast("long").as("__ft"))
    pairs.join(broadcast(fromTot), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        call_function("div", col("n") * 10000L, col("__ft")).as("prob_bp"))
  }
}
