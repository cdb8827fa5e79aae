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
    val pairs = pairCounts(events, groupCols, ordCols, typeCol)
    val fromTot = pairs.groupBy(col("from_type"))
      .agg(sum(col("n")).cast("long").as("__ft"))
    pairs.join(broadcast(fromTot), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        call_function("div", col("n") * 10000L, col("__ft")).as("prob_bp"))
  }

  /** The shared (from, to, n) pair-count core of [[transitions]] and
    * [[nextEntropy]] — one window pass, one hash aggregate.
    */
  private def pairCounts(events: DataFrame, groupCols: Seq[String],
                         ordCols: Seq[String],
                         typeCol: String): DataFrame = {
    require(groupCols.nonEmpty, "transitions needs at least one group column")
    require(ordCols.nonEmpty, "transitions needs at least one order column")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(ordCols.map(col): _*)
    events
      .filter(col(typeCol).isNotNull &&
        groupCols.map(col(_).isNotNull).reduce(_ && _))
      .select((groupCols ++ ordCols).map(col) :+ col(typeCol).as("__t"): _*)
      .withColumn("__next", lead(col("__t"), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col("__t").as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).cast("long").as("n"))
  }

  /** Conditional next-event entropy per current state — "after a
    * click, how PREDICTABLE is what happens next?" Low entropy means
    * the state funnels (a good place for prefetching or a suspicious
    * place for bot traffic); high entropy means the state branches.
    * H(next | from = f) = Σ_t (n_ft/n_f)·log₁₀(n_f/n_ft), the
    * `labelEntropy` discipline: each term is ONE fixed-order double
    * over exact BIGINT counts, pround6, summed as DECIMAL(18,6).
    *
    * Scale shape: the [[transitions]] pair core plus one broadcast
    * totals join over the |types|²-bounded pair table.
    */
  def nextEntropy(events: DataFrame, groupCols: Seq[String],
                  ordCols: Seq[String], typeCol: String): DataFrame = {
    val pairs = pairCounts(events, groupCols, ordCols, typeCol)
    val fromTot = pairs.groupBy(col("from_type"))
      .agg(sum(col("n")).cast("long").as("__ft"),
        count(lit(1)).cast("long").as("__nt"))
    val contrib = (col("n").cast("double") / col("__ft").cast("double")) *
      log10(col("__ft").cast("double") / col("n").cast("double"))
    pairs.join(broadcast(fromTot), Seq("from_type"))
      .withColumn("__h",
        graft.functions.Rounding.p6(contrib).cast("decimal(18,6)"))
      .groupBy(col("from_type"))
      .agg(max(col("__ft")).as("n_out"),
        max(col("__nt")).as("n_to_types"),
        sum(col("__h")).cast("double").as("h_next"))
  }
}
