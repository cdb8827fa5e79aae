package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-round k-core peeling over an undirected pair graph — the
  * density screen that separates tightly-knit duplicate families
  * (every member keeps >= k strong neighbors) from the stars and
  * chains that one hub or chance collision strings together.
  * Components (q65) answer "what touches what", triangles (q157)
  * count local closure; the k-core answers "what remains when weak
  * attachments are peeled away": the maximal subgraph in which every
  * surviving node still has at least k surviving neighbors.
  *
  * Determinism: peeling has a UNIQUE fixpoint (the maximal k-core
  * does not depend on removal order) and every round is a degree
  * count plus a filter — integer arithmetic only — so any engine
  * agrees round-for-round and the oracle replays the same `rounds`
  * rounds as unrolled CTEs. `rounds` bounds WORK, not correctness:
  * each non-final round either strictly shrinks the node set or
  * already is the fixpoint, and the companion spec asserts that one
  * extra round changes nothing on the test corpus.
  *
  * Scale shape: per round one hash aggregate (degrees) and two
  * left-semi joins (edge endpoints against surviving nodes) — all
  * shuffles carry node ids only; lineage is truncated per round
  * (localCheckpoint, the PageRank hygiene) and superseded blocks are
  * freed eagerly. Rounds needed tracks peeling DEPTH — small for
  * near-dup graphs, worst case (a path peeling one layer per round)
  * bounded by the caller's `rounds`.
  */
object KCore {

  // localCheckpoint blocks live as cached RDDs; every LogicalRDD in a
  // frame checkpointed here is one this object created, so freeing by
  // pattern-match is safe (same argument as PageRank.freeCkpt).
  private def freeCkpt(df: DataFrame): Unit =
    df.queryExecution.analyzed.collect {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd
    }.foreach(_.unpersist(blocking = false))

  /** Surviving nodes after `rounds` peeling rounds at threshold `k`:
    * (node, deg) with deg measured INSIDE the surviving subgraph.
    * Input: one row per undirected pair.
    */
  def kcore(pairs: DataFrame, aCol: String = "id_a", bCol: String = "id_b",
            k: Int = 2, rounds: Int = 4): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    var edges = pairs.select(explode(array(
        struct(col(aCol).as("src"), col(bCol).as("dst")),
        struct(col(bCol).as("src"), col(aCol).as("dst")))).as("e"))
      .select(col("e.src"), col("e.dst")).distinct()
      .localCheckpoint(eager = true)
    for (_ <- 1 to rounds) {
      val keep = edges.groupBy(col("src")).agg(count(lit(1)).as("__deg"))
        .filter(col("__deg") >= k)
        .select(col("src"))
      val pruned = edges
        .join(keep, Seq("src"), "left_semi")
        .join(keep.withColumnRenamed("src", "dst"), Seq("dst"), "left_semi")
        .select(col("src"), col("dst"))
        .localCheckpoint(eager = true)
      freeCkpt(edges)
      edges = pruned
    }
    // degrees of the surviving subgraph — at the fixpoint all >= k
    val out = edges.groupBy(col("src"))
      .agg(count(lit(1)).cast("long").as("deg"))
      .select(col("src").as("node"), col("deg"))
    out
  }
}
