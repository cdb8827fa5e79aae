package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source BFS layers over an undirected edge list — the
  * traversal primitive next to the fixpoint family (PageRank/HITS/
  * k-core): distance-from-seed-set labeling, e.g. "how far does
  * contamination spread through the near-dup graph from a seed
  * cohort", "which docs sit within 2 hops of a flagged cluster".
  *
  * Exact by construction: BFS layer membership is a set computation
  * (no scores, no ties), so the output is engine- and
  * partitioning-independent, and the oracle replays the rounds as
  * unrolled CTEs.
  *
  * Scale shape: per round ONE (edges ⋈ frontier) equi-join, a
  * distinct, and an anti-join against the visited set — the textbook
  * distributed frontier expansion; rounds are caller-bounded
  * (`maxDepth`) and stop early on an empty frontier. The symmetric
  * edge list is checkpointed once and reused; per-round frames are
  * checkpointed and superseded ones freed (the PageRank discipline),
  * so lineage stays flat at any depth.
  */
object Bfs {

  /** (node, dist) for every node within `maxDepth` hops of the seed
    * set (dist 0 = the seeds themselves, whether or not they touch an
    * edge). Edges are undirected; NULL endpoints/seeds are dropped.
    */
  def layers(edges: DataFrame, aCol: String, bCol: String,
             seeds: DataFrame, seedCol: String, maxDepth: Int): DataFrame = {
    require(maxDepth >= 1 && maxDepth <= 12,
      s"maxDepth must be in [1,12]: $maxDepth (deeper probes want the " +
        "Components min-label loop, not layer-exact BFS)")
    // filter BEFORE symmetrizing so the reversed half can't smuggle a
    // NULL endpoint past the documented drop contract
    val clean = edges
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
    val e = clean
      .select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionAll(clean.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct().localCheckpoint(eager = true)
    var visited = seeds
      .filter(col(seedCol).isNotNull)
      .select(col(seedCol).as("node")).distinct()
      .withColumn("dist", lit(0L))
      .localCheckpoint(eager = true)
    var frontier = visited
    var d = 0
    var exhausted = false
    while (d < maxDepth && !exhausted) {
      d += 1
      val next = e
        .join(frontier.select(col("node").as("src")), "src")
        .select(col("dst").as("node")).distinct()
        .join(visited.select("node"), Seq("node"), "left_anti")
        .withColumn("dist", lit(d.toLong))
        .localCheckpoint(eager = true)
      if (next.isEmpty) {
        PageRank.freeCkpt(next)
        exhausted = true
      } else {
        val grown = visited.unionAll(next).localCheckpoint(eager = true)
        if (frontier ne visited) PageRank.freeCkpt(frontier)
        PageRank.freeCkpt(visited)
        visited = grown
        frontier = next
      }
    }
    if (frontier ne visited) PageRank.freeCkpt(frontier)
    PageRank.freeCkpt(e)
    visited
  }
}
