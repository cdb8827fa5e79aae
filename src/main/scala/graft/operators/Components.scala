package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a candidate-pair graph — the cluster
  * resolution step of near-duplicate deduplication. The pairwise
  * operators (`Dedup.minhashCandidates`, `simhashPairs`,
  * `embeddingNearDups`) emit edges; dedup policy usually keeps ONE doc
  * per connected component (transitive closure), not merely one per
  * pair — A~B and B~C must collapse A, B, C together even when A and C
  * never share a bucket.
  *
  * Algorithm: iterative min-label propagation with pointer jumping.
  * Each round every node takes the minimum label over itself and its
  * neighbors (one join + one map-side-combining aggregate on the edge
  * list), then labels are shortcut through themselves
  * (`L(v) <- L(L(v))`, one more join) — the path-halving that turns
  * linear chains into O(log n) rounds instead of O(diameter). Rounds
  * stop when no label changes.
  *
  * Scale: the edge list is O(candidates) (bounded by the LSH band
  * shape, never n^2), each round shuffles only (node, label) pairs and
  * edges on uniformly-hashed ids, and every round's frame is eagerly
  * `localCheckpoint`ed — the plan stays O(1) deep instead of growing
  * per iteration (lineage blowup is the classic failure of iterative
  * DataFrame loops). Checkpoint hygiene: each round explicitly frees
  * the superseded round's blocks (see `free`) instead of waiting for
  * the ContextCleaner, so block-manager occupancy is bounded at two
  * round-frames regardless of iteration count. The neighbor-min frame
  * is checkpointed BEFORE the pointer-jumping self-join consumes it
  * twice, and the previous label rides along so convergence is a scan
  * of the already-materialized blocks — no extra join, no re-execution.
  * LSH candidate graphs are locally dense (bucket near-cliques), so in
  * practice convergence is 2-4 rounds; the pointer-jumping bound covers
  * the adversarial chain case.
  *
  * Labels are min doc ids, so the result is deterministic under any
  * partitioning: `component` = the smallest id reachable from `node`.
  */
object Components {

  // RDD ids of the localCheckpoints THIS object created. `free` releases
  // only these, so a caller who joins a components result with some other
  // checkpointed frame before freeing cannot lose that frame's blocks
  // (localCheckpoint blocks are unrecoverable once dropped — unpersisting
  // a stranger's would make its later reads throw).
  private val owned = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()

  private def checkpointOwned(df: DataFrame): DataFrame = {
    val out = df.localCheckpoint(eager = true)
    out.queryExecution.analyzed.foreach {
      case r: org.apache.spark.sql.execution.LogicalRDD => owned.add(r.rdd.id)
      case _ =>
    }
    out
  }

  /** Release the localCheckpoint blocks backing `df` (a frame returned
    * by `connectedComponents`). Checkpoint blocks are otherwise held
    * until the ContextCleaner notices the RDD is unreachable; a caller
    * done with the result should free it deterministically — the same
    * discipline `CurationPipeline.Result.unpersist()` applies to its
    * caches. Only blocks `connectedComponents` itself checkpointed are
    * touched: other LogicalRDDs in `df`'s plan (a caller's own
    * checkpoints, joined in afterwards) are left alone.
    */
  def free(df: DataFrame): Unit =
    df.queryExecution.analyzed.collect {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd
    }.foreach(rdd => if (owned.remove(rdd.id)) rdd.unpersist(blocking = false))

  /** (node, component) for every node appearing in `pairs`, where
    * `component` is the minimum id in the node's connected component.
    * The result is eagerly materialized (localCheckpoint); release its
    * blocks with `free` when done.
    *
    * @param pairs undirected edges, one per row
    * @param maxIter hard stop for pathological graphs; the result is
    *                still a valid (coarser) clustering if hit, and a
    *                warning is logged
    */
  def connectedComponents(pairs: DataFrame, aCol: String = "id_a",
                          bCol: String = "id_b", maxIter: Int = 25): DataFrame = {
    // symmetric edge list: each undirected pair contributes both
    // directions so one groupBy(src) sees every neighbor
    val half = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
    val edges = checkpointOwned(
      half.union(half.select(col("dst").as("src"), col("src").as("dst")))
        .distinct())

    var labels = checkpointOwned(
      edges.select(col("src").as("node"))
        .distinct()
        .withColumn("lab", col("node")))

    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      // neighbor-min: smallest label among self and neighbors
      val viaEdges = edges
        .join(labels.withColumnRenamed("node", "dst")
                    .withColumnRenamed("lab", "nlab"), "dst")
        .groupBy(col("src").as("node"))
        .agg(min(col("nlab")).as("nmin"))
      // checkpointed BEFORE the self-join below reads it twice —
      // otherwise the join+aggregate subtree executes once per consumer
      val stepped = checkpointOwned(
        labels.join(viaEdges, Seq("node"), "left")
          .select(col("node"), col("lab").as("prev"),
            least(col("lab"), col("nmin")).as("lab")))
      // pointer jumping: follow the label's own label (labels are node
      // ids, so they index back into the same frame); `prev` rides along
      // so the convergence test is a filter over THIS round's
      // materialized blocks instead of a join against the old labels
      val jumped = checkpointOwned(
        stepped.as("s")
          .join(stepped.select(col("node").as("lab"), col("lab").as("lab2")).as("t"),
            Seq("lab"), "left")
          .select(col("node"), col("prev"), coalesce(col("lab2"), col("lab")).as("lab")))
      converged = jumped.filter(col("lab") =!= col("prev")).isEmpty
      // both superseded round-frames are dead now — release their blocks
      free(stepped)
      free(labels)
      labels = jumped.select(col("node"), col("lab"))
      it += 1
    }
    if (!converged)
      org.slf4j.LoggerFactory.getLogger(getClass)
        .warn(s"connectedComponents stopped at maxIter=$maxIter before convergence")
    val out = labels.select(col("node"), col("lab").as("component"))
    free(edges)
    out
  }
}
