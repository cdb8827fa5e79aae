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
  * Algorithm: iterative hash-to-min CONTRACTION with mapping
  * squaring. Each round contracts the edge set through the current
  * root mapping (same-root edges drop, so basins merge — the unit of
  * progress min-propagation lacks), hooks every super-node to the
  * minimum of itself and its contracted neighbors, composes the hook
  * into the mapping, and squares the mapping (`root <- root(root)`) —
  * the cumulative pointer doubling that turns sorted-id chains into
  * O(log n) rounds. Rounds stop when no super-edges remain: each
  * component has contracted to one super-node, necessarily its min.
  *
  * Scale: the edge list is O(candidates) (bounded by the LSH band
  * shape, never n^2), each round shuffles only (node, root) pairs and
  * edges on uniformly-hashed ids, and every round's frame is eagerly
  * `localCheckpoint`ed — the plan stays O(1) deep instead of growing
  * per iteration (lineage blowup is the classic failure of iterative
  * DataFrame loops). Checkpoint hygiene: each round explicitly frees
  * the superseded round's blocks (see `free`) instead of waiting for
  * the ContextCleaner, so block-manager occupancy is bounded at a few
  * round-frames regardless of iteration count. Convergence is tested
  * on the round's already-materialized contracted frame — no extra
  * join, no re-execution. LSH candidate graphs are locally dense
  * (bucket near-cliques), so in practice convergence is 2-5 rounds;
  * contraction bounds the basin-chain case (the old jump-only loop
  * measured 41 rounds on the percolated sf0.1 embedding graph) and
  * mapping-squaring the sorted-chain case (9-14 rounds measured on
  * 4k/10k adversarial paths in the validation harness).
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

  /** Rounds the most recent `connectedComponents` call took to reach its
    * fixpoint — observability for the scale probes (PERF.md records
    * rounds-to-convergence at 10M edges); 0 when the driver fast path
    * ran. Not part of the result contract and racy under concurrent
    * calls by design.
    */
  @volatile private[graft] var lastRounds: Int = 0

  /** Natural driver-side ordering for id types whose Spark `min`/`least`
    * semantics we can reproduce exactly in the fast path; null (take the
    * distributed loop) for anything else.
    */
  private def driverOrdering(dt: org.apache.spark.sql.types.DataType): Ordering[Any] = {
    import org.apache.spark.sql.types._
    (dt match {
      case LongType    => Ordering.by((x: Any) => x.asInstanceOf[Long])
      case IntegerType => Ordering.by((x: Any) => x.asInstanceOf[Int])
      case ShortType   => Ordering.by((x: Any) => x.asInstanceOf[Short])
      case ByteType    => Ordering.by((x: Any) => x.asInstanceOf[Byte])
      // Spark's min over StringType compares UTF8String BYTES (code
      // points); Java's String ordering compares UTF-16 code units.
      // They disagree when a supplementary-plane char (surrogate pair,
      // high unit < 0xE000) meets a char in [U+E000, U+FFFF] — so
      // compare UTF-8 bytes unsigned, matching the distributed loop
      case StringType => new Ordering[Any] {
        def compare(a: Any, b: Any): Int = {
          val x = a.asInstanceOf[String].getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val y = b.asInstanceOf[String].getBytes(java.nio.charset.StandardCharsets.UTF_8)
          var i = 0
          val n = math.min(x.length, y.length)
          while (i < n) {
            val d = (x(i) & 0xff) - (y(i) & 0xff)
            if (d != 0) return d
            i += 1
          }
          x.length - y.length
        }
      }
      case _           => null
    }): Ordering[Any]
  }

  /** Driver union-find over a collected (already symmetrized, distinct,
    * checkpointed) edge frame: path-compressed find, union by rank, then
    * a min-id sweep so `component` is the smallest id of each component
    * — bit-identical to the distributed loop's fixpoint.
    */
  private def localComponents(edges: DataFrame, ord: Ordering[Any]): DataFrame = {
    val parent = new java.util.HashMap[Any, Any]()
    val rank = new java.util.HashMap[Any, Int]()
    def find(x: Any): Any = {
      var r = x
      while (parent.get(r) != r) r = parent.get(r)
      var c = x // path compression
      while (parent.get(c) != r) { val n = parent.get(c); parent.put(c, r); c = n }
      r
    }
    def add(x: Any): Unit =
      if (!parent.containsKey(x)) { parent.put(x, x); rank.put(x, 0) }
    edges.collect().foreach { row =>
      val (a, b) = (row.get(0), row.get(1))
      add(a); add(b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) {
        val (hi, lo) = if (rank.get(ra) >= rank.get(rb)) (ra, rb) else (rb, ra)
        parent.put(lo, hi)
        if (rank.get(ra) == rank.get(rb)) rank.put(hi, rank.get(hi) + 1)
      }
    }
    // min id per root, then (node, minOfRoot)
    val minOf = new java.util.HashMap[Any, Any]()
    parent.keySet().forEach { n =>
      val r = find(n)
      val m = minOf.get(r)
      if (m == null || ord.lt(n, m)) minOf.put(r, n)
    }
    val spark = edges.sparkSession
    val dt = edges.schema("src").dataType
    val rows = new java.util.ArrayList[org.apache.spark.sql.Row](parent.size())
    parent.keySet().forEach { n =>
      rows.add(org.apache.spark.sql.Row(n, minOf.get(find(n))))
    }
    lastRounds = 0
    spark.createDataFrame(rows, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("node", dt),
      org.apache.spark.sql.types.StructField("component", dt))))
  }

  /** (node, component) for every node appearing in `pairs`, where
    * `component` is the minimum id in the node's connected component.
    * The result is eagerly materialized (localCheckpoint); release its
    * blocks with `free` when done.
    *
    * Two physical strategies behind one contract:
    *   - edge lists at or under `localEdgeLimit` (counted AFTER
    *     symmetrize+distinct, off the already-materialized checkpoint)
    *     collect to the driver and run union-find with path compression
    *     — the same "the collect IS the algorithm" economics as the
    *     bin-packing partitioner: LSH candidate graphs are a sliver of
    *     the corpus, and a graph of 2M edges resolves in milliseconds
    *     where every distributed round would cost whole-cluster jobs.
    *   - larger graphs run the iterative min-label + pointer-jumping
    *     loop below; rounds are O(log n) on adversarial chains
    *     (measured: 11 rounds for 1024-node paths, PERF.md) and 2-4 on
    *     the locally-dense graphs LSH banding emits.
    *
    * @param pairs undirected edges, one per row
    * @param maxIter hard stop for pathological graphs; the result is
    *                still a valid (coarser) clustering if hit, and a
    *                warning is logged
    * @param localEdgeLimit symmetric-edge-count threshold for the
    *                driver fast path; 0 forces the distributed loop
    *                (the spec and scale-probe setting). Ids of a type
    *                with no driver-side ordering (anything beyond
    *                integral/string) always take the distributed loop.
    */
  def connectedComponents(pairs: DataFrame, aCol: String = "id_a",
                          bCol: String = "id_b", maxIter: Int = 25,
                          localEdgeLimit: Long = 2000000L): DataFrame = {
    // symmetric edge list: each undirected pair contributes both
    // directions so one groupBy(src) sees every neighbor. Built with
    // explode(array(...)) — ONE scan of `pairs`, whose plan is often an
    // expensive candidate generation (a union of two projections would
    // execute that subtree twice: no exchange reuse across differing
    // projections).
    val edges = checkpointOwned(
      pairs.select(explode(array(
          struct(col(aCol).as("src"), col(bCol).as("dst")),
          struct(col(bCol).as("src"), col(aCol).as("dst")))).as("e"))
        .select(col("e.src"), col("e.dst"))
        .distinct())

    val idType = edges.schema("src").dataType
    val localOrd = driverOrdering(idType)
    if (localOrd != null && edges.count() <= localEdgeLimit) {
      val out = localComponents(edges, localOrd)
      free(edges)
      return out
    }

    // Hash-to-min contraction + mapping squaring (round 13; the round
    // shape was validated in the DuckDB oracle harness before landing
    // here). The previous loop relaxed one hop + jumped one pointer
    // per round, which measures +1..2 hops/round on percolated LSH
    // chains — labels stall at local-minimum basin BOUNDARIES, so
    // rounds grew with component diameter (41 on the real sf0.1
    // embedding graph vs maxIter = 25). Each round now:
    //
    //  1. CONTRACTS the original edge set through the current root
    //     mapping (distinct super-edges, same-root edges drop) — so
    //     basins are the unit of progress: every basin merges with at
    //     least one neighbor per round, which the jump-only loop
    //     could not do;
    //  2. hooks every super-node to min(self, neighbors) on the
    //     contracted frame and composes the hook into the mapping;
    //  3. SQUARES the mapping (root := root-of-root) — the cumulative
    //     pointer doubling that makes sorted-id chains (where hooking
    //     alone advances additively and contraction never collides
    //     labels) converge in O(log n).
    //
    // Measured rounds-to-convergence in the validation harness: 9-14
    // on 4k/10k sorted AND shuffled paths, 5 on the real percolated
    // sf0.1 embedding graph, 2-4 on LSH near-cliques. Convergence is
    // "no super-edges remain" — every component contracted to one
    // super-node, necessarily its min (the min never hooks upward and
    // roots never leave the component) — tested on the round's
    // already-materialized frame instead of a fixpoint diff.
    var mapping = checkpointOwned(
      edges.select(col("src").as("node"))
        .distinct()
        .select(col("node"), col("node").as("root")))
    var done = false
    var it = 0
    while (!done && it < maxIter) {
      val contracted = checkpointOwned(
        edges
          .join(mapping.select(col("node").as("src"),
            col("root").as("sroot")), "src")
          .join(mapping.select(col("node").as("dst"),
            col("root").as("droot")), "dst")
          .filter(col("sroot") =!= col("droot"))
          .select(col("sroot").as("src"), col("droot").as("dst"))
          .distinct())
      if (contracted.isEmpty) {
        done = true
        free(contracted)
      } else {
        val hook = checkpointOwned(
          contracted.groupBy(col("src"))
            .agg(least(col("src"), min(col("dst"))).as("lab"))
            .select(col("src").as("node"), col("lab")))
        val composed = checkpointOwned(
          mapping.join(hook.select(col("node").as("root"), col("lab")),
              Seq("root"), "left")
            .select(col("node"),
              coalesce(col("lab"), col("root")).as("root")))
        val squared = checkpointOwned(
          composed.join(composed.select(col("node").as("root"),
              col("root").as("root2")), Seq("root"), "left")
            .select(col("node"),
              coalesce(col("root2"), col("root")).as("root")))
        free(contracted); free(hook); free(composed); free(mapping)
        mapping = squared
        it += 1
      }
    }
    lastRounds = it
    if (!done)
      org.slf4j.LoggerFactory.getLogger(getClass)
        .warn(s"connectedComponents stopped at maxIter=$maxIter before convergence")
    val out = mapping.select(col("node"), col("root").as("component"))
    free(edges)
    out
  }

  /** Duplicate-cluster size histogram over a component assignment —
    * the audit that tells whether near-dup collapse found a few huge
    * boilerplate clusters or a long tail of pairs (the two need
    * different remediation). Two bounded aggregations: one row per
    * component, then one row per distinct size.
    */
  def sizeHistogram(assignment: DataFrame,
                    componentCol: String = "component"): DataFrame =
    assignment
      .groupBy(col(componentCol))
      .agg(count(lit(1)).as("size"))
      .groupBy(col("size"))
      .agg(count(lit(1)).as("n_clusters"))
}
