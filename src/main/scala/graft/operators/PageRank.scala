package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank over an undirected pair graph (near-dup
  * candidates, co-citation, link graphs) in INTEGER arithmetic.
  *
  * Why integer: the classic damped power iteration in doubles depends
  * on accumulation order, so two engines (or two partitionings) round
  * differently and the result can't be hash-compared. Here every node
  * starts with `unit` surfer micro-units and each round distributes
  * floor(rank(u) * dampNum / (dampDen * deg(u))) to every neighbor —
  * all BIGINT, so after k rounds the ranks are bit-identical on any
  * engine and any partitioning (the DuckDB oracle replays the same k
  * rounds as unrolled CTEs). Floor loses < 1 unit per edge per round:
  * irrelevant for a ranking statistic, and exactly mirrored by the
  * oracle.
  *
  * Scale shape: one symmetric edge list built from ONE scan of the
  * pair frame (the pair plan is usually an expensive candidate
  * generation), checkpointed once and reused every round; each round
  * is edges ⋈ ranks (shuffle on src) + one hash aggregate on dst —
  * the degree rides WITH the rank frame so a round joins the edge
  * list against ONE small frame, and lineage is truncated per round
  * (localCheckpoint) so the plan stays flat at any iteration count.
  * No driver-side collect at any point; superseded round frames are
  * freed eagerly.
  */
object PageRank {

  // Dataset.unpersist only drops CacheManager entries; localCheckpoint
  // blocks live as cached RDDs and must be released on their RDD. Every
  // LogicalRDD inside a frame checkpointed HERE is one this object
  // created (a checkpointed frame's plan is its own single LogicalRDD),
  // so unlike Components no ownership bookkeeping is needed.
  private[operators] def freeCkpt(df: DataFrame): Unit =
    df.queryExecution.analyzed.collect {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd
    }.foreach(_.unpersist(blocking = false))

  /** Ranks after `iterations` rounds. Input: one row per undirected
    * pair. Output: (node, deg, rank) for every node in the graph.
    */
  def ranks(pairs: DataFrame, aCol: String = "id_a", bCol: String = "id_b",
            iterations: Int = 5, unit: Long = 1000000L,
            dampNum: Long = 85L, dampDen: Long = 100L): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(dampNum > 0 && dampNum < dampDen,
      s"damping must satisfy 0 < dampNum < dampDen, got $dampNum/$dampDen")
    val edges = pairs.select(explode(array(
        struct(col(aCol).as("src"), col(bCol).as("dst")),
        struct(col(bCol).as("src"), col(aCol).as("dst")))).as("e"))
      .select(col("e.src"), col("e.dst")).distinct()
      .localCheckpoint(eager = true)
    val base = unit * (dampDen - dampNum) / dampDen
    // every node of an undirected pair graph has deg >= 1 — no
    // dangling-mass redistribution term needed
    var ranks = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .select(col("src").as("node"), col("deg"), lit(unit).as("rank"))
      .localCheckpoint(eager = true)
    for (_ <- 1 to iterations) {
      val contrib = edges
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
          expr(s"rank * ${dampNum}L div (${dampDen}L * deg)").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("inflow"))
      val stepped = ranks.select(col("node"), col("deg"))
        .join(contrib, Seq("node"), "left")
        .select(col("node"), col("deg"),
          (lit(base) + coalesce(col("inflow"), lit(0L))).as("rank"))
        .localCheckpoint(eager = true)
      freeCkpt(ranks)
      ranks = stepped
    }
    freeCkpt(edges)
    ranks
  }

  /** Weighted ranks: each neighbor receives mass proportional to the
    * edge weight over the node's STRENGTH (sum of incident weights) —
    * floor(rank * dampNum * w / (dampDen * strength)), still all
    * BIGINT, so the fixpoint stays engine- and partitioning-exact.
    * Input: one row per undirected pair with a positive integer
    * weight column (e.g. basket-pair supports). Overflow contract:
    * rank * dampNum * maxWeight < 2^63 — rank is bounded by
    * n_nodes * unit in the all-mass-on-one-hub worst case, so with
    * the default unit keep n_nodes * maxWeight below ~10^11 or shrink
    * `unit`. Same per-round plan and checkpoint hygiene as [[ranks]].
    */
  def weightedRanks(pairs: DataFrame, aCol: String = "id_a",
                    bCol: String = "id_b", wCol: String = "w",
                    iterations: Int = 3, unit: Long = 1000000L,
                    dampNum: Long = 85L, dampDen: Long = 100L): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(dampNum > 0 && dampNum < dampDen,
      s"damping must satisfy 0 < dampNum < dampDen, got $dampNum/$dampDen")
    val edges = pairs.select(explode(array(
        struct(col(aCol).as("src"), col(bCol).as("dst"), col(wCol).as("w")),
        struct(col(bCol).as("src"), col(aCol).as("dst"), col(wCol).as("w"))))
        .as("e"))
      .select(col("e.src"), col("e.dst"), col("e.w").cast("long").as("w"))
      .distinct()
      .localCheckpoint(eager = true)
    val base = unit * (dampDen - dampNum) / dampDen
    var ranks = edges.groupBy(col("src"))
      .agg(sum(col("w")).cast("long").as("strength"))
      .select(col("src").as("node"), col("strength"), lit(unit).as("rank"))
      .localCheckpoint(eager = true)
    for (_ <- 1 to iterations) {
      val contrib = edges
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
          expr(s"rank * ${dampNum}L * w div (${dampDen}L * strength)").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("inflow"))
      val stepped = ranks.select(col("node"), col("strength"))
        .join(contrib, Seq("node"), "left")
        .select(col("node"), col("strength"),
          (lit(base) + coalesce(col("inflow"), lit(0L))).as("rank"))
        .localCheckpoint(eager = true)
      freeCkpt(ranks)
      ranks = stepped
    }
    freeCkpt(edges)
    ranks
  }

  /** Personalized PageRank: the random surfer restarts only at the
    * SEED nodes, so rank measures graph proximity to the seed set —
    * "which documents sit in the near-dup neighborhood of this known
    * batch?" where the global [[ranks]] answers "which documents are
    * hubs at all?". Same integer fixpoint discipline: seeds start
    * with `unit` micro-units (others 0), each round distributes
    * floor(rank·dampNum / (dampDen·deg)) along edges, and the restart
    * mass floor(unit·(dampDen−dampNum)/dampDen) returns ONLY to
    * seeds — bit-identical on any engine/partitioning, replayed by
    * the oracle as unrolled CTEs.
    *
    * `seeds` is one column of node ids (ids absent from the graph
    * are ignored — they have no edges to receive or send mass). It
    * joins the node frame once as a flag; per-round plans are
    * otherwise identical to [[ranks]], including the checkpoint-and-
    * free hygiene. Output: (node, deg, is_seed, rank).
    */
  def personalizedRanks(pairs: DataFrame, seeds: DataFrame,
                        aCol: String = "id_a", bCol: String = "id_b",
                        iterations: Int = 4, unit: Long = 1000000L,
                        dampNum: Long = 85L,
                        dampDen: Long = 100L): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(dampNum > 0 && dampNum < dampDen,
      s"damping must satisfy 0 < dampNum < dampDen, got $dampNum/$dampDen")
    val edges = pairs.select(explode(array(
        struct(col(aCol).as("src"), col(bCol).as("dst")),
        struct(col(bCol).as("src"), col(aCol).as("dst")))).as("e"))
      .select(col("e.src"), col("e.dst")).distinct()
      .localCheckpoint(eager = true)
    val base = unit * (dampDen - dampNum) / dampDen
    val seedSet = seeds.select(col(seeds.columns.head).as("node"))
      .distinct().withColumn("__seed", lit(true))
    var ranks = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .select(col("src").as("node"), col("deg"))
      .join(seedSet, Seq("node"), "left")
      .select(col("node"), col("deg"),
        coalesce(col("__seed"), lit(false)).as("is_seed"),
        when(coalesce(col("__seed"), lit(false)), lit(unit))
          .otherwise(lit(0L)).as("rank"))
      .localCheckpoint(eager = true)
    for (_ <- 1 to iterations) {
      val contrib = edges
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
          expr(s"rank * ${dampNum}L div (${dampDen}L * deg)").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("inflow"))
      val stepped = ranks.select(col("node"), col("deg"), col("is_seed"))
        .join(contrib, Seq("node"), "left")
        .select(col("node"), col("deg"), col("is_seed"),
          (when(col("is_seed"), lit(base)).otherwise(lit(0L))
            + coalesce(col("inflow"), lit(0L))).as("rank"))
        .localCheckpoint(eager = true)
      freeCkpt(ranks)
      ranks = stepped
    }
    freeCkpt(edges)
    ranks
  }
}
