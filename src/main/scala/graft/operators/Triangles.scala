package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle counting over an undirected edge list — the clustering
  * structure probe for a candidate graph: near-dup candidates that
  * close triangles are dense boilerplate families (transitive-keep
  * territory), while triangle-free stars are more likely hub-noise
  * from a hot LSH bucket.
  *
  * Input edges must be deduplicated with `id_a < id_b` (what
  * `minhashCandidates` and kin emit). The classic two-join plan:
  * wedges a<b<c from edges (a,b)x(b,c), closed by a LEFT SEMI join
  * against edges (a,c) — every triangle is found exactly once because
  * its vertices appear in sorted order. Per-node counts explode the
  * three corners and hash-aggregate.
  *
  * Scale shape: two shuffles on the join keys; wedge count is
  * sum(deg(b) choose 2) — the quadratic hazard lives on high-degree
  * middle vertices, which is EXACTLY the q126 bucket-skew audit's
  * subject; cap or sample hub degrees upstream when the candidate
  * graph has uncut hubs. No windows, no driver state.
  */
object Triangles {

  /** Per-node triangle participation counts: (node, n_triangles),
    * nodes in no triangle absent.
    */
  def nodeTriangleCounts(edges: DataFrame, aCol: String, bCol: String)
      : DataFrame = {
    val e = edges.select(col(aCol).as("a"), col(bCol).as("b"))
    val ab = e
    val bc = e.select(col("a").as("b"), col("b").as("c"))
    val tri = ab.join(bc, "b")
      .join(e.select(col("a"), col("b").as("c")), Seq("a", "c"), "left_semi")
      .select(col("a"), col("b"), col("c"))
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy(col("node"))
      .agg(count(lit(1)).cast("long").as("n_triangles"))
  }

  /** Local clustering coefficient per node, in basis points: how many
    * of a node's neighbor pairs are themselves connected —
    * 2*tri / (deg*(deg-1)) as BIGINT floor arithmetic (tri*20000 div
    * deg*(deg-1)), so the value is exact and engine-portable. 10000 =
    * the node's neighborhood is a clique (boilerplate family); near 0
    * at high degree = a hub whose neighbors are unrelated (hot-bucket
    * noise). Degree-1 nodes have no neighbor pair and are excluded.
    *
    * Cost on top of `nodeTriangleCounts` is one symmetric-degree hash
    * aggregate and a left join on node — no new quadratic term.
    */
  def localClusteringBp(edges: DataFrame, aCol: String, bCol: String)
      : DataFrame = {
    val e = edges.select(col(aCol).as("a"), col(bCol).as("b"))
    val deg = e.select(col("a").as("node"))
      .unionAll(e.select(col("b").as("node")))
      .groupBy(col("node"))
      .agg(count(lit(1)).cast("long").as("degree"))
    deg.filter(col("degree") >= 2L)
      .join(nodeTriangleCounts(edges, aCol, bCol), Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_tri"),
        expr("CAST(coalesce(n_triangles, 0) * 20000 DIV (degree * (degree - 1)) AS BIGINT)")
          .as("coeff_bp"))
  }

  /** Link prediction over the candidate graph: for every UNCONNECTED
    * pair sharing at least one neighbor, the common-neighbor count and
    * the Adamic–Adar score Σ_z 1/log₁₀(deg z) — "which near-dup pairs
    * did LSH probably MISS?" (a missing edge whose endpoints share
    * many low-degree neighbors is likely a banding false negative) and
    * the standard affinity-completion primitive.
    *
    * Input edges deduplicated with `id_a < id_b` (the
    * `minhashCandidates` contract). Wedges u—z—w with u < w come from
    * the symmetrized adjacency self-joined on the middle vertex;
    * already-connected pairs leave by an anti-join on the canonical
    * edge (both orders ascending, so (u,w) matches (id_a,id_b)
    * directly). Each wedge term 1/log₁₀(deg z) is ONE fixed-order
    * double over the exact BIGINT degree, pround6, summed as
    * DECIMAL(18,6) — deg z ≥ 2 by wedge construction, so the log is
    * never zero.
    *
    * Scale discipline (the prefixFilterPairs lesson): wedge count is
    * Σ_z deg(z)·(deg(z)−1)/2 — quadratic in HUB degree. Middle
    * vertices with deg > `maxHubDegree` are EXCLUDED (standard AA
    * practice: a hub says nothing about affinity, and its 1/log term
    * is near-noise anyway — a documented semantic, mirrored by the
    * oracle), and the remaining wedge bound is pre-estimated from the kept
    * degree table (#nodes-row aggregate, one-row collect) and REFUSED
    * loudly past `maxCandidates` rather than silently exploding.
    */
  def linkPrediction(edges: DataFrame, aCol: String, bCol: String,
                     maxHubDegree: Long = 64L,
                     maxCandidates: Long = 10000000L): DataFrame = {
    require(maxHubDegree >= 2 && maxHubDegree <= 4096,
      s"maxHubDegree out of range: $maxHubDegree")
    val e = edges.select(col(aCol).as("a"), col(bCol).as("b"))
    val sym = e.unionAll(e.select(col("b").as("a"), col("a").as("b")))
    val deg = sym.groupBy(col("a").as("z"))
      .agg(count(lit(1)).cast("long").as("deg_z"))
    val kept = deg.filter(col("deg_z") <= maxHubDegree)
    val bound = kept
      .agg(sum(expr("deg_z * (deg_z - 1) DIV 2")).cast("long").as("__w"))
      .collect()(0)
    val wedgeBound = if (bound.isNullAt(0)) 0L else bound.getLong(0)
    if (wedgeBound > maxCandidates) throw new IllegalStateException(
      s"linkPrediction: wedge bound $wedgeBound exceeds " +
        s"maxCandidates=$maxCandidates at maxHubDegree=$maxHubDegree — " +
        "lower maxHubDegree, pre-collapse exact duplicates, or raise " +
        "maxCandidates to accept the cost explicitly.")
    val adj = sym.join(kept.withColumnRenamed("z", "a"), Seq("a"))
      .select(col("a").as("z"), col("b").as("u"), col("deg_z"))
    val wedges = adj.join(
        adj.select(col("z"), col("u").as("w")), Seq("z"))
      .filter(col("u") < col("w"))
    wedges
      .join(e.select(col("a").as("u"), col("b").as("w")),
        Seq("u", "w"), "left_anti")
      .groupBy(col("u").as("id_a"), col("w").as("id_b"))
      .agg(count(lit(1)).cast("long").as("common_neighbors"),
        sum(graft.functions.Rounding.p6(
          lit(1.0) / log10(col("deg_z").cast("double")))
          .cast("decimal(18,6)"))
          .cast("double").as("aa_score"))
  }
}
