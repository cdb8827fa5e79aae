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
}
