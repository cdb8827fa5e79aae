package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration HITS (hubs and authorities) over a bipartite edge
  * list — e.g. customers (hubs) pointing at the suppliers (authorities)
  * they buy from: a good hub buys from high-authority suppliers, a good
  * authority is bought by high-hub customers.
  *
  * Same exactness discipline as [[PageRank]]: the power iteration runs
  * in BIGINT micro-units, with the usual max-normalization replaced by
  * `score * unit div max(score)` integer flooring after every half-step
  * — so after k rounds both score vectors are bit-identical on any
  * engine and any partitioning, and the DuckDB oracle replays the same
  * k rounds as unrolled CTEs.
  *
  * Overflow contract: the renormalized scores are <= unit, so a raw
  * inflow is <= deg * unit and the renorm multiply is bounded by
  * deg * unit^2 — with the default unit 10^6 that requires max degree
  * < ~9.2e6. Shrink `unit` for denser graphs.
  *
  * Scale shape: per round, two (edge ⋈ score) shuffled joins + two hash
  * aggregates + two ONE-ROW max attachments (broadcast); the edge list
  * is checkpointed once and reused; per-round lineage is truncated and
  * superseded frames freed, exactly as in PageRank.
  */
object Hits {

  /** Hub and authority scores after `iterations` rounds, as
    * (role 'hub'|'auth', node, score) rows. Input edges are
    * de-duplicated (hub, auth) pairs.
    */
  def bipartiteHits(edges: DataFrame, hubCol: String, authCol: String,
                    iterations: Int = 2, unit: Long = 1000000L): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(unit >= 1000L, s"unit must be >= 1000, got $unit")
    val e = edges.select(col(hubCol).as("h"), col(authCol).as("a"))
      .distinct().localCheckpoint(eager = true)

    def renorm(raw: DataFrame, key: String): DataFrame = {
      val m = raw.agg(max(col("raw")).as("__m"))
      raw.crossJoin(broadcast(m))
        .select(col(key), expr(s"raw * ${unit}L div __m").as("score"))
        .localCheckpoint(eager = true)
    }

    var auth = e.select(col("a")).distinct()
      .select(col("a"), lit(unit).as("score")).localCheckpoint(eager = true)
    var hubs: DataFrame = null
    for (_ <- 1 to iterations) {
      val hn = renorm(e.join(auth, "a").groupBy(col("h"))
        .agg(sum(col("score")).as("raw")), "h")
      val an = renorm(e.join(hn, "h").groupBy(col("a"))
        .agg(sum(col("score")).as("raw")), "a")
      if (hubs != null) PageRank.freeCkpt(hubs)
      PageRank.freeCkpt(auth)
      hubs = hn
      auth = an
    }
    PageRank.freeCkpt(e)
    hubs.select(lit("hub").as("role"), col("h").as("node"), col("score"))
      .unionAll(auth.select(lit("auth").as("role"), col("a").as("node"),
        col("score")))
  }
}
