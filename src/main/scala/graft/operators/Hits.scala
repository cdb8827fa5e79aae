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
  * superseded frames freed, exactly as in PageRank. Two single-box
  * memory disciplines on top (round-14 verdict task #4 — sf10 needed a
  * 32 g heap before them):
  *  - the EDGE list checkpoints DISK_ONLY: it is the corpus-scale
  *    frame (58.7M rows at the sf10 probe ≈ many GB deserialized
  *    on-heap), scanned once per half-step — sequential local-disk
  *    reads cost little while freeing the heap for the join/agg
  *    execution memory; the per-node score frames stay at the default
  *    memory level (they are node-count-sized, not edge-count-sized).
  *  - each half-step's raw inflow is checkpointed BEFORE the max is
  *    taken, so the expensive (edge ⋈ score) join executes ONCE per
  *    half-step — the earlier shape recomputed it for the max
  *    attachment's broadcast subquery (4 edge joins per round instead
  *    of 2) — and the superseded score frame is freed as soon as its
  *    successor materializes, not at round end.
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
      .distinct().localCheckpoint(eager = true,
        org.apache.spark.storage.StorageLevel.DISK_ONLY)

    def renorm(rawDf: DataFrame, key: String): DataFrame = {
      // materialize the inflow ONCE: the max attachment's broadcast
      // subquery would otherwise re-execute the (edge ⋈ score) join
      val raw = rawDf.localCheckpoint(eager = true)
      val m = raw.agg(max(col("raw")).as("__m"))
      val out = raw.crossJoin(broadcast(m))
        .select(col(key), expr(s"raw * ${unit}L div __m").as("score"))
        .localCheckpoint(eager = true)
      PageRank.freeCkpt(raw)
      out
    }

    var auth = e.select(col("a")).distinct()
      .select(col("a"), lit(unit).as("score")).localCheckpoint(eager = true)
    var hubs: DataFrame = null
    for (_ <- 1 to iterations) {
      val hn = renorm(e.join(auth, "a").groupBy(col("h"))
        .agg(sum(col("score")).as("raw")), "h")
      // the auth half-step consumes only e and hn — the frames they
      // supersede are dead as soon as hn materializes
      if (hubs != null) PageRank.freeCkpt(hubs)
      PageRank.freeCkpt(auth)
      val an = renorm(e.join(hn, "h").groupBy(col("a"))
        .agg(sum(col("score")).as("raw")), "a")
      hubs = hn
      auth = an
    }
    PageRank.freeCkpt(e)
    hubs.select(lit("hub").as("role"), col("h").as("node"), col("score"))
      .unionAll(auth.select(lit("auth").as("role"), col("a").as("node"),
        col("score")))
  }
}
