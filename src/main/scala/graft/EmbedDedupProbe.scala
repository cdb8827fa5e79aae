package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe main for the streaming-embed-dedup band-width scale lever
  * (round-14 verdict task #1).
  *
  * The frozen q108 contract query pins 4 bands x 8-bit SRP keys (its
  * DuckDB oracle hashes the literal plane SQL), and at the sf10 probe
  * that band space SATURATES: the scaled corpus packs 200k vectors
  * whose within-replica cluster structure concentrates each band's
  * <=256 bucket labels until the intra-batch pair enumeration
  * (`collect_set` -> pairCombos) is quadratic in bucket occupancy and
  * dies at any heap. The operator itself takes band width as a
  * parameter; a 100-TB deployment sizes bits/band to corpus
  * cardinality (~log2(n) keeps expected occupancy flat — see
  * BandOccupancySpec for the pinned math). This main MEASURES that
  * lever instead of arguing it:
  *
  *   runMain graft.EmbedDedupProbe <sfDir> <planesPerBand|auto> [statsOnly]
  *
  * It prints ONE JSON line with (a) the band-occupancy diagnostics at
  * the requested width — buckets per band, max bucket, and the exact
  * candidate-pair bound sum(C(occ,2)) the enumeration would explode —
  * and (b) unless `statsOnly`, the wall-clock of the EXACT q108 shape
  * (two vec_id-parity ticks of `StreamingEmbedDedup.acceptBatch`
  * against a fresh state table) at that width. `statsOnly` exists so
  * the saturated 8-bit width can be DIAGNOSED at sf10 (the groupBy
  * count is cheap) without re-running the known OOM.
  *
  * The q108 contract query is untouched: this is a probe harness for
  * the committed BENCH_LOCAL_sf10_probe.json evidence row.
  */
object EmbedDedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.error("usage: EmbedDedupProbe <sfDir> <planesPerBand|auto> [statsOnly]"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val bands = 4
    val dims = 64
    val statsOnly = args.lift(2).contains("statsOnly")

    // same data-sized parallelism as Bench: partitions scale with the
    // SF dir, not the core count (PERF.md round 12)
    def dirBytes(root: java.io.File): Long = {
      val walk = java.nio.file.Files.walk(root.toPath)
      try walk
        .filter(p => java.nio.file.Files.isRegularFile(
          p, java.nio.file.LinkOption.NOFOLLOW_LINKS))
        .mapToLong(p => java.nio.file.Files.size(p))
        .sum()
      finally walk.close()
    }
    val dataBytes = dirBytes(new java.io.File(sfDir))
    val shufflePartitions = math.min(64L * cpus.toInt,
      math.max(cpus.toLong, dataBytes / (2.5 * 1024 * 1024).toLong))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = Tables.load(spark, sfDir, "embeddings")
    val n = emb.count()
    val planesPerBand = args.lift(1) match {
      case Some("auto") | None =>
        streaming.StreamingEmbedDedup.planesPerBandFor(n)
      case Some(k) => k.toInt
    }

    // occupancy diagnostics: exactly the band keys the operator hashes
    val keys = emb.select(col("vec_id"),
      explode(graft.functions.VectorFns.srpBandKeysFast(
        col("embedding"), bands, planesPerBand, dims)).as("band_key"))
    val occ = keys.groupBy("band_key").count()
      .agg(count(lit(1)).as("buckets"), max(col("count")).as("max_occ"),
        sum((col("count") * (col("count") - 1) / 2).cast("long")).as("cand_pairs"))
      .head()
    val buckets = occ.getLong(0)
    val maxOcc = occ.getLong(1)
    val candPairs = occ.getLong(2)

    var elapsed = -1.0
    var accepted = -1L
    if (!statsOnly) {
      val state = java.nio.file.Files
        .createTempDirectory("graft-embdedup-probe").toString
      try {
        val t0 = System.nanoTime()
        def tick(parity: Int) = streaming.StreamingEmbedDedup.acceptBatch(
          emb.filter(col("vec_id") % 2 === parity), "embedding", "vec_id",
          state + "/bands", bands = bands, planesPerBand = planesPerBand,
          dims = dims)
        accepted = tick(0).unionByName(tick(1)).select("vec_id").count()
        elapsed = (System.nanoTime() - t0) / 1e9
      } finally graft.sources.PathIO.deleteDir(spark, state)
    }

    // ONE machine-readable line, same discipline as Bench
    println(
      s"""{"probe":"embed_dedup_bandwidth","sf":"$sfDir","n":$n,""" +
      s""""bands":$bands,"planesPerBand":$planesPerBand,""" +
      s""""buckets":$buckets,"maxBucket":$maxOcc,""" +
      s""""candPairsBound":$candPairs,"accepted":$accepted,""" +
      s""""elapsedSec":${math.round(elapsed * 100.0) / 100.0}}""")
    spark.stop()
  }
}
