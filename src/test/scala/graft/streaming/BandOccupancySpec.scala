package graft.streaming

import graft.SparkSpec
import graft.functions.VectorFns
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins the band-width scale lever for the SRP-banded embedding screen
  * (q108's operator): the band space has 2^bits labels per band, so for
  * n vectors the EXPECTED bucket occupancy is n / 2^bits and the
  * candidate enumeration — quadratic per bucket — stays LINEAR in n
  * exactly when bits grows with log2(n). A fixed width saturates: past
  * n ≈ 2^bits the labels stop absorbing growth, occupancy (hence the
  * pair bound Σ C(occ,2)) turns quadratic, and the sf10 probe measured
  * the cliff — the pinned 4×8-bit contract width OOMs at 200k vectors
  * (max bucket 2,187, pair bound 3.7e8) while ceil(log2(n)) = 18 bits
  * completes in 14.8 s at the default heap (max bucket 49, bound
  * 1.7e6). See PERF.md round 15 and BENCH_LOCAL_sf10_probe.json's
  * `q108_streaming_embed_dedup_wideband` row.
  *
  * The empirical half uses deterministic splitmix-style pseudo-random
  * vectors (seeded, partition-independent): near-uniform sign patterns
  * make the uniform-occupancy model the right yardstick.
  */
class BandOccupancySpec extends SparkSpec {

  private val dims = 16
  private val bands = 2

  /** Deterministic pseudo-random unit-ish vectors: dim d of vector i is
    * derived from a 64-bit mix of (i, d) — no RNG state, so the corpus
    * is identical on any partitioning.
    */
  private def corpus(n: Int) = {
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val rows = (0 until n).map { i =>
      Row(i.toLong, (0 until dims).map { d =>
        (mix(i.toLong * 131 + d).toDouble / Long.MaxValue.toDouble).toFloat
      }.toArray.toSeq)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType, containsNull = false)))))
  }

  /** (buckets, max occupancy, Σ C(occ,2)) over all bands at `bits`. */
  private def occupancy(n: Int, bits: Int): (Long, Long, Long) = {
    val r = corpus(n)
      .select(explode(VectorFns.srpBandKeysFast(
        col("embedding"), bands, bits, dims)).as("k"))
      .groupBy("k").count()
      .agg(count(lit(1)), max(col("count")),
        sum((col("count") * (col("count") - 1) / 2).cast("long")))
      .head()
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("bits = log2(n): expected pairs-per-bucket stays flat as n grows 4x") {
    // at bits = log2(n) the uniform model predicts ~1 vector/bucket and
    // a TOTAL pair bound ~ bands * n/2 — linear in n. Growing n 4x
    // while adding the matching 2 bits must keep the bound ~linear
    // (ratio well under the 16x a fixed width would show).
    val (_, max1, pairs1) = occupancy(n = 1 << 10, bits = 10)
    val (_, max4, pairs4) = occupancy(n = 1 << 12, bits = 12)
    withClue(s"pairs1=$pairs1 pairs4=$pairs4 max1=$max1 max4=$max4\n") {
      // linear-in-n bound with slack: 4x data, <= ~6x pairs (not 16x)
      pairs4.toDouble should be <= pairs1.toDouble * 6.0
      // the max is a noisy tail statistic (16-dim sign patterns are
      // only near-uniform) — pin it loosely; the pair bound above is
      // the load-bearing linearity claim
      max4 should be <= (max1 * 3)
    }
  }

  test("fixed width saturates: same 4x growth at constant bits is quadratic") {
    // past saturation every new vector lands in an existing label, so
    // the pair bound grows ~n^2: 4x the data must cost >= ~10x the
    // pairs (exactly the cliff the sf10 probe hit at the pinned 8-bit
    // contract width).
    val (b1, _, pairs1) = occupancy(n = 1 << 10, bits = 6)
    val (b4, _, pairs4) = occupancy(n = 1 << 12, bits = 6)
    withClue(s"pairs1=$pairs1 pairs4=$pairs4 buckets=$b1/$b4\n") {
      // the label space is exhausted both times (2 bands * 2^6 labels)
      b4 should be <= (bands.toLong << 6)
      pairs4.toDouble should be >= pairs1.toDouble * 10.0
    }
  }

  test("widening the band is monotone: more bits never densifies a bucket") {
    // a (b+1)-bit key refines a b-bit key (the extra plane splits each
    // bucket), so max occupancy is non-increasing and the pair bound
    // strictly shrinks on any corpus with collisions
    val (_, maxN, pairsN) = occupancy(n = 2048, bits = 8)
    val (_, maxW, pairsW) = occupancy(n = 2048, bits = 12)
    maxW should be <= maxN
    pairsW should be < pairsN
  }

  test("planesPerBandFor is ceil(log2(n)), floored at 8, capped at 63") {
    // the ONE sizing definition (probe `auto` mode and deployments):
    // pinned to the measured table in PERF.md round 15
    StreamingEmbedDedup.planesPerBandFor(1L) shouldBe 8
    StreamingEmbedDedup.planesPerBandFor(256L) shouldBe 8
    StreamingEmbedDedup.planesPerBandFor(257L) shouldBe 9
    StreamingEmbedDedup.planesPerBandFor(2000L) shouldBe 11      // sf0.1
    StreamingEmbedDedup.planesPerBandFor(20000L) shouldBe 15     // sf1.0
    StreamingEmbedDedup.planesPerBandFor(200000L) shouldBe 18    // sf10
    StreamingEmbedDedup.planesPerBandFor(1L << 40) shouldBe 40   // ~1T vectors
    StreamingEmbedDedup.planesPerBandFor(Long.MaxValue) shouldBe 63
    // exact powers of two don't over-widen: 2^k keys need exactly k bits
    StreamingEmbedDedup.planesPerBandFor(1L << 20) shouldBe 20
    an[IllegalArgumentException] should be thrownBy
      StreamingEmbedDedup.planesPerBandFor(0L)
  }

  test("uniform-model arithmetic: the pair bound tracks C(n,2)/2^bits per band") {
    // the model the lever is sized by: E[Σ C(occ,2)] = C(n,2)/2^bits
    // for one band of uniform keys. Pin the measured bound to within
    // 3x of the model on the pseudo-random corpus (sign-bit keys are
    // near-uniform but not perfectly so).
    val n = 4096
    val bits = 9
    val (_, _, pairs) = occupancy(n, bits)
    val model = bands.toDouble * n.toDouble * (n - 1) / 2.0 / (1L << bits)
    withClue(s"pairs=$pairs model=$model\n") {
      pairs.toDouble should be >= model / 3.0
      pairs.toDouble should be <= model * 3.0
    }
  }
}
