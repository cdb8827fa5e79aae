package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector expressions over `array<float|double>` embedding columns.
  *
  * Pure higher-order-function compositions (`zip_with` + `aggregate`) —
  * per-row, codegen-eligible, no UDFs. Inputs are cast to
  * `array<double>` so accumulation is double-precision regardless of the
  * stored element type (the testdata stores float32; summing in float
  * would diverge from any double-precision oracle).
  */
object VectorFns {

  private def asDouble(v: Column): Column = v.cast("array<double>")

  /** Dot product of two equal-length vectors. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def l2Norm(a: Column): Column =
    sqrt(aggregate(asDouble(a), lit(0.0), (acc, v) => acc + v * v))

  /** Cosine similarity; relies on non-zero norms (embeddings are dense
    * random vectors — a zero vector would be a data bug worth surfacing,
    * and ANSI mode turns it into an explicit error).
    *
    * This is the composable HOF formulation, kept as the portable
    * reference implementation; hot paths use `cosineFast` (the native
    * codegen'd expression, bit-identical results).
    */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Native single-pass cosine (graft.expressions.CosineSimilarity):
    * same value as `cosine` to the last bit, but stays inside
    * whole-stage codegen — use in corpus-scan hot paths.
    */
  def cosineFast(a: Column, b: Column): Column =
    graft.expressions.GraftFunctions.cosineSim(a, b)

  /** Squared euclidean distance. */
  def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)

  /** Sign-random-projection LSH bucket over `planes` deterministic
    * pseudo-random hyperplanes. Plane p's coefficient for dimension d is
    * derived from md5(p,d) — deterministic, seedless, engine-portable.
    * Returns a bucket id in [0, 2^planes).
    *
    * Scale path for ANN: group vectors by bucket, search only the query's
    * bucket (plus Hamming-1 neighbors for recall if needed).
    */
  /** Deterministic ±1 coefficient of SRP plane `p` at dimension `d`:
    * parity of the first md5 byte of "p:d". The ONE definition of the
    * plane constants — `srpBucket` materializes them as plan-time
    * literals and the DuckDB oracle embeds the same values, so both
    * engines bucket identically.
    */
  def srpCoef(p: Int, d: Int): Double = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$p:$d".getBytes("UTF-8"))
    if ((h(0) & 1) == 0) 1.0 else -1.0
  }

  def srpBucket(v: Column, planes: Int, dims: Int): Column =
    (0 until planes).map { p =>
      val plane = array((0 until dims).map(d => lit(srpCoef(p, d))): _*)
      when(dot(v, plane) >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Banded SRP keys: `bands` independent LSH band keys per vector, band
    * b over planes [b*planesPerBand, (b+1)*planesPerBand) — a candidate
    * pair is one sharing ANY band key (OR-amplified LSH). Band b's value
    * is the packed sign bits of its planes, so band 0 with r planes
    * equals `srpBucket(v, r, dims)` — banding strictly ADDS candidates
    * over the single-bucket form.
    *
    * Cost model: per band the key space is 2^planesPerBand, so expected
    * bucket population is n / 2^planesPerBand per band — size
    * planesPerBand ~ log2(n / desired_bucket_rows) so in-bucket pair
    * expansion stays O(candidates), never O(n^2 / 2^planes). Recall for
    * a pair at angle θ is 1 - (1 - (1-θ/π)^planesPerBand)^bands: more
    * bands raise recall (at `bands` extra rows per vector through the
    * bucket shuffle), more planes per band sharpen precision and shrink
    * buckets.
    */
  def srpBandKeys(v: Column, bands: Int, planesPerBand: Int, dims: Int): Column =
    array((0 until bands).map { b =>
      val value = (0 until planesPerBand).map { j =>
        val plane = array((0 until dims).map(d =>
          lit(srpCoef(b * planesPerBand + j, d))): _*)
        when(dot(v, plane) >= 0, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
      concat_ws(":", lit(b), value)
    }: _*)

  /** Native single-pass banded-SRP keys (graft.expressions.SrpBandKeys):
    * same strings as `srpBandKeys` to the last bit, but one fused
    * codegen'd loop instead of bands*planesPerBand interpreted HOF
    * passes — use in corpus-scan hot paths.
    */
  def srpBandKeysFast(v: Column, bands: Int, planesPerBand: Int, dims: Int): Column =
    graft.expressions.GraftFunctions.srpBandKeys(v, bands, planesPerBand, dims)
}
