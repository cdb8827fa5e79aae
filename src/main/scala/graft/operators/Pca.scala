package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Dominant direction of an embedding corpus's second-moment matrix by
  * fixed-point power iteration — the representation-collapse screen: a
  * healthy corpus spreads energy across directions, while a collapsed
  * or rank-deficient encoder concentrates it in one; the top direction
  * and its per-dimension energies are the first thing to inspect.
  *
  * ENGINE-EXACT by construction, where float PCA never is: components
  * quantize to integers (floor(x·valueScale + 0.5) — the portable
  * rounding form), the d×d second-moment matrix accumulates as BIGINT
  * sums (associative-commutative — partition order cannot perturb it),
  * and each power-iteration step renormalizes the iterate to integer
  * `vecScale` via floor of ONE double division of exact integers
  * (max-abs normalization, not L2 — max is exact where a sqrt-norm
  * would reintroduce accumulation order). The DuckDB oracle replays
  * the identical rounds as unrolled CTEs.
  *
  * Scale shape: the one heavy stage is the O(n·d²) outer-product
  * aggregate — inherent to covariance — computed by the native
  * [[graft.expressions.QuantizedOuterFlat]] codegen expression (one
  * fused primitive loop per row; the earlier nested-HOF form paid
  * boxed lambda dispatch on all d² products — 5.5M products/s total
  * at sf1.0, 7× slower end-to-end) feeding one d²-group hash
  * aggregate; the iteration itself runs on
  * the driver over the collected d×d matrix (d² longs — 32 KB at
  * d=64, the BinPacking-style bounded driver materialization). At
  * 100 TB fit the matrix on a sample, exactly as IVF fits centroids.
  *
  * Overflow bounds (documented, not checked per-row): |xq| ≤
  * valueScale·max|x|, matrix entries ≤ n·(valueScale·max|x|)², and a
  * matvec term ≤ d·vecScale·that — keep n·d·vecScale·(valueScale·
  * max|x|)² under 2^63 (n ≲ 10^9 at the defaults for |x| ≤ 3).
  */
object Pca {

  /** (dim, loading, energy): `loading` is the dominant direction's
    * component at integer scale `vecScale` after `iterations` rounds
    * from the all-ones start; `energy` is the dimension's diagonal
    * second moment. `dim` is 1-based to match SQL subscripts.
    */
  def dominantDirection(emb: DataFrame, vecCol: String, dims: Int,
                        iterations: Int = 5, valueScale: Long = 128L,
                        vecScale: Long = 4096L): DataFrame = {
    require(dims >= 1 && dims <= 4096, s"dims out of range: $dims")
    require(iterations >= 1, s"iterations must be >= 1: $iterations")
    val spark = emb.sparkSession
    val flat = emb
      .select(posexplode(graft.expressions.GraftFunctions
        .quantizedOuterFlat(col(vecCol), valueScale)).as(Seq("__idx", "__p")))
    val cov = flat.groupBy(col("__idx"))
      .agg(sum(col("__p")).cast("long").as("__c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val c = Array.tabulate(dims, dims)((i, j) => cov.getOrElse(i * dims + j, 0L))
    var v = Array.fill(dims)(vecScale)
    for (_ <- 1 to iterations) {
      val w = Array.tabulate(dims)(i =>
        (0 until dims).map(j => c(i)(j) * v(j)).sum)
      val m = w.map(math.abs).max
      v = if (m == 0L) Array.fill(dims)(0L)
      else w.map(wi => math.floor(wi.toDouble * vecScale.toDouble / m.toDouble).toLong)
    }
    val rows = (0 until dims).map(i => Row(i + 1L, v(i), c(i)(i)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("dim", LongType),
        StructField("loading", LongType), StructField("energy", LongType))))
  }
}
