package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Blocked edit-distance entity resolution — "which other record is
  * this record really?" over a noisy name/title column, the record-
  * linkage primitive behind catalog dedup, user merging, and citation
  * matching.
  *
  * The classic shape: a BLOCKING KEY turns the quadratic all-pairs
  * comparison into an equi-join (only records sharing a block are
  * compared), then the survivors are scored with exact Levenshtein
  * and each record keeps its single best match (min distance, ties to
  * the smallest candidate id — fully deterministic).
  *
  * Scale shape: the block join is a hash-shuffle equi-join, so AQE's
  * OptimizeSkewedJoin splits oversized blocks at runtime; the block
  * key is the caller's lever — a block of size B costs B^2
  * comparisons, so keys should aim for bounded block cardinality
  * (e.g. first-token + length band, phonetic code + prefix). The
  * per-record best is a Window PARTITIONED BY the record id — no
  * single-partition stage anywhere. Spark's three-arg
  * `levenshtein(l, r, threshold)` abandons the DP early (returns -1)
  * once the distance provably exceeds the bound, so the per-pair cost
  * is O(len * threshold), not O(len^2).
  */
object FuzzyJoin {

  /** First lowercase whitespace token — a reasonable default block for
    * word-structured names. Swap for a phonetic or n-gram key when the
    * first token is noisy.
    */
  def firstTokenBlock(name: Column): Column =
    split(lower(trim(name)), "\\s+").getItem(0)

  /** For each record, its nearest other record in the same block at
    * edit distance <= maxDist: (id, match_id, dist). Records with no
    * in-threshold candidate are absent (inner semantics).
    */
  def nearestMatch(df: DataFrame, nameCol: String, idCol: String,
                   maxDist: Int,
                   blockFn: Column => Column = firstTokenBlock): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0: $maxDist")
    val base = df.select(col(idCol).as("id"),
      lower(trim(col(nameCol))).as("nm"),
      blockFn(col(nameCol)).as("blk"))
    val a = base.select(col("id"), col("nm"), col("blk"))
    val b = base.select(col("id").as("match_id"), col("nm").as("match_nm"),
      col("blk"))
    val scored = a.join(b, Seq("blk"))
      .filter(col("id") =!= col("match_id"))
      .withColumn("dist", levenshtein(col("nm"), col("match_nm"), maxDist))
      .filter(col("dist") >= 0)
    val w = Window.partitionBy(col("id"))
      .orderBy(col("dist").asc, col("match_id").asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("id"), col("match_id"), col("dist"))
  }
}
