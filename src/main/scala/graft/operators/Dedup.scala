package graft.operators

import graft.functions.TextFns._
import graft.functions.VectorFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for the training-data pipeline, plus the
  * keyed/priority dedup semantics of the reference ETL (reference D1-D4:
  * scripts/process_raw_data/process_raw_categories_data.py:61,
  * src/process_raw_data/process_raw_streams_data.py:163,
  * scripts/curate_data/curate_users_data.py:80).
  *
  * Scale notes: every near-dup operator here is candidate-generating
  * (LSH bands / bit-bands / SRP buckets) before any pairwise work, so
  * cost is O(candidates), never O(n^2). All signatures are deterministic
  * md5-derived, so results are partitioning-independent.
  */
object Dedup {

  /** Exact-dup clusters: content hash -> cluster size + canonical
    * (minimum) id. One hash-aggregate, map-side partials free.
    */
  def exactClusters(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.groupBy(md5(lower(col(textCol))).as("content_hash"))
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("keep_id"))

  /** Drop exact duplicates, keeping the minimum-id doc per content hash.
    * Window formulation (not dropDuplicates) so "which row survives" is
    * deterministic — pandas keep="first" depends on input order, Spark
    * dropDuplicates keeps an arbitrary row; min-id is order-free.
    */
  def dropExactDups(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(md5(lower(col(textCol)))).orderBy(col(idCol))
    docs.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Keyed dedup with an explicit deterministic priority (reference D2/D3
    * `keep="first"`), as row_number over (keys, orderBy).
    */
  def keepFirst(df: DataFrame, keys: Seq[String], order: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** MinHash-LSH near-dup candidate pairs (id_a < id_b).
    *
    * shingle(3-word) -> k = bands*rowsPerBand minhashes -> band keys ->
    * explode -> self-equi-join on band key. The join is a shuffle on
    * band-key — at 100 TB this is the only shuffle, and band keys are
    * ~uniform (md5) so no skew. Output is distinct candidate pairs.
    */
  def minhashCandidates(docs: DataFrame, textCol: String, idCol: String,
                        bands: Int = 3, rowsPerBand: Int = 2): DataFrame = {
    val keyed = docs
      .select(col(idCol).as("doc"),
        explode(lshBandKeys(wordShingles(tokens(col(textCol)), 3), bands, rowsPerBand))
          .as("band_key"))
      .filter(col("band_key").isNotNull)
    val a = keyed.as("a")
    val b = keyed.as("b")
    a.join(b, col("a.band_key") === col("b.band_key") && col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("id_a"), col("b.doc").as("id_b"))
      .distinct()
  }

  /** Exact n-gram Jaccard for candidate pairs: LSH candidates are
    * verified against true shingle-set Jaccard. The shingle sets are
    * joined only for candidate docs (semi-join pruning), so pairwise cost
    * is bounded by the candidate count, not n^2.
    */
  def ngramJaccard(docs: DataFrame, textCol: String, idCol: String,
                   candidates: DataFrame, n: Int = 3): DataFrame = {
    val sets = docs.select(col(idCol).as("doc"),
      array_distinct(wordShingles(tokens(col(textCol)), n)).as("sh"))
    val withA = candidates
      .join(sets.withColumnRenamed("doc", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
    val both = withA
      .join(sets.withColumnRenamed("doc", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
    both.select(col("id_a"), col("id_b"),
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double").as("inter"),
        size(array_union(col("sh_a"), col("sh_b"))).cast("double").as("uni"))
      .withColumn("jaccard", when(col("uni") > 0, col("inter") / col("uni")).otherwise(lit(0.0)))
      .select("id_a", "id_b", "jaccard")
  }

  /** SimHash near-dup pairs: 16-bit simhash, banded into 4 nibbles; pairs
    * sharing any nibble band are candidates; verified by Hamming <= maxHamming.
    */
  def simhashPairs(docs: DataFrame, textCol: String, idCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val sigs = docs.select(col(idCol).as("doc"), simhash16(tokens(col(textCol))).as("sig"))
    val banded = sigs.select(col("doc"), col("sig"),
      explode(array((0 until 4).map { b =>
        concat_ws(":", lit(b), shiftright(col("sig"), b * 4).bitwiseAND(lit(15L)))
      }: _*)).as("band"))
    val a = banded.as("a"); val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("id_a"), col("b.doc").as("id_b"),
        hamming16(col("a.sig"), col("b.sig")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Embedding near-dup pairs: SRP-bucketed cosine. Vectors sharing a
    * sign-random-projection bucket are candidates; verified by cosine >=
    * minCosine. Bucket count 2^planes bounds candidate blocks.
    */
  def embeddingNearDups(emb: DataFrame, vecCol: String, idCol: String,
                        planes: Int = 8, dims: Int = 64,
                        minCosine: Double = 0.95): DataFrame = {
    val bucketed = emb.select(col(idCol).as("doc"), col(vecCol).as("v"),
      VectorFns.srpBucket(col(vecCol), planes, dims).as("bucket"))
    val a = bucketed.as("a"); val b = bucketed.as("b")
    a.join(b, col("a.bucket") === col("b.bucket") && col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("id_a"), col("b.doc").as("id_b"),
        VectorFns.cosine(col("a.v"), col("b.v")).as("cosine"))
      .filter(col("cosine") >= minCosine)
  }
}
