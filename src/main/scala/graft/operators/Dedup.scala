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

  /** Per-doc k-position MinHash signature, Spark-native shape: explode
    * shingles to rows, hash each shingle ONCE with codegen'd md5, derive
    * the k hash functions arithmetically (Kirsch-Mitzenmacher: h_i =
    * h1 + i*h2 over the two 60-bit halves of the md5), and take the k
    * mins in one partial+final hash aggregate.
    *
    * This keeps the whole hot path inside whole-stage codegen — Spark's
    * higher-order array functions (transform/aggregate) are interpreted
    * (CodegenFallback), so a per-salt `transform(shingles, md5)`
    * formulation is ~50x slower and recomputes tokenization per salt.
    * Map-side combine shrinks the shuffle to one (doc, k longs) row per
    * doc per partition. 60-bit halves keep h1 + 5*h2 < 2^63 (no
    * overflow, portable to the DuckDB oracle's hex cast).
    */
  def minhashSignatures(docs: DataFrame, textCol: String, idCol: String, k: Int): DataFrame = {
    // Tokenize with codegen'd split + posexplode and a ROW filter for
    // empties (the array-lambda filter is interpreted), then build
    // 3-gram shingle strings with window lead() over token position —
    // consecutive surviving tokens, exactly the strings the per-row HOF
    // shingler produced, at ~3x the throughput. The window's doc
    // partitioning is reused by the signature aggregate: one shuffle
    // for the whole stage. Duplicate shingles are NOT deduped — min()
    // is insensitive to multiplicity, so the signatures are unchanged.
    val w = Window.partitionBy("doc").orderBy("pos")
    val sh = docs
      .select(col(idCol).as("doc"),
        posexplode(split(lower(col(textCol)), "\\s+")).as(Seq("pos", "t")))
      .filter(col("t") =!= "")
      .withColumn("t1", lead(col("t"), 1).over(w))
      .withColumn("t2", lead(col("t"), 2).over(w))
      .filter(col("t2").isNotNull)
      .select(col("doc"), concat_ws(" ", col("t"), col("t1"), col("t2")).as("s"))
    val hashed = sh.select(col("doc"),
      conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("h1"),
      conv(substring(md5(col("s")), 17, 15), 16, 10).cast("long").as("h2"))
    val mins = (0 until k).map(i => min(col("h1") + lit(i.toLong) * col("h2")).as(s"mh$i"))
    hashed.groupBy("doc").agg(mins.head, mins.tail: _*)
  }

  /** MinHash-LSH near-dup candidate pairs (id_a < id_b): signature ->
    * band keys -> explode -> groupBy band key -> in-bucket pair
    * generation. Two shuffles total (signature agg + band groupBy), both
    * with map-side combine and md5-uniform keys (no skew). In-bucket
    * pairs are emitted with a sorted-array HOF, so pairwise cost is
    * O(candidate pairs), never O(n^2).
    */
  /** (doc, band_key) rows from a signature frame — the ONE definition of
    * the LSH band keys, shared by batch candidates, streaming dedup, and
    * mirrored by the oracle's bandKeysSql (they must stay bit-identical).
    */
  private[graft] def minhashBandKeys(sigs: DataFrame, bands: Int, rowsPerBand: Int): DataFrame =
    sigs.select(col("doc"), explode(array((0 until bands).map { b =>
      concat_ws("|", lit(s"b$b") +:
        (0 until rowsPerBand).map(r => col(s"mh${b * rowsPerBand + r}")): _*)
    }: _*)).as("band_key"))

  def minhashCandidates(docs: DataFrame, textCol: String, idCol: String,
                        bands: Int = 3, rowsPerBand: Int = 2): DataFrame = {
    val sigs = minhashSignatures(docs, textCol, idCol, bands * rowsPerBand)
    pairsInBuckets(minhashBandKeys(sigs, bands, rowsPerBand), "doc", "band_key")
  }

  /** Distinct (id_a < id_b) pairs of ids sharing a bucket key: groupBy
    * bucket -> sorted id list -> per-bucket combination expansion.
    */
  private[graft] def pairsInBuckets(keyed: DataFrame, idCol: String, bucketCol: String): DataFrame = {
    val ids = col("ids")
    keyed.groupBy(col(bucketCol))
      .agg(array_sort(collect_set(col(idCol))).as("ids"))
      .filter(size(ids) > 1)
      .select(explode(flatten(transform(ids, (x, i) =>
        transform(slice(ids, i + lit(2), size(ids)),
          y => struct(x.as("id_a"), y.as("id_b")))))).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
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

  /** Per-doc 16-bit SimHash in relational shape: explode tokens, one
    * codegen'd md5 per token, 16 vote sums in a single partial+final
    * hash aggregate (same plane definition as TextFns.simhash16 — plane
    * j = high bit of hex digit j, i.e. digit >= '8'). Docs with no
    * tokens produce no row (same as the unnest-based oracle).
    */
  def simhashSignatures(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val hexed = docs
      .select(col(idCol).as("doc"), explode(tokens(col(textCol))).as("t"))
      .select(col("doc"), md5(col("t")).as("h"))
    val votes = (1 to 16).map(j =>
      sum(when(substring(col("h"), j, 1) >= "8", 1).otherwise(-1)).as(s"v$j"))
    hexed.groupBy("doc").agg(votes.head, votes.tail: _*)
      .select(col("doc"),
        (1 to 16).map(j => when(col(s"v$j") >= 0, lit(1L << (16 - j))).otherwise(lit(0L)))
          .reduce(_ + _).as("sig"))
  }

  /** Per-doc 64-bit SimHash, held as FOUR 16-bit band values s0..s3
    * (band b = bits [16b, 16b+16) of the signature = hex digits
    * [4b+1, 4b+4] of md5(token)). Splitting the signature into its four
    * bands up front serves both consumers — the LSH band key IS the band
    * value, and Hamming distance is the sum of the per-band popcounts —
    * while keeping every value comfortably inside a signed BIGINT for
    * the DuckDB oracle (no 1<<63 sign-bit edge).
    *
    * Same relational, codegen-friendly shape as `simhashSignatures`:
    * explode tokens, ONE md5 per token, 64 vote sums in a single
    * partial+final hash aggregate. Docs with no tokens produce no row.
    */
  def simhashSignatures64(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val hexed = docs
      .select(col(idCol).as("doc"), explode(tokens(col(textCol))).as("t"))
      .select(col("doc"), md5(col("t")).as("h"))
    val banded = hexed.select(col("doc") +: (0 until 4).map(b =>
      conv(substring(col("h"), b * 4 + 1, 4), 16, 10).cast("long").as(s"hb$b")): _*)
    val votes = for { b <- 0 until 4; j <- 0 until 16 } yield
      sum(when(shiftright(col(s"hb$b"), j).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1))
        .as(s"v${b}_$j")
    banded.groupBy("doc").agg(votes.head, votes.tail: _*)
      .select(col("doc") +: (0 until 4).map(b =>
        (0 until 16).map(j =>
          when(col(s"v${b}_$j") >= 0, lit(1L << j)).otherwise(lit(0L))).reduce(_ + _)
          .as(s"s$b")): _*)
  }

  /** SimHash near-dup pairs over the 64-bit signature, banded into the
    * four 16-bit bands. Hamming <= 3 over 4 disjoint bands means at
    * least one band matches EXACTLY (pigeonhole), so the band equi-join
    * loses no qualifying pair — and with 65,536 possible values per
    * band the buckets stay small (the earlier 16-bit/4-bit-nibble
    * banding had only 16 values per band, making the self-join
    * O(n^2/16); this shape is O(true near-dup candidates)).
    */
  def simhashPairs(docs: DataFrame, textCol: String, idCol: String,
                   maxHamming: Int = 3): DataFrame = {
    require(maxHamming < 4,
      s"maxHamming=$maxHamming >= band count 4: a qualifying pair could differ in " +
        "every band and be missed; raise the band count instead")
    val sigs = simhashSignatures64(docs, textCol, idCol)
    val banded = sigs.select(col("doc") +: (0 until 4).map(b => col(s"s$b")) :+
      explode(array((0 until 4).map(b =>
        concat_ws(":", lit(b), col(s"s$b"))): _*)).as("band"): _*)
    val a = banded.as("a"); val b = banded.as("b")
    val ham = (0 until 4).map(i =>
      bit_count(col(s"a.s$i").bitwiseXOR(col(s"b.s$i")))).reduce(_ + _)
    a.join(b, col("a.band") === col("b.band") && col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("id_a"), col("b.doc").as("id_b"), ham.as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Embedding near-dup pairs: BANDED SRP-bucketed cosine (the same
    * OR-amplified band shape as `simhashPairs`/`minhashCandidates`).
    * Vectors sharing ANY of the `bands` sign-random-projection band keys
    * are candidates; candidates are verified by cosine >= minCosine.
    *
    * Scale: each band's key space is 2^planesPerBand, so in-bucket pair
    * expansion is O(n^2 / 2^planesPerBand) per band — at the default 16
    * planes per band that's 65,536 buckets, the same pigeonhole shape
    * that keeps `simhashPairs` O(candidates). A single wide bucket
    * (the old fixed-8-plane form, 256 buckets) goes quadratic as the
    * corpus grows; banding holds recall while planesPerBand tracks
    * log2(corpus) — see `VectorFns.srpBandKeys` for the recall formula.
    * Candidate verification joins the vectors back by id (two hash
    * joins bounded by the candidate count), so no vector rides through
    * the band shuffle twice.
    */
  def embeddingNearDups(emb: DataFrame, vecCol: String, idCol: String,
                        bands: Int = 4, planesPerBand: Int = 16,
                        dims: Int = 64, minCosine: Double = 0.95): DataFrame = {
    val base = emb.select(col(idCol).as("doc"), col(vecCol).as("v"))
    val keyed = base.select(col("doc"),
      explode(VectorFns.srpBandKeysFast(col("v"), bands, planesPerBand, dims)).as("band_key"))
    val cands = pairsInBuckets(keyed, "doc", "band_key")
    val va = base.select(col("doc").as("id_a"), col("v").as("va"))
    val vb = base.select(col("doc").as("id_b"), col("v").as("vb"))
    cands.join(va, "id_a").join(vb, "id_b")
      .select(col("id_a"), col("id_b"),
        VectorFns.cosineFast(col("va"), col("vb")).as("cosine"))
      .filter(col("cosine") >= minCosine)
  }
}
