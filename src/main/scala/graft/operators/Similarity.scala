package graft.operators

import graft.functions.VectorFns._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate / exact nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k with the (small) query set
  * broadcast against the (huge) corpus — one corpus scan, no corpus
  * shuffle except the final per-query top-k aggregation, which is a
  * k-bounded shuffle (partial top-k per partition via window after a
  * repartition on query id would still shuffle the scored pairs; at
  * query-count << corpus-size the scored-pair volume is queries × corpus,
  * so the scale lever is the bucketed variants below).
  *
  * Scale paths: SRP-LSH buckets (search only the query's bucket) and
  * label-IVF (coarse cells with centroid routing).
  */
object Similarity {

  /** Per-dimension aggregates rebuilt into index-ordered array
    * columns: posexplode the vector, aggregate per (groupCols…, pos),
    * and rebuild one array per aggregate — dimension order restored
    * by the array_sort-over-(pos, fields…) struct trick. The ONE copy
    * of this ordering-sensitive shape; centering, quantization ranges,
    * and IVF centroids all express through it.
    */
  private[operators] def perDimArrays(df: DataFrame, vecCol: String,
      groupCols: Seq[String],
      aggs: Seq[(String, Column => Column)]): DataFrame = {
    val perPos = df
      .select(groupCols.map(col) :+ posexplode(col(vecCol).cast("array<double>")): _*)
      .groupBy((groupCols :+ "pos").map(col): _*)
      .agg(aggs.head._2(col("col")).as(aggs.head._1),
        aggs.tail.map { case (n, f) => f(col("col")).as(n) }: _*)
    perPos
      .groupBy(groupCols.map(col): _*)
      .agg(array_sort(collect_list(
        struct(col("pos") +: aggs.map(a => col(a._1)): _*))).as("__pf"))
      .select(groupCols.map(col) ++ aggs.map { case (n, _) =>
        transform(col("__pf"), x => x.getField(n)).as(n) }: _*)
  }

  /** Mean-center and L2-normalize an embedding column — the standard
    * preprocessing before cosine ANN (centering removes the corpus'
    * common component, which otherwise dominates every dot product and
    * compresses the useful cosine range; normalizing makes cosine a
    * pure dot product downstream).
    *
    * The per-dimension mean is the same posexplode → per-pos aggregate
    * → array rebuild shape as `ivfTopK`'s centroids (one narrow pass,
    * dims-bounded result broadcast back); centering and normalization
    * are per-row HOFs in the projection. Zero centered vectors (a row
    * exactly at the mean) pass through unnormalized with
    * `center_dist = 0` rather than dividing by zero.
    *
    * Output: idCol, `embedding_cn` (centered, unit-norm), `center_dist`
    * (the row's distance to the corpus mean — itself a useful outlier
    * signal).
    */
  def centerAndNormalize(emb: DataFrame, idCol: String,
                         vecCol: String): DataFrame = {
    val mean = perDimArrays(emb, vecCol, Nil, Seq("__mean" -> (c => avg(c))))
    emb
      .join(broadcast(mean))
      .withColumn("__c",
        zip_with(col(vecCol).cast("array<double>"), col("__mean"), (a, b) => a - b))
      .withColumn("center_dist", graft.functions.VectorFns.l2Norm(col("__c")))
      .withColumn("embedding_cn",
        when(col("center_dist") > 0,
          transform(col("__c"), x => x / col("center_dist")))
          .otherwise(col("__c")))
      .select(col(idCol), col("embedding_cn"), col("center_dist"))
  }

  /** Per-group embedding centroid drift: the L2 distance between each
    * group's centroid and the global centroid — the embedding-space
    * health card ("did source X's representation shift away from the
    * corpus?") next to q146's feature-space PSI. A label whose
    * centroid sits far from the global mean is a candidate for
    * mixture rebalance or encoder-regression investigation.
    *
    * Both centroids come from the shared `perDimArrays` shape (per-
    * dimension hash aggregates, arrays rebuilt in index order), so
    * the difference vector and its norm accumulate in DIMENSION ORDER
    * — deterministic given the per-dim means, whose cross-row avg()
    * reassociation noise the downstream pround(4) absorbs (q105's
    * precedent). The global centroid and per-group counts attach as
    * broadcast aggregates.
    */
  def centroidDrift(emb: DataFrame, vecCol: String,
                    labelCol: String): DataFrame = {
    val global = perDimArrays(emb, vecCol, Nil, Seq("__g" -> (c => avg(c))))
    val per = perDimArrays(emb, vecCol, Seq(labelCol),
      Seq("__m" -> (c => avg(c))))
    val cnt = emb.groupBy(col(labelCol))
      .agg(count(lit(1)).cast("long").as("n_vecs"))
    per.join(broadcast(global))
      .withColumn("__d", zip_with(col("__m"), col("__g"), (a, b) => a - b))
      .withColumn("drift", graft.functions.VectorFns.l2Norm(col("__d")))
      .join(broadcast(cnt), labelCol)
      .select(col(labelCol), col("n_vecs"), col("drift"))
  }

  /** Per-dimension robust statistics of an embedding corpus: exact
    * median and MAD for every dimension — the outlier-resistant
    * normalization table (robust scaling) and the dead/saturated-
    * dimension detector (MAD ≈ 0 means the dimension carries no
    * signal; at int8 quantization time those dimensions waste range).
    *
    * Exactness: Spark's `percentile` is the exact interpolating
    * quantile = DuckDB's `quantile_cont` (the q41/q86/q136 parity);
    * MAD re-joins the per-dim medians and takes the exact median of
    * absolute deviations. Dimensions are 1-based to match SQL
    * `generate_subscripts`.
    *
    * Scale shape: posexplode to (dim, x) — rows x dims, the same
    * fan-out every per-dim aggregate pays — then two per-dim exact
    * percentiles (sort-based within each of the `dims` groups; dims
    * is small and fixed, so each group is one shuffle partition's
    * work; for billions of rows per dim switch to approx_percentile
    * and accept the documented error).
    */
  def robustDimStats(emb: DataFrame, vecCol: String): DataFrame = {
    val x = emb.select(
        posexplode(col(vecCol).cast("array<double>")).as(Seq("pos", "x")))
      .select((col("pos") + 1).as("dim"), col("x"))
    val med = x.groupBy(col("dim"))
      .agg(expr("percentile(x, 0.5)").as("med"),
        count(lit(1)).cast("long").as("n"))
    x.join(med, "dim")
      .groupBy(col("dim"))
      .agg(max(col("n")).as("n"), max(col("med")).as("med"),
        expr("percentile(abs(x - med), 0.5)").as("mad"))
  }

  /** Int8 scalar quantization audit — the storage decision for an
    * embedding corpus: per-dimension [min, max] ranges over the corpus
    * define a uint8 grid (`code = floor((x-lo)/(hi-lo)*255 + 0.5)` —
    * the portable rounding form, engine round() is not reproducible),
    * and every vector reports its reconstruction RMSE and max
    * absolute error. 4x smaller embeddings cost what this table says
    * they cost; at 100 TB of vectors that is the difference between
    * memory-resident ANN and not.
    *
    * The range table is the dims-bounded posexplode aggregate
    * (broadcast back); quantize + reconstruct + error run per row in
    * the projection. Degenerate dimensions (hi == lo) code to 0 and
    * reconstruct exactly.
    */
  def quantizeError8(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val bounds = perDimArrays(emb, vecCol, Nil,
      Seq("__lo" -> (c => min(c)), "__hi" -> (c => max(c))))
    // err_i = x - recon(quant(x)); the arithmetic tree mirrors the
    // oracle token for token so IEEE evaluation is bit-identical
    emb.join(broadcast(bounds))
      .withColumn("__err",
        zip_with(col(vecCol).cast("array<double>"),
          arrays_zip(col("__lo"), col("__hi")),
          (x, lh) => {
            val lo = lh.getField("__lo"); val hi = lh.getField("__hi")
            val code = when(hi > lo,
              floor((x - lo) / (hi - lo) * 255.0 + 0.5)).otherwise(lit(0.0))
            x - (lo + code / 255.0 * (hi - lo))
          }))
      .select(col(idCol),
        // empty vectors report null (matching SQL's empty-list sum),
        // never NaN from a 0/0
        when(size(col("__err")) > 0,
          sqrt(aggregate(col("__err"), lit(0.0), (acc, e) => acc + e * e)
            / size(col("__err")))).as("rmse"),
        array_max(transform(col("__err"), e => abs(e))).as("max_abs_err"))
  }

  /** Per-group embedding-diversity audit: the mean pairwise squared
    * L2 distance over ALL n² ordered pairs in each group, WITHOUT
    * forming a single pair — the identity
    *
    *   E‖x−y‖² = 2·(E‖x‖² − ‖E[x]‖²)
    *
    * reduces it to per-dimension sums, so the cost is O(n·d) where the
    * naive self-join is O(n²·d): the difference between an audit you
    * run on every corpus snapshot and one you cannot run at all (a
    * mode-collapsed embedding space — near-zero diversity — is how
    * duplicate-factory sources show up before any dedup pass).
    *
    * Arithmetic contract: elements are quantized to ×2²⁰ fixed-point
    * BIGINTs first — multiplication by a power of two and the +0.5
    * floor are EXACT in IEEE for |x|·2²⁰ < 2⁵², so the quantization is
    * reproducible anywhere — and every sum after that is integer
    * (DECIMAL(38,0) accumulators: Σq² per group reaches ~2⁴⁶·n, past
    * BIGINT near n ≈ 10⁵·shards at web scale). One double conversion
    * and three IEEE divisions at the very end, mirrored operand-for-
    * operand by the q123 oracle.
    *
    * Shape: one posexplode to (group, dim) — n·d rows, map-side
    * combined before the shuffle — then a d-row-per-group aggregate.
    * Output: groupCol, `n_vecs`, `mean_sq_dist` (0.0 for n = 1).
    */
  def meanPairwiseSqDist(emb: DataFrame, groupCol: String,
                         vecCol: String): DataFrame = {
    val q = transform(col(vecCol).cast("array<double>"),
      x => floor(x * lit(1048576.0) + lit(0.5)).cast("long"))
    val perDim = emb.select(col(groupCol), posexplode(q).as(Seq("__k", "__q")))
      .groupBy(col(groupCol), col("__k"))
      .agg(sum(col("__q")).as("__sk"),
        sum((col("__q") * col("__q")).cast("decimal(38,0)")).as("__s2k"))
    val sums = perDim.groupBy(col(groupCol))
      .agg(sum(col("__s2k")).as("__s2"),
        sum(col("__sk").cast("decimal(19,0)") *
          col("__sk").cast("decimal(19,0)")).as("__ss"))
    emb.groupBy(col(groupCol)).agg(count(lit(1)).as("n_vecs"))
      .join(sums, Seq(groupCol))
      .select(col(groupCol), col("n_vecs"),
        ((col("n_vecs") * col("__s2") - col("__ss")).cast("double")
          * lit(2.0) / col("n_vecs") / col("n_vecs")
          / lit(1099511627776.0)).as("mean_sq_dist"))
  }

  /** Exact brute-force cosine top-k.
    *
    * @param queries small frame of (idCol, vecCol) — broadcast.
    * @param corpus  large frame of (idCol, vecCol) — scanned once.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineFast(col("qv"), col("cv")).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos_sim")
  }

  /** Inner-product top-k — `bruteForceTopK`'s unnormalized sibling
    * (maximum-inner-product search, the retrieval scoring most rerankers
    * train against). Rankings DIFFER from cosine whenever corpus norms
    * vary, which is exactly why a fusion layer wants both. Same bounded-
    * broadcast contract: queries broadcast, corpus scanned once, per-
    * query WindowGroupLimit keeps k rows per map task.
    */
  def dotTopK(queries: DataFrame, corpus: DataFrame,
              idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        dot(col("qv"), col("cv")).as("dot"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dot").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "dot")
  }

  /** Reciprocal-rank fusion of two per-query rankings — the standard
    * hybrid-retrieval combiner (cosine + inner-product here; sparse +
    * dense in a full retrieval stack): every candidate scores
    * Σ_r 1/(k0 + rank_r), absent rankings contribute 0, and the fused
    * top-N re-ranks on the combined score. Robust precisely because it
    * never compares raw scores across rankers — only ranks.
    *
    * Inputs are any two frames with (query_id, neighbor_id, rank)
    * (the `bruteForceTopK`/`dotTopK` contract). Determinism: the fused
    * order is (pround6 score desc, neighbor_id) — the score is two
    * exact reciprocal terms added in a fixed order, so ties and
    * boundaries replay identically in any engine.
    *
    * Scale shape: one full-outer equi-join of two k-row-per-query
    * tables on (query, neighbor), then a per-query window — both keyed
    * by query, never corpus-scale.
    */
  def rrfFuse(a: DataFrame, b: DataFrame, k0: Int = 60,
              topN: Int = 5): DataFrame = {
    require(k0 >= 1, s"k0 must be >= 1: $k0")
    require(topN >= 1, s"topN must be >= 1: $topN")
    val fa = a.select(col("query_id"), col("neighbor_id"),
      col("rank").cast("long").as("rank_a"))
    val fb = b.select(col("query_id"), col("neighbor_id"),
      col("rank").cast("long").as("rank_b"))
    val score = floor((
      coalesce(lit(1.0) / (lit(k0.toDouble) + col("rank_a").cast("double")),
        lit(0.0)) +
      coalesce(lit(1.0) / (lit(k0.toDouble) + col("rank_b").cast("double")),
        lit(0.0))) * 1e6 + 0.5) / 1e6
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_score").desc, col("neighbor_id").asc)
    fa.join(fb, Seq("query_id", "neighbor_id"), "full_outer")
      .withColumn("rrf_score", score)
      .withColumn("fused_rank", row_number().over(w).cast("long"))
      .filter(col("fused_rank") <= topN)
      .select("query_id", "fused_rank", "neighbor_id", "rank_a", "rank_b",
        "rrf_score")
  }

  /** Cross-group neighbor mining — the bitext/alignment-mining shape:
    * for each query vector, its top-k cosine neighbors whose group
    * label DIFFERS (translation candidates across languages, near-pairs
    * across sources), thresholded so non-matches don't flood the
    * output. Same bounded-broadcast contract as `bruteForceTopK`
    * (queries broadcast, corpus scanned once); at full scale route
    * through the IVF/SRP variants first and apply the cross-group
    * constraint to the candidate set.
    */
  def crossGroupTopK(queries: DataFrame, corpus: DataFrame,
                     idCol: String, vecCol: String, groupCol: String,
                     k: Int, minCosine: Double): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qv"), col(groupCol).as("query_group")))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("cv"), col(groupCol).as("neighbor_group"))
    val scored = q.join(c, col("query_group") =!= col("neighbor_group"))
      .select(col("query_id"), col("query_group"), col("neighbor_id"),
        col("neighbor_group"), cosineFast(col("qv"), col("cv")).as("cos_sim"))
      .filter(col("cos_sim") >= minCosine)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "query_group", "rank", "neighbor_id",
        "neighbor_group", "cos_sim")
  }

  /** SRP-LSH top-k: corpus and queries bucketed by sign-random-projection;
    * only same-bucket candidates are scored. Approximate (recall < 1) but
    * the scored volume drops by ~2^planes.
    */
  def srpTopK(queries: DataFrame, corpus: DataFrame,
              idCol: String, vecCol: String, k: Int,
              planes: Int = 6, dims: Int = 64): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      srpBucket(col(vecCol), planes, dims).as("bucket")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      srpBucket(col(vecCol), planes, dims).as("bucket"))
    val scored = q.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineFast(col("qv"), col("cv")).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos_sim")
  }

  /** Multi-probe SRP top-k (the Lv et al. VLDB'07 trade): each query
    * probes its own SRP bucket PLUS the `planes` Hamming-1 buckets —
    * a near-miss pair differs in few sign bits, so probing the
    * adjacent buckets recovers most of single-bucket SRP's lost
    * recall at (planes+1)× QUERY-side cost while the corpus index
    * stays ONE bucket per vector (unlike band-amplification, which
    * multiplies the indexed rows). Probe buckets are the home bucket
    * XOR one-bit masks — distinct by construction, so no candidate
    * dedup pass is needed.
    *
    * Scale shape identical to `srpTopK`: the (probes × queries) side
    * broadcasts, the corpus is scanned once, and scoring volume is
    * (planes+1)/2^planes of brute force in expectation.
    */
  def srpMultiProbeTopK(queries: DataFrame, corpus: DataFrame,
                        idCol: String, vecCol: String, k: Int,
                        planes: Int = 6, dims: Int = 64): DataFrame = {
    require(planes >= 1 && planes < 63, s"planes out of range: $planes")
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      srpBucket(col(vecCol), planes, dims).as("bucket"))
    val masks = array((lit(0L) +: (0 until planes).map(p => lit(1L << p))): _*)
    val probes = broadcast(queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        srpBucket(col(vecCol), planes, dims).as("__b0"))
      .select(col("query_id"), col("qv"), col("__b0"),
        explode(masks).as("__m"))
      .select(col("query_id"), col("qv"),
        col("__b0").bitwiseXOR(col("__m")).as("bucket")))
    val scored = probes.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineFast(col("qv"), col("cv")).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos_sim")
  }

  /** IVF top-k with learned coarse cells: k-means (MLlib) fit on the
    * corpus assigns every vector a cell; queries route to their `nprobe`
    * nearest centroids and scan only those cells — the scanned fraction
    * is ~nprobe/nCells of the corpus. Deterministic under `seed`.
    *
    * At 100 TB: fit on a sample (`fitSampleFraction`), assign with one
    * narrow pass, and persist the assignment as a partition column so
    * repeated query batches prune cells at the scan.
    */
  def kmeansIvfTopK(queries: DataFrame, corpus: DataFrame,
                    idCol: String, vecCol: String, k: Int,
                    nCells: Int = 16, nprobe: Int = 2, seed: Long = 42L,
                    fitSampleFraction: Double = 1.0): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val featured = corpus.withColumn("__f", array_to_vector(col(vecCol).cast("array<double>")))
    val fitOn = if (fitSampleFraction < 1.0) featured.sample(fitSampleFraction, seed) else featured
    val model = new KMeans().setK(nCells).setSeed(seed)
      .setFeaturesCol("__f").setPredictionCol("__cell")
      .fit(fitOn)
    val assigned = model.transform(featured)
      .select(col(idCol), col(vecCol), col("__cell").as("cell"))
    ivfTopK(queries, assigned, idCol, vecCol, "cell", k, nprobe)
  }

  /** IVF top-k with REPLAYABLE learned cells: spherical Lloyd's with a
    * deterministic init — the `iters`-assignment fit an oracle can
    * unroll CTE-by-CTE (the PageRank discipline), where MLlib's
    * k-means|| init is engine-private and only recall-gateable.
    *
    * Init: the `nCells` smallest-id vectors are the round-0 centroids
    * (cell i = rank i by id). Each round assigns every vector to its
    * max-cosine centroid (ties → smallest cell — exact doubles on both
    * engines per the q24 `list_dot_product` precedent) and recomputes
    * centroids as per-dimension means of the new assignment; after
    * `iters` assignments the final partition feeds [[ivfTopK]]
    * unchanged (whose routing re-derives means of the final
    * assignment, exactly as the q25 oracle does).
    *
    * Scale shape per round: one broadcast of nCells centroid rows
    * against the corpus (no corpus shuffle), one argmax HASH aggregate
    * per vector (max(struct(sim, −cell)) — no per-id window), one
    * dims-bounded mean rebuild. Rounds are data-independent
    * (`iters` fixed), so the 100 TB cost is iters × (one corpus scan +
    * one keys+vector aggregate). Cells that lose every member simply
    * drop out (k-means' standard empty-cell shrink).
    */
  def sphericalLloydIvfTopK(queries: DataFrame, corpus: DataFrame,
                            idCol: String, vecCol: String, k: Int,
                            nCells: Int = 16, nprobe: Int = 2,
                            iters: Int = 2): DataFrame = {
    require(nCells >= 1 && nCells <= 256,
      s"nCells must be in [1, 256] (centroids are broadcast): $nCells")
    require(iters >= 1 && iters <= 8,
      s"iters must be in [1, 8] (each is a full corpus scan): $iters")
    val spark = corpus.sparkSession
    import spark.implicits._
    val vecs = corpus.select(col(idCol), col(vecCol).cast("array<double>")
      .as(vecCol))
    // round-0 centroids: the nCells smallest-id vectors, cell = id rank
    val init = vecs.orderBy(col(idCol)).limit(nCells).collect()
      .zipWithIndex.map { case (r, i) =>
        (i, r.getSeq[Double](1).toArray.toSeq)
      }.toSeq
    var centroids = init.toDF("cell", "__cv")
    var assigned: DataFrame = null
    for (t <- 1 to iters) {
      val sims = vecs.join(broadcast(centroids))
        .select(col(idCol), col(vecCol), col("cell"),
          cosineFast(col(vecCol), col("__cv")).as("__sim"))
      assigned = sims.groupBy(col(idCol))
        .agg(first(col(vecCol)).as(vecCol),
          max(struct(col("__sim"), (lit(0) - col("cell")).as("__negc")))
            .as("__m"))
        .select(col(idCol), col(vecCol),
          (lit(0) - col("__m.__negc")).as("cell"))
        .localCheckpoint(true)
      // the LAST assignment's means are ivfTopK's routing centroids —
      // recomputing them here would be a dead aggregate
      if (t < iters)
        centroids = perDimArrays(assigned.select(col("cell"), col(vecCol)),
          vecCol, Seq("cell"), Seq("__cv" -> (c => avg(c))))
    }
    ivfTopK(queries, assigned, idCol, vecCol, "cell", k, nprobe)
  }

  /** IVF-style top-k using a coarse-cell column (here: the provided
    * `label` as the cell; `kmeansIvfTopK` slots a learned assignment into
    * the same shape). Centroids are computed by element-wise mean
    * (posexplode + two-level aggregate), queries are routed to their
    * `nprobe` nearest centroids, and only those cells are scanned.
    *
    * The routed probe set (queries × nprobe rows, vectors included) is
    * BROADCAST against the corpus — that is the whole point of the
    * shape (no corpus shuffle), but it silently OOMs the driver if the
    * query frame isn't actually small. `maxQueries` enforces the
    * contract the same way `Relational.positionalZip` does: counted
    * with an early-stop limit, failing fast with a named knob instead.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame,
              idCol: String, vecCol: String, cellCol: String,
              k: Int, nprobe: Int = 2, maxQueries: Int = 100000): DataFrame = {
    require(queries.limit(maxQueries + 1).count() <= maxQueries,
      s"ivfTopK query side exceeds maxQueries=$maxQueries; the probe set " +
        "is broadcast — batch the queries or raise maxQueries only if " +
        "the driver can hold queries*nprobe vectors")
    // element-wise mean per cell: (cell, dim) partial sums -> array rebuild
    val centroids = perDimArrays(
      corpus.select(col(cellCol).as("cell"), col(vecCol)),
      vecCol, Seq("cell"), Seq("centroid" -> (c => avg(c))))

    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    // route each query to its nprobe nearest centroids (centroid set is tiny)
    val routed = q.join(broadcast(centroids))
      .select(col("query_id"), col("qv"), col("cell"),
        cosineFast(col("qv"), col("centroid")).as("c_sim"))
    val wr = Window.partitionBy(col("query_id")).orderBy(col("c_sim").desc, col("cell").asc)
    val probes = routed.withColumn("pr", row_number().over(wr))
      .filter(col("pr") <= nprobe)
      .select("query_id", "qv", "cell")

    val c = corpus.select(col(cellCol).as("cell"), col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = broadcast(probes).join(c, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineFast(col("qv"), col("cv")).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos_sim")
  }

  /** Label-noise screen: per-vector agreement with the labels of its
    * SRP-bucket neighbors, in exact basis points. A vector whose
    * neighborhood overwhelmingly carries ANOTHER label is a
    * mislabeling candidate (or sits on a class boundary) — the
    * embedding-space analog of rater disagreement, ranked before
    * manual relabeling passes.
    *
    * Neighbors are the banded SRP candidate pairs (`pairsInBuckets`
    * over `srpBandKeysFast` buckets — never an all-pairs join), so a
    * vector's neighborhood is its LSH-recallable cosine neighborhood;
    * agreement is n_same * 10000 div n_neighbors, all BIGINT, so the
    * screen is engine-exact. Vectors with fewer than `minNeighbors`
    * candidates are excluded (agreement over a tiny sample is noise).
    */
  def labelConsistency(emb: DataFrame, vecCol: String, idCol: String,
                       labelCol: String, bands: Int = 4,
                       planesPerBand: Int = 16, dims: Int = 64,
                       minNeighbors: Int = 3): DataFrame = {
    require(minNeighbors >= 1, s"minNeighbors must be >= 1, got $minNeighbors")
    val base = emb.select(col(idCol).as("doc"), col(vecCol).as("v"),
      col(labelCol).as("lab"))
    val keyed = base.select(col("doc"),
      explode(srpBandKeysFast(col("v"), bands, planesPerBand, dims))
        .as("band_key"))
    val cands = Dedup.pairsInBuckets(keyed, "doc", "band_key")
    val nbrs = cands.select(col("id_a").as("doc"), col("id_b").as("nbr"))
      .unionAll(cands.select(col("id_b").as("doc"), col("id_a").as("nbr")))
    val labs = base.select(col("doc"), col("lab"))
    nbrs.join(labs, "doc")
      .join(labs.select(col("doc").as("nbr"), col("lab").as("nbr_lab")), "nbr")
      .groupBy(col("doc"), col("lab"))
      .agg(count(lit(1)).cast("long").as("n_neighbors"),
        sum(when(col("lab") === col("nbr_lab"), 1L).otherwise(0L))
          .cast("long").as("n_same"))
      .filter(col("n_neighbors") >= minNeighbors)
      .select(col("doc").as(idCol), col("lab").as(labelCol),
        col("n_neighbors"), col("n_same"),
        expr("CAST(n_same * 10000 DIV n_neighbors AS BIGINT)").as("agree_bp"))
  }
}
