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

  /** All within-cluster exact-duplicate pairs (id_a < id_b) — the
    * labeled TRUTH set for evaluating a near-dup candidate generator
    * (`Metrics.linkageQuality`). Pairs are quadratic in CLUSTER size,
    * so a cluster past `maxClusterSize` RAISES (guard evaluated on
    * the join input rows — a pruned-column guard never fires) instead
    * of silently exploding; real corpora's exact-dup clusters are
    * small, and one that is not is a data bug worth the loud stop.
    */
  def exactDupPairs(docs: DataFrame, textCol: String, idCol: String,
                    maxClusterSize: Long = 10000L): DataFrame = {
    require(maxClusterSize >= 2, s"maxClusterSize >= 2: $maxClusterSize")
    val hashed = docs.select(md5(lower(col(textCol))).as("__h"),
      col(idCol))
    val sizes = hashed.groupBy(col("__h"))
      .agg(count(lit(1)).as("__n"))
    // singleton hashes (the bulk of a mostly-unique corpus) can never
    // pair — drop them BEFORE the self-join instead of shuffling the
    // whole corpus through it; guard rows all have __n >= 2, so the
    // raise still fires
    val guarded = hashed.join(sizes, Seq("__h"))
      .filter(col("__n") >= 2L)
      .withColumn("__hg",
        when(col("__n") > maxClusterSize,
          expr(s"CAST(raise_error(concat('Dedup.exactDupPairs: ', " +
            s"CAST(__n AS STRING), ' docs share one content hash — " +
            s"pairs would be quadratic past maxClusterSize=" +
            s"$maxClusterSize')) AS STRING)"))
          .otherwise(col("__h")))
    guarded.select(col("__hg"), col(idCol).as("id_a"))
      .join(guarded.select(col("__hg"), col(idCol).as("id_b")),
        Seq("__hg"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
  }

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

  /** Per-doc k-position MinHash signature via the native `MinHashSig`
    * expression: one per-row loop over the 3-token shingles, one md5
    * per shingle, k mins derived arithmetically (Kirsch-Mitzenmacher:
    * h_i = h1 + i*h2 over the two 60-bit md5 halves — 60 bits keep
    * h1 + 5*h2 < 2^63, portable to the DuckDB oracle's hex cast).
    *
    * SHUFFLE-FREE: earlier shapes exploded every shingle into a row
    * stream (window-lead shingling + a k-min hash aggregate), which is
    * codegen-friendly but shuffles the corpus' full token volume to
    * re-group it by doc. The native expression computes the identical
    * signature values (`SignatureExprsSpec` pins bit-equality to the
    * relational form) inside the scan projection — at 100 TB the only
    * thing that ever shuffles downstream is the band keys. Docs with
    * fewer than 3 tokens have a null signature and are dropped, the
    * relational form's no-rows-after-explode absence.
    */
  def minhashSignatures(docs: DataFrame, textCol: String, idCol: String, k: Int): DataFrame = {
    val sig = graft.expressions.GraftFunctions.minhashSig(col(textCol), k)
    docs.select(col(idCol).as("doc"), sig.as("sig"))
      .filter(col("sig").isNotNull)
      .select(col("doc") +:
        (0 until k).map(i => element_at(col("sig"), i + 1).as(s"mh$i")): _*)
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
    * bucket -> sorted id list -> per-bucket combination expansion via
    * the native `PairCombos` loop (the nested-transform HOF form builds
    * the same pair list interpreted, with a slice allocation per id).
    */
  private[graft] def pairsInBuckets(keyed: DataFrame, idCol: String, bucketCol: String): DataFrame = {
    val ids = col("ids")
    keyed.groupBy(col(bucketCol))
      .agg(array_sort(collect_set(col(idCol))).as("ids"))
      .filter(size(ids) > 1)
      .select(explode(graft.expressions.GraftFunctions.pairCombos(ids)).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .distinct()
  }

  /** Ids the near-dup keep policy drops, given candidate pairs
    * (`id_a` < `id_b` edges from `minhashCandidates` and kin).
    *
    * `transitive = true`: one survivor (min id) per connected component
    * of the candidate graph. Pairwise resolution keeps one doc per
    * LOCAL minimum — pairs (1,4),(2,4) would keep both 1 and 2 though
    * they sit in one component — so the labeling runs to the fixpoint
    * instead (small graphs resolve on the driver, large ones through
    * `Components`' distributed loop). The loser set is checkpointed off
    * the labeling's blocks so the full (node, component) frame frees
    * immediately; the small loser frame itself is reclaimed by the
    * ContextCleaner once the caller drops it (the same discipline as
    * the q46 entry's result checkpoint).
    *
    * `transitive = false`: drop the larger id of every candidate pair,
    * one pass — cheaper when component-level collapse isn't needed.
    */
  def nearDupLosers(pairs: DataFrame, idCol: String,
                    transitive: Boolean): DataFrame =
    if (transitive) {
      val labels = Components.connectedComponents(pairs)
      val l = labels.filter(col("node") =!= col("component"))
        .select(col("node").as(idCol))
        .localCheckpoint(eager = true)
      Components.free(labels)
      l
    } else {
      pairs.select(col("id_b").as(idCol)).distinct()
    }

  /** LSH cost/skew audit: per band, the bucket-size distribution that
    * prices the candidate-pair expansion BEFORE running it. At 100 TB
    * the failure mode of banded dedup is a handful of hot buckets
    * (empty-ish docs, boilerplate) whose n*(n-1)/2 pair blowup
    * dominates the job; this report (max bucket, pair count per band)
    * is the audit that catches it while it is still one groupBy.
    * All-integer output, so the oracle comparison is exact.
    */
  def bandBucketStats(docs: DataFrame, textCol: String, idCol: String,
                      bands: Int = 3, rowsPerBand: Int = 2): DataFrame = {
    val sigs = minhashSignatures(docs, textCol, idCol, bands * rowsPerBand)
    val keyed = minhashBandKeys(sigs, bands, rowsPerBand)
    val buckets = keyed.groupBy(col("band_key"))
      .agg(count(lit(1)).as("n"))
      .select(substring_index(col("band_key"), "|", 1).as("band"), col("n"))
    buckets.groupBy(col("band"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(col("n")).as("n_docs"),
        max(col("n")).as("max_bucket"),
        // n*(n-1) is even, so `div 2` is exact — stays integer all the
        // way (a `/` would detour through double)
        sum(expr("n * (n - 1) div 2")).as("candidate_pairs"))
  }

  /** Canonical-document selection per near-dup cluster: instead of the
    * keep-min-id policy (`nearDupLosers`), each connected component of
    * the candidate graph keeps its BEST document by an explicit quality
    * ordering (quality desc, then id asc so float ties stay
    * deterministic). Docs in no candidate pair are their own
    * single-member cluster.
    *
    * Output: one row per cluster — `cluster` (component id = min member
    * id), `rep_id` (the kept doc), `n_members`, `rep_quality`.
    *
    * Scale shape: candidates and components are the banded machinery
    * above (never all-pairs); the selection itself is ONE hash
    * aggregate via `max_by(id, struct(quality, -id))` — no per-cluster
    * sort window, so a pathological boilerplate cluster with millions
    * of members costs a partial-aggregated scan, not a single-task
    * sort. The labeling frame is released once the winners are
    * checkpointed (q46 discipline).
    */
  def canonicalReps(docs: DataFrame, textCol: String, idCol: String,
                    quality: org.apache.spark.sql.Column,
                    bands: Int = 3, rowsPerBand: Int = 2): DataFrame = {
    val pairs = minhashCandidates(docs, textCol, idCol, bands, rowsPerBand)
    val labels = Components.connectedComponents(pairs)
    val clustered = docs
      .join(labels.withColumnRenamed("node", idCol), Seq(idCol), "left")
      .select(coalesce(col("component"), col(idCol)).as("cluster"),
        col(idCol).as("__id"), quality.as("__q"))
    val reps = clustered.groupBy(col("cluster"))
      .agg(max_by(col("__id"), struct(col("__q"), -col("__id"))).as("rep_id"),
        count(lit(1)).as("n_members"), max(col("__q")).as("rep_quality"))
      .localCheckpoint(eager = true)
    Components.free(labels)
    reps
  }

  /** Containment screen: the doc-inside-doc case Jaccard misses. For
    * banded candidate pairs, containment(A in B) = |A∩B| / |A| over
    * distinct shingle sets — a long document that swallowed a short one
    * whole scores near 1.0 on containment while the symmetric Jaccard
    * can sit far below any near-dup threshold. Emits per-pair max
    * containment alongside Jaccard plus a `contained` flag
    * (containment >= minContainment AND jaccard < maxJaccard — pairs
    * ordinary near-dup dedup would NOT collapse).
    *
    * Same cost bound as `ngramJaccard`: shingle sets join only for
    * candidate docs, so pairwise work is O(candidates).
    */
  def containmentPairs(docs: DataFrame, textCol: String, idCol: String,
                       n: Int = 3, bands: Int = 3, rowsPerBand: Int = 2,
                       minContainment: Double = 0.8,
                       maxJaccard: Double = 0.5): DataFrame = {
    val candidates = minhashCandidates(docs, textCol, idCol, bands, rowsPerBand)
    val sets = docs.select(col(idCol).as("doc"),
      graft.expressions.GraftFunctions.distinctWordShingles(col(textCol), n).as("sh"))
    val both = candidates
      .join(sets.withColumnRenamed("doc", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(sets.withColumnRenamed("doc", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
    both.select(col("id_a"), col("id_b"),
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double").as("inter"),
        size(col("sh_a")).cast("double").as("na"),
        size(col("sh_b")).cast("double").as("nb"))
      .withColumn("containment",
        when(least(col("na"), col("nb")) > 0,
          col("inter") / least(col("na"), col("nb"))).otherwise(lit(0.0)))
      .withColumn("jaccard",
        when(col("na") + col("nb") - col("inter") > 0,
          col("inter") / (col("na") + col("nb") - col("inter")))
          .otherwise(lit(0.0)))
      .withColumn("contained",
        when(col("containment") >= minContainment &&
          col("jaccard") < maxJaccard, 1L).otherwise(0L))
      .select("id_a", "id_b", "containment", "jaccard", "contained")
  }

  /** Prefix-filtered set-similarity self-join (AllPairs / PPJoin
    * family, Bayardo et al. WWW'07) — the EXACT-complete alternative
    * to MinHash banding: every pair with token-set Jaccard >= t is
    * guaranteed a candidate (LSH only finds them with the S-curve's
    * probability), while still never going all-pairs.
    *
    * Mechanics: tokens are globally ordered rarest-first (document
    * frequency asc, token asc — encoded as one sortable string
    * `lpad(df)|token` so both engines sort identically); each doc
    * indexes only the FIRST |T| - ceil(t*|T|) + 1 tokens of its sorted
    * distinct-token set (the prefix); two docs are candidates iff they
    * share a PREFIX token. Rare tokens carry tiny postings lists, and
    * any pair at Jaccard >= t provably collides in the prefixes.
    * Candidates are then verified with exact set Jaccard and filtered
    * to >= t; verification runs over 60-bit md5 hashes of the units
    * (see the hash60 note below) so the candidate join ships 8-byte
    * longs instead of ~35-byte shingle strings.
    *
    * Scale shape: the prefix explode shuffles O(rows x prefix) keys
    * whose postings are df-bounded by construction (the frequent
    * tokens — the hot buckets that kill naive token joins — are
    * exactly the ones the prefix drops); verification joins the token
    * sets only for candidate docs.
    *
    * Adversarial-corpus contract: posting sparsity is a property of
    * NATURAL shingle distributions. A corpus of near-identical docs
    * shares its RARE units too, so the true >= t output — which any
    * exact-complete join must emit — is quadratic. The operator
    * therefore pre-estimates the candidate upper bound
    * Σ_bucket m·(m−1)/2 from the prefix-posting sizes (a
    * construction-time count-aggregate job that re-runs the
    * keys-only posting pipeline once — measured cheaper than
    * checkpoint-sharing it — plus a one-row collect; no recall
    * impact) and
    * throws IllegalStateException past `maxCandidates` instead of
    * running quadratic without warning; remedies are in the message
    * (raise shingleN/minJaccard, collapse exact dups first, or raise
    * the cap to opt in).
    */
  def prefixFilterPairs(docs: DataFrame, textCol: String, idCol: String,
                        minJaccard: Double = 0.5,
                        shingleN: Int = 1,
                        maxCandidates: Long = 10000000L): DataFrame = {
    require(minJaccard > 0 && minJaccard <= 1,
      s"minJaccard must be in (0,1]: $minJaccard")
    require(shingleN >= 1, s"shingleN must be >= 1: $shingleN")
    require(maxCandidates >= 1L,
      s"maxCandidates must be >= 1: $maxCandidates")
    // the set UNIT is the scale lever: raw tokens (shingleN = 1) stop
    // discriminating on small-vocabulary corpora — most doc pairs
    // share half their tokens, the TRUE result is quadratic, and no
    // candidate scheme can beat its own output size (measured: 8.9M
    // passing pairs over 5k docs at t=0.5). Word n-shingles (n >= 2)
    // restore a sparse set space where near-dup pairs are rare and the
    // prefix postings stay short.
    val units =
      if (shingleN == 1) array_distinct(tokens(col(textCol)))
      else graft.expressions.GraftFunctions
        .distinctWordShingles(col(textCol), shingleN)
    val toks = docs.select(col(idCol).as("doc"),
        explode(units).as("token"))
    val freq = toks.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val keyed = toks.join(freq, "token")
      .select(col("doc"),
        concat(lpad(col("df").cast("string"), 10, "0"), lit("|"),
          col("token")).as("k"))
    // The per-doc unit-set frame feeds three consumers in the MAIN job
    // (prefix explode + both verification sides) — exchange reuse
    // dedups those — plus the guard's bound-estimate JOB below, which
    // re-executes the posting pipeline once (reuse does not span
    // jobs). Checkpointing `sets` to share it across jobs was
    // MEASURED SLOWER (q143 sf0.1 median 8.6s vs 7.1s): materializing
    // the per-doc array frame costs more than one keys-only recompute.
    val sets = keyed.groupBy(col("doc"))
      .agg(array_sort(collect_list(col("k"))).as("ks"))
      .withColumn("__n", size(col("ks")))
      .withColumn("__p",
        (col("__n") - ceil(lit(minJaccard) * col("__n")) + 1).cast("int"))
    val prefixes = sets.select(col("doc"),
      explode(slice(col("ks"), lit(1), col("__p"))).as("k"))
    // Adversarial-corpus guard: the postings are sparse for NATURAL
    // shingle distributions (the frequent units are exactly the ones
    // the prefix drops), but a corpus of near-identical docs shares
    // rare units too — every doc lands in the same prefix buckets, the
    // TRUE output is quadratic, and no exact-complete join can beat
    // its own output size. Rather than silently degrade recall with a
    // stop-unit cap (winnowing's rule — wrong here, where recall 1.0
    // IS the contract), pre-estimate the candidate upper bound
    // Σ_bucket m·(m−1)/2 from the posting sizes — a count-aggregate
    // job that re-executes the posting pipeline once (measured
    // cheaper than checkpoint-sharing it; see the `sets` note) plus a
    // one-row collect — and refuse loudly
    // past `maxCandidates`: the caller should raise shingleN, raise
    // minJaccard, pre-collapse exact dups (q20/q124), or accept the
    // cost explicitly by raising the cap.
    val bound = prefixes.groupBy(col("k"))
      .agg(count(lit(1)).cast("long").as("__m"))
      .agg(sum(expr("__m * (__m - 1) DIV 2")).cast("long").as("__cand"),
        sum(col("__m")).cast("long").as("__rows"))
      .collect()(0)
    val candBound = if (bound.isNullAt(0)) 0L else bound.getLong(0)
    val prefixRows = if (bound.isNullAt(1)) 0L else bound.getLong(1)
    if (candBound > maxCandidates) throw new IllegalStateException(
      s"prefixFilterPairs: prefix-posting candidate bound $candBound exceeds " +
        s"maxCandidates=$maxCandidates — the corpus is too self-similar for an " +
        s"exact-complete join at minJaccard=$minJaccard/shingleN=$shingleN. " +
        "Raise shingleN or minJaccard, pre-collapse exact duplicates first, " +
        "or raise maxCandidates to accept the quadratic output explicitly.")
    val cand = pairsInBuckets(prefixes, "doc", "k")
    // Verification ships 60-bit md5 hashes of the units, not the unit
    // strings: a word 3-shingle key (`lpad(df)|w1 w2 w3`) averages
    // ~35 bytes, and the candidate join materializes BOTH docs' full
    // unit arrays per candidate row — at the sf10 probe that payload
    // (~2×600 units × 35 B × 186M candidates) exhausted local shuffle
    // disk. 8-byte longs cut the verification shuffle ~4-5× with
    // identical pair semantics: set Jaccard over injectively-hashed
    // units equals set Jaccard over the units themselves barring a
    // 60-bit collision inside one pair's union (P < n²/2^61 ≈ 1e-12
    // at n=1k units), and the DuckDB oracle hashes in lockstep so the
    // gate compares identical formulas either way. The PREFIX pipeline
    // keeps the sortable strings — rarest-first ordering is what keeps
    // the postings short, and hash order would scatter frequent units
    // back into the prefixes.
    val hash60 = (x: org.apache.spark.sql.Column) =>
      conv(substring(md5(x), 1, 15), 16, 10).cast("long")
    val hsets = sets.select(col("doc"),
      array_distinct(transform(col("ks"), hash60)).as("hs"))
    // JOIN STRATEGY is the second half of the verification scale
    // story: with plain sort-merge joins the intermediate between the
    // two joins — every candidate row already carrying doc A's full
    // hash array — gets SORTED by id_b, and at the sf10 probe that
    // sort (186M rows × ~450 B) needed ~80 GB of spill and took the
    // executor heap down first. The per-doc set table is the SMALL
    // side (n_docs rows), so when it plausibly fits the driver we
    // broadcast it and verification pipelines scan→BHJ→BHJ→aggregate
    // with no wide sort at all. Size is estimated from the guard
    // job's posting stats (already collected): prefix length is
    // ~(1−t)·n+1 units, so Σ units ≈ prefixRows/(1−t) and bytes ≈
    // 8·Σunits plus array overhead (×3 fudge). Past the cap the
    // joins fall back to Spark's default (a cluster's aggregate
    // spill handles the sort; one box's doesn't).
    val setsBytesEst =
      (24.0 * prefixRows / math.max(1.0 - minJaccard, 0.1)).toLong
    val bcast = setsBytesEst <= 1500000000L
    // ONE broadcast relation serves both verification sides: the a/b
    // projections are joined as subquery aliases over the SAME frame,
    // so the two BroadcastExchanges canonicalize identically and
    // exchange reuse materializes a single copy (plan-pinned by
    // DedupPlanSpec). The earlier shape — two separately-renamed
    // projections — broadcast twice, holding ~2× setsBytesEst on the
    // driver and every executor at the cap (the round-14 advisor
    // finding); with reuse the 1.5 GB cap bounds what is actually
    // resident.
    val shared0 = hsets
    val shared = if (bcast) broadcast(shared0) else shared0
    cand
      .join(shared.as("sa"), col("id_a") === col("sa.doc"))
      .join(shared.as("sb"), col("id_b") === col("sb.doc"))
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("sa.hs"), col("sb.hs"))).cast("double").as("__i"),
        size(col("sa.hs")).cast("double").as("__na"),
        size(col("sb.hs")).cast("double").as("__nb"))
      .withColumn("jaccard", col("__i") / (col("__na") + col("__nb") - col("__i")))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "jaccard")
  }

  /** Winnowing fingerprint overlap (Schleimer/Wilkerson/Aiken,
    * SIGMOD'03 — the MOSS algorithm): doc pairs sharing >= minShared
    * SELECTED fingerprints, where each doc keeps only the minimum
    * k-gram hash of every w-length sliding window instead of all
    * k-gram hashes. Guarantees: any shared substring of length
    * >= w+k-1 produces at least one shared selected fingerprint, and
    * selection is position-local (no global state), so the fingerprint
    * density is ~2/(w+1) of the full gram set — the index shrinks
    * w-fold while long-match detection stays exact.
    *
    * Selection is by MIN HASH VALUE per window (md5 hex — identical
    * lexicographic order on both engines); because only the hash VALUE
    * is kept (not its position), window ties cannot produce
    * engine-divergent fingerprint sets. Docs shorter than k grams
    * winnow their whole gram set. Fingerprints present in more than
    * maxDf docs are dropped before pairing (the stop-fingerprint rule:
    * corpus boilerplate has no discrimination value, and its buckets
    * are the quadratic blow-up), so the match guarantee applies to
    * substrings that are not corpus-ubiquitous.
    *
    * Scale shape: selection runs entirely inside the scan projection
    * via the native `WinnowedFps` expression — one lowercase, n
    * digests, an O(n*w) min scan per row, no shuffle (the HOF and
    * explode+window formulations are traps: lambda bodies re-inline
    * the hash-array/lower(text) expressions per window — O(n^2)/doc —
    * and the window form pays a doc-id shuffle plus per-doc sort).
    * The pair count is a groupBy on fingerprint and the bounded
    * `PairCombos` bucket expansion plus one (id_a, id_b) hash
    * aggregate — identical shape to the banded MinHash join, with the
    * winnowed density keeping postings ~w x smaller.
    */
  def winnowedPairs(docs: DataFrame, textCol: String, idCol: String,
                    k: Int = 8, w: Int = 4, minShared: Int = 2,
                    maxDf: Int = 20): DataFrame = {
    require(k >= 2 && w >= 1 && minShared >= 1 && maxDf >= 2,
      s"bad winnowing params: k=$k w=$w minShared=$minShared maxDf=$maxDf")
    val fps = docs.select(col(idCol).as("doc"),
      explode(graft.expressions.GraftFunctions
        .winnowedFps(col(textCol), k, w)).as("fp"))
    // drop over-common fingerprints (boilerplate substrings shared by
    // thousands of docs): they carry no discrimination signal and their
    // buckets are the quadratic blow-up — the same stop-fingerprint
    // rule production winnowing indexes apply. Bucket expansion is then
    // bounded at maxDf^2/2 pairs per fingerprint BY CONSTRUCTION.
    fps.groupBy(col("fp"))
      .agg(array_sort(collect_set(col("doc"))).as("ids"))
      .filter(size(col("ids")) > 1 && size(col("ids")) <= maxDf)
      .select(explode(graft.expressions.GraftFunctions.pairCombos(col("ids"))).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).cast("long").as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** MinHash estimator calibration: for every banded candidate pair,
    * cross-tab the signature agreement count (0..k matching positions —
    * the LSH similarity estimate) against the TRUE shingle Jaccard's
    * decile. The table answers "is my banding threshold doing what the
    * S-curve math says" on the actual corpus — e.g. how many 5-of-6
    * pairs are really below 0.5 — before committing a threshold at
    * full scale. Cost is O(candidates); the signature frame is reused
    * for both the banding and the agreement count.
    */
  def minhashCalibration(docs: DataFrame, textCol: String, idCol: String,
                         bands: Int = 3, rowsPerBand: Int = 2): DataFrame = {
    val k = bands * rowsPerBand
    val sigs = minhashSignatures(docs, textCol, idCol, k)
    val cand = pairsInBuckets(minhashBandKeys(sigs, bands, rowsPerBand), "doc", "band_key")
    val jac = ngramJaccard(docs, textCol, idCol, cand)
    val sa = sigs.toDF("id_a" +: (0 until k).map(i => s"a$i"): _*)
    val sb = sigs.toDF("id_b" +: (0 until k).map(i => s"b$i"): _*)
    val matches = (0 until k)
      .map(i => when(col(s"a$i") === col(s"b$i"), 1L).otherwise(0L))
      .reduce(_ + _)
    jac.join(sa, "id_a").join(sb, "id_b")
      .select(matches.as("sig_matches"),
        least(floor(col("jaccard") * 10).cast("long"), lit(9L)).as("jaccard_decile"))
      .groupBy(col("sig_matches"), col("jaccard_decile"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** Exact n-gram Jaccard for candidate pairs: LSH candidates are
    * verified against true shingle-set Jaccard. The shingle sets are
    * joined only for candidate docs (semi-join pruning), so pairwise cost
    * is bounded by the candidate count, not n^2.
    */
  def ngramJaccard(docs: DataFrame, textCol: String, idCol: String,
                   candidates: DataFrame, n: Int = 3): DataFrame = {
    // native shingle set: one tokenize + linked-hash-set pass per doc
    // (the array_distinct(wordShingles(tokens(...))) chain is three
    // interpreted HOF passes); first-occurrence order preserved
    val sets = docs.select(col(idCol).as("doc"),
      graft.expressions.GraftFunctions.distinctWordShingles(col(textCol), n).as("sh"))
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

  /** Per-doc 16-bit SimHash via the native `SimHash16Sig` expression
    * (plane j = high bit of hex digit j of md5(token), i.e. digit >=
    * '8' — same definition as TextFns.simhash16 and the unnest-based
    * oracle). Shuffle-free: the earlier relational shape exploded
    * tokens into a 16-vote hash aggregate; the native per-row loop
    * computes identical values inside the scan projection
    * (`SignatureExprsSpec`). Docs with no tokens have a null signature
    * and are dropped (the oracle's no-rows absence).
    */
  def simhashSignatures(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol).as("doc"),
        graft.expressions.GraftFunctions.simhash16Sig(col(textCol)).as("sig"))
      .filter(col("sig").isNotNull)

  /** Per-doc 64-bit SimHash, held as FOUR 16-bit band values s0..s3
    * (band b = bits [16b, 16b+16) of the signature = hex digits
    * [4b+1, 4b+4] of md5(token)). Splitting the signature into its four
    * bands up front serves both consumers — the LSH band key IS the band
    * value, and Hamming distance is the sum of the per-band popcounts —
    * while keeping every value comfortably inside a signed BIGINT for
    * the DuckDB oracle (no 1<<63 sign-bit edge).
    *
    * Native `SimHash64Sig` expression, shuffle-free: the earlier
    * relational shape exploded tokens into a 64-vote hash aggregate;
    * the native per-row loop computes identical band values inside the
    * scan projection (`SignatureExprsSpec`). Docs with no tokens have a
    * null signature and are dropped.
    */
  def simhashSignatures64(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol).as("doc"),
        graft.expressions.GraftFunctions.simhash64Sig(col(textCol)).as("sig"))
      .filter(col("sig").isNotNull)
      .select(col("doc") +:
        (0 until 4).map(b => element_at(col("sig"), b + 1).as(s"s$b")): _*)

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
    // Pack the four 16-bit bands into ONE long: the total Hamming
    // distance is a single bit_count over the packed xor, and the join
    // payload halves. Band b of the packed value is bits [16b, 16b+16).
    val packed = sigs.select(col("doc"),
      (0 until 4).map(b => shiftleft(col(s"s$b"), 16 * b))
        .reduce(_ bitwiseOR _).as("sig"))
    // Explode band keys and repartition on the band BEFORE self-joining.
    // The native signature expression removed the aggregate (and its
    // exchange) from this subtree, so without a shared shuffle boundary
    // the join's two branches each recompute every signature (measured
    // 1.6x slower at 10M docs). Both branches below are the IDENTICAL
    // Exchange over the identical child, which exchange reuse collapses
    // to one signature pass + one shuffle. (A groupBy+collect_list
    // bucket shape would also guarantee one pass, but materializing
    // every bucket's signature list OOMs where the streamed join does
    // not.) At small inputs AQE may broadcast one side instead of
    // reusing — recomputing a small corpus' signatures is irrelevant.
    val banded = packed.select(col("doc"), col("sig"),
      explode(array((0 until 4).map(b => concat_ws(":", lit(b),
        shiftright(col("sig"), 16 * b).bitwiseAND(lit(0xFFFFL)))): _*)).as("band"))
      .repartition(col("band"))
    val a = banded.as("a"); val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("id_a"), col("b.doc").as("id_b"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).as("hamming"))
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

  /** Cross-document duplicate spans — the candidate stage of exact
    * substring dedup (boilerplate headers, licence blocks, templated
    * paragraphs that repeat verbatim across documents): every n-word
    * span held by at least `minDocs` documents, with how many and the
    * smallest holder id.
    *
    * Per-row native distinct-shingle expansion in the scan projection
    * (no per-doc duplicate inflation), then ONE hash aggregation on the
    * span — count and min combine map-side, so the shuffle carries a
    * pair of longs per distinct span, not per occurrence. `minDocs`
    * filters after the partial-agg merge; at 100 TB the output is the
    * corpus' repeated-boilerplate table, input to a span-removal or
    * doc-penalty pass.
    */
  def dupSpans(docs: DataFrame, textCol: String, idCol: String,
               n: Int, minDocs: Int = 2): DataFrame = {
    require(minDocs >= 2, s"minDocs below 2 reports every span: $minDocs")
    docs
      .select(col(idCol).as("doc"),
        explode(graft.expressions.GraftFunctions
          .distinctWordShingles(col(textCol), n)).as("span"))
      .groupBy("span")
      .agg(count(lit(1)).as("n_docs"), min(col("doc")).as("min_doc"))
      .filter(col("n_docs") >= minDocs)
  }

  /** Cross-source near-duplication matrix: MinHash-LSH candidate pairs
    * attributed to their (unordered) source pair — which sources
    * mirror, scrape, or republish which. This is the report that
    * decides source-level dedup ORDER in a multi-source corpus (dedup
    * the mirror against the original, not vice versa) and flags feeds
    * that are mostly copies of another.
    *
    * The candidate generation is the banded q21 shape (never
    * all-pairs); attaching sources is two id-equi-joins of the pair
    * list (candidates << corpus) and the matrix aggregate is
    * source-pair-bounded. The pair is canonicalized (least, greatest)
    * so A~B and B~A collapse into one cell.
    */
  def crossSourceOverlap(docs: DataFrame, textCol: String, idCol: String,
                         srcCol: String, bands: Int = 3,
                         rowsPerBand: Int = 2): DataFrame = {
    val pairs = minhashCandidates(docs, textCol, idCol, bands, rowsPerBand)
    val src = docs.select(col(idCol), col(srcCol))
    pairs
      .join(src.select(col(idCol).as("id_a"), col(srcCol).as("__sa")), "id_a")
      .join(src.select(col(idCol).as("id_b"), col(srcCol).as("__sb")), "id_b")
      .select(least(col("__sa"), col("__sb")).as("source_a"),
        greatest(col("__sa"), col("__sb")).as("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** Corpus-wide paragraph-level exact dedup with document reassembly
    * (the RefinedWeb/C4 "repeated boilerplate removal" stage, run at
    * sub-document granularity): split every document on `sep`, keep
    * each distinct paragraph only at its FIRST occurrence in global
    * (id, position) order, and reassemble documents from their
    * surviving paragraphs. Documents whose every paragraph lost are
    * dropped entirely (C4 behavior).
    *
    * Scale shape: winner selection is a hash aggregation
    * (`min(struct(id, idx))` per paragraph hash) rather than a
    * row_number window — a boilerplate paragraph held by millions of
    * documents is EXACTLY the hot key that makes a per-key window
    * unsplittable, while min() combines map-side so the shuffle
    * carries one row per distinct paragraph. Survivors semi-join the
    * winner set on (hash, id, idx) and reassembly aggregates per
    * document (bounded by single-document size). The text volume
    * shuffles twice — once paragraph-keyed, once document-keyed —
    * which is inherent to global dedup + reassembly.
    *
    * Output: (idCol, text_dedup, n_paras_kept), paragraph order
    * preserved, `sep` re-inserted between survivors.
    *
    * `global = false` scopes the dedup WITHIN each document (repeated
    * headers/footers across pages of one doc — the C4 within-document
    * span cleanup) instead of corpus-wide: the winner key gains the
    * doc id, so the winner aggregate partitions by document and the
    * corpus-wide hot-paragraph concern disappears entirely.
    */
  def dedupParagraphs(docs: DataFrame, textCol: String, idCol: String,
                      sep: String, global: Boolean = true): DataFrame = {
    require(sep.nonEmpty, "separator must be non-empty")
    val paras = docs
      .select(col(idCol),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
          .as(Seq("__idx", "__para")))
      .filter(trim(col("__para")) =!= "")
      .withColumn("__h", md5(col("__para")))
    // local scope adds the doc id as a GROUPING key (not folded into
    // the hash — a delimiter-ambiguous concat would let two documents'
    // (id, paragraph) pairs collide and silently drop a paragraph)
    val winnerKeys = if (global) Seq(col("__h")) else Seq(col(idCol), col("__h"))
    val winners = paras
      .groupBy(winnerKeys: _*)
      .agg(min(struct(col(idCol).as("id"), col("__idx").as("idx"))).as("__w"))
      .select(col("__h").as("__wh"), col("__w.id").as("__wid"),
        col("__w.idx").as("__widx"))
    paras
      .join(winners, col("__h") === col("__wh") &&
        col(idCol) === col("__wid") && col("__idx") === col("__widx"),
        "left_semi")
      .groupBy(col(idCol))
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("__idx"), col("__para")))),
            x => x.getField("__para")),
          sep).as("text_dedup"),
        count(lit(1)).as("n_paras_kept"))
  }
}
